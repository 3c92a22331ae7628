"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Dot products / norms are expressed with ``zip_with`` + ``aggregate`` so the
summation order is the array order: left-to-right double accumulation.
This matches DuckDB's ``list_cosine_similarity(CAST(x AS DOUBLE[]), ...)``
bit-for-bit, which is what lets cosine results be oracle-checked exactly.

For throughput-critical approximate paths (IVF/LSH candidate scoring) a
numpy Pandas UDF is faster, but numpy's pairwise summation changes the
floating-point result — keep those variants rows-only (see
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit signatures (bigint)."""
    return F.bit_count(a.bitwiseXOR(b))
