"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Column-expression forms of dot/cosine/hamming.  Two dot variants:

* ``dot(a, b)`` — ``zip_with`` + ``aggregate``: left-to-right double
  accumulation, bit-identical to DuckDB's ``list_cosine_similarity`` on
  DOUBLE[] casts (the exact-oracle path), but the lambda is interpreted.
* ``dot(a, b, dim)`` — unrolled ``element_at`` chain: same fold order,
  codegen'd, ~2x faster when the width is known.

For BULK scoring (all-pairs, top-k, centroid assignment) use
operators/vectorized.py instead — Arrow-batched BLAS matmuls are 10-30x
faster than either expression form; these stay for per-row expression
contexts (hamming distance on simhash, ad-hoc column math).

Reference parity: the reference has no vector operations (SURVEY.md
§2.6); this is BASELINE.json extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b, dim: int | None = None) -> Column:
    """Dot product with left-to-right double accumulation.

    With ``dim`` given, the sum is an unrolled chain of codegen'd
    ``element_at`` scalar expressions — ~10x faster than the interpreted
    ``zip_with``+``aggregate`` fallback, with IDENTICAL floating-point
    results: ((t1+t2)+t3)+... is the same fold order as the aggregate
    (0.0+t1 == t1 exactly in IEEE 754).
    """
    if dim is not None:
        terms = [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Array width from the first row (plan-time probe; embeddings are
    fixed-width by construction).  None for an empty table."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return None if row is None else row["d"]


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit signatures (bigint)."""
    return F.bit_count(a.bitwiseXOR(b))
