"""Deterministic random-hyperplane weights for sign-LSH.

One source of truth shared by BOTH sides of the correctness contract:

* the Spark operator (``operators/similarity.lsh_bucket_candidates``)
  binds the weights as literal constants into codegen'd expressions, and
* the DuckDB oracle builder (``plans/extension``) formats the SAME Python
  floats into SQL literals,

so the bucket assignment is bit-reproducible across engines with no
stored model and no cross-engine hash-function parity problem.  (The
previous formulation derived weights from Spark's xxhash64, which DuckDB
cannot recompute — it made the operator unverifiable by the oracle.)

Weights are uniform in [-0.5, 0.5), derived from md5 so they are
platform- and version-stable: ``w(t, i, d) = (md5("t:i:d") % 1000)/1000
- 0.5``.  For sign-LSH only the direction distribution matters; a
symmetric uniform cube is as good as a Gaussian here.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache


@lru_cache(maxsize=None)
def plane_weights(table: int, plane: int, dim: int) -> tuple[float, ...]:
    """The ``dim`` weights of hyperplane ``plane`` in hash table
    ``table``.  Pure function of its arguments; cached because the Spark
    expression builder and the SQL oracle builder both walk it."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) % 1000) / 1000.0 - 0.5)
    return tuple(out)
