"""Similarity search over embedding columns (``array<float>``).

Three tiers:

1. ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
   matrix, stream the corpus through Arrow-batched BLAS matmuls
   (operators/vectorized.py), per-partition top-k, one tiny global
   merge.  Scales to any corpus size; the oracle-checked path.
2. ``ivf_topk`` — IVF approximate search: assign corpus vectors to
   Voronoi cells around deterministic seed centroids (one streamed
   matmul), shuffle once by cell, then probe only the ``n_probe`` cells
   nearest each query with a per-cell cogrouped matmul.  The 100 TB
   path: per-query work shrinks by ~n_probe/|cells| and the index build
   is one pass + one shuffle.
3. ``lsh_bucket_candidates`` — random-hyperplane LSH bucketing shared
   with dedup; candidate generation without any pairwise pass.

Float note: BLAS summation order differs from a serial fold by O(1 ulp);
all published scores are rounded to 6 decimals, which absorbs it (the
DuckDB oracles round identically).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from excelstream_spark.operators import vectorized as VZ


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Query side broadcast (small by construction); corpus streams through
    executors; one shuffle of partition-local winners for the global
    merge.  Self-matches excluded.  Ties break by ascending neighbor id.

    Returns (query_id, neighbor_id, rank, cos_sim_r).
    """
    top = VZ.topk_against_broadcast(
        corpus, queries, vec_col=vec_col, id_col=id_col, k=k, exclude_self=True
    )
    return top.select(
        "query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim_r")
    )


def seed_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
) -> DataFrame:
    """Deterministic IVF seeds: every ``centroid_every``-th vector by id.
    (A trained k-means via pyspark.ml drops in here unchanged; seeded
    centroids keep the operator deterministic for testing.)"""
    return corpus.filter((F.col(id_col) % centroid_every) == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def assign_ivf_cells(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: nearest-centroid assignment as ONE streamed matmul
    against the broadcast centroid matrix (no crossJoin, no n x cells
    shuffle).  Returns (centroids(cid, cv), assigned(id, v, cid))."""
    centroids = seed_centroids(corpus, vec_col, id_col, centroid_every)
    assigned = VZ.nearest_against_broadcast(
        corpus, centroids, vec_col=vec_col, id_col=id_col, n_nearest=1, carry_vec=True
    ).select("id", F.col("v"), "cid")
    return centroids, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_every: int = 50,
    n_probe: int = 3,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` nearest IVF cells per
    query; score each probed cell with a cogrouped per-cell matmul (the
    shuffle key is the cell id — at scale the index lives pre-partitioned
    by cell, so probing touches n_probe/|cells| of the data).

    Returns (query_id, neighbor_id, rank, cos_sim_r) — approximate, so
    rows-only checked (recall vs bruteforce asserted in unit tests).
    """
    centroids, assigned = assign_ivf_cells(corpus, vec_col, id_col, centroid_every)
    probes = VZ.nearest_against_broadcast(
        queries, centroids, vec_col=vec_col, id_col=id_col, n_nearest=n_probe, carry_vec=True
    ).select(F.col("id").alias("qid"), F.col("v").alias("qv"), "cid")

    out_schema = StructType(
        [
            StructField("query_id", corpus.schema[id_col].dataType),
            StructField("neighbor_id", corpus.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score_cell(probes_pdf: pd.DataFrame, members_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(probes_pdf) == 0 or len(members_pdf) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in probes_pdf["qv"]])
        C = np.stack([np.asarray(v, dtype=np.float64) for v in members_pdf["v"]])
        qids = probes_pdf["qid"].to_numpy()
        cids = members_pdf["id"].to_numpy()
        qn = np.linalg.norm(Q, axis=1)
        cn = np.linalg.norm(C, axis=1)
        qn[qn == 0.0] = 1.0
        cn[cn == 0.0] = 1.0
        S = (C / cn[:, None]) @ (Q / qn[:, None]).T  # members x queries
        S[cids[:, None] == qids[None, :]] = -np.inf
        kk = min(k, S.shape[0])
        out = []
        for j in range(len(qids)):
            col = S[:, j]
            if S.shape[0] > kk:
                part = np.argpartition(-col, kk - 1)[:kk]
                cand = np.nonzero(col >= col[part].min())[0]
            else:
                cand = np.arange(S.shape[0])
            order = cand[np.lexsort((cids[cand], -col[cand]))][:kk]
            order = order[col[order] > -np.inf]
            out.append(
                pd.DataFrame(
                    {"query_id": qids[j], "neighbor_id": cids[order], "cos_sim": col[order]}
                )
            )
        return pd.concat(out) if out else pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cos_sim": []}
        )

    per_cell = (
        probes.groupBy("cid")
        .cogroup(assigned.groupBy("cid"))
        .applyInPandas(score_cell, out_schema)
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        per_cell.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim_r"))
    )


def lsh_bucket_candidates(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit i of the bucket key is
    the sign of <v, h_i> where h_i is a deterministic pseudo-random
    hyperplane derived from xxhash64(plane, dim) — no stored model, fully
    reproducible across runs/engines.

    Returns (id, bucket) — join on bucket for near-dup candidates.
    """
    # plane weights in [-0.5, 0.5): (xxhash64(i, d) mod 1000)/1000 - 0.5
    def plane_dot(i: int):
        prods = F.zip_with(
            F.col("v"),
            F.array(*[
                (F.pmod(F.xxhash64(F.lit(i), F.lit(d)), F.lit(1000)) / 1000.0 - 0.5)
                for d in range(dim)
            ]),
            lambda x, w: x.cast("double") * w,
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)

    bucket = F.lit(0).cast("bigint")
    for i in range(n_planes):
        bucket = bucket + F.when(plane_dot(i) > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return c.select("id", bucket.alias("bucket"))
