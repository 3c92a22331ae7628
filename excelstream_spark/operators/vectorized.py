"""Vectorized (Arrow + BLAS) embedding scoring kernels.

The pattern shared by every dense-similarity operator here: the SMALL
side (queries / centroids / the dedup reference set) is collected to a
numpy matrix and broadcast; the LARGE side (the corpus) streams through
``mapInPandas`` partitions, where each Arrow batch is one ``C @ Q.T``
BLAS call.  Per-batch results are pruned (top-k or threshold) before
they leave the Python worker, so the shuffle carries O(partitions x
|queries| x k) rows — never the n x m score matrix.

Scale profile (the 100 TB story):

* corpus side: never materialized, never shuffled whole — partitions
  stream through Arrow; adding executors divides wall-clock linearly.
* broadcast side: must fit in worker memory (rows x dim x 8 bytes;
  1M x 64-dim = 512 MB — beyond that, use the IVF/LSH candidate
  generators in operators/similarity.py to shrink the pair space first).
* floats: scores are computed in float64 BLAS.  Summation order differs
  from a left-to-right fold by O(1 ulp); every consumer rounds to 6
  decimals before comparison/output, which absorbs it.

Reference parity note: the reference (an I/O library, SURVEY.md §2.6)
has no vector operators; this implements the BASELINE.json extension
surface the Spark-first way: pandas-UDF batches only where BLAS beats
codegen'd scalar expressions by 10-100x, plain DataFrame ops elsewhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, DoubleType, IntegerType

from excelstream_spark.partitioning import fan_out


def _id_type(df: DataFrame, id_col: str):
    return df.schema[id_col].dataType


def collect_matrix(df: DataFrame, vec_col: str, id_col: str):
    """(ids: np.ndarray, M: float64 matrix, norms) for a SMALL DataFrame.

    Driver-side materialization is the deliberate exception to the
    no-collect rule: this is the broadcast side, bounded by the caller.
    """
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    if len(pdf) == 0:
        return ids, np.zeros((0, 0), dtype=np.float64), np.zeros(0)
    M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.linalg.norm(M, axis=1)
    return ids, M, norms


def _ensure_parallel(df: DataFrame, spark) -> DataFrame:
    return fan_out(df)


def topk_against_broadcast(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """For each query vector, the exact top-k cosine rows of ``corpus``.

    Two-level top-k: each corpus partition emits its local top-k per
    query (pruned inside the Python worker), then one tiny window merges
    partition winners.  Ties broken by ascending neighbor id, identically
    at both levels, so the result is deterministic and exact.

    Returns (query_id, neighbor_id, cos_sim) — unrounded; callers round.
    """
    spark = corpus.sparkSession
    q_ids, Q, q_norms = collect_matrix(queries, vec_col, id_col)
    if len(q_ids) == 0:
        sch = StructType(
            [
                StructField("query_id", _id_type(queries, id_col)),
                StructField("neighbor_id", _id_type(corpus, id_col)),
                StructField("rank", IntegerType()),
                StructField("cos_sim", DoubleType()),
            ]
        )
        return spark.createDataFrame([], sch)
    q_norms = np.where(q_norms == 0.0, 1.0, q_norms)  # zero vector -> cos 0, not NaN
    Qn = (Q / q_norms[:, None]).T  # d x q, pre-normalized
    bc = spark.sparkContext.broadcast((q_ids, Qn, q_norms))

    out_schema = StructType(
        [
            StructField("query_id", _id_type(queries, id_col)),
            StructField("neighbor_id", _id_type(corpus, id_col)),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, QnT, _ = bc.value
        nq = len(qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            c_ids = pdf["cid_"].to_numpy()
            c_norms = np.linalg.norm(C, axis=1)
            c_norms[c_norms == 0.0] = 1.0
            S = (C / c_norms[:, None]) @ QnT  # b x q
            if exclude_self:
                S[c_ids[:, None] == qids[None, :]] = -np.inf
            kk = min(k, S.shape[0])
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                col = S[:, j]
                # top-kk by (-cos, id).  argpartition finds the kk-th value;
                # everything >= it enters the exact lexsort so boundary ties
                # resolve by ascending id, same as the global merge window.
                if S.shape[0] > kk:
                    part = np.argpartition(-col, kk - 1)[:kk]
                    cand = np.nonzero(col >= col[part].min())[0]
                else:
                    cand = np.arange(S.shape[0])
                order = cand[np.lexsort((c_ids[cand], -col[cand]))][:kk]
                keep = col[order] > -np.inf
                order = order[keep]
                out_q.append(np.full(len(order), qids[j]))
                out_n.append(c_ids[order])
                out_s.append(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    c = _ensure_parallel(
        corpus.select(F.col(id_col).alias("cid_"), F.col(vec_col).alias("v")), spark
    )
    local = c.mapInPandas(score, out_schema)
    # global merge: partitions x |q| x k rows — tiny
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def pairs_above_threshold(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.45,
    upper_triangle: bool = True,
) -> DataFrame:
    """All (id_a, id_b, cos_sim) pairs with cosine > threshold.

    ``reference=None`` means self-join: the corpus is ALSO collected and
    broadcast as the reference matrix (bounded — see module docstring;
    at scale, run an LSH/IVF candidate generator instead of all-pairs).
    The streamed side remains the corpus, so only the broadcast copy is
    size-limited.  ``upper_triangle`` keeps id_a < id_b (dedup shape).
    """
    spark = corpus.sparkSession
    ref = corpus if reference is None else reference
    r_ids, R, r_norms = collect_matrix(ref, vec_col, id_col)
    out_schema = StructType(
        [
            StructField("id_a", _id_type(corpus, id_col)),
            StructField("id_b", _id_type(ref, id_col)),
            StructField("cos_sim", DoubleType()),
        ]
    )
    if len(r_ids) == 0:
        return spark.createDataFrame([], out_schema)
    r_norms_safe = np.where(r_norms == 0.0, 1.0, r_norms)
    bc = spark.sparkContext.broadcast((r_ids, (R / r_norms_safe[:, None]).T))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rids, RnT = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            c_ids = pdf["cid_"].to_numpy()
            c_norms = np.linalg.norm(C, axis=1)
            c_norms[c_norms == 0.0] = 1.0
            S = (C / c_norms[:, None]) @ RnT  # b x r
            mask = S > threshold
            if upper_triangle:
                mask &= c_ids[:, None] < rids[None, :]
            else:
                mask &= c_ids[:, None] != rids[None, :]
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": c_ids[ai], "id_b": rids[bj], "cos_sim": S[ai, bj]}
            )

    c = _ensure_parallel(
        corpus.select(F.col(id_col).alias("cid_"), F.col(vec_col).alias("v")), spark
    )
    return c.mapInPandas(score, out_schema)


def nearest_against_broadcast(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cv",
    n_nearest: int = 1,
    carry_vec: bool = False,
) -> DataFrame:
    """Assign each corpus vector its ``n_nearest`` centroids by cosine.

    The IVF building block: centroid count is small by construction, so
    assignment is one streamed matmul — no crossJoin, no shuffle beyond
    the input scan.  Returns (id, cid, c_rank, c_sim[, v]);
    ``carry_vec`` passes the corpus vector through so callers avoid a
    re-join against the corpus.
    """
    spark = corpus.sparkSession
    cen_ids, CM, cen_norms = collect_matrix(centroids, centroid_vec_col, centroid_id_col)
    fields = [
        StructField("id", _id_type(corpus, id_col)),
        StructField("cid", _id_type(centroids, centroid_id_col)),
        StructField("c_rank", IntegerType()),
        StructField("c_sim", DoubleType()),
    ]
    if carry_vec:
        fields.append(StructField("v", corpus.schema[vec_col].dataType))
    out_schema = StructType(fields)
    if len(cen_ids) == 0:
        return spark.createDataFrame([], out_schema)
    cen_norms_safe = np.where(cen_norms == 0.0, 1.0, cen_norms)
    bc = spark.sparkContext.broadcast((cen_ids, (CM / cen_norms_safe[:, None]).T))
    nn = min(n_nearest, len(cen_ids))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, CnT = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            ids = pdf["cid_"].to_numpy()
            c_norms = np.linalg.norm(C, axis=1)
            c_norms[c_norms == 0.0] = 1.0
            S = (C / c_norms[:, None]) @ CnT  # b x ncen
            # per row: nn best centroids, ties by ascending centroid id
            order = np.lexsort((np.broadcast_to(cids, S.shape), -S), axis=1)[:, :nn]
            rows = np.repeat(np.arange(S.shape[0]), nn)
            cols = order.ravel()
            out = {
                "id": ids[rows],
                "cid": cids[cols],
                "c_rank": np.tile(np.arange(1, nn + 1), S.shape[0]).astype("int32"),
                "c_sim": S[rows, cols],
            }
            odf = pd.DataFrame(out)
            if carry_vec:
                odf["v"] = pdf["v"].to_numpy()[rows]
            yield odf

    c = _ensure_parallel(
        corpus.select(F.col(id_col).alias("cid_"), F.col(vec_col).alias("v")), spark
    )
    return c.mapInPandas(assign, out_schema)
