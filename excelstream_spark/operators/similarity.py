"""Similarity search over embedding columns (``array<float>``).

Three tiers:

1. ``cosine_topk_bruteforce`` — exact top-k, JVM-side expressions.  The
   baseline and the oracle-checkable path.  Cost: |queries| x |corpus|
   dot products; right answer when the query set is small (broadcast the
   queries, stream the corpus — scales to any corpus size).
2. ``ivf_topk`` — IVF-style approximate search: partition the corpus into
   Voronoi cells around deterministic seed centroids, search only the
   ``n_probe`` cells nearest the query.  The 100 TB path: candidate set
   shrinks by ~|cells|/n_probe, everything stays a DataFrame join.
3. ``lsh_bucket_candidates`` — random-hyperplane LSH bucketing shared with
   dedup; candidate generation without any pairwise pass.

numpy/Pandas-UDF scoring is deliberately NOT used on the oracle-checked
path: numpy's pairwise summation changes float results vs left-to-right
aggregation; determinism wins here and `zip_with`+`aggregate` is already
codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from excelstream_spark.functions import vectors as VEC


def _with_norm(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        VEC.norm(F.col(vec_col)).alias("nrm"),
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (small by construction); the corpus
    streams through executors — one shuffle for the per-query top-k
    window.  Self-matches (same id) are excluded.

    Returns (query_id, neighbor_id, rank, cos_sim_r).
    """
    c = _with_norm(corpus, vec_col, id_col)
    q = _with_norm(queries, vec_col, id_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = VEC.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("qid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim_r"))
    )


def assign_ivf_cells(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: every ``centroid_every``-th vector (by id)
    seeds a cell; each corpus vector joins its nearest centroid.

    (A trained k-means via pyspark.ml would drop in here unchanged; seeded
    centroids keep the operator deterministic for testing.)

    Returns (centroids(cid, cv), assigned(id, v, nrm, cid)).
    """
    c = _with_norm(corpus, vec_col, id_col)
    centroids = c.filter((F.col("id") % centroid_every) == 0).select(
        F.col("id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = VEC.dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w = W.partitionBy("id").orderBy(F.col("cell_sim").desc(), F.col("cid"))
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("cell_sim", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "v", "nrm", "cid")
    )
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
    """Approximate top-k: probe only the n_probe nearest IVF cells per
    query.  At scale the assigned corpus is partitioned by cell (cluster
    pruning — each query touches n_probe/|cells| of the data).

    Returns (query_id, neighbor_id, rank, cos_sim_r) — approximate, so
    rows-only checked (recall vs bruteforce asserted in unit tests).
    """
    centroids, assigned = assign_ivf_cells(corpus, vec_col, id_col, centroid_every)
    q = _with_norm(queries, vec_col, id_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    qcos = VEC.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    wq = W.partitionBy("qid").orderBy(F.col("c_sim").desc(), F.col("cid"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("c_sim", qcos)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "qv", "qn", "cid")
    )
    cos = VEC.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("id"))
    return (
        probes.join(assigned, "cid")
        .filter(F.col("id") != F.col("qid"))
        .withColumn("cos_sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            "rank",
            F.round("cos_sim", 6).alias("cos_sim_r"),
        )
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
