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
    return _score_probed_cells(corpus, probes, assigned, id_col, k)


def _score_probed_cells(
    corpus: DataFrame,
    probes: DataFrame,
    assigned: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """Cogrouped per-cell matmul scoring shared by the seeded and trained
    IVF variants: probes(qid, qv, cid) x assigned(id, v, cid) -> global
    top-k per query."""
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
    n_planes: int = 8,
    n_tables: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: ``n_tables`` independent hash
    tables of ``n_planes`` sign bits each; two vectors are candidates if
    they share a bucket in ANY table (the same OR-amplification
    minhash-LSH uses).  Hyperplane weights are deterministic md5-derived
    constants (functions/planes.py) bound as literals — no stored model,
    bit-reproducible across runs AND engines (the DuckDB oracle embeds
    the same floats).

    CHOOSE r = n_planes FOR YOUR SIMILARITY THRESHOLD — it controls
    precision, and too-small r silently goes quadratic: a random pair
    collides in one r-bit table with prob 0.5^r, so at r=4/L=8 about
    40% of ALL n^2 pairs become candidates.  The defaults (r=8, L=16)
    target HIGH-similarity near-dup (cos >= ~0.85: per-table ~0.2,
    any-of-16 ~97% recall, random-pair rate ~6%).  For looser
    thresholds (cos ~ 0.45) hyperplane LSH is intrinsically weak —
    r=4/L=8 reaches ~80% recall only by letting the candidate set grow
    toward quadratic; prefer the IVF route there.

    Returns (id, table, bucket) — join on (table, bucket), dedupe pairs.
    """
    from excelstream_spark.functions.planes import plane_weights

    def plane_dot(t: int, i: int):
        prods = F.zip_with(
            F.col("v"),
            F.array(*[F.lit(w) for w in plane_weights(t, i, dim)]),
            lambda x, w: x.cast("double") * w,
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)

    # fail LOUDLY if the data's vector length disagrees with ``dim``:
    # zip_with pads the short side with nulls, which would silently turn
    # the dot products (and every bucket) into nulls — the same class of
    # silent fixture-shift corruption as the round-3 timestamp-unit bug.
    # Expressed as a filter predicate so column pruning can't drop it.
    dim_check = F.when(F.size(F.col("v")) == dim, F.lit(True)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_bucket_candidates: expected dim={dim}, vector has "),
                F.size(F.col("v")).cast("string"),
                F.lit(" elements — pass dim= explicitly"),
            )
        )
    )

    entries = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("bigint")
        for i in range(n_planes):
            bucket = bucket + F.when(
                plane_dot(t, i) > 0, F.lit(1 << i).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        entries.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
        dim_check
    )
    return c.select("id", F.explode(F.array(*entries)).alias("e")).select(
        "id", "e.table", "e.bucket"
    )


def lsh_candidate_pairs(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 16,
) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs from any shared LSH bucket —
    the no-pairwise-pass candidate generator for HIGH-similarity
    embedding dedup (see lsh_bucket_candidates for the r/L precision
    trade-off; small r degrades toward all-pairs)."""
    buckets = lsh_bucket_candidates(corpus, vec_col, id_col, n_planes, n_tables)
    a = buckets.select(F.col("id").alias("id_a"), "table", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "table", "bucket")
    return (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _semantic_block_tasks(
    assigned: DataFrame, max_cell: int
) -> DataFrame:
    """Block-tile oversized IVF cells into bounded pairwise TASKS:
    every cell is hash-partitioned into ``nb = ceil(n / max_cell)``
    blocks and each row is replicated into the ``nb`` block-pair tasks
    ``(min(b, j), max(b, j))`` it participates in, so the per-task
    input is ~2 blocks (<= ~2*max_cell rows) and the per-task pair
    work is ~max_cell^2 regardless of how degenerate a cell gets —
    the mega-cell skew hardening the round-5/6 verdicts carried.
    Unlike splitting cells by a secondary hyperplane (which silently
    LOSES cross-subcell pairs), tiling changes only the execution
    shape: every within-cell pair lands in exactly one task, so the
    pair OUTPUT is bit-identical to the untiled form on every input.
    Replication cost is nb copies of each oversized cell's rows —
    O(n^2 / max_cell) vectors, the same order as the pair work itself.
    Normal cells (nb == 1) collapse to the single task (0, 0)."""
    from pyspark.sql import Window

    # materialize the cell size first: a window expression cannot nest
    # inside the explode/transform arguments below
    sized = assigned.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("cid"))
    )
    nb = F.ceil(F.col("_n") / F.lit(max_cell)).cast("int")
    blk = F.pmod(F.xxhash64("id"), nb).cast("int")
    tasks = F.transform(
        F.sequence(F.lit(0), nb - 1),
        lambda j: F.struct(
            F.least(blk, j).cast("int").alias("bi"),
            F.greatest(blk, j).cast("int").alias("bj"),
        ),
    )
    return (
        sized.withColumn("blk", blk)
        .withColumn("t", F.explode(tasks))
        .select("cid", "id", "v", "blk", "t.bi", "t.bj")
    )


def semantic_pairs(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
    threshold: float = 0.45,
    max_cell: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: cosine > ``threshold``
    pairs WITHIN each IVF cell (Abbas et al. 2023: cluster the embedding
    space, then compare only within clusters).  Same deterministic
    seeded-centroid assignment as ``ivf_topk`` (nearest cosine, ties by
    ascending centroid id), so the whole construction is a pure function
    of the data and SQL-replayable.

    Contrast with dedup.dedup_embedding_cosine (exact, but broadcasts
    the full corpus matrix — bounded) and lsh_candidate_pairs (unbounded
    but a candidate generator only): here the corpus is SHUFFLED ONCE by
    cell id and the pairwise pass runs per cell.  At 100 TB: pair cost
    drops from O(n^2) to O(sum of cell^2) ~ O(n^2 / |cells|) with cells
    sized by centroid_every; misses only cross-cell pairs (the SemDeDup
    trade — recall vs the exact path is asserted in tests).  Swap
    ``kmeans_centroids`` in for trained cells in production.

    Returns (id_a, id_b, cos_sim_r) with id_a < id_b, scores rounded to
    6 decimals (BLAS ulp absorption, same as the other vector ops).

    ``max_cell`` bounds PER-TASK work when a cell degenerates (the
    mega-cell skew risk): oversized cells are block-TILED into
    block-pair tasks of <= ~2*max_cell rows each — see
    :func:`_semantic_block_tasks`; the pair output is bit-identical to
    the untiled form (every within-cell pair lands in exactly one
    task), only the skew disappears.  Cells at or under ``max_cell``
    run exactly as before (one task, nb == 1).
    """
    _, assigned = assign_ivf_cells(corpus, vec_col, id_col, centroid_every)
    if max_cell < 2:
        raise ValueError(f"need max_cell >= 2, got {max_cell}")
    tasks = _semantic_block_tasks(assigned, max_cell)
    out_schema = StructType(
        [
            StructField("id_a", corpus.schema[id_col].dataType),
            StructField("id_b", corpus.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def _normalized(rows: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in rows["v"]])
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        return rows["id"].to_numpy(), V / norms[:, None]

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        if len(pdf) < 2:
            return empty
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        if bi == bj:
            # diagonal task: ordinary within-set pairwise
            ids, N = _normalized(pdf)
            S = N @ N.T
            ai, aj = np.nonzero(
                (S > threshold) & (ids[:, None] < ids[None, :])
            )
            if len(ai) == 0:
                return empty
            return pd.DataFrame(
                {"id_a": ids[ai], "id_b": ids[aj], "cos_sim": S[ai, aj]}
            )
        # cross-block task: pairs between the two disjoint blocks only
        A, B = pdf[pdf["blk"] == bi], pdf[pdf["blk"] == bj]
        if len(A) == 0 or len(B) == 0:
            return empty
        ids_a, NA = _normalized(A)
        ids_b, NB = _normalized(B)
        S = NA @ NB.T
        ai, bj_ix = np.nonzero(S > threshold)
        if len(ai) == 0:
            return empty
        x, y = ids_a[ai], ids_b[bj_ix]
        return pd.DataFrame(
            {
                "id_a": np.minimum(x, y),
                "id_b": np.maximum(x, y),
                "cos_sim": S[ai, bj_ix],
            }
        )

    pairs = tasks.groupBy("cid", "bi", "bj").applyInPandas(
        cell_pairs, out_schema
    )
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim_r")
    )


def dedup_semantic(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
    threshold: float = 0.45,
    max_cell: int = 4096,
    score_col: str | None = None,
) -> DataFrame:
    """The composed SemDeDup keep-set: one representative per
    semantic-duplicate component, every unpaired row kept.  Pairs from
    :func:`semantic_pairs`, clustering + keep policy from
    operators/components.py — the same composition every other dedup
    family uses.  Default representative = minimum id; pass
    ``score_col`` to keep the BEST-scoring member instead
    (components.dedup_keep_best, r9 — ties by ascending id, NULL
    scores last): the SemDeDup-paper shape of keeping the highest-
    quality copy of each semantic cluster."""
    from excelstream_spark.operators.components import (
        dedup_keep_best,
        dedup_keep_representatives,
    )

    pairs = semantic_pairs(
        corpus, vec_col, id_col, centroid_every, threshold, max_cell
    )
    if score_col is not None:
        return dedup_keep_best(corpus, pairs, score_col, id_col=id_col)
    return dedup_keep_representatives(corpus, pairs, id_col=id_col)


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """TRAINED IVF centroids via pyspark.ml KMeans (the production
    replacement for the deterministic seeds in ``seed_centroids`` —
    same (cid, cv) contract, drops into assign_ivf_cells/ivf_topk).

    Training cost is one cached pass over the corpus per iteration,
    distributed by Spark ML; at 100 TB train on a sample
    (``corpus.sample(0.001)``) — centroid quality converges long before
    full-data training pays off.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fx = corpus.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(fx)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    return spark.createDataFrame(centers, "cid int, cv array<double>")


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 10,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN over TRAINED k-means cells: same probe/score pipeline as
    ``ivf_topk``, with learned centroids instead of seeded ones
    (higher recall per probe on clustered data)."""
    centroids = kmeans_centroids(corpus, vec_col, id_col, k=n_cells, seed=seed)
    assigned = VZ.nearest_against_broadcast(
        corpus, centroids, vec_col=vec_col, id_col=id_col, n_nearest=1, carry_vec=True
    ).select("id", "v", "cid")
    probes = VZ.nearest_against_broadcast(
        queries, centroids, vec_col=vec_col, id_col=id_col, n_nearest=n_probe, carry_vec=True
    ).select(F.col("id").alias("qid"), F.col("v").alias("qv"), "cid")
    return _score_probed_cells(corpus, probes, assigned, id_col, k)
