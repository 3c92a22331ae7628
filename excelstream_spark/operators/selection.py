"""Targeted data selection via importance resampling (DSIR).

Implements the published DSIR recipe (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling", NeurIPS): represent
every document as hashed n-gram (unigram + bigram) bucket counts, fit
smoothed bag-of-buckets models on a small TARGET corpus (the
distribution you want more of) and on the RAW pool, score each raw
document with the log importance weight

    log w(doc) = sum_tokens [ ln p_target(bucket) - ln p_raw(bucket) ]

and sample k documents WITHOUT replacement proportionally to w via the
Gumbel-top-k trick (score = log w + Gumbel noise; take the top k).

Engine-portable by construction: bucket assignment and the Gumbel
uniforms are md5-derived (the curation/sampling convention —
``('0x' || substr(md5(x), 1, 8))::bigint`` replays bit-identically in
DuckDB), so the entire selection — weights, noise, and the selected
set — is SQL-replayable.

100 TB design:
- The target model is ``n_buckets`` rows (default 10k) — broadcast.
- The raw model is a classic word-count: explode + groupBy(bucket)
  with map-side partial aggregation; the shuffle moves at most
  ``n_buckets`` rows per task.
- Per-document weights need NO per-(doc, bucket) intermediate: the
  weight is linear in counts, so the exploded grams broadcast-join the
  bucket log-ratio table and a single groupBy(doc) sums it — one
  shuffle, keyed on the id.
- Selection is ORDER BY score LIMIT k -> TakeOrderedAndProject
  (per-partition heaps), never a global sort.
- The raw corpus is tokenized twice (once for its model, once for the
  weights).  That is deliberate: persisting exploded grams costs more
  memory than the corpus itself, while the model pass's shuffle is
  tiny — recompute beats materialize at scale.  For steady-state reuse
  pass a precomputed ``logratio`` (store it like the incremental
  fingerprint artifacts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT
from excelstream_spark.partitioning import fan_out

#: DSIR paper default: 10k hash buckets over unigrams + bigrams.
DEFAULT_BUCKETS = 10_000

#: Laplace pseudo-count per bucket (applied to BOTH models).
DEFAULT_ALPHA = 1.0

_U32_SPAN = float(2**32)


def _bucket(gram: Column, n_buckets: int, seed: int) -> Column:
    """md5-portable bucket id in [0, n_buckets) — same construction as
    curation.split_bucket, replayed in DuckDB as
    ``('0x' || substr(md5(seed || ':' || gram), 1, 8))::bigint % B``."""
    key = F.concat(F.lit(f"{seed}:"), gram)
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def _grams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — one row per unigram AND bigram occurrence, shared
    tokenization convention (functions/text.tokens).  Bigrams are built
    from the materialized token array (no window, no extra shuffle).

    Fans out to session parallelism first (r14, the shingle_rows
    precedent): a small parquet input arrives as one split, and the
    tokenize+shingle+explode is the per-row-expensive stage of every
    consumer (classifier feature build ran as a 2-task 1.7s stage in
    the v4 profile; DSIR gram passes likewise); no-op at scale, and
    every consumer is batch (the streaming scorers are mapside)."""
    tk = fan_out(df).select(
        F.col(id_col),
        TXT.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tk"),
    )
    both = tk.select(
        F.col(id_col),
        F.concat(
            F.col("tk"), TXT.shingles_from_tokens(F.col("tk"), 2)
        ).alias("grams"),
    )
    return both.select(F.col(id_col), F.explode("grams").alias("gram"))


def _bucket_counts(
    grams: DataFrame, n_buckets: int, seed: int
) -> DataFrame:
    """(b, cnt) corpus-level bucket occurrence counts."""
    return (
        grams.select(_bucket(F.col("gram"), n_buckets, seed).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: int = 0,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(b, lam) — per-bucket ``ln p_target(b) - ln p_raw(b)`` with
    Laplace smoothing ``(cnt + alpha) / (total + alpha * n_buckets)``
    on both sides.  At most ``n_buckets`` rows: THE reusable artifact —
    refit only when the target distribution changes.

    Buckets absent from the raw pool are omitted (no raw document can
    hit them, so they contribute to no weight); smoothing still uses
    the full ``n_buckets`` in both denominators, so the omission is
    exact, not an approximation."""
    tc = _bucket_counts(_grams(target, text_col, id_col), n_buckets, seed)
    rc = _bucket_counts(_grams(raw, text_col, id_col), n_buckets, seed)
    t_tot = tc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("t_tot"))
    r_tot = rc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("r_tot"))
    denom_extra = float(alpha) * n_buckets
    return (
        rc.withColumnRenamed("cnt", "r_cnt")
        .join(tc.withColumnRenamed("cnt", "t_cnt"), "b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "b",
            (
                F.log(
                    (
                        F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double")
                        + F.lit(float(alpha))
                    )
                    / (F.col("t_tot").cast("double") + F.lit(denom_extra))
                )
                - F.log(
                    (F.col("r_cnt").cast("double") + F.lit(float(alpha)))
                    / (F.col("r_tot").cast("double") + F.lit(denom_extra))
                )
            ).alias("lam"),
        )
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    logratio: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: int = 0,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(id_col, log_w) for EVERY raw document (token-less documents get
    0.0 — the empty product).  Pass either ``target`` (model fit here)
    or a precomputed ``logratio`` artifact."""
    if logratio is None:
        if target is None:
            raise ValueError(
                "dsir_importance_weights: need target= or logratio="
            )
        logratio = dsir_logratio(
            target, raw, text_col, id_col, n_buckets, seed, alpha
        )
    bucketed = _grams(raw, text_col, id_col).select(
        F.col(id_col), _bucket(F.col("gram"), n_buckets, seed).alias("b")
    )
    summed = (
        bucketed.join(F.broadcast(logratio), "b")
        .groupBy(id_col)
        .agg(F.sum("lam").alias("log_w"))
    )
    ids = raw.select(id_col)
    return ids.join(summed, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("log_w"), F.lit(0.0)).alias("log_w"),
    )


def _gumbel(id_col: Column, seed: int) -> Column:
    """Deterministic standard Gumbel draw per id: u from the md5
    uniform (+0.5 centering keeps u in (0, 1) strictly — both
    -ln(-ln(u)) poles unreachable), g = -ln(-ln(u)).  Replay:
    ``-ln(-ln((('0x' || substr(md5('gumbel:seed:' || id), 1, 8))::bigint
    + 0.5) / 4294967296))``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"gumbel:{seed}:"), id_col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U32_SPAN)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame | None = None,
    k: int = 1000,
    logratio: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: int = 0,
    alpha: float = DEFAULT_ALPHA,
    gumbel_seed: int = 1,
) -> DataFrame:
    """Select ``k`` raw documents ~ importance resampling without
    replacement (Gumbel-top-k over the log weights).  Returns
    (id_col, log_w_r, score_r) — weights and perturbed scores rounded
    to 6 decimals for engine-stable hashing; selection itself uses the
    UNROUNDED scores."""
    # NULL ids would give a NULL Gumbel key -> NULL score, and the two
    # engines disagree on NULL placement under ORDER BY DESC (Spark:
    # last; DuckDB: first) — exclude them up front on both sides (the
    # target too, so both models see the same corpus slices)
    raw = raw.where(F.col(id_col).isNotNull())
    if target is not None:
        target = target.where(F.col(id_col).isNotNull())
    w = dsir_importance_weights(
        raw, target, logratio, text_col, id_col, n_buckets, seed, alpha
    )
    scored = w.withColumn(
        "score", F.col("log_w") + _gumbel(F.col(id_col), gumbel_seed)
    )
    return (
        scored.orderBy(F.col("score").desc())
        .limit(k)
        .select(
            F.col(id_col),
            F.round("log_w", 6).alias("log_w_r"),
            F.round("score", 6).alias("score_r"),
        )
    )


def dsir_score_mapside(
    df: DataFrame,
    logratio: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: int = 0,
    threshold: float | None = None,
) -> DataFrame:
    """Shuffle-FREE DSIR scoring against a precomputed ``dsir_logratio``
    artifact: adds ``log_w`` (and ``keep`` when ``threshold`` is set)
    to every row with ZERO exchanges — tokenize/shingle/bucket stay JVM
    expressions, and the per-doc sum over bucket log-ratios runs in one
    Arrow-batched ``mapInPandas`` against a dense numpy copy of the
    artifact (``n_buckets`` float64s — 80 KB at the default 10k,
    bounded by construction; collected ONCE at plan build, the
    broadcast-the-model shape).

    Stateless, so it works identically on batch AND STREAMING
    DataFrames — the production gate: fit the model in batch, apply it
    to the ingest stream per micro-batch with no state store.  (The
    JVM-side alternative — a 10k-entry map literal — is O(n) per
    lookup in Spark's GetMapValue; the vectorized numpy take is why
    this path exists.)

    vs :func:`dsir_importance_weights`: same numbers (float summation
    order aside), different plan — that one shuffles once on the id
    and needs no Python; this one is for streams and for pipelines
    that must keep the row (text and all) without re-joining."""
    import numpy as np
    import pandas as pd

    lam_rows = logratio.collect()  # <= n_buckets rows by construction
    lam = np.zeros(n_buckets, dtype=np.float64)
    for r in lam_rows:
        lam[int(r["b"])] = float(r["lam"])

    tk = TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
    grams = F.concat(tk, TXT.shingles_from_tokens(tk, 2))
    buckets = F.transform(grams, lambda g: _bucket(g, n_buckets, seed))
    with_b = df.withColumn("_buckets", buckets)

    fields = [f for f in with_b.schema.fields if f.name != "_buckets"]
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(fields + [StructField("log_w", DoubleType(), False)])

    def score(batches):
        for pdf in batches:
            bl = pdf["_buckets"]
            if len(bl):
                flat = (
                    np.concatenate([np.asarray(b, dtype=np.int64) for b in bl])
                    if bl.map(len).sum()
                    else np.empty(0, dtype=np.int64)
                )
                lens = bl.map(len).to_numpy(dtype=np.int64)
                offs = np.zeros(len(lens), dtype=np.int64)
                np.cumsum(lens[:-1], out=offs[1:])
                vals = lam[flat]
                # reduceat ONLY at the non-empty segments' offsets:
                # consecutive non-empty offsets bound each segment
                # exactly (empty segments occupy no positions between
                # them), and the last runs to the end.  Including empty
                # segments' offsets instead would both read garbage for
                # them AND truncate the PRECEDING segment (its reduceat
                # span would end at the empty segment's clamped offset).
                log_w = np.zeros(len(lens), dtype=np.float64)
                nz = lens > 0
                if nz.any():
                    log_w[nz] = np.add.reduceat(vals, offs[nz])
            else:
                log_w = np.empty(0, dtype=np.float64)
            out = pdf.drop(columns=["_buckets"])
            out["log_w"] = pd.Series(log_w, index=pdf.index, dtype="float64")
            yield out

    scored = with_b.mapInPandas(score, schema)
    if threshold is not None:
        scored = scored.withColumn(
            "keep", F.col("log_w") >= F.lit(float(threshold))
        )
    return scored
