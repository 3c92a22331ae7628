"""Streaming NEAR-duplicate detection: minhash-LSH band buckets kept in
stream state.

``streaming/stateful.py``'s ``streaming_dedup`` suppresses exact
re-deliveries by key; this module extends the idea to near-duplicates —
the shape an ingest pipeline needs when paraphrased/boilerplate copies
arrive over time and the corpus must not re-admit them.

Semantics: every incoming document is minhashed with EXACTLY the batch
hash family (``operators/dedup.py``: xxhash64 shingles ->
``min(xxhash64(i, s))`` signatures -> ``hash()`` of each band slice —
parity asserted in tests), then exploded to (band, band_hash) entries.
State lives per band bucket: the first document ever seen in a bucket
owns it; every later document that lands in an owned bucket emits a
FLAG row ``(doc_id, band, bh, first_doc_id)``.  A document with zero
flag rows across all bands collided with nobody — the stream-side
candidate filter.  Downstream, flagged docs are dropped outright
(aggressive dedup) or exact-verified against their ``first_doc_id``
(the batch verify join), exactly like the batch LSH pipeline's
candidates stage — the verify consumer ships as
:func:`verify_neardup_flags` / :func:`neardup_drop_ids` (candidate
pairs -> shingle-set join -> exact-Jaccard gate, run per micro-batch
via ``foreachBatch`` or over the accumulated flag table).

Why flags rather than a kept-docs stream: deciding "no band collided"
needs a second per-doc aggregation after the per-bucket stateful pass —
a second stateful operator in the same query, which Structured
Streaming restricts.  Emitting the collision evidence keeps the query
single-stateful and lets the consumer choose drop-vs-verify.

Scale: state is one long per OCCUPIED band bucket, hash-partitioned
across the cluster's state stores, and expires at an event-time TTL
past the watermark (bounded state on unbounded streams).  The per-row
signature cost is ``bands * rows_per_band`` xxhash64 evaluations per
shingle inside higher-order transforms — interpreted, not codegen'd,
which is acceptable at streaming ingest rates; a backfill over a
100 TB corpus should use the batch ``dedup_minhash_lsh`` (codegen'd
min-aggregation) and seed the stream's state from its buckets.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from excelstream_spark.functions import text as TXT

FLAG_OUTPUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("bh", LongType()),
        StructField("first_doc_id", LongType()),
    ]
)

_BUCKET_STATE = StructType([StructField("owner", LongType())])

#: how far past the watermark a bucket's owner survives (the near-dup
#: horizon; mirrors stateful.py's TTL rationale)
_BUCKET_TTL_MS = 24 * 3_600_000


_MAX_LONG = (1 << 63) - 1


def band_hash_array(
    text_col: Column | str,
    bands: int = 16,
    rows_per_band: int = 4,
) -> Column:
    """array<bigint> of LSH band hashes for one document's text, in the
    batch hash family (see module docstring).  Documents with fewer than
    3 tokens (no 3-shingle) yield an empty array.

    Expression-shape constraints this encoding respects (both verified
    the hard way):

    * N separate ``transform(...)`` calls with Python lambdas in one
      projection COLLAPSE to the first lambda (PySpark names every
      lambda variable identically, and the analyzer unifies them) —
      everything must be ONE nested expression.
    * anything referenced inside a lambda BODY re-evaluates per element
      (and Catalyst's project-collapsing inlines upstream columns into
      lambda bodies, so staging through a select doesn't protect it) —
      every expensive subtree below is a higher-order-function ARGUMENT,
      evaluated once per row: shingles via zip_with over the token array
      (no token-array reference in any lambda body), minhash + banding
      via ONE aggregate whose merge does O(num_hashes) work per shingle
      and whose finish emits the band hashes from the final signature.
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    n = bands * rows_per_band
    tok = TXT.tokens(col)
    big = 1 << 30
    # 3-shingle strings "a b c" by zipping tok with its own 1- and
    # 2-shifted slices; zip_with pads the shorter side with null and
    # concat propagates it, so the trailing incomplete shingles filter
    # out.  Byte-identical to shingle_rows' concat_ws(" ", ...) strings.
    pair = F.zip_with(
        tok, F.slice(tok, 2, big), lambda x, y: F.concat(x, F.lit(" "), y)
    )
    tri = F.zip_with(
        pair, F.slice(tok, 3, big), lambda xy, z: F.concat(xy, F.lit(" "), z)
    )
    sh = F.array_distinct(
        F.transform(
            F.filter(tri, lambda s: s.isNotNull()), lambda s: F.xxhash64(s)
        )
    )
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    sig_and_bands = F.aggregate(
        sh,
        F.array_repeat(F.lit(_MAX_LONG), n),
        lambda acc, h: F.zip_with(
            acc, idx, lambda a, i: F.least(a, F.xxhash64(i, h))
        ),
        lambda acc: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda j: F.hash(
                F.slice(acc, j * rows_per_band + 1, rows_per_band)
            ).cast("long"),
        ),
    )
    # >= 3 tokens <=> >= 1 shingle; guards the empty-aggregate case
    # (whose accumulator would band-hash the MAX_LONG zero vector)
    return F.when(F.size(tok) >= 3, sig_and_bands).otherwise(
        F.array().cast("array<long>")
    )


def _bucket_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    seeds = pdf[pdf["seed"]]
    real = pdf[~pdf["seed"]]
    if state.exists:
        (owner,) = state.get
        flagged = real
    elif len(seeds):
        # backfill-seeded bucket: the batch pipeline's owner takes the
        # bucket unconditionally — the backfill happened BEFORE the
        # stream, so even a smaller streamed doc_id arriving in the same
        # micro-batch is a later arrival and gets flagged
        owner = int(seeds["doc_id"].min())
        flagged = real
    else:
        # first batch this bucket appears in: the smallest doc_id owns it
        # (deterministic whatever the within-batch row order), the rest
        # of the batch is flagged against it
        owner = int(real["doc_id"].min())
        flagged = real[real["doc_id"] != owner]
    state.update((owner,))
    # TTL anchored at max(watermark, batch event time): on the FIRST
    # batch the watermark is still 0, and watermark+TTL would expire the
    # moment the watermark jumps — silently dropping every bucket not
    # re-seen in the very next batch (caught by the 3-batch parity test)
    ev_ms = int(pdf["ts"].astype("int64").max() // 1_000_000)
    state.setTimeoutTimestamp(
        max(state.getCurrentWatermarkMs(), ev_ms) + _BUCKET_TTL_MS
    )
    if len(flagged):
        out = flagged[["doc_id"]].copy()
        out["band"] = int(key[0])
        out["bh"] = int(key[1])
        out["first_doc_id"] = owner
        yield out[["doc_id", "band", "bh", "first_doc_id"]]


def streaming_neardup_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    bands: int = 16,
    rows_per_band: int = 4,
    watermark: str = "2 hours",
    seed_entries: DataFrame | None = None,
) -> DataFrame:
    """Band-collision flags over a streaming documents source (must carry
    an event-time column ``ts_col``).  Output: one row per (flagged doc,
    colliding band) — ``first_doc_id`` is the bucket owner to verify
    against.  ``distinct doc_id`` of this stream = the docs to drop.

    ``seed_entries`` (optional) is a second STREAMING source of
    pre-exploded backfill buckets ``(doc_id=owner, ts, band, bh)`` — see
    :func:`bucket_owner_backfill` / :func:`seed_entries_stream`.  Seeded
    buckets are owned by the backfill owner unconditionally (the
    backfill precedes the stream), seed rows never emit flags, and the
    stream never re-hashes the backfill corpus: at 100 TB the corpus is
    minhashed ONCE by the codegen'd batch pipeline and the stream starts
    from its buckets — per-bucket state rows, not per-document text."""
    entries = (
        docs.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(ts_col),
            F.posexplode(
                band_hash_array(text_col, bands, rows_per_band)
            ).alias("band", "bh"),
            F.lit(False).alias("seed"),
        )
    )
    if seed_entries is not None:
        entries = entries.unionByName(
            seed_entries.withWatermark("ts", watermark).select(
                F.col("doc_id").cast("long"),
                F.col("ts"),
                F.col("band").cast("int"),
                F.col("bh").cast("long"),
                F.lit(True).alias("seed"),
            )
        )
    return entries.groupBy("band", "bh").applyInPandasWithState(
        _bucket_fn,
        outputStructType=FLAG_OUTPUT,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def verify_neardup_flags(
    flags: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """The candidates->verify stage for :func:`streaming_neardup_flags`
    output — the composed consumer the module docstring describes
    (round-5 verdict task #4), mirroring the batch LSH pipeline's exact
    verification (operators/dedup.dedup_minhash_lsh): distinct
    ``(doc_id, first_doc_id)`` candidate pairs from the flag rows join
    both sides' shingle sets and pass an exact-Jaccard gate.

    Returns ``(doc_id, first_doc_id, jaccard)`` — one row per verified
    near-dup pair at ``>= threshold``; ``.select("doc_id").distinct()``
    is the drop set (see :func:`neardup_drop_ids`).  Because the stream
    and batch share one banding family (``band_entries``), every
    verified pair here is by construction also a verified pair of the
    batch pipeline run over the same corpus — asserted in
    tests/test_streaming_neardup.py.

    ``docs`` must cover both the flagged documents and their owners —
    the document store an ingest pipeline maintains anyway.  Run it per
    micro-batch via ``foreachBatch`` (flags arrive in append mode) or
    over the accumulated flag table; either way the expensive shingle
    work touches ONLY candidate documents (a broadcast-sized id
    semi-join at typical per-batch flag volumes), exactly like the
    incremental gate's stored-index path (operators/incremental.py).
    """
    from excelstream_spark.operators.dedup import shingle_sets

    pairs = (
        flags.select("doc_id", "first_doc_id")
        .filter(F.col("doc_id") != F.col("first_doc_id"))
        .distinct()
    )
    cand_ids = (
        pairs.select(F.col("doc_id").alias(id_col))
        .union(pairs.select(F.col("first_doc_id").alias(id_col)))
        .distinct()
    )
    sets_ = shingle_sets(
        docs.join(cand_ids, id_col, "left_semi"), text_col, id_col, k
    ).select("id", "sh")
    a = sets_.select(F.col("id").alias("doc_id"), F.col("sh").alias("sh_a"))
    b = sets_.select(
        F.col("id").alias("first_doc_id"), F.col("sh").alias("sh_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(a, "doc_id")
        .join(b, "first_doc_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "first_doc_id", "jaccard")
    )


def neardup_drop_ids(
    flags: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Drop DECISIONS from flag rows: the distinct flagged documents
    whose exact Jaccard against at least one of their bucket owners
    meets ``threshold`` — the drop-vs-verify endpoint of the batch
    pipeline, composed for the stream."""
    return (
        verify_neardup_flags(flags, docs, text_col, id_col, k, threshold)
        .select("doc_id")
        .distinct()
    )


def bucket_owner_backfill(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """BATCH computation of the stream state a backfill would leave
    behind: one ``(band, bh, doc_id=owner)`` row per occupied band
    bucket, owner = minimum document id in the bucket.  Runs the
    codegen'd batch minhash pipeline (operators/dedup.minhash_signatures
    — ONE HashAggregate of mins, not the stream's interpreted
    higher-order expressions), whose hash family is asserted identical
    to :func:`band_hash_array`; output feeds
    :func:`seed_entries_stream`."""
    from excelstream_spark.operators.dedup import band_entries, minhash_signatures

    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, k=3,
        num_hashes=bands * rows_per_band,
    )
    return (
        band_entries(sigs, bands, rows_per_band)
        .withColumnRenamed("id", "doc_id")
        .groupBy("band", "bh")
        .agg(F.min("doc_id").alias("doc_id"))
    )


def write_seed_batch(backfill: DataFrame, seed_dir: str, as_of: str) -> None:
    """Materialize a :func:`bucket_owner_backfill` result as the parquet
    seed fileset ``seed_entries_stream`` monitors.  ``as_of`` is the
    backfill completion time (an event-time literal): it anchors the
    seeded buckets' TTL, so a bucket not re-seen by the stream expires
    ``_BUCKET_TTL_MS`` after the BACKFILL time — the same horizon a
    bucket last touched by a live event gets.  Do NOT pass an ancient
    timestamp: the first watermark advance would expire every
    seed-only bucket (the cold-start expiry class the TTL anchor fix
    in stateful.py guards against)."""
    backfill.select(
        F.col("doc_id").cast("long"),
        F.lit(as_of).cast("timestamp").alias("ts"),
        F.col("band").cast("int"),
        F.col("bh").cast("long"),
    ).write.mode("overwrite").parquet(seed_dir)


def seed_entries_stream(spark, seed_dir: str) -> DataFrame:
    """readStream over a :func:`write_seed_batch` directory — the second
    source unioned into :func:`streaming_neardup_flags`.  All seed files
    are consumed in the first micro-batch (no maxFilesPerTrigger cap):
    state is fully seeded before any real document can take a bucket."""
    return spark.readStream.schema(
        "doc_id bigint, ts timestamp, band int, bh bigint"
    ).parquet(seed_dir)
