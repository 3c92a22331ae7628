"""The v6 CROSS-MODAL capstone (r11 verdict #5): hard-signal semantics
— DUP twins collapse under keep-best, REORDER twins (same frame SET,
reversed sequence) SURVIVE because the order-aware verify refuses to
call them duplicates.  A set-only dedup provably diverges, which is
what makes the order machinery load-bearing under the driver hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from excelstream_spark.plans import oracles as ORC
from excelstream_spark.tables import load_table

from .conftest import SF_DIR


def _v6_frames_and_corpus(spark, n_docs=24):
    """The v6 construction over a small fixture slice, returning the
    twinned video frames plus the corpus with quality scores (mirrors
    plans/extension.training_corpus_pipeline_v6's video branch)."""
    from excelstream_spark.operators.video import (
        synthesize_video_payloads,
        video_frame_fingerprints,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id").isNotNull() & (F.col("doc_id") % 4 == 1))
        .where(F.col("doc_id") < n_docs * 4)
    )
    base = video_frame_fingerprints(synthesize_video_payloads(docs)).select(
        "doc_id", "frame_idx", "n_frames", "fp_a"
    )
    dup = base.select(
        (F.col("doc_id") + F.lit(ORC.V6_DUP_OFFSET)).alias("doc_id"),
        "frame_idx", "n_frames", "fp_a",
    )
    reo = base.select(
        (F.col("doc_id") + F.lit(ORC.V6_REORDER_OFFSET)).alias("doc_id"),
        (F.col("n_frames") - 1 - F.col("frame_idx")).alias("frame_idx"),
        "n_frames", "fp_a",
    )
    return docs, base.unionByName(dup).unionByName(reo)


def test_v6_dup_verifies_reorder_does_not(spark):
    """Per base clip: (base, base+DUP) is a seq_verified pair;
    (base, base+REORDER) and (base+DUP, base+REORDER) are CANDIDATES
    (identical fingerprint sets — containment 1) but fail the order
    verify.  This is the exact decision the v6 manifest hash gates."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )

    docs, frames = _v6_frames_and_corpus(spark)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert ids, "fixture slice is empty"
    pairs = {
        (r["vid_a"], r["vid_b"]): (r["containment"], r["seq_verified"])
        for r in dedup_video_containment_verified(
            frames, threshold=0.8, seq_threshold=0.8, n=2
        ).collect()
    }
    dup_off, reo_off = ORC.V6_DUP_OFFSET, ORC.V6_REORDER_OFFSET
    for d in ids:
        c, ok = pairs[(d, d + dup_off)]
        assert c == 1.0 and ok, f"dup twin of {d} must order-verify"
        # the reorder twin is a candidate (same set) but NOT verified;
        # clips with >= 3 frames cannot share a single ordered shingle
        # with their reversal (2-frame clips share none either unless
        # both frames hash equal, which the fixture arithmetic avoids)
        c, ok = pairs[(d, d + reo_off)]
        assert c == 1.0 and not ok, f"reorder twin of {d} must fail verify"
        c, ok = pairs[(d + dup_off, d + reo_off)]
        assert c == 1.0 and not ok


def test_v6_keep_best_drops_dups_keeps_reorders(spark):
    """Through components + keep-best: exactly one of each
    {base, dup-twin} cluster survives (the better q), and EVERY
    reorder twin survives — the set-only variant (edges without the
    verify filter) provably drops them, so the manifest gate separates
    the two designs."""
    from excelstream_spark.operators.components import dedup_keep_best
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )

    docs, frames = _v6_frames_and_corpus(spark)
    dup_off, reo_off = ORC.V6_DUP_OFFSET, ORC.V6_REORDER_OFFSET
    corpus = (
        docs.select("doc_id", F.col("n_chars").alias("q"))
        .unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(dup_off)).alias("doc_id"),
                (F.col("n_chars") + F.col("doc_id") % 5 - 2).alias("q"),
            )
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(reo_off)).alias("doc_id"),
                (F.col("n_chars") - 1).alias("q"),
            )
        )
    )
    verified_rows = dedup_video_containment_verified(
        frames, threshold=0.8, seq_threshold=0.8, n=2
    ).collect()
    verified_of: dict[int, set[int]] = {}
    for r in verified_rows:
        if r["seq_verified"]:
            verified_of.setdefault(r["vid_a"], set()).add(r["vid_b"])
            verified_of.setdefault(r["vid_b"], set()).add(r["vid_a"])
    edges = spark.createDataFrame(
        [
            (r["vid_a"], r["vid_b"])
            for r in verified_rows
            if r["seq_verified"]
        ],
        "doc_a bigint, doc_b bigint",
    )
    kept = {
        r["doc_id"]
        for r in dedup_keep_best(
            corpus, edges, "q", id_a="doc_a", id_b="doc_b"
        ).collect()
    }
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    # base/dup clusters: never keep both members
    for d in ids:
        assert not (d in kept and (d + dup_off) in kept)
    # a reorder twin with NO verified edge at all (its reversed
    # sequence genuinely matches nothing in order — the common case;
    # fixture-level frame collisions CAN order-match a reversal
    # against some other clip, and those drops are correct) must
    # always survive the order-aware design
    lone_reorders = [
        d for d in ids if not verified_of.get(d + reo_off)
    ]
    assert lone_reorders, "fixture produced no order-unmatched reorders"
    for d in lone_reorders:
        assert (d + reo_off) in kept, "order verify must keep reorders"
    # the set-only design diverges exactly there: unverified candidate
    # edges (same fingerprint SET) pull those reorder twins into their
    # base clusters and some of them drop
    set_edges = spark.createDataFrame(
        [(r["vid_a"], r["vid_b"]) for r in verified_rows],
        "doc_a bigint, doc_b bigint",
    )
    kept_set = {
        r["doc_id"]
        for r in dedup_keep_best(
            corpus, set_edges, "q", id_a="doc_a", id_b="doc_b"
        ).collect()
    }
    dropped_lone_reorders = [
        d for d in lone_reorders if (d + reo_off) not in kept_set
    ]
    assert dropped_lone_reorders, (
        "set-only dedup should wrongly drop some order-unmatched "
        "reorder twins — otherwise the order verify isn't "
        "load-bearing in this gate"
    )
