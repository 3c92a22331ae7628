"""Bloom-filter membership artifact (operators/bloom.py): DuckDB replay
of the filter itself, exact parity of the verified gate, the
no-false-negative guarantee, incremental build associativity, and the
zero-shuffle probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from excelstream_spark.operators import bloom as BL
from excelstream_spark.operators import incremental as INC
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle

def _frames(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    redeliv = (
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 20))
        .withColumn("doc_id", F.col("doc_id") + 100_000)
    ).select(*docs.columns)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(redeliv)
    return corpus, new


def test_bloom_flags_oracle(spark, duck):
    """The probe's (doc_id, maybe_dup) flags replay bit-for-bit in
    DuckDB — filter build and probe are pure md5 + integer arithmetic
    (shared CTE builder: plans/oracles.bloom_flag_ctes, the same SQL
    the catalog entry's driver oracle uses)."""
    from excelstream_spark.plans.oracles import bloom_flag_ctes

    corpus, new = _frames(spark)
    bloom = BL.bloom_build(INC.corpus_fingerprints(corpus))
    got = BL.bloom_flag_increment(new, bloom).select("doc_id", "maybe_dup")
    assert_matches_oracle(
        got,
        duck,
        f"WITH {bloom_flag_ctes(BL.DEFAULT_N_BITS, BL.DEFAULT_N_HASHES)} "
        "SELECT doc_id, maybe_dup FROM flags",
    )


def test_bloom_verified_gate_equals_exact(spark):
    """bloom prefilter + fingerprint verification == the plain exact
    anti-join (no false negatives -> the composition is lossless)."""
    corpus, new = _frames(spark)
    fps = INC.corpus_fingerprints(corpus)
    bloom = BL.bloom_build(fps)
    got = sorted(
        r["doc_id"]
        for r in BL.dedup_increment_bloom(new, bloom, corpus_fps=fps)
        .select("doc_id")
        .collect()
    )
    want = sorted(
        r["doc_id"]
        for r in INC.dedup_increment_exact(new, fps).select("doc_id").collect()
    )
    assert got == want and len(want) > 0


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every re-delivered corpus text MUST flag maybe_dup (the Bloom
    guarantee); genuinely-new documents flag at ~the sizing FP rate
    (~1e-4 here — assert < 1% so the test is not flaky by design)."""
    corpus, new = _frames(spark)
    fps = INC.corpus_fingerprints(corpus)
    bloom = BL.bloom_build(fps)
    flagged = BL.bloom_flag_increment(new, bloom).persist()
    try:
        dup_missed = (
            flagged.join(fps, "fp", "left_semi")
            .where(~F.col("maybe_dup"))
            .count()
        )
        assert dup_missed == 0, "false negative: violates the Bloom guarantee"
        truly_new = flagged.join(fps, "fp", "left_anti")
        n_new = truly_new.count()
        n_fp = truly_new.where(F.col("maybe_dup")).count()
        assert n_new > 100
        assert n_fp / n_new < 0.01, (n_fp, n_new)
    finally:
        flagged.unpersist()


def test_bloom_incremental_build_associative(spark):
    """OR-merging two half-corpus filters == building one filter over
    the union — the incremental-maintenance claim (bit_or associates)."""
    corpus, _ = _frames(spark)
    fps = INC.corpus_fingerprints(corpus).persist()
    try:
        a = fps.where(F.substring("fp", 1, 1) < F.lit("8"))
        b = fps.where(F.substring("fp", 1, 1) >= F.lit("8"))
        merged = (
            BL.bloom_build(a)
            .unionByName(BL.bloom_build(b))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        whole = BL.bloom_build(fps)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0
    finally:
        fps.unpersist()


def test_bloom_gate_plan_shuffle_free(spark, tmp_path):
    """The steady-state verified gate (stored fingerprint table + stored
    filter) runs with ZERO shuffle exchanges: n_hashes broadcast probes,
    a broadcast semi-join that streams the corpus artifact map-side, and
    a broadcast anti-join close."""
    corpus, new = _frames(spark)
    fp_path = str(tmp_path / "fps")
    bl_path = str(tmp_path / "bloom")
    fps = INC.corpus_fingerprints(corpus)
    fps.write.parquet(fp_path)
    BL.bloom_build(fps).write.parquet(bl_path)
    gate = BL.dedup_increment_bloom(
        new,
        spark.read.parquet(bl_path),
        corpus_fps=spark.read.parquet(fp_path),
    )
    plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= BL.DEFAULT_N_HASHES + 2, (
        plan[:2000]
    )


def test_bloom_probe_bigint_keys(spark):
    """The factored-out raw probe (r9) works over non-text bigint keys
    (the media-fingerprint case): every built key flags True (no false
    negatives), absent keys flag False at this sizing, NULL keys flag
    False."""
    from excelstream_spark.operators.bloom import bloom_build, bloom_probe

    members = [5, -3, 99999999999, 0]
    built = spark.createDataFrame([(k,) for k in members], "fp_a bigint")
    bloom = bloom_build(built, fp_col="fp_a")
    probe_rows = [(k, True) for k in members] + [
        (7, False),
        (-99, False),
        (123456789012345, False),
        (None, False),
    ]
    df = spark.createDataFrame(probe_rows, "fp_a bigint, is_member boolean")
    out = bloom_probe(df, bloom, fp_col="fp_a").collect()
    for r in out:
        if r["is_member"]:
            assert r["maybe_dup"] is True, r   # guarantee: no false negatives
        else:
            assert r["maybe_dup"] is False, r  # deterministic at this sizing


def test_bloom_probe_rejects_mismatched_sizing(spark):
    """A filter built with MORE bits than the probe assumes must raise
    (r9 review: a silent mismatch voids the no-false-negative
    guarantee); same-sizing probes are unaffected."""
    import pytest

    from excelstream_spark.operators.bloom import bloom_build, bloom_probe

    fps = spark.createDataFrame([(i,) for i in range(64)], "fp_a bigint")
    big = bloom_build(fps, n_bits=1 << 20, fp_col="fp_a")
    df = spark.createDataFrame([(1,)], "fp_a bigint")
    with pytest.raises(ValueError, match="different n_bits"):
        bloom_probe(df, big, fp_col="fp_a")          # default 1<<17
    out = bloom_probe(df, big, fp_col="fp_a", n_bits=1 << 20)
    assert "maybe_dup" in out.columns


def test_bloom_meta_sizing_travels_with_artifact(spark):
    """r9 advice #1: with_meta=True carries n_bits/n_hashes in the
    artifact.  bloom_sizing decodes it; a probe at ANY wrong sizing —
    including built-SMALLER-than-probed, undetectable by the range
    guard — raises; the matching probe is unaffected and flags
    identically to the meta-less artifact (the metadata row never
    joins); validate=False skips the check entirely."""
    import pytest

    from excelstream_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
        bloom_sizing,
    )

    fps = spark.createDataFrame([(i,) for i in range(64)], "fp_a bigint")
    small = bloom_build(
        fps, n_bits=1 << 12, n_hashes=5, fp_col="fp_a", with_meta=True
    )
    assert bloom_sizing(small) == (1 << 12, 5)
    plain = bloom_build(fps, n_bits=1 << 12, n_hashes=5, fp_col="fp_a")
    assert bloom_sizing(plain) is None

    df = spark.createDataFrame([(1,), (9999,)], "fp_a bigint")
    # built SMALLER than probed: the range guard cannot see this
    # direction, the metadata equality can
    with pytest.raises(ValueError, match="sizing must match"):
        bloom_probe(df, small, fp_col="fp_a", n_bits=1 << 17, n_hashes=5)
    with pytest.raises(ValueError, match="sizing must match"):
        bloom_probe(df, small, fp_col="fp_a", n_bits=1 << 12, n_hashes=7)
    ok = bloom_probe(
        df, small, fp_col="fp_a", n_bits=1 << 12, n_hashes=5
    ).collect()
    base = bloom_probe(
        df, plain, fp_col="fp_a", n_bits=1 << 12, n_hashes=5
    ).collect()
    assert sorted(map(tuple, ok)) == sorted(map(tuple, base))
    # validate=False: no job, no error even at a wrong sizing (the
    # caller's responsibility — e.g. sizing checked once at load time)
    unchecked = bloom_probe(
        df,
        small,
        fp_col="fp_a",
        n_bits=1 << 17,
        n_hashes=5,
        validate=False,
    )
    assert "maybe_dup" in unchecked.columns
    # the metadata row survives the associative incremental rebuild
    half_a = fps.where(F.col("fp_a") < 32)
    half_b = fps.where(F.col("fp_a") >= 32)
    rebuilt = (
        bloom_build(half_a, n_bits=1 << 12, n_hashes=5, fp_col="fp_a",
                    with_meta=True)
        .unionByName(bloom_build(half_b, n_bits=1 << 12, n_hashes=5,
                                 fp_col="fp_a", with_meta=True))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert bloom_sizing(rebuilt) == (1 << 12, 5)
    assert rebuilt.where(F.col("word") < 0).count() == 1


def test_bloom_meta_rejects_mixed_sizing_merge(spark):
    """r10 review finding: n_hashes=7 is a bitwise SUPERSET of 5, so a
    naive single-word metadata row would bit_or-merge two
    differently-sized builds into a VALID-looking '7' — and probing 7
    positions against keys inserted with 5 silently false-negatives.
    The meta word is derived from the sizing, so the merge leaves two
    distinct negative-word rows and every decoder raises."""
    import pytest

    from excelstream_spark.operators.bloom import (
        bloom_build,
        bloom_probe,
        bloom_sizing,
    )

    fps = spark.createDataFrame([(i,) for i in range(32)], "fp_a bigint")
    merged = (
        bloom_build(fps, n_bits=1 << 12, n_hashes=5, fp_col="fp_a",
                    with_meta=True)
        .unionByName(bloom_build(fps, n_bits=1 << 12, n_hashes=7,
                                 fp_col="fp_a", with_meta=True))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    with pytest.raises(ValueError, match="conflicting sizing"):
        bloom_sizing(merged)
    df = spark.createDataFrame([(1,)], "fp_a bigint")
    with pytest.raises(ValueError, match="conflicting sizing"):
        bloom_probe(df, merged, fp_col="fp_a", n_bits=1 << 12, n_hashes=7)


def test_bloom_probe_adopts_meta_sizing(spark):
    """With n_bits/n_hashes omitted, the probe adopts the artifact's
    own metadata sizing inside its single validation aggregation (the
    one-job sizing-travels-with-the-artifact path): every member still
    flags True at the adopted sizing."""
    from excelstream_spark.operators.bloom import bloom_build, bloom_probe

    members = [11, 22, 33]
    fps = spark.createDataFrame([(k,) for k in members], "fp_a bigint")
    bloom = bloom_build(
        fps, n_bits=1 << 12, n_hashes=3, fp_col="fp_a", with_meta=True
    )
    df = spark.createDataFrame(
        [(k,) for k in members] + [(777,)], "fp_a bigint"
    )
    out = {r["fp_a"]: r["maybe_dup"] for r in
           bloom_probe(df, bloom, fp_col="fp_a").collect()}
    assert all(out[k] is True for k in members)  # no false negatives
