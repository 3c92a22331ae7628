"""KMV cardinality sketch (operators/sketches.py) — estimator accuracy,
the exact-below-k short-circuit, and sketch mergeability.  DuckDB
parity of the catalog row is covered by the full-catalog sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.sketches import (
    DEFAULT_K,
    kmv_estimate,
    kmv_sketch,
)


def _ints(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").cast("string").alias("x")
    )


def test_exact_below_k(spark):
    """Fewer distinct elements than k: the sketch holds all of them
    and the 'estimate' is the exact count."""
    df = _ints(spark, 100)
    out = kmv_estimate(kmv_sketch(df, F.col("x"), k=256), k=256).first()
    assert out["n_seen"] == 100
    assert out["est"] == 100.0


def test_estimator_accuracy_at_large_cardinality(spark):
    """50k distinct elements, k=256: KMV's relative error is
    ~1/sqrt(k-2) ~ 6%; assert within 4 standard errors (<= 25%)."""
    df = _ints(spark, 50_000)
    out = kmv_estimate(kmv_sketch(df, F.col("x"), k=256), k=256).first()
    assert out["n_seen"] == 256
    assert abs(out["est"] - 50_000) / 50_000 < 0.25


def test_duplicates_do_not_move_the_estimate(spark):
    """Cardinality, not count: tripling every row changes nothing."""
    base = _ints(spark, 10_000)
    tripled = base.unionAll(base).unionAll(base)
    a = kmv_estimate(kmv_sketch(base, F.col("x"), k=64), k=64).first()
    b = kmv_estimate(kmv_sketch(tripled, F.col("x"), k=64), k=64).first()
    assert a["est"] == b["est"]


def test_sketch_merge(spark):
    """The classic distributed-sketch property: union two corpora's
    sketches, re-rank, cut at k — identical to sketching the union
    directly (the k smallest of a union are among the two k-smallest
    sets)."""
    from pyspark.sql import Window

    a = _ints(spark, 30_000)
    b = _ints(spark, 30_000, offset=15_000)  # overlapping ranges
    k = 128
    sa = kmv_sketch(a, F.col("x"), k=k).select("h")
    sb = kmv_sketch(b, F.col("x"), k=k).select("h")
    w = Window.orderBy("h")
    merged = (
        sa.unionAll(sb)
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "h")
    )
    direct = kmv_sketch(a.unionAll(b), F.col("x"), k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_null_elements_skipped(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "x string"
    )
    out = kmv_estimate(kmv_sketch(df, F.col("x"), k=8), k=8).first()
    assert out["n_seen"] == 2


def test_grouped_kmv_exchange_is_rank_limit_bounded(spark):
    """r8 (r7 verdict #4): the grouped form's per-group exchange must
    be preceded by a Partial WindowGroupLimit — each map task ships at
    most k hashes per group, so a hot group moves <= k * n_partitions
    rows instead of all its distinct hashes.  Pins Catalyst's
    rank-limit pushdown (spark.sql.optimizer.windowGroupLimitThreshold)
    so a config/optimizer regression cannot silently reopen the
    hot-group funnel."""
    from excelstream_spark.operators.sketches import (
        DEFAULT_K,
        kmv_distinct_tokens_by_group,
    )

    df = spark.createDataFrame(
        [("en", "tok%d other" % i) for i in range(20)]
        + [("fr", "bonjour le monde")],
        "lang string, text string",
    )
    out = kmv_distinct_tokens_by_group(df, "lang")
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the Partial group-limit must sit BELOW the per-group exchange
    # (executed bottom-up: Partial cut -> shuffle -> Final cut)
    exch = [
        i for i, ln in enumerate(lines)
        if "Exchange hashpartitioning(grp" in ln
        and "h#" not in ln.split("hashpartitioning")[1].split(")")[0]
    ]
    partial = [
        i for i, ln in enumerate(lines)
        if "WindowGroupLimit" in ln and "Partial" in ln
        and f"{DEFAULT_K}" in ln
    ]
    final = [
        i for i, ln in enumerate(lines)
        if "WindowGroupLimit" in ln and "Final" in ln
    ]
    assert exch, f"no per-group exchange found:\n{plan}"
    assert partial, f"rank-limit pushdown missing (Partial):\n{plan}"
    assert final, f"rank-limit pushdown missing (Final):\n{plan}"
    # tree prints top-down: Final limit above the exchange, Partial
    # below it (i.e. larger line index = earlier in execution)
    assert min(final) < min(exch) < max(partial), plan


def _hh_oracle(num: int, den: int) -> str:
    return f"""
        WITH t AS (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(coalesce(text, '')),
                                           '\\s+'), x -> x <> '')) AS tok
                   FROM documents),
        n AS (SELECT count(*) AS c FROM t)
        SELECT tok, count(*)::BIGINT AS cnt FROM t GROUP BY tok
        HAVING count(*) * {den} > (SELECT c FROM n) * {num}
    """


def test_frequent_tokens_exact_matches_duckdb(spark, duck):
    """Heavy hitters with an integer cross-multiplied support
    threshold: the exact form hash-matches the plain SQL replay."""
    from excelstream_spark.operators.sketches import frequent_tokens_exact
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR, assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    assert_matches_oracle(
        frequent_tokens_exact(docs, support=(1, 200)),
        duck,
        _hh_oracle(1, 200),
    )


def test_frequent_tokens_mg_equals_exact(spark):
    """The bounded-memory Misra-Gries path must produce the IDENTICAL
    row set — the determinism argument (candidates are a superset of
    the true heavy hitters for capacity >= den/num regardless of
    partitioning; the exact recount erases sketch nondeterminism).
    Stressed on a skewed synthetic corpus with a deliberately TIGHT
    capacity, across two different partitionings."""
    from excelstream_spark.operators.sketches import (
        frequent_tokens_exact,
        frequent_tokens_mg,
    )

    rows = []
    for i in range(300):
        body = ["hot"] * 3 + [f"mid{i % 7}"] + [f"tail{i}a", f"tail{i}b"]
        rows.append((i, " ".join(body)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = sorted(
        map(tuple, frequent_tokens_exact(df, support=(1, 50)).collect())
    )
    assert want  # 'hot' (and the mids) clear the 1/50 bar
    for parts in (2, 11):
        got = sorted(
            map(
                tuple,
                frequent_tokens_mg(
                    df.repartition(parts), support=(1, 50), capacity=50
                ).collect(),
            )
        )
        assert got == want, parts


def test_frequent_tokens_mg_candidate_flow_is_bounded(spark):
    """Plan shape: the recount joins the exploded tokens against a
    BROADCAST candidate set (no full-vocabulary exchange on the sketch
    side)."""
    from excelstream_spark.operators.sketches import frequent_tokens_mg

    df = spark.createDataFrame(
        [(1, "a a a b c")], "doc_id bigint, text string"
    )
    plan = (
        frequent_tokens_mg(df, support=(1, 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan


def test_frequent_tokens_mg_capacity_clamped_to_guarantee(spark):
    """A caller-supplied capacity BELOW ceil(den/num) silently voids
    the superset guarantee (a heavy hitter could evict — an
    undetectable false negative), so it is clamped up to the floor
    (r8 advice #1): even capacity=1 must still produce the exact row
    set."""
    from excelstream_spark.operators.sketches import (
        frequent_tokens_exact,
        frequent_tokens_mg,
    )

    rows = []
    for i in range(300):
        body = ["hot"] * 3 + [f"mid{i % 7}"] + [f"tail{i}a", f"tail{i}b"]
        rows.append((i, " ".join(body)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = sorted(
        map(tuple, frequent_tokens_exact(df, support=(1, 50)).collect())
    )
    assert want
    got = sorted(
        map(
            tuple,
            frequent_tokens_mg(
                df.repartition(5), support=(1, 50), capacity=1
            ).collect(),
        )
    )
    assert got == want


def test_frequent_tokens_mg_equals_exact_property(spark):
    """Hypothesis hardening of the MG == exact claim: random small
    corpora (skew drawn from a zipf-ish token pool), random support
    denominators, random partitionings — the bounded-memory path must
    produce the identical row set every time (the superset + exact
    recount argument is distribution-free)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from excelstream_spark.operators.sketches import (
        frequent_tokens_exact,
        frequent_tokens_mg,
    )

    pool = [f"t{i}" for i in range(12)]

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(pool), min_size=0, max_size=8),
            min_size=1,
            max_size=40,
        ),
        den=st.integers(min_value=2, max_value=30),
        parts=st.integers(min_value=1, max_value=7),
    )
    def check(docs, den, parts):
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id bigint, text string",
        )
        want = sorted(
            map(
                tuple,
                frequent_tokens_exact(df, support=(1, den)).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                frequent_tokens_mg(
                    df.repartition(parts), support=(1, den), capacity=den
                ).collect(),
            )
        )
        assert got == want, (den, parts, docs)

    check()


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from excelstream_spark.plans.oracles import (  # noqa: E402
    cm_estimate_oracle as _cm_estimate_sql,
    cm_sketch_oracle as _cm_sketch_sql,
)


def test_cm_sketch_vs_duckdb_oracle(spark, duck):
    """The Count-Min counter table replays bit-for-bit in SQL: every
    cell hash (md5-60-bit mod width, per depth row) and every exact
    integer count — the sketch family's hash-gate convention."""
    from excelstream_spark.operators.sketches import cm_sketch_tokens
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR, assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents").select("text")
    sk = cm_sketch_tokens(docs, depth=4, width=256)
    assert_matches_oracle(sk, duck, _cm_sketch_sql(depth=4, width=256))


def test_cm_estimate_vs_duckdb_and_one_sided_bound(spark, duck):
    """Estimates replay in SQL too, and the classic one-sided guarantee
    holds exactly: est >= true count for EVERY distinct token (absent
    cells count as 0 via the left join, so a never-seen key estimates
    0, not a spurious min over present cells)."""
    from excelstream_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_tokens,
    )
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR, assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents").select("text")
    sk = cm_sketch_tokens(docs, depth=4, width=256).persist()
    from excelstream_spark.functions import text as TXT

    toks = docs.select(
        F.explode(
            TXT.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).alias("q")
    )
    est = cm_estimate(sk, toks, depth=4, width=256)
    assert_matches_oracle(
        est, duck, _cm_estimate_sql(depth=4, width=256)
    )
    true = toks.groupBy("q").agg(F.count(F.lit(1)).alias("cnt"))
    bad = (
        est.join(true, "q")
        .where(F.col("est") < F.col("cnt"))
        .count()
    )
    assert bad == 0
    # a key never inserted estimates 0 (all four cells may still be
    # occupied by other keys at width 256 — so use a wide sketch)
    wide = cm_sketch_tokens(docs, depth=4, width=1 << 20)
    novel = spark.createDataFrame(
        [("q-never-in-the-corpus-7f3a",)], "q string"
    )
    got = cm_estimate(wide, novel, depth=4, width=1 << 20).collect()
    assert got[0]["est"] == 0
    sk.unpersist()


def test_cm_shard_merge_equals_whole(spark):
    """Shard sketches merge by summing cells — the mergeability the
    100 TB build relies on (sketch each shard, sum, estimate once)."""
    from excelstream_spark.operators.sketches import cm_sketch_tokens
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    whole = cm_sketch_tokens(docs.select("text"), depth=3, width=128)
    a = cm_sketch_tokens(
        docs.where(F.col("doc_id") % 2 == 0).select("text"),
        depth=3,
        width=128,
    )
    b = cm_sketch_tokens(
        docs.where(F.col("doc_id") % 2 == 1).select("text"),
        depth=3,
        width=128,
    )
    merged = (
        a.unionAll(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cm_build_exchange_is_partially_aggregated(spark):
    """The build's exchange moves partial per-cell counts (<=
    depth*width rows per task), never raw token rows: a partial
    HashAggregate on (row, col) sits below the exchange."""
    from excelstream_spark.operators.sketches import cm_sketch_tokens
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("text")
    sk = cm_sketch_tokens(docs, depth=4, width=256)
    sk.write.format("noop").mode("overwrite").save()
    plan = sk._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("Exchange hashpartitioning(row")
    assert len(parts) > 1, plan[:2000]  # the exchange must exist at all
    assert "partial_count" in parts[1], plan[:2000]


# ---------------------------------------------------------------------------
# KMV set operations (Jaccard / intersection estimates)
# ---------------------------------------------------------------------------


def test_kmv_jaccard_exact_below_k(spark):
    """Below k the estimates are EXACT: two 6-element sets sharing 3
    elements -> jaccard 3/9, union 9, intersection 3."""
    from excelstream_spark.operators.sketches import kmv_jaccard

    a = spark.createDataFrame([(f"x{i}",) for i in range(6)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(3, 9)], "v string"
    )
    sa = kmv_sketch(a, F.col("v"), k=64)
    sb = kmv_sketch(b, F.col("v"), k=64)
    row = kmv_jaccard(sa, sb, k=64).collect()[0]
    assert row["n_union_seen"] == 9
    assert abs(row["jaccard_est"] - 3 / 9) < 1e-12
    assert row["union_est"] == 9.0
    assert abs(row["inter_est"] - 3.0) < 1e-12


def test_kmv_jaccard_vs_duckdb_oracle(spark, duck):
    """The whole set-overlap pipeline replays in SQL: per-side
    sketches, k-cut union, both-membership count, and the estimate
    arithmetic — bit-for-bit (the contamination-triage primitive)."""
    from excelstream_spark.functions import text as TXT
    from excelstream_spark.operators.sketches import kmv_jaccard
    from excelstream_spark.plans.oracles import kmv_jaccard_oracle
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR, assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")

    def toks(pred):
        return docs.where(pred).select(
            F.explode(
                TXT.tokens(F.coalesce(F.col("text"), F.lit("")))
            ).alias("tok")
        )

    sa = kmv_sketch(toks(F.col("doc_id") % 2 == 0), F.col("tok"), k=128)
    sb = kmv_sketch(toks(F.col("doc_id") % 2 == 1), F.col("tok"), k=128)
    assert_matches_oracle(
        kmv_jaccard(sa, sb, k=128), duck, kmv_jaccard_oracle(k=128)
    )


def test_kmv_jaccard_accuracy_at_scale(spark):
    """Above k the estimates stay close to truth: two 4000-element
    sets with 2000 shared (true J = 1/3) at k=256 land within the
    sketch's ~3-sigma band."""
    from excelstream_spark.operators.sketches import kmv_jaccard

    a = spark.createDataFrame(
        [(f"v{i}",) for i in range(4000)], "v string"
    )
    b = spark.createDataFrame(
        [(f"v{i}",) for i in range(2000, 6000)], "v string"
    )
    sa = kmv_sketch(a, F.col("v"), k=256)
    sb = kmv_sketch(b, F.col("v"), k=256)
    row = kmv_jaccard(sa, sb, k=256).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 0.10
    assert abs(row["union_est"] - 6000) / 6000 < 0.20
    assert abs(row["inter_est"] - 2000) / 2000 < 0.35


def test_cm_one_sided_bound_property(spark):
    """Hypothesis hardening of the Count-Min contract: random small
    corpora, random depth/width, random partitionings — est >= true
    for every key (distribution-free: min over cells each of which
    sums the key's own count plus non-negative collisions), and the
    merged shard sketches equal the whole-corpus sketch (cell counts
    are sums; partitioning cannot move them)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from excelstream_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_tokens,
    )

    pool = [f"t{i}" for i in range(10)]

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(pool), min_size=0, max_size=6),
            min_size=1,
            max_size=25,
        ),
        depth=st.integers(min_value=1, max_value=5),
        width=st.sampled_from([2, 8, 64]),
        parts=st.integers(min_value=1, max_value=5),
    )
    def check(docs, depth, width, parts):
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id bigint, text string",
        ).repartition(parts)
        sk = cm_sketch_tokens(df, depth=depth, width=width)
        qs = spark.createDataFrame([(t,) for t in pool], "q string")
        est = {
            r["q"]: r["est"]
            for r in cm_estimate(sk, qs, depth=depth, width=width).collect()
        }
        true = {t: 0 for t in pool}
        for toks in docs:
            for t in toks:
                true[t] += 1
        for t in pool:
            assert est[t] >= true[t], (t, est[t], true[t], depth, width)
        # total mass per sketch row == total token occurrences
        n = sum(true.values())
        per_row = {
            r["row"]: 0 for r in sk.select("row").distinct().collect()
        }
        for r in sk.collect():
            per_row[r["row"]] += r["cnt"]
        if n:
            assert all(v == n for v in per_row.values()), (per_row, n)

    check()


def test_kmv_jaccard_exact_below_k_property(spark):
    """Hypothesis hardening of the exact-below-k contract: any two
    random sets whose union fits in k yield EXACT jaccard/union/
    intersection (the sketches hold the full sets, the estimator's
    below-k branch is arithmetic identity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from excelstream_spark.operators.sketches import kmv_jaccard

    pool = [f"v{i}" for i in range(24)]

    @settings(max_examples=6, deadline=None)
    @given(
        sa=st.sets(st.sampled_from(pool), min_size=1, max_size=12),
        sb=st.sets(st.sampled_from(pool), min_size=1, max_size=12),
    )
    def check(sa, sb):
        a = spark.createDataFrame([(v,) for v in sa], "v string")
        b = spark.createDataFrame([(v,) for v in sb], "v string")
        row = kmv_jaccard(
            kmv_sketch(a, F.col("v"), k=64),
            kmv_sketch(b, F.col("v"), k=64),
            k=64,
        ).collect()[0]
        union, inter = len(sa | sb), len(sa & sb)
        assert row["n_union_seen"] == union
        assert row["union_est"] == float(union)
        assert abs(row["jaccard_est"] - inter / union) < 1e-12
        assert abs(row["inter_est"] - inter) < 1e-9

    check()


def test_kmv_jaccard_empty_sketches_defined(spark):
    """r10 advice #4: two EMPTY sketches yield the documented
    (0, 0.0, 0.0, 0.0) row — jaccard 0 by convention (no evidence of
    overlap), union/intersection 0 exactly — not a 0/0 null row."""
    from excelstream_spark.operators.sketches import kmv_jaccard

    e = spark.createDataFrame([], "v string")
    row = kmv_jaccard(
        kmv_sketch(e, F.col("v"), k=16),
        kmv_sketch(e, F.col("v"), k=16),
        k=16,
    ).collect()[0]
    assert row["n_union_seen"] == 0
    assert row["jaccard_est"] == 0.0
    assert row["union_est"] == 0.0
    assert row["inter_est"] == 0.0
