"""Corpus curation operators (operators/curation.py): split assignment,
cluster-aware contamination-safe splits, per-domain caps, token-budget
selection — each against a DuckDB SQL oracle plus invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators import curation as CU
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle


def test_assign_splits_vs_sql_oracle(spark, duck):
    """Split membership is an md5-derived pure function of (id, seed) —
    DuckDB reproduces every assignment bit-for-bit."""
    docs = load_table(spark, SF_DIR, "documents")
    got = CU.assign_splits(docs, seed=7).select("doc_id", "split")
    assert_matches_oracle(
        got,
        duck,
        """
        SELECT doc_id,
               CASE WHEN b < 9000 THEN 'train'
                    WHEN b < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substr(md5('7:' || doc_id), 1, 8))::BIGINT
                       % 10000 AS b
              FROM documents)
        """,
    )


def test_assign_splits_semantics(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = CU.assign_splits(docs, seed=0)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    # weights hold loosely on a real corpus slice (binomial spread)
    assert counts["train"] / total == pytest.approx(0.9, abs=0.05)
    assert set(counts) == {"train", "val", "test"}
    # deterministic: re-run identical, different seed differs somewhere
    a = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"]
         for r in CU.assign_splits(docs, seed=0).select("doc_id", "split").collect()}
    c = {r["doc_id"]: r["split"]
         for r in CU.assign_splits(docs, seed=1).select("doc_id", "split").collect()}
    assert a == b
    assert a != c
    with pytest.raises(ValueError, match="sum to 1"):
        CU.assign_splits(docs, weights={"train": 0.5, "test": 0.4})


def test_cluster_aware_splits(spark):
    """Near-dup clusters land in ONE split (no train/test straddle), and
    docs outside any cluster match plain assign_splits exactly."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 201)], "doc_id long, text string"
    )
    # components: {1,2,3,4} (chained) and {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    out = CU.cluster_aware_splits(docs, pairs, seed=3)
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split) == 200
    assert len({split[i] for i in (1, 2, 3, 4)}) == 1
    assert split[10] == split[11]
    # cluster hashes its representative (min id)
    plain = {
        r["doc_id"]: r["split"]
        for r in CU.assign_splits(docs, seed=3).collect()
    }
    assert split[2] == plain[1]
    assert split[11] == plain[10]
    # singletons: identical to plain hashing
    for i in (5, 6, 7, 100, 200):
        assert split[i] == plain[i]


def test_cap_per_domain_vs_sql_oracle(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    got = CU.cap_per_domain(
        docs, domain_col="source", max_docs=25,
        order_col="n_chars", descending=True,
    ).select("doc_id", "source", "n_chars")
    assert_matches_oracle(
        got,
        duck,
        """
        SELECT doc_id, source, n_chars
        FROM (SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents)
        WHERE rn <= 25
        """,
    )
    # every domain at or under the cap
    over = (
        CU.cap_per_domain(docs, max_docs=25, order_col="n_chars",
                          descending=True)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 25).count()
    )
    assert over == 0


def test_token_budget_head_vs_sql_oracle(spark, duck):
    """The two-phase partition-parallel prefix sum selects EXACTLY the
    rows the naive global-window SQL selects."""
    docs = load_table(spark, SF_DIR, "documents")
    got = CU.token_budget_head(
        docs, budget=30_000, token_col="n_chars",
        order_col="n_chars", descending=True, num_partitions=8,
    ).select("doc_id", "n_chars")
    assert_matches_oracle(
        got,
        duck,
        """
        SELECT doc_id, n_chars
        FROM (SELECT doc_id, n_chars,
                     sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents)
        WHERE cum <= 30000
        """,
    )


def test_token_budget_head_scalable_plan(spark):
    """The plan range-partitions (parallel windows), never collapsing to
    a single-partition global window."""
    docs = load_table(spark, SF_DIR, "documents")
    out = CU.token_budget_head(
        docs, budget=10_000, token_col="n_chars",
        order_col="n_chars", num_partitions=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "singlepartition" not in plan.lower()
    # budget smaller than any row -> empty, not an error
    assert CU.token_budget_head(
        docs, budget=0, token_col="n_chars", order_col="doc_id"
    ).count() == 0


def test_corpus_report_vs_sql_oracle(spark, duck):
    """The one-pass data card reproduces in SQL: CUBE over
    (source, lang) with doc/token/char totals, mean and exact
    interpolated quality percentiles, and the grouping bitmask."""
    from .conftest import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    got = CU.corpus_report(docs)
    oracle = """
        WITH b AS (
          SELECT source, lang,
                 len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS tok,
                 length(coalesce(text, '')) AS chars,
                 0.4 * least(1.0, len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), x -> x <> '')) / 50.0)
               + 0.3 * least(1.0, (len(list_filter(
                     list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), x -> x <> ''),
                     t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                                'for','on','with','as','at','by','from','that','this')))
                     * 1.0 / len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), x -> x <> ''))) * 5)
               + 0.3 * (1 - least(1.0, (length(regexp_replace(coalesce(text, ''), '[^.,;:!?]', '', 'g'))
                     * 1.0 / length(coalesce(text, ''))) * 10)) AS q
          FROM documents
        )
        SELECT source, lang,
               CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
               count(*) AS n_docs,
               sum(tok) AS n_tokens,
               sum(chars) AS n_chars,
               round(avg(q), 6) AS mean_quality_r,
               round(quantile_cont(q, 0.5), 6) AS p50_quality_r,
               round(quantile_cont(q, 0.95), 6) AS p95_quality_r
        FROM b
        GROUP BY CUBE (source, lang)
    """
    assert_matches_oracle(got, duck, oracle)
    # the cube actually fans out: grand total + per-dim + cross rows
    gids = {r.gid for r in got.select("gid").distinct().collect()}
    assert gids == {0, 1, 2, 3}


def test_shard_manifest_detects_reexport_divergence(spark):
    """The manifest's purpose: a re-export that changes one document's
    text flips EXACTLY that document's shard hash (counts unchanged);
    dropping a document changes its shard's count too."""
    from pyspark.sql import functions as F

    from excelstream_spark.operators.curation import (
        shard_assign,
        shard_manifest,
    )
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = {r["shard"]: r for r in shard_manifest(docs, n_shards=8).collect()}
    assert sum(r["n_docs"] for r in base.values()) == docs.where(
        F.col("doc_id").isNotNull()
    ).count()

    victim = docs.select("doc_id").first()["doc_id"]
    vshard = docs.select(
        shard_assign("doc_id", 8).alias("s")
    ).where(F.col("doc_id") == victim).first()["s"]

    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.lit("tampered text")).otherwise(
            F.col("text")
        ),
    )
    mut = {r["shard"]: r for r in shard_manifest(mutated, n_shards=8).collect()}
    for s in base:
        if s == vshard:
            assert mut[s]["content_hash"] != base[s]["content_hash"]
            assert mut[s]["n_docs"] == base[s]["n_docs"]
        else:
            assert mut[s]["content_hash"] == base[s]["content_hash"]

    dropped = docs.where(F.col("doc_id") != victim)
    drp = {r["shard"]: r for r in shard_manifest(dropped, n_shards=8).collect()}
    assert drp[vshard]["n_docs"] == base[vshard]["n_docs"] - 1
    assert drp[vshard]["content_hash"] != base[vshard]["content_hash"]


def test_epoch_order_reproducible_and_epoch_dependent(spark):
    """The data-loader contract: same (seed, epoch) replays the exact
    order; different epochs genuinely reshuffle; positions are a
    1..n_shard_docs permutation within every shard."""
    from pyspark.sql import functions as F

    from excelstream_spark.operators.curation import epoch_order
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    e0a = sorted(map(tuple, epoch_order(docs, epoch=0).collect()))
    e0b = sorted(map(tuple, epoch_order(docs, epoch=0).collect()))
    e1 = sorted(map(tuple, epoch_order(docs, epoch=1).collect()))
    assert e0a == e0b
    assert e0a != e1  # a different epoch moves at least one position
    # shard membership is epoch-independent (only the order reshuffles)
    assert {(t[0], t[1]) for t in e0a} == {(t[0], t[1]) for t in e1}
    # positions form 1..k per shard
    per_shard: dict[int, list[int]] = {}
    for doc_id, shard, pos in e0a:
        per_shard.setdefault(shard, []).append(pos)
    for shard, positions in per_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_manifest_diff_names_exact_reexport_shards(spark):
    """The re-export audit loop: change one document's text, drop one,
    add one — the manifest diff must name exactly the affected shards
    with the right statuses, and report nothing for untouched shards."""
    from excelstream_spark.operators.curation import (
        manifest_diff,
        shard_assign,
        shard_manifest,
    )

    docs = [(i, f"document number {i} body text here") for i in range(40)]
    old_df = spark.createDataFrame(docs, "doc_id bigint, text string")
    n_shards = 8
    # shard of each touched doc (read off the same assignment fn)
    sh = {
        r["doc_id"]: r["s"]
        for r in old_df.select(
            "doc_id", shard_assign("doc_id", n_shards).alias("s")
        ).collect()
    }
    new_docs = [
        (i, t + " EDITED") if i == 3 else (i, t)
        for i, t in docs
        if i != 7
    ] + [(100, "a brand new document appears")]
    new_df = spark.createDataFrame(new_docs, "doc_id bigint, text string")
    old_m = shard_manifest(old_df, n_shards=n_shards)
    new_m = shard_manifest(new_df, n_shards=n_shards)
    diff = {r["shard"]: r for r in manifest_diff(old_m, new_m).collect()}
    sh100 = spark.createDataFrame([(100,)], "doc_id bigint").select(
        shard_assign("doc_id", n_shards).alias("s")
    ).first()["s"]
    touched = {sh[3], sh[7], sh100}
    assert set(diff) == touched  # nothing else flagged
    for s in touched:
        assert diff[s]["status"] in ("changed", "added", "removed")
    # idempotence: identical manifests diff to nothing
    assert manifest_diff(old_m, old_m).count() == 0
