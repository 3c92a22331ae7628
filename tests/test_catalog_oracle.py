"""Every catalog query with an oracle is hash-compared against DuckDB at
sf0.001 — the local analogue of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import excelstream_spark.plans.relational  # noqa: F401
import excelstream_spark.plans.extension  # noqa: F401
import excelstream_spark.plans.io_parity  # noqa: F401
import excelstream_spark.plans.streaming_ops  # noqa: F401
import excelstream_spark.plans.scale  # noqa: F401
from excelstream_spark.plans.catalog import CATALOG
from excelstream_spark.tables import table_path

from .conftest import SF_DIR, assert_matches_oracle

ORACLE_QUERIES = [name for name, spec in CATALOG.items() if spec.oracle is not None]
ROWS_ONLY_QUERIES = [name for name, spec in CATALOG.items() if spec.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = CATALOG[name]
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = CATALOG[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_simhash_null_text_parity(spark, tmp_path):
    """Regression for the NULL/empty-text oracle asymmetry: a fixture
    that grows null or whitespace-only texts (the driver regenerates
    fixtures between rounds, and FIXTURES.md declares columns nullable)
    must not split the engines.  Under the shared round-7 convention
    token-less documents carry NO simhash signature on EITHER side
    (Spark explode of an empty/NULL token array = DuckDB unnest of an
    empty list): the injected rows — two NULL texts and one
    whitespace-only text — are absent from the pair output instead of
    forming a bogus signature-0 clique (which at corpus scale would be
    a quadratic mega-bucket of empty docs)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(table_path(SF_DIR, "documents"))
    extra = pa.table(
        {
            "doc_id": pa.array([900001, 900002, 900003], pa.int64()),
            "text": pa.array([None, None, "   "], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
            "source": pa.array(["null-fixture"] * 3, pa.string()),
            "n_chars": pa.array([0, 0, 3], pa.int64()),
        }
    )
    merged = pa.concat_tables(
        [src.select(extra.column_names), extra], promote_options="none"
    )
    out = tmp_path / "documents.parquet"
    pq.write_table(merged, str(out))

    spec = CATALOG["dedup_simhash"]
    df = spec.fn(spark, str(tmp_path))

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{out}')"
        )
        assert_matches_oracle(df, con, spec.oracle)
        # token-less docs are ABSENT from content sketching (no bogus
        # hamming-0 clique among unrelated empty documents)
        injected = df.filter("doc_a >= 900001 OR doc_b >= 900001").count()
        assert injected == 0
    finally:
        con.close()


def test_null_value_and_text_entry_symmetry(spark, tmp_path):
    """Null-injected rehearsal for the two entries the round-5 sweep
    caught: pack_sequences_audit must exclude NULL-text docs on BOTH
    sides (the packer's loud null guard stays for upstream bugs), and
    agg_percentiles_arrays must pin DuckDB's list() to Spark's skip-null
    / empty-group-to-[] semantics."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from excelstream_spark.plans.catalog import CATALOG

    d = tmp_path / "nulled"
    d.mkdir()
    docs = pq.read_table(table_path(SF_DIR, "documents"))
    extra_docs = pa.Table.from_pylist(
        [
            {"doc_id": 900000 + i, "text": None, "lang": None,
             "source": None, "n_chars": 0}
            for i in range(3)
        ],
        schema=docs.schema,
    )
    pq.write_table(pa.concat_tables([docs, extra_docs]), str(d / "documents.parquet"))
    ev = pq.read_table(table_path(SF_DIR, "events"))
    rows = ev.slice(0, 3).to_pylist()
    for i, r in enumerate(rows):
        r["event_id"] = 900000 + i
        r["value"] = None
        r["event_type"] = None
    pq.write_table(
        pa.concat_tables([ev, pa.Table.from_pylist(rows, schema=ev.schema)]),
        str(d / "events.parquet"),
    )

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    for name in ("pack_sequences_audit", "agg_percentiles_arrays"):
        spec = CATALOG[name]
        assert_matches_oracle(spec.fn(spark, str(d)), con, spec.oracle)
    con.close()


def test_driver_window_arithmetic():
    """The driver hash-checks only the FIRST 50 exported entries.  The
    window must be exactly full (a 51st non-demoted entry silently
    displaces an intended row — happened twice in round 7 before this
    test), every DEMOTED name must exist in the catalog, and the
    flagship rows must sit inside the window."""
    from excelstream_spark.plans.catalog import DEMOTED, spark_queries

    order = list(spark_queries())
    window = set(order[:50])
    non_demoted = [n for n in order if n not in DEMOTED]
    assert len(non_demoted) == 50, (
        f"window over/under-subscribed: {len(non_demoted)} non-demoted "
        "entries (rotate via DEMOTED in plans/catalog.py)"
    )
    assert window == set(non_demoted)
    missing = [n for n in DEMOTED if n not in CATALOG]
    assert not missing, f"DEMOTED names not registered: {missing}"
    for flagship in (
        "xlsx_roundtrip_lineitem",
        "training_corpus_pipeline",
        "training_corpus_pipeline_v2",
        "training_corpus_pipeline_v4",
        "training_corpus_pipeline_v5",  # r10: the multimodal capstone
        "sim_pq_topk_reranked",  # r10: the PQ family's hard-signal row
        "streaming_neardup_replay",
        "quality_classifier_filter",
        "lm_perplexity_buckets",
        "bm25_search_topk",
        # (multimodal_resize_sample rotated to the tail in r10, funding
        # v5; multimodal_fingerprints rotated to the tail in r11,
        # funding the video serving row — its pair semantics are
        # composed verbatim inside v5's in-window oracle;
        # video_dedup_containment rotated to the tail in r12, funding
        # the audio row — the SAME operator and the SAME shared SQL
        # close CTE stay in-window through audio_dedup_containment)
        "audio_dedup_containment",  # r12: the audio family's row
        "video_increment_containment",  # r11: the video SERVING row
        "cm_frequency_estimates",  # r11: the Count-Min family's row
        # (dedup_minhash_lsh rotated to the tail in r13, funding the
        # paired row — its LSH close is composed verbatim inside v2's
        # in-window oracle, stage 5, and its headline/POST_LADDER
        # bench treatment is unchanged)
        "dedup_paired_crossmodal",  # r13: the paired-dedup row
        "streaming_langid_gate",  # r13: the langid streaming row
        "langid_ngram_rank",  # r12: the language-ID family's row
        "sort_topk",
    ):
        assert flagship in window, f"{flagship} fell out of the window"


def test_folded_dedup_ngram_containment_oracle(spark, duck):
    """The containment close's DuckDB hash gate, moved verbatim from
    the folded-out catalog row (r10, policy rule 4): the operator keeps
    the same hash-level check it had as a registered entry (its plan is
    identical to the registered dedup_ngram_jaccard row's — only the
    closing arithmetic differs)."""
    from excelstream_spark.plans.extension import (
        _SQL_CONTAINMENT_PAIRS,
        dedup_ngram_containment,
    )

    assert_matches_oracle(
        dedup_ngram_containment(spark, SF_DIR),
        duck,
        f"""SELECT * FROM ({_SQL_CONTAINMENT_PAIRS})
            WHERE greatest(cont_a, cont_b) >= 0.8""",
    )


def test_folded_dedup_ngram_jaccard_oracle(spark, duck):
    """dedup_ngram_jaccard's DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r12, policy rule 4 — the fold the r11
    verdict itself proposed, funding the audio_dedup_containment
    promotion): its plan is identical to the r10-folded containment
    sibling's (same inverted-index pair pipeline, different closing
    arithmetic), the shingle pair close stays in-window via
    dedup_minhash_lsh (whose oracle IS the brute-force jaccard answer)
    and the composed v2 pipeline, and the standalone operator keeps
    the same hash-level check it had as a registered entry."""
    from excelstream_spark.plans.extension import (
        _SQL_JACCARD_05,
        dedup_ngram_jaccard,
    )

    assert_matches_oracle(
        dedup_ngram_jaccard(spark, SF_DIR), duck, _SQL_JACCARD_05
    )


def test_folded_dedup_exact_oracle(spark, duck):
    """dedup_exact's DuckDB hash gate, moved verbatim from the
    folded-out catalog row (late r10, policy rule 4 strongest form —
    funding the video_dedup_containment promotion): the md5-groupBy
    min-id shape stays in-window inside training_corpus_pipeline (v1)
    and v4's composed oracles, and the standalone operator keeps the
    same hash-level check it had as a registered entry."""
    from excelstream_spark.plans.extension import (
        _SQL_DEDUP_EXACT,
        dedup_exact,
    )

    assert_matches_oracle(dedup_exact(spark, SF_DIR), duck, _SQL_DEDUP_EXACT)


def test_folded_join_range_oracle(spark, duck):
    """The range-join row's DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r10, policy rule 4): range-join semantics
    keep their driver row via join_interval_binned."""
    from excelstream_spark.plans.relational import join_range

    assert_matches_oracle(
        join_range(spark, SF_DIR),
        duck,
        """
        SELECT o.o_orderkey,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_late_lines
        FROM orders o
        JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
        GROUP BY o.o_orderkey
        """,
    )


def test_folded_q5_region_revenue_oracle(spark, duck):
    """q5's DuckDB hash gate, moved verbatim from the folded-out
    catalog row (r11, policy rule 4 — funding the
    cm_frequency_estimates promotion): the multi-join + agg +
    dimension-broadcast shape stays in-window via q3_shipping_priority
    (the r7 demotion's own argument), and the standalone operator
    keeps the same hash-level check it had as a registered entry."""
    from excelstream_spark.plans.relational import (
        _SQL_Q5_REGION_REVENUE,
        q5_region_revenue,
    )

    assert_matches_oracle(
        q5_region_revenue(spark, SF_DIR), duck, _SQL_Q5_REGION_REVENUE
    )


def test_folded_events_time_rollup_oracle(spark, duck):
    """events_time_rollup's DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r12, policy rule 4 — funding the
    langid_ngram_rank promotion): the time-bucketed aggregation shape
    stays in-window via the streaming event-time rows and
    sessionize_events, and the standalone operator keeps the same
    hash-level check it had as a registered entry."""
    from excelstream_spark.plans.relational import (
        _SQL_EVENTS_TIME_ROLLUP,
        events_time_rollup,
    )

    assert_matches_oracle(
        events_time_rollup(spark, SF_DIR), duck, _SQL_EVENTS_TIME_ROLLUP
    )


def test_folded_subquery_thresholds_oracle(spark, duck):
    """subquery_thresholds' DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r12, policy rule 4 — funding the
    training_corpus_pipeline_v6 promotion): the subquery family keeps
    exists_not_exists in-window (the r7 demotion's own argument), and
    the standalone operator keeps the same hash-level check it had as
    a registered entry."""
    from excelstream_spark.plans.relational import (
        _SQL_SUBQUERY_THRESHOLDS,
        subquery_thresholds,
    )

    assert_matches_oracle(
        subquery_thresholds(spark, SF_DIR), duck, _SQL_SUBQUERY_THRESHOLDS
    )


def test_folded_corpus_shard_manifest_oracle(spark, duck):
    """corpus_shard_manifest's DuckDB hash gate, moved verbatim from
    the folded-out catalog row (r11, policy rule 4 STRONGEST form —
    funding the video_increment_containment promotion): the manifest
    aggregation is inlined verbatim inside training_corpus_pipeline_v4's
    in-window composed oracle and v5 carries its own manifest gate, so
    the fold loses no in-window shape coverage."""
    from excelstream_spark.plans import oracles as ORC
    from excelstream_spark.plans.extension import corpus_shard_manifest

    assert_matches_oracle(
        corpus_shard_manifest(spark, SF_DIR),
        duck,
        ORC.shard_manifest_oracle(n_shards=16),
    )

def test_folded_pivot_status_oracle(spark, duck):
    """pivot_status's DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r13, policy rule 4 — funding the
    dedup_url_canonical registration): the pivot is a conditional
    aggregation whose shape stays in-window via q1_pricing_summary and
    agg_distinct_count (the r8 demotion's own argument), and the
    standalone operator keeps the same hash-level check it had as a
    registered entry."""
    from excelstream_spark.plans.relational import (
        _SQL_PIVOT_STATUS,
        pivot_status,
    )

    assert_matches_oracle(pivot_status(spark, SF_DIR), duck, _SQL_PIVOT_STATUS)


def test_folded_string_functions_oracle(spark, duck):
    """string_functions' DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r13, policy rule 4 — funding the
    dedup_paired_crossmodal promotion's tail arithmetic): the
    scalar-string family keeps json_extract_props and
    text_token_pieces in-window (the r7 demotion's own argument) and
    string expressions flow through every text/dedup oracle."""
    from excelstream_spark.plans.relational import (
        _SQL_STRING_FUNCTIONS,
        string_functions,
    )

    assert_matches_oracle(
        string_functions(spark, SF_DIR), duck, _SQL_STRING_FUNCTIONS
    )


def test_folded_date_math_functions_oracle(spark, duck):
    """date_math_functions' DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r13, policy rule 4 — funding the
    streaming_langid_gate promotion's tail arithmetic): temporal
    semantics keep excel_serial_dates, join_asof_forward_tolerance and
    sessionize_events in-window (the r7 demotion's own argument)."""
    from excelstream_spark.plans.relational import (
        _SQL_DATE_MATH_FUNCTIONS,
        date_math_functions,
    )

    assert_matches_oracle(
        date_math_functions(spark, SF_DIR), duck, _SQL_DATE_MATH_FUNCTIONS
    )


def test_folded_streaming_classifier_gate_oracle(spark, duck):
    """streaming_classifier_gate's DuckDB hash gate, moved verbatim from
    the folded-out catalog row (r13, policy rule 4 — funding the
    warc_roundtrip_documents registration): the stateless-gate contract
    (redelivery idempotence + stream-vs-batch score parity) keeps its
    in-window representative via the r13-promoted streaming_langid_gate,
    and the classifier family keeps quality_classifier_filter in-window.
    This is the FULL availableNow replay gate (train in batch, score the
    twice-delivered stream mapside, oracle the unrolled-GD score), not a
    batch approximation."""
    from excelstream_spark.plans import oracles as ORC
    from excelstream_spark.plans.streaming_ops import (
        streaming_classifier_gate,
    )

    assert_matches_oracle(
        streaming_classifier_gate(spark, SF_DIR),
        duck,
        ORC.classifier_gate_oracle(),
    )


def test_folded_window_analytics_oracle(spark, duck):
    """window_analytics' DuckDB hash gate, moved verbatim from the
    folded-out catalog row (r13, policy rule 4 — funding the
    html_extract_text registration): the window family keeps
    window_topn_per_group and sessionize_events in-window (the r7
    demotion's own argument), and the consolidated frame suite
    (running sum, sliding average, lag/lead, rank/dense_rank, ntile,
    percent_rank) keeps the same hash-level check it had as a
    registered entry."""
    from excelstream_spark.plans.relational import (
        _SQL_WINDOW_ANALYTICS,
        window_analytics,
    )

    assert_matches_oracle(
        window_analytics(spark, SF_DIR), duck, _SQL_WINDOW_ANALYTICS
    )
