"""Provenance / URL canonical dedup (operators/provenance.py, r12
verdict #5): each canonicalization rule pinned individually, the
over-merge falsifier (real query params survive), and the min-id keep
closure."""

from __future__ import annotations

from pyspark.sql import functions as F

from excelstream_spark.operators.provenance import (
    canonicalize_url,
    dedup_url_canonical,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_each_rule(spark):
    """One case per rule: fragment, scheme, www+host case, trailing
    slash, utm strip + query sort — all five collapse onto the same
    canonical string."""
    urls = [
        "https://example1.com/a/9",
        "http://www.example1.com/a/9",
        "https://EXAMPLE1.com/a/9?utm_source=x",
        "https://example1.com/a/9/",
        "https://example1.com/a/9#frag",
    ]
    assert set(_canon(spark, urls)) == {"example1.com/a/9"}


def test_canonicalize_query_sort_but_no_overmerge(spark):
    """Parameter ORDER is not semantic (?a=1&b=2 == ?b=2&a=1) but
    parameter VALUES are: ?a=1 and ?a=2 stay distinct — the falsifier
    for a canonicalizer that drops all queries."""
    a, b, c, d = _canon(
        spark,
        [
            "https://e.com/p?a=1&b=2",
            "https://e.com/p?b=2&a=1",
            "https://e.com/p?a=1",
            "https://e.com/p?a=2",
        ],
    )
    assert a == b == "e.com/p?a=1&b=2"
    assert c == "e.com/p?a=1" and d == "e.com/p?a=2" and c != d


def test_canonicalize_path_case_preserved(spark):
    """Host case is insensitive, PATH case is not: /About and /about
    stay distinct while the host folds."""
    a, b = _canon(
        spark,
        ["https://E.com/About", "https://e.com/about"],
    )
    assert a == "e.com/About" and b == "e.com/about" and a != b


def test_dedup_url_min_id_keeper(spark):
    """The close keeps the min-id document per canonical group and
    reports group size; null doc_ids are dropped."""
    df = spark.createDataFrame(
        [
            (7, "https://x.com/a"),
            (3, "http://www.x.com/a#top"),
            (9, "https://x.com/b"),
            (None, "https://x.com/a"),
        ],
        "doc_id bigint, url string",
    )
    out = {
        r["doc_id"]: (r["url_canon"], r["keeper"], r["n_same"], r["kept"])
        for r in dedup_url_canonical(df).collect()
    }
    assert set(out) == {3, 7, 9}
    assert out[3] == ("x.com/a", 3, 2, True)
    assert out[7] == ("x.com/a", 3, 2, False)
    assert out[9] == ("x.com/b", 9, 1, True)


def test_dedup_url_group_close_is_partial_aggregated(spark):
    """The close is groupBy + join back (map-side partial aggregation
    — the hot-URL skew story), not a window: the executed plan carries
    HashAggregate stages and no Window node."""
    df = spark.createDataFrame(
        [(i, f"https://h.com/{i % 3}") for i in range(30)],
        "doc_id bigint, url string",
    )
    plan = (
        dedup_url_canonical(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan
