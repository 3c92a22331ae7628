"""BM25 retrieval: bit-match vs a pure-Python reference, ranking
semantics, tie-breaks, edge inputs."""

from __future__ import annotations

import math
from decimal import Decimal

from excelstream_spark.operators.retrieval import B, K1, bm25_topk

DOCS = [
    (0, "spark join join hash"),
    (1, "spark spark spark"),
    (2, "window agg window"),
    (3, "the quick brown fox"),
    (4, ""),  # token-less: counts toward N/avgdl, never scored
    (5, None),  # NULL text likewise
    (6, "hash join spark window"),
]
QUERIES = {"qa": "spark join", "qb": "window", "qc": "zebra"}


def _py_reference(docs, queries, k):
    toks = {d: (t or "").lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / float(n)
    out = []
    for qid, qtext in sorted(queries.items()):
        terms = sorted(set((qtext or "").lower().split()))
        scores = {}
        for d, tks in toks.items():
            total = Decimal(0)
            hit = False
            for t in terms:
                tf = tks.count(t)
                if not tf:
                    continue
                hit = True
                df = sum(1 for v in toks.values() if t in v)
                idf = round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)), 9)
                c = round(
                    idf * (tf / (tf + K1 * ((1.0 - B) + B * (len(tks) / avgdl)))),
                    9,
                )
                total += Decimal(f"{c:.15f}")
            if hit:
                scores[d] = round(float(total), 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, d, s, i + 1) for i, (d, s) in enumerate(ranked)
        )
    return sorted(out)


def test_bit_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = sorted(
        (r["query_id"], r["doc_id"], r["score_r"], r["rank"])
        for r in bm25_topk(df, QUERIES, k=3).collect()
    )
    assert got == _py_reference(DOCS, QUERIES, 3)


def test_ranking_prefers_matching_rare_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(df, QUERIES, k=10).collect()
    }
    # qa="spark join": doc 0 has join x2 + spark; doc 6 has both once;
    # doc 1 spark-only. Both-term docs outrank the single-term doc.
    qa_order = [rows[("qa", i)] for i in (1, 2, 3)]
    assert set(qa_order[:2]) == {0, 6} and qa_order[2] == 1
    # qb="window": only docs 2 and 6 match; tf=2 wins
    assert rows[("qb", 1)] == 2 and rows[("qb", 2)] == 6
    # qc="zebra": no corpus hits -> no rows at all
    assert not any(q == "qc" for q, _ in rows)


def test_k_truncates_per_query(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = bm25_topk(df, {"q": "spark"}, k=1).collect()
    assert len(out) == 1 and out[0]["rank"] == 1


def test_repeated_query_terms_count_once(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    once = {r["doc_id"]: r["score_r"] for r in bm25_topk(df, {"q": "spark"}, k=10).collect()}
    thrice = {r["doc_id"]: r["score_r"] for r in bm25_topk(df, {"q": "spark spark spark"}, k=10).collect()}
    assert once == thrice


def test_empty_query_set_yields_no_rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    assert bm25_topk(df, {}, k=5).count() == 0


def test_null_ids_excluded_from_results(spark):
    df = spark.createDataFrame(
        [(None, "spark"), (1, "spark")], "doc_id bigint, text string"
    )
    rows = bm25_topk(df, {"q": "spark"}, k=5).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_query_tokenization_matches_corpus_convention(spark):
    # U+00A0 is NOT a separator under the shared \s convention (Java
    # ASCII \s) — a query containing it must form ONE token and
    # therefore miss the corpus, not silently split into two matching
    # terms (Python str.split would split it).
    df = spark.createDataFrame(
        [(1, "spark join")], "doc_id bigint, text string"
    )
    rows = bm25_topk(df, {"q": "spark\u00a0join"}, k=5).collect()
    assert rows == []
    # the same words separated by real whitespace DO match
    rows2 = bm25_topk(df, {"q": "spark\tjoin"}, k=5).collect()
    assert len(rows2) == 1 and rows2[0]["doc_id"] == 1


def test_stored_postings_path_bit_equals_direct(spark, tmp_path):
    from excelstream_spark.operators.retrieval import (
        bm25_topk_stored,
        build_postings,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    direct = sorted(
        tuple(r) for r in bm25_topk(df, QUERIES, k=5).collect()
    )
    # round-trip the artifacts through parquet — the stored shape
    postings, stats = build_postings(df)
    pp, sp = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings.write.parquet(pp)
    stats.write.parquet(sp)
    stored = sorted(
        tuple(r)
        for r in bm25_topk_stored(
            spark.read.parquet(pp), spark.read.parquet(sp), QUERIES, k=5
        ).collect()
    )
    assert stored == direct
