"""Bigram stupid-backoff LM: bit-match vs a pure-Python reference,
backoff-path coverage, tercile determinism, edge documents."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.lm import (
    BACKOFF_ALPHA,
    fit_bigram_lm,
    ppl_tercile_buckets,
    stupid_backoff_score,
)

REF_DOCS = [
    (0, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (4, "a cat and a dog"),
]
# exercises: seen bigrams, unseen bigram of seen tokens ("cat ran"),
# unseen token ("zebra"), single-token doc, empty doc, NULL text
SCORE_DOCS = REF_DOCS + [
    (1, "the cat ran"),
    (3, "zebra"),
    (5, "mat"),
    (6, ""),
    (7, None),
]


def _py_reference(ref_rows, score_rows):
    """Independent reimplementation of the published scoring rule."""
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, text in ref_rows:
        toks = (text or "").lower().split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = float(sum(uni.values()))

    def p_uni(w):
        return uni.get(w, 0.5) / total

    out = {}
    for doc_id, text in score_rows:
        toks = (text or "").lower().split()
        if not toks:
            continue
        ts = [round(-math.log10(p_uni(toks[0])), 9)]
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi:
                s = bi[(a, b)] / float(uni[a])
            else:
                s = BACKOFF_ALPHA * p_uni(b)
            ts.append(round(-math.log10(s), 9))
        exact = sum(Decimal(f"{t:.15f}") for t in ts)
        out[doc_id] = (len(ts), round(float(exact) / len(ts), 6))
    return out


@pytest.fixture(scope="module")
def fitted(spark):
    ref = spark.createDataFrame(REF_DOCS, "doc_id bigint, text string")
    return fit_bigram_lm(ref)


def test_scores_bit_match_python_reference(spark, fitted):
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_toks"], r["nll_r"])
        for r in stupid_backoff_score(docs, fitted).collect()
    }
    want = _py_reference(REF_DOCS, SCORE_DOCS)
    assert got == want


def test_backoff_and_unseen_paths_diverge(spark, fitted):
    # "the cat" is a seen bigram; "cat ran" is not ("ran" unseen) —
    # the doc's score must mix the bigram and backoff branches, and
    # an all-unseen doc must be strictly more surprising per token.
    docs = spark.createDataFrame(
        [(1, "the cat ran"), (3, "zebra")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in stupid_backoff_score(docs, fitted).collect()}
    assert rows[1]["n_toks"] == 3
    assert rows[3]["n_toks"] == 1
    assert rows[3]["nll_r"] > rows[1]["nll_r"]


def test_tokenless_docs_land_in_tail_with_null_nll(spark, fitted):
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    rows = {
        r["doc_id"]: r for r in ppl_tercile_buckets(docs, fitted).collect()
    }
    assert len(rows) == len(SCORE_DOCS)
    for empty_id in (6, 7):
        assert rows[empty_id]["bucket"] == "tail"
        assert rows[empty_id]["nll_r"] is None
        assert rows[empty_id]["n_toks"] == 0


def test_terciles_partition_and_order(spark, fitted):
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    rows = ppl_tercile_buckets(docs, fitted).collect()
    by_bucket = {"head": [], "middle": [], "tail": []}
    for r in rows:
        if r["nll_r"] is not None:
            by_bucket[r["bucket"]].append(r["nll_r"])
    # every scored head doc <= every middle doc <= every tail doc
    if by_bucket["head"] and by_bucket["middle"]:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if by_bucket["middle"] and by_bucket["tail"]:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # 8 docs, 6 scored: floor(6/3)=2 head, 2 middle, rest tail
    assert len(by_bucket["head"]) == 2
    assert len(by_bucket["middle"]) == 2


def test_single_doc_corpus_all_k_zero(spark):
    # n=1: both tercile ks are 0 -> no head/middle thresholds; the one
    # scored doc falls through to tail (and nothing errors).
    ref = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    lm = fit_bigram_lm(ref)
    rows = ppl_tercile_buckets(ref, lm).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == "tail"


def test_null_ids_excluded(spark, fitted):
    docs = spark.createDataFrame(
        [(None, "the cat"), (1, "the cat")], "doc_id bigint, text string"
    )
    rows = ppl_tercile_buckets(docs, fitted).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_terciles_approx_mode_matches_exact(spark, fitted):
    """exact=False (the 100 TB approxQuantile path) reproduces the
    exact tercile assignment on the fixture: at relativeError 0.001 and
    6 scored rows the GK sketch's rank error is < 1 row, so both
    thresholds land on the same nll_r values."""
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id bigint, text string")
    exact = {
        r["doc_id"]: r["bucket"]
        for r in ppl_tercile_buckets(docs, fitted).collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in ppl_tercile_buckets(docs, fitted, exact=False).collect()
    }
    assert approx == exact
