"""DSIR importance-resampling selection (operators/selection.py):
weights bit-checked against a pure-Python reference of the published
recipe, Gumbel-top-k selection semantics, the precomputed-logratio
artifact path, and empty-document handling.  The DuckDB replay of the
full catalog entry is covered by test_catalog_oracle's sweep."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from excelstream_spark.functions.text import tokens_py
from excelstream_spark.operators.selection import (
    DEFAULT_ALPHA,
    dsir_importance_weights,
    dsir_logratio,
    dsir_select,
)

EN = [
    (0, "the cat sat on the mat and the dog sat too"),
    (1, "a quick brown fox jumps over the lazy dog again and again"),
    (2, "the rain in spain stays mainly on the plain"),
    (3, "to be or not to be that is the question"),
]
DE = [
    (10, "der hund sitzt auf der matte und die katze auch"),
    (11, "ein schneller brauner fuchs springt ueber den faulen hund"),
    (12, "der regen in spanien bleibt meist auf der ebene"),
    (13, "sein oder nicht sein das ist hier die frage"),
]
EMPTY = [(20, ""), (21, None), (22, "   \n\t ")]


def _grams_py(text):
    tk = tokens_py(text)
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def _bucket_py(gram: str, n_buckets: int, seed: int) -> int:
    h = hashlib.md5(f"{seed}:{gram}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def _weights_py(raw, target, n_buckets, seed, alpha):
    """Reference DSIR: smoothed bucket models + per-doc log weights."""
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _, t in raw:
        for g in _grams_py(t):
            b = _bucket_py(g, n_buckets, seed)
            rc[b] = rc.get(b, 0) + 1
    for _, t in target:
        for g in _grams_py(t):
            b = _bucket_py(g, n_buckets, seed)
            tc[b] = tc.get(b, 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in raw:
        w = 0.0
        for g in _grams_py(t):
            b = _bucket_py(g, n_buckets, seed)
            w += math.log((tc.get(b, 0) + alpha) / (tt + alpha * n_buckets))
            w -= math.log((rc[b] + alpha) / (rt + alpha * n_buckets))
        out[i] = w
    return out


def _gumbel_py(doc_id: int, seed: int) -> float:
    h = hashlib.md5(f"gumbel:{seed}:{doc_id}".encode()).hexdigest()[:8]
    u = (int(h, 16) + 0.5) / 2**32
    return -math.log(-math.log(u))


def test_weights_match_reference(spark):
    raw = EN + DE + EMPTY
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_importance_weights(
            rdf, tdf, n_buckets=256, seed=0
        ).collect()
    }
    want = _weights_py(raw, EN, 256, 0, DEFAULT_ALPHA)
    assert set(got) == {i for i, _ in raw}
    for i, _ in EN + DE:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
    # token-less documents: the empty product => exactly 0.0
    for i, _ in EMPTY:
        assert got[i] == 0.0


def test_weights_separate_target_from_offtarget(spark):
    """English docs (the target distribution) must outweigh German ones
    — the point of the method."""
    rdf = spark.createDataFrame(EN + DE, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_importance_weights(
            rdf, tdf, n_buckets=256, seed=0
        ).collect()
    }
    assert min(w[i] for i, _ in EN) > max(w[i] for i, _ in DE)


def test_select_is_gumbel_topk(spark):
    """dsir_select == top-k of (reference weight + reference Gumbel)."""
    raw = EN + DE + EMPTY
    rdf = spark.createDataFrame(raw, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    got = dsir_select(
        rdf, tdf, k=5, n_buckets=256, seed=0, gumbel_seed=1
    ).collect()
    w = _weights_py(raw, EN, 256, 0, DEFAULT_ALPHA)
    for i, _ in EMPTY:
        w[i] = 0.0
    scores = {i: w[i] + _gumbel_py(i, 1) for i in w}
    want = sorted(scores, key=lambda i: -scores[i])[:5]
    assert sorted(r["doc_id"] for r in got) == sorted(want)
    for r in got:
        assert abs(r["score_r"] - round(scores[r["doc_id"]], 6)) < 1e-9


def test_precomputed_logratio_artifact_path(spark):
    """Storing dsir_logratio and reusing it (the steady-state shape)
    must reproduce the fit-here path exactly."""
    rdf = spark.createDataFrame(EN + DE, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    lam = dsir_logratio(tdf, rdf, n_buckets=256, seed=0)
    a = dsir_select(rdf, tdf, k=4, n_buckets=256, seed=0).collect()
    b = dsir_select(rdf, logratio=lam, k=4, n_buckets=256, seed=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_select_plan_is_topk_not_global_sort(spark):
    """Selection must compile to TakeOrderedAndProject (per-partition
    heaps), not a full Exchange+Sort of the scored corpus."""
    rdf = spark.createDataFrame(EN + DE, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    df = dsir_select(rdf, tdf, k=3, n_buckets=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mapside_scorer_matches_join_path(spark):
    """dsir_score_mapside (shuffle-free Arrow path) must agree with
    dsir_importance_weights (join+groupBy path) to float-sum noise,
    including empty/null/whitespace-only docs interleaved with real
    ones in one partition (the reduceat offset edge cases)."""
    rows = EN + DE + EMPTY
    rdf = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(1)
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    from excelstream_spark.operators.selection import (
        dsir_logratio,
        dsir_score_mapside,
    )

    lam = dsir_logratio(tdf, rdf, n_buckets=256, seed=0)
    join_w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_importance_weights(
            rdf, logratio=lam, n_buckets=256, seed=0
        ).collect()
    }
    scored = dsir_score_mapside(rdf, lam, n_buckets=256, seed=0, threshold=0.0)
    map_w = {r["doc_id"]: r["log_w"] for r in scored.collect()}
    assert set(map_w) == set(join_w)
    for i in map_w:
        assert abs(map_w[i] - join_w[i]) < 1e-9, (i, map_w[i], join_w[i])
    # original columns survive; keep is derived from the threshold
    assert {"doc_id", "text", "log_w", "keep"} <= set(scored.columns)


def test_mapside_scorer_plan_is_shuffle_free_arrow(spark):
    """The scorer must compile to MapInPandas (Arrow) with ZERO
    exchanges — the property that makes it streaming-safe."""
    from excelstream_spark.operators.selection import (
        dsir_logratio,
        dsir_score_mapside,
    )

    rdf = spark.createDataFrame(EN + DE, "doc_id bigint, text string")
    tdf = spark.createDataFrame(EN, "doc_id bigint, text string")
    lam = dsir_logratio(tdf, rdf, n_buckets=64)
    plan = (
        dsir_score_mapside(rdf, lam, n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python
    assert "Exchange" not in plan
