"""Unit tests for the hashed-feature logistic-regression quality
classifier (operators/classifier.py).  The catalog-wide oracle sweep
(test_catalog_oracle) proves the full driver entry bit-equal to its
unrolled-CTE DuckDB replay; these tests pin the operator-level
behaviors that sweep can't see."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.classifier import (
    ClassifierModel,
    hashed_doc_features,
    score_quality,
    select_top_quality,
    train_quality_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


@pytest.fixture(scope="module")
def separable(spark):
    """Clearly separable corpus: positives speak 'alpha', negatives
    speak 'omega'; both share filler vocabulary."""
    rows = []
    for i in range(40):
        pos = i % 2 == 0
        marker = "alpha beta gamma" if pos else "omega psi chi"
        rows.append((i, f"{marker} shared filler words {i % 5}", int(pos)))
    return _docs(spark, rows)


def test_features_unit_norm_and_zero_gram(spark):
    df = _docs(
        spark,
        [(1, "a b c a", 0), (2, "", 0), (3, None, 0), (4, "x", 0)],
    )
    feat = hashed_doc_features(df).toPandas()
    # zero-gram docs (empty / NULL text) produce no feature rows
    assert set(feat.doc_id) == {1, 4}
    for _, grp in feat.groupby("doc_id"):
        assert np.isclose((grp.x**2).sum(), 1.0)


def test_train_separates_and_ranks(spark, separable):
    model = train_quality_classifier(separable, "y", steps=4, lr=8.0)
    assert isinstance(model, ClassifierModel)
    scored = (
        score_quality(separable, model)
        .join(separable.select("doc_id", "y"), "doc_id")
        .toPandas()
    )
    pos = scored[scored.y == 1].score_r
    neg = scored[scored.y == 0].score_r
    # perfect ranking on a separable fixture
    assert pos.min() > neg.max()


def test_select_top_quality_budget_and_ties(spark, separable):
    model = train_quality_classifier(separable, "y", steps=4, lr=8.0)
    out = select_top_quality(separable, model, keep_frac=0.5).toPandas()
    assert len(out) == 40
    assert out.keep.sum() == 20  # no ties on this fixture: exact budget
    kept = set(out[out.keep].doc_id)
    assert kept == set(range(0, 40, 2))  # exactly the positives


def test_select_ties_all_kept(spark):
    # five byte-identical docs -> identical scores -> a keep_frac that
    # lands mid-tie keeps ALL of them (deterministic, order-free)
    df = _docs(spark, [(i, "same text every time", 1) for i in range(5)])
    model = ClassifierModel(weights={}, bias=0.0, n_buckets=1024, seed=0)
    out = select_top_quality(df, model, keep_frac=0.4).toPandas()
    assert out.keep.all()


def test_select_keep_frac_zero(spark, separable):
    model = ClassifierModel(weights={}, bias=0.0, n_buckets=1024, seed=0)
    out = select_top_quality(separable, model, keep_frac=0.0).toPandas()
    assert not out.keep.any()


def test_empty_weight_model_scores_bias_only(spark):
    df = _docs(spark, [(1, "anything at all", 0), (2, "", 0)])
    model = ClassifierModel(weights={}, bias=2.0, n_buckets=1024, seed=0)
    out = score_quality(df, model).toPandas().set_index("doc_id")
    expect = round(round(1 / (1 + np.exp(-2.0)), 9), 6)
    assert out.loc[1, "score_r"] == expect
    assert out.loc[2, "score_r"] == expect


def test_null_ids_excluded(spark):
    df = spark.createDataFrame(
        [(None, "some text here", 1), (7, "other text", 0)],
        "doc_id bigint, text string, y int",
    )
    model = train_quality_classifier(df, "y", steps=1, lr=1.0)
    out = score_quality(df, model).toPandas()
    assert list(out.doc_id) == [7]


def test_gd_matches_numpy_reference(spark, separable):
    """The distributed GD is bit-equal to a dense numpy replay of the
    same quantized algorithm (the engine-portability contract from the
    operator docstring, proven against a third implementation)."""
    n_buckets, steps, lr = 256, 3, 4.0
    model = train_quality_classifier(
        separable, "y", n_buckets=n_buckets, steps=steps, lr=lr
    )
    feat = hashed_doc_features(separable, n_buckets=n_buckets).toPandas()
    y = separable.select("doc_id", "y").toPandas().sort_values("doc_id")
    ids = {d: i for i, d in enumerate(y.doc_id)}
    X = np.zeros((len(y), n_buckets))
    for d, b, x in feat.itertuples(index=False):
        X[ids[d], int(b)] = x
    Y = y.y.values.astype(float)
    w = np.zeros(n_buckets)
    bias = 0.0
    for _ in range(steps):
        p = np.round(1 / (1 + np.exp(-(bias + X @ w))), 9)
        err = p - Y
        w = np.round(w - lr * (X.T @ err / len(Y)), 9)
        bias = round(bias - lr * err.mean(), 9)
    for b, wv in model.weights.items():
        assert wv == pytest.approx(w[b], abs=1e-12)
    assert model.bias == pytest.approx(bias, abs=1e-12)


def test_mapside_scores_bit_match_batch_path(spark):
    """classifier_score_mapside must reproduce score_quality's rounded
    scores exactly — same decimal-sum margin convention (the streaming
    gate's parity claim)."""
    from excelstream_spark.operators.classifier import (
        classifier_score_mapside,
        score_quality,
        train_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(i, ("alpha beta gamma " * (1 + i % 7)).strip(), int(i % 3 == 0))
         for i in range(40)]
        + [(100, "", 0), (101, None, 1)],
        "doc_id bigint, text string, y int",
    )
    model = train_quality_classifier(docs, "y", steps=3, lr=4.0)
    batch = {
        r["doc_id"]: (r["score_r"], r["pred"])
        for r in score_quality(docs, model).collect()
    }
    mapside = {
        r["doc_id"]: (r["score_r"], r["pred"])
        for r in classifier_score_mapside(
            docs.where("doc_id is not null"), model
        ).collect()
    }
    assert batch == mapside


def test_mapside_fixed_point_boundary_and_guard_parity(spark):
    """r8 (r7 verdict #3): the vectorized int64 fixed-point margin must
    stay bit-equal to the Spark decimal path on adversarial weights —
    exact half-boundary products at scale 1e15 (where numpy half-even
    vs BigDecimal HALF_UP diverge without the ambiguity fallback),
    sign mixtures, magnitudes that force the per-element Decimal band,
    and weights past the |w*x| > 8 int64-headroom guard."""
    from excelstream_spark.operators.classifier import (
        classifier_score_mapside,
        hashed_doc_features,
        score_quality,
    )

    # single-token docs -> one gram each, k=1 so x=1.0 and w*x == w:
    # the weight value IS the term, letting the test place terms
    # exactly on rounding boundaries
    words = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [(i, words[i]) for i in range(len(words))]
        + [(100, " ".join(words)), (101, None)],  # multi-bucket + null
        "doc_id bigint, text string",
    )
    feat = hashed_doc_features(docs, n_buckets=1024)
    bkt = {
        r["doc_id"]: r["b"]
        for r in feat.where(F.col("doc_id") < 100).collect()
    }
    crafted = [
        2.5e-15, -2.5e-15,          # exact .5 ties at scale 1e15
        1.5e-15, -0.5e-15,          # more ties, both signs
        0.1234567890123455,         # 16th digit on the boundary
        -0.9999999999999995,
        9.5, -9.5,                  # trips the |w*x| > 8 guard
        0.5, -0.25,                 # large-|t| ambiguity band
        3.141592653589793e-07,      # ordinary fast-path values
        -2.718281828459045e-03,
    ]
    weights = {int(bkt[i]): crafted[i] for i in range(len(words))}
    model = ClassifierModel(
        weights=weights, bias=0.01, n_buckets=1024, seed=0
    )
    batch = {
        r["doc_id"]: (r["score_r"], r["pred"])
        for r in score_quality(docs, model).collect()
    }
    mapside = {
        r["doc_id"]: (r["score_r"], r["pred"])
        for r in classifier_score_mapside(docs, model).collect()
    }
    assert batch == mapside


def test_mapside_is_shuffle_free(spark):
    from excelstream_spark.operators.classifier import (
        ClassifierModel,
        classifier_score_mapside,
    )

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    model = ClassifierModel(weights={3: 0.5}, bias=0.1, n_buckets=16, seed=0)
    plan = (
        classifier_score_mapside(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_select_top_quality_approx_mode_matches_exact(spark, separable):
    """exact=False (the 100 TB approxQuantile path) keeps the same set
    as the exact k-th-value cut on the fixture: at relativeError 0.001
    and 40 rows the GK sketch's rank error is < 1 row, so the threshold
    must land on the same score value."""
    model = train_quality_classifier(separable, "y", steps=4, lr=8.0)
    exact = select_top_quality(separable, model, keep_frac=0.5).toPandas()
    approx = select_top_quality(
        separable, model, keep_frac=0.5, exact=False
    ).toPandas()
    assert set(approx[approx.keep].doc_id) == set(exact[exact.keep].doc_id)
