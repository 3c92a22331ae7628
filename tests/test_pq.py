"""Product quantization (operators/pq.py): engine-exact encode vs the
DuckDB literal-codebook replay, binary packing round-trip, ADC recall
vs the exact brute force, and the scan-shaped plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators import similarity as SIM
from excelstream_spark.operators.pq import (
    PQCodebook,
    pq_codes_long,
    pq_codes_oracle_sql,
    pq_encode,
    pq_train,
    topk_pq,
)
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def codebook(emb):
    """The production default (classic 8-bit PQ)."""
    return pq_train(emb, m=8, k=256, n_iter=6, sample_n=4096)


@pytest.fixture(scope="module")
def codebook_small(emb):
    """k=16 codebook for the exhaustive DuckDB replay (the arithmetic
    contract is k-independent; 16 codes keep the oracle SQL compact)."""
    return pq_train(emb, m=8, k=16, n_iter=4, sample_n=4096)


def test_pq_train_deterministic(emb):
    cb1 = pq_train(emb, m=8, k=16, n_iter=2, sample_n=256)
    cb2 = pq_train(emb.repartition(7), m=8, k=16, n_iter=2, sample_n=256)
    assert cb1.dim == cb2.dim == 64 and cb1.m == 8
    for a, b in zip(cb1.centroids, cb2.centroids):
        assert np.array_equal(a, b)


def test_pq_encode_matches_duckdb_oracle(spark, duck, emb, codebook_small):
    """The hash gate: codes computed by the Arrow encoder equal the
    DuckDB replay from the codebook literals, bit-for-bit — the
    left-to-right float64 distance accumulation and the
    ties-to-lowest-code argmin are the cross-engine contract."""
    long = pq_codes_long(pq_encode(emb, codebook_small))
    assert_matches_oracle(long, duck, pq_codes_oracle_sql(codebook_small))


def test_pq_packing_is_m_bytes(spark, emb, codebook):
    enc = pq_encode(emb, codebook)
    sizes = enc.select(F.octet_length("code").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [8]   # 8 bytes/vector: 32x vs float32


def test_pq_encode_drops_null_and_wrong_dim(spark, codebook):
    rows = [
        (1, [float(i % 7) for i in range(64)]),
        (2, None),
        (3, [1.0, 2.0]),  # wrong dim
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = pq_encode(df, codebook).collect()
    assert [r["id"] for r in got] == [1]


def test_pq_candidate_recall_vs_bruteforce(spark, emb, codebook):
    """The PQ serving contract is candidate generation + exact re-rank
    (the int8/IVF convention): the exact float top-5 must sit inside
    the ADC top-20 candidate set at high recall (measured 0.94-0.96 on
    both small fixtures with the 8-bit default; floor 0.8)."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    codes = pq_encode(emb, codebook)
    cands = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_pq(codes, codebook, queries, k=20).collect()
    }
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.8, f"pq candidate recall {recall:.2f}"


def test_pq_scorer_output_shape_and_ranks(spark, emb, codebook):
    queries = emb.filter(F.col("vec_id") < 3)
    out = topk_pq(pq_encode(emb, codebook), codebook, queries, k=5)
    rows = out.collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]  # exclude_self
    for q, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], q


def test_pq_plans_are_scan_shaped(spark, emb, codebook):
    enc = pq_encode(emb, codebook)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # encode: pure scan work
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    queries = emb.filter(F.col("vec_id") < 3)
    splan = (
        topk_pq(enc, codebook, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in splan
    assert "BroadcastNestedLoopJoin" not in splan


def test_pq_train_raises_on_bad_input(spark):
    df = spark.createDataFrame(
        [(1, None)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError):
        pq_train(df)


def test_pq_reranked_scores_are_exact(spark, emb, codebook):
    """The two-stage composition: final scores are the EXACT JVM cosine
    (identical values to the brute force on shared pairs), recall
    equals the candidate recall, and the fetch join streams the corpus
    past a broadcast candidate set."""
    from excelstream_spark.operators.pq import topk_pq_reranked

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim_r"]
        for r in SIM.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    codes = pq_encode(emb, codebook)
    rr = topk_pq_reranked(codes, codebook, emb, queries, k=5, k_prime=20)
    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in rr.collect()
    }
    shared = set(exact) & set(got)
    assert len(shared) / len(exact) >= 0.8   # candidate recall floor
    # re-rank scores are the true float64 JVM cosine; the brute-force
    # reference computes in float32 BLAS and rounds to 6dp — agreement
    # within rounding + float32 drift proves these are real cosines,
    # not ADC approximations (which differ in the 2nd-3rd decimal)
    for p in shared:
        assert got[p] == pytest.approx(exact[p], abs=2e-6), p
    plan = rr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_pq_full_probe_equals_plain_pq(spark, emb, codebook):
    """IVF is a pure pruning layer over the identical ADC scorer: with
    every cell probed the output (rows, ranks AND scores) equals plain
    topk_pq exactly."""
    from excelstream_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    cent, coded = ivf_pq_index(emb, codebook)
    queries = emb.filter(F.col("vec_id") < 10)
    plain = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
        for r in topk_pq(pq_encode(emb, codebook), codebook, queries, k=5)
        .collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
        for r in ivf_pq_topk(
            coded, codebook, cent, queries, k=5, n_probe=cent.count()
        ).collect()
    }
    assert full == plain


def test_ivf_pq_prunes_and_recalls(spark, emb, codebook):
    """At n_probe=3 of ~10 cells the scorer touches a fraction of the
    coded artifact (the isin prune is real) and candidate recall clears
    the IVF family's random-probe floor (cell recall bounds it — the
    sim_ann_ivf convention; measured 0.5 here)."""
    from excelstream_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    cent, coded = ivf_pq_index(emb, codebook)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    out = ivf_pq_topk(coded, codebook, cent, queries, k=20, n_probe=3)
    cands = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.3, f"ivf-pq candidate recall {recall:.2f}"
    # the isin prune is real: a single query probes 3 of the ~10 cells
    # (a strict subset of the artifact) and every neighbor it gets back
    # lies in one of ITS probed cells
    from excelstream_spark.operators import vectorized as VZ

    q0 = emb.filter(F.col("vec_id") == 0)
    probed0 = {
        r["cid"]
        for r in VZ.nearest_against_broadcast(
            q0, cent, n_nearest=3
        ).collect()
    }
    all_cells = {r["cid"] for r in coded.select("cid").distinct().collect()}
    assert len(probed0) == 3 and probed0 < all_cells
    out0 = ivf_pq_topk(coded, codebook, cent, q0, k=20, n_probe=3)
    neigh_cells0 = {
        r["cid"]
        for r in coded.join(
            out0.select(F.col("neighbor_id").alias("id")).distinct(), "id"
        ).collect()
    }
    assert neigh_cells0 <= probed0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_pq_empty_queries(spark, emb, codebook):
    from excelstream_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    cent, coded = ivf_pq_index(emb, codebook)
    out = ivf_pq_topk(
        coded, codebook, cent, emb.filter(F.col("vec_id") < 0), k=5
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos_sim"]


def test_pq_encode_tie_breaks_to_lowest_code():
    """Exact distance ties (symmetric centroids around the vector) must
    resolve to the LOWEST code index on both engines."""
    from excelstream_spark.operators.pq import PQCodebook, _encode_matrix

    cb = PQCodebook(
        dim=2,
        m=1,
        centroids=(np.array([[1.0, 1.0], [-1.0, -1.0], [0.5, 0.5]]),),
    )
    codes = _encode_matrix(np.zeros((1, 2)), cb)
    # dist to c0 == dist to c1 (2.0), c2 is nearer (0.5) -> code 2;
    # then force the tie to matter: remove c2
    assert codes[0, 0] == 2
    cb2 = PQCodebook(
        dim=2, m=1, centroids=(np.array([[1.0, 1.0], [-1.0, -1.0]]),)
    )
    assert _encode_matrix(np.zeros((1, 2)), cb2)[0, 0] == 0


def test_pq_encode_oracle_property():
    """Hypothesis hardening of the cross-engine encode contract: for
    random float32 vectors and random float64 codebooks (including
    huge/tiny magnitudes — squared terms may overflow to inf, which is
    IEEE-identical on both engines), the numpy encoder (the exact code
    Spark's Arrow batches run) equals the DuckDB literal replay
    row-for-row."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from excelstream_spark.operators.pq import (
        PQCodebook,
        _encode_matrix,
        pq_codes_oracle_sql,
    )

    f32 = st.floats(
        allow_nan=False, allow_infinity=False, width=32
    )
    f64 = st.floats(allow_nan=False, allow_infinity=False)

    @settings(max_examples=25, deadline=None)
    @given(
        vecs=st.lists(
            st.lists(f32, min_size=4, max_size=4), min_size=1, max_size=6
        ),
        cents=st.lists(
            st.lists(f64, min_size=2, max_size=2), min_size=1, max_size=3
        ),
    )
    def check(vecs, cents):
        import pandas as pd

        cb = PQCodebook(
            dim=4,
            m=2,
            centroids=(
                np.asarray(cents, dtype=np.float64),
                np.asarray(cents, dtype=np.float64),
            ),
        )
        V32 = np.asarray(vecs, dtype=np.float32)
        got = _encode_matrix(V32.astype(np.float64), cb)
        tbl = pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [list(map(float, row)) for row in V32],
            }
        )
        con = duckdb.connect()
        con.register("embeddings", tbl)
        sql = pq_codes_oracle_sql(cb).replace(
            "CAST(embedding AS DOUBLE[])", "embedding::DOUBLE[]"
        )
        want = {}
        for rid, sub, code in con.sql(sql).fetchall():
            want[(rid, sub)] = code
        con.close()
        for i in range(got.shape[0]):
            for s in range(2):
                assert got[i, s] == want[(i, s)], (i, s, vecs, cents)

    check()


def test_ivf_pq_partitioned_artifact_prunes(spark, emb, codebook, tmp_path):
    """The 100 TB claim made concrete: store the coded artifact
    partitioned by cid and the probe's isin becomes a PARTITION filter
    at the scan — whole cells are skipped before a byte is read."""
    from excelstream_spark.operators.pq import ivf_pq_index

    cent, coded = ivf_pq_index(emb, codebook)
    path = str(tmp_path / "ivfpq")
    coded.write.partitionBy("cid").parquet(path)
    stored = spark.read.parquet(path)
    cells = sorted(r["cid"] for r in cent.select("cid").collect())[:3]
    probed = stored.where(F.col("cid").isin([int(c) for c in cells]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "cid" in seg and "IN" in seg.upper()
    assert {r["cid"] for r in probed.select("cid").distinct().collect()} == set(
        cells
    )
    assert probed.count() < stored.count()


def test_pq_k_over_256_rejected(spark, emb):
    """Codes are one byte per subspace: k>256 must raise, not wrap
    (code 300 -> byte 44 would corrupt every artifact silently)."""
    with pytest.raises(ValueError, match="256"):
        pq_train(emb, k=300)
    bad = PQCodebook(
        dim=2, m=1, centroids=(np.zeros((257, 2)),)
    )
    from excelstream_spark.operators.pq import _encode_matrix

    with pytest.raises(ValueError, match="256"):
        _encode_matrix(np.zeros((1, 2)), bad)


def test_ivf_pq_empty_centroids_returns_empty(spark, emb, codebook):
    """Queries but an EMPTY centroid table: the typed empty frame, via
    a limit-0 scan — never a full-artifact pass masked to -inf."""
    from excelstream_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    cent, coded = ivf_pq_index(emb, codebook)
    empty_cent = cent.limit(0)
    out = ivf_pq_topk(
        coded, codebook, empty_cent, emb.filter(F.col("vec_id") < 3), k=5
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos_sim"]


def test_ivf_pq_rejects_duplicate_query_ids(spark, emb, codebook):
    """r9 advice #3: a {qid: position} map would keep only the LAST
    duplicate's position — earlier duplicates' LUT columns would get no
    probes and silently return zero rows.  Duplicates raise instead."""
    from excelstream_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    centroids, coded = ivf_pq_index(emb, codebook)
    q = emb.filter(F.col("vec_id") < 3)
    dup = q.unionByName(q.limit(1))
    with pytest.raises(ValueError, match="duplicate query ids"):
        ivf_pq_topk(coded, codebook, centroids, dup, n_probe=2)


def test_pq_driver_traffic_bound_enforced(spark, emb, codebook):
    """r10 verdict #6: the ADC/IVF query-side collect runs under the
    stated driver bound — nq AND nq x n_probe must clear it, the call
    raises BEFORE pulling an oversized batch, and an explicit
    max_driver_rows accepts the transfer deliberately."""
    from excelstream_spark.operators.pq import ivf_pq_topk, topk_pq
    from excelstream_spark.operators.pq import ivf_pq_index

    centroids, coded = ivf_pq_index(emb, codebook)
    q = emb.filter(F.col("vec_id") < 10)
    # nq * n_probe = 10 * 3 = 30 > 25 -> the product trips the bound
    with pytest.raises(ValueError, match="driver-traffic bound"):
        ivf_pq_topk(
            coded, codebook, centroids, q, n_probe=3, max_driver_rows=25
        )
    # same batch clears a bound it fits under (10 * 3 = 30 <= 64)
    ok = ivf_pq_topk(
        coded, codebook, centroids, q, k=2, n_probe=3, max_driver_rows=64
    )
    assert ok.count() > 0
    # the plain-ADC path guards its own query collect too, at the
    # module default (monkeypatch-free: a tiny frame always clears it)
    assert (
        topk_pq(
            coded.select("id", "code"), codebook, q.limit(2), k=1
        ).count() > 0
    )


def test_topk_pq_has_driver_bound_escape_hatch(spark, emb, codebook):
    """r11 review: the plain-ADC path (topk_pq / topk_pq_reranked)
    accepts max_driver_rows too — the bound error's advised fix must
    be possible on every guarded path, not only ivf_pq_topk."""
    from excelstream_spark.operators.pq import pq_encode, topk_pq

    codes = pq_encode(emb, codebook)
    q = emb.filter(F.col("vec_id") < 8)
    with pytest.raises(ValueError, match="driver-traffic bound"):
        topk_pq(codes, codebook, q, k=2, max_driver_rows=4)
    ok = topk_pq(codes, codebook, q, k=2, max_driver_rows=16)
    assert ok.count() > 0
