"""Incremental corpus maintenance (operators/incremental.py): exact and
near-dup increment gates vs DuckDB oracles, precomputed-artifact reuse,
and the corpus-shuffle-free plan shape."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from excelstream_spark.operators import incremental as INC
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle

# The split every test uses: even doc_ids are the standing corpus, odd
# ones are the increment — plus re-deliveries of corpus texts under new
# ids (the case the gate exists for).
_CORPUS = "SELECT * FROM documents WHERE doc_id % 2 = 0"
_NEW = "SELECT * FROM documents WHERE doc_id % 2 = 1"
_REDELIV = """
    SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 2 = 0 AND doc_id < 20
"""


def _frames(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    redeliv = (
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 20))
        .withColumn("doc_id", F.col("doc_id") + 100_000)
    ).select(*docs.columns)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(redeliv)
    return corpus, new


def test_dedup_increment_exact_oracle(spark, duck):
    """Exact gate == SQL anti-join on the md5 fingerprint: every
    re-delivered corpus text is rejected, every genuinely new text
    survives."""
    corpus, new = _frames(spark)
    got = INC.dedup_increment_exact(
        new, INC.corpus_fingerprints(corpus)
    ).select("doc_id")
    assert_matches_oracle(
        got,
        duck,
        f"""
        WITH corpus AS ({_CORPUS}), newdocs AS ({_NEW} UNION ALL {_REDELIV}),
        fp AS (SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) f
               FROM corpus)
        SELECT doc_id FROM newdocs n
        WHERE md5(trim(regexp_replace(lower(n.text), '\\s+', ' ', 'g')))
              NOT IN (SELECT f FROM fp)
        """,
    )


def test_neardup_increment_pairs_oracle(spark, duck):
    """Cross-corpus near-dup pairs == brute-force jaccard >= 0.8 between
    the increment and the corpus (the 32x4 banding's miss probability at
    0.8 is ~5e-8, exactly like the batch dedup_minhash_lsh oracle)."""
    corpus, new = _frames(spark)
    got = INC.neardup_increment_pairs(new, corpus, threshold=0.8)
    assert_matches_oracle(
        got,
        duck,
        f"""
        WITH corpus AS ({_CORPUS}), newdocs AS ({_NEW} UNION ALL {_REDELIV}),
        alldocs AS (SELECT * FROM corpus UNION ALL SELECT * FROM newdocs),
        sets_ AS (
          SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
                FROM alldocs)
        ),
        ex AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM sets_ WHERE len(sh) > 0),
        pairs AS (
          SELECT a.doc_id doc_new, b.doc_id doc_corpus,
                 CAST(count(*) AS BIGINT) inter,
                 any_value(a.n) na, any_value(b.n) nb
          FROM ex a JOIN ex b ON a.s = b.s
          WHERE a.doc_id IN (SELECT doc_id FROM newdocs)
            AND b.doc_id IN (SELECT doc_id FROM corpus)
          GROUP BY 1, 2
        )
        SELECT doc_new, doc_corpus,
               inter * 1.0 / (na + nb - inter) AS jaccard
        FROM pairs
        WHERE inter * 1.0 / (na + nb - inter) >= 0.8
        """,
    )
    # the gate's reason to exist: re-deliveries pair with their originals
    pairs = {(r["doc_new"], r["doc_corpus"]) for r in got.collect()}
    assert all((d + 100_000, d) in pairs for d in range(0, 20, 2))


def test_dedup_increment_composed_and_artifact_reuse(spark, tmp_path):
    """The composed gate drops exact dups AND near-dups; feeding
    precomputed (materialized) corpus artifacts yields the identical
    answer, and the candidate join against the stored band index
    BROADCASTS the increment — the corpus index side streams with no
    exchange between its scan and the join."""
    corpus, new = _frames(spark)
    live = INC.dedup_increment(new, corpus)
    live_ids = sorted(r["doc_id"] for r in live.select("doc_id").collect())
    assert all(i < 100_000 for i in live_ids)  # every re-delivery gated

    fp_path = str(tmp_path / "fps.parquet")
    idx_path = str(tmp_path / "band_index.parquet")
    INC.corpus_fingerprints(corpus).write.parquet(fp_path)
    INC.corpus_band_index(corpus).write.parquet(idx_path)
    stored = INC.dedup_increment(
        new,
        corpus,
        corpus_fps=spark.read.parquet(fp_path),
        band_index=spark.read.parquet(idx_path),
    )
    assert sorted(r["doc_id"] for r in stored.select("doc_id").collect()) == live_ids

    pairs = INC.neardup_increment_pairs(
        new, corpus, band_index=spark.read.parquet(idx_path)
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the candidate join keys on (band, bh) and BROADCASTS the increment
    assert "BroadcastHashJoin [band" in plan, plan[:1500]
    # between that join and its BroadcastExchange build side sits the
    # STREAMED corpus-index subtree: the stored band_index parquet scan
    # with no exchange in between
    streamed = plan.split("BroadcastHashJoin [band")[1].split("BroadcastExchange")[0]
    # (asserting on ReadSchema, not the file path — Spark truncates long
    # Location strings in plan output)
    assert "FileScan parquet" in streamed, plan[:2000]
    assert "struct<band:int,bh:bigint,id:bigint>" in streamed.replace("\n", " "), (
        plan[:2000]
    )
    assert "Exchange" not in streamed, plan[:2000]


def test_increment_gate_keeps_borderline_unique(spark):
    """A doc sharing SOME shingles with the corpus but below threshold
    survives the near-dup gate (the gate is not a bag-of-words filter)."""
    corpus, _ = _frames(spark)
    base = corpus.limit(1).collect()[0]
    half_novel = " ".join(
        base["text"].split()[:5] + ["zq%d" % i for i in range(40)]
    )
    probe = corpus.sparkSession.createDataFrame(
        pd.DataFrame({"doc_id": [999_999], "text": [half_novel]})
    )
    out = INC.dedup_increment(probe, corpus)
    assert [r["doc_id"] for r in out.collect()] == [999_999]


def test_bucketed_fp_artifact_only_increment_shuffles(spark):
    """The stored-fingerprint steady state: with the corpus fingerprint
    artifact saved bucketed on fp, the exact gate's anti-join reads the
    corpus side pre-partitioned (bucketed scan, no exchange over it)
    and shuffles only the increment — and selects exactly the same
    documents as the unbucketed path."""
    from excelstream_spark.operators.incremental import (
        corpus_fingerprints,
        dedup_increment_exact,
        save_fingerprint_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    fps = corpus_fingerprints(corpus)
    save_fingerprint_table(fps, "fp_artifact_test", buckets=8)
    # at the 100 TB design point the fingerprint artifact is NOT
    # broadcastable — that regime is what bucketing exists for; at
    # fixture scale the planner would broadcast it (bucketing
    # "disabled by query planner"), so force the shuffle-join regime
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stored = spark.table("fp_artifact_test")
        gate = dedup_increment_exact(new, stored)
        plan = gate._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:1500]
        # the one hash exchange is the INCREMENT moving to the corpus's
        # bucket layout; the bucketed scan itself is exchange-free
        assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
        baseline = dedup_increment_exact(new, fps)
        assert sorted(r.doc_id for r in gate.collect()) == sorted(
            r.doc_id for r in baseline.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS fp_artifact_test")


def test_bucketed_band_index_big_increment_path(spark):
    """The big-increment regime (increment too large to broadcast):
    with the band index stored bucketed on (band, bh) and
    broadcast_increment=False, the candidate join reads the index
    exchange-free and produces the same pairs as the broadcast path."""
    from excelstream_spark.operators.incremental import (
        corpus_band_index,
        neardup_increment_pairs,
        save_band_index_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    index = corpus_band_index(corpus)
    save_band_index_table(index, "band_index_test", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stored = spark.table("band_index_test")
        # exchange shape on the candidate join in ISOLATION (the full
        # operator references the candidate subtree twice — semi-join +
        # verify — which duplicates it in the pre-execution plan text
        # and makes a global exchange count meaningless): built from
        # the operator's own public building blocks, exactly ONE side
        # of the (band, bh)-keyed join is exchanged — the increment's
        # entries moving to the index's bucket layout
        from excelstream_spark.operators.dedup import (
            band_entries,
            minhash_signatures,
        )

        ne = band_entries(
            minhash_signatures(new), bands=32, rows_per_band=4
        ).withColumnRenamed("id", "doc_new")
        cand = (
            stored.join(ne, ["band", "bh"])
            .select("doc_new", F.col("id").alias("doc_corpus"))
            .distinct()
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        assert plan.count("Exchange hashpartitioning(band") == 1, plan[:2500]

        pairs = neardup_increment_pairs(
            new, corpus, band_index=stored, broadcast_increment=False
        )
        got = sorted(
            (r.doc_new, r.doc_corpus) for r in pairs.collect()
        )
        base = neardup_increment_pairs(new, corpus, band_index=index)
        want = sorted(
            (r.doc_new, r.doc_corpus) for r in base.collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS band_index_test")
