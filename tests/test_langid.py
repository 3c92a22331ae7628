"""Language identification (operators/langid.py): Cavnar-Trenkle
rank-profile classifier — discrimination on crafted multilingual
texts, evidence semantics, plan shape, and the DuckDB oracle replay
(r11 verdict #2: the last published pretraining-pipeline stage class
with zero implementation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from excelstream_spark.operators.langid import (
    char_ngram_hashes,
    language_id,
    train_language_profiles,
)

from .conftest import SF_DIR, assert_matches_oracle

# function-word-heavy snippets: the trigram distributions of real
# languages, compressed (th-/and-/-ing vs der/die/und/sch vs
# el/la/que/cion)
_EN = (
    "the quick brown fox jumps over the lazy dog and the dog barks "
    "with the wind in the trees and everything that it can see is "
    "there for the taking of those who would look with care"
)
_DE = (
    "der schnelle braune fuchs springt ueber den faulen hund und der "
    "hund bellt mit dem wind in den baeumen und alles was er sehen "
    "kann ist fuer diejenigen die mit sorgfalt schauen wuerden"
)
_ES = (
    "el rapido zorro marron salta sobre el perro perezoso y el perro "
    "ladra con el viento en los arboles y todo lo que puede ver esta "
    "alli para aquellos que miraran con cuidado la cancion"
)


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_langid_discriminates_crafted_languages(spark):
    """Profiles trained on three real-language snippets classify
    held-out sentences of each language correctly — the operator is a
    language identifier, not just replayable arithmetic."""
    train = _labeled(
        spark,
        [
            (1, "en", _EN),
            (2, "en", "this is another english sentence with the usual words"),
            (3, "de", _DE),
            (4, "de", "dies ist ein weiterer deutscher satz mit den ueblichen woertern"),
            (5, "es", _ES),
            (6, "es", "esta es otra frase espanola con las palabras habituales"),
        ],
    )
    profiles = train_language_profiles(train, top_k=200)
    held_out = _labeled(
        spark,
        [
            (101, None, "the children walked over the bridge and looked at the water"),
            (102, None, "die kinder gingen ueber die bruecke und schauten auf das wasser"),
            (103, None, "los ninos caminaron sobre el puente y miraron el agua"),
        ],
    ).select("doc_id", "text")
    preds = {
        r["doc_id"]: r["lang_pred"]
        for r in language_id(held_out, profiles, top_k=200).collect()
    }
    assert preds == {101: "en", 102: "de", 103: "es"}


def test_langid_no_gram_docs_absent(spark):
    """NULL text and text shorter than the smallest n yield no grams:
    those documents are ABSENT from the output (a language call needs
    evidence — inner-group semantics on both engines), while normal
    docs classify."""
    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    profiles = train_language_profiles(train, top_k=100)
    docs = _labeled(
        spark,
        [(201, None, None), (202, None, "a"), (203, None, "the water there")],
    ).select("doc_id", "text")
    out = language_id(docs, profiles, top_k=100).collect()
    assert {r["doc_id"] for r in out} == {203}
    assert out[0]["lang_pred"] == "en"


def test_langid_profiles_topk_contiguous(spark):
    """Per-language ranks are row_number-contiguous 1..min(top_k,
    n_grams) with the (count DESC, gram_h ASC) tie-break — the
    deterministic model contract the oracle replays."""
    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    prof = train_language_profiles(train, top_k=50).collect()
    by_lang: dict[str, list[int]] = {}
    for r in prof:
        by_lang.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
        assert len(ranks) <= 50


def test_langid_build_time_geometry_contract(spark):
    """ns/top_k travel with the build (the PQ-codebook / Count-Min
    depth-width convention): scoring with a different top_k than the
    profile build changes the absent-gram penalty and the doc-profile
    cut, so the distances legitimately differ — the contract is
    documented, this pins that same-geometry calls are stable."""
    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    docs = _labeled(spark, [(301, None, _EN)]).select("doc_id", "text")
    prof = train_language_profiles(train, top_k=100)
    a = language_id(docs, prof, top_k=100).collect()[0]
    b = language_id(docs, prof, top_k=100).collect()[0]
    assert (a["lang_pred"], a["distance"]) == (b["lang_pred"], b["distance"])


def test_langid_plan_shape(spark):
    """Plan audit: zero CartesianProduct; the only nested-loop join is
    the broadcast cross with the tiny distinct-langs side (the model
    is broadcast — the corpus never joins anything non-broadcast), and
    the profile lookup is a broadcast hash join."""
    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    profiles = train_language_profiles(train, top_k=100)
    docs = _labeled(spark, [(401, None, _EN)]).select("doc_id", "text")
    plan = (
        language_id(docs, profiles, top_k=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_langid_gram_hash_matches_duckdb(spark, duck):
    """The 60-bit md5 gram hash is the house convention — spot-pin a
    handful of grams against DuckDB's ('0x' || substr(md5(g), 1,
    15))::BIGINT on identical strings."""
    docs = _labeled(spark, [(1, None, "abcd")]).select("doc_id", "text")
    got = sorted(
        r["gram_h"]
        for r in char_ngram_hashes(docs, key_col="doc_id", ns=(2,)).collect()
    )
    want = sorted(
        duck.execute(
            "SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT FROM "
            "(SELECT unnest(['ab','bc','cd']) AS g)"
        ).df()
        .iloc[:, 0]
        .tolist()
    )
    assert got == want


def test_langid_vs_duckdb_oracle(spark, duck):
    """Full replay over the documents fixture: train on the even
    slice's lang labels, classify the odd docs — predictions and
    integer distances hash-equal to plans/oracles.langid_oracle."""
    from excelstream_spark.plans import oracles as ORC
    from excelstream_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    prof = train_language_profiles(docs.where(F.col("doc_id") % 2 == 0))
    out = language_id(docs.where(F.col("doc_id") % 2 != 0), prof)
    assert_matches_oracle(out, duck, ORC.langid_oracle())


def test_langid_mapside_batch_parity_fixture(spark):
    """The stateless mapside scorer (r12 verdict #3) reproduces the
    batch path EXACTLY over the real fixture — every (doc, lang_pred,
    distance) triple, not a rounding band: the scorer is integer-exact
    by construction (same code-point grams, same 60-bit md5, same rank
    total order, same penalty arithmetic)."""
    from excelstream_spark.operators.langid import langid_score_mapside
    from excelstream_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    prof = train_language_profiles(docs.where(F.col("doc_id") % 2 == 0))
    odd = docs.where(F.col("doc_id") % 2 != 0).select("doc_id", "text")
    batch = {
        r["doc_id"]: (r["lang_pred"], r["distance"])
        for r in language_id(odd, prof).collect()
    }
    mapside = {
        r["doc_id"]: (r["lang_pred"], r["distance"])
        for r in langid_score_mapside(odd, prof)
        .select("doc_id", "lang_pred", "distance")
        .collect()
    }
    assert batch == mapside and len(batch) > 0


def test_langid_mapside_collected_model_and_evidence(spark):
    """The pre-collected profile dict (the stored-artifact serving
    form) scores identically to passing the profile DataFrame, and
    no-gram documents are DROPPED (a language call needs evidence —
    the batch path's inner semantics)."""
    from excelstream_spark.operators.langid import (
        collect_language_profiles,
        langid_score_mapside,
    )

    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    prof = train_language_profiles(train, top_k=100)
    model = collect_language_profiles(prof)
    docs = _labeled(
        spark,
        [
            (101, None, "the children walked over the bridge"),
            (102, None, None),  # no grams -> absent
            (103, None, "x"),   # shorter than n=2 -> absent
        ],
    ).select("doc_id", "text")
    via_df = sorted(
        tuple(r)
        for r in langid_score_mapside(docs, prof, top_k=100)
        .select("doc_id", "lang_pred", "distance").collect()
    )
    via_model = sorted(
        tuple(r)
        for r in langid_score_mapside(docs, model, top_k=100)
        .select("doc_id", "lang_pred", "distance").collect()
    )
    assert via_df == via_model
    assert [r[0] for r in via_df] == [101]
    assert via_df[0][1] == "en"


def test_langid_mapside_plan_shape(spark):
    """The mapside scorer is SHUFFLE-FREE: scoring a corpus against
    the collected profile dict adds zero exchanges — the property that
    makes it a stateless streaming gate (no state store, every
    redelivery scores identically)."""
    from excelstream_spark.operators.langid import (
        collect_language_profiles,
        langid_score_mapside,
    )
    from excelstream_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    train = _labeled(spark, [(1, "en", _EN), (2, "de", _DE)])
    model = collect_language_profiles(train_language_profiles(train))
    plan = (
        langid_score_mapside(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
