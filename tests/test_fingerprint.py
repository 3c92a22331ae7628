"""Winnowing fingerprints (operators/fingerprint.py): reference-
implementation equality, the winnowing guarantee, SQL-oracle parity for
both the fingerprint extraction and the pair stage."""

from __future__ import annotations

from excelstream_spark.operators import fingerprint as FP
from excelstream_spark.plans import oracles as ORC
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle

K, W = 5, 4


def _naive_winnow(toks, k, w):
    """Direct per-window transcription of Schleimer et al. §4: min hash
    per window, rightmost on ties, distinct selections in order."""
    import hashlib

    g = len(toks) - k + 1
    if g <= 0 or toks == [""]:
        return []
    h = [
        int(
            hashlib.md5(" ".join(toks[j : j + k]).encode()).hexdigest()[:8],
            16,
        )
        for j in range(g)
    ]
    out, seen = [], set()
    for i in range(max(1, g - w + 1)):
        window = h[i : i + w]
        m = min(window)
        pos = i + max(j for j, v in enumerate(window) if v == m)
        if (pos, m) not in seen:
            seen.add((pos, m))
            out.append((pos, m))
    return out


def test_winnow_py_matches_naive_reference():
    """The vectorized numpy selection equals the per-window loop over
    random-ish token lists covering: shorter than k, exactly k, fewer
    grams than w, ties (repeated tokens), and long inputs."""
    import random

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(7)]  # small vocab -> frequent ties
    cases = [
        [],
        ["a"],
        ["a", "b", "c", "d", "e"],                  # exactly one gram
        ["x"] * 12,                                  # all ties
    ] + [
        [rng.choice(vocab) for _ in range(n)]
        for n in (6, 9, 17, 40, 160)
        for _ in range(8)
    ]
    for toks in cases:
        text = " ".join(toks)
        got = FP.winnow_fingerprints_py(text, K, W)
        want = _naive_winnow(toks if toks else [""], K, W)
        assert got == want, (toks, got, want)


def test_winnowing_guarantee_offset_invariant():
    """The paper's guarantee: two documents sharing a passage of
    >= w + k - 1 tokens share at least one fingerprint HASH, at any
    cross-document offset (here shifts 1, 3, 11 — incongruent mod
    every fixed-grid size used elsewhere)."""
    passage = [f"p{i}q" for i in range(W + K - 1)]  # exactly w+k-1 tokens
    base = " ".join(["lead0"] + passage + ["tail0"])
    base_fps = {m for _, m in FP.winnow_fingerprints_py(base, K, W)}
    for shift in (1, 3, 11):
        other = " ".join(
            [f"u{i}v" for i in range(1 + shift)] + passage + ["zz"]
        )
        other_fps = {m for _, m in FP.winnow_fingerprints_py(other, K, W)}
        assert base_fps & other_fps, f"guarantee violated at shift {shift}"


# single-sourced with the dedup_winnowing driver row
_fps_oracle_ctes = ORC.winnow_fps_ctes


def test_winnow_fingerprints_vs_sql_oracle(spark, duck):
    """The mapInPandas extraction reproduces in DuckDB (window join +
    rightmost-min selection; md5-derived hashes bit-identical)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = FP.winnow_fingerprints(docs, k=K, w=W)
    oracle = (
        "WITH " + _fps_oracle_ctes(K, W)
        + "SELECT doc_id, pos, fp FROM fps"
    )
    assert_matches_oracle(got, duck, oracle)


def test_dedup_winnowing_pairs_vs_sql_oracle_and_semantics(spark, duck):
    """The full pair stage (distinct fp sets, hot-fp cut, inverted-index
    self-join, overlap coefficient) replays in SQL over the fixture; a
    crafted check asserts a copied document pairs with overlap 1.0."""
    import pandas as pd

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = FP.dedup_winnowing_pairs(docs, k=K, w=W, threshold=0.5)
    # the exact oracle the dedup_winnowing driver row ships
    assert_matches_oracle(
        got, duck, ORC.winnow_pairs_oracle(K, W, 0.5, 1000)
    )

    body = " ".join(f"c{i}word" for i in range(40))
    crafted = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "intro " + body,
                    " ".join(["pre0", "pre1", "pre2"]) + " " + body,  # shifted copy
                    " ".join(f"z{i}other" for i in range(40)),        # unrelated
                ],
            }
        )
    )
    pairs = {
        (r.doc_a, r.doc_b): r.overlap
        for r in FP.dedup_winnowing_pairs(crafted, k=K, w=W, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.7   # offset-invariant match
    assert all(3 not in p for p in pairs)            # unrelated stays unpaired


def test_neardup_increment_winnow_matches_batch(spark):
    """The incremental gate (increment fingerprints vs the stored
    corpus artifact — corpus never re-fingerprinted) must produce
    exactly the batch pair stage's cross (new, corpus) pairs, in both
    broadcast regimes."""
    import pandas as pd

    base = [
        (i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(20)
    ]
    shared_a = " ".join(f"sh{j}ared" for j in range(25))
    shared_b = " ".join(f"o{j}ther" for j in range(25))
    boiler = " ".join(f"bp{j}lt" for j in range(12))
    docs_rows = base + [
        (100, "intro " + shared_a),                 # corpus (even)
        (101, "pre1 pre2 pre3 " + shared_a),        # increment (odd)
        (102, shared_b + " tail"),                  # corpus (even)
        (103, "x0 " + shared_b),                    # increment (odd)
        (105, "y0 y1 " + shared_a),                 # increment (odd)
    ] + [
        # boilerplate hot in the CORPUS ALONE (6 even docs > cap 4), so
        # the corpus-artifact df-cut and the batch union df-cut agree
        (200 + 2 * j, f"c{j}u1 c{j}u2 " + boiler) for j in range(6)
    ] + [
        (201, "z1 z2 z3 " + boiler),                # increment, boiler only
        (203, boiler + " q8 q9"),                   # increment, boiler only
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(docs_rows, columns=["doc_id", "text"])
    )
    corpus = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    batch = FP.dedup_winnowing_pairs(
        docs, k=K, w=W, threshold=0.3, max_fp_df=10**6
    )
    expect = {}
    for r in batch.collect():
        if (r.doc_a % 2) != (r.doc_b % 2):
            new_id, cor_id = (
                (r.doc_a, r.doc_b) if r.doc_a % 2 == 1 else (r.doc_b, r.doc_a)
            )
            expect[(new_id, cor_id)] = (r.shared, r.overlap)
    assert (101, 100) in expect and (103, 102) in expect  # non-vacuous
    corpus_fps = FP.corpus_fingerprint_table(corpus, k=K, w=W)
    for bc in (True, False):
        got = {
            (r.doc_new, r.doc_corpus): (r.shared, r.overlap)
            for r in FP.neardup_increment_winnow(
                new, corpus_fps, k=K, w=W, threshold=0.3,
                max_fp_df=10**6, broadcast_increment=bc,
            ).collect()
        }
        assert got == expect, bc

    # ACTIVE df-cap parity: boiler fps are hot in the corpus alone, so
    # both the batch (union-df) and incremental (corpus-artifact-df)
    # cuts drop them — pairs whose only common material is boilerplate
    # vanish identically, and overlap denominators stay PRE-cut on both
    # sides (the regression this block guards)
    batch_cap = {
        (r.doc_a, r.doc_b): (r.shared, r.overlap)
        for r in FP.dedup_winnowing_pairs(
            docs, k=K, w=W, threshold=0.3, max_fp_df=4
        ).collect()
    }
    expect_cap = {
        ((a, b) if a % 2 == 1 else (b, a)): v
        for (a, b), v in batch_cap.items()
        if (a % 2) != (b % 2)
    }
    assert all(doc not in (201, 203) for doc, _ in expect_cap)
    got_cap = {
        (r.doc_new, r.doc_corpus): (r.shared, r.overlap)
        for r in FP.neardup_increment_winnow(
            new, corpus_fps, k=K, w=W, threshold=0.3, max_fp_df=4
        ).collect()
    }
    assert got_cap == expect_cap and len(got_cap) > 0


def test_hot_key_caps_drop_ultra_common_keys(spark):
    """The df-cap in both inverted-index pair ops (r6: flipped to a
    broadcast ANTI-join of the bounded hot set) actually drops
    over-the-cap keys: documents whose only common material is an
    ultra-common passage stop pairing once its keys exceed the cap."""
    import pandas as pd

    from excelstream_spark.operators.dedup import dedup_ngram_jaccard

    boiler = " ".join(f"b{i}x" for i in range(12))
    rows = [(i, boiler + f" unique{i}a unique{i}b unique{i}c") for i in range(8)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    # uncapped: every pair shares the boilerplate shingles
    uncapped = dedup_ngram_jaccard(docs, threshold=0.3)
    assert uncapped.count() > 0
    # capped below the boilerplate df (8 docs): the shared shingles drop,
    # nothing pairs
    capped = dedup_ngram_jaccard(docs, threshold=0.3, max_shingle_df=4)
    assert capped.count() == 0
    # winnowing's cap: the all-doc boilerplate fingerprints (selected
    # identically inside the shared region — winnowing is local) drop;
    # edge-window selections legitimately differ per doc and may keep
    # small-df fps, so the contract is "no posting list above the cap
    # feeds pairs", observable as high-overlap pairs disappearing
    fp_uncapped = FP.dedup_winnowing_pairs(
        docs, k=K, w=W, threshold=0.5, max_fp_df=1000
    )
    assert fp_uncapped.count() > 0
    fp_capped = FP.dedup_winnowing_pairs(
        docs, k=K, w=W, threshold=0.5, max_fp_df=4
    )
    assert fp_capped.count() < fp_uncapped.count()
    # and the bulk boilerplate fps (df = all 8 docs) are provably gone:
    # every surviving pair shares strictly fewer fps than uncapped pairs
    shared_cap = {
        (r.doc_a, r.doc_b): r.shared for r in fp_capped.collect()
    }
    shared_unc = {
        (r.doc_a, r.doc_b): r.shared for r in fp_uncapped.collect()
    }
    for p, s in shared_cap.items():
        assert s < shared_unc[p], p


def test_winnow_custom_id_column_and_string_ids(spark):
    """winnow_fingerprints, the corpus artifact, the incremental gate
    and the pair stage all accept a non-default id column name AND
    string ids (round-6 advisor: the extraction hard-coded doc_id/int64
    while every other dedup operator takes arbitrary id columns)."""
    corpus = spark.createDataFrame(
        [("docA", "the quick brown fox jumps over the lazy dog today"),
         ("docB", "completely different words with no shared passage "
                  "anywhere at all")],
        "name string, text string",
    )
    fps = FP.winnow_fingerprints(corpus, id_col="name", k=K, w=W)
    assert fps.columns == ["name", "pos", "fp"]
    assert fps.schema["name"].dataType.simpleString() == "string"
    assert fps.count() > 0
    art = FP.corpus_fingerprint_table(corpus, id_col="name", k=K, w=W)
    inc = spark.createDataFrame(
        [("docC", "the quick brown fox jumps over the lazy dog today")],
        "name string, text string",
    )
    hits = FP.neardup_increment_winnow(
        inc, art, id_col="name", k=K, w=W, threshold=0.5
    )
    assert [(r.doc_new, r.doc_corpus) for r in hits.collect()] == [
        ("docC", "docA")
    ]
    pairs = FP.dedup_winnowing_pairs(
        corpus.union(inc), id_col="name", k=K, w=W, threshold=0.5
    )
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == {
        ("docA", "docC")
    }
