"""BPE tokenizer training (operators/tokenizer.py) against a
pure-Python reference of the published algorithm (Sennrich et al. 2016
— word-frequency BPE): merge sequence bit-equality, encode stats,
greedy-overlap semantics, early stop, and checkpoint-block hygiene."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from excelstream_spark.functions.text import tokens_py
from excelstream_spark.operators.tokenizer import (
    bpe_encode_stats,
    bpe_train,
    word_counts,
)

TEXTS = [
    (0, "low lower lowest low low slow slower"),
    (1, "new newer newest news new new knew"),
    (2, "the newer the lower the slower the better"),
    (3, ""),
    (4, None),
]


def bpe_train_py(texts, num_merges, min_pair_count=2):
    """Reference implementation: Sennrich et al. 2016 Algorithm 1 with
    the same deterministic tie-break (count desc, then (left, right)
    code-point order)."""
    wc = Counter(tok for _, t in texts for tok in tokens_py(t or ""))
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((rank, l, r, n))
        for w in vocab:
            out = []
            for s in vocab[w]:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab, wc


def test_merge_sequence_matches_reference(spark):
    df = spark.createDataFrame(TEXTS, "doc_id bigint, text string")
    got = bpe_train(df, num_merges=12)
    want, _, _ = bpe_train_py(TEXTS, 12)
    assert got == want


def test_encode_stats_match_reference(spark):
    df = spark.createDataFrame(TEXTS, "doc_id bigint, text string")
    merges = bpe_train(df, num_merges=12)
    _, vocab, _ = bpe_train_py(TEXTS, 12)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_encode_stats(df, merges).collect()
    }
    want = {}
    for i, t in TEXTS:
        toks = tokens_py(t or "")
        want[i] = (len(toks), sum(len(vocab[w]) for w in toks))
    assert got == want  # null/empty docs present with (0, 0)


def test_overlapping_pair_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a) must become [aa,aa] — the published
    non-overlapping scan, not [aa,a,a] or a 3-symbol result."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aa")], "doc_id bigint, text string"
    )
    merges = bpe_train(df, num_merges=1)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    stats = bpe_encode_stats(df, merges).collect()[0]
    # aaaa -> [aa, aa] (2 pieces) x2, aa -> [aa] (1 piece)
    assert (stats["n_words"], stats["n_pieces"]) == (3, 5)


def test_early_stop_when_no_pair_repeats(spark):
    """All adjacent pairs unique -> zero merges at min_pair_count=2."""
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id bigint, text string")
    assert bpe_train(df, num_merges=8) == []


def test_train_frees_its_checkpoint_blocks(spark):
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(TEXTS, "doc_id bigint, text string")
    bpe_train(df, num_merges=10)  # > _CKPT_EVERY: exercises rotation
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set()


def test_word_counts_match_python(spark):
    df = spark.createDataFrame(TEXTS, "doc_id bigint, text string")
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    want = Counter(tok for _, t in TEXTS for tok in tokens_py(t or ""))
    assert got == dict(want)
