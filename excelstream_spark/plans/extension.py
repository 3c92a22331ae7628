"""Extension operator catalog entries (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal columns.

Every SQL-expressible op ships a DuckDB oracle; approximate ops
(simhash banding, IVF probing) are rows-only here and recall-tested in
tests/test_extension_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT
from excelstream_spark.operators import dedup as DD
from excelstream_spark.operators import multimodal as MM
from excelstream_spark.operators import similarity as SIM
from excelstream_spark.plans import oracles as ORC
from excelstream_spark.plans.catalog import query
from excelstream_spark.tables import load_table

# Shared SQL fragments for the oracles (kept in lockstep with
# functions/text.py — the Spark and SQL forms are the same algorithm).
_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
#: One tokenization convention everywhere (functions/text.py tokens()):
#: split the lowercased text on \s+ and drop empty tokens — empties can
#: only appear at the two edges, so this is exactly edge-whitespace
#: stripping of every kind (the round-6 advisor's finding: the previous
#: trim() form stripped only 0x20 and counted '\nfoo\n' as 3 tokens).
_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
    "x -> x <> '')"
)
#: NULL-coalescing variant for the Spark expressions that coalesce text
#: to '' first (the Gopher-metric columns) — NULL text tokenizes to []
#: there, not NULL.
_SQL_TOKS_NN = (
    "list_filter(regexp_split_to_array(lower(coalesce(text, '')), "
    "'\\s+'), x -> x <> '')"
)
# shingle/pair CTEs single-sourced from plans/oracles.ngram_pairs_ctes
# (r8: the pruned max_shingle_df variant lives there too — one copy)
_SQL_JACCARD_PAIRS = f"""
    {ORC.ngram_pairs_ctes()}
    SELECT doc_a, doc_b, inter * 1.0 / (na + nb - inter) AS jaccard
    FROM pairs
"""

_STOPLIST_SQL = "(" + ", ".join(f"'{w}'" for w in TXT.STOPWORDS) + ")"
#: Gopher rule constants single-sourced from functions/text.py so the
#: Spark side, this oracle, and the pytest SQL can never diverge
_GOPHER_STOPLIST_SQL = (
    "[" + ",".join(f"'{w}'" for w in TXT.GOPHER_STOPWORDS) + "]"
)
_GOPHER_WORDS_LO, _GOPHER_WORDS_HI = next(
    (lo, hi) for name, lo, hi in TXT.GOPHER_RULES if name == "n_words"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_LANG_SQL_COUNTS = ", ".join(
    f"len(list_filter({_SQL_TOKS}, t -> t IN ({', '.join(repr(m) for m in markers)}))) AS c_{lang}"
    for lang, markers in TXT.LANG_MARKERS.items()
)


@query(
    "text_analysis",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, source, lang AS labeled_lang, text,
                 {_LANG_SQL_COUNTS},
                 length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS c_zh,
                 0.4 * least(1.0, len({_SQL_TOKS}) / 50.0)
               + 0.3 * least(1.0, (len(list_filter({_SQL_TOKS}, t -> t IN {_STOPLIST_SQL}))
                                   * 1.0 / len({_SQL_TOKS})) * 5)
               + 0.3 * (1 - least(1.0, (length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                                        * 1.0 / length(text)) * 10)) AS quality
          FROM documents
        )
        SELECT doc_id, source, labeled_lang,
               CAST(len({_SQL_TOKS}) AS INT)                               AS n_tokens,
               CAST(length(text) AS INT)                                   AS n_chars_calc,
               CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INT) AS n_punct,
               CAST(len(list_filter({_SQL_TOKS}, t -> t IN {_STOPLIST_SQL})) AS INT) AS n_stopwords,
               list_sum(list_transform({_SQL_TOKS}, t -> length(t))) * 1.0
                 / len({_SQL_TOKS})                                        AS avg_token_len,
               md5({_SQL_NORM})                                            AS fp,
               CASE WHEN c_en >= greatest(c_de, c_es, c_fr, c_zh) AND c_en > 0 THEN 'en'
                    WHEN c_de >= greatest(c_es, c_fr, c_zh) AND c_de > 0 THEN 'de'
                    WHEN c_es >= greatest(c_fr, c_zh) AND c_es > 0 THEN 'es'
                    WHEN c_fr >= c_zh AND c_fr > 0 THEN 'fr'
                    WHEN c_zh > 0 THEN 'zh'
                    ELSE 'und' END                                         AS predicted_lang,
               quality, quality >= 0.5 AS keep,
               CAST(len(list_filter({_SQL_TOKS_NN},
                     x -> regexp_matches(x, '[a-z]'))) AS INT)             AS n_alpha_words,
               CAST(len(list_intersect(
                     list_distinct(list_transform(
                       {_SQL_TOKS_NN},
                       x -> regexp_replace(x, '[^a-z]', '', 'g'))),
                     {_GOPHER_STOPLIST_SQL})) AS INT)
                                                                           AS n_gopher_stopwords,
               len({_SQL_TOKS_NN})
                 BETWEEN {_GOPHER_WORDS_LO} AND {_GOPHER_WORDS_HI}         AS pass_word_count
        FROM scored
    """,
    tags=("text", "dedup"),
)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis in one pass (round-1's text_stats /
    text_fingerprint / text_lang_id / text_quality_filter consolidated
    into one catalog entry so every entry fits the driver's CORRECTNESS
    window): token/char/punct/stopword statistics, md5 fingerprint of the
    normalized text (the cross-engine dedup key), marker-word language ID
    vs the labeled column, and the composite quality score + keep/drop
    decision.  All pure JVM-side codegen'd expressions — embarrassingly
    parallel, no shuffle, no Python.

    Round 5 adds three Gopher-rule measurements (functions/text.py
    gopher_metrics) to put the quality-rule family under the driver's
    hash gate: alpha-word count, Gopher stop-word count, and the
    word-count rule flag — the three signals that actually vary on the
    synthetic fixture (the line/symbol metrics are degenerate there
    and stay pytest-oracled)."""
    t = F.col("text")
    gm = TXT.gopher_metrics(t)
    return _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.col("lang").alias("labeled_lang"),
        TXT.token_count(t).alias("n_tokens"),
        TXT.char_count(t).alias("n_chars_calc"),
        TXT.punct_count(t).alias("n_punct"),
        TXT.stopword_count(t).alias("n_stopwords"),
        TXT.avg_token_length(t).alias("avg_token_len"),
        TXT.fingerprint(t).alias("fp"),
        TXT.lang_id(t).alias("predicted_lang"),
        TXT.quality_score(t).alias("quality"),
        (TXT.quality_score(t) >= 0.5).alias("keep"),
        # exact integer count (NOT frac * n_words: that round-trips
        # through a double division and can truncate off-by-one)
        F.size(
            F.filter(
                TXT.tokens(F.coalesce(t, F.lit(""))),
                lambda x: x.rlike("[a-z]"),
            )
        ).alias("n_alpha_words"),
        gm["n_gopher_stopwords"].alias("n_gopher_stopwords"),
        (
            (gm["n_words"] >= _GOPHER_WORDS_LO)
            & (gm["n_words"] <= _GOPHER_WORDS_HI)
        ).alias("pass_word_count"),
    )


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

#: dedup_exact's former registered oracle — FOLDED out of the catalog
#: late-r10 (policy rule 4, strongest form: the md5-groupBy min-id
#: shape is wholly contained in BOTH training_corpus_pipeline (v1) and
#: v4's in-window composed oracles).  The hash gate moved verbatim to
#: tests/test_catalog_oracle.py::test_folded_dedup_exact_oracle.
_SQL_DEDUP_EXACT = f"""
    SELECT min(doc_id) AS doc_id, fp
    FROM (SELECT doc_id, md5({_SQL_NORM}) AS fp FROM documents)
    GROUP BY fp
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint, min-id representative.

    Folded out of the catalog late-r10 (rule 4 strongest form — see
    _SQL_DEDUP_EXACT above); still hash-gated in pytest."""
    return DD.dedup_exact(_docs(spark, sf_dir))


#: dedup_ngram_jaccard's oracle, kept importable for the folded gate
#: (tests/test_catalog_oracle.py::test_folded_dedup_ngram_jaccard_oracle)
_SQL_JACCARD_05 = (
    f"{_SQL_JACCARD_PAIRS} WHERE inter * 1.0 / (na + nb - inter) >= 0.5"
)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.5 near-dup pairs via inverted index.

    FOLDED out of the catalog in r12 (policy rule 4, the move the r11
    verdict itself proposed — funding the audio_dedup_containment
    promotion): its plan is IDENTICAL to the r10-folded
    dedup_ngram_containment's (same inverted-index pair pipeline, only
    the closing arithmetic differs — the two siblings' gates now sit
    side by side in tests/test_catalog_oracle.py), the shingle pair
    close stays in-window via dedup_minhash_lsh (whose oracle IS the
    brute-force jaccard answer at 0.8) and the composed v2 pipeline,
    and its DuckDB hash gate moved verbatim to
    test_folded_dedup_ngram_jaccard_oracle — no hash-level check was
    lost.  Keeps its scale-ladder rung."""
    return DD.dedup_ngram_jaccard(_docs(spark, sf_dir), threshold=0.5)


_SQL_CONTAINMENT_PAIRS = f"""
    {ORC.ngram_pairs_ctes()}
    SELECT doc_a, doc_b,
           inter * 1.0 / na AS cont_a,
           inter * 1.0 / nb AS cont_b
    FROM pairs
"""


def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC shingle-containment pairs at >= 0.8 (operators/dedup.
    dedup_ngram_containment): |A∩B|/|A| and /|B| — the subset-duplicate
    detector (short article quoted inside a long page: jaccard
    arbitrarily low, containment 1.0), the C4/RealNews news-dedup rule.

    FOLDED out of the catalog in r10 (policy rule 4, funding the
    sim_pq_topk_reranked tail slot): the plan is IDENTICAL to the
    registered dedup_ngram_jaccard row's (same inverted-index pair
    pipeline; only the closing arithmetic differs — the argument the
    r9 rotation already made when demoting jaccard), and its DuckDB
    hash gate moved verbatim to tests/test_catalog_oracle.py::
    test_folded_dedup_ngram_containment_oracle — no hash-level check
    was lost."""
    return DD.dedup_ngram_containment(_docs(spark, sf_dir), threshold=0.8)


@query(
    "dedup_minhash_lsh",
    oracle=f"{_SQL_JACCARD_PAIRS} WHERE inter * 1.0 / (na + nb - inter) >= 0.8",
    tags=("dedup",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(32 bands) candidates, exact-verified at >= 0.8.

    The oracle is the brute-force jaccard answer: with 32x4 banding the
    probability of missing a 0.8-jaccard pair is ~5e-8, so LSH output ==
    exact output (and the bench shows it at a fraction of the cost).
    """
    return DD.dedup_minhash_lsh(_docs(spark, sf_dir), threshold=0.8)


@query(
    "dedup_simhash",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_distinct({_SQL_TOKS_NN})) AS tok
          FROM documents
        ),
        hashed AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS hh,
                 CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS hl
          FROM toks
        ),
        votes AS (
          SELECT doc_id, g.b,
                 sum(CASE WHEN g.b < 32
                          THEN CASE WHEN (hl >> g.b) & 1 = 1 THEN 1 ELSE -1 END
                          ELSE CASE WHEN (hh >> (g.b - 32)) & 1 = 1 THEN 1 ELSE -1 END
                     END) AS v
          FROM hashed
          CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) g
          GROUP BY doc_id, g.b
        ),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 AND b < 63
                               THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
                 + CASE WHEN max(CASE WHEN b = 63 AND v > 0 THEN 1 ELSE 0 END) = 1
                        THEN -9223372036854775808 ELSE 0 END AS sig
          FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) banded near-dup pairs within Hamming <= 3, where
    4x16 banding recall is EXACTLY 1 by pigeonhole — so the banded output
    equals brute force and is hash-checkable.  The md5-derived token hash
    is identical across engines; the ORACLE recomputes every signature
    from scratch in SQL (tokenize -> per-bit votes -> sign assembly) and
    brute-forces the hamming pairs.  The banding mechanics at looser
    thresholds (approximate recall) stay covered by unit tests.

    NULL text is coalesced to '' on BOTH sides before tokenizing: the
    Spark operator keeps null-text docs (explode_outer -> signature 0)
    while DuckDB's unnest of a NULL token list yields zero rows and
    would silently drop them from sigs — an asymmetry that only bites
    when the regenerated fixture contains null texts.  With coalesce,
    both engines tokenize '' to [''] (split of empty string) and hash
    md5('') identically, so null/empty docs carry the same well-defined
    signature on both sides."""
    return DD.dedup_simhash(
        _docs(spark, sf_dir).withColumn("text", F.coalesce("text", F.lit(""))),
        max_hamming=3,
        hash_fn="md5",
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (> 0.45 on this corpus).

    FOLDED out of the catalog in r9 (verdict #5, policy rule 4): the
    all-pairs baseline's output is the recall oracle INSIDE the
    in-window dedup_embedding_lsh family (tests/test_extension_ops.py),
    and its DuckDB hash gate moved verbatim to
    tests/test_quality_semantic.py::test_dedup_embedding_oracle — so
    the fold frees a tail slot without losing the hash-level check.
    Still a bench leg (same plan, same name)."""
    return DD.dedup_embedding_cosine(_emb(spark, sf_dir), threshold=0.45)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10):
    broadcast queries x streamed corpus, per-query top-k window.

    FOLDED out of the catalog in r9 (verdict #5, policy rule 4): the
    brute-force baseline is the recall oracle INSIDE both in-window ANN
    rows (sim_ann_ivf, sim_topk_quantized recall tests), and its DuckDB
    hash gate moved verbatim to
    tests/test_quality_semantic.py::test_sim_topk_bruteforce_oracle.
    Still a bench leg (same plan, same name)."""
    emb = _emb(spark, sf_dir)
    return SIM.cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "sim_ann_ivf",
    oracle="""
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id % 50 = 0),
        asg AS (
          SELECT id, cid FROM (
            SELECT e.vec_id AS id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) rn
            FROM emb e CROSS JOIN cent c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT id AS qid, cid FROM (
            SELECT e.vec_id AS id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) rn
            FROM emb e CROSS JOIN cent c WHERE e.vec_id < 10
          ) WHERE rn <= 3
        ),
        scored AS (
          SELECT p.qid, a.id AS nid, list_cosine_similarity(q.v, m.v) AS s
          FROM probes p
          JOIN asg a USING (cid)
          JOIN emb q ON q.vec_id = p.qid
          JOIN emb m ON m.vec_id = a.id
          WHERE a.id <> p.qid
        )
        SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS INT) AS rank,
               round(s, 6) AS cos_sim_r
        FROM (SELECT qid, nid, s, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, nid) rn FROM scored)
        WHERE rn <= 5
    """,
    tags=("similarity", "vector"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (probe 3 of the deterministic seeded cells).

    The whole pipeline is a pure function of the data — seeds are every
    50th vec_id, assignment/probing are nearest-cosine with ascending-id
    tie-breaks — so the ORACLE replays the identical IVF construction in
    SQL (nearest-of-seeded-centroids, probe 3, top-5).  This checks the
    index mechanics end-to-end, not merely recall."""
    emb = _emb(spark, sf_dir)
    return SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "sim_pq_topk_reranked",
    oracle=ORC.pq_init_reranked_oracle(),
    tags=("similarity", "vector", "pq", "compression"),
)
def sim_pq_topk_reranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization serving composition, hash-checked
    end-to-end (operators/pq.py — the family's hard-signal row, r9
    verdict #1): init codebook -> distributed engine-exact encode (the
    8-byte-code artifact, 32x smaller than float32) -> ADC candidate
    top-20 from the codes alone (per-query subspace LUTs; the corpus
    floats are never read) -> exact JVM-cosine re-rank of the
    nq x 20 candidate sliver to top-5.

    The codebook is the pq_train(n_iter=0) INIT over the md5-ordered
    ``vec_id < 200`` slice — present at every fixture sf, so the whole
    pipeline is a pure function of the data and the ORACLE rebuilds
    codebook, codes, ADC scores and the re-rank in SQL (the
    sim_ann_ivf seeded-construction convention; plans/oracles.
    pq_init_reranked_oracle documents the cross-engine arithmetic).
    Lloyd-TRAINED codebooks stay the production path (recall 0.94+
    pinned in tests/test_pq.py; the trained encode is
    hypothesis-pinned against the literal-codebook DuckDB replay) —
    the init codebook is the oracle-friendly form of the same
    contract: the codebook, not the trainer, is what encode must be
    exact against.

    100 TB shape (pq.py module docstring): encode is one Arrow scan,
    zero exchanges; ADC reads ONLY the code column with per-batch
    top-k pruning (shuffle O(partitions x queries x k)); the re-rank
    fetch broadcasts the candidate sliver so the float corpus streams
    map-side."""
    from excelstream_spark.operators import pq as PQ

    emb = _emb(spark, sf_dir)
    cb = PQ.pq_train(
        emb.where(F.col("vec_id") < 200), m=8, k=16, n_iter=0, sample_n=200
    )
    codes = PQ.pq_encode(emb, cb)
    queries = emb.where(
        F.col("embedding").isNotNull() & (F.col("vec_id") < 10)
    )
    out = PQ.topk_pq_reranked(codes, cb, emb, queries, k=5, k_prime=20)
    return out.select(
        "query_id",
        "neighbor_id",
        "rank",
        F.round("cos_sim", 6).alias("cos_sim_r"),
    )


# --------------------------------------------------------------------------
# Multimodal
# --------------------------------------------------------------------------

@query(
    "multimodal_features",
    oracle="""
        WITH png AS (
          SELECT doc_id, 'image/png' AS modality, 'png-stdlib' AS decoder,
                 CAST(2 + 2 * (doc_id % 2) AS INT)              AS width,
                 CAST(2 AS INT)                                 AS height,
                 CAST(1 AS INT)                                 AS channels,
                 CAST(1 AS INT)                                 AS n_frames,
                 CAST(NULL AS INT)                              AS sample_rate
          FROM documents WHERE doc_id % 4 = 0
        ),
        px AS (
          SELECT doc_id,
                 (doc_id * 31
                  + unnest(generate_series(0, (2 + 2 * (doc_id % 2)) * 2 - 1)) * 7
                 ) % 256 AS g
          FROM documents WHERE doc_id % 4 = 0
        ),
        pngm AS (
          SELECT png.*, m.mean0
          FROM png JOIN (SELECT doc_id, avg(g) AS mean0 FROM px GROUP BY doc_id) m
          USING (doc_id)
        ),
        wav AS (
          SELECT doc_id, 'audio/wav' AS modality, 'wav-stdlib' AS decoder,
                 CAST(NULL AS INT)                              AS width,
                 CAST(NULL AS INT)                              AS height,
                 CAST(1 AS INT)                                 AS channels,
                 CAST(4 + doc_id % 5 AS INT)                    AS n_frames,
                 CAST(8000 + (doc_id % 5) * 1000 AS INT)        AS sample_rate,
                 (doc_id % 32) / 32.0                           AS mean0
          FROM documents WHERE doc_id % 4 = 1
        ),
        jpg AS (
          SELECT doc_id, 'image/jpeg' AS modality, 'jpeg-real' AS decoder,
                 CAST(8 + 8 * (doc_id % 2) AS INT)              AS width,
                 CAST(8 AS INT)                                 AS height,
                 CAST(1 AS INT)                                 AS channels,
                 CAST(1 AS INT)                                 AS n_frames,
                 CAST(NULL AS INT)                              AS sample_rate,
                 CAST(doc_id % 256 AS DOUBLE)                   AS mean0
          FROM documents WHERE doc_id % 4 = 2
        ),
        txt AS (
          SELECT doc_id, 'text/plain' AS modality, 'fake' AS decoder,
                 CAST(octet_length(encode(coalesce(text, ''))) % 640 AS INT)       AS width,
                 CAST((octet_length(encode(coalesce(text, ''))) * 7) % 480 AS INT) AS height,
                 CAST(NULL AS INT)                                                 AS channels,
                 CAST(1 + octet_length(encode(coalesce(text, ''))) % 8 AS INT)     AS n_frames,
                 CAST(NULL AS INT)                                                 AS sample_rate,
                 CAST(NULL AS DOUBLE)                                              AS mean0
          FROM documents WHERE doc_id % 4 = 3
        ),
        feats AS (
          SELECT * FROM pngm UNION ALL SELECT * FROM wav
          UNION ALL SELECT * FROM jpg UNION ALL SELECT * FROM txt
        )
        SELECT doc_id, CAST(f AS INT) AS frame_idx, modality, decoder,
               width, height, channels, n_frames, sample_rate, mean0
        FROM (SELECT *, unnest(generate_series(0, n_frames - 1)) AS f FROM feats)
        WHERE f % 2 = 0
    """,
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, hash-checked end-to-end: synthesize_payloads
    builds genuine PNG (stdlib encoder: IHDR/IDAT/IEND + zlib + CRC) and
    RIFF/PCM WAV payloads whose pixel/sample values are pure doc_id
    arithmetic, extract_features decodes them with the stdlib decoders
    (chunk walk + unfilter for PNG, RIFF walk + amplitude stats for WAV),
    and the oracle recomputes the decoded facts — dimensions, channels,
    frame counts, sample rate, per-channel means — arithmetically in SQL.
    Every dispatch branch is exercised in one entry: PNG (doc_id%4=0),
    WAV (%4=1), baseline JPEG (%4=2 — r6: solid-gray payloads from the
    operators/jpeg_baseline encoder, REALLY entropy-decoded; a flat
    image is DC-only so the all-ones-quant round-trip is exact and the
    mean equals the integer gray value), and the deterministic
    text-fake path (%4=3).  The means
    are exact multiples of 1/8 resp. 1/32 (JPEG: integers) by
    construction, so the
    decoders' round-to-3/round-to-6 is the identity on both engines (no
    banker's-vs-half-away hazard).  The decoder label for JPEG is
    normalized to 'jpeg-real' (PIL when importable, the stdlib baseline
    decoder otherwise — both produce identical values on these
    payloads), keeping the oracle environment-independent.  Frame-index sampling (every 2nd
    frame) is folded in as before: one row per sampled frame.  md5/
    byte_len of the compressed payloads are intentionally outside the
    projection (zlib output is not SQL-recomputable); they are
    pytest-proven.  No shuffle anywhere: encode and decode are one
    mapInPandas pass each."""
    feats = MM.extract_features(MM.synthesize_payloads(_docs(spark, sf_dir)))
    # joinless: exploding ON the feature rows keeps the decode to ONE
    # mapInPandas pass (a frames-x-feats join would re-evaluate the
    # decode subtree on both branches).  The sequence is guarded for
    # n_frames = 0 (corrupt-payload rows): sequence(0, -1) counts DOWN
    # ([0, -1]), which would fabricate a frame row the oracle's
    # generate_series (empty) does not have.
    return feats.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n_frames") >= 1,
                F.sequence(F.lit(0), F.col("n_frames") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("frame_idx"),
        "modality",
        # environment-independent JPEG label (docstring): PIL and the
        # stdlib baseline decoder agree on these payloads' values
        F.when(
            F.col("decoder").isin("pil", "jpeg-stdlib"), F.lit("jpeg-real")
        ).otherwise(F.col("decoder")).alias("decoder"),
        "width",
        "height",
        "channels",
        "n_frames",
        "sample_rate",
        F.element_at("channel_means", 1).alias("mean0"),
    ).filter((F.col("frame_idx") % 2) == 0)


@query(
    "text_token_pieces",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_SQL_TOKS}) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                    AS INT)                  AS n_bpe_pieces,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) * 1.0
                 / len({_SQL_TOKS})          AS pieces_per_token
        FROM documents
    """,
    tags=("text",),
)
def text_token_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex pieces): the
    LLM-budget metric; pure codegen'd regexp_count, no Python."""
    t = F.col("text")
    ws = TXT.token_count(t)
    bpe = TXT.bpe_piece_count(t)
    return _docs(spark, sf_dir).select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_pieces"),
        # try_divide: 0 whitespace tokens (empty doc) -> NULL, matching
        # the oracle's x/0 in DuckDB rather than an ANSI error
        F.try_divide(bpe * 1.0, ws).alias("pieces_per_token"),
    )


@query(
    "training_corpus_pipeline",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, text, lang, {_SQL_TOKS} AS t FROM documents
        ),
        quality AS (
          SELECT doc_id, text, lang FROM toks
          WHERE len(t) >= 10
            AND len(list_filter(t, x -> x IN {_STOPLIST_SQL})) * 1.0 / len(t) >= 0.05
        ),
        lang_kept AS (SELECT * FROM quality WHERE lang IN ('en', 'de')),
        exact_rep AS (
          SELECT min(doc_id) AS doc_id
          FROM lang_kept
          GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        ),
        survivors AS (
          SELECT l.doc_id, l.text, l.lang FROM lang_kept l
          JOIN exact_rep r ON l.doc_id = r.doc_id
        ),
        sets_ AS (
          SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
          FROM (SELECT doc_id, {_SQL_TOKS} AS t
                FROM survivors)
        ),
        ex AS (SELECT doc_id, len(sh) n, unnest(sh) s FROM sets_ WHERE len(sh) > 0),
        near_dups AS (
          SELECT DISTINCT b.doc_id
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id, a.n, b.n
          HAVING count(*) * 1.0 / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.8
        )
        SELECT s.doc_id, s.lang
        FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM near_dups)
    """,
    tags=("pipeline", "dedup", "text"),
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data cleaning pipeline in one plan:

    1. quality gate: >= 10 tokens and >= 5% stopwords (natural language),
    2. language filter: keep en/de,
    3. exact dedup: one representative (min doc_id) per normalized-text
       fingerprint,
    4. near-dedup: drop the HIGHER doc_id of every >= 0.8-jaccard pair
       (minhash-LSH candidates + exact verification).

    Every stage is a DataFrame transform on the previous one — a single
    lazy plan, shuffling only fingerprints, shingle hashes, and ids.  The
    oracle replays the same four stages in SQL, with brute-force jaccard
    standing in for LSH (recall ~1 at 0.8, see dedup_minhash_lsh).
    """
    docs = _docs(spark, sf_dir)
    toks = TXT.tokens(F.col("text"))
    quality = docs.filter(
        (F.size(toks) >= 10) & (TXT.stopword_ratio(F.col("text")) >= 0.05)
    )
    lang_kept = quality.filter(F.col("lang").isin("en", "de"))
    reps = DD.dedup_exact(lang_kept)  # (doc_id, fp) min-id per group
    survivors = lang_kept.join(reps.select("doc_id"), "doc_id")
    near = DD.dedup_minhash_lsh(survivors, threshold=0.8).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    return survivors.join(near, "doc_id", "left_anti").select("doc_id", "lang")


# single source of truth in functions/text.py (the reusable
# pii_counts/redact_pii operators use the same patterns this entry's
# oracle embeds)
from excelstream_spark.functions.text import (  # noqa: E402
    PII_EMAIL_PATTERN as _PII_EMAIL,
    PII_IP_PATTERN as _PII_IP,
    PII_PHONE_PATTERN as _PII_PHONE,
)
#: deterministic PII injected into a DERIVED column on both engines — the
#: synthetic corpus contains none, and redaction must be verified against
#: non-zero counts
_SQL_AUG = (
    "text || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || "
    "'@example.com from 10.0.' || (doc_id % 256) || '.1 call +15551234567' "
    "ELSE '' END"
)


@query(
    "corpus_governance",
    oracle=f"""
        WITH pii AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(a, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(a, '{_PII_IP}')) AS BIGINT) AS n_ips,
                 CAST(len(regexp_extract_all(a, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
                 CAST(length(regexp_replace(regexp_replace(regexp_replace(
                      a, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                      '{_PII_IP}', '<IP>', 'g'),
                      '{_PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
          FROM (SELECT doc_id, {_SQL_AUG} AS a FROM documents)
        ),
        toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
        rep AS (
          SELECT doc_id,
                 round(1.0 - len(list_distinct(sh)) * 1.0 / len(sh), 6) AS rep3_ratio_r
          FROM (SELECT doc_id,
                       list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS sh
                FROM toks WHERE len(t) >= 3)
        ),
        g8 AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   list_transform(generate_series(1, len(t) - 7),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                       || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                       || ' ' || t[i+7]))) AS s
          FROM toks WHERE len(t) >= 8
        ),
        contam AS (
          SELECT DISTINCT d.doc_id
          FROM g8 d JOIN g8 b ON d.s = b.s
          WHERE b.doc_id % 13 = 0 AND d.doc_id % 13 <> 0
        )
        SELECT p.doc_id, p.n_emails, p.n_ips, p.n_phones, p.redacted_len,
               r.rep3_ratio_r,
               CAST(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                 AS contaminated
        FROM pii p
        JOIN rep r USING (doc_id)
        LEFT JOIN contam c USING (doc_id)
    """,
    tags=("pipeline", "text", "governance"),
)
def corpus_governance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-governance pass for a training-data pipeline, one plan:

    1. PII redaction: email / IPv4 / intl-phone regexes counted and
       replaced (codegen'd regexp_count/regexp_replace; no shuffle).
       The synthetic corpus has no PII, so a deterministic PII suffix is
       injected into a derived column for doc_id % 7 == 0 on BOTH
       engines — the counts verified are non-zero.
    2. Repetition filter signal (Gopher-style): fraction of duplicate
       3-grams per doc, from the hashed shingle rows (distinct count via
       one groupBy; total = n_tokens - 2).
    3. Benchmark decontamination: docs sharing any 8-gram with the
       benchmark slice (doc_id % 13 == 0) are flagged.  The benchmark's
       hashed 8-gram set is BROADCAST (benchmark sets are tiny vs the
       corpus), so contamination is a map-side semi-join — no corpus
       shuffle at 100 TB.
    """
    docs = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 call +15551234567"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IP),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    pii = docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PII_IP)).cast("long").alias("n_ips"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.size(TXT.tokens(F.col("text"))).alias("ntok"),
    )
    n_dist3 = (
        DD.shingle_rows(docs, k=3)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dist"))
    )
    rep = (
        pii.filter(F.col("ntok") >= 3)
        .join(n_dist3, pii.doc_id == n_dist3.id)
        .select(
            "doc_id", "n_emails", "n_ips", "n_phones", "redacted_len",
            F.round(
                1.0 - F.col("n_dist") / (F.col("ntok") - 2), 6
            ).alias("rep3_ratio_r"),
        )
    )
    g8 = DD.shingle_rows(docs, k=8)
    bench_grams = g8.filter(F.col("id") % 13 == 0).select("s").distinct()
    contam = (
        g8.filter(F.col("id") % 13 != 0)
        .join(F.broadcast(bench_grams), "s")
        .select(F.col("id").alias("doc_id"))
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    return rep.join(contam, "doc_id", "left").select(
        "doc_id", "n_emails", "n_ips", "n_phones", "redacted_len",
        "rep3_ratio_r",
        F.coalesce(F.col("hit"), F.lit(0).cast("long")).alias("contaminated"),
    )


def _lsh_oracle_sql(
    n_planes: int = 4, n_tables: int = 8, dim: int = 64, threshold: float = 0.45
) -> str:
    """DuckDB replay of the full hyperplane-LSH pipeline: the SAME
    md5-derived plane weights the Spark operator binds (functions/
    planes.py) are formatted into SQL literals, so bucket assignment is
    bit-identical across engines; candidates are pairs sharing any
    table's bucket, verified against the exact cosine pairs."""
    from excelstream_spark.functions.planes import plane_weights

    per_table = []
    for t in range(n_tables):
        bits = []
        for i in range(n_planes):
            ws = ", ".join(repr(w) for w in plane_weights(t, i, dim))
            bits.append(
                f"(CASE WHEN list_dot_product(v, [{ws}]) > 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        per_table.append(
            f"SELECT vec_id, {t} AS tbl, {' + '.join(bits)} AS bucket FROM emb"
        )
    buckets = " UNION ALL ".join(per_table)
    return f"""
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
        b AS ({buckets}),
        cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
                 FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket
                  AND x.vec_id < y.vec_id),
        pairs AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                         round(list_cosine_similarity(a.v, c.v), 6) AS cos_sim_r
                  FROM emb a JOIN emb c ON a.vec_id < c.vec_id
                   AND list_cosine_similarity(a.v, c.v) > {threshold})
        SELECT p.id_a, p.id_b, p.cos_sim_r FROM pairs p JOIN cand USING (id_a, id_b)
    """


@query("dedup_embedding_lsh", oracle=_lsh_oracle_sql(), tags=("dedup", "vector"))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup: hyperplane buckets generate
    candidates without a pairwise pass, then candidates verify exactly.
    r=4/L=8 here targets this corpus's LOW 0.45-cos threshold, trading
    candidate-set size for recall (~0.9 measured); at scale use the
    defaults (r=8, L=16) with a high-similarity threshold — see
    lsh_bucket_candidates for the precision math.  The plane weights are
    shared Python constants (functions/planes.py), so the ORACLE replays
    bucketing + verification exactly in SQL — the LSH mechanics are
    hash-checked, recall is additionally asserted in unit tests."""
    emb = _emb(spark, sf_dir)
    cand = SIM.lsh_candidate_pairs(emb, n_planes=4, n_tables=8)
    pairs = DD.dedup_embedding_cosine(emb, threshold=0.45)
    return cand.join(pairs, ["id_a", "id_b"]).select("id_a", "id_b", "cos_sim_r")


# NOTE: the TRAINED-k-means IVF variant (similarity.ivf_topk_trained) is
# deliberately NOT a catalog entry: a SQL oracle would have to replicate
# pyspark.ml KMeans, so its driver row could only ever be gray
# (rows-only), spending one of the 50 window slots a hash-checkable
# operator can use.  The seeded-cell sim_ann_ivf entry above hash-checks
# the identical probe/score pipeline; the trained centroids' recall is
# asserted in tests/test_extension_ops.py.


# --------------------------------------------------------------------------
# Training-corpus composition: clusters, quantized retrieval, packing,
# sampling
# --------------------------------------------------------------------------

@query(
    "components_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE jp AS (
          {_SQL_JACCARD_PAIRS.strip()}
        ),
        p AS (SELECT doc_a, doc_b FROM jp WHERE jaccard >= 0.5),
        nodes AS (SELECT doc_a AS n FROM p UNION SELECT doc_b FROM p),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION SELECT doc_b, doc_a FROM p),
        cc(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
          WHERE cc.lbl < e.v
        )
        SELECT node AS id, min(lbl) AS component FROM cc GROUP BY node
    """,
    tags=("dedup", "graph"),
)
def components_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (alternating large-star/small-star rounds,
    Kiveris et al. SoCC'14) over the exact 3-gram-Jaccard >= 0.5 near-dup
    pairs: the transitive closure every production dedup needs (A~B, B~C
    -> one representative for {{A, B, C}}).  Component label = minimum
    doc_id of the set.  The ORACLE computes the same closure with a
    recursive min-label-propagation CTE over the same pairs, so the
    distributed fixpoint is hash-checked end-to-end."""
    from excelstream_spark.operators.components import connected_components

    pairs = DD.dedup_ngram_jaccard(_docs(spark, sf_dir), threshold=0.5)
    return connected_components(pairs, id_a="doc_a", id_b="doc_b")


@query(
    "sim_topk_quantized",
    oracle="""
        WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        sc AS (
          SELECT vec_id, v,
                 CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
                      ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
                 END AS s
          FROM emb
        ),
        dq AS (
          SELECT vec_id,
                 CAST(list_transform(v, x ->
                   CAST(CAST(round(x / s) AS BIGINT) * CAST(s AS FLOAT) AS FLOAT))
                   AS DOUBLE[]) AS dv
          FROM sc
        ),
        scored AS (
          SELECT q.vec_id query_id, c.vec_id neighbor_id,
                 list_cosine_similarity(q.dv, c.dv) cos_sim,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.dv, c.dv) DESC,
                            c.vec_id) rn
          FROM dq q JOIN dq c ON c.vec_id != q.vec_id
          WHERE q.vec_id < 10
        )
        SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
               round(cos_sim, 6) AS cos_sim_r
        FROM scored WHERE rn <= 5
    """,
    tags=("similarity", "vector", "quantize"),
)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine retrieval over the INT8-QUANTIZED corpus: quantize
    (symmetric per-vector int8, the 4x-smaller shuffle/broadcast layout),
    dequantize through the JVM-side expression, then exact top-k.  The
    whole codec is deterministic — double-precision quotients with SQL
    round-half-away semantics — so the ORACLE reproduces every int8 code,
    the float32 dequantized values, and the final ranking from the raw
    parquet.  The float32-matmul streaming scorer over the same codes
    (quantize.topk_quantized) is recall-asserted in unit tests."""
    from excelstream_spark.operators import quantize as QZ

    emb = _emb(spark, sf_dir)
    q = QZ.quantize_embeddings(emb)
    deq = q.select(
        F.col("id").alias("vec_id"), QZ.dequantize_expr().alias("embedding")
    )
    return SIM.cosine_topk_bruteforce(
        deq, deq.filter(F.col("vec_id") < 10), k=5
    )


@query(
    "pack_sequences_audit",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT)                       AS n_docs,
               CAST(sum(n_tok) AS BIGINT)                     AS total_tokens,
               CAST(sum(CASE WHEN n_tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
                                                              AS n_oversize,
               CAST(0 AS BIGINT)                              AS overfull_bins
        FROM (SELECT len({_SQL_TOKS}) AS n_tok FROM documents
              WHERE text IS NOT NULL)
    """,
    tags=("packing",),
)
def pack_sequences_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (shard-local bounded best-fit, FFD family)
    audited through its PARTITION-INDEPENDENT invariants: every document
    lands in exactly one bin (n_docs), token mass is conserved
    (total_tokens), oversize docs are flagged not dropped (n_oversize),
    and no regular bin exceeds the 512-token budget (overfull_bins = 0,
    the bin-capacity contract).  Bin IDS are partition-dependent by
    design (shard-local packing is the 100 TB formulation), so the audit
    hashes the invariants, not the assignment; fill efficiency and
    per-bin structure are asserted in tests/test_extension_ops.py."""
    from excelstream_spark.operators.packing import pack_sequences

    max_tokens = 512
    # NULL-text docs have no defined token length and cannot be packed:
    # exclude them HERE (mirrored by the oracle's WHERE text IS NOT
    # NULL) — the operator's own loud null guard stays armed for
    # genuine upstream bugs
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            TXT.token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    packed = pack_sequences(d, max_tokens=max_tokens)
    stats = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("oversize").cast("long")).alias("n_oversize"),
    )
    overfull = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > max_tokens)
        .agg(F.count(F.lit(1)).alias("overfull_bins"))
    )
    return stats.crossJoin(F.broadcast(overfull))


@query(
    "corpus_sampling_exact",
    oracle="""
        SELECT lang, CAST(least(100, count(*)) AS BIGINT) AS n_sampled
        FROM documents GROUP BY lang
    """,
    tags=("sampling",),
)
def corpus_sampling_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-count sampling (per-stratum top-n by seeded
    xxhash64 rank — deterministic on any cluster size, unlike Spark's
    probabilistic sampleBy): the eval-set composition operator.  The
    selected IDS are a pure function of (data, seed) but hash-dependent,
    so the ORACLE checks the exact-count contract per stratum:
    min(n, |stratum|) rows, never more, never fewer; determinism of the
    chosen ids is asserted in tests/test_extension_ops.py."""
    from excelstream_spark.operators.sampling import stratified_sample_exact

    sampled = stratified_sample_exact(_docs(spark, sf_dir), "lang", 100)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


# --------------------------------------------------------------------------
# Corpus curation (operators/curation.py)
# --------------------------------------------------------------------------

@query(
    "corpus_curation",
    oracle=f"""
        WITH RECURSIVE jp AS (
          {_SQL_JACCARD_PAIRS.strip()}
        ),
        p AS (SELECT doc_a, doc_b FROM jp WHERE jaccard >= 0.5),
        nodes AS (SELECT doc_a AS n FROM p UNION SELECT doc_b FROM p),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION SELECT doc_b, doc_a FROM p),
        cc(node, lbl) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, cc.lbl FROM cc JOIN edges e ON e.u = cc.node
          WHERE cc.lbl < e.v
        ),
        comp AS (SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node),
        withsplit AS (
          SELECT doc_id, source, n_chars,
                 CASE WHEN b < 9000 THEN 'train'
                      WHEN b < 9500 THEN 'val'
                      ELSE 'test' END AS split
          FROM (
            SELECT d.doc_id, d.source, d.n_chars,
                   CAST(concat('0x', substr(md5(
                     concat('5:', CAST(coalesce(c.component, d.doc_id) AS VARCHAR))
                   ), 1, 8)) AS BIGINT) % 10000 AS b
            FROM documents d LEFT JOIN comp c USING (doc_id)
          )
        ),
        capped AS (
          SELECT doc_id, source, n_chars, split FROM (
            SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id) AS rn
            FROM withsplit
          ) WHERE rn <= 15
        ),
        budgeted AS (
          SELECT doc_id, source, split, n_chars,
                 sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
          FROM capped
        )
        SELECT doc_id, source, split, CAST(n_chars AS BIGINT) AS n_chars
        FROM budgeted
        WHERE cum <= (SELECT CAST(floor(sum(n_chars) / 3.0) AS BIGINT) FROM capped)
    """,
    tags=("curation", "graph", "window"),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain (operators/curation.py), hash-checked
    end-to-end in one entry:

    1. **cluster-aware splits** — near-dup CLUSTERS (connected components
       of the exact 3-gram-Jaccard >= 0.5 pair graph) are the unit of
       train/val/test assignment, so a paraphrase of a test document can
       never land in train.  Split = md5-bucket of the component
       representative (engine-portable: the oracle recomputes the same
       md5 arithmetic over the same recursive-CTE closure).
    2. **per-domain cap** — top-15 docs per source by (n_chars DESC,
       doc_id): one window shuffle on the domain key.
    3. **token-budget head** — the (n_chars DESC, doc_id)-ordered prefix
       whose running n_chars total fits a budget of one third of the
       capped corpus (scale-relative so the stage bites at every SF).
       The Spark side is the two-phase partition-parallel prefix sum
       (range partition -> per-partition totals -> offset broadcast),
       NEVER a single-partition global window; the oracle is the
       single-window SQL it must equal.
    """
    from excelstream_spark.operators import curation as CU

    docs = _docs(spark, sf_dir)
    pairs = DD.dedup_ngram_jaccard(docs, threshold=0.5)
    split = CU.cluster_aware_splits(docs, pairs, seed=5)
    capped = CU.cap_per_domain(
        split, domain_col="source", max_docs=15,
        order_col="n_chars", descending=True,
    )
    budget = int(
        capped.agg(F.floor(F.sum("n_chars") / 3.0).cast("long")).collect()[0][0]
    )
    head = CU.token_budget_head(
        capped, budget=budget, token_col="n_chars",
        order_col="n_chars", descending=True,
    )
    return head.select("doc_id", "source", "split", F.col("n_chars").cast("long").alias("n_chars"))


# --------------------------------------------------------------------------
# Round-7 driver rows: the round-6 operator families (winnowing, CDC
# substring dedup, the complete repetition gate), promoted from
# pytest-only oracles into the correctness window (round-6 verdict #1).
# The SQL comes from plans/oracles.py — the SAME builders the pytest
# suite imports, so the driver row and the test can never drift.
# --------------------------------------------------------------------------

from excelstream_spark.operators import fingerprint as FPo  # noqa: E402
from excelstream_spark.operators import quality as QLo  # noqa: E402


@query(
    "dedup_token_chunks_cdc",
    oracle=ORC.cdc_dedup_oracle(16, 2, 4),
    tags=("dedup", "substring"),
)
def dedup_token_chunks_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET-INVARIANT substring dedup (operators/dedup.
    dedup_token_chunks_cdc): content-defined chunk boundaries (md5-
    derived, hard-capped at 8x the 16-token mean — round-7), chunks in
    >= 2 docs survive only in the min-id holder, touched docs rebuilt
    normalized from surviving chunks, untouched docs byte-identical.
    The recommended substring-dedup form (Lee et al. 2022's ExactSubstr
    approximated at a fraction of the suffix-array cost)."""
    return DD.dedup_token_chunks_cdc(
        _docs(spark, sf_dir).select("doc_id", "text"),
        avg_tokens=16, min_df=2,
    )


@query(
    "dedup_winnowing",
    oracle=ORC.winnow_pairs_oracle(5, 4, 0.5, 1000),
    tags=("dedup", "fingerprint"),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint near-dup pairs (operators/fingerprint —
    Schleimer et al. 2003, the MOSS sketch): k=5-gram hashes, w=4
    windows, rightmost-min selection; pairs by exact fingerprint match
    with the hot-fp cut, overlap = shared / min(|A|, |B|) >= 0.5.
    Zero-shuffle Arrow extraction + the inverted-index pair shape."""
    return FPo.dedup_winnowing_pairs(
        _docs(spark, sf_dir).select("doc_id", "text"),
        k=5, w=4, threshold=0.5, max_fp_df=1000,
    )


@query(
    "full_repetition_gate",
    oracle=ORC.repetition_gate_oracle(),
    tags=("text", "quality", "repetition"),
)
def full_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE published Gopher repetition rule set as one audit
    row per document: the 4 line/paragraph metrics (codegen'd sorted-run
    aggregates), the 9 n-gram metrics (Arrow-batched mapInPandas), and
    the composed keep flag — equivalent to full_repetition_filter's
    keep/drop decision but with every metric under the driver's hash
    gate.  Bounds single-sourced from functions/text.py rule tables on
    both sides."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    flagged = QLo.ngram_repetition_flags(QLo.repetition_flags(docs))
    metric_names = [n for n, _ in TXT.REPETITION_RULES] + [
        n for n, _ in TXT.NGRAM_REPETITION_RULES
    ]
    keep = F.col("repetition_pass") & F.col("ngram_repetition_pass")
    return flagged.select("doc_id", *metric_names, keep.alias("keep"))


@query(
    "training_corpus_pipeline_v2",
    oracle=ORC.training_pipeline_v2_oracle(),
    tags=("pipeline", "dedup", "text", "quality"),
)
def training_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5/6 operator chain composed end-to-end in ONE lazy
    plan (round-6 verdict #7 — unit oracles prove operators, this row
    proves their COMPOSITION):

    1. Gopher quality subset (the rules that discriminate on the
       synthetic fixture — every rule except the stop-word count, which
       the fixture's vocabulary makes vacuous): one codegen'd predicate
       in the scan stage;
    2. the COMPLETE 13-rule repetition gate (4 line/paragraph rules
       codegen'd, then the 9 n-gram rules Arrow-batched over the
       survivors only);
    3. PII redaction (chained codegen'd regexp_replace);
    4. CDC substring dedup (offset-invariant content-defined chunks,
       min-id keeper, touched-only rebuild — the rewritten text feeds
       the next stage, so passage-level copies are gone before
       document-level pairing);
    5. minhash-LSH >= 0.8 near-dup pairs over the REWRITTEN text,
       connected components, one min-id representative per cluster.

    Output: (doc_id, lang, n_tokens, fp) of the surviving corpus — the
    final fingerprints hash-gate every stage's rewrite.  The oracle
    replays all five stages in SQL (brute-force jaccard stands in for
    LSH; recursive CTE for components).  100 TB shape: stages 1-3 are
    scan-stage; stage 4 shuffles text once by (doc, chunk); stage 5
    shuffles fixed-width shingle hashes and ids only."""
    return _v2_core(_docs(spark, sf_dir).select("doc_id", "lang", "text"))


def _v2_core(docs: DataFrame) -> DataFrame:
    """training_corpus_pipeline_v2's stage chain over an arbitrary
    (doc_id, lang, text) frame — shared by the catalog row and the
    bench scale-ladder rung (r11 verdict #4: the two most expensive
    composed legs had prose 100 TB stories but no measured drift), so
    the rung times the IDENTICAL composition, not a copy that can
    drift."""
    from excelstream_spark.operators.components import (
        dedup_keep_representatives,
    )

    from excelstream_spark.operators.dedup import _scoped_persist

    subset = tuple(
        r for r in TXT.GOPHER_RULES if r[0] != "n_gopher_stopwords"
    )
    gated = QLo.full_repetition_filter(
        QLo.gopher_quality_filter(docs, rules=subset)
    )
    red = gated.withColumn("text", TXT.redact_pii(F.col("text")))
    # persist the rewritten corpus: it feeds BOTH the LSH pair stage and
    # the keep-set join below — unpersisted those are two independent
    # physical subtrees, each re-running the gates (incl. the Arrow
    # n-gram pass), the PII regexes and the CDC rewrite end-to-end
    # (measured: the leg halves).  Scoped like every dedup persist —
    # released at the next catalog query / bench-leg boundary.
    from excelstream_spark.operators.dedup import _scoped_materialize

    # r13 optimization: the rewritten corpus is EAGERLY materialized
    # (was a lazy persist).  It feeds the LSH pair stage — whose banded
    # self-join builds several concurrent subtrees over it — and the
    # keep-set join; as a persist the first action raced those builds
    # (gates + PII + CDC re-ran per build thread) and nested one more
    # InMemoryRelation under the composed plan.  Interleaved A/B at
    # sf0.1: 12.51 -> 10.42s min, every run lower.  (The same swap was
    # A/B-tested on v4 — persist kept, 13.34 vs 14.46: its classifier
    # training loop materializes the feature table anyway, so the eager
    # checkpoint only adds a barrier — and on v5 — persist kept, within
    # noise at 8.56 vs 8.40 and the payload table is the class the
    # checkpoint helper's contract says to keep off executor-local
    # storage.)  r14 (r13 verdict #5): the rewritten corpus is
    # document TEXT — payload-scale at production SF — so the
    # materialization is SIZE-GUARDED: the lineage-truncating
    # localCheckpoint below the configured bound (keeps the r13
    # 60->6-Exchange win at bench scale, where the corpus is ~MBs),
    # a recoverable DISK_ONLY persist + explicit materialization
    # above it (a lost executor recomputes instead of failing the
    # job; see _scoped_materialize's contract).
    rewritten = _scoped_materialize(
        DD.dedup_token_chunks_cdc(red, avg_tokens=16, min_df=2)
    )
    pairs = DD.dedup_minhash_lsh(rewritten, threshold=0.8)
    kept = dedup_keep_representatives(
        rewritten, pairs, id_col="doc_id", id_a="doc_a", id_b="doc_b"
    )
    return kept.select(
        "doc_id",
        "lang",
        TXT.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TXT.fingerprint(F.col("text")).alias("fp"),
    )


@query(
    "corpus_decontaminate",
    oracle=ORC.decontamination_oracle(n=13, bench_mod=17),
    tags=("text", "quality", "decontamination"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (Brown et al. 2020 appendix C — the
    13-gram overlap rule): training documents sharing any 13-token gram
    with the eval set are flagged; here a deterministic split of the
    documents table (doc_id % 17 == 0) plays the benchmark and the rest
    is scored.  Registered past the driver window (DEMOTED — the 50
    slots are spoken for) but fully DuckDB-oracled and swept by
    pytest's whole-catalog oracle test every round.

    100 TB shape: the benchmark's distinct gram hashes broadcast
    (an eval suite is ~1e6-1e7 grams); the training corpus never
    shuffles — gram explode + 60-bit md5 hash in the scan stage, one
    broadcast join, one partially-aggregated groupBy(doc) count."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return QLo.contamination_flags(corpus, bench, n=13).select(
        "doc_id", "n_contaminated_grams", "contaminated"
    )


@query(
    "dsir_select_resample",
    oracle=ORC.dsir_select_oracle(k=100),
    tags=("text", "selection", "sampling"),
)
def dsir_select_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR targeted data selection (Xie et al. 2023): hashed
    unigram+bigram bucket models fit on the English subset (the target
    distribution) vs the whole pool, per-doc log importance weights,
    and Gumbel-top-k resampling of 100 documents without replacement.
    All hashes md5-derived, so the weights, the Gumbel draws AND the
    selected set replay bit-stably in DuckDB.  Registered past the
    driver window (DEMOTED) but fully oracled and swept by pytest's
    whole-catalog test.

    100 TB shape: target model = 10k rows (broadcast); raw model =
    map-side-combined word count; weights = one broadcast join on the
    exploded grams + one groupBy(doc); selection =
    TakeOrderedAndProject.  See operators/selection.py."""
    from excelstream_spark.operators.selection import dsir_select

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    target = docs.filter(F.col("lang") == "en")
    return dsir_select(docs, target, k=100)


@query(
    "bpe_train_merges",
    # r8 (r7 verdict #1): the iterative loop IS SQL-replayable — the 12
    # merge rounds unroll as per-merge CTE chains (pair recount ->
    # arg-max with the shared tie-break -> gaps-and-islands greedy
    # fold), exactly the quality_classifier unrolled-GD precedent.
    # This was the catalog's lone rows-only entry.
    oracle=ORC.bpe_train_oracle(num_merges=12),
    tags=("text", "tokenizer", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): 12
    merges learned from the documents corpus' word-frequency table.
    Each merge round is one vocabulary-sized shuffle + a ONE-ROW
    collect; see operators/tokenizer.py for the 100 TB shape,
    tests/test_tokenizer.py for the reference-equality proof, and
    plans/oracles.bpe_train_oracle for the unrolled-CTE DuckDB
    replay that hash-gates the full merge sequence."""
    from excelstream_spark.operators.tokenizer import bpe_train

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    merges = bpe_train(docs, num_merges=12)
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string, pair_count bigint"
    )


@query(
    "quality_classifier_filter",
    oracle=ORC.quality_classifier_oracle(),
    tags=("text", "quality", "classifier", "training"),
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-gram logistic-regression quality filter (the CCNet /
    GPT-3 recipe: distill an expensive quality signal into a cheap
    linear scorer, then keep a score-ranked data budget).  Trains
    full-batch GD — 4 steps, lr 8, 1024 md5-hashed unigram+bigram
    buckets, unit-norm presence features — against the Gopher
    length-rule label (the one quality rule the synthetic fixture
    varies on; production would label with a curated source or the
    full composed gate), scores every document, and keeps the
    top-half by score (ties at the threshold all kept).  Measured on
    the fixture: AUC 0.993 vs the label at 4 steps.

    The ENTIRE run — feature hashing, every GD step, the trained
    weights, the scores, the ranked cut — replays bit-stably in
    DuckDB: md5 bucket hashes, exact DECIMAL(38,15) cross-row sums
    (order-independent), and 9-decimal quantization of the sigmoid
    and weights at each step boundary so a last-ulp libm ``exp``
    difference cannot compound.  The oracle is the unrolled-CTE form
    of the same fixed-step algorithm.

    100 TB shape (operators/classifier.py): the doc→feature table is
    built ONCE (one (id,b) shuffle + the id-keyed window), persisted,
    and SHARED between the training loop and the scoring pass (late
    r7 — previously scoring re-ran the tokenize/shingle/bucket build;
    the feature table is the reusable artifact, exactly like the
    stored vocab / postings / fingerprint tables); each GD step is a
    broadcast weight join + a partitioning-aligned margin/error pass +
    ONE bounded groupBy(bucket) shuffle (≤1024 rows per task after
    map-side combine) + a kilobyte gradient collect.  Scoring is
    broadcast + one groupBy(id).  The reference engine has no
    model-training surface at all — this extends the LLM-pipeline
    family alongside DSIR (its generative counterpart)."""
    from excelstream_spark.operators.classifier import (
        hashed_doc_features,
        select_top_quality,
        train_quality_classifier,
    )
    from excelstream_spark.operators.dedup import _scoped_persist

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    labeled = docs.withColumn(
        "y",
        F.size(TXT.tokens(F.coalesce(F.col("text"), F.lit(""))))
        .between(50, 100_000)
        .cast("int"),
    )
    feat = _scoped_persist(hashed_doc_features(docs, n_buckets=1024))
    model = train_quality_classifier(
        labeled, "y", n_buckets=1024, steps=4, lr=8.0, features=feat
    )
    return select_top_quality(docs, model, keep_frac=0.5, features=feat)


@query(
    "lm_perplexity_buckets",
    oracle=ORC.lm_ppl_oracle(),
    tags=("text", "quality", "lm", "perplexity"),
)
def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020): fit a bigram
    stupid-backoff LM (Brants et al. 2007) on a clean reference slice
    (here the deterministic doc_id%2=0 half — production fits on
    Wikipedia), score EVERY document's mean per-token -log10 score,
    and split the pool into head/middle/tail perplexity terciles — the
    published quality signal behind the CCNet/LLaMA/RedPajama recipes.
    Unseen tokens back off to the 0.5-smoothed unigram x0.4; the
    cross-corpus fit means the backoff path is genuinely exercised
    (self-fit models never miss).

    Bit-stable replay (operators/lm.py docstring): integer count
    models, identically-associated IEEE divisions, per-token round-9,
    exact decimal per-doc sums, ranked-value tercile thresholds.

    100 TB shape: two map-side-combined word-counts + one fit-time
    join build the model artifact; scoring is exploded token legs hash-
    joined to the model (AQE broadcasts small models) + one
    groupBy(doc); the tercile cut is TakeOrderedAndProject at this
    scale, approxQuantile at production scale (documented in the
    operator)."""
    from excelstream_spark.operators.lm import (
        fit_bigram_lm,
        ppl_tercile_buckets,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    lm = fit_bigram_lm(ref)
    return ppl_tercile_buckets(docs, lm)


#: Fixed retrieval workload for the BM25 driver row: three queries over
#: the synthetic documents vocabulary (must stay in lockstep with the
#: oracle — both sides embed the same literals).
BM25_QUERIES = {
    "q1": "spark hash join",
    "q2": "window agg",
    "q3": "vector scan stream",
}


@query(
    "bm25_search_topk",
    oracle=ORC.bm25_oracle(BM25_QUERIES, k=10),
    tags=("text", "retrieval", "bm25", "topk"),
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical top-k retrieval: BM25 (Lucene scoring form, k1=1.2,
    b=0.75) of three fixed queries against the documents table, top 10
    per query — the decontamination-by-retrieval / eval-ablation
    primitive, and the inverted-index workload as DataFrame ops.

    Bit-stable replay (operators/retrieval.py docstring): integer
    tf/df/dl/N, identically-associated IEEE arithmetic, round-9 at
    every libm site, exact decimal per-(query,doc) sums, rank
    tie-broken on (rounded score DESC, doc_id ASC).

    100 TB shape: the exploded token stream inner-joins the BROADCAST
    query-term set before any shuffle, so only query-term postings move;
    df/idf derive from those pruned postings (no second corpus pass);
    the close is one groupBy(query, doc) + a per-query window that
    ships k rows per query."""
    from excelstream_spark.operators.retrieval import bm25_topk

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return bm25_topk(docs, BM25_QUERIES, k=10)


@query(
    "multimodal_resize_sample",
    oracle="""
        WITH d AS (SELECT doc_id, doc_id % 4 AS m,
                          2 + 2 * (doc_id % 2) AS w,
                          4 + doc_id % 5 AS n
                   FROM documents WHERE doc_id IS NOT NULL)
        SELECT doc_id,
               CASE WHEN m = 0 THEN 'png' WHEN m = 1 THEN 'wav'
                    WHEN m = 2 THEN 'jpeg' ELSE 'other' END AS kind,
               CAST(CASE WHEN m IN (0, 2) THEN 2 END AS INT) AS out_w,
               CAST(CASE WHEN m IN (0, 2) THEN 2 END AS INT) AS out_h,
               CAST(CASE WHEN m IN (0, 2) THEN 1
                         WHEN m = 1 THEN (n + 1) // 2 END AS INT)
                   AS out_frames,
               CASE WHEN m = 0 THEN round((
                        (doc_id * 31) % 256
                      + (doc_id * 31 + (w // 2) * 7) % 256
                      + (doc_id * 31 + w * 7) % 256
                      + (doc_id * 31 + (w + w // 2) * 7) % 256) / 4.0, 3)
                    WHEN m = 1 THEN round(CAST(doc_id % 32 AS DOUBLE)
                                          / 32, 6)
                    WHEN m = 2 THEN round(CAST(doc_id % 256 AS DOUBLE), 3)
               END AS out_mean_r
        FROM d
    """,
    tags=("multimodal", "transform"),
)
def multimodal_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media transforms, hash-checked end-to-end: synthesize
    genuine PNG/JPEG/WAV payloads (doc_id-arithmetic content), then
    transform_media RESIZES images to 2x2 nearest-neighbor PNG
    thumbnails (JPEG rows are entropy-decoded and TRANSCODED — the
    classic thumbnail path) and FRAME-SAMPLES audio to every 2nd frame
    re-encoded as WAV.  Every reported statistic is computed by
    RE-DECODING the produced payload, so the hash gate proves the
    output bytes are valid media with exactly the predicted content:
    the floor-convention nearest-neighbor index map and the even-frame
    decimation are pure integer arithmetic the oracle replays from
    doc_id alone.

    100 TB shape: one Arrow-batched mapInPandas, zero shuffle, media
    bytes never leave the executor; swap the stdlib codecs for
    PIL/ffmpeg calls and the schema/partitioning/batching carry over
    unchanged (the codecs here make the semantics testable in this
    container)."""
    from excelstream_spark.operators.media_transform import transform_media

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    mm = MM.synthesize_payloads(docs)
    out = transform_media(mm, target_w=2, target_h=2, frame_step=2)
    return out.drop("out_payload")


@query(
    "multimodal_fingerprints",
    oracle=ORC.multimodal_fingerprints_oracle(),
    tags=("multimodal", "dedup", "image", "audio"),
)
def multimodal_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media fingerprints, hash-checked end-to-end
    (operators/image_hash — NEW family r8: the media twin of text
    near-dup): synthesize genuine PNG/JPEG/WAV payloads, REALLY decode
    them (PNG chunk walk + unfilter; baseline JPEG entropy decode;
    RIFF/PCM walk), and compute each payload's 64-bit perceptual
    fingerprints — images get aHash (channel-sum gray, floor-NN 8x8,
    integer-exact ``cell*64 > total``) and dHash (floor-NN 9x8,
    left-vs-right gradient bits); audio gets the sign-of-delta
    fingerprint over a floor-NN 65-point resample.  The payload
    content is doc_id arithmetic, so the oracle recomputes the
    FINGERPRINTS THEMSELVES in SQL and the gate proves decode + hash
    bit-for-bit across three modalities.  The banded-Hamming pair
    stage (dedup_image_ahash — the dedup_simhash shape, any fp column)
    is proven in pytest on crafted near-duplicate images
    (tests/test_image_hash.py).

    100 TB shape: hashing is zero-shuffle Arrow scan work; pairs
    shuffle only (id, band, 16-bit key) rows."""
    from excelstream_spark.operators.image_hash import (
        multimodal_fingerprints as fp_op,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    return fp_op(MM.synthesize_payloads(docs))


@query(
    "video_dedup_containment",
    oracle=ORC.video_containment_oracle(),
    tags=("multimodal", "video", "dedup"),
)
def video_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level video near-dup (operators/video.py — the r10 family's
    hard-signal row, promoted late-r10 per the PQ precedent): synthesize
    REAL APNG clips (8x8 grayscale frames of pure doc_id arithmetic,
    ``n_frames = 2 + doc_id % 3``), decode them with the repo's own PNG
    codec (acTL/fcTL/fdAT chunk walk — every frame an ordinary
    zlib+filtered image), hash each frame to the image family's
    integer-exact 64-bit aHash/dHash, then close video pairs by
    FRAME-SET CONTAINMENT: distinct per-video fingerprint sets,
    ``|A ∩ B| / min(|A|, |B|) >= 0.8`` — the published frame-sampling
    video-dedup rule (a re-encode shares ~every frame hash; a clip
    embedded in a longer compilation scores ~1 on its own side).  The
    operator runs its production skew bounds (degenerate popcount-0/64
    quarantine + the ``max_fp_df`` hot-frame document-frequency cap,
    both BEFORE set sizes so containment stays a ratio over one space)
    and the oracle replays decode, both hashes, both prunes, the
    inverted-index intersection and the ratio filter arithmetically in
    SQL — the gate proves the whole chain bit-for-bit.

    100 TB shape: decode + hashing is zero-shuffle Arrow scan work; the
    containment join moves one row per (video, distinct-frame-hash),
    every bucket bounded by the DF cap."""
    from excelstream_spark.operators.video import (
        dedup_video_containment as vc_op,
    )
    from excelstream_spark.operators.video import (
        synthesize_video_payloads,
        video_frame_fingerprints,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    return vc_op(
        video_frame_fingerprints(synthesize_video_payloads(docs)),
        threshold=0.8,
    )


@query(
    "video_increment_containment",
    oracle=ORC.video_increment_oracle(),
    tags=("multimodal", "video", "dedup", "serving"),
)
def video_increment_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video family's SERVING path under the driver hash gate (r10
    verdict #5): incoming clips scored against a STORED corpus without
    touching corpus payloads.  Even-doc_id clips play the corpus —
    their pruned fingerprint sets (degenerate quarantine + the
    corpus-DF hot-frame cap) and build-time sizes are exactly what
    ``save_video_fp_artifact`` materializes fp-bucketed; odd-doc_id
    clips are the increment, which decodes+hashes only itself,
    quarantines degenerates but applies NO df cap of its own (an
    increment is too small to estimate document frequency — the
    production contract: serve-time decisions use corpus statistics
    computed at build time).  The oracle replays the asymmetric
    semantics in SQL: corpus-side prunes, increment-side quarantine
    only, cross pairs, |new ∩ corpus| / min ratio.

    100 TB shape: with the artifact bucketed on fp only the
    increment's (vid, fp) rows shuffle; sizes join on the pair output,
    not the corpus (plan-pinned in tests/test_video.py)."""
    from excelstream_spark.operators.dedup import _scoped_persist
    from excelstream_spark.operators.video import (
        synthesize_video_payloads,
        video_fp_sets,
        video_fp_sizes,
        video_frame_fingerprints,
    )
    from excelstream_spark.operators.video import (
        video_increment_containment as vic_op,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    corpus_fps = video_frame_fingerprints(
        synthesize_video_payloads(docs.where(F.col("doc_id") % 2 == 0))
    )
    new_fps = video_frame_fingerprints(
        synthesize_video_payloads(docs.where(F.col("doc_id") % 2 == 1))
    )
    # the corpus sets feed BOTH the fp join and the build-time sizes —
    # scope-persist so the corpus decode+hash scan runs once
    sets = _scoped_persist(video_fp_sets(corpus_fps))
    return vic_op(new_fps, sets, video_fp_sizes(sets), threshold=0.8)


@query(
    "audio_dedup_containment",
    oracle=ORC.audio_containment_oracle(),
    tags=("multimodal", "audio", "dedup"),
)
def audio_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO family's hard-signal row (r11 verdict #1 — the
    PQ/video/Count-Min same-or-next-round precedent): synthesize REAL
    int16 mono WAVs (samples are pure doc_id arithmetic mod the prime
    AUDIO_FIXTURE_MOD=251, ``2 + doc_id % 3`` fixed windows of 65
    samples — docs d and d+251 share every window offset but differ in
    window count, planting genuine subset-containment pairs), decode
    them with the repo's own stdlib WAV reader, fingerprint each window
    with the engine-exact sign-of-delta hash (identity resample at 65
    samples, so the oracle recomputes every bit), then close pairs with
    the VIDEO family's containment operator running UNCHANGED over the
    ``(doc_id, frame_idx, fp_a)`` contract — the modality-generic
    design proven at the hash level: the oracle's close is the SAME
    shared ``_fp_containment_close_sql`` CTE text the video row emits
    (one definition, the _cm_cell_sql convention), on top of the
    audio window-fingerprint replay.

    100 TB shape (operators/audio.py): decode + windowing + hashing is
    zero-shuffle Arrow scan work; the containment join moves one row
    per (track, distinct window hash), degenerate windows (digital
    silence, pure ramps) quarantined and hot fingerprints DF-capped
    BEFORE set sizes — production sizing uses larger windows (~93 ms
    at 44.1 kHz), the fingerprint's internal resample keeping hash
    width independent of window length."""
    from excelstream_spark.operators.audio import (
        audio_window_fingerprints,
        synthesize_audio_payloads,
    )
    from excelstream_spark.operators.video import (
        dedup_video_containment as vc_op,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    return vc_op(
        audio_window_fingerprints(synthesize_audio_payloads(docs)),
        threshold=0.8,
    )


@query(
    "langid_ngram_rank",
    oracle=ORC.langid_oracle(),
    tags=("text", "langid", "classifier"),
)
def langid_ngram_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification (r11 verdict #2 — the last published
    pretraining-pipeline stage class with zero implementation; until
    now every plan that needed language took the fixture's ``lang``
    column as given).  The Cavnar-Trenkle (1994) rank-profile
    classifier, INTEGER-EXACT so it hash-gates: train per-language
    character-n-gram rank profiles (count DESC, 60-bit md5 gram-hash
    tie-break, top 300) on the even-doc_id labeled slice, classify the
    odd docs by the out-of-place distance — sum over the document's
    top-k grams of |doc_rank - profile_rank|, absent grams charged
    top_k — arg-min language, ties to the smallest code.  The oracle
    replays gram extraction, hashing, both rank windows, the penalty
    arithmetic and the arg-min bit-for-bit (plans/oracles.
    langid_oracle); docs with no grams are absent on both engines.

    100 TB shape (operators/langid.py): gram explode + md5 is scan
    work; one doc-keyed count + rank window; the model is a broadcast
    n_langs x top_k table; the corpus text never shuffles."""
    from excelstream_spark.operators.langid import (
        language_id,
        train_language_profiles,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    profiles = train_language_profiles(
        docs.where(F.col("doc_id") % 2 == 0)
    )
    return language_id(docs.where(F.col("doc_id") % 2 != 0), profiles)


@query(
    "dedup_increment_bloom",
    oracle=ORC.bloom_gate_oracle(1 << 17, 7),
    tags=("dedup", "incremental", "bloom", "sketch"),
)
def dedup_increment_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter incremental exact-dedup gate (operators/bloom.py):
    even doc_ids are the standing corpus, odd ones plus re-delivered
    corpus texts the increment; the corpus fingerprint set compresses
    into a (word, bits) Bloom artifact (2^17 bits, 7 salted-md5
    hashes), the increment probes it MAP-SIDE, and the maybe set alone
    is verified against the true fingerprints.  Output: per increment
    document the probe flag and the verified keep decision — so the
    hash gate pins the filter's exact bit pattern (a single divergent
    bit flips some maybe_dup flag) AND the lossless composition
    (kept == the plain anti-join's decision, false positives
    notwithstanding).

    100 TB shape (module docstring): the filter is ~1-2 bytes/key and
    broadcasts where the 16-byte/key fingerprint table cannot; the
    probe is n_hashes consecutive broadcast joins (zero exchanges,
    plan-asserted in tests/test_bloom.py); verification streams the
    bucketed fingerprint artifact against the broadcast maybe set."""
    from excelstream_spark.operators import bloom as BL
    from excelstream_spark.operators import incremental as INC
    from excelstream_spark.operators.dedup import _scoped_persist

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    redeliv = (
        docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 20))
        .withColumn("doc_id", F.col("doc_id") + 100_000)
    ).select(*docs.columns)
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(redeliv)

    fps = _scoped_persist(INC.corpus_fingerprints(corpus))
    flagged = BL.bloom_flag_increment(new, BL.bloom_build(fps))
    present = fps.join(
        F.broadcast(flagged.where(F.col("maybe_dup")).select("fp")),
        "fp",
        "left_semi",
    ).withColumn("_hit", F.lit(True))
    return flagged.join(F.broadcast(present), "fp", "left").select(
        F.col("doc_id"),
        F.col("maybe_dup"),
        (~F.col("maybe_dup") | F.col("_hit").isNull()).alias("kept"),
    )


@query(
    "c4_line_filter",
    oracle=ORC.c4_oracle(aug=True),
    tags=("text", "quality", "c4"),
)
def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 line-level cleaning rules (Raffel et al. 2020 §2.2 —
    operators/quality.c4_quality_flags): per-line terminal-punctuation
    + >= 5-word + policy-phrase ("javascript", "privacy policy", ...)
    filter, the retained text newline-rejoined (hash-gated string-for-
    string), terminal-mark sentence count, lorem-ipsum / curly-brace
    page triggers, and the composed page decision.  Completes the
    published cleaning-rule families alongside Gopher (quality) and
    the repetition gate.  The fixture documents are single-line
    unpunctuated token soup (every rule would fire identically), so
    the entry grafts the deterministic line structure of
    oracles.C4_AUG_LINES_SQL — the same expr_ on both engines — making
    every rule discriminate (the corpus_governance aug precedent).

    100 TB shape: every metric is a JVM array/regexp expression — zero
    shuffle, zero Python; the whole operator runs inside the scan
    stage and composes in front of the dedup shuffles exactly like the
    Gopher gate."""
    from excelstream_spark.operators import quality as QL

    out = QL.c4_quality_flags(
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(ORC.C4_AUG_LINES_SQL).alias("text"))
    )
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        "c4_text",
        F.col("n_sentences").cast("long").alias("n_sentences"),
        "has_lorem_ipsum",
        "has_curly_brace",
        "c4_pass",
    )


@query(
    "embedding_kmeans_clusters",
    oracle=ORC.kmeans_oracle(k=8, n_iter=2),
    tags=("similarity", "clustering", "curation"),
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact k-means over the embeddings table
    (operators/clustering.kmeans_assign_exact): md5-seeded init, two
    Lloyd iterations with exact DECIMAL(38,15) distances and round-9
    decimal-mean updates, final assignment hash-gated per vector —
    the clustering family's first hard-signal row (ml.KMeans
    centroids are engine-internal and can only take rows-only
    checks).  Document clustering is the topic-bucketing / cluster-
    balanced-sampling curation primitive; SemDeDup's cells are the
    same structure.

    100 TB shape (module docstring): broadcast k*d centroid table,
    map-side-combined assignment aggregation, k*d-row updates; swap
    the exact explode for the numpy-matmul assignment at scale and
    keep the decimal mean update."""
    from excelstream_spark.operators.clustering import kmeans_assign_exact
    from excelstream_spark.tables import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    return kmeans_assign_exact(emb, k=8, n_iter=2)


def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded-export audit manifest (operators/curation.
    shard_manifest): md5-deterministic shard assignment, per-shard doc
    and token counts, and an order-independent bit_xor content hash —
    the artifact a pipeline diffs against a re-export to name exactly
    which shard changed.  One map-side-combined groupBy(shard); the
    md5/tokenize work is scan-stage.

    Folded out of the catalog in r11 (rule 4 strongest form — the
    manifest aggregation is INLINED verbatim inside the in-window
    training_corpus_pipeline_v4 composed oracle and v5 carries its own
    manifest gate, so the shape loses no in-window coverage; funding
    the video_increment_containment promotion).  Still hash-gated in
    pytest: tests/test_catalog_oracle.py::
    test_folded_corpus_shard_manifest_oracle."""
    from excelstream_spark.operators.curation import shard_manifest

    return shard_manifest(
        _docs(spark, sf_dir).select("doc_id", "text"), n_shards=16
    )


@query(
    "cardinality_kmv_tokens",
    oracle=ORC.kmv_tokens_oracle(k=256, group_col="lang"),
    tags=("sketch", "cardinality", "text"),
)
def cardinality_kmv_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-token cardinality via the KMV sketch
    (operators/sketches.py — Bar-Yossef et al. 2002): 60-bit md5 token
    hashes, the k=256 smallest per group, (k-1)*H/h_k estimator with
    the exact-below-k short-circuit.  Unlike HyperLogLog the whole
    sketch is engine-portable, so the ESTIMATE sits under the hash
    gate — the cardinality-planning primitive (vocab sizing, Bloom
    bits/key, LSH band tables) made verifiable."""
    from excelstream_spark.operators.sketches import (
        kmv_distinct_tokens_by_group,
    )

    return kmv_distinct_tokens_by_group(
        _docs(spark, sf_dir).select("lang", "text"), group_col="lang", k=256
    )


@query(
    "frequent_tokens",
    oracle="""
        WITH t AS (SELECT unnest(list_filter(
                     regexp_split_to_array(lower(coalesce(text, '')),
                                           '\\s+'), x -> x <> '')) AS tok
                   FROM documents),
        n AS (SELECT count(*) AS c FROM t)
        SELECT tok, count(*)::BIGINT AS cnt FROM t GROUP BY tok
        HAVING count(*) * 1000 > (SELECT c FROM n) * 1
    """,
    tags=("sketch", "heavy-hitters", "text"),
)
def frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic heavy hitters (operators/sketches.
    frequent_tokens_mg — Misra & Gries 1982 + exact recount): every
    token above 1/1000 of all token occurrences, computed the 100 TB
    way — bounded-memory per-partition MG sketches propose a candidate
    SUPERSET (guaranteed for capacity >= den/num regardless of
    partitioning), one broadcast-pruned exact recount closes.  The
    output is therefore EXACT and hash-gates against the plain SQL
    replay even though each partition's sketch is order-dependent —
    the hot-key discovery primitive that sizes ``max_shingle_df`` /
    salting thresholds without a full-vocabulary exchange (r8 verdict
    #4: the family's hard-signal row)."""
    from excelstream_spark.operators.sketches import frequent_tokens_mg

    return frequent_tokens_mg(
        _docs(spark, sf_dir).select("text"), support=(1, 1000)
    )


@query(
    "cm_frequency_estimates",
    oracle=ORC.cm_estimate_oracle(),
    tags=("sketch", "frequency", "text"),
)
def cm_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min family's hard-signal row (r10 verdict #2, the
    PQ/video rotation precedent): build the 4x1024 counter table over
    ALL corpus tokens (operators/sketches.cm_sketch_tokens — every
    counter an exact integer sum over md5-derived cells, so the sketch
    is deterministic and engine-portable), then point-estimate every
    DISTINCT corpus token from the BROADCAST sketch: min over the
    depth counters, absent cells coalescing to 0 so the classic
    one-sided ``est >= true`` guarantee survives the left join.  The
    oracle replays cell hashes, exact counts and the min-estimate
    arithmetic bit-for-bit — the whole frequency-sketch pipeline under
    the hash gate, not just its output shape.

    100 TB shape: the build's map-side partial aggregation bounds the
    exchange at depth*width rows per task regardless of token volume;
    estimates move only the kilobyte sketch (broadcast), never the
    corpus."""
    from excelstream_spark.functions import text as TXT
    from excelstream_spark.operators.sketches import (
        cm_estimate,
        cm_sketch_tokens,
    )

    docs = _docs(spark, sf_dir)
    sk = cm_sketch_tokens(docs)
    queries = docs.select(
        F.explode(
            TXT.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).alias("q")
    )
    return cm_estimate(sk, queries, query_col="q")


@query(
    "corpus_epoch_order",
    oracle=ORC.epoch_order_oracle(epoch=0, n_shards=16),
    tags=("curation", "training", "order"),
)
def corpus_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch ordering (operators/curation.epoch_order):
    md5 draw keyed on (seed, epoch, id) -> per-shard rank — the
    data-loader contract (fixed seed => bit-reproducible batch order)
    expressed corpus-side and hash-gated per document.  One rank
    window keyed on the shard; draw and shard assignment ride the
    scan."""
    from excelstream_spark.operators.curation import epoch_order

    return epoch_order(
        _docs(spark, sf_dir).select("doc_id"), epoch=0, n_shards=16
    ).select("doc_id", "shard", "position")


@query(
    "text_nfc_normalize",
    oracle=ORC.nfc_oracle(),
    tags=("text", "unicode", "normalize"),
)
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (functions/text.nfc_normalize_df):
    composed/decomposed sequences ('é' vs 'e'+U+0301) are different
    md5s for identical text, so un-normalized corpora under-dedup —
    normalize FIRST, then fingerprint.  Spark side is one Arrow-batched
    mapInPandas over unicodedata (Spark has no built-in normalizer);
    DuckDB's utf8proc nfc_normalize replays it and the hash gate pins
    the two implementations to each other, character lengths included.
    The fixture is pure ASCII (NFC = identity), so the entry appends a
    deterministic decomposed suffix that NFC actually composes."""
    from excelstream_spark.functions.text import nfc_normalize_df

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull()).select(
        "doc_id", F.expr(ORC.NFC_AUG_SQL).alias("t")
    )
    out = nfc_normalize_df(docs, text_col="t", out_col="text_nfc")
    return out.select(
        "doc_id",
        F.length("t").cast("long").alias("len_before"),
        F.length("text_nfc").cast("long").alias("len_after"),
        "text_nfc",
    )


@query(
    "cleaning_pipeline_v3",
    oracle=ORC.cleaning_pipeline_oracle(),
    tags=("pipeline", "text", "quality", "c4", "pii"),
)
def cleaning_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7-close cleaning operators composed end-to-end in one
    lazy plan (the training_corpus_pipeline_v2 principle applied to the
    new stages — unit oracles prove operators, this row proves their
    COMPOSITION):

    1. Unicode NFC normalization (Arrow mapInPandas; the aug's
       decomposed e+U+0301 composes — proving the stage ran);
    2. the C4 line/page rules over the normalized text (line filter +
       page gates; failing pages drop out of the result);
    3. PII redaction of the retained text (the aug's injected email
       becomes <EMAIL>).

    Output per surviving page: kept-line count, email count, and the
    fingerprint of the final redacted text — the hash gates every
    stage's rewrite byte-for-byte.  100 TB: stages 2-3 are scan-stage
    JVM expressions; stage 1 is the one Arrow pass; zero shuffles in
    the whole chain."""
    from excelstream_spark.operators import quality as QL

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", F.expr(ORC.CLEANING_V3_AUG_SQL).alias("text"))
    )
    ndf = TXT.nfc_normalize_df(docs, "text", "text_nfc").select(
        "doc_id", F.col("text_nfc").alias("text")
    )
    kept = QL.c4_quality_flags(ndf).where(F.col("c4_pass"))
    return kept.select(
        "doc_id",
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        F.regexp_count(
            F.col("c4_text"), F.lit(TXT.PII_EMAIL_PATTERN)
        ).cast("long").alias("n_emails"),
        TXT.fingerprint(TXT.redact_pii(F.col("c4_text"))).alias("fp"),
    )


@query(
    "training_corpus_pipeline_v4",
    oracle=ORC.training_pipeline_v4_oracle(),
    tags=("pipeline", "cleaning", "classifier", "dedup", "curation"),
)
def training_corpus_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL composed pretraining data build in one flow — every
    stage class a production corpus run executes, end-to-end, with the
    final shard manifest's order-independent content hash gating every
    upstream rewrite byte-for-byte:

    1. aug + EXACT-TWIN injection (each augmented document gets a
       verbatim copy at doc_id + 1_000_000 — the dedup stage's hard
       signal: a broken dedup doubles every shard's n_docs);
    2. Unicode NFC normalization (one Arrow pass);
    3. C4 line/page rules (failing pages drop);
    4. PII redaction of the retained text;
    5. hashed-feature logistic-regression quality classifier — 4
       full-batch GD steps TRAINED ON THE CLEANED TEXT (label: token
       count >= 80, the cleaned corpus' median — a real ~50/50 split),
       ranked keep-half cut (ties kept; twins tie by construction);
    6. exact dedup, min-id per normalized-text md5 — provably drops
       every surviving twin;
    7. sharded-export manifest (md5 shard assignment, token counts,
       bit_xor content hash).

    The DuckDB oracle composes the same stages from their unit
    builders (c4_oracle nested as the cleaned source, the unrolled-GD
    classifier chain, the manifest aggregation) — one SQL statement
    replaying stages 1-7 (plans/oracles.training_pipeline_v4_oracle).

    100 TB shape: stages 2-4 are scan work in front of everything
    (zero shuffles); stage 5 is the classifier's bounded-shuffle
    training loop + one broadcast-join scoring pass over the persisted
    feature table; stage 6 is one keyed window; stage 7 one map-side
    groupBy(shard).  The cleaned corpus is scope-persisted: it feeds
    training, scoring, dedup and the manifest."""
    return _v4_core(_docs(spark, sf_dir).where(F.col("doc_id").isNotNull()))


def _v4_core(docs: DataFrame) -> DataFrame:
    """training_corpus_pipeline_v4's stage chain over an arbitrary
    (doc_id, text, ...) frame — shared by the catalog row and the
    bench scale-ladder rung (see :func:`_v2_core`)."""
    from excelstream_spark.operators import quality as QL
    from excelstream_spark.operators.classifier import (
        hashed_doc_features,
        select_top_quality,
        train_quality_classifier,
    )
    from excelstream_spark.operators.curation import shard_manifest
    from excelstream_spark.operators.dedup import _scoped_persist
    from pyspark.sql import Window as W

    aug = docs.select(
        "doc_id", F.expr(ORC.CLEANING_V3_AUG_SQL).alias("text")
    )
    twins = aug.select(
        (F.col("doc_id") + F.lit(ORC.V4_TWIN_OFFSET)).alias("doc_id"),
        "text",
    )
    inp = aug.unionByName(twins)
    ndf = TXT.nfc_normalize_df(inp, "text", "text_nfc").select(
        "doc_id", F.col("text_nfc").alias("text")
    )
    # r13 optimization note: swapping these two persists for eager
    # localCheckpoints was A/B-tested and REJECTED (13.34s persist vs
    # 14.46s ckpt min, interleaved) — the classifier training loop's
    # per-step collects materialize the feature table on first touch
    # anyway, so the eager checkpoint only adds an up-front barrier.
    cleaned = _scoped_persist(
        QL.c4_quality_flags(ndf)
        .where(F.col("c4_pass"))
        .select("doc_id", TXT.redact_pii(F.col("c4_text")).alias("text"))
    )
    labeled = cleaned.withColumn(
        "y",
        F.size(TXT.tokens(F.coalesce(F.col("text"), F.lit(""))))
        .between(80, 100_000)
        .cast("int"),
    )
    feat = _scoped_persist(hashed_doc_features(cleaned, n_buckets=1024))
    model = train_quality_classifier(
        labeled, "y", n_buckets=1024, steps=4, lr=8.0, features=feat
    )
    kept_ids = select_top_quality(
        cleaned, model, keep_frac=0.5, features=feat
    ).where(F.col("keep")).select("doc_id")
    kept = cleaned.join(kept_ids, "doc_id")
    fpd = kept.withColumn("fp", TXT.fingerprint(F.col("text")))
    surv = (
        fpd.withColumn(
            "_keeper", F.min("doc_id").over(W.partitionBy("fp"))
        )
        .where(F.col("doc_id") == F.col("_keeper"))
        .select("doc_id", "text")
    )
    return shard_manifest(surv, n_shards=8, seed=0)


@query(
    "training_corpus_pipeline_v5",
    oracle=ORC.training_pipeline_v5_oracle(),
    tags=("pipeline", "multimodal", "dedup", "image", "curation"),
)
def training_corpus_pipeline_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MULTIMODAL pretraining build (r9 verdict #2/#3 — v4 is
    text-only; this is the media sidecar, and the hard signal for BOTH
    the perceptual pair stage's composition and ``dedup_keep_best``):

    1. image-TWIN injection: every PNG document gets a copy at
       doc_id + 2,000,000 carrying the ORIGINAL payload verbatim (the
       v4 text-twin precedent) — a broken media dedup doubles shard
       counts;
    2. perceptual fingerprints over the real decoded payloads
       (operators/image_hash.multimodal_fingerprints — aHash + dHash);
    3. the FULL ``dedup_image_ahash`` pair semantics: degenerate
       quarantine with the in-band exact-equal star closure
       (``degenerate_exact_pairs=True``, r9 advice #2), 4x16-bit
       banded blocking with exact Hamming <= 3 verify and the dHash
       dual-hash budget (<= 10).  Recall is exactly 1 at this budget
       (pigeonhole), so the ORACLE replays the plain all-pairs filter;
       no fixture bucket approaches the 10k cap (the audit operator
       names any that would at corpus scale);
    4. connected components + ``dedup_keep_best``: per near-dup
       cluster the BEST-scoring member survives (score = n_chars;
       twins carry n_chars + doc_id%5 - 2, so they win some clusters
       and lose others — a min-id rule provably diverges, which is
       what makes the keep-best closure falsifiable);
    5. the sharded-export manifest gates every upstream decision
       byte-for-byte (order-independent bit_xor content hash).

    The fixture's 2x2 ramp thumbnails mostly COLLIDE on one aHash
    value (a real-corpus phenomenon — tiny placeholder images are
    indistinguishable at 8x8), so the keep-best stage decides one
    survivor out of a ~230-member cluster: maximally load-bearing for
    the hash gate, and exactly the behavior the cap+audit pair bounds
    at 100 TB.

    100 TB shape: synthesis/decode/hash are zero-shuffle Arrow scan
    work; pairs shuffle only (id, band, key16) rows with the bucket
    cap bounding any hot key; components is the O(log n)-round
    large/small-star loop; keep-best is one join + one
    component-keyed window + a map-side anti-join; the manifest is one
    map-side groupBy(shard)."""
    from excelstream_spark.operators import image_hash as IH
    from excelstream_spark.operators.components import dedup_keep_best
    from excelstream_spark.operators.curation import shard_manifest
    from excelstream_spark.operators.dedup import (
        _scoped_materialize,
        _scoped_persist,
    )

    off = F.lit(ORC.V5_TWIN_OFFSET)
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    png = docs.where(F.col("doc_id") % 4 == 0)
    twins = png.select(
        (F.col("doc_id") + off).alias("doc_id"),
        F.concat(
            F.coalesce(F.col("text"), F.lit("")), F.lit(" rev2")
        ).alias("text"),
        (F.col("n_chars") + F.col("doc_id") % 5 - 2).alias("q"),
    )
    corpus = docs.select(
        "doc_id", "text", F.col("n_chars").alias("q")
    ).unionByName(twins)
    # r13 optimization note: an eager localCheckpoint here was
    # A/B-tested and kept NEUTRAL (8.56 persist vs 8.40 ckpt min,
    # inside the ambient band) — and the payload table is exactly the
    # payload-scale class the checkpoint helper's contract keeps off
    # executor-local storage, so the persist stays.
    pay = _scoped_persist(
        MM.synthesize_payloads(png).select("doc_id", "payload")
    )
    pay_all = pay.unionByName(
        pay.select((F.col("doc_id") + off).alias("doc_id"), "payload")
    )
    # r14 (r13 verdict #4): the fingerprint table is metadata-scale
    # (doc_id + two 64-bit hashes) and feeds FOUR subtrees of the
    # banded pair stage (band sides a/b, dual-hash verify, degenerate
    # quarantine) — the r13 fan_out left it lazy, and the stage
    # profile shows those subtrees as CONCURRENT broadcast-exchange
    # builds that race the unmaterialized cache and re-run the
    # synth+decode+hash chain 3-4x per evaluation (~17s executor time
    # each at sf0.1).  Eager size-guarded materialization runs the
    # Python chain exactly once; the payload persist above stays (the
    # decode reads it once while materializing).
    fps = _scoped_materialize(IH.multimodal_fingerprints(pay_all))
    pairs = IH.dedup_image_ahash(
        fps,
        hash_col="fp_a",
        verify_col="fp_b",
        max_hamming=3,
        verify_max_hamming=10,
        degenerate_exact_pairs=True,
    )
    kept = dedup_keep_best(corpus, pairs, "q", id_a="doc_a", id_b="doc_b")
    return shard_manifest(kept.select("doc_id", "text"), n_shards=8, seed=0)


@query(
    "training_corpus_pipeline_v6",
    oracle=ORC.training_pipeline_v6_oracle(),
    tags=("pipeline", "multimodal", "dedup", "video", "audio", "curation"),
)
def training_corpus_pipeline_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CROSS-MODAL pretraining build (r11 verdict #5 — v5 composed
    IMAGES; this composes the r11 modalities, and it is the hard
    signal that makes the ORDER-AWARE machinery load-bearing under a
    driver hash gate instead of pytest-only):

    1. video clips for doc_id%4==1 docs (REAL APNG decode via the
       repo's own codec), audio tracks for doc_id%4==2 docs (REAL WAV
       windows) — both emitting the modality-generic
       ``(doc_id, frame_idx, n_frames, fp_a)`` contract;
    2. TWIN injection at the frame level (the v4/v5 twin precedent one
       level up the contract): a DUP twin (same frames, same order —
       must collapse) and a REORDER twin (same frame SET, sequence
       REVERSED — must SURVIVE; a set-only dedup would drop it and
       move shard counts, which is exactly what this gate falsifies);
    3. per modality, the FULL order-aware composition
       (``dedup_video_containment_verified``: set-containment
       candidates + sequence-shingle verify, running UNCHANGED over
       video frames and audio windows) — only ``seq_verified`` pairs
       become dedup edges;
    4. connected components + ``dedup_keep_best`` (score DESC NULLS
       LAST, ties ascending id; dup twins carry ``n_chars + doc_id%5
       - 2``, so they win some clusters and lose others — the v5
       falsifiability argument);
    5. the sharded-export manifest gates every upstream decision
       byte-for-byte — including every order decision.

    The oracle composes the per-modality
    ``video_sequence_verified_oracle`` VERBATIM (shared CTE text, the
    _cm_cell_sql convention) under the v5 closure/manifest chain.

    100 TB shape: decode+hash is zero-shuffle Arrow scan work shared
    through one scoped persist per modality (base frames feed the
    original + both twin derivations AND both stages of the verified
    close); the containment join moves one row per (id, distinct fp),
    the shingle verify is semi-restricted to candidate ids; components
    is the O(log n) star loop; keep-best one keyed window; manifest
    one map-side groupBy(shard).  Modalities dedup independently (no
    cross-modal fp space) and their pair outputs just union."""
    return _v6_core(_docs(spark, sf_dir).where(F.col("doc_id").isNotNull()))


def _v6_core(
    docs: DataFrame, synth_video=None, synth_audio=None
) -> DataFrame:
    """training_corpus_pipeline_v6's stage chain over an arbitrary
    (doc_id, text, n_chars) frame — shared by the catalog row and the
    bench scale-ladder rung (r12 verdict #1: the most expensive leg's
    100 TB story was plan-audit prose, not measured drift), the
    _v2_core/_v4_core convention so the rung times the IDENTICAL
    composition.  ``synth_video``/``synth_audio`` default to the
    oracle fixtures; the drift rung swaps in the md5-DIVERSE
    synthesizers (the video_containment_diverse rationale: the oracle
    fixtures' mod-256 content space saturates past ~10^3 media docs,
    and an inflated rung over them would time quadratic pair
    materialization, not the pipeline)."""
    from excelstream_spark.operators.audio import (
        audio_window_fingerprints,
        synthesize_audio_payloads,
    )
    from excelstream_spark.operators.components import dedup_keep_best
    from excelstream_spark.operators.curation import shard_manifest
    from excelstream_spark.operators.dedup import _scoped_persist
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
        synthesize_video_payloads,
        video_frame_fingerprints,
    )

    synth_video = synth_video or synthesize_video_payloads
    synth_audio = synth_audio or synthesize_audio_payloads
    dup_off = F.lit(ORC.V6_DUP_OFFSET)
    reo_off = F.lit(ORC.V6_REORDER_OFFSET)
    vdocs = docs.where(F.col("doc_id") % 4 == 1)
    adocs = docs.where(F.col("doc_id") % 4 == 2)

    def with_twins(frame_fps: DataFrame) -> DataFrame:
        from excelstream_spark.operators.dedup import (
            _scoped_local_checkpoint,
        )

        # r13 optimization: eager localCheckpoint, not persist.  The
        # decoded base feeds SIX subtrees (original + both twins, each
        # through both stages of the verified close) inside the round's
        # largest composed plan; as a lazy persist it was (a) raced by
        # concurrent broadcast-exchange builds (decode chain observed
        # executing 2-3x per action) and (b) a nested InMemoryRelation
        # whose canonicalization made driver planning quadratic.
        # Interleaved A/B at sf0.1: steady ~29s -> ~20s, cold 110 -> 38s.
        base = _scoped_local_checkpoint(
            frame_fps.select("doc_id", "frame_idx", "n_frames", "fp_a")
        )
        dup = base.select(
            (F.col("doc_id") + dup_off).alias("doc_id"),
            "frame_idx", "n_frames", "fp_a",
        )
        reo = base.select(
            (F.col("doc_id") + reo_off).alias("doc_id"),
            (F.col("n_frames") - 1 - F.col("frame_idx")).alias(
                "frame_idx"
            ),
            "n_frames", "fp_a",
        )
        return base.unionByName(dup).unionByName(reo)

    def _modality_edges(fingerprints, synth) -> DataFrame:
        frames = with_twins(fingerprints(synth))
        return (
            dedup_video_containment_verified(
                # eager_frames: under THIS composed plan the frame
                # table's lazy persist was raced by concurrent subtree
                # builds (r13 A/B: checkpoint wins 16.9/20.4 vs
                # 21.5/24.5); standalone callers keep the lazy persist
                # (r14, r13 verdict #1 — see the operator's note)
                frames, threshold=0.8, seq_threshold=0.8, n=2,
                eager_frames=True,
            )
            .where(F.col("seq_verified"))
            .select(
                F.col("vid_a").alias("doc_a"),
                F.col("vid_b").alias("doc_b"),
            )
        )

    # NOTE (r13): overlapping the two modality chains' construction in
    # a 2-thread pool (guide §2.6) was tried and REGRESSED (interleaved
    # A/B: seq mins 17.8/19.7s vs par 82/102s) — the eager checkpoint
    # jobs contend for the same local cores and the doubled Python
    # daemon population thrashes; sequential construction stays.
    edges = _modality_edges(
        video_frame_fingerprints, synth_video(vdocs)
    ).unionByName(
        _modality_edges(audio_window_fingerprints, synth_audio(adocs))
    )
    media = vdocs.unionByName(adocs)
    corpus = (
        media.select("doc_id", "text", F.col("n_chars").alias("q"))
        .unionByName(
            media.select(
                (F.col("doc_id") + dup_off).alias("doc_id"),
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")), F.lit(" dup6")
                ).alias("text"),
                (F.col("n_chars") + F.col("doc_id") % 5 - 2).alias("q"),
            )
        )
        .unionByName(
            media.select(
                (F.col("doc_id") + reo_off).alias("doc_id"),
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")), F.lit(" re6")
                ).alias("text"),
                (F.col("n_chars") - 1).alias("q"),
            )
        )
    )
    kept = dedup_keep_best(corpus, edges, "q", id_a="doc_a", id_b="doc_b")
    return shard_manifest(kept.select("doc_id", "text"), n_shards=8, seed=0)


@query(
    "dedup_paired_crossmodal",
    oracle=ORC.paired_crossmodal_oracle(),
    tags=("dedup", "multimodal", "paired", "image", "text"),
)
def dedup_paired_crossmodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal PAIRED dedup (r12 verdict #4 — v6 dedups modalities
    independently; real multimodal training data is (image, caption)
    PAIRS whose dedup decision must consider both sides, the
    LAION-style rule): every document becomes a pair whose image is
    the REAL PNG of its image key (``doc_id % 50`` — encode -> stdlib
    decode -> aHash, computed once per key and broadcast back) and
    whose caption is its text; every ``doc_id % 10 == 0`` document
    spawns the three QUADRANT TWINS (oracles.PAIRED_* offsets):

    * DUP   — same image key, same caption: the only quadrant that may
      collapse (``is_dup`` true);
    * RECAP — same image key, unrelated 2-token caption: an IMAGE-ONLY
      dedup would wrongly flag it (``same_image`` true, ``cap_match``
      false — must survive);
    * REIMG — shifted image key, same caption: a CAPTION-ONLY dedup
      would wrongly flag it (``cap_match`` true, ``same_image``
      false/fp-dependent — must survive).

    Output: the integer-exact decision matrix — (doc_a, doc_b,
    same_image, cap_inter, cap_union, cap_match, is_dup) over every
    candidate pair from EITHER side's blocking — replayed bit-for-bit
    by plans/oracles.paired_crossmodal_oracle (image side through the
    established png_fp_ctes arithmetic, caption side through the
    shared inverted-index shingle body).

    100 TB shape (operators/paired.py): one equality join on a 64-bit
    fingerprint (hot-image quarantine via ``max_image_df``), the
    shingle inverted index with its ``max_shingle_df`` bound, and
    per-pair count joins — no pixels or caption text move past their
    scan stages."""
    from excelstream_spark.operators.paired import paired_crossmodal_matrix

    n_classes, twin_mod = 50, 10
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    cap = F.coalesce(F.col("text"), F.lit(""))

    def frame(ids, keys, caption):
        return docs.where(F.col("doc_id") % twin_mod == 0).select(
            ids.alias("doc_id"), keys.alias("img_k"), caption.alias("caption")
        )

    base = docs.select(
        F.col("doc_id"),
        (F.col("doc_id") % n_classes).alias("img_k"),
        cap.alias("caption"),
    )
    pairs = (
        base
        .unionByName(frame(
            F.col("doc_id") + F.lit(ORC.PAIRED_DUP_OFFSET),
            F.col("doc_id") % n_classes, cap,
        ))
        .unionByName(frame(
            F.col("doc_id") + F.lit(ORC.PAIRED_RECAP_OFFSET),
            F.col("doc_id") % n_classes,
            F.concat(F.lit("recap "), F.col("doc_id").cast("string")),
        ))
        .unionByName(frame(
            F.col("doc_id") + F.lit(ORC.PAIRED_REIMG_OFFSET),
            (F.col("doc_id") + 1) % n_classes, cap,
        ))
    )
    return paired_crossmodal_matrix(pairs)


@query(
    "dedup_url_canonical",
    oracle=ORC.url_dedup_oracle(),
    tags=("dedup", "provenance", "url"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance (URL) exact dedup (r12 verdict #5 — the cheapest,
    highest-yield dedup stage a web-corpus build runs FIRST: C4 dedups
    pages by URL before any content work).  Each document carries the
    deterministic fixture URL (oracles.url_fixture_sql: page key
    ``doc_id % 100``, five crawl-noise variants by ``doc_id // 100 %
    5``); the canonicalizer (operators/provenance.canonicalize_url —
    fragment/scheme/www strip, host lowercase, trailing-slash strip,
    utm_* drop + query-param sort, all codegen'd JVM expressions)
    merges the re-crawl variants while the REAL-query variant
    (``?b=2&a=1`` -> ``?a=1&b=2``) stays its own group — an
    over-merging canonicalizer is falsified by the hash gate.  Output:
    per document the canonical string, its 60-bit md5 key, the min-id
    keeper, the group size and the keep decision.

    100 TB shape (operators/provenance.py): canonicalization is scan
    work; the close is one groupBy(canonical) with MAP-SIDE partial
    aggregation + a join back — deliberately not a window, so a hot
    boilerplate URL reduces map-side instead of serializing one window
    partition."""
    from excelstream_spark.operators.provenance import dedup_url_canonical as _op

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    pk = F.concat(
        ((F.col("doc_id") % 100) % 7).cast("string"),
        F.lit(".com/a/"),
        (F.col("doc_id") % 100).cast("string"),
    )
    v = F.expr("(doc_id DIV 100) % 5")
    url = (
        F.when(v == 0, F.concat(F.lit("https://example"), pk))
        .when(v == 1, F.concat(F.lit("http://www.example"), pk))
        .when(v == 2, F.concat(F.lit("https://EXAMPLE"), pk, F.lit("?utm_source=x")))
        .when(v == 3, F.concat(F.lit("https://example"), pk, F.lit("?b=2&a=1")))
        .otherwise(F.concat(F.lit("https://example"), pk, F.lit("/#frag")))
    )
    return _op(docs.select("doc_id", url.alias("url")))


@query(
    "html_extract_text",
    oracle=ORC.html_extract_oracle(),
    tags=("html", "cleaning", "text", "warc"),
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (functions/html.py) — the stage between
    WARC ingest and the C4 cleaning rules in a web-corpus build: every
    document is wrapped in the deterministic crawl-page fixture
    (oracles.HTML_FIXTURE_SQL — script/style/comment bodies labeled
    SCRIPTLEAK/STYLELEAK/COMMENTLEAK, an inline-tag mid-word join, the
    entity set incl. a double-escape, an UPPERCASE <SCRIPT>) and run
    through the extraction chain.  The oracle replays the IDENTICAL
    pattern strings in identical order through DuckDB's regex engine
    (functions/html.extract_text_sql), so the hash gate falsifies any
    Java-vs-RE2 divergence over the chain, not just gross leaks; the
    semantic falsifiers (a leaked script body, joined inline words,
    entity ordering) are pinned per-case in tests/test_html.py.

    100 TB shape: the whole chain is scan-stage whole-stage-codegen
    JVM work — zero shuffles, zero Python — applied in the same stage
    as the WARC payload decode it follows."""
    from excelstream_spark.functions.html import extract_text

    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    extracted = extract_text(F.expr(ORC.HTML_FIXTURE_SQL))
    return docs.select(
        "doc_id",
        extracted.alias("text"),
        F.length(extracted).cast("long").alias("n_chars"),
    )
