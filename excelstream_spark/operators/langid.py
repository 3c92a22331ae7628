"""Language identification: character-n-gram rank profiles — the
Cavnar & Trenkle (1994) "out-of-place" classifier, the published
method CCNet-class pretraining pipelines use for their language step
(Wenzek et al. 2020 runs a fasttext model of the same shape: score a
document against per-language character-n-gram statistics built
offline).  Until now every plan that needed language took the
fixture's ``lang`` column as given (r11 verdict "what's missing" #2);
this derives it.  (functions/text.lang_id is the complementary
zero-training marker-word heuristic used inside text_analysis; THIS
module is the trained-model path — profiles learned from a labeled
slice, any language set.)

The classifier is INTEGER-EXACT by construction, so it hash-gates in
DuckDB bit-for-bit — no floats anywhere:

* profile = the language's ``top_k`` character n-grams ranked by
  frequency (ties broken by the 60-bit md5 gram hash, the house
  convention — ``('0x' || substr(md5(g), 1, 15))::BIGINT`` replays
  identically in DuckDB);
* a document is ranked the same way, and its distance to a language
  is the sum over its top-k grams of ``|doc_rank - profile_rank|``,
  with grams absent from the profile charged the maximum out-of-place
  penalty ``top_k`` (the paper's measure);
* the call is the arg-min language, ties to the lexicographically
  smallest code.

Documents that yield NO n-grams (null or shorter-than-n text) are
absent from the output — a language call needs evidence, and both
engines express that as plain inner-group semantics.

100 TB shape: gram explode + md5 hash is scan work; the doc profile
is one groupBy(doc, gram) count with map-side partials plus one
row_number window partitioned by doc (the text families' standard
single doc-keyed shuffle); the per-language profiles are a broadcast
table (n_langs x top_k rows — kilobytes); scoring is
doc-profile x broadcast(langs) x broadcast(profiles) with the
summed distance partially aggregated, and the final arg-min is one
more doc-keyed window.  The corpus text never shuffles.

The reference engine (KSD-CO/excelstream) has no text-analysis
surface; this extends the LLM-pipeline family (SURVEY.md §2
extensions — the brief's text-analysis requirement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default n-gram sizes (the paper uses 1-5; bigrams+trigrams carry
#: nearly all of the signal and keep the explode 2 rows/char)
DEFAULT_NS: tuple[int, ...] = (2, 3)


def _gram_hash(gram: Column) -> Column:
    """60-bit md5 hash of a gram — the house ``_h60`` convention
    (collisions ~2^-60; both engines hash the same UTF-8 bytes, so a
    collision would merge the same two grams on both sides)."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def char_ngram_hashes(
    df: DataFrame,
    key_col: str,
    ns: tuple[int, ...] = DEFAULT_NS,
    text_col: str = "text",
) -> DataFrame:
    """(key_col, gram_h) — one row per character n-gram occurrence of
    the lowercased text, for every n in ``ns``; the gram itself leaves
    the plan immediately as its 60-bit hash (fixed-width shuffle
    rows).  Pure JVM expressions: transform(sequence(...)) over
    substring — no Python in the scan."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    base = df.select(F.col(key_col), t.alias("_t"))
    arrays = [
        F.expr(
            f"CASE WHEN length(_t) >= {int(n)} THEN "
            f"transform(sequence(1, length(_t) - {int(n)} + 1), "
            f"i -> substring(_t, i, {int(n)})) "
            "ELSE array() END"
        )
        for n in ns
    ]
    grams = base.select(
        key_col, F.explode(F.concat(*arrays)).alias("_g")
    )
    return grams.select(key_col, _gram_hash(F.col("_g")).alias("gram_h"))


def char_ngram_counts(
    df: DataFrame,
    key_col: str,
    ns: tuple[int, ...] = DEFAULT_NS,
    text_col: str = "text",
) -> DataFrame:
    """(key_col, gram_h, cnt) — per-key n-gram occurrence counts.

    Counting groups on the gram STRING and only the DISTINCT
    (key, gram) rows are md5-hashed AFTERWARDS (r14): the house
    ``_h60`` md5+conv is by far the most expensive per-row expression
    in this family, and hashing per OCCURRENCE paid it
    corpus-size times; hashing per distinct (key, gram) row pays it
    vocabulary-size times.  Identical output to hash-then-count up to
    md5-60-bit collisions between distinct grams (~2^-60 — and the
    DuckDB oracle replays the same hash of the same grams, so both
    engines would merge identically even then).  The groupBy shuffles
    the 2-3-char gram string instead of the 8-byte hash — the same
    fixed-width class.

    The input fans out to session parallelism first (the shingle_rows
    precedent): a small parquet input arrives as ONE split and the
    per-row-expensive gram explode+count would otherwise run
    single-threaded (measured: 4.5s on one task inside
    streaming_langid_gate's trainer at sf0.1); no-op at scale.  Batch
    inputs only — both callers train/classify batch tables."""
    from excelstream_spark.partitioning import fan_out

    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    base = fan_out(df).select(F.col(key_col), t.alias("_t"))
    arrays = [
        F.expr(
            f"CASE WHEN length(_t) >= {int(n)} THEN "
            f"transform(sequence(1, length(_t) - {int(n)} + 1), "
            f"i -> substring(_t, i, {int(n)})) "
            "ELSE array() END"
        )
        for n in ns
    ]
    counts = (
        base.select(key_col, F.explode(F.concat(*arrays)).alias("_g"))
        .groupBy(key_col, "_g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.select(
        key_col, _gram_hash(F.col("_g")).alias("gram_h"), "cnt"
    )


def _rank_top_k(
    counts: DataFrame, part_col: str, top_k: int, rank_col: str
) -> DataFrame:
    """row_number over (cnt DESC, gram_h ASC) per partition, kept to
    ``top_k`` — the deterministic rank shared by profiles and docs."""
    w = Window.partitionBy(part_col).orderBy(
        F.col("cnt").desc(), F.col("gram_h").asc()
    )
    return (
        counts.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= F.lit(int(top_k)))
        .drop("cnt")
    )


def train_language_profiles(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = 300,
) -> DataFrame:
    """(lang, gram_h, rank) — per-language rank profiles from a labeled
    slice: count every n-gram occurrence across the language's
    documents, rank by (count DESC, gram_h ASC), keep the top
    ``top_k``.  Rows with a NULL label are excluded (no language to
    credit).  The result is the broadcast model: n_langs x top_k rows.

    100 TB note: the rank window partitions by ``lang`` (few, large
    partitions) — safe because its input is the (lang, gram_h) COUNT
    table, whose size is bounded by the character-n-gram vocabulary
    (alphabet^n, ~1e4-1e6 rows/language), not by the corpus; the
    corpus-sized work (gram explode + count) is map-side partial
    aggregation ahead of it."""
    # hash-after-count (r14, see char_ngram_counts): the per-language
    # count table is vocabulary-bounded, so the md5 hash runs
    # n_langs x vocab times instead of once per corpus gram occurrence
    counts = char_ngram_counts(
        labeled.where(F.col(lang_col).isNotNull()).select(
            F.col(lang_col).alias("lang"), F.col(text_col).alias("text")
        ),
        key_col="lang",
        ns=ns,
        text_col="text",
    )
    return _rank_top_k(counts, "lang", top_k, "rank")


def collect_language_profiles(
    profiles: DataFrame,
) -> dict[str, dict[int, int]]:
    """Materialize trained profiles into the broadcast-the-model
    structure ``{lang: {gram_h: rank}}`` — the stored-artifact form
    :func:`langid_score_mapside` serves from (the ClassifierModel /
    PQ-codebook convention).  BOUNDED driver pull: n_langs x top_k
    rows (kilobytes) — the model, never the corpus."""
    out: dict[str, dict[int, int]] = {}
    for r in profiles.select("lang", "gram_h", "rank").collect():
        out.setdefault(r["lang"], {})[int(r["gram_h"])] = int(r["rank"])
    return out


def langid_score_mapside(
    docs: DataFrame,
    profiles: DataFrame | dict[str, dict[int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = 300,
) -> DataFrame:
    """Shuffle-FREE serving/streaming form of :func:`language_id`:
    appends ``lang_pred`` and ``distance`` to every row with ZERO
    exchanges — one Arrow-batched ``mapInPandas`` computes each
    document's top-k gram ranks and out-of-place distances against the
    collected profile dict (n_langs x top_k entries, kilobytes; the
    ``classifier_score_mapside`` broadcast-the-model shape applied to
    the rank-profile classifier).

    Stateless, so it scores batch AND STREAMING DataFrames identically
    — the production gate: profiles trained once in batch
    (:func:`train_language_profiles`, same ``ns``/``top_k``), applied
    per micro-batch with no state store; every redelivery of a
    document calls the same language at the same distance.

    INTEGER-EXACT parity with the batch path by construction — every
    step is integer or exact string arithmetic, so there is no float
    boundary to diverge on:

    * grams: the same code-point n-gram windows over
      ``lower(coalesce(text, ''))`` (Python slicing and Spark
      ``substring`` both index code points);
    * gram hash: ``int(md5(utf8(gram))[:15], 16)`` — bit-identical to
      ``conv(substring(md5(g), 1, 15), 16, 10)``;
    * doc rank: sort by (count DESC, gram_h ASC), keep ``top_k`` —
      the same total order as the batch ``row_number`` window;
    * distance: ``|drank - rank|`` summed, absent grams charged
      ``top_k``; arg-min language, ties to the smallest code.

    Documents with no grams are DROPPED (a language call needs
    evidence — the batch path's inner-group semantics)."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    model = (
        profiles
        if isinstance(profiles, dict)
        else collect_language_profiles(profiles)
    )
    langs = sorted(model)
    sizes = tuple(int(n) for n in ns)
    k = int(top_k)

    schema = StructType(
        list(docs.schema.fields)
        + [
            StructField("lang_pred", StringType(), False),
            StructField("distance", LongType(), False),
        ]
    )

    # gram -> 60-bit hash memo, shared across the worker's documents:
    # the gram VOCABULARY (alphabet^n) is far smaller than gram
    # occurrences (corpus-sized) for real text, so the md5 cost
    # amortizes to once per distinct gram per worker.  HARD-CAPPED at
    # 2^20 entries: a CJK-heavy or adversarial partition can have
    # near-distinct trigrams everywhere, and an unbounded dict would
    # grow with partition text volume — past the cap new grams hash
    # uncached (correctness unchanged, the memo is an optimization)
    _hmemo: dict[str, int] = {}
    _MEMO_CAP = 1 << 20

    def _gh(g: str) -> int:
        h = _hmemo.get(g)
        if h is None:
            h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            if len(_hmemo) < _MEMO_CAP:
                _hmemo[g] = h
        return h

    def _call(text) -> tuple[str, int] | None:
        # None/NaN-safe: parquet nulls surface as None in object
        # columns, but guard float NaN too (an all-null Arrow batch can
        # coerce; str(nan) would otherwise classify as the literal
        # "nan" — the synthesize_payloads convention)
        if text is None or isinstance(text, float):
            text = ""
        t = str(text).lower()
        counts: dict[int, int] = {}
        for n in sizes:
            for i in range(len(t) - n + 1):
                h = _gh(t[i : i + n])
                counts[h] = counts.get(h, 0) + 1
        if not counts:
            return None
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        best: tuple[int, str] | None = None
        for lang in langs:
            prof = model[lang]
            dist = 0
            for drank, (h, _cnt) in enumerate(ranked, start=1):
                rank = prof.get(h)
                dist += k if rank is None else abs(drank - rank)
            if best is None or (dist, lang) < best:
                best = (dist, lang)
        return best[1], best[0]

    def score(batches):
        for pdf in batches:
            calls = [_call(t) for t in pdf[text_col]]
            keep = [i for i, c in enumerate(calls) if c is not None]
            out = pdf.iloc[keep].copy()
            out["lang_pred"] = pd.Series(
                [calls[i][0] for i in keep], index=out.index, dtype="object"
            )
            out["distance"] = pd.Series(
                [calls[i][1] for i in keep], index=out.index, dtype="int64"
            )
            yield out

    return docs.mapInPandas(score, schema)


def language_id(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = DEFAULT_NS,
    top_k: int = 300,
) -> DataFrame:
    """(doc_id, lang_pred, distance) — classify each document against
    the trained ``profiles`` (:func:`train_language_profiles`, built
    with the SAME ``ns``/``top_k``; like the PQ codebook and the
    Count-Min depth/width, the model's geometry travels with the
    build, not the artifact).  Distance is the integer out-of-place
    sum over the document's top-k grams; grams missing from a
    language's profile are charged ``top_k``.  Arg-min language wins,
    ties to the smallest language code; documents with no grams are
    absent (see module docstring)."""
    # hash-after-count (r14, see char_ngram_counts): md5 runs once per
    # distinct (doc, gram) instead of once per gram occurrence
    dcounts = char_ngram_counts(docs, key_col=id_col, ns=ns, text_col=text_col)
    dprofile = _rank_top_k(dcounts, id_col, top_k, "drank")
    langs = profiles.select("lang").distinct()
    scored = (
        dprofile.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram_h"], "left")
        .withColumn(
            "_contrib",
            F.when(
                F.col("rank").isNotNull(),
                F.abs(F.col("drank") - F.col("rank")),
            ).otherwise(F.lit(int(top_k))),
        )
        .groupBy(id_col, "lang")
        .agg(F.sum("_contrib").cast("long").alias("distance"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("lang_pred"),
            F.col("distance"),
        )
    )
