"""Bloom-filter membership artifact for incremental exact dedup.

``incremental.corpus_fingerprints`` is the EXACT membership artifact:
16 bytes per distinct document.  At 10^11 documents that is a ~1.6 TB
table — cheap to store bucketed, but every increment still has to probe
it.  A Bloom filter (Bloom 1970, CACM) compresses membership to ~1-2
bytes per document at a tunable false-positive rate, which turns the
per-increment probe into a BROADCAST map-side check: zero shuffles, no
corpus-artifact scan for the (overwhelmingly common) definitely-new
documents.  Bloom filters have NO false negatives, so composing the
bloom prefilter with a verification probe of the true fingerprint
table reproduces :func:`incremental.dedup_increment_exact` EXACTLY —
proven by equality in tests/test_bloom.py.

Construction (engine-portable, the `selection._bucket` convention):

- key = md5(normalized text)  (``functions.text.fingerprint`` — the
  repo's cross-engine dedup key)
- position_i = ('0x'||substr(md5(i || ':' || fp), 1, 15))::bigint
  % n_bits, for i in 0..n_hashes-1  (15 hex chars = 60 bits, safely
  inside int64; independent positions via the salted re-hash)
- the bit array is a DataFrame ``(word, bits)``: word = position >> 5,
  bits = OR of (1 << position % 32).  32-bit words inside int64 keep
  every shift positive, so the same arithmetic replays in DuckDB
  (two's-complement << at bit 63 is engine-defined; bit 31 is not).

Every step is md5 + integer arithmetic + ``bit_or`` — all
order-independent and bit-identical across Spark, DuckDB and Python,
so the artifact itself is SQL-replayable (the catalog entry's oracle
rebuilds the filter in DuckDB and matches flag-for-flag).

Sizing (standard Bloom math): optimal n_hashes = ln2 * n_bits/n_keys;
false-positive rate ~= (1 - e^(-k*n/m))^k.  The defaults (n_bits 2^17,
n_hashes 7) give ~1e-4 at ~6k keys — the fixture regime.  At scale:
10 bits/key + k=7 gives ~1% FP; 14.4 bits/key + k=10 gives ~0.1%.

100 TB design:
- The filter is ``n_bits/32`` int64 rows — 1 GB of bits covers ~10^9
  keys at 1% FP and broadcasts comfortably; the build is one explode +
  one ``bit_or`` groupBy whose partial aggregation collapses map-side
  to <= n_words rows per task.
- :func:`bloom_flag_increment` never shuffles the increment: the
  ``n_hashes`` probes are ``n_hashes`` consecutive LEFT joins against
  the SAME broadcast word table, one whole-stage-codegen'd map stage
  (plan-asserted zero exchanges in tests/test_bloom.py).
- Verification touches the true fingerprint table ONLY for the maybes:
  the maybe-fp set (true dups + the FP fraction) broadcasts into a
  semi-join that streams the bucketed artifact map-side — with
  bucketed+sorted storage most file groups prune on min/max before
  they are read.
- Past ~10^10 keys a single broadcast filter stops fitting; shard the
  filter by fp prefix (a partitioned bloom: ``word`` becomes
  ``(shard, word)``) or fall back to the bucketed fingerprint table —
  the exact path this module composes with either way.

The reference engine (KSD-CO/excelstream) has no membership-sketch
surface; this extends the incremental family (`SURVEY.md` §6,
`operators/incremental.py`) with its compact-artifact form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT

#: Bits per word: 32-bit masks inside int64 keep every shift positive
#: (see module docstring).
WORD_BITS = 32

#: Defaults sized for the test fixtures (~1e-4 FP at ~6k keys).
DEFAULT_N_BITS = 1 << 17
DEFAULT_N_HASHES = 7

#: The OPT-IN sizing-metadata row (r9 advice #1: "carry
#: n_bits/n_hashes with the artifact") lives in the NEGATIVE word band
#: — bit positions are always >= 0, so ``shiftright(p, 5)`` is never
#: negative and the probe joins ignore it.  ``bits`` encodes the
#: sizing value v = ``n_bits * _META_SCALE + n_hashes``, and the row's
#: word is ``-(1 + v % 2^20)``: two filters built with DIFFERENT
#: sizings carry DIFFERENT meta words whenever their v differs mod
#: 2^20 (always true for unequal n_hashes, and for n_bits differing
#: below 2^10 word-multiples), so the documented incremental rebuild
#: (union + groupBy bit_or) leaves TWO meta rows instead of silently
#: OR-merging one — a bit_or of bitwise-SUBSET encodings under one
#: word would otherwise decode to the superset's valid sizing (r10
#: review finding: 5-hash and 7-hash builds merged to a "7" that
#: false-negatives on the 5-hash half's keys).  Decoders treat >1
#: negative-word row, or a word/value mismatch, as corruption.
_META_WORD_SPAN = 1 << 20
_META_SCALE = 1024


def _meta_word(n_bits: int, n_hashes: int) -> int:
    v = n_bits * _META_SCALE + n_hashes
    return -(1 + v % _META_WORD_SPAN)


def _decode_meta(rows) -> tuple[int, int] | None:
    """Decode the negative-word metadata rows collected from an
    artifact; None when absent, ValueError on conflict/corruption."""
    metas = [(int(r["word"]), int(r["bits"])) for r in rows]
    if not metas:
        return None
    if len(metas) > 1:
        raise ValueError(
            "bloom artifact carries conflicting sizing metadata "
            f"(words {sorted(w for w, _ in metas)}) — it was merged "
            "from filters built with different n_bits/n_hashes"
        )
    word, v = metas[0]
    n_bits, n_hashes = v // _META_SCALE, v % _META_SCALE
    if word != _meta_word(n_bits, n_hashes):
        raise ValueError(
            "bloom sizing metadata is corrupt (word/value mismatch) — "
            "the artifact was merged from filters built with "
            "different sizings"
        )
    return n_bits, n_hashes


def bloom_sizing(bloom: DataFrame) -> tuple[int, int] | None:
    """(n_bits, n_hashes) decoded from the artifact's metadata row
    (``bloom_build(..., with_meta=True)``), or None for a filter built
    without one.  One tiny aggregation job — call it once when loading
    a stored artifact, then pass the sizing explicitly to every probe.
    Raises on conflicting/corrupt metadata (an artifact merged from
    differently-sized builds)."""
    return _decode_meta(bloom.where(F.col("word") < 0).collect())


def _position(fp: Column, i: int, n_bits: int) -> Column:
    """The i-th bloom bit position of fingerprint ``fp`` — salted md5
    re-hash, 60-bit prefix, mod ``n_bits`` (DuckDB replay:
    ``('0x'||substr(md5(i||':'||fp),1,15))::bigint % n_bits``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), fp)), 1, 15), 16, 10
        ).cast("bigint")
        % F.lit(n_bits)
    )


def bloom_build(
    fps: DataFrame,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    fp_col: str = "fp",
    with_meta: bool = False,
) -> DataFrame:
    """(word, bits) — the Bloom filter of a fingerprint set (e.g.
    ``incremental.corpus_fingerprints``), at most ``n_bits/32`` rows.
    One explode + one map-side-combined ``bit_or`` groupBy; NULL
    fingerprints contribute nothing (they can never match a probe).
    Store alongside the fingerprint table and rebuild incrementally by
    OR-ing in each increment's own :func:`bloom_build` output
    (``union`` + the same groupBy — bit_or is associative).

    ``with_meta=True`` (r9 advice #1) appends one sizing-metadata row
    (negative word derived from the sizing — see ``_meta_word``) so
    the sizing TRAVELS WITH the stored artifact: :func:`bloom_probe`
    validates BOTH mismatch directions against it (a bare range scan
    can only prove built-larger-than-probed), and the associative
    incremental rebuild preserves it — equal sizings share one meta
    word (bit_or of equal rows is the row itself), while a merge of
    DIFFERENTLY-sized builds leaves two distinct meta words (or a
    word/value mismatch), which every decoder rejects loudly instead
    of silently probing wrong words.  Opt-in so every pre-r10
    artifact, oracle and plan stays byte-identical."""
    if n_bits % WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {WORD_BITS}")
    if not 0 < n_hashes < _META_SCALE:
        raise ValueError(f"n_hashes must be in 1..{_META_SCALE - 1}")
    fp = F.col(fp_col)
    positions = F.array(
        *[_position(fp, i, n_bits) for i in range(n_hashes)]
    )
    filt = (
        fps.where(fp.isNotNull())
        .select(F.explode(positions).alias("p"))
        .select(
            F.expr("shiftright(p, 5)").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(p % 32 as int))").alias(
                "m"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    if not with_meta:
        return filt
    meta = fps.sparkSession.createDataFrame(
        [(_meta_word(n_bits, n_hashes), n_bits * _META_SCALE + n_hashes)],
        "word bigint, bits bigint",
    )
    return filt.unionByName(meta)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    fp_col: str = "fp",
    n_bits: int | None = None,
    n_hashes: int | None = None,
    flag_col: str = "maybe_dup",
    validate: bool = True,
) -> DataFrame:
    """``df`` + ``flag_col`` — the raw broadcast map-side membership
    probe over an EXISTING fingerprint column (any type; the salted
    re-hash stringifies it).  True = MAY be present (member or false
    positive at the sizing rate); False = guaranteed absent.  NULL
    fingerprints probe nothing and flag False.  Factored out of
    :func:`bloom_flag_increment` (r9) so non-text keys — e.g. the
    64-bit perceptual media fingerprints of
    ``image_hash.media_dedup_gate_bloom`` — reuse the identical probe
    plan: ``n_hashes`` successive LEFT broadcast-joins of the same
    word table, zero exchanges, one codegen'd map stage.

    SIZING CONTRACT: ``n_bits``/``n_hashes`` MUST equal the values the
    filter was BUILT with — positions are taken mod n_bits, so a
    mismatch probes the wrong words/bits and silently voids the
    no-false-negative guarantee (r9 review finding).  ``validate=True``
    runs ONE aggregation over the filter (r9 advice #1 — previously
    one full scan per probe construction with only one direction
    detectable): an artifact carrying the :func:`bloom_build`
    ``with_meta`` sizing row is checked for EXACT n_bits/n_hashes
    equality (both directions; conflicting/corrupt metadata from a
    merge of differently-sized builds raises); a meta-less artifact
    falls back to the range check (a stored word at or beyond this
    probe's word range proves built-larger-than-probed; built-SMALLER
    stays undetectable without metadata).  With ``n_bits``/``n_hashes``
    OMITTED the probe ADOPTS the artifact's own metadata sizing from
    the same single aggregation (falling back to the module defaults
    for meta-less artifacts) — the sizing-travels-with-the-artifact
    path, one Spark job total.  ``validate=False`` skips the job
    entirely — for hot paths that construct many probe plans against
    an artifact whose sizing was already checked once (e.g. via
    :func:`bloom_sizing` at load time); explicit sizing (or the
    defaults) applies unchecked."""
    if validate:
        chk = bloom.agg(
            F.max(F.when(F.col("word") >= 0, F.col("word"))).alias("w"),
            F.collect_list(
                F.when(
                    F.col("word") < 0, F.struct("word", "bits")
                )
            ).alias("metas"),
        ).collect()[0]
        built = _decode_meta(chk["metas"])
        if built is not None:
            bb, bh = built
            if (n_bits is not None and n_bits != bb) or (
                n_hashes is not None and n_hashes != bh
            ):
                raise ValueError(
                    f"bloom_probe: artifact metadata says n_bits={bb}, "
                    f"n_hashes={bh} but the probe was given n_bits="
                    f"{n_bits}, n_hashes={n_hashes} — sizing must match "
                    "the build exactly"
                )
            n_bits, n_hashes = bb, bh
        if n_bits is None:
            n_bits = DEFAULT_N_BITS
        if n_hashes is None:
            n_hashes = DEFAULT_N_HASHES
        if built is None:
            n_words = (n_bits + WORD_BITS - 1) // WORD_BITS
            if chk["w"] is not None and chk["w"] >= n_words:
                raise ValueError(
                    f"bloom_probe: filter contains word {chk['w']} but "
                    f"n_bits={n_bits} spans only {n_words} words — the "
                    "filter was built with a different n_bits (sizing "
                    "must travel with the artifact: bloom_build "
                    "with_meta=True)"
                )
    if n_bits is None:
        n_bits = DEFAULT_N_BITS
    if n_hashes is None:
        n_hashes = DEFAULT_N_HASHES
    out = df.withColumn("_pfp", F.col(fp_col).cast("string"))
    hit_cols = []
    for i in range(n_hashes):
        bw = bloom.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = (
            out.withColumn(f"_p{i}", _position(F.col("_pfp"), i, n_bits))
            .join(
                F.broadcast(bw),
                F.expr(f"shiftright(_p{i}, 5)") == F.col(f"_w{i}"),
                "left",
            )
            .withColumn(
                f"_h{i}",
                F.coalesce(
                    F.expr(
                        f"(_b{i} & shiftleft(cast(1 as bigint), "
                        f"cast(_p{i} % 32 as int))) != 0"
                    ),
                    F.lit(False),
                ),
            )
        )
        hit_cols.append(f"_h{i}")
    maybe = F.lit(True)
    for h in hit_cols:
        maybe = maybe & F.col(h)
    drop = ["_pfp"] + [
        c for i in range(n_hashes) for c in (f"_p{i}", f"_w{i}", f"_b{i}", f"_h{i}")
    ]
    return out.withColumn(flag_col, maybe).drop(*drop)


def bloom_flag_increment(
    new_docs: DataFrame,
    bloom: DataFrame,
    n_bits: int | None = None,
    n_hashes: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """``new_docs`` + ``fp`` + ``maybe_dup`` — the broadcast map-side
    membership probe.  ``maybe_dup`` True means the fingerprint MAY be
    in the corpus (true duplicate or false positive, at the sizing
    rate); False is a GUARANTEE of novelty (no false negatives).
    NULL-text documents probe nothing and flag False (the
    ``dedup_increment_exact`` anti-join convention: NULL never matches).

    Plan shape: ``n_hashes`` successive LEFT broadcast-joins of the
    same word table — the increment never shuffles and the whole probe
    is one codegen'd map stage (the loop itself lives in
    :func:`bloom_probe`; fp is already a string so the probe's cast is
    the identity and the DuckDB oracle replay is unchanged)."""
    out = new_docs.withColumn("fp", TXT.fingerprint(F.col(text_col)))
    return bloom_probe(out, bloom, "fp", n_bits, n_hashes, "maybe_dup")


def dedup_increment_bloom(
    new_docs: DataFrame,
    bloom: DataFrame,
    corpus_fps: DataFrame | None = None,
    n_bits: int | None = None,
    n_hashes: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """New documents not exact-present in the corpus, gated by the
    Bloom filter.  With ``corpus_fps`` (the true fingerprint table) the
    result EQUALS :func:`incremental.dedup_increment_exact` — the bloom
    only narrows the verification probe to the maybe set (true dups +
    the small FP fraction), which broadcasts into a semi-join that
    streams the corpus artifact map-side: ZERO shuffles end to end.
    Without ``corpus_fps`` the gate is approximate: every maybe is
    dropped, i.e. a false positive discards a genuinely new document
    at the sizing rate — the cheap mode for pipelines that tolerate
    ~1e-4 over-dedup in exchange for never touching the corpus
    artifact."""
    flagged = bloom_flag_increment(
        new_docs, bloom, n_bits, n_hashes, text_col
    )
    if corpus_fps is None:
        return flagged.where(~F.col("maybe_dup")).drop("fp", "maybe_dup")
    # no .distinct() on the maybe set: the semi-join dedups for free and
    # a distinct here would be the only shuffle in the whole gate
    maybe_fps = flagged.where(F.col("maybe_dup")).select("fp")
    present = corpus_fps.join(F.broadcast(maybe_fps), "fp", "left_semi")
    return (
        flagged.join(F.broadcast(present), "fp", "left_anti")
        .drop("fp", "maybe_dup")
    )
