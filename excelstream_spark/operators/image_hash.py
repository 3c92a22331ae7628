"""Perceptual media dedup: 64-bit fingerprints over decoded
image/audio payloads, plus banded Hamming near-dup pairs.

The media twin of the text near-dup family: a training-data pipeline
dedups images and audio by PERCEPTUAL fingerprint (re-encoded, resized
and re-compressed copies of one asset must collide), not by byte hash.
Three fingerprints, one 64-bit contract:

- **aHash** (average hash — Krawetz's "Looks Like It"): grayscale,
  resize to 8x8, threshold each cell against the mean.
- **dHash** (difference hash — the gradient sibling, robust to global
  brightness shifts): resize to 9x8, bit = right cell > left cell.
- **audio sign-of-delta**: floor-NN resample of the mono PCM track to
  65 points, bit = next sample > current (the chromaprint-style
  reduction stripped to an engine-exact integer form).

Near-dup copies differ in a few bits, so the pair stage is exactly the
SimHash shape: 4 x 16-bit band blocking (pigeonhole guarantees a
shared band for Hamming distance <= 3) + exact ``bit_count(xor)``
verification — any fingerprint column feeds it.

Engine-exact by construction (the multimodal convention —
`multimodal.py`, ref has no media surface at all):

- Grayscale is the integer CHANNEL SUM (aHash thresholds against the
  image's own mean, so any positive channel scaling is
  hash-invariant) — no fractional luma weights to round.
- Resize is the repo's floor-convention nearest neighbor
  (``src = (dst * src_n) // dst_n`` — media_transform._resize_nearest),
  pure integer index math.
- The threshold compare is ``cell * 64 > total`` — integers only, no
  mean division, so the bit pattern is bit-identical on every engine.
- Decode runs the same stdlib/from-spec decoders as the feature
  extractor (PNG chunk walk + unfilter, baseline JPEG entropy decode),
  Arrow-batched in ``mapInPandas`` — zero shuffle, scan-parallel.

The catalog row replays the ENTIRE pipeline in DuckDB: the synthetic
payload pixels are pure doc_id arithmetic (multimodal.
synthesize_payloads), so the oracle recomputes decode -> gray ->
8x8 resize -> threshold -> 64-bit pack arithmetically in SQL and the
driver hash-gates the fingerprints themselves
(plans/oracles.image_ahash_oracle).  The pair stage is proven in
pytest on crafted real PNGs (a duplicate with a few tweaked pixels
pairs at small Hamming distance; an unrelated image does not).

100 TB design: hashing is embarrassingly parallel scan work (the
payload bytes never shuffle); the pair stage shuffles only
(id, band, 16-bit key) rows — the dedup_simhash budget, O(n) per band
— and exact verification touches only band-collision candidates.
Skew is bounded twice (r9): degenerate fingerprints (popcount 0/64 —
every constant-color placeholder collides there) are quarantined
before banding, and every band bucket is capped at ``max_bucket``
members with the quarantine audited by
:func:`image_band_bucket_audit` — so a million black thumbnails cost
one audit row, not a 10^12-pair clique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from excelstream_spark.functions import vectors as VEC

#: aHash grid — 8x8 = 64 bits, the published default.
AHASH_SIDE = 8

#: Output schema of :func:`image_ahash`.
AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def ahash_from_pixels(arr) -> int:
    """64-bit aHash of one decoded HxWxC uint8 pixel array — the exact
    integer construction shared with the SQL oracle: channel-sum gray,
    floor-convention 8x8 nearest-neighbor resize, ``cell * 64 > total``
    threshold, row-major bit pack (bit j = cell ty*8+tx), wrapped to a
    signed int64."""
    import numpy as np

    from excelstream_spark.operators.media_transform import _resize_nearest

    gray = arr.astype(np.int64).sum(axis=2)
    small = _resize_nearest(gray, AHASH_SIDE, AHASH_SIDE)
    flat = small.reshape(-1)
    total = int(flat.sum())
    bits = 0
    for j in np.flatnonzero(flat * 64 > total):
        bits |= 1 << int(j)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def dhash_from_pixels(arr) -> int:
    """64-bit dHash (difference/gradient hash — the aHash sibling that
    is robust to global brightness shifts): channel-sum gray,
    floor-convention nearest-neighbor resize to 9x8 (one extra column),
    bit ty*8+tx = cell[ty][tx+1] > cell[ty][tx] — pure integer
    compares, row-major pack, signed-int64 wrap."""
    import numpy as np

    from excelstream_spark.operators.media_transform import _resize_nearest

    gray = arr.astype(np.int64).sum(axis=2)
    small = _resize_nearest(gray, AHASH_SIDE + 1, AHASH_SIDE)
    diff = small[:, 1:] > small[:, :-1]
    bits = 0
    for j in np.flatnonzero(diff.reshape(-1)):
        bits |= 1 << int(j)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


#: Fixed resample length for the audio sign fingerprint: 65 samples
#: give 64 adjacent deltas = 64 bits (the image hashes' width).
AUDIO_FP_SAMPLES = 65


def wav_sign_fingerprint(mono) -> int:
    """64-bit audio fingerprint (a chromaprint-style sign-of-delta
    reduction made engine-exact): floor-convention nearest-neighbor
    resample of the mono PCM track to 65 points, bit j =
    sample[j+1] > sample[j] — integer compares only, so the bit
    pattern replays in SQL from the synthesized fixture's sample
    arithmetic.  Tracks shorter than 2 frames fingerprint 0."""
    import numpy as np

    mono = np.asarray(mono, dtype=np.int64).reshape(-1)
    if mono.size < 2:
        return 0
    idx = (np.arange(AUDIO_FP_SAMPLES, dtype=np.int64) * mono.size) // (
        AUDIO_FP_SAMPLES
    )
    s = mono[idx]
    bits = 0
    for j in np.flatnonzero(s[1:] > s[:-1]):
        bits |= 1 << int(j)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def multimodal_fingerprints(
    multimodal: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, modality, fp_a, fp_b) — perceptual 64-bit fingerprints for
    every decodable media payload: images (PNG / baseline JPEG) get
    ``fp_a`` = aHash and ``fp_b`` = dHash; integer-PCM WAV gets
    ``fp_a`` = the sign-of-delta fingerprint and ``fp_b`` NULL.
    Non-media and undecodable rows are dropped (a fingerprint row
    asserts "these bytes hash to this value").  One Arrow-batched
    ``mapInPandas``, zero shuffle; any fp column feeds
    :func:`dedup_image_ahash`'s banded-Hamming pair stage."""
    import pandas as pd

    from excelstream_spark.operators.jpeg_baseline import decode_jpeg
    from excelstream_spark.operators.multimodal import (
        _JPEG_MAGIC,
        _PNG_MAGIC,
        png_pixel_array,
        wav_pcm_array,
    )

    schema = "doc_id bigint, modality string, fp_a bigint, fp_b bigint"

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload[:8] == _PNG_MAGIC:
                        arr = png_pixel_array(payload)
                        rows.append(
                            (int(doc_id), "image/png",
                             ahash_from_pixels(arr), dhash_from_pixels(arr))
                        )
                    elif payload[:3] == _JPEG_MAGIC:
                        arr = decode_jpeg(payload)
                        rows.append(
                            (int(doc_id), "image/jpeg",
                             ahash_from_pixels(arr), dhash_from_pixels(arr))
                        )
                    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                        _rate, frames, _bits = wav_pcm_array(payload)
                        rows.append(
                            (int(doc_id), "audio/wav",
                             wav_sign_fingerprint(frames[:, 0]), None)
                        )
                except Exception:
                    continue  # undecodable/corrupt payload: no row
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "fp_a", "fp_b"]
            )

    return multimodal.select(id_col, payload_col).mapInPandas(
        gen, schema=schema
    )


def image_ahash(
    multimodal: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, width, height, ahash) for every decodable IMAGE payload
    (PNG / baseline JPEG magic); non-image and undecodable rows are
    dropped — a fingerprint table row asserts "this image hashes to
    this value", so there is no honest null row.  One Arrow-batched
    ``mapInPandas``, zero shuffle."""
    import pandas as pd

    from excelstream_spark.operators.jpeg_baseline import decode_jpeg
    from excelstream_spark.operators.multimodal import (
        _JPEG_MAGIC,
        _PNG_MAGIC,
        png_pixel_array,
    )

    cols = [id_col, payload_col]

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if payload[:8] == _PNG_MAGIC:
                        arr = png_pixel_array(payload)
                    elif payload[:3] == _JPEG_MAGIC:
                        arr = decode_jpeg(payload)
                    else:
                        continue
                except Exception:
                    continue  # undecodable/corrupt image: no hash row
                rows.append(
                    (
                        int(doc_id),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        ahash_from_pixels(arr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash"]
            )

    return multimodal.select(*cols).mapInPandas(gen, schema=AHASH_SCHEMA)


def media_dedup_gate(
    multimodal: DataFrame,
    known_fps,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 0,
) -> DataFrame:
    """STATELESS streaming media-dedup gate (the dsir/classifier/C4
    stateless-gate shape applied to perceptual fingerprints): decode +
    fingerprint every payload (:func:`multimodal_fingerprints`) and
    drop payloads already covered by the batch-built ``known_fps``
    index — the production image-ingest gate: fingerprint the standing
    corpus once in batch, drop already-seen media from every arriving
    micro-batch with NO state store (redeliveries re-decide identically
    because the decision is a pure function of the payload + the
    broadcast index).

    Match semantics (r8 advice #2 — previously the docstring oversold
    the default): ``max_hamming=0`` (default) drops EXACT fingerprint
    matches only — pixel-identical re-encodes, which collide exactly
    because the fingerprint is a pure function of the decoded pixels
    (RGB expansion, palette re-encode, bit-depth doubling); a resized
    or recompressed copy whose fp moves by a bit or two PASSES the
    exact gate.  ``max_hamming`` in 1..3 extends the drop to
    Hamming-neighbor copies with recall exactly 1 (pigeonhole over the
    4 x 16-bit bands): each known fp is exploded into its 4 band keys
    and embedded as a literal band->candidates map; an arriving fp
    looks up its own 4 band keys and exact-verifies only the
    candidates sharing a band — per-row work O(4 + candidates), not
    O(|known|), and still a pure stateless expression (no join against
    the stream, so it runs identically under batch and streaming).

    ``known_fps``: an iterable of known fp_a values (embedded as a
    broadcast literal index — the broadcast-the-model shape; for
    billion-image EXACT indexes use :func:`media_dedup_gate_bloom`,
    same plan position, documented false-positive drop rate).  Adds
    ``fp_a``/``fp_b``/``modality``; non-media rows are dropped (a
    media gate has nothing to say about them)."""
    if not 0 <= max_hamming <= 3:
        # 4 x 16-bit bands guarantee a shared band only for distance
        # <= 3 (pigeonhole); a larger budget would SILENTLY miss
        # in-budget neighbors whose 4+ flipped bits spread one per band
        raise ValueError(
            f"max_hamming={max_hamming}: the 4-band index guarantees "
            "recall 1 only for 0..3"
        )
    fps = multimodal_fingerprints(multimodal, payload_col, id_col)
    # dedup + sort the known set (r9 advice #4): repetitive inputs used
    # to append the same fp's band entries repeatedly, bloating the
    # plan-embedded map and candidate arrays for no recall gain
    known = sorted({int(v) for v in known_fps})
    if not known:
        return fps
    if max_hamming == 0:
        return fps.where(~F.col("fp_a").isin(known))
    # band->candidates literal map: 4 entries per known fp
    buckets: dict[str, list[int]] = {}
    for k in known:
        ku = k & ((1 << 64) - 1)
        for j in range(4):
            key = f"{j}:{(ku >> (j * 16)) & 0xFFFF}"
            buckets.setdefault(key, []).append(k)
    entries = []
    for key, vals in buckets.items():
        entries.append(F.lit(key))
        entries.append(F.array(*[F.lit(v).cast("bigint") for v in vals]))
    index = F.create_map(*entries)
    fp = F.col("fp_a")
    cands = F.flatten(
        F.array_compact(
            F.array(
                *[
                    # try_element_at: NULL (not an ANSI error) on a
                    # band key absent from the index
                    F.try_element_at(
                        index,
                        F.concat(
                            F.lit(f"{j}:"),
                            _bands(fp, j).cast("string"),
                        ),
                    )
                    for j in range(4)
                ]
            )
        )
    )
    min_d = F.array_min(
        F.transform(cands, lambda k: VEC.hamming64(fp, k))
    )
    return fps.where(min_d.isNull() | (min_d > max_hamming))


def media_dedup_gate_bloom(
    multimodal: DataFrame,
    bloom: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_bits: int | None = None,
    n_hashes: int | None = None,
) -> DataFrame:
    """The billion-image form of :func:`media_dedup_gate`'s EXACT gate
    (r8 verdict #6 — previously only documented): membership of
    ``fp_a`` in a Bloom filter built over the known fingerprints
    (``bloom.bloom_build(known, fp_col='fp_a')``) instead of a literal
    ``isin`` set.  The literal set embeds every known fp in the plan —
    fine at thousands, lineage-bloat at billions; the Bloom word table
    is ``n_bits/32`` rows broadcast once, and the probe is the same
    zero-exchange map-side join chain as the text increment gate
    (bloom.bloom_probe).

    Semantics vs the exact gate: Bloom has NO false negatives, so
    every payload the exact gate drops is dropped here too; a false
    positive (at the documented sizing rate, ~(1-e^(-kn/m))^k) drops a
    genuinely new payload — over-dedup, the conventional trade for a
    constant-size index.  Keep-set equality modulo that drop rate is
    pinned in tests/test_image_hash.py.  Stateless: the decision is a
    pure function of the payload + the broadcast word table, so batch
    and streaming decide identically on every redelivery.

    Sizing: with ``n_bits``/``n_hashes`` omitted, an artifact built via
    ``bloom_build(..., with_meta=True)`` supplies its OWN sizing
    (r9 advice #1 — the sizing travels with the artifact; the probe
    adopts it inside its single validation aggregation, so the gate
    costs ONE Spark job either way — r10 review finding); a meta-less
    artifact probes at the module defaults, with the one-directional
    range guard."""
    from excelstream_spark.operators import bloom as BL

    kw = {}
    if n_bits is not None:
        kw["n_bits"] = n_bits
    if n_hashes is not None:
        kw["n_hashes"] = n_hashes
    fps = multimodal_fingerprints(multimodal, payload_col, id_col)
    flagged = BL.bloom_probe(fps, bloom, fp_col="fp_a", **kw)
    return flagged.where(~F.col("maybe_dup")).drop("maybe_dup")


def _bands(h: Column, j: int) -> Column:
    """16-bit band j of a 64-bit signature (the dedup_simhash band)."""
    return (
        F.shiftrightunsigned(h, j * 16)
        .bitwiseAND(F.lit(0xFFFF).cast("bigint"))
    )


def _is_degenerate(h: Column) -> Column:
    """True for the two degenerate perceptual fingerprints: popcount 0
    (aHash of ANY constant-color image — no cell exceeds the mean) and
    popcount 64 (the saturated complement).  Real corpora are full of
    placeholder/black/white thumbnails that ALL collide on these two
    values, so they form mega-cliques the pair stage must never
    enumerate — the image twin of the text family's token-less
    signature-0 docs (dedup.simhash_signatures, fixed r7)."""
    pc = F.bit_count(h)
    return (pc == 0) | (pc == 64)


def image_band_bucket_audit(
    hashes: DataFrame,
    hash_col: str = "ahash",
    max_bucket: int = 10_000,
) -> DataFrame:
    """(kind, band, bh, n) — the skew audit for the image pair stage
    (the ``max_shingle_df`` convention, r8 verdict #1): one row per
    DEGENERATE fingerprint class present (kind='degenerate', band
    NULL, bh = the class popcount 0/64, n = member count) and one row
    per over-cap band bucket among the non-degenerate fps
    (kind='hot_bucket', n = bucket size > ``max_bucket``).  Empty
    output = :func:`dedup_image_ahash`'s candidate enumeration is
    bounded by ``max_bucket``:sup:`2` pairs per bucket with nothing
    quarantined; non-empty rows are what a 100 TB run logs before
    either raising the cap or routing the named members to exact-fp
    grouping (degenerate/hot members are exact-equal or
    boilerplate-shaped — exact dedup's job, not pair enumeration's)."""
    h = F.col(hash_col)
    degen = (
        hashes.where(_is_degenerate(h))
        .groupBy(F.bit_count(h).cast("bigint").alias("bh"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("degenerate").alias("kind"),
            F.lit(None).cast("int").alias("band"),
            "bh",
            "n",
        )
    )
    bands = hashes.where(~_is_degenerate(h)).select(
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("band"), _bands(h, j).alias("bh"))
                for j in range(4)
            ])
        ).alias("b")
    ).select("b.band", "b.bh")
    hot = (
        bands.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket)
        .select(F.lit("hot_bucket").alias("kind"), "band", "bh", "n")
    )
    return degen.unionByName(hot)


def dedup_image_ahash(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "ahash",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
    verify_col: str | None = None,
    verify_max_hamming: int = 10,
    quarantine_degenerate: bool = True,
    degenerate_exact_pairs: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, hamming) near-dup image pairs from an
    :func:`image_ahash` table: 4 x 16-bit band blocking + exact Hamming
    verify — recall is exactly 1 for ``max_hamming <= 3`` (pigeonhole:
    3 differing bits touch at most 3 of the 4 bands), probabilistic
    above, the dedup_simhash contract.

    Skew bounds (r8 verdict #1 — the pair stage must survive a corpus
    of a million black thumbnails):

    - DEGENERATE fingerprints (popcount 0 or 64 — every constant-color
      image collides on one of two values) are dropped before banding:
      they are exact-equal mega-cliques, which is exact-dedup's job
      (group by the fp value itself), not a quadratic pair
      enumeration's.  NOTE this means two identical all-black
      thumbnails no longer pair HERE (a behavior change vs r8) — a
      caller using this operator as its sole pair source has three
      options: ``degenerate_exact_pairs=True`` (below, the in-band
      LINEAR form — r9 advice #2), grouping degenerate fps exactly
      itself, or ``quarantine_degenerate=False`` to restore the old
      enumeration at fixture scale (NEVER at corpus scale: a million
      placeholder frames form a 10^12-pair clique).
    - ``degenerate_exact_pairs=True`` emits the quarantined rows'
      exact-equal closure as STAR pairs: per EXACT-EQUAL hash tuple —
      the fp value alone, or (fp, verify-fp) when ``verify_col`` is
      given — the minimum id hubs every other member at distance 0, so
      connected components over the output equal the clique closure of
      tuple equality (equality is transitive, so star == clique; a
      distance BUDGET on the verify hash would not be, which is why
      near-but-unequal verify hashes within a degenerate class are
      deliberately NOT paired here — a degenerate fp plus a merely
      similar gradient hash is not trustworthy duplicate evidence).
      Pair count stays LINEAR in members (a million black thumbnails
      cost ~10^6 star rows, not the 10^12-pair clique).
      CAVEAT (why this is not the default): degenerate fp equality is
      the WEAKEST evidence class — every constant-color image collides
      on fp 0 regardless of its color, and dHash is also 0 for any
      constant image, so even the exact verify-hash key cannot
      separate a black placeholder from a white one.  Pipelines that
      must keep distinct solid colors apart need a byte-level or
      richer hash on the quarantined set (the audit names it) instead
      of this flag.
    - ``max_bucket`` caps every (band, 16-bit key) bucket: buckets
      with more members are excluded from pairing via a broadcast
      anti-join of the (tiny, <= 4*n_rows/max_bucket) hot-bucket
      list — the ``max_shingle_df`` shape.  Recall within a capped
      bucket degrades explicitly, never silently:
      :func:`image_band_bucket_audit` (same ``max_bucket``) names
      every quarantined class and bucket with its member count.
      ``max_bucket=None`` disables the cap (fixture-scale recall
      tests).

    Dual-hash verification (r8 verdict #8): with ``verify_col`` (e.g.
    the dHash column ``fp_b`` of :func:`multimodal_fingerprints`) a
    candidate pair must ALSO sit within ``verify_max_hamming`` on the
    second hash, and the output gains a ``hamming_b`` column.  aHash
    alone false-positives on images that merely share a coarse
    brighter-than-mean cell layout; requiring gradient-hash agreement
    cuts those while keeping true re-encodes — a global brightness
    shift moves aHash bits only where cells cross the mean and moves
    dHash not at all (left-vs-right compares are shift-invariant), so
    genuine re-encoded copies stay within both budgets."""
    h = F.col(hash_col)
    src = hashes.where(~_is_degenerate(h)) if quarantine_degenerate else hashes
    vcols = ["v"] if verify_col else []
    extra = [F.col(verify_col).alias("v")] if verify_col else []
    bands = src.select(
        F.col(id_col).alias("id"),
        h.alias("h"),
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _bands(h, j).alias("bh"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "h", *vcols, "b.band", "b.bh")
    if max_bucket is not None:
        hot = (
            bands.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("band", "bh")
        )
        bands = bands.join(F.broadcast(hot), ["band", "bh"], "left_anti")
    lhs = bands.select(
        F.col("id").alias("doc_a"),
        F.col("h").alias("h_a"),
        *[F.col("v").alias("v_a") for _ in vcols],
        "band",
        "bh",
    )
    rhs = bands.select(
        F.col("id").alias("doc_b"),
        F.col("h").alias("h_b"),
        *[F.col("v").alias("v_b") for _ in vcols],
        "band",
        "bh",
    )
    pairs = (
        lhs.join(rhs, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            VEC.hamming64(F.col("h_a"), F.col("h_b")).alias("hamming"),
            *(
                [VEC.hamming64(F.col("v_a"), F.col("v_b")).alias("hamming_b")]
                if verify_col
                else []
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    if verify_col:
        pairs = pairs.filter(F.col("hamming_b") <= verify_max_hamming)
    if quarantine_degenerate and degenerate_exact_pairs:
        degen = hashes.where(_is_degenerate(h)).select(
            F.col(id_col).alias("id"),
            h.alias("h"),
            *extra,
        )
        # star groups key on the EXACT-EQUAL hash tuple: (fp) alone,
        # or (fp, verify-fp) when a verify column is given (r10 review
        # finding: a hub-anchored star over fp alone with a verify
        # BUDGET loses member-member edges whose hubs sit beyond the
        # budget — exact tuple equality is the form whose star closure
        # provably equals its clique closure, because equality is
        # transitive where a distance budget is not)
        group_keys = ["h"] + vcols
        hubs = degen.groupBy(*group_keys).agg(F.min("id").alias("doc_a"))
        stars = (
            degen.join(F.broadcast(hubs), group_keys)
            .where(F.col("id") != F.col("doc_a"))
            .select(
                "doc_a",
                F.col("id").alias("doc_b"),
                # exact-equal fp_a by construction: distance 0, typed
                # identically to the banded path's bit_count column
                VEC.hamming64(F.col("h"), F.col("h")).alias("hamming"),
                *(
                    # exact-equal verify hash by construction (0);
                    # NULL verify hashes yield NULL and are dropped by
                    # the budget filter — the banded path's semantics
                    [
                        VEC.hamming64(
                            F.col("v"), F.col("v")
                        ).alias("hamming_b")
                    ]
                    if verify_col
                    else []
                ),
            )
        )
        if verify_col:
            stars = stars.filter(F.col("hamming_b") <= verify_max_hamming)
        pairs = pairs.unionByName(stars)
    return pairs
