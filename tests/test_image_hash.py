"""Perceptual image dedup (operators/image_hash.py): aHash fingerprint
semantics on crafted real PNGs, the banded-Hamming pair stage, and the
zero-shuffle hash plan.  The catalog row's fingerprint-level DuckDB
parity over the synthesized fixture is covered by the full-catalog
sweep (test_catalog_oracle.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.image_hash import (
    ahash_from_pixels,
    dedup_image_ahash,
    image_ahash,
)
from excelstream_spark.operators.multimodal import encode_png


def _png(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    return encode_png(w, h, arr.astype(np.uint8).tobytes(), channels=c)


@pytest.fixture(scope="module")
def crafted_images():
    """Deterministic 32x32 grayscale images: a base texture, a
    near-duplicate (one 4x4 block brightened — a small re-encode-style
    perturbation), and an unrelated texture."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(32, 32, 1)).astype(np.uint8)
    neardup = base.copy()
    neardup[0:4, 0:4, 0] = 255  # one resized cell flips at most
    other = rng.randint(0, 256, size=(32, 32, 1)).astype(np.uint8)
    return base, neardup, other


def test_ahash_reference_semantics(crafted_images):
    """The bit construction matches a straight-line numpy reference of
    the published recipe (channel-sum gray, floor-NN 8x8, mean
    threshold via integer cross-multiplication, row-major pack)."""
    base, _, _ = crafted_images
    got = ahash_from_pixels(base)
    gray = base.astype(np.int64).sum(axis=2)
    rows = (np.arange(8) * 32) // 8
    small = gray[rows][:, rows]
    flat = small.reshape(-1)
    want = 0
    for j in range(64):
        if int(flat[j]) * 64 > int(flat.sum()):
            want |= 1 << j
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


def test_constant_image_hashes_zero():
    # no cell exceeds the mean of a constant image -> all bits clear
    assert ahash_from_pixels(np.full((16, 16, 1), 77, np.uint8)) == 0


def test_neardup_small_hamming_unrelated_large(crafted_images):
    base, neardup, other = crafted_images
    h0 = ahash_from_pixels(base)
    h1 = ahash_from_pixels(neardup)
    h2 = ahash_from_pixels(other)
    d01 = bin((h0 ^ h1) & ((1 << 64) - 1)).count("1")
    d02 = bin((h0 ^ h2) & ((1 << 64) - 1)).count("1")
    assert d01 <= 3          # perturbation flips at most a few cells
    assert d02 > 10          # independent textures differ broadly


def test_pair_stage_finds_neardups_only(spark, crafted_images):
    base, neardup, other = crafted_images
    df = spark.createDataFrame(
        [
            (1, bytearray(_png(base))),
            (2, bytearray(_png(neardup))),
            (3, bytearray(_png(other))),
            (4, bytearray(b"not an image")),   # dropped, no hash row
            (5, None),                          # dropped, no hash row
        ],
        "doc_id bigint, payload binary",
    )
    hashes = image_ahash(df)
    rows = {r["doc_id"]: r for r in hashes.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["width"] == 32 and rows[1]["height"] == 32
    assert rows[1]["ahash"] == ahash_from_pixels(base)
    pairs = dedup_image_ahash(hashes, max_hamming=3).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    expect = bin(
        (rows[1]["ahash"] ^ rows[2]["ahash"]) & ((1 << 64) - 1)
    ).count("1")
    assert pairs[0]["hamming"] == expect


def test_recode_invariance(crafted_images):
    """The perceptual claim: the SAME pixels re-encoded (e.g. RGB
    expansion — every channel equal) produce the SAME hash, because
    channel-sum gray is scale-invariant under the integer threshold."""
    base, _, _ = crafted_images
    rgb = np.repeat(base, 3, axis=2)
    assert ahash_from_pixels(base) == ahash_from_pixels(rgb)


def test_hash_stage_is_shuffle_free(spark, crafted_images):
    base, _, _ = crafted_images
    df = spark.createDataFrame(
        [(1, bytearray(_png(base)))], "doc_id bigint, payload binary"
    )
    plan = (
        image_ahash(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_pair_plan_is_band_join_not_cartesian(spark, crafted_images):
    base, neardup, other = crafted_images
    df = spark.createDataFrame(
        [(i, bytearray(_png(img)))
         for i, img in enumerate((base, neardup, other))],
        "doc_id bigint, payload binary",
    )
    plan = (
        dedup_image_ahash(image_ahash(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_reference_and_brightness_invariance(crafted_images):
    """dHash matches a straight-line reference AND is invariant to a
    global brightness shift (the property aHash lacks — gradients
    don't move when every pixel moves together)."""
    from excelstream_spark.operators.image_hash import dhash_from_pixels

    base, _, _ = crafted_images
    got = dhash_from_pixels(base)
    gray = base.astype(np.int64).sum(axis=2)
    rows = (np.arange(8) * 32) // 8
    cols = (np.arange(9) * 32) // 9
    small = gray[rows][:, cols]
    want = 0
    for ty in range(8):
        for tx in range(8):
            if small[ty][tx + 1] > small[ty][tx]:
                want |= 1 << (ty * 8 + tx)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want
    # clip at 160 first so +40 is a pure shift (no saturation) — dHash
    # must be identical on the shifted copy
    shifted = (np.clip(base, 0, 160).astype(np.int64) + 40).astype(np.uint8)
    lowered = np.clip(base, 0, 160)
    assert dhash_from_pixels(shifted) == dhash_from_pixels(lowered)


def test_wav_sign_fingerprint_reference_and_edges():
    from excelstream_spark.operators.image_hash import (
        AUDIO_FP_SAMPLES,
        wav_sign_fingerprint,
    )

    ramp = np.arange(100, dtype=np.int64) * 3 - 50  # strictly rising
    got = wav_sign_fingerprint(ramp)
    idx = (np.arange(AUDIO_FP_SAMPLES) * 100) // AUDIO_FP_SAMPLES
    s = ramp[idx]
    want = 0
    for j in range(64):
        if s[j + 1] > s[j]:
            want |= 1 << j
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want
    assert wav_sign_fingerprint(np.array([5])) == 0       # < 2 frames
    assert wav_sign_fingerprint(np.zeros(16)) == 0        # constant
    # strictly falling: no rise anywhere -> 0
    assert wav_sign_fingerprint(-ramp) == 0


def test_multimodal_fingerprints_three_modalities(spark, crafted_images):
    """The folded operator: images carry (aHash, dHash), audio carries
    (sign hash, NULL), non-media rows are dropped."""
    from excelstream_spark.operators.image_hash import (
        ahash_from_pixels,
        dhash_from_pixels,
        multimodal_fingerprints,
        wav_sign_fingerprint,
    )
    from excelstream_spark.operators.multimodal import encode_wav

    base, _, _ = crafted_images
    samples = [((i * 37) % 256) - 128 for i in range(50)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_png(base))),
            (2, bytearray(encode_wav(8000, samples))),
            (3, bytearray(b"plain text payload")),
        ],
        "doc_id bigint, payload binary",
    )
    rows = {r["doc_id"]: r for r in multimodal_fingerprints(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["modality"] == "image/png"
    assert rows[1]["fp_a"] == ahash_from_pixels(base)
    assert rows[1]["fp_b"] == dhash_from_pixels(base)
    assert rows[2]["modality"] == "audio/wav"
    assert rows[2]["fp_a"] == wav_sign_fingerprint(np.array(samples))
    assert rows[2]["fp_b"] is None


def test_streaming_media_dedup_gate_batch_parity_and_idempotence(spark):
    """The stateless streaming gate (dsir/classifier/C4 shape applied
    to media): fingerprint the standing corpus in batch, drop
    already-seen payloads from every arriving micro-batch.  Proven the
    family's standard way — exact-redelivery replay (2 deliveries),
    per-doc decisions bit-identical across deliveries, and the
    surviving set equal to the BATCH gate's output."""
    import uuid

    from excelstream_spark.operators.image_hash import media_dedup_gate
    from excelstream_spark.operators.multimodal import synthesize_payloads
    from excelstream_spark.plans.streaming_ops import run_available_now
    from excelstream_spark.streaming.pipelines import replayed_docs_stream
    from excelstream_spark.tables import load_table, table_path

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    # standing corpus = even ids, fingerprinted once in batch
    from excelstream_spark.operators.image_hash import (
        multimodal_fingerprints,
    )

    known = [
        r["fp_a"]
        for r in multimodal_fingerprints(
            synthesize_payloads(docs.where(F.col("doc_id") % 2 == 0))
        ).collect()
    ]
    # batch reference: the same gate applied non-streaming
    batch = {
        (r["doc_id"], r["fp_a"])
        for r in media_dedup_gate(
            synthesize_payloads(docs), known
        ).collect()
    }
    assert batch  # odd-id media docs survive

    stream = replayed_docs_stream(spark, table_path(SF_DIR, "documents"))
    gated = media_dedup_gate(
        synthesize_payloads(
            stream.where(F.col("doc_id").isNotNull()).select(
                "doc_id", "text"
            )
        ),
        known,
    )
    result = run_available_now(
        gated, f"mdg_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    facts = (
        result.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_deliveries"),
            F.countDistinct("fp_a").alias("n_distinct"),
            F.max("fp_a").alias("fp_a"),
        )
        .collect()
    )
    assert {(r["doc_id"], r["fp_a"]) for r in facts} == batch
    for r in facts:
        assert r["n_deliveries"] == 2      # both micro-batches flowed
        assert r["n_distinct"] == 1        # bit-identical re-decision


def test_degenerate_fingerprints_quarantined(spark):
    """r8 verdict #1: constant-color placeholders all aHash to 0 (and
    the saturated complement to popcount 64) — a million of them must
    cost ZERO pairs (exact-dedup's job), while a genuine near-dup pair
    with healthy fingerprints still pairs.  Proven directly on a hash
    table: 5 degenerate-zero docs, one all-bits doc, one near-dup
    pair."""
    rows = (
        [(i, 0) for i in range(1, 6)]            # popcount 0 clique
        + [(20, -1)]                              # popcount 64
        + [(10, 0x0F0F00FF), (11, 0x0F0F00FD)]    # hamming 1 pair
    )
    hashes = spark.createDataFrame(rows, "doc_id bigint, ahash bigint")
    pairs = dedup_image_ahash(hashes, max_hamming=3).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(10, 11)]
    # even with the bucket cap disabled, degenerates never pair
    pairs = dedup_image_ahash(hashes, max_hamming=3, max_bucket=None).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(10, 11)]


def test_solid_color_pngs_produce_no_pairs(spark):
    """The end-to-end form of the degenerate quarantine: N solid-color
    PNGs (the real-corpus placeholder case) decode, fingerprint to 0,
    and produce zero candidate pairs — bounded, not quadratic."""
    imgs = [
        (i, bytearray(_png(np.full((16, 16, 1), 10 * i, np.uint8))))
        for i in range(1, 9)
    ]
    df = spark.createDataFrame(imgs, "doc_id bigint, payload binary")
    hashes = image_ahash(df)
    assert hashes.count() == 8          # all decode and hash (to 0)
    assert dedup_image_ahash(hashes).count() == 0


def test_bucket_cap_and_audit(spark):
    """max_bucket quarantines hot (band, key) buckets via a broadcast
    anti-join, with the recall loss named by image_band_bucket_audit —
    never silent.  20 docs share band-0 key 0x7 (and bands 2/3 key 0);
    a cold near-dup pair survives the cap via its own cold band."""
    from excelstream_spark.operators.image_hash import (
        image_band_bucket_audit,
    )

    hot = [(i, (i << 16) | 0x7) for i in range(1, 21)]
    cold = [(100, 0x5555000000005555), (101, 0x5555000000005554)]
    degen = [(200, 0), (201, -1)]
    hashes = spark.createDataFrame(
        hot + cold + degen, "doc_id bigint, ahash bigint"
    )
    capped = dedup_image_ahash(hashes, max_hamming=3, max_bucket=5)
    assert {(p["doc_a"], p["doc_b"]) for p in capped.collect()} == {
        (100, 101)
    }
    # without the cap the hot-bucket near-dups pair too (recall is a
    # cap trade, surfaced by the audit, not a silent loss)
    uncapped = dedup_image_ahash(hashes, max_hamming=3, max_bucket=None)
    uncapped_pairs = {
        (p["doc_a"], p["doc_b"]) for p in uncapped.collect()
    }
    assert (100, 101) in uncapped_pairs
    assert len(uncapped_pairs) > 1
    audit = image_band_bucket_audit(hashes, max_bucket=5).collect()
    degen_rows = {
        (r["bh"], r["n"]) for r in audit if r["kind"] == "degenerate"
    }
    assert degen_rows == {(0, 1), (64, 1)}
    hot_rows = {
        (r["band"], r["bh"], r["n"])
        for r in audit
        if r["kind"] == "hot_bucket"
    }
    # band 0 key 7: the 20 crafted hot docs; band 2 key 0: the hot docs
    # plus the cold pair's zero band (22); band 3 key 0: hot docs only
    # (the cold pair's band 3 key is 0x5555)
    assert (0, 0x7, 20) in hot_rows
    assert (2, 0, 22) in hot_rows and (3, 0, 20) in hot_rows
    # a clean table audits empty
    clean = spark.createDataFrame(cold, "doc_id bigint, ahash bigint")
    assert image_band_bucket_audit(clean, max_bucket=5).count() == 0


def test_dual_hash_verify_cuts_ahash_false_positives(spark):
    """r8 verdict #8: with verify_col, a candidate pair must also agree
    on the second hash — an aHash-coincidence pair with wildly
    different dHash is cut, a true re-encode (small distance on both)
    survives and reports hamming_b."""
    rows = [
        (1, 0x0F0F, 0x00FF),            # base
        (2, 0x0F0E, 0x00FD),            # true near-dup: d_a=1, d_b=1
        (3, 0x0F0D, 0x7FFF0000FF00FF),  # aHash coincidence: d_a=1, d_b large
    ]
    hashes = spark.createDataFrame(
        rows, "doc_id bigint, ahash bigint, dhash bigint"
    )
    plain = dedup_image_ahash(hashes, max_hamming=3)
    assert {(p["doc_a"], p["doc_b"]) for p in plain.collect()} == {
        (1, 2), (1, 3), (2, 3)
    }
    verified = dedup_image_ahash(
        hashes, max_hamming=3, verify_col="dhash", verify_max_hamming=10
    ).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in verified] == [(1, 2)]
    assert verified[0]["hamming"] == 1 and verified[0]["hamming_b"] == 1


def test_media_dedup_gate_hamming_neighbors(spark, crafted_images):
    """r8 advice #2: the default gate drops EXACT fp matches only; with
    max_hamming=3 the banded literal index extends the drop to
    Hamming-neighbor copies (the re-encoded/resized case) with recall 1
    by pigeonhole."""
    from excelstream_spark.operators.image_hash import media_dedup_gate

    # 8x8 images (resize is the identity) with 0/200 cells: thresholds
    # are unambiguous, so flipping two dark cells moves the hash by
    # EXACTLY 2 bits — a deterministic "re-encode drifted the fp" copy
    base = np.zeros((8, 8, 1), np.uint8)
    base[0:3, :, 0] = 200            # 24 bright cells
    neardup = base.copy()
    neardup[4, 0, 0] = 200           # two extra bright cells
    neardup[4, 1, 0] = 200
    other = np.zeros((8, 8, 1), np.uint8)
    other[5:8, :, 0] = 200           # disjoint bright layout
    h0, h1 = ahash_from_pixels(base), ahash_from_pixels(neardup)
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") == 2
    df = spark.createDataFrame(
        [
            (1, bytearray(_png(base))),
            (2, bytearray(_png(neardup))),
            (3, bytearray(_png(other))),
        ],
        "doc_id bigint, payload binary",
    )
    known = [h0]
    exact = {r["doc_id"] for r in media_dedup_gate(df, known).collect()}
    assert exact == {2, 3}  # exact match (1) dropped; neardup passes
    near = {
        r["doc_id"]
        for r in media_dedup_gate(df, known, max_hamming=3).collect()
    }
    assert near == {3}      # neardup within hamming 3 is dropped too


def test_media_dedup_gate_bloom_equals_exact_gate(spark, crafted_images):
    """r8 verdict #6: the Bloom-backed exact gate keeps the SAME set as
    the literal-isin exact gate (no false negatives by construction;
    false positives at the default ~1e-4 sizing don't fire on this
    fixture) — the billion-image index swap, same plan position."""
    from excelstream_spark.operators.bloom import bloom_build
    from excelstream_spark.operators.image_hash import (
        media_dedup_gate,
        media_dedup_gate_bloom,
        multimodal_fingerprints,
    )

    base = np.zeros((8, 8, 1), np.uint8)
    base[0:3, :, 0] = 200
    neardup = base.copy()
    neardup[4, 0, 0] = 200           # fp drifts 2 bits: not exact-known
    neardup[4, 1, 0] = 200
    other = np.zeros((8, 8, 1), np.uint8)
    other[5:8, :, 0] = 200
    df = spark.createDataFrame(
        [
            (1, bytearray(_png(base))),
            (2, bytearray(_png(neardup))),
            (3, bytearray(_png(other))),
        ],
        "doc_id bigint, payload binary",
    )
    known = [ahash_from_pixels(base), ahash_from_pixels(other)]
    known_df = spark.createDataFrame([(k,) for k in known], "fp_a bigint")
    bloom = bloom_build(known_df, fp_col="fp_a")
    exact = {
        r["doc_id"] for r in media_dedup_gate(df, known).collect()
    }
    via_bloom = {
        r["doc_id"]
        for r in media_dedup_gate_bloom(df, bloom).collect()
    }
    assert via_bloom == exact == {2}
    # schema parity with the fingerprint table (the gate only filters)
    assert (
        media_dedup_gate_bloom(df, bloom).columns
        == multimodal_fingerprints(df).columns
    )


def test_media_dedup_gate_rejects_unguaranteed_hamming(spark):
    """max_hamming > 3 would silently miss in-budget neighbors (4 bits
    spread one per band share no band key) — must raise."""
    from excelstream_spark.operators.image_hash import media_dedup_gate

    df = spark.createDataFrame([(1, None)], "doc_id bigint, payload binary")
    with pytest.raises(ValueError, match="recall 1 only for 0..3"):
        media_dedup_gate(df, [7], max_hamming=4)


def test_degenerate_quarantine_opt_out(spark):
    """quarantine_degenerate=False restores exact-equal degenerate
    pairing for fixture-scale callers that use this operator as their
    sole pair source (the default stays quarantined — corpus scale)."""
    rows = [(1, 0), (2, 0), (3, 0x0F0F)]
    hashes = spark.createDataFrame(rows, "doc_id bigint, ahash bigint")
    assert dedup_image_ahash(hashes).count() == 0
    pairs = dedup_image_ahash(
        hashes, quarantine_degenerate=False, max_bucket=None
    ).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [
        (1, 2, 0)
    ]


def test_degenerate_exact_pairs_star_form(spark):
    """r9 advice #2: degenerate_exact_pairs=True emits the quarantined
    rows' exact-equal closure IN-BAND as linear star pairs — per
    degenerate fp value the minimum id hubs every other member at
    hamming 0 — while the banded path is unchanged.  Components over
    the stars equal the full clique's; pair count is members-1, not
    quadratic."""
    rows = (
        [(i, 0) for i in (3, 7, 9, 15)]          # popcount-0 class
        + [(20, -1), (21, -1)]                    # popcount-64 class
        + [(10, 0x0F0F00FF), (11, 0x0F0F00FD)]    # banded hamming-1 pair
    )
    hashes = spark.createDataFrame(rows, "doc_id bigint, ahash bigint")
    pairs = sorted(
        (p["doc_a"], p["doc_b"], p["hamming"])
        for p in dedup_image_ahash(
            hashes, max_hamming=3, degenerate_exact_pairs=True
        ).collect()
    )
    assert pairs == [
        (3, 7, 0),
        (3, 9, 0),
        (3, 15, 0),
        (10, 11, 1),
        (20, 21, 0),
    ]
    # the default stays quarantine-only (unchanged r9 behavior)
    default_pairs = dedup_image_ahash(hashes, max_hamming=3).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in default_pairs] == [(10, 11)]


def test_degenerate_star_pairs_with_verify_col(spark):
    """The star path computes hamming_b honestly (hub vs member) and
    applies the same verify budget as the banded path: members whose
    verify hash sits beyond the budget do NOT star-pair."""
    rows = [
        (1, 0, 0),            # hub (min id), dHash 0
        (2, 0, 0),            # dHash agrees -> pairs
        (3, 0, 0x7FFF7FFF),   # dHash 16 bits away -> cut by budget 10
    ]
    hashes = spark.createDataFrame(
        rows, "doc_id bigint, ahash bigint, dhash bigint"
    )
    pairs = dedup_image_ahash(
        hashes,
        verify_col="dhash",
        verify_max_hamming=10,
        degenerate_exact_pairs=True,
    ).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"], p["hamming_b"]) for p in pairs] == [
        (1, 2, 0, 0)
    ]


def test_media_dedup_gate_dedups_known_fps(spark, crafted_images):
    """r9 advice #4: a repetitive known_fps input (the same fp appended
    many times) builds the identical literal band index as the deduped
    set — gate decisions equal, no plan-embedded candidate bloat."""
    from excelstream_spark.operators.image_hash import (
        image_ahash,
        media_dedup_gate,
    )

    base, near, far = crafted_images
    df = spark.createDataFrame(
        [(1, bytearray(_png(base))), (2, bytearray(_png(far)))],
        "doc_id bigint, payload binary",
    )
    known = [r["ahash"] for r in image_ahash(
        spark.createDataFrame(
            [(9, bytearray(_png(near)))], "doc_id bigint, payload binary"
        )
    ).collect()]
    once = media_dedup_gate(df, known, max_hamming=3).collect()
    many = media_dedup_gate(df, known * 50, max_hamming=3).collect()
    assert sorted(r["doc_id"] for r in once) == sorted(
        r["doc_id"] for r in many
    )
