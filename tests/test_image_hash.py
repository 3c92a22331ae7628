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
