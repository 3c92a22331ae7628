"""Video family (operators/video.py): real APNG encode/decode
round-trips, per-frame perceptual fingerprints vs the DuckDB
arithmetic replay, frame-set containment dedup semantics + oracle, and
the zero-shuffle scan plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.video import (
    apng_frame_arrays,
    dedup_video_containment,
    encode_apng,
    synthesize_video_payloads,
    video_frame_fingerprints,
)
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle


def _frames(seed: int, n: int, w: int = 16, h: int = 16):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 256, size=h * w).astype(np.uint8).tobytes()
        for _ in range(n)
    ]


def test_apng_roundtrip_bit_exact():
    frames = _frames(3, 4)
    payload = encode_apng(16, 16, frames)
    out = apng_frame_arrays(payload)
    assert len(out) == 4
    for want, got in zip(frames, out):
        assert got.shape == (16, 16, 1)
        assert got.reshape(-1).tobytes() == want


def test_plain_png_decodes_as_one_frame_clip():
    from excelstream_spark.operators.multimodal import encode_png

    px = bytes(range(16)) * 16
    out = apng_frame_arrays(encode_png(16, 16, px))
    assert len(out) == 1
    assert out[0].reshape(-1).tobytes() == px


def test_apng_rejects_subregion_and_blend():
    """The baseline decoder supports exactly what the encoder emits:
    full-frame source-overwrite frames.  A sub-region or blended fcTL
    must raise, never return silently wrong pixels."""
    import struct
    import zlib as _z

    from excelstream_spark.operators.video import _FCTL_FMT, _chunk
    from excelstream_spark.operators.multimodal import _PNG_MAGIC

    w = h = 4
    px = bytes(range(16))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y * w : (y + 1) * w] for y in range(h))
    for fx, blend in ((1, 0), (0, 1)):
        fctl = struct.pack(_FCTL_FMT, 0, w, h, fx, 0, 1, 10, 0, blend)
        bad = (
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"acTL", struct.pack(">II", 1, 0))
            + _chunk(b"fcTL", fctl)
            + _chunk(b"IDAT", _z.compress(raw))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="full-frame"):
            apng_frame_arrays(bad)


def test_video_frame_fingerprints_vs_duckdb_oracle(spark, duck):
    """The hash gate: per-frame aHash/dHash of the synthesized APNG
    fixture equal the DuckDB arithmetic replay bit-for-bit — decode
    (chunk walk, inflate, unfilter) + the integer hash construction
    proven end-to-end for multi-frame payloads."""
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    assert_matches_oracle(fps, duck, ORC.video_frame_fp_oracle())


def test_video_containment_semantics_crafted(spark):
    """Re-encode -> containment 1 (pairs); clip embedded in a longer
    compilation -> containment 1 on the shorter side (pairs); one
    shared frame out of three -> 1/3 (no pair at 0.8)."""
    base = _frames(11, 3)
    other = _frames(12, 2)
    rows = [
        (1, encode_apng(16, 16, base)),               # original
        (2, encode_apng(16, 16, list(base))),         # re-encode
        (3, encode_apng(16, 16, base[:2])),           # subset clip
        (4, encode_apng(16, 16, [base[0]] + other)),  # 1/3 shared
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id bigint, payload binary"
    )
    fps = video_frame_fingerprints(df)
    got = {
        (r["vid_a"], r["vid_b"]): r["containment"]
        for r in dedup_video_containment(fps, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert all(abs(v - 1.0) < 1e-12 for v in got.values())


def test_video_containment_skew_bounds(spark):
    """Degenerate frames (black/white cards) and over-``max_fp_df``
    boilerplate frames (shared intros) are pruned BEFORE set sizes are
    counted, so they neither pair videos nor distort the ratio."""
    intro = _frames(21, 1)[0]
    black = bytes(256)
    rows = []
    for vid in range(1, 8):
        frames = [intro, black] + _frames(100 + vid, 2)
        rows.append((vid, bytearray(encode_apng(16, 16, frames))))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    fps = video_frame_fingerprints(df)
    # every video shares intro + black; unique tails -> no pairs once
    # the degenerate (black) and hot (intro, df=7 > 5) frames prune
    out = dedup_video_containment(fps, threshold=0.5, max_fp_df=5)
    assert out.count() == 0
    # without the DF cap the shared intro pairs everything at 1/3 --
    # visible, not silent (and the black card still never counts)
    loose = dedup_video_containment(fps, threshold=0.3, max_fp_df=None)
    assert loose.count() == 21  # all 7-choose-2 pairs


def test_video_containment_vs_duckdb_oracle(spark, duck):
    """Full containment replay over the synthesized fixture: distinct
    frame-fp sets (degenerate popcounts quarantined), inverted-index
    intersection, sizes over the surviving space, ratio filter."""
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    out = dedup_video_containment(fps, threshold=0.8, max_fp_df=None)
    assert_matches_oracle(
        out,
        duck,
        f"""
        WITH vf AS ({ORC.video_frame_fp_oracle()}),
        s AS (SELECT DISTINCT doc_id AS vid, fp_a AS fp FROM vf
              WHERE bit_count(fp_a) NOT IN (0, 64)),
        sz AS (SELECT vid, count(*) AS n FROM s GROUP BY vid),
        p AS (SELECT a.vid AS vid_a, b.vid AS vid_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM s a JOIN s b ON a.fp = b.fp AND a.vid < b.vid
              GROUP BY 1, 2)
        SELECT p.vid_a, p.vid_b, p.inter, na.n AS na, nb.n AS nb,
               p.inter * 1.0 / least(na.n, nb.n) AS containment
        FROM p
        JOIN sz na ON na.vid = p.vid_a
        JOIN sz nb ON nb.vid = p.vid_b
        WHERE p.inter * 1.0 / least(na.n, nb.n) >= 0.8
        """,
    )


def test_video_fingerprint_plan_is_scan_only(spark):
    """Decode + hash is pure scan work: zero exchanges in the executed
    plan (the payload bytes never shuffle)."""
    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    fps.write.format("noop").mode("overwrite").save()
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") >= 1


def test_corrupt_video_payloads_drop(spark):
    rows = [
        (1, bytearray(b"\x89PNG\r\n\x1a\x08garbage")),
        (2, bytearray(b"not a png at all")),
        (3, None),
        (4, bytearray(encode_apng(4, 4, [bytes(range(16))]))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = video_frame_fingerprints(df).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_sample_frames_real_over_apng(spark):
    """r10: the generic feature extractor reads the acTL frame count,
    so multimodal.sample_frames over an APNG clip explodes GENUINE
    frame indices (previously every PNG reported n_frames 1 and video
    sampling was plumbing-only)."""
    from excelstream_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    clip = encode_apng(8, 8, _frames(31, 5, 8, 8))
    df = spark.createDataFrame(
        [(1, bytearray(clip), {"content_type": "video/apng", "byte_len": len(clip)})],
        "doc_id bigint, payload binary, "
        "meta struct<content_type: string, byte_len: int>",
    )
    feats = extract_features(df).collect()
    assert feats[0]["n_frames"] == 5
    assert feats[0]["decoder"] == "apng-stdlib"
    sampled = sample_frames(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2, 4]
