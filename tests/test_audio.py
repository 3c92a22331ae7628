"""Audio windowed fingerprints (operators/audio.py): the
(id, frame_idx, fp) contract over WAV payloads, proven against the
DuckDB arithmetic replay AND through the video family's
modality-generic containment / sequence / verify operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from excelstream_spark.operators.audio import (
    audio_window_fingerprints,
    synthesize_audio_payloads,
)
from excelstream_spark.operators.multimodal import encode_wav
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle


def _wav(seed: int, n_windows: int, order=None) -> bytes:
    """A WAV of ``n_windows`` random 65-sample int16 windows; ``order``
    permutes the windows (for medley/subset fixtures)."""
    rng = np.random.RandomState(seed)
    wins = [
        rng.randint(-30000, 30000, size=65).astype(np.int64).tolist()
        for _ in range(n_windows)
    ]
    if order is not None:
        wins = [wins[i] for i in order]
    return encode_wav(8000, [s for w in wins for s in w])


def _clip_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows],
        "doc_id bigint, payload binary",
    )


def test_audio_window_fingerprints_vs_duckdb_oracle(spark, duck):
    """The hash gate: per-window sign-of-delta fingerprints of the
    synthesized WAV fixture equal the DuckDB arithmetic replay
    bit-for-bit — decode (RIFF chunk walk), windowing and the integer
    bit construction proven end-to-end."""
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = audio_window_fingerprints(synthesize_audio_payloads(docs))
    assert_matches_oracle(fps, duck, ORC.audio_window_fp_oracle())


def test_audio_containment_vs_duckdb_oracle(spark, duck):
    """The video family's containment operator runs UNCHANGED over
    audio window fingerprints, and the close replays through the
    SHARED _fp_containment_close_sql text — the modality-generic
    contract proven at the SQL level.  The fixture plants genuine
    subset pairs: docs d and d+251 share every window offset
    (251 = AUDIO_FIXTURE_MOD is prime) while 251 % 3 != 0 keeps their
    window counts different."""
    from excelstream_spark.operators.video import dedup_video_containment
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = audio_window_fingerprints(synthesize_audio_payloads(docs))
    out = dedup_video_containment(fps, threshold=0.8)
    rows = {
        (r["vid_a"], r["vid_b"]): r["containment"] for r in out.collect()
    }
    planted = [(d, d + 251) for d in range(0, 249)]
    hits = [p for p in planted if p in rows]
    assert len(hits) >= 200  # most planted subset pairs survive
    assert all(abs(rows[p] - 1.0) < 1e-12 for p in hits)
    assert_matches_oracle(
        out, duck, ORC.audio_containment_oracle(threshold=0.8)
    )


def test_audio_sequence_separates_medley_from_reencode(spark):
    """Order-aware audio: a re-encode and an uncut excerpt verify; a
    MEDLEY that re-orders the same windows shares the window set but
    fails the sequence verify — dedup_video_containment_verified over
    audio windows, unchanged."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )

    rows = [
        (1, _wav(7, 4)),                      # original (windows ABCD)
        (2, _wav(7, 4)),                      # re-encode
        (3, _wav(7, 4, order=[3, 2, 1, 0])),  # medley (DCBA)
        (4, _wav(7, 4, order=[1, 2, 3])),     # uncut excerpt (BCD)
    ]
    out = {
        (r["vid_a"], r["vid_b"]): r
        for r in dedup_video_containment_verified(
            audio_window_fingerprints(_clip_df(spark, rows)),
            threshold=0.8,
            seq_threshold=0.8,
            n=2,
        ).collect()
    }
    assert set(out) >= {(1, 2), (1, 3), (1, 4)}
    assert out[(1, 2)]["containment"] == 1.0
    assert out[(1, 2)]["seq_verified"]
    assert out[(1, 3)]["containment"] == 1.0
    assert out[(1, 3)]["seq_containment"] == 0.0
    assert not out[(1, 3)]["seq_verified"]
    assert out[(1, 4)]["containment"] == 1.0
    assert out[(1, 4)]["seq_verified"]


def test_audio_partial_windows_and_corrupt_payloads_drop(spark):
    """Trailing partial windows are dropped (their resample support
    differs from the full-window contract); undecodable payloads are
    dropped; the scan stays exchange-free."""
    full = _wav(11, 2)
    rng = np.random.RandomState(12)
    partial = encode_wav(
        8000,
        rng.randint(-100, 100, size=65 * 2 + 30).astype(np.int64).tolist(),
    )
    rows = [
        (1, full),
        (2, partial),                   # 2 full windows + 30 samples
        (3, b"RIFFgarbage"),            # undecodable
    ]
    fps = audio_window_fingerprints(_clip_df(spark, rows))
    got = fps.collect()
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {1, 2}
    assert len(per_doc[2]) == 2
    assert all(r["n_frames"] == 2 for r in per_doc[2])
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_audio_roundtrip_and_fingerprint_property(spark):
    """Hypothesis hardening: any int16 sample sequence round-trips
    through encode_wav/wav_pcm_array bit-exactly, and the windowed
    fingerprints are partitioning-invariant (pure per-row scan work —
    the same payload hashes identically at any parallelism)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from excelstream_spark.operators.multimodal import wav_pcm_array

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=200,
        )
    )
    def roundtrip(samples):
        _rate, arr, bits = wav_pcm_array(encode_wav(8000, samples))
        assert bits == 16
        assert arr[:, 0].tolist() == samples

    roundtrip()

    rows = [(i, _wav(100 + i, 2 + i % 3)) for i in range(12)]
    base = {
        (r["doc_id"], r["frame_idx"]): r["fp_a"]
        for r in audio_window_fingerprints(_clip_df(spark, rows)).collect()
    }
    repart = {
        (r["doc_id"], r["frame_idx"]): r["fp_a"]
        for r in audio_window_fingerprints(
            _clip_df(spark, rows).repartition(7)
        ).collect()
    }
    assert base == repart and len(base) == sum(2 + i % 3 for i in range(12))


def test_audio_diverse_fixture_linear_duplicate_structure(spark):
    """The scale-ladder fixture (synthesize_diverse_audio_payloads):
    every track content-unique except the planted within-copy twins
    (base%10 == 0 pairs with base+1), duplicate classes of size
    exactly 2, cross-copy tracks never collide — the linear pair
    structure the drift rung relies on (the ORACLE fixture's
    251-value offset space deliberately saturates instead)."""
    from excelstream_spark.operators.audio import (
        synthesize_diverse_audio_payloads,
    )
    from excelstream_spark.operators.video import dedup_video_containment

    base = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    two_copies = base.unionAll(
        base.select((F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"))
    )
    fps = audio_window_fingerprints(
        synthesize_diverse_audio_payloads(two_copies)
    )
    pairs = dedup_video_containment(fps, threshold=0.8).collect()
    got = {(r["vid_a"], r["vid_b"]) for r in pairs}
    want = {
        (b + off, b + 1 + off)
        for b in (0, 10, 20, 30)
        for off in (0, 100_000_000)
    }
    assert got == want
    assert all(abs(r["containment"] - 1.0) < 1e-12 for r in pairs)


def test_audio_sequence_vs_duckdb_oracle(spark, duck):
    """The ORDER-AWARE close over audio windows replays in SQL too:
    the modality-generic sequence oracle (video_sequence_oracle with
    the audio fingerprint CTE) gates shingle strings, 60-bit shingle
    hashes, sizes and the ratio filter bit-for-bit."""
    from excelstream_spark.operators.video import dedup_video_sequence
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    out = dedup_video_sequence(
        audio_window_fingerprints(synthesize_audio_payloads(docs)),
        threshold=0.5,
        n=2,
    )
    assert_matches_oracle(
        out,
        duck,
        ORC.video_sequence_oracle(
            threshold=0.5, n=2, vf_sql=ORC.audio_window_fp_oracle()
        ),
    )
