"""Windowed audio fingerprints: WAV payloads reduced to the
``(id, frame_idx, fp)`` contract, so the video family's containment /
sequence / serving operators apply to AUDIO **unchanged**.

Until now audio dedup was whole-track only (image_hash.
multimodal_fingerprints emits ONE sign-of-delta fingerprint per WAV):
a track embedded in a longer mix, a re-encode with trailing silence,
or a re-ordered medley all defeat a single whole-payload hash.  The
published fix is the same one video uses — fingerprint fixed WINDOWS
of the track and compare window-fingerprint SETS (containment: a
track inside a longer mix scores ~1 on its own side) and window
SEQUENCES (order: a medley that re-orders segments shares the windows
but not their order).  Because :func:`audio_window_fingerprints`
emits exactly the columns the video operators consume
(``doc_id, frame_idx, n_frames, fp_a``), there is no parallel audio
implementation to keep in sync:

* containment close      -> video.dedup_video_containment
* order-aware shingles   -> video.video_sequence_shingles
* composed verify        -> video.dedup_video_containment_verified
* serving artifacts/join -> video.save_video_fp_artifact /
                            video.video_increment_containment /
                            video.video_increment_verified

(the operators are modality-generic over (id, frame_idx, fp) rows —
deliberately NOT re-exported here; call them directly).

The window fingerprint is image_hash.wav_sign_fingerprint — 65-point
floor-resample, bit j = sample[j+1] > sample[j] — applied per window.
At the default ``window_samples == 65`` the resample is the IDENTITY
(the video fixture's 8x8 trick), so the synthesized fixture's window
fingerprints replay arithmetically in SQL
(plans/oracles.audio_window_fp_oracle).  Constant/monotone windows
(digital silence, pure ramps) fingerprint to popcount 0/64 and are
quarantined by the downstream operators' degenerate prune — the same
black-frame story as video.

100 TB: decode + windowing + hashing is zero-shuffle Arrow scan work;
one row moves per (track, DISTINCT window hash) — an hour of 44.1 kHz
audio at 65-sample windows is ~2.4M windows, so production sizing
uses larger windows (e.g. ``window_samples=4096``, ~93 ms at
44.1 kHz -> ~39k windows per hour-long track BEFORE the distinct,
typically far fewer after it); the fingerprint's internal resample
makes the hash width independent of the window length.

The reference engine (KSD-CO/excelstream) has no media surface; this
extends the multimodal family (SURVEY.md §2 extensions, the brief's
image/AUDIO/video requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from excelstream_spark.partitioning import fan_out

#: Oracle-fixture arithmetic (shared with plans/oracles.
#: audio_window_fp_oracle — one definition each side, values pinned by
#: the oracle test): sample i of window w of doc d =
#: ``(d*37 + w*101 + i*i*11 + i*5) % 251 - 125``.  The 251 modulus is
#: PRIME and < 500 on purpose: docs d and d+251 share every window
#: offset (37*251 ≡ 0 mod 251) while 251 % 3 != 0 keeps their window
#: COUNTS different — so the fixture plants genuine subset-containment
#: pairs (ratio 1 on the shorter side) plus scattered partial-overlap
#: noise below threshold, the video fixture's structure.
AUDIO_FIXTURE_MOD = 251


def synthesize_audio_payloads(
    docs: DataFrame, window_samples: int = 65
) -> DataFrame:
    """Deterministic audio fixture: REAL int16 mono WAV payloads whose
    samples are pure doc_id arithmetic (see :data:`AUDIO_FIXTURE_MOD`),
    ``2 + doc_id % 3`` windows of ``window_samples`` each — so a SQL
    oracle recomputes every window fingerprint.  One Arrow-batched
    ``mapInPandas``, zero shuffle."""
    import pandas as pd

    from excelstream_spark.operators.multimodal import encode_wav

    schema = "doc_id bigint, payload binary"
    m = AUDIO_FIXTURE_MOD

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nw = 2 + d % 3
                samples = [
                    (d * 37 + w * 101 + i * i * 11 + i * 5) % m
                    - (m // 2)
                    for w in range(nw)
                    for i in range(window_samples)
                ]
                rows.append((d, encode_wav(8000, samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # fan_out BEFORE the Python stage (r13 optimization, the
    # synthesize_video_payloads rationale): ids are cheap to move and a
    # 1-partition upstream scan otherwise serializes the WAV encode.
    return fan_out(docs.select("doc_id")).mapInPandas(gen, schema=schema)


def audio_window_fingerprints(
    audios: DataFrame,
    window_samples: int = 65,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, frame_idx, n_frames, fp_a) — one row per fixed-length
    window of the mono track (channel 0, the whole-track fingerprint's
    convention): ``fp_a`` = the 64-bit sign-of-delta fingerprint of
    that window.  The column names ARE the video family's frame
    contract, so every containment/sequence/serving operator in
    operators/video.py consumes this frame directly.  Trailing partial
    windows are dropped (a partial window's resample support differs
    from the full-window arithmetic the oracle states — and from what
    the same audio would hash to inside a longer take).  Undecodable
    payloads are dropped.  One Arrow-batched ``mapInPandas``, zero
    shuffle."""
    import pandas as pd

    from excelstream_spark.operators.image_hash import wav_sign_fingerprint
    from excelstream_spark.operators.multimodal import wav_pcm_array

    schema = "doc_id bigint, frame_idx int, n_frames int, fp_a bigint"
    ws = int(window_samples)

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _rate, arr, _bits = wav_pcm_array(payload)
                except Exception:
                    continue
                mono = arr[:, 0]
                nw = len(mono) // ws
                for w in range(nw):
                    rows.append(
                        (
                            int(doc_id),
                            w,
                            nw,
                            wav_sign_fingerprint(
                                mono[w * ws : (w + 1) * ws]
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "n_frames", "fp_a"],
            )

    return audios.select(id_col, payload_col).mapInPandas(
        gen, schema=schema
    )


def synthesize_diverse_audio_payloads(
    docs: DataFrame, window_samples: int = 65
) -> DataFrame:
    """Scale-measurement audio fixture (the video family's
    synthesize_diverse_video_payloads, for WAV): window samples come
    from md5 bytes, so every track is CONTENT-UNIQUE except a planted,
    bounded duplicate structure — the oracle fixture's 251-value
    offset space saturates past ~10^3 tracks (every new track lands in
    an existing window-offset class, pair OUTPUT grows quadratically,
    and a drift rung would time result materialization, not the
    pipeline).  Here ``copy = doc_id // 100_000_000`` (the bench
    inflator's copy index) and ``pair_key`` twins each ``base%10 < 2``
    document with its neighbour INSIDE the same copy: duplicate
    classes have size exactly 2 regardless of corpus factor, so pair
    count — and the containment join's work — scales linearly.  The
    twin's window count still differs (``2 + base%3`` vs
    ``2 + (base+1)%3``), making each twin pair a genuine
    subset-containment, not a trivial equality.  One Arrow-batched
    ``mapInPandas``, zero shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    from excelstream_spark.operators.multimodal import encode_wav

    schema = "doc_id bigint, payload binary"
    ws = int(window_samples)
    n_blocks = (ws * 2 + 15) // 16  # md5 digests per int16 window

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                copy, base = divmod(d, 100_000_000)
                pair_key = (
                    f"t{base // 2}" if base % 10 < 2 else f"s{base}"
                )
                nw = 2 + base % 3
                samples: list[int] = []
                for w in range(nw):
                    raw = b"".join(
                        hashlib.md5(
                            f"{copy}:{pair_key}:{w}:{blk}".encode()
                        ).digest()
                        for blk in range(n_blocks)
                    )
                    samples.extend(
                        np.frombuffer(raw[: ws * 2], dtype="<i2")
                        .astype(np.int64)
                        .tolist()
                    )
                rows.append((d, encode_wav(8000, samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    # fan_out: see synthesize_audio_payloads
    return fan_out(docs.select("doc_id")).mapInPandas(gen, schema=schema)
