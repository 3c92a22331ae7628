"""Multimodal transforms: image thumbnail resize + audio frame-sampling.

The two media transforms a training-data pipeline runs at scale
(thumbnail an image column to a fixed model input size; decimate audio
to a fixed frame budget), implemented over the repo's from-spec stdlib
codecs — REAL decode -> numpy transform -> REAL re-encode, with the
reported statistics computed by RE-DECODING the produced payload, so
every row proves its output bytes are a valid media file:

* PNG  -> nearest-neighbor resize to (target_w, target_h) -> PNG
* JPEG -> baseline entropy decode -> same resize -> PNG (the classic
  thumbnail TRANSCODE: decode once, store the cheap format)
* WAV  -> keep every ``frame_step``-th frame -> WAV (same rate/bits)
* anything else -> passed through untouched, labeled ``other``

Nearest-neighbor uses the floor convention ``src = (dst * src_n) //
dst_n`` — exact integer arithmetic, so the synthetic-fixture oracle can
recompute every resized pixel (and therefore the mean) in SQL from
``doc_id`` alone, the same trick as ``multimodal_features``.

Batch shape: one Arrow-batched ``mapInPandas`` — embarrassingly
parallel, zero shuffle, linear scan work; media bytes never leave the
executor.  At 100 TB this is the exact plumbing a PIL/ffmpeg-backed
transform would use (swap the codec call, keep the schema/partitioning);
the stdlib codecs make the semantics testable in this container.

The reference engine (KSD-CO/excelstream) has no media surface; this
extends the multimodal family (`SURVEY.md` §6: decode/feature-extract
are rounds 4-6; resize/frame-sample complete the published list).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from excelstream_spark.operators.multimodal import (
    _JPEG_MAGIC,
    _PNG_MAGIC,
    encode_png,
    encode_wav,
    png_pixel_array,
    wav_pcm_array,
)

#: (doc_id, kind, out_payload, out stats).  ``out_mean_r`` is the
#: re-decoded payload's pixel mean (images, round 3) or mean |amplitude|
#: in [0, 1] (audio, round 6) — null for pass-through/corrupt rows.
TRANSFORM_SCHEMA = (
    "doc_id bigint, kind string, out_payload binary, "
    "out_w int, out_h int, out_frames int, out_mean_r double"
)


def _resize_nearest(arr, target_w: int, target_h: int):
    """Floor-convention nearest neighbor: ``src = (dst * src_n) //
    dst_n`` per axis — pure integer index math (SQL-replayable)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(target_h, dtype=np.int64) * h) // target_h
    cols = (np.arange(target_w, dtype=np.int64) * w) // target_w
    return arr[rows][:, cols]


def _transform_one(
    doc_id: int, payload: bytes, target_w: int, target_h: int, frame_step: int
):
    payload = bytes(payload)
    if payload[:8] == _PNG_MAGIC or payload[:3] == _JPEG_MAGIC:
        if payload[:8] == _PNG_MAGIC:
            kind = "png"
            arr = png_pixel_array(payload)
        else:
            from excelstream_spark.operators.jpeg_baseline import decode_jpeg

            kind = "jpeg"
            arr = decode_jpeg(payload)
        small = _resize_nearest(arr, target_w, target_h)
        out = encode_png(
            target_w, target_h, small.tobytes(), channels=small.shape[2]
        )
        # stats from the RE-DECODED output: the row proves its bytes
        redec = png_pixel_array(out)
        mean = round(float(redec.mean()), 3)
        return (doc_id, kind, out, target_w, target_h, 1, mean)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import numpy as np

        rate, frames, bits = wav_pcm_array(payload)
        kept = frames[::frame_step]
        out = encode_wav(
            rate, [int(v) for v in kept.reshape(-1)],
            channels=frames.shape[1], bits=bits,
        )
        _rate2, redec, bits2 = wav_pcm_array(out)
        arr = redec.astype(np.float64)
        if bits2 == 8:
            arr = arr - 128.0
        mean = round(
            float(np.abs(arr / float(2 ** (bits2 - 1))).mean()), 6
        ) if redec.size else None
        return (doc_id, "wav", out, None, None, int(redec.shape[0]), mean)
    return (doc_id, "other", payload, None, None, None, None)


def transform_media(
    multimodal: DataFrame,
    target_w: int = 2,
    target_h: int = 2,
    frame_step: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize/transcode images to (target_w, target_h) PNG thumbnails
    and decimate audio to every ``frame_step``-th frame; non-media
    payloads pass through labeled ``other``.  Corrupt media rows yield
    kind ``corrupt`` with the original payload (filterable, never
    task-killing — the multimodal.py convention)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "kind", "out_payload",
            "out_w", "out_h", "out_frames", "out_mean_r",
        ]
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append(
                        _transform_one(
                            int(doc_id), payload, target_w, target_h,
                            frame_step,
                        )
                    )
                except Exception:
                    rows.append(
                        (int(doc_id), "corrupt", bytes(payload),
                         None, None, None, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return multimodal.select(id_col, payload_col).mapInPandas(
        run, schema=TRANSFORM_SCHEMA
    )
