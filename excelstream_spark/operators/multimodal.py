"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata structs, processed with Arrow-batched
``mapInPandas`` UDFs.

``_decode_payload`` dispatches on the payload's magic bytes:

* PNG — decoded FOR REAL with the stdlib only (chunk walk, zlib inflate,
  scanline unfilter incl. Sub/Up/Average/Paeth): width/height/channels
  plus per-channel pixel means as real feature columns.
* JPEG — PIL when importable (public package, optional); otherwise the
  SOF marker scan yields real width/height/channels and the pixel stats
  stay honestly null (pure-Python JPEG entropy decode is not reasonable).
* WAV — decoded FOR REAL with the stdlib only (RIFF chunk walk): sample
  rate, channel count, frame count, and per-channel mean |amplitude| in
  [0, 1] for 8/16/32-bit PCM; header-only (null means) for compressed
  formats the stdlib can't decode.
* anything else — the DETERMINISTIC FAKE decoder (pseudo-dimensions from
  byte length, no randomness) so the Spark-side plumbing stays
  oracle-checkable on text-derived fixtures.

The ``decoder`` output column says which path produced each row — no
silent degradation.

Batch shape: mapInPandas receives an iterator of pandas DataFrames sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k default) — media
work should resize that down (e.g. 256) so a batch of decoded frames fits
executor memory; set via the session builder when using real decoders.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the feature output — documented contract for downstream ops.
#: width/height/n_frames are the oracled core; channels/channel_means/
#: decoder are decode-derived extras (null where the codec can't supply
#: them) and live OUTSIDE the driver entry's oracled projection.
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_len int, content_md5 string, "
    "width int, height int, n_frames int, channels int, "
    "channel_means array<double>, sample_rate int, decoder string"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"
#: PNG color_type -> samples per pixel (3 = palette: 1 index sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG SOF markers that carry frame dimensions (C4/C8/CC are not SOFs)
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9): each scanline is one
    filter-type byte + ``stride`` filtered bytes; Sub/Average/Paeth
    recurrences run left-to-right against already-reconstructed bytes."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        ro = y * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for i in range(stride):
                    row[i] = (row[i] + out[ro - stride + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = out[ro - stride + i] if y else 0
                row[i] = (row[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = out[ro - stride + i] if y else 0
                c = out[ro - stride + i - bpp] if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[ro : ro + stride] = row
    return out


def _decode_png(payload: bytes) -> dict:
    """Stdlib-only PNG decode: real width/height/channels always; full
    pixel reconstruction + per-channel means for the baseline formats
    (8-bit gray/RGB/gray-alpha/RGBA, non-interlaced)."""
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    channels = _PNG_CHANNELS.get(color_type)
    info = {
        "width": int(width),
        "height": int(height),
        "n_frames": 1,
        "channels": channels,
        "channel_means": None,
        "decoder": "png-stdlib",
    }
    if bit_depth == 8 and interlace == 0 and color_type in (0, 2, 4, 6):
        import numpy as np

        stride = width * channels
        px = _png_unfilter(zlib.decompress(bytes(idat)), height, stride, channels)
        arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
            height, width, channels
        )
        info["channel_means"] = [
            round(float(m), 3) for m in arr.mean(axis=(0, 1))
        ]
    return info


def _decode_jpeg_header(payload: bytes) -> dict:
    """Marker scan for the SOF segment: real dimensions + component
    count, no entropy decode."""
    pos = 2
    n = len(payload)
    while pos + 10 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in _JPEG_SOF:
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            ncomp = payload[pos + 9]
            return {
                "width": int(w),
                "height": int(h),
                "n_frames": 1,
                "channels": int(ncomp),
                "channel_means": None,
                "decoder": "jpeg-header",
            }
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        pos += 2 + seglen
    raise ValueError("JPEG without SOF marker")


def _decode_jpeg_pil(payload: bytes) -> dict:
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return {
        "width": img.width,
        "height": img.height,
        "n_frames": int(getattr(img, "n_frames", 1)),
        "channels": arr.shape[2],
        "channel_means": [round(float(m), 3) for m in arr.mean(axis=(0, 1))],
        "decoder": "pil",
    }


def _decode_wav(payload: bytes) -> dict:
    """Stdlib-only WAV decode: RIFF chunk walk for the ``fmt `` and
    ``data`` chunks.  PCM (format 1) at 8/16/32 bits gets real
    per-channel mean |amplitude| normalized to [0, 1]; anything else
    (float, ADPCM, mu-law) reports real rate/channels/frames with null
    means — header facts, honestly labeled ``wav-header``."""
    import numpy as np

    pos = 12  # past RIFF<size>WAVE
    n = len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunk")
    audio_format, channels, sample_rate, _brate, block_align, bits = fmt
    if not channels or not block_align:
        raise ValueError("WAV with zero channels/block_align")
    n_samples = len(data) // block_align
    info = {
        "width": None,
        "height": None,
        "n_frames": int(n_samples),
        "channels": int(channels),
        "channel_means": None,
        "sample_rate": int(sample_rate),
        "decoder": "wav-header",
    }
    pcm_dtypes = {8: np.uint8, 16: np.int16, 32: np.int32}
    if audio_format == 1 and bits in pcm_dtypes and n_samples:
        arr = np.frombuffer(
            data[: n_samples * block_align], dtype=pcm_dtypes[bits]
        ).reshape(n_samples, channels).astype(np.float64)
        if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            arr = arr - 128.0
        scale = float(2 ** (bits - 1))
        info["channel_means"] = [
            round(float(m), 6) for m in np.abs(arr / scale).mean(axis=0)
        ]
        info["decoder"] = "wav-stdlib"
    return info


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct.

    On a real corpus this column would come from ``format('binaryFile')``
    or a parquet table with a binary column; the downstream operators only
    see (payload: binary, meta: struct)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.octet_length(F.col(text_col)).alias("byte_len"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes) -> dict:
    """Magic-byte dispatch (see module docstring).  A corrupt image
    payload yields null dimensions with ``decoder='corrupt'`` rather
    than killing the task — at corpus scale a handful of truncated
    images is the norm, and the column makes them filterable."""
    payload = bytes(payload)
    if payload[:8] == _PNG_MAGIC:
        try:
            return _decode_png(payload)
        except Exception:
            return {
                "width": None,
                "height": None,
                "n_frames": 0,
                "channels": None,
                "channel_means": None,
                "decoder": "corrupt",
            }
    if payload[:3] == _JPEG_MAGIC:
        try:
            try:
                return _decode_jpeg_pil(payload)
            except ImportError:  # PIL absent in this container — honest
                return _decode_jpeg_header(payload)
        except Exception:
            return {
                "width": None,
                "height": None,
                "n_frames": 0,
                "channels": None,
                "channel_means": None,
                "decoder": "corrupt",
            }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return _decode_wav(payload)
        except Exception:
            return {
                "width": None,
                "height": None,
                "n_frames": 0,
                "channels": None,
                "channel_means": None,
                "decoder": "corrupt",
            }
    # deterministic fake for non-image payloads (the text-derived fixture
    # path): pseudo-dimensions from byte length only, NO randomness —
    # oracle-checkable downstream
    n = len(payload)
    return {
        "width": n % 640,
        "height": (n * 7) % 480,
        "n_frames": 1 + n % 8,
        "channels": None,
        "channel_means": None,
        "decoder": "fake",
    }


def extract_features(multimodal: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column to Python in columnar batches; the UDF
    is pure per-row (embarrassingly parallel, no shuffle).
    """
    import hashlib

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": [m["content_type"] for m in pdf["meta"]],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "channel_means": [d["channel_means"] for d in decoded],
                    "sample_rate": [d.get("sample_rate") for d in decoded],
                    "decoder": [d["decoder"] for d in decoded],
                }
            )

    return multimodal.mapInPandas(features, schema=FEATURE_SCHEMA)


def sample_frames(
    multimodal: DataFrame | None = None,
    every_n: int = 2,
    features: DataFrame | None = None,
) -> DataFrame:
    """Frame-sampling plumbing: explode per-payload frame indices, keep
    every ``every_n``-th.  Frame *extraction* is the stubbed decode; the
    sampled (doc_id, frame_idx) plan is the real Spark shape (explode →
    downstream per-frame UDFs).  Pass ``features`` (an
    ``extract_features`` output) to reuse an already-built feature plan
    instead of decoding the payloads a second time."""
    if features is None:
        if multimodal is None:
            raise ValueError("sample_frames needs multimodal or features")
        features = extract_features(multimodal)
    return features.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter((F.col("frame_idx") % every_n) == 0)
