"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata structs, processed with Arrow-batched
``mapInPandas`` UDFs.

The decode step is the only part that needs media libraries (PIL /
libsndfile / ffmpeg — not present in this container); it is isolated
behind ``_decode_payload`` which falls back to a DETERMINISTIC FAKE
decoder so the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is fully real and testable.  Swap ``_decode_payload`` for a
real decoder and nothing else changes.

Batch shape: mapInPandas receives an iterator of pandas DataFrames sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k default) — media
work should resize that down (e.g. 256) so a batch of decoded frames fits
executor memory; set via the session builder when using real decoders.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the feature output — documented contract for downstream ops.
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_len int, content_md5 string, "
    "width int, height int, n_frames int"
)


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
    """Decode stub.  A real implementation would be e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, "n_frames": 1}

    The deterministic fake derives pseudo-dimensions from the byte length
    only (NO randomness — oracle-checkable downstream).
    """
    try:
        import PIL.Image  # noqa: F401  (not in this container)

        raise NotImplementedError("real image decode not wired up yet")
    except ImportError:
        n = len(payload)
        return {"width": n % 640, "height": (n * 7) % 480, "n_frames": 1 + n % 8}


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
