"""Int8 embedding quantization + quantized similarity scoring.

At 100 TB the dominant costs of dense retrieval are the shuffle/broadcast
BYTES of the embedding column and the matmul width.  Symmetric per-vector
int8 quantization (q = round(v * 127 / max|v|), one float32 scale per
vector) cuts both 4x vs float32 / 8x vs float64 with ~0.3% cosine error
at 64 dims — the standard first rung of the compression ladder (below it:
product quantization / OPQ, out of scope here).

Layout: the quantized vector is a BinaryType column (the int8 bytes), so
Spark shuffles/stores it as an opaque byte blob with no per-element
overhead; parquet dictionary/byte-stream-split encodings apply.

Scoring mirrors operators/vectorized.py: queries are dequantized to a
broadcast float matrix, the corpus streams through mapInPandas, each
batch does ONE int8->float32 view + BLAS matmul, and per-batch top-k
pruning keeps the shuffle at O(partitions x queries x k).  Exactness:
quantized cosine is approximate by construction; the recall@k guarantee
is covered by test (>= 0.9 @ k=5 on the synthetic embeddings, typically
1.0), and callers needing exact results re-rank the top-k' candidates
with operators/vectorized.topk_against_broadcast.

The reference (an I/O library, SURVEY.md §2.6) has no analogue; this is
part of the BASELINE.json training-pipeline extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from excelstream_spark.partitioning import fan_out


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """-> (id, qvec: binary int8, scale: float, qnorm: float).

    ``scale`` dequantizes (v ~= int8 * scale); ``qnorm`` is the true
    float L2 norm, carried so cosine needs no per-query renormalization
    of the quantized corpus."""
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("qvec", BinaryType()),
            StructField("scale", FloatType()),
            StructField("qnorm", FloatType()),
        ]
    )

    def quant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack([np.asarray(v, dtype=np.float32) for v in pdf["v_"]])
            # quantize in FLOAT64 with round-half-away-from-zero: float32
            # inputs are exact in float64, so the double-precision
            # quotient — and therefore every int8 code — is bit-identical
            # to SQL round(x / (max|v|/127)), making the quantization
            # oracle-checkable cross-engine (rint's half-to-even and a
            # float32 quotient would both diverge from SQL at boundaries).
            M64 = M.astype(np.float64)
            amax = np.abs(M64).max(axis=1)
            scale64 = np.where(amax == 0.0, 1.0, amax / 127.0)
            q64 = M64 / scale64[:, None]
            # half-away rounding via an EXACT fractional-part test:
            # abs(q) - floor(abs(q)) is exact in binary64, so comparing
            # it to 0.5 reproduces SQL round() bit-for-bit.  (floor(x +
            # 0.5) is NOT equivalent: at x = 0.49999999999999994 the
            # addition rounds up to 1.0 and over-rounds, diverging from
            # the oracle at the 0.5-minus-1-ulp boundary.)
            aq = np.abs(q64)
            fl = np.floor(aq)
            q = (np.sign(q64) * np.where(aq - fl >= 0.5, fl + 1.0, fl)).astype(
                np.int8
            )
            norms = np.linalg.norm(M, axis=1).astype(np.float32)
            yield pd.DataFrame(
                {
                    "id": pdf["id_"].to_numpy(),
                    "qvec": [row.tobytes() for row in q],
                    "scale": scale64.astype(np.float32),
                    "qnorm": norms,
                }
            )

    prepared = df.select(F.col(id_col).alias("id_"), F.col(vec_col).alias("v_"))
    return prepared.mapInPandas(quant, out_schema)


def dequantize_expr(qvec_col: str = "qvec", scale_col: str = "scale"):
    """Column expression rebuilding array<float> from the int8 blob —
    JVM-side (no Python), for consumers that need the vector back.
    Byte extraction goes through hex() so values >= 0x80 survive (a
    binary->string cast would apply UTF-8 and corrupt them).  Assumes
    non-empty vectors."""
    hexed = F.hex(F.col(qvec_col))
    return F.transform(
        F.sequence(F.lit(0), F.octet_length(F.col(qvec_col)) - 1),
        lambda i: (
            (lambda u: F.when(u > 127, u - 256).otherwise(u))(
                F.conv(hexed.substr(i * 2 + 1, F.lit(2)), 16, 10).cast("int")
            )
            * F.col(scale_col)
        ).cast("float"),
    )


def topk_quantized(
    corpus_q: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine of float ``queries`` against an int8-quantized corpus
    (output of quantize_embeddings).  Same two-level top-k shape as
    vectorized.topk_against_broadcast; scores are approximate cosine.

    Returns (query_id, neighbor_id, rank, cos_sim).
    """
    spark = corpus_q.sparkSession
    qpdf = queries.select(id_col, vec_col).toPandas()
    out_schema = StructType(
        [
            StructField("query_id", queries.schema[id_col].dataType),
            StructField("neighbor_id", corpus_q.schema["id"].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )
    if len(qpdf) == 0:
        return spark.createDataFrame(
            [],
            StructType(out_schema.fields + [StructField("rank", IntegerType())]),
        ).select("query_id", "neighbor_id", "rank", "cos_sim")
    Q = np.stack([np.asarray(v, dtype=np.float32) for v in qpdf[vec_col]])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    bc = spark.sparkContext.broadcast(
        (qpdf[id_col].to_numpy(), (Q / qn[:, None]).T.astype(np.float32))
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, QnT = bc.value
        dim = QnT.shape[0]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.frombuffer(b"".join(pdf["qvec"]), dtype=np.int8)
            C = raw.reshape(len(pdf), dim).astype(np.float32)
            C *= pdf["scale"].to_numpy()[:, None]  # dequantize in-register
            norms = pdf["qnorm"].to_numpy().astype(np.float32)
            norms = np.where(norms == 0.0, 1.0, norms)
            c_ids = pdf["id"].to_numpy()
            S = (C / norms[:, None]) @ QnT  # b x q, float32 BLAS
            if exclude_self:
                S[c_ids[:, None] == qids[None, :]] = -np.inf
            kk = min(k, S.shape[0])
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                col = S[:, j]
                if S.shape[0] > kk:
                    part = np.argpartition(-col, kk - 1)[:kk]
                    cand = np.nonzero(col >= col[part].min())[0]
                else:
                    cand = np.arange(S.shape[0])
                order = cand[np.lexsort((c_ids[cand], -col[cand]))][:kk]
                order = order[col[order] > -np.inf]
                out_q.append(np.full(len(order), qids[j]))
                out_n.append(c_ids[order])
                out_s.append(col[order].astype(np.float64))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    local = fan_out(corpus_q.select("id", "qvec", "scale", "qnorm")).mapInPandas(
        score, out_schema
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
