"""Document chunking: split long documents into overlapping token
windows — the standard preprocessing step between cleaning and sequence
packing in an LLM training pipeline (a document longer than the model
context must become several training samples, with ``overlap`` tokens of
carried context so no boundary sentence is ever seen torn in half by
every epoch).

Execution shape: one pass, zero shuffles, pure codegen'd expressions —
tokens materialize once per row, chunk starts come from an integer
``sequence``, each chunk is a clamped ``slice`` + ``concat_ws``.  The
explode multiplies rows but never crosses partitions, so the operator
scales embarrassingly: 100 TB of documents chunk at scan speed.

All arithmetic is integer (ceil-division via ``(n + d - 1) div d``) so a
SQL oracle reproduces chunk boundaries exactly; tokenization is the
shared ``functions/text.tokens`` definition the other text operators
use.

The reference (an I/O library, SURVEY.md §2.6) has no analogue; this is
part of the BASELINE.json training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """-> (doc_id, chunk_idx, chunk_text, n_tokens).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; the final chunk clamps at the end
    of the document.  Every document yields >= 1 chunk (short docs pass
    through whole), and every token belongs to at least one chunk.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got overlap={overlap}, "
            f"max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    # NULL text tokenizes to a null array, which would otherwise produce
    # a phantom full-size chunk (least(max_tokens, null) = max_tokens);
    # treat it as empty text: one empty chunk, n_tokens counts the one
    # empty token exactly like every other text operator's tokenizer
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        TXT.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tk"),
    )
    n = F.size("tk")
    # ceil((n - overlap) / stride) in exact integer arithmetic; >= 1
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(f"(size(tk) - {overlap} + {stride} - 1) div {stride}").cast("int"),
    )
    chunk = lambda i: F.struct(  # noqa: E731
        i.cast("int").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice(F.col("tk"), i * stride + 1, max_tokens)
        ).alias("chunk_text"),
        F.least(F.lit(max_tokens), n - i * stride).cast("int").alias("n_tokens"),
    )
    return (
        toks.select(
            "doc_id",
            F.explode(F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk)).alias(
                "c"
            ),
        )
        .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )
