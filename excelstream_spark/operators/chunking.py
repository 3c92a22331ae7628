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
from excelstream_spark.partitioning import fan_out


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
    # treat it as empty text: one empty chunk with n_tokens = 0 (the
    # shared tokenizer yields [] for empty/whitespace-only text).
    # fan_out (r14): the tokenize+chunk-build is per-row-expensive and
    # a small parquet input arrives as one split (the shingle_rows
    # precedent); no-op at scale, batch-only consumers.
    toks = fan_out(df).select(
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


def chunk_documents_cdc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_tokens: int = 16,
    max_tokens: int | None = None,
) -> DataFrame:
    """-> (doc_id, chunk_idx, chunk_text, n_tokens) with CONTENT-DEFINED
    boundaries: a chunk ENDS at every token whose md5-derived hash is
    ``0 (mod avg_tokens)`` — so boundary positions are a function of the
    token stream itself, not of token offsets.  The same passage
    embedded at ANY offset in two documents produces identical interior
    chunks (the property :func:`~excelstream_spark.operators.dedup.
    dedup_token_chunks_cdc` needs for offset-invariant substring dedup;
    a fixed grid only matches offsets congruent mod the block size).
    Chunk lengths are geometric with mean ``avg_tokens``, HARD-CAPPED at
    ``max_tokens`` (default ``8 * avg_tokens``): a FORCED boundary fires
    every ``max_tokens`` tokens past the last content boundary, so a
    pathological boundary-free document can never push a doc-sized
    struct through the assembly shuffle (the round-6 verdict's
    worst-case-row-size item).  Forced boundaries are anchored to the
    previous CONTENT boundary (``(pos - last_content_bnd) %
    max_tokens == 0``), not to absolute positions — two documents
    sharing a passage keep identical interior chunks as long as the
    passage's preceding content boundary is shared, so offset
    invariance degrades ONLY inside boundary-free stretches longer
    than the cap (exactly the pathological regime), never near
    ordinary chunks.  The rule is exact integer arithmetic over the
    same per-doc window (one extra running ``max``, no extra shuffle)
    and DuckDB replays it bit-identically.

    The boundary hash is md5-derived (first 8 hex chars as bigint, the
    curation.py convention) rather than xxhash64 so DuckDB replays
    boundaries bit-identically: ``('0x' || substr(md5(tok), 1, 8))::
    bigint % avg_tokens = 0``.

    Execution shape: tokenization + boundary flags are scan-stage; the
    exclusive prefix sum that numbers chunks is one window partitioned
    by document (shuffle #1, the price of per-token running state), and
    chunk assembly is a groupBy(doc, chunk) whose partial aggregation
    combines map-side (shuffle #2 moves chunk-sized structs).  Heavier
    than the zero-shuffle fixed grid — and far lighter than the
    suffix-array build it approximates.  Skew bound: a document's
    tokens land in one partition, so the per-partition bound is the
    longest document, same as every per-doc window here."""
    if avg_tokens < 2:
        raise ValueError(f"need avg_tokens >= 2, got {avg_tokens}")
    if max_tokens is None:
        max_tokens = 8 * avg_tokens
    if max_tokens < 2:
        raise ValueError(f"need max_tokens >= 2, got {max_tokens}")
    from pyspark.sql import Window

    # fan_out (r14): see chunk_documents — the token posexplode on a
    # one-split scan otherwise serializes (observed: 1-task 0.5s
    # stages in the CDC leg profile); no-op at scale
    toks = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
    bnd = (h % avg_tokens == 0).cast("int")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last CONTENT boundary strictly before this token (-1 = the virtual
    # boundary before token 0); a forced boundary fires every max_tokens
    # tokens past it — docstring's hard length cap, same window frame
    lbc = F.coalesce(
        F.max(F.when(bnd == 1, F.col("pos"))).over(w), F.lit(-1)
    )
    dist = F.col("pos") - lbc
    eff = (
        (bnd == 1) | ((dist % max_tokens == 0) & (dist > 0))
    ).cast("int")
    # materialize the effective-boundary flag before the prefix sum — a
    # window expression cannot nest inside another window's argument
    # (both windows share the partitioning: still ONE shuffle)
    with_idx = toks.withColumn("_eff", eff).withColumn(
        "chunk_idx",
        F.coalesce(F.sum("_eff").over(w), F.lit(0)).cast("int"),
    )
    return with_idx.groupBy("doc_id", "chunk_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text"),
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
    )
