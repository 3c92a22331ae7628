"""BM25 full-text retrieval (Robertson et al.; Lucene scoring form).

Top-k document retrieval for a set of query strings — the data-ablation
/ decontamination-by-retrieval primitive (find the corpus documents
most similar to an eval prompt), and the classic inverted-index
workload re-expressed as DataFrame ops:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))      (Lucene; >= 0)
    score(q, d) = sum_{t in q} idf(t) * tf / (tf + k1*(1 - b + b*dl/avgdl))

with the standard k1 = 1.2, b = 0.75.  Repeated query terms count once
(the Lucene convention: the query is a term SET).

Engine-portability discipline (the classifier/LM convention): df / tf /
dl / N are exact integers; avgdl is one exact integer division; idf and
each term contribution are rounded to 9 decimals the moment libm
arithmetic produces them; per-(query, doc) totals are exact
DECIMAL(38,15) sums rounded to 6; the top-k tie-breaks on
(score_r DESC, doc_id ASC) over the already-rounded score, so rank
boundaries cannot move between engines.

100 TB design — the whole point is that the inverted index is implicit:
- The exploded (doc, token) stream inner-joins the BROADCAST query-term
  set FIRST, so only postings for query terms ever reach a shuffle
  (thousands of rows per term, not the corpus).  A dedicated postings
  table is what you'd persist for steady-state serving; for batch
  retrieval the scan-side filter is cheaper than maintaining one.
- df comes from the same pruned postings (count distinct docs per
  term), so no second corpus pass; N / dl / avgdl are column
  expressions + one scalar aggregate off the doc table itself.
- The per-term score table is ``n_query_terms`` rows — broadcast back
  onto the pruned postings; one groupBy(query, doc) closes the score
  and a per-query window takes the top k (k rows per query through the
  final exchange, never a global sort).

The reference engine (KSD-CO/excelstream) has no retrieval surface;
this extends the similarity family (`SURVEY.md` §6) from embedding ANN
to lexical search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT
from excelstream_spark.functions.text import tokens_py

K1 = 1.2
B = 0.75

_DEC = "decimal(38,15)"


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) — the persisted serving artifacts for
    steady-state retrieval: ``postings(tok, <id>, tf, dl)`` (one row
    per distinct doc-term, the classic inverted index in table form)
    and ``stats(n_docs, avgdl)`` (one row).  Store both like the
    incremental fingerprint tables (postings bucketed by ``tok`` makes
    the per-query semi-join exchange-free) and score any number of
    query batches without touching the corpus again."""
    base = docs.where(F.col(id_col).isNotNull())
    tkn = base.select(
        F.col(id_col),
        TXT.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tk"),
    )
    stats = tkn.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.coalesce(F.sum(F.size("tk")), F.lit(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    postings = (
        tkn.select(
            F.col(id_col),
            F.size("tk").alias("dl"),
            F.explode("tk").alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    return postings, stats


def bm25_topk_stored(
    postings: DataFrame,
    stats: DataFrame,
    queries: dict[str, str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k against PREBUILT :func:`build_postings` artifacts —
    the steady-state serving path: no corpus scan, no tokenize; the
    broadcast query-term set prunes the postings table, df/idf derive
    from the pruned rows, and the close is identical to
    :func:`bm25_topk` (bit-equal output by construction — proven in
    tests/test_retrieval.py)."""
    spark = postings.sparkSession
    qterms = [
        (qid, tok)
        for qid, qtext in sorted(queries.items())
        for tok in sorted(set(tokens_py(qtext)))
    ]
    qt = spark.createDataFrame(
        qterms or [("", "")], "query_id string, tok string"
    )
    if not qterms:
        qt = qt.limit(0)
    hits = postings.join(F.broadcast(qt.select("tok").distinct()), "tok")
    return _bm25_close(hits, stats, qt, k, id_col)


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, score_r, rank) — the ``k`` highest-BM25
    documents per query (rank 1 = best; ties broken by ascending doc
    id on the 6-rounded score).  Documents matching no query term
    score 0 and are never returned; queries whose terms miss the whole
    corpus return no rows.

    ``queries`` maps query_id -> query string; it is driver-side by
    definition (a handful of literals) and becomes a broadcast term
    set.  Token-less and NULL-id documents are excluded from scoring
    but still count toward N and avgdl (they are corpus members)."""
    spark = docs.sparkSession
    base = docs.where(F.col(id_col).isNotNull())

    # query term SET (Lucene: repeated query terms count once);
    # tokenized with the SHARED convention (tokens_py mirrors the JVM
    # tokens() — Python str.split is unicode-aware and would diverge
    # from the corpus tokenization on e.g. non-breaking spaces)
    qterms = [
        (qid, tok)
        for qid, qtext in sorted(queries.items())
        for tok in sorted(set(tokens_py(qtext)))
    ]
    qt = spark.createDataFrame(qterms or [("", "")], "query_id string, tok string")
    if not qterms:
        qt = qt.limit(0)

    tkn = base.select(
        F.col(id_col),
        TXT.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tk"),
    )
    # N and avgdl over ALL corpus members (token-less docs included):
    # exact integer sum / exact count -> one IEEE division.
    stats = tkn.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.coalesce(F.sum(F.size("tk")), F.lit(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )

    # postings pruned at the scan: explode then broadcast-join the term
    # set — only query-term occurrences survive into the groupBy.
    hits = (
        tkn.select(F.col(id_col), F.size("tk").alias("dl"), F.explode("tk").alias("tok"))
        .join(F.broadcast(qt.select("tok").distinct()), "tok")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    return _bm25_close(hits, stats, qt, k, id_col)


def _bm25_close(
    hits: DataFrame,
    stats: DataFrame,
    qt: DataFrame,
    k: int,
    id_col: str,
) -> DataFrame:
    """Shared scoring tail over pruned postings ``hits(<id>, tok, tf,
    dl)``: df/idf from the pruned rows, the per-term contribution,
    one groupBy(query, doc), the per-query top-k window."""
    # df + idf per query term, from the pruned postings only
    idf = (
        hits.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                ),
                9,
            ).alias("idf"),
            F.col("avgdl"),
        )
    )

    contrib = (
        hits.join(F.broadcast(idf), "tok")
        .join(F.broadcast(qt), "tok")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                F.col("idf")
                * (
                    F.col("tf").cast("double")
                    / (
                        F.col("tf").cast("double")
                        + F.lit(K1)
                        * (
                            F.lit(1.0 - B)
                            + F.lit(B)
                            * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                ),
                9,
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum(F.col("c").cast(_DEC)).cast("double"), 6).alias("score_r")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_r"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score_r", "rank")
    )
