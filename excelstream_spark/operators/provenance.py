"""Provenance (URL-level) exact dedup — the cheapest, highest-yield
dedup stage a web-corpus build runs FIRST (r12 verdict #5): C4 dedups
by URL before content (Raffel et al. 2020 §2.2 deduplicates pages;
CCNet groups by URL within snapshots) because canonical-URL equality
removes re-crawls and mirror fetches for the price of one hash, before
any shingle or fingerprint work is paid.

Canonicalization rules (small, published, SQL-replayable — each one
targets a real crawl-noise class):

1. drop the ``#fragment`` (client-side only — same resource);
2. strip the scheme (``http://`` vs ``https://`` re-crawls);
3. lowercase the HOST and strip a leading ``www.`` (hostnames are
   case-insensitive; path case is PRESERVED — paths are not);
4. strip one trailing ``/`` from the path (``/a/`` vs ``/a``);
5. drop ``utm_*`` tracking parameters and SORT the surviving query
   string (parameter order is not semantic; ``?a=1&b=2`` ==
   ``?b=2&a=1``, but a REAL parameter difference keeps both — the
   over-merge falsifier).

Everything is pure JVM column expressions (regexp/split/array ops —
whole-stage codegen scan work, zero Python), and the close is one
``groupBy(canonical)`` with map-side partial aggregation + a join
back — deliberately NOT a window: at corpus scale a hot URL (a
boilerplate landing page fetched 10^6 times) would serialize one
window partition, while partial aggregation reduces it map-side and
the join moves one row per distinct URL.

The reference engine (KSD-CO/excelstream) has no dedup surface; this
extends the LLM-pipeline family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module's five rules — one
    nested JVM expression, no UDF."""
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    parts = F.split(u, r"\?", 2)
    hostpath = parts.getItem(0)
    q = F.when(F.size(parts) > 1, parts.getItem(1)).otherwise(F.lit(""))
    host = F.substring_index(hostpath, "/", 1)
    rest = hostpath.substr(
        F.length(host) + 1, F.length(hostpath) - F.length(host)
    )
    rest = F.regexp_replace(rest, r"/$", "")
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        host, rest, F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    )


def url_canonical_key(url: Column) -> Column:
    """60-bit md5 of the canonical URL — the house ``_h60`` convention
    (``('0x' || substr(md5(u), 1, 15))::BIGINT`` replays in DuckDB)."""
    return F.conv(
        F.substring(F.md5(canonicalize_url(url)), 1, 15), 16, 10
    ).cast("long")


def dedup_url_canonical(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document URL-dedup decisions: ``(id, url_canon, canon_key,
    keeper, n_same, kept)`` — ``keeper`` is the min-id document of the
    canonical-URL group, ``n_same`` the group size, ``kept`` whether
    this row IS the keeper.  Grouping compares the canonical STRING
    (exact; ``canon_key`` is the reported fixed-width key, the hash
    never decides).  Null ids are dropped (no provenance row to
    keep)."""
    base = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        canonicalize_url(F.col(url_col)).alias("url_canon"),
    )
    groups = base.groupBy("url_canon").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).cast("long").alias("n_same"),
    )
    return (
        base.join(groups, "url_canon")
        .select(
            "doc_id",
            "url_canon",
            F.conv(F.substring(F.md5("url_canon"), 1, 15), 16, 10)
            .cast("long")
            .alias("canon_key"),
            "keeper",
            "n_same",
            (F.col("doc_id") == F.col("keeper")).alias("kept"),
        )
    )
