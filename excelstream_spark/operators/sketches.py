"""KMV (k-minimum-values) cardinality sketch — deterministic distinct
counting for pipeline planning.

Estimating distinct cardinalities (vocabulary size, distinct shingles,
distinct fingerprints) is how a 100 TB pipeline SIZES itself before
running: shuffle partition counts, Bloom filter bits/key, LSH band
tables, dedup hot-key cut thresholds all start from an n_distinct
estimate.  Spark's built-in ``approx_count_distinct`` (HyperLogLog++)
answers the same question but its register layout is engine-internal —
it can never sit under a cross-engine hash gate.  KMV (Bar-Yossef et
al. 2002, "Counting distinct elements in a data stream") is the
deterministic alternative: hash every element, keep the k smallest
hash values, estimate

    n_distinct ~= (k - 1) * H / h_k

where ``h_k`` is the k-th smallest hash and ``H`` the hash space size.
With md5-derived 60-bit hashes the k smallest values — and therefore
the ESTIMATE ITSELF — are bit-identical in Spark, DuckDB and Python:
the sketch is exact-replayable, so the driver hash gate covers it
(relative error ~ 1/sqrt(k-2), k=256 -> ~6%).

100 TB design:
- The hash is a scan-stage expression; the k-smallest selection is a
  TakeOrderedAndProject (per-partition heaps of k, one k-row merge at
  the driver-side task — k is 256, not a funnel).
- The grouped form's per-group exchange is BOUNDED by Catalyst's
  rank-limit pushdown (r8, r7 verdict #4: the r7 docstring claimed
  "Spark's window shuffles all distinct hashes per group" — reading
  the executed plan shows that is false on Spark 3.5+/4.x): the
  ``row_number() <= k`` filter over the window turns into
  ``WindowGroupLimit(grp, row_number, k, Partial)`` BEFORE the
  exchange — each map task keeps only its k smallest hashes per
  group, so a hot group moves <= k * n_partitions rows, with the
  Final WindowGroupLimit re-cutting after the exchange.  Exactly the
  per-partition-heap pre-cut one would hand-build; plan-asserted in
  tests/test_sketches.py so an optimizer/config regression (the rule
  is ``spark.sql.optimizer.windowGroupLimitThreshold``) cannot
  silently reopen the funnel.  A hand-salted pre-cut window was
  prototyped and REJECTED: it re-bounds the same exchange at the cost
  of one extra full-volume shuffle of the distinct hashes.  The
  sketch TABLE (group, k hashes) is the mergeable artifact: union two
  corpora's sketches, re-rank, re-cut — the classic
  distributed-sketch merge.
- Store the k hash values themselves (``kmv_sketch``) as the reusable
  artifact; the estimate is one arithmetic expression over the stored
  row (the incremental fingerprint-table convention).

The reference engine (KSD-CO/excelstream) has no sketch surface; this
extends the approximate-query family alongside the Bloom membership
filter (`operators/bloom.py` — membership; this module — cardinality
and set overlap via KMV, heavy hitters via Misra-Gries + exact
recount, and point frequency via Count-Min, all deterministic and
hash-gateable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 60-bit hash space (15 hex chars of md5 — the repo's bigint-safe
#: hash-prefix convention, bloom.py / selection.py).
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)

DEFAULT_K = 256


def _h60(col: Column) -> Column:
    """60-bit md5 hash (DuckDB replay:
    ``('0x' || substr(md5(x), 1, 15))::bigint``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _kmv_est(n_col: Column, hk_col: Column, k: int) -> Column:
    """The KMV estimator expression over (count, k-th-min hash): exact
    below k, (k-1)*H/h_k floored otherwise — ONE definition shared by
    kmv_estimate, kmv_distinct_tokens_by_group and kmv_jaccard so the
    arithmetic (and its DuckDB replays) can never drift apart."""
    return F.when(n_col < F.lit(k), n_col.cast("double")).otherwise(
        F.floor(
            F.lit((k - 1) * HASH_SPACE) / hk_col.cast("double")
        ).cast("double")
    )


def kmv_sketch(
    df: DataFrame, expr: Column, k: int = DEFAULT_K
) -> DataFrame:
    """(rank, h) — the ``k`` smallest distinct 60-bit hashes of
    ``expr`` (rank 1 = smallest).  THE stored artifact: mergeable by
    union + re-rank + cut, and the estimate is one expression over it.
    NULL elements are skipped (they are not set members)."""
    hashes = (
        df.select(_h60(expr).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    w = Window.orderBy("h")
    return hashes.select(F.row_number().over(w).alias("rank"), "h")


def kmv_estimate(sketch: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """(n_seen, est) from a :func:`kmv_sketch` artifact: if the sketch
    holds fewer than ``k`` hashes the count is EXACT (every distinct
    element is in it); otherwise the KMV estimator over the k-th
    minimum, floored to an integer on both engines."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_hk"),
    )
    est = _kmv_est(F.col("n_seen"), F.col("_hk"), k)
    return agg.select(
        F.col("n_seen").cast("long").alias("n_seen"), est.alias("est")
    )


def kmv_distinct_tokens_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """(group, n_seen, est_distinct_tokens) — per-group distinct-token
    cardinality via one grouped KMV pass: explode the shared tokens(),
    hash, distinct, per-group rank, cut at ``k``, estimate.  The
    vocabulary-sizing primitive per language/source/domain.

    Shuffle bound (module docstring; r7 verdict #4): the
    ``row_number() <= k`` pattern compiles to a Partial
    ``WindowGroupLimit`` ahead of the exchange, so each map task ships
    at most k hashes per group — the hot-group funnel the r7
    docstring worried about does not exist, and the plan shape is
    pinned by tests/test_sketches.py."""
    from excelstream_spark.functions import text as TXT

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok"),
    )
    hashed = toks.select("grp", _h60(F.col("tok")).alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_hk"),
    )
    est = _kmv_est(F.col("n_seen"), F.col("_hk"), k)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_seen").cast("long").alias("n_seen"),
        est.alias("est_distinct_tokens"),
    )


# -- deterministic heavy hitters (Misra-Gries candidates + exact recount) ---

def frequent_tokens_exact(
    df: DataFrame,
    text_col: str = "text",
    support: tuple[int, int] = (1, 1000),
) -> DataFrame:
    """(tok, cnt) — every token whose corpus frequency strictly exceeds
    ``support[0]/support[1]`` of all token occurrences.  The threshold
    compare is integer cross-multiplication (``cnt * den > N * num``),
    so the row set is engine-exact and the DuckDB replay hash-matches.
    One groupBy(tok) — correct at any scale, but the full distinct
    vocabulary flows through the exchange; :func:`frequent_tokens_mg`
    is the bounded-memory scale path with IDENTICAL output."""
    from excelstream_spark.functions import text as TXT

    num, den = support
    toks = df.select(
        F.explode(
            TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))  # 1-row scalar
        .where(F.col("cnt") * F.lit(den) > F.col("_n") * F.lit(num))
        .select("tok", "cnt")
    )


def frequent_tokens_mg(
    df: DataFrame,
    text_col: str = "text",
    support: tuple[int, int] = (1, 1000),
    capacity: int | None = None,
) -> DataFrame:
    """(tok, cnt) — the SAME rows as :func:`frequent_tokens_exact`,
    computed the 100 TB way: per-partition Misra-Gries summaries
    (Misra & Gries 1982 — bounded memory, one Arrow pass) propose a
    candidate set, then ONE exact recount of the candidates closes.

    Why the output is deterministic (and therefore hash-gateable) even
    though each partition's SKETCH depends on row order: Misra-Gries
    with capacity ``m`` retains every item whose local count exceeds
    n_p/(m+1); any token with GLOBAL count > N/(m+1) must exceed that
    local bound in at least one partition (averaging), so with
    ``m >= den/num`` the merged candidate set is a SUPERSET of the true
    heavy hitters regardless of partitioning — and the exact recount +
    threshold then erases every trace of sketch nondeterminism.
    Default capacity = ``4 * den // num`` (4x the guarantee, tiny).
    A caller-supplied ``capacity`` is CLAMPED up to ceil(den/num) —
    below that bound the superset argument fails and a heavy hitter
    could silently evict (an undetectable false negative), so the
    guarantee floor is not negotiable (r8 advice #1).

    Shuffle budget: the candidate union moves <= capacity rows per
    partition; the recount joins the exploded tokens against the
    BROADCAST candidate set before its groupBy, so only candidate
    occurrences shuffle — the hot-key discovery primitive that sizes
    ``max_shingle_df`` / salting decisions without paying a full
    vocabulary exchange."""
    import pandas as pd

    from excelstream_spark.functions import text as TXT

    num, den = support
    guarantee = -(-den // max(num, 1))  # ceil(den/num): superset floor
    if capacity is not None:
        m = max(capacity, guarantee)
    else:
        m = max(4 * den // max(num, 1), 8)
    toks = df.select(
        TXT.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_tk")
    )

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for arr in pdf["_tk"]:
                for tok in arr:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < m:
                        counters[tok] = 1
                    else:
                        # the classic decrement-all step
                        for t in list(counters):
                            counters[t] -= 1
                            if counters[t] == 0:
                                del counters[t]
        yield pd.DataFrame({"tok": list(counters.keys())})

    candidates = (
        toks.mapInPandas(mg, schema="tok string").distinct()
    )
    exploded = df.select(
        F.explode(
            TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok")
    )
    total = exploded.agg(F.count(F.lit(1)).alias("_n"))
    recount = (
        exploded.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(den) > F.col("_n") * F.lit(num))
        .select("tok", "cnt")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# ---------------------------------------------------------------------------
#
# The fourth sketch in the family: membership (bloom.py), cardinality
# (kmv_sketch), heavy hitters (frequent_tokens_mg), and now FREQUENCY —
# "about how often does THIS key occur" for keys that are not heavy
# enough for MG to retain, without a full-vocabulary groupBy.  The
# 100 TB uses are the same sizing decisions the other sketches feed:
# per-key shuffle-cost prediction (salt or not), posting-list length
# estimates before building a BM25/winnowing index, and join-key skew
# triage on keys discovered after the MG pass.
#
# Determinism (the family's hash-gate requirement): every counter is an
# EXACT integer sum over deterministic md5-derived cells — unlike a
# sampled or timing-dependent sketch there is no run-to-run variance,
# so sketch AND estimates replay bit-for-bit in DuckDB.  The classic
# "conservative update" variant is deliberately NOT offered: its
# counter values depend on row visit order, which breaks both the
# distributed merge (sketches of shards must sum) and the hash gate.
#
# 100 TB design: the build is one groupBy((row, col)) whose map-side
# partial aggregation bounds every task's output at depth*width rows —
# the exchange moves <= depth*width rows PER PARTITION no matter how
# many tokens flow in, and the stored artifact is <= depth*width rows
# total (kilobytes).  Shard sketches merge by summing cells (the KMV
# union + re-cut convention, with + instead of min-k).  Estimates
# broadcast the SKETCH (not the queries), left-join each query's depth
# cells and take the min — absent cells coalesce to 0, preserving the
# "estimate >= true count" one-sided guarantee.

CM_DEFAULT_DEPTH = 4
CM_DEFAULT_WIDTH = 1024


def _cm_cell(expr: Column, row: int, width: int) -> Column:
    """The row-``row`` counter column of ``expr``: 60-bit md5 of
    ``"{row}:" || expr`` mod ``width`` (DuckDB replay:
    ``('0x' || substr(md5(row || ':' || x), 1, 15))::BIGINT % width``)."""
    return _h60(F.concat(F.lit(f"{row}:"), expr)) % F.lit(width)


def cm_sketch(
    df: DataFrame,
    expr: Column,
    depth: int = CM_DEFAULT_DEPTH,
    width: int = CM_DEFAULT_WIDTH,
) -> DataFrame:
    """(row, col, cnt) — the Count-Min counter table of ``expr``'s
    occurrences (NULLs skipped): ``cnt`` = exact number of occurrences
    hashing to cell ``(row, col)``.  <= depth*width rows — THE stored
    artifact; merge shard sketches by summing cnt per cell.  Estimate
    error: est - true <= e/width * N with prob >= 1 - e^-depth per the
    classic bound (w = ceil(e/eps), d = ceil(ln 1/delta))."""
    el = df.select(expr.alias("x")).where(F.col("x").isNotNull())
    cells = el.select(
        F.posexplode(
            F.array(*[_cm_cell(F.col("x"), j, width) for j in range(depth)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cm_sketch_tokens(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CM_DEFAULT_DEPTH,
    width: int = CM_DEFAULT_WIDTH,
) -> DataFrame:
    """Token-frequency Count-Min over a corpus (the repo tokenization
    convention — TXT.tokens, empty edge tokens dropped)."""
    from excelstream_spark.functions import text as TXT

    toks = df.select(
        F.explode(
            TXT.tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok")
    )
    return cm_sketch(toks, F.col("tok"), depth=depth, width=width)


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    query_col: str = "q",
    depth: int = CM_DEFAULT_DEPTH,
    width: int = CM_DEFAULT_WIDTH,
) -> DataFrame:
    """(q, est) — the Count-Min point estimate (min over the depth
    counters) for every DISTINCT query key.  ``depth``/``width`` must
    match the build (carried by the caller like bloom sizing —
    mismatched sizing probes random cells).  An absent cell means no
    occurrence hashed there: it counts as 0, keeping the one-sided
    ``est >= true`` guarantee intact (an inner join would silently take
    the min over fewer cells and could still overestimate a key whose
    other cells are hot).

    Plan: the queries explode to depth rows each and LEFT-join the
    BROADCAST sketch (<= depth*width rows) — no shuffle of the sketch,
    one groupBy over depth rows per query."""
    qcells = (
        queries.select(F.col(query_col).alias("q"))
        .where(F.col("q").isNotNull())
        .distinct()
        .select(
            "q",
            F.posexplode(
                F.array(
                    *[_cm_cell(F.col("q"), j, width) for j in range(depth)]
                )
            ).alias("row", "col"),
        )
    )
    return (
        qcells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("q")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def kmv_jaccard(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """(n_union_seen, jaccard_est, union_est, inter_est) — KMV set-
    operation estimates from two stored :func:`kmv_sketch` artifacts
    (Beyer et al. 2007, "On synopses for distinct-value estimation
    under multiset operations"): take the k smallest hashes of the
    sketch UNION, count how many of those sit in BOTH sketches —
    that fraction estimates the Jaccard similarity, and
    ``inter_est = jaccard_est * union_est`` the intersection
    cardinality.  Deterministic given the md5 hashes (the family's
    hash-gate convention); with fewer than k union hashes every
    estimate is EXACT (both sketches hold their full sets).

    Sizing contract (the cm_estimate depth/width convention): ``k``
    must equal the BUILD-TIME k of BOTH sketches.  A ``k`` larger
    than the build's makes ``n_union_seen`` fall below k and the
    exact-below-k branch silently treats TRUNCATED sketches as
    complete sets (underestimating union and overlap); a ``k``
    smaller than the build's cuts the union deeper than either side
    was cut, which biases ``jaccard_est``.  The contract cannot be
    derived from the artifact itself — a sketch of a small set
    legitimately holds fewer than k rows (``max(rank) < k``), which
    is indistinguishable from a truncated larger-k build — so it is
    the caller's, exactly like cm_estimate's "depth/width must match
    the build".  Two EMPTY sketches are well-defined: every estimate
    is 0.0 (``jaccard_est`` is 0 by convention — no evidence of
    overlap — rather than a 0/0 null row).

    The 100 TB use this exists for: cheap CONTAMINATION TRIAGE —
    estimate the distinct-shingle overlap between a training corpus
    and each benchmark suite from kilobyte sketches BEFORE deciding
    where to spend a full decontaminate() pass (whose cost is a scan
    + broadcast join per suite).  Sketch once per corpus/suite, then
    every pairwise overlap is driver-side arithmetic over <= 2k rows.

    Plan cost: both sketches are <= k rows — unions, windows and
    joins here are kilobyte-scale regardless of corpus size.  Each
    input feeds TWO plan subtrees (the union k-cut and the membership
    join), so both are scope-persisted: an inline-composed sketch
    (kmv_sketch over a fresh corpus scan) would otherwise execute its
    whole upstream pipeline twice per side."""
    from excelstream_spark.operators.dedup import _scoped_persist

    a = _scoped_persist(
        sketch_a.select(F.col("h").alias("h"), F.lit(1).alias("_a"))
    )
    b = _scoped_persist(
        sketch_b.select(F.col("h").alias("h"), F.lit(1).alias("_b"))
    )
    u = (
        a.select("h")
        .unionAll(b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    w = Window.orderBy("h")
    ranked = u.select(F.row_number().over(w).alias("rank"), "h")
    marked = (
        ranked.join(a.select("h", "_a").distinct(), "h", "left")
        .join(b.select("h", "_b").distinct(), "h", "left")
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("n_union_seen"),
        F.sum(
            F.when(
                F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1
            ).otherwise(0)
        ).alias("_n_both"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_hk"),
    )
    union_est = _kmv_est(F.col("n_union_seen"), F.col("_hk"), k)
    # empty-union guard: two empty sketches otherwise yield a 0/0
    # null row; 0.0 (no evidence of overlap) is the documented result
    jac = F.when(F.col("n_union_seen") == 0, F.lit(0.0)).otherwise(
        F.col("_n_both").cast("double")
        / F.col("n_union_seen").cast("double")
    )
    return agg.select(
        F.col("n_union_seen").cast("long").alias("n_union_seen"),
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("inter_est"),
    )
