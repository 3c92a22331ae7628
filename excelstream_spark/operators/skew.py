"""Skew-mitigation operators.

Reference parity: no relational layer exists in the reference
(SURVEY.md §2.7); these are the 100 TB extension surface.

AQE's skew-join handling (on by default in our session) splits oversized
sort-merge partitions at runtime, but two cases still need explicit
salting at 100 TB:

* joins where the skewed side feeds a non-SMJ plan (e.g. after a custom
  partitioner, or stream-stream), and
* aggregations whose per-key state is itself huge (collect-like aggs),
  where map-side partial aggregation can't compress a hot key.

``salted_join`` replicates the SMALL side ``n_salts`` times and scatters
the big side's hot keys across ``(key, salt)`` buckets, so one hot key
occupies ``n_salts`` reducers instead of one.  Shuffle volume: big side
unchanged, small side x ``n_salts`` — the standard trade.

``salted_two_phase_agg`` splits a grouped aggregation into
``(key, salt)`` partial + ``key`` final — the manual form of partial
aggregation for aggregates Spark cannot partially evaluate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    ``salt_source`` picks which big-side expression spreads rows of the
    same key (default: a per-row deterministic hash of all columns via
    xxhash64, so the result is reproducible).  The small side is
    replicated ``n_salts`` times via an exploded sequence — keep it
    small-side-sized (that's the point: small x n_salts << big).

    Only big-side-preserving join types are allowed: with the small side
    replicated per salt, 'right'/'full' would surface every unmatched
    small-side row once per salt bucket (spurious null-extended
    duplicates).  Flip the operands (the salted side must be the big
    one) or pre-aggregate instead.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full would duplicate unmatched small-side rows per salt"
        )
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, tuple[str, str | None]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``(key, salt)`` then ``key``.

    ``agg_exprs``: output column -> (fn, input column), fn one of
    sum/count/min/max (the re-aggregable functions; count re-aggregates
    as sum; input column is ignored for count).  Hot keys are first
    reduced across ``n_salts`` buckets in parallel, then the n_salts
    partials collapse in a second, tiny shuffle.
    """
    remerge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn, _ in agg_exprs.values():
        if fn not in remerge:
            raise ValueError(f"{fn} is not re-aggregable (use sum/count/min/max)")
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(F.lit(1) if fn == "count" else in_col).alias(out)
            for out, (fn, in_col) in agg_exprs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            getattr(F, remerge[fn])(out).alias(out)
            for out, (fn, _) in agg_exprs.items()
        ]
    )
