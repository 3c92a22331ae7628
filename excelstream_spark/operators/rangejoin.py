"""Binned range join: the scale path for PURE interval joins.

Reference parity: the reference has no joins (SURVEY.md §2.7); this is
extension surface.

A join with no equality component — ``point BETWEEN lo AND hi`` —
gives Catalyst nothing to hash or sort on, so it plans a
BroadcastNestedLoopJoin: O(|points| x |intervals|) comparisons, and at
100 TB that's the difference between minutes and never.

``binned_interval_join`` manufactures the missing equi-key: pick a bin
width ``w``; each interval replicates to every bin it overlaps
(``floor(lo/w) .. floor(hi/w)``), each point maps to its single bin,
the join becomes an equi-join on the bin id, and the exact BETWEEN is
re-checked as a residual filter.  Each matching (point, interval) pair
meets in EXACTLY one bin (the point's), so no dedup pass is needed.

Cost model: interval side inflates by ``avg_span/w + 1`` (choose ``w``
on the order of the typical interval span); the join itself is a plain
shuffled/broadcast hash join, fully parallel, AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi``, as an equi-join on overlapping bins.

    Column names must be disjoint between the two inputs (standard join
    hygiene); the output carries all columns from both sides.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))
    p = points.withColumn("_bin_p", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "_bin_i",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
        ),
    )
    joined = p.join(
        iv,
        (F.col("_bin_p") == F.col("_bin_i"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)),
        how,
    )
    return joined.drop("_bin_p", "_bin_i")
