#!/usr/bin/env python3
"""Headline benchmark: runs the representative query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect).  The xlsx entries measure the custom sink/source
against the reference's single-node rows/s numbers (BASELINE.md rows 1-6).
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: catalog queries timed by the bench (coverage across operator families,
#: weighted toward shuffle-heavy shapes that stress scale behavior)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_asof_forward_tolerance",
    "window_topn_per_group",
    "sessionize_events",
    "setop_intersect_except",
    "agg_grouping_multi",
    "text_analysis",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "sim_topk_bruteforce",
    "multimodal_features",
]


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def main() -> None:
    import excelstream_spark.plans.relational  # noqa: F401
    import excelstream_spark.plans.extension  # noqa: F401
    import excelstream_spark.plans.io_parity  # noqa: F401
    import excelstream_spark.plans.streaming_ops  # noqa: F401
    import excelstream_spark.plans.scale  # noqa: F401
    from excelstream_spark.plans.catalog import CATALOG
    from excelstream_spark.session import get_spark
    from excelstream_spark.sources.xlsx import register_xlsx
    from excelstream_spark.tables import load_table

    spark = get_spark("excelstream_spark-bench")
    register_xlsx(spark)
    # warmup: JIT, parquet footers, python worker pool — excluded from timings
    for t in ("lineitem", "documents", "embeddings", "events"):
        load_table(spark, SF_DIR, t).count()
    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in HEADLINE:
        spec = CATALOG[name]
        run(name, lambda spec=spec: noop(spec.fn(spark, SF_DIR)))

    # custom xlsx sink/source throughput (reference baseline rows 1-6)
    li = load_table(spark, SF_DIR, "lineitem")
    n_rows = li.count()
    out = os.path.join(tempfile.mkdtemp(prefix="bench_"), "lineitem_xlsx")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    run(
        "xlsx_write",
        lambda: li.repartition(cpus).write.format("xlsx").mode("overwrite").save(out),
    )
    run("xlsx_read", lambda: noop(spark.read.format("xlsx").load(out)))
    for label, rate_key in (("xlsx_write", "xlsx_write_rows_per_sec"),
                            ("xlsx_read", "xlsx_read_rows_per_sec")):
        timings[rate_key] = round(n_rows / timings[label], 1)

    # CSV throughput (reference baseline: 1.2M rows/s plain CSV, Rust).
    # The 600k-row sf0.1 job is fixed-overhead-bound (~0.5s scheduling/
    # commit), which under-reports steady-state by 10x — so the CSV leg
    # runs at 10x lineitem (6M rows at sf0.1) to amortize job overhead
    # and report the sustained rate.
    from functools import reduce

    li_big = reduce(lambda a, b: a.unionAll(b), [li] * 10)
    n_csv_rows = n_rows * 10
    csv_out = os.path.join(tempfile.mkdtemp(prefix="bench_"), "lineitem_csv")
    run(
        "csv_write",
        lambda: li_big.repartition(cpus).write.mode("overwrite")
        .options(header=True).csv(csv_out),
    )
    run(
        "csv_read",
        lambda: noop(spark.read.schema(li.schema).options(header=True).csv(csv_out)),
    )
    for label, rate_key in (("csv_write", "csv_write_rows_per_sec"),
                            ("csv_read", "csv_read_rows_per_sec")):
        timings[rate_key] = round(n_csv_rows / timings[label], 1)

    total = round(
        sum(timings[q] for q in HEADLINE)
        + timings["xlsx_write"] + timings["xlsx_read"]
        + timings["csv_write"] + timings["csv_read"],
        3,
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
