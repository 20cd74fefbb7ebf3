#!/usr/bin/env python
"""Skewed-quota probe: single-window vs adaptive vs forced two-phase
group_top_k on balanced and 90%-hot host distributions.

Produces the SCALE_PROBE.md skewed-quota rows.  The r12 question:
does the adaptive pre-probe recover the balanced-case constant
(within ~1.3x of the single window) while keeping the hot case flat?

    python scripts/skew_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from health_monitor_cc_flink_spark.operators.skew import group_top_k  # noqa: E402
from health_monitor_cc_flink_spark.session import build_session  # noqa: E402


def fixture(spark, n: int, hot: bool):
    """URL-per-host rows: balanced = 100k hosts uniform; hot = one
    host holds 90%% of rows."""
    base = spark.range(n)
    if hot:
        host = F.when(
            F.col("id") % 10 < 9, F.lit("hot.example.org")
        ).otherwise(
            F.concat(F.lit("h"), (F.col("id") % 100_000).cast("string"))
        )
    else:
        host = F.concat(F.lit("h"),
                        (F.col("id") % 100_000).cast("string"))
    return base.select(
        host.alias("host"),
        F.md5(F.col("id").cast("string")).alias("canon_url"),
        F.col("id").alias("doc_id"),
    )


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def time_best2(fn) -> float:
    fn()  # warm
    return round(min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(2)), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    order = [F.col("canon_url"), F.col("doc_id")]
    for hot in (False, True):
        df = fixture(spark, n, hot)

        def single():
            w = Window.partitionBy("host").orderBy(*order)
            force(df.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= 2))

        def adaptive():
            force(group_top_k(df, ["host"], order,
                              ["canon_url", "doc_id"], 2,
                              rank_col="_rn"))

        def two_phase():
            force(group_top_k(df, ["host"], order,
                              ["canon_url", "doc_id"], 2,
                              rank_col="_rn",
                              min_salt_group_rows=None))

        label = "90%-hot host" if hot else "balanced (100k hosts)"
        print(f"| {label} | {time_best2(single)} "
              f"| {time_best2(adaptive)} | {time_best2(two_phase)} |",
              flush=True)
    try:
        print(f"loadavg at finish: {os.getloadavg()[0]:.2f}")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
