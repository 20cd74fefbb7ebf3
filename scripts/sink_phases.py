#!/usr/bin/env python
"""Dev harness: where does a streaming lake sink query spend its time?

Wraps the interesting internals (writeStream start->awaitTermination,
post-stream maintenance jobs, final read-back aggregate) with
perf_counter stamps by monkeypatching the phase boundaries, then runs
the query once warm.  NOT part of the bench contract — iteration tool.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from health_monitor_cc_flink_spark.registry import all_queries  # noqa: E402
from health_monitor_cc_flink_spark.session import build_session  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="sink_phases",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:]
    specs = {s.name: s for s in all_queries()}

    # stamp phase boundaries: streaming start/stop via DataStreamWriter
    from pyspark.sql.streaming import query as SQ

    marks: list[tuple[str, float]] = []
    orig_await = SQ.StreamingQuery.awaitTermination

    def spy_await(self, timeout=None):
        r = orig_await(self, timeout)
        marks.append(("stream_done", time.perf_counter()))
        return r

    SQ.StreamingQuery.awaitTermination = spy_await

    from pyspark.sql import DataFrame
    orig_collect = DataFrame.collect

    def spy_collect(self):
        t0 = time.perf_counter()
        r = orig_collect(self)
        marks.append((f"collect({len(r)} rows)",
                      time.perf_counter()))
        return r

    DataFrame.collect = spy_collect

    for name in names:
        spec = specs[name]
        force(spec.fn(spark, sf_dir))  # warmup
        marks.clear()
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t_build = time.perf_counter()
        force(df)
        t_end = time.perf_counter()
        print(f"\n=== {name}: total {t_end - t0:.3f}s "
              f"(build {t_build - t0:.3f}s, final force "
              f"{t_end - t_build:.3f}s)")
        prev = t0
        for label, t in marks:
            print(f"  +{t - prev:7.3f}s  -> {label} "
                  f"(at {t - t0:.3f}s)")
            prev = t
    spark.stop()


if __name__ == "__main__":
    main()
