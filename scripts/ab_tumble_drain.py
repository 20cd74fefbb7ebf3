#!/usr/bin/env python
"""Round-8 A/B for the streaming_tumble_drain bench outlier (VERDICT r7
task 2): run the exact bench.py drain recipe N times warm in one session,
optionally with the protobuf PYTHONPATH bootstrap applied first
(AB_PROTOBUF=1), and print all samples.  Protocol per PERF.md: check
/proc/loadavg before trusting the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AB_PROTOBUF", "").lower() in ("1", "true", "yes"):
    from health_monitor_cc_flink_spark.protobuf_shim import bootstrap_protobuf

    bootstrap_protobuf()

from health_monitor_cc_flink_spark.registry import _drain_to_memory  # noqa: E402
from health_monitor_cc_flink_spark.session import build_session  # noqa: E402
from health_monitor_cc_flink_spark.sources.testdata import events_stream, load_table  # noqa: E402
from pyspark.sql import functions as SF  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_RUNS", "10"))
    spark = build_session(
        app_name="ab_tumble_drain",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_events = load_table(spark, sf_dir, "events").count()

    def drain() -> float:
        src = events_stream(spark, sf_dir)
        agg = (
            src.withWatermark("ts", "10 minutes")
            .groupBy(SF.window("ts", "1 minute"), "user_id")
            .agg(SF.avg("value"))
        )
        t0 = time.perf_counter()
        _drain_to_memory(spark, agg, "ab_stream_")
        return time.perf_counter() - t0

    drain()  # warmup, as bench.py does
    samples = [round(drain(), 3) for _ in range(n)]
    with open("/proc/loadavg") as f:
        loadavg = f.read().split()[:3]
    print(
        json.dumps(
            {
                "protobuf_bootstrap": bool(os.environ.get("AB_PROTOBUF")),
                "samples": samples,
                "min": min(samples),
                "median": sorted(samples)[len(samples) // 2],
                "max": max(samples),
                "events_per_sec_at_min": round(n_events / min(samples), 1),
                "loadavg": loadavg,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
