#!/usr/bin/env python
"""Dev harness: time individual registry queries with the bench's exact
methodology (noop sink, warmup, best-of-2) and optionally dump
.explain("formatted") to a file.

    python scripts/time_query.py q1 q2 ...            # time queries
    python scripts/time_query.py --explain plans/r16 --suffix before q1

Uses $SPARK_GRAFT_SF_DIR (default sf0.1) and $SPARK_GRAFT_CPUS (default
32), same as bench.py.  NOT part of the bench contract — iteration tool.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from health_monitor_cc_flink_spark.registry import all_queries  # noqa: E402
from health_monitor_cc_flink_spark.session import build_session  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", metavar="DIR", default=None,
                    help="dump .explain('formatted') to DIR/<name>_<suffix>.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(app_name="time_query", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    specs = {s.name: s for s in all_queries()}
    sel = []
    for n in args.names:
        if n not in specs:
            raise SystemExit(f"unknown query {n!r}")
        sel.append(specs[n])

    for spec in sel:
        spark.sparkContext.setJobDescription(f"time_query: {spec.name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                spec.fn(spark, sf_dir).explain("formatted")
            out = os.path.join(args.explain,
                               f"{spec.name}_{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {out}", file=sys.stderr)
        if not args.no_warmup:
            force(spec.fn(spark, sf_dir))
        best = float("inf")
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            force(spec.fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        print(json.dumps({"query": spec.name, "best": round(best, 3),
                          "samples": samples,
                          "loadavg": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
