#!/usr/bin/env python
"""Two-axis probe for lake_iceberg_bounds_prune (VERDICT r14 #9):
the registry query couples probe count to data size (n point probes
over n keys), so its ×4 number conflates per-probe planner-cost
growth with data growth.  This isolates the axes on the SAME
scan_plan_v2 planner the query runs:

  axis A — probes HELD at 32, manifest size (files/keys) × 4
  axis B — manifest HELD at 8 files, probe count × 4

Each probe re-plans from manifest bytes (the honest per-query
planner cost the query documents).  Prints one JSON line per cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from health_monitor_cc_flink_spark.operators.iceberg import (  # noqa: E402
    MANIFEST_ENTRY_SCHEMA_V2,
    MANIFEST_LIST_SCHEMA_V2,
    STATUS_ADDED,
    bound_long,
    scan_plan_v2,
)
from health_monitor_cc_flink_spark.operators.parquet_write import (  # noqa: E402
    write_parquet,
)
from health_monitor_cc_flink_spark.sources.avro_ocf import (  # noqa: E402
    write_ocf,
)


def build_table(n_files: int, keys_per_file: int) -> tuple[dict, list]:
    files: dict[str, bytes] = {}
    entries = []
    keys = []
    for i in range(n_files):
        part = [i * keys_per_file * 7 + 7 * r
                for r in range(keys_per_file)]
        keys.extend(part)
        path = f"data/f{i}.parquet"
        blob = write_parquet([("k", "INT64", part)])
        files[path] = blob
        entries.append({
            "status": STATUS_ADDED, "snapshot_id": None,
            "sequence_number": None,
            "data_file": {
                "content": 0, "file_path": path,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": len(part),
                "file_size_in_bytes": len(blob),
                "equality_ids": None,
                "lower_bounds": [{"key": 1,
                                  "value": bound_long(part[0])}],
                "upper_bounds": [{"key": 1,
                                  "value": bound_long(part[-1])}],
            }})
    mblob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, entries,
                      codec="deflate", sync_seed=1)
    files["metadata/manifest-1.avro"] = mblob
    files["metadata/snap-1.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2, [{
            "manifest_path": "metadata/manifest-1.avro",
            "manifest_length": len(mblob),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": 1, "added_snapshot_id": 1,
            "added_files_count": None,
            "existing_files_count": None,
            "deleted_files_count": None,
        }], codec="deflate", sync_seed=2)
    return files, keys


def time_probes(files: dict, keys: list, n_probes: int) -> float:
    qs = [keys[(i * 2654435761) % len(keys)] for i in range(n_probes)]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for qv in qs:
            plan = scan_plan_v2(files, ranges={1: (qv, qv)})
            if len(plan["candidates"]) != 1:
                raise ValueError("point probe must plan 1 file")
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    # axis A: probes fixed at 32; manifest 8 -> 32 files (4x data)
    small, k_small = build_table(8, 32)
    big, k_big = build_table(32, 32)
    a1 = time_probes(small, k_small, 32)
    a4 = time_probes(big, k_big, 32)
    print(json.dumps({
        "axis": "data_x4_probes_fixed", "probes": 32,
        "files_1x": 8, "files_4x": 32,
        "sec_1x": round(a1, 4), "sec_4x": round(a4, 4),
        "ratio": round(a4 / a1, 2)}))
    # axis B: manifest fixed at 8 files; probes 32 -> 128 (4x)
    b1 = time_probes(small, k_small, 32)
    b4 = time_probes(small, k_small, 128)
    print(json.dumps({
        "axis": "probes_x4_data_fixed", "files": 8,
        "probes_1x": 32, "probes_4x": 128,
        "sec_1x": round(b1, 4), "sec_4x": round(b4, 4),
        "ratio": round(b4 / b1, 2)}))


if __name__ == "__main__":
    main()
