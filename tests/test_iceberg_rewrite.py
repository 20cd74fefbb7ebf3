"""Iceberg rewrite-manifests: merged manifest preserves the walk."""

import pytest

from health_monitor_cc_flink_spark.operators.iceberg import (
    STATUS_ADDED,
    build_snapshot_v2,
    rewrite_manifests,
    walk_snapshot_v2,
)


def _entry(path, n, lang="en"):
    return {"status": STATUS_ADDED, "file_path": path,
            "file_format": "PARQUET", "record_count": n,
            "file_size_in_bytes": n * 10, "lang": lang}


def test_rewrite_preserves_walk():
    manifests = [
        [_entry("data/a.parquet", 10), _entry("data/b.parquet", 20)],
        [_entry("data/c.parquet", 30)],
        [_entry("data/d.parquet", 40, lang="de")],
    ]
    files = build_snapshot_v2(
        manifests, [[("data/a.parquet", 0), ("data/a.parquet", 3)]])
    before = walk_snapshot_v2(files)
    got = rewrite_manifests(files)
    assert (got["n_before"], got["n_after"]) == (3, 1)
    after = walk_snapshot_v2(got["files"],
                             snapshot_id=got["new_snapshot_id"])
    key = lambda s: sorted(
        (f["file_path"], f["record_count"], f["live_records"],
         f["n_deleted"], f["lang"]) for f in s["live"])
    assert key(before) == key(after)
    # deletes still scope: 'a' lost 2 rows in BOTH walks
    by = {f["file_path"]: f for f in after["live"]}
    assert by["data/a.parquet"]["live_records"] == 8
    # the old snapshot remains readable (time travel intact)
    again = walk_snapshot_v2(got["files"], snapshot_id=1)
    assert key(again) == key(before)


def test_rewrite_hostile_inputs():
    files = build_snapshot_v2(
        [[_entry("data/a.parquet", 5)]], [])
    broken = {k: v for k, v in files.items()
              if "manifest-0" not in k}
    with pytest.raises(ValueError, match="missing manifest"):
        rewrite_manifests(broken)
    with pytest.raises(ValueError, match="missing manifest list"):
        rewrite_manifests(files, snapshot_id=9)
