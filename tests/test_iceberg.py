"""Iceberg snapshot walk: statuses, length verification, unions."""

import pytest

from health_monitor_cc_flink_spark.operators.iceberg import (
    STATUS_ADDED,
    STATUS_DELETED,
    STATUS_EXISTING,
    build_snapshot,
    walk_snapshot,
)


def _entry(path, status=STATUS_ADDED, records=10, size=100, lang="en"):
    return {"status": status, "file_path": path,
            "file_format": "PARQUET", "record_count": records,
            "file_size_in_bytes": size, "lang": lang}


def test_live_excludes_deleted():
    files = build_snapshot([
        [_entry("a"), _entry("b", STATUS_DELETED),
         _entry("c", STATUS_EXISTING)],
        [_entry("d")],
    ])
    snap = walk_snapshot(files)
    assert snap["n_manifests"] == 2
    assert [f["file_path"] for f in snap["live"]] == ["a", "c", "d"]
    assert [f["manifest_idx"] for f in snap["live"]] == [0, 0, 1]


def test_partition_lang_nullable_union():
    files = build_snapshot([[_entry("a", lang=None), _entry("b")]])
    live = walk_snapshot(files)["live"]
    assert live[0]["lang"] is None
    assert live[1]["lang"] == "en"


def test_manifest_length_verified():
    files = build_snapshot([[_entry("a")]])
    files["metadata/manifest-0.avro"] += b"\x00"
    with pytest.raises(ValueError):
        walk_snapshot(files)


def test_missing_manifest_rejected():
    files = build_snapshot([[_entry("a")]])
    del files["metadata/manifest-0.avro"]
    with pytest.raises(ValueError):
        walk_snapshot(files)


def test_missing_list_rejected():
    with pytest.raises(ValueError):
        walk_snapshot({"metadata/manifest-0.avro": b""})


def test_list_counts():
    from health_monitor_cc_flink_spark.sources.avro_ocf import read_ocf

    files = build_snapshot([
        [_entry("a"), _entry("b", STATUS_DELETED),
         _entry("c", STATUS_EXISTING)],
    ])
    (mf,) = read_ocf(files["metadata/snap-1.avro"])["records"]
    assert mf["added_data_files_count"] == 1
    assert mf["existing_data_files_count"] == 1
    assert mf["deleted_data_files_count"] == 1
    assert mf["manifest_length"] == len(files["metadata/manifest-0.avro"])
