"""Puffin container + Iceberg v3 deletion vectors: framing, CRC,
walk integration, spec refusals."""

import struct

import pytest

from health_monitor_cc_flink_spark.operators.iceberg import (
    STATUS_ADDED,
    build_snapshot_v2,
    walk_snapshot_v2,
)
from health_monitor_cc_flink_spark.operators.puffin import (
    read_dv_at,
    read_dv_blob,
    read_puffin,
    serialize_dv_blob,
    write_puffin,
)


def test_dv_blob_roundtrip_and_framing():
    positions = [0, 5, 7, 4096, 70000, 1 << 33]
    blob = serialize_dv_blob(positions)
    assert read_dv_blob(blob) == sorted(positions)
    # frame: BE length of magic+vector, then the magic byte
    # sequence D1 D3 39 64 the Puffin spec names (the same
    # 0x6439D3D1 value Delta's RoaringBitmapArray uses,
    # little-endian), then BE CRC at the end
    (length,) = struct.unpack_from(">I", blob, 0)
    assert 4 + length + 4 == len(blob)
    assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])
    # CRC tamper is loud
    bad = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError, match="CRC"):
        read_dv_blob(bad)
    # length tamper is loud
    with pytest.raises(ValueError, match="length"):
        read_dv_blob(blob[:-2])


def test_puffin_container_roundtrip():
    b1 = serialize_dv_blob([1, 2, 3])
    b2 = serialize_dv_blob([10])
    blobs = [
        {"data": b1, "properties": {
            "referenced-data-file": "a.parquet",
            "cardinality": "3"}},
        {"data": b2, "properties": {
            "referenced-data-file": "b.parquet",
            "cardinality": "1"}},
    ]
    p = write_puffin(blobs, properties={"created-by": "own-writer"})
    meta = read_puffin(p)
    assert meta["properties"] == {"created-by": "own-writer"}
    assert len(meta["blobs"]) == 2
    for spec, m in zip(blobs, meta["blobs"]):
        assert m["offset"] == spec["offset"]
        assert m["length"] == spec["length"]
    assert read_dv_at(p, meta["blobs"][0]["offset"],
                      meta["blobs"][0]["length"]) == [1, 2, 3]
    assert read_dv_at(p, meta["blobs"][1]["offset"],
                      meta["blobs"][1]["length"]) == [10]


def test_puffin_hostile_inputs():
    p = write_puffin([{"data": serialize_dv_blob([1])}])
    with pytest.raises(ValueError):
        read_puffin(b"XXXX" + p[4:])          # bad header magic
    with pytest.raises(ValueError):
        read_puffin(p[:-4] + b"XXXX")         # bad trailer magic
    # compressed-footer flag refuses
    tampered = p[:-8] + struct.pack("<I", 1) + p[-4:]
    with pytest.raises(ValueError, match="compressed"):
        read_puffin(tampered)
    # unknown flags refuse
    tampered2 = p[:-8] + struct.pack("<I", 0x100) + p[-4:]
    with pytest.raises(ValueError, match="unknown"):
        read_puffin(tampered2)
    with pytest.raises(ValueError):
        read_dv_at(p, len(p), 8)              # out of range


def _manifests():
    return [[
        {"status": STATUS_ADDED, "file_path": "data/a.parquet",
         "file_format": "PARQUET", "record_count": 100,
         "file_size_in_bytes": 10, "lang": "en"},
        {"status": STATUS_ADDED, "file_path": "data/b.parquet",
         "file_format": "PARQUET", "record_count": 50,
         "file_size_in_bytes": 10, "lang": "de"},
    ]]


def test_v3_dv_walk():
    files = build_snapshot_v2(_manifests(), [], deletion_vectors=[
        ("data/a.parquet", [1, 5, 9, 11])])
    snap = walk_snapshot_v2(files)
    by = {f["file_path"]: f for f in snap["live"]}
    assert by["data/a.parquet"]["live_records"] == 96
    assert by["data/a.parquet"]["n_deleted"] == 4
    assert by["data/b.parquet"]["live_records"] == 50
    assert snap["n_delete_files"] == 1


def test_v3_dv_spec_refusals():
    # v3 forbids mixing a DV with parquet position deletes
    files = build_snapshot_v2(
        _manifests(), [[("data/a.parquet", 3)]],
        deletion_vectors=[("data/a.parquet", [1])])
    with pytest.raises(ValueError, match="forbids mixing"):
        walk_snapshot_v2(files)
    # at most one DV per data file
    files2 = build_snapshot_v2(_manifests(), [], deletion_vectors=[
        ("data/a.parquet", [1]), ("data/a.parquet", [2])])
    with pytest.raises(ValueError, match="multiple deletion"):
        walk_snapshot_v2(files2)
    # positions beyond record_count are loud
    files3 = build_snapshot_v2(_manifests(), [], deletion_vectors=[
        ("data/b.parquet", [50])])
    with pytest.raises(ValueError, match="beyond record_count"):
        walk_snapshot_v2(files3)


def test_v3_dv_sequence_scoping():
    """A DV whose sequence number precedes the data file's must not
    drop rows added after it (same scan-planning rule as parquet
    position deletes)."""
    files = build_snapshot_v2(_manifests(), [], deletion_vectors=[
        ("data/a.parquet", [1], 0)])  # data seq 1 > dv seq 0
    snap = walk_snapshot_v2(files)
    by = {f["file_path"]: f for f in snap["live"]}
    assert by["data/a.parquet"]["live_records"] == 100


def test_v3_dv_row_level_scan():
    """scan_snapshot_v2 (the full row-decode path) applies DVs:
    surviving rows exclude exactly the DV positions, under the same
    sequence scoping as parquet position deletes."""
    from health_monitor_cc_flink_spark.operators.iceberg import (
        scan_snapshot_v2,
    )
    from health_monitor_cc_flink_spark.operators.parquet_write \
        import write_parquet

    blob_a = write_parquet(
        [("event_id", "INT64", list(range(100, 110)))])
    blob_b = write_parquet(
        [("event_id", "INT64", list(range(200, 205)))])
    manifests = [[
        {"status": STATUS_ADDED, "file_path": "data/a.parquet",
         "file_format": "PARQUET", "record_count": 10,
         "file_size_in_bytes": len(blob_a), "lang": "en"},
        {"status": STATUS_ADDED, "file_path": "data/b.parquet",
         "file_format": "PARQUET", "record_count": 5,
         "file_size_in_bytes": len(blob_b), "lang": "de"},
    ]]
    files = build_snapshot_v2(
        manifests, [],
        deletion_vectors=[("data/a.parquet", [0, 3, 7])],
        data_blobs={"data/a.parquet": blob_a,
                    "data/b.parquet": blob_b})
    scan = scan_snapshot_v2(files)
    got = sorted(r["event_id"] for r in scan["rows"])
    want = sorted(set(range(100, 110)) - {100, 103, 107}
                  | set(range(200, 205)))
    assert got == want
    # metadata walk and row scan agree
    walk = walk_snapshot_v2(files)
    assert sum(f["live_records"] for f in walk["live"]) == len(got)
    # out-of-scope DV (older than the data) drops nothing
    files2 = build_snapshot_v2(
        manifests, [],
        deletion_vectors=[("data/a.parquet", [0], 0)],
        data_blobs={"data/a.parquet": blob_a,
                    "data/b.parquet": blob_b})
    scan2 = scan_snapshot_v2(files2)
    assert len(scan2["rows"]) == 15
