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


def _v2(deletes, entries=None):
    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot_v2,
    )

    manifests = [[_entry("a", records=10), _entry("b", records=5)],
                 [_entry("c", STATUS_DELETED), _entry("d", records=8)]]
    if entries is not None:
        manifests = entries
    return build_snapshot_v2(manifests, deletes)


def test_v2_positional_deletes_applied():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        walk_snapshot_v2,
    )

    files = _v2([[("a", 0), ("a", 3), ("d", 1)]])
    snap = walk_snapshot_v2(files)
    by = {f["file_path"]: f for f in snap["live"]}
    assert sorted(by) == ["a", "b", "d"]
    assert (by["a"]["n_deleted"], by["a"]["live_records"]) == (2, 8)
    assert (by["b"]["n_deleted"], by["b"]["live_records"]) == (0, 5)
    assert (by["d"]["n_deleted"], by["d"]["live_records"]) == (1, 7)
    assert snap["n_manifests"] == 2
    assert snap["n_delete_files"] == 1


def test_v2_duplicate_positions_deduped():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        walk_snapshot_v2,
    )

    files = _v2([[("a", 0), ("a", 0)], [("a", 0), ("a", 6)]])
    snap = walk_snapshot_v2(files)
    by = {f["file_path"]: f for f in snap["live"]}
    assert by["a"]["n_deleted"] == 2  # {0, 6}
    assert snap["n_delete_files"] == 2


def test_v2_hostile_deletes():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        CONTENT_EQUALITY_DELETES,
        walk_snapshot_v2,
    )

    # position beyond record_count
    with pytest.raises(ValueError):
        walk_snapshot_v2(_v2([[("a", 10)]]))
    # delete targeting an unknown file
    with pytest.raises(ValueError):
        walk_snapshot_v2(_v2([[("zz", 0)]]))
    # missing delete parquet
    files = _v2([[("a", 0)]])
    del files["data/deletes-0.parquet"]
    with pytest.raises(ValueError):
        walk_snapshot_v2(files)
    # equality deletes refused explicitly
    files = _v2([[("a", 0)]])
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        read_ocf,
        write_ocf,
    )
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_ENTRY_SCHEMA_V2,
    )
    ocf = read_ocf(files["metadata/manifest-deletes.avro"])
    recs = ocf["records"]
    recs[0]["data_file"]["content"] = CONTENT_EQUALITY_DELETES
    blob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, recs,
                     codec="deflate", sync_seed=9999)
    files["metadata/manifest-deletes.avro"] = blob
    # fix recorded length in the manifest list
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_LIST_SCHEMA_V2,
    )
    ml = read_ocf(files["metadata/snap-1.avro"])["records"]
    for r in ml:
        if r["manifest_path"] == "metadata/manifest-deletes.avro":
            r["manifest_length"] = len(blob)
    files["metadata/snap-1.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2, ml, codec="deflate", sync_seed=2001)
    with pytest.raises(ValueError, match="quality deletes"):
        walk_snapshot_v2(files)


def test_v2_delete_parquet_roundtrip():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_positional_delete_parquet,
        read_positional_delete_parquet,
    )

    rows = [("data/z.parquet", 5), ("data/a.parquet", 7),
            ("data/a.parquet", 2)]
    blob = build_positional_delete_parquet(rows)
    assert read_positional_delete_parquet(blob) == sorted(rows)


def test_v2_mor_scan_with_equality_deletes():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot_v2,
        scan_snapshot_v2,
    )

    def parquet_of(cols):
        buf = io.BytesIO()
        pq.write_table(pa.table(cols), buf, compression="snappy")
        return buf.getvalue()

    n = 9
    blob = parquet_of({
        "id": pa.array(list(range(n)), pa.int64()),
        "lang": pa.array(["en", "de", "fr"] * 3),
        "val": pa.array([10 * r for r in range(n)], pa.int64()),
    })
    files = build_snapshot_v2(
        [[{"status": STATUS_ADDED, "file_path": "data/a.parquet",
           "file_format": "PARQUET", "record_count": n,
           "file_size_in_bytes": len(blob), "lang": None}]],
        [[("data/a.parquet", 0)]],
        equality_deletes=[
            (parquet_of({"lang": pa.array(["de"])}), [2], 1),
            (parquet_of({"id": pa.array([6], pa.int64())}), [1], 1),
        ],
        data_blobs={"data/a.parquet": blob})
    scan = scan_snapshot_v2(files)
    # survivors: drop pos 0, lang de (1,4,7), id 6 -> {2,3,5,8}
    assert sorted(r["id"] for r in scan["rows"]) == [2, 3, 5, 8]
    assert all(r["lang"] != "de" for r in scan["rows"])
    assert scan["n_data_files"] == 1
    # a referenced data file missing from the bundle fails the scan
    bad = dict(files)
    del bad["data/a.parquet"]
    with pytest.raises(ValueError):
        scan_snapshot_v2(bad)


def test_metadata_resolution_and_time_travel():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot,
        build_table_metadata,
        resolve_table_metadata,
        walk_snapshot_at,
    )

    files = {}
    files.update(build_snapshot(
        [[_entry("a"), _entry("b")]], snapshot_id=1,
        manifest_prefix="manifest-s1"))
    files.update(build_snapshot(
        [[_entry("a"), _entry("b", STATUS_DELETED)]], snapshot_id=2,
        manifest_prefix="manifest-s2"))
    # stale v1 points at snapshot 1; the reader must pick v3
    files["metadata/v1.metadata.json"] = build_table_metadata(
        {1: "metadata/snap-1.avro"}, 1, version=1)
    files["metadata/v3.metadata.json"] = build_table_metadata(
        {1: "metadata/snap-1.avro", 2: "metadata/snap-2.avro"}, 2,
        version=3)
    meta = resolve_table_metadata(files)
    assert meta["version"] == 3
    assert meta["current_snapshot_id"] == 2
    cur = walk_snapshot_at(files)
    assert [f["file_path"] for f in cur["live"]] == ["a"]
    old = walk_snapshot_at(files, 1)
    assert [f["file_path"] for f in old["live"]] == ["a", "b"]
    with pytest.raises(ValueError, match="unknown snapshot"):
        walk_snapshot_at(files, 99)
    del files["metadata/v3.metadata.json"]
    del files["metadata/v1.metadata.json"]
    with pytest.raises(ValueError, match="metadata.json"):
        walk_snapshot_at(files)


def test_v2_sequence_number_scoping_walk():
    """Table-spec scan planning: a positional delete applies only to
    data files with data_seq <= delete_seq — a file added AFTER the
    delete commit keeps all its rows."""
    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot_v2,
        walk_snapshot_v2,
    )

    old = _entry("old", records=10)          # inherits data seq 1
    new = dict(_entry("new", records=10), sequence_number=3)
    files = build_snapshot_v2(
        [[old, new]], [[("old", 0), ("old", 1), ("new", 0)]],
        delete_sequence_number=2)
    by = {f["file_path"]: f for f in
          walk_snapshot_v2(files)["live"]}
    assert (by["old"]["n_deleted"], by["old"]["live_records"]) == (2, 8)
    assert (by["new"]["n_deleted"], by["new"]["live_records"]) == (0, 10)


def test_v2_sequence_number_scoping_scan():
    """MOR scan: pos deletes need data_seq <= del_seq, equality
    deletes strictly data_seq < del_seq — a row re-inserted at the
    delete's own sequence number survives the equality delete."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot_v2,
        scan_snapshot_v2,
    )

    def parquet_of(cols):
        buf = io.BytesIO()
        pq.write_table(pa.table(cols), buf, compression="snappy")
        return buf.getvalue()

    def datafile(path, blob, n, seq):
        return {"status": STATUS_ADDED, "file_path": path,
                "file_format": "PARQUET", "record_count": n,
                "file_size_in_bytes": len(blob), "lang": None,
                "sequence_number": seq}

    old = parquet_of({"id": pa.array([1, 2, 3], pa.int64())})
    new = parquet_of({"id": pa.array([2, 4], pa.int64())})
    eq = parquet_of({"id": pa.array([2], pa.int64())})
    files = build_snapshot_v2(
        [[datafile("data/old.parquet", old, 3, 1),
          datafile("data/new.parquet", new, 2, 2)]],
        [[("data/old.parquet", 2), ("data/new.parquet", 1)]],
        equality_deletes=[(eq, [1], 1, 2)],
        delete_sequence_number=2,
        data_blobs={"data/old.parquet": old, "data/new.parquet": new})
    scan = scan_snapshot_v2(files)
    # old (seq 1): pos delete drops id=3 (pos 2), eq delete at seq 2
    #   drops id=2 (1 < 2)        -> survives {1}
    # new (seq 2): pos delete drops id=4 (pos 1, 2 <= 2), eq delete
    #   does NOT apply (2 < 2 is false) -> survives {2}
    assert sorted((r["file_path"], r["id"]) for r in scan["rows"]) == [
        ("data/new.parquet", 2), ("data/old.parquet", 1)]


def test_v2_missing_sequence_number_rejected():
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_LIST_SCHEMA_V2,
        walk_snapshot_v2,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        read_ocf,
        write_ocf,
    )

    files = _v2([[("a", 0)]])
    ml = read_ocf(files["metadata/snap-1.avro"])["records"]
    for r in ml:
        r["sequence_number"] = None
    schema = MANIFEST_LIST_SCHEMA_V2.replace(
        '{"name": "sequence_number", "type": "long"}',
        '{"name": "sequence_number", "type": ["null", "long"]}')
    files["metadata/snap-1.avro"] = write_ocf(
        schema, ml, codec="deflate", sync_seed=2001)
    with pytest.raises(ValueError, match="sequence_number"):
        walk_snapshot_v2(files)


def test_sink_format_equality_delete_scans_end_to_end():
    """The streaming sink's OWN commit layout (own-writer parquet
    data/delete files, own-Avro manifests, per-manifest sequence
    numbers) must scan through scan_snapshot_v2 with the spec's
    strict-< equality scoping: the re-add commit above the delete
    survives, every original copy dies (VERDICT r13 #6 write side
    x read side cross-check)."""
    from health_monitor_cc_flink_spark.operators.iceberg import (
        CONTENT_DATA,
        CONTENT_EQUALITY_DELETES,
        MANIFEST_ENTRY_SCHEMA_V2,
        MANIFEST_LIST_SCHEMA_V2,
        build_table_metadata,
        scan_snapshot_v2,
    )
    from health_monitor_cc_flink_spark.operators.parquet_write import (
        write_parquet,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )

    files: dict[str, bytes] = {}
    manifests: list[tuple[str, int, int, int]] = []
    snap = [0]

    def commit(entries, content):
        snap[0] += 1
        sid = snap[0]
        mpath = f"metadata/manifest-{sid:05d}.avro"
        blob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, entries,
                         codec="deflate", sync_seed=sid)
        files[mpath] = blob
        manifests.append((mpath, len(blob), content, sid))
        records = [{
            "manifest_path": p, "manifest_length": ln,
            "partition_spec_id": 0, "content": c,
            "sequence_number": s, "added_snapshot_id": sid,
            "added_files_count": None,
            "existing_files_count": None,
            "deleted_files_count": None,
        } for p, ln, c, s in manifests]
        files[f"metadata/snap-{sid}.avro"] = write_ocf(
            MANIFEST_LIST_SCHEMA_V2, records, codec="deflate",
            sync_seed=2000 + sid)
        files[f"metadata/v{sid}.metadata.json"] = \
            build_table_metadata(
                {s: f"metadata/snap-{s}.avro"
                 for s in range(1, sid + 1)}, sid)
        return sid

    def entry_of(path, n, size, content, eq_ids=None):
        return {"status": STATUS_ADDED, "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": content, "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": n,
                    "file_size_in_bytes": size,
                    "equality_ids": eq_ids}}

    ids = [3, 89, 178, 267, 12, 445, 9]
    blob = write_parquet([("event_id", "INT64", ids),
                          ("bucket", "INT64",
                           [v % 5 for v in ids])])
    files["data/part-0.parquet"] = blob
    commit([entry_of("data/part-0.parquet", len(ids), len(blob),
                     CONTENT_DATA)], CONTENT_DATA)

    dead = [v for v in ids if v % 89 == 0]  # 89, 178, 267, 445
    eq = write_parquet([("event_id", "INT64", sorted(dead))])
    files["data/eqdel-0.parquet"] = eq
    commit([entry_of("data/eqdel-0.parquet", len(dead), len(eq),
                     CONTENT_EQUALITY_DELETES, eq_ids=[1])],
           CONTENT_EQUALITY_DELETES)

    re_ids = [v for v in dead if v % 5 == 2]  # 267
    rblob = write_parquet([("event_id", "INT64", re_ids),
                           ("bucket", "INT64",
                            [2] * len(re_ids))])
    files["data/readd-0.parquet"] = rblob
    commit([entry_of("data/readd-0.parquet", len(re_ids),
                     len(rblob), CONTENT_DATA)], CONTENT_DATA)

    scan = scan_snapshot_v2(files, snapshot_id=snap[0])
    got = sorted(r["event_id"] for r in scan["rows"])
    assert got == sorted([3, 12, 9] + re_ids)
    # the re-added row came from the post-delete file
    readd_rows = [r for r in scan["rows"]
                  if r["file_path"] == "data/readd-0.parquet"]
    assert [r["event_id"] for r in readd_rows] == re_ids


def test_multiformat_data_files_scan():
    """scan_snapshot_v2 dispatches data-file decode on file_format:
    PARQUET / ORC / AVRO all through own readers, MOR deletes
    applied uniformly across formats."""
    import json

    from health_monitor_cc_flink_spark.operators.iceberg import (
        build_snapshot_v2,
        read_data_file,
        scan_snapshot_v2,
    )
    from health_monitor_cc_flink_spark.operators.orc_write import (
        write_orc,
    )
    from health_monitor_cc_flink_spark.operators.parquet_write import (
        write_parquet,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )

    schema = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "rid", "type": "long"},
        {"name": "val", "type": "long"}]})
    pq_b = write_parquet([("rid", "INT64", [0, 3]),
                          ("val", "INT64", [10, 13])])
    orc_b = write_orc([("rid", "LONG", [1, 4]),
                       ("val", "LONG", [11, 14])])
    av_b = write_ocf(schema, [{"rid": 2, "val": 12},
                              {"rid": 5, "val": 15}])
    assert read_data_file(orc_b, "ORC")["rid"] == [1, 4]
    assert read_data_file(av_b, "AVRO")["val"] == [12, 15]
    with pytest.raises(ValueError):
        read_data_file(pq_b, "CSV")

    def entry(path, fmt, rc, size):
        return {"status": STATUS_ADDED, "file_path": path,
                "file_format": fmt, "record_count": rc,
                "file_size_in_bytes": size, "lang": None}

    files = build_snapshot_v2(
        [[entry("data/p.parquet", "PARQUET", 2, len(pq_b)),
          entry("data/o.orc", "ORC", 2, len(orc_b)),
          entry("data/a.avro", "AVRO", 2, len(av_b))]],
        [[("data/o.orc", 0)]],  # positional: drops rid 1
        equality_deletes=[
            (write_parquet([("rid", "INT64", [5])]), [1], 1)],
        data_blobs={"data/p.parquet": pq_b, "data/o.orc": orc_b,
                    "data/a.avro": av_b})
    scan = scan_snapshot_v2(files)
    assert sorted(r["rid"] for r in scan["rows"]) == [0, 2, 3, 4]
    fmts = {r["file_path"] for r in scan["rows"]}
    assert fmts == {"data/p.parquet", "data/o.orc", "data/a.avro"}


def test_scan_plan_v2_bounds_pruning():
    """Manifest bounds prune files from metadata alone: point plans
    one file, disjoint range plans none, missing bounds never
    prune (absence may not skip)."""
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_ENTRY_SCHEMA_V2,
        MANIFEST_LIST_SCHEMA_V2,
        bound_long,
        scan_plan_v2,
        unbound_long,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )

    assert unbound_long(bound_long(-123456789)) == -123456789

    def entry(path, lo, hi, with_bounds=True):
        df = {"content": 0, "file_path": path,
              "file_format": "PARQUET",
              "partition": {"lang": None}, "record_count": 1,
              "file_size_in_bytes": 1, "equality_ids": None}
        if with_bounds:
            df["lower_bounds"] = [{"key": 1,
                                   "value": bound_long(lo)}]
            df["upper_bounds"] = [{"key": 1,
                                   "value": bound_long(hi)}]
        return {"status": STATUS_ADDED, "snapshot_id": None,
                "sequence_number": None, "data_file": df}

    m = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, [
        entry("data/a.parquet", 0, 99),
        entry("data/b.parquet", 100, 199),
        entry("data/c.parquet", 0, 0, with_bounds=False),
    ], codec="deflate")
    files = {
        "metadata/manifest-1.avro": m,
        "metadata/snap-1.avro": write_ocf(
            MANIFEST_LIST_SCHEMA_V2, [{
                "manifest_path": "metadata/manifest-1.avro",
                "manifest_length": len(m),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": 1, "added_snapshot_id": 1,
                "added_files_count": None,
                "existing_files_count": None,
                "deleted_files_count": None}]),
    }
    plan = scan_plan_v2(files, ranges={1: (150, 150)})
    got = sorted(d["file_path"] for d in plan["candidates"])
    # b matches; c kept (no bounds -> may not prune); a skipped
    assert got == ["data/b.parquet", "data/c.parquet"]
    assert plan["n_total"] == 3 and plan["n_skipped"] == 1
    plan2 = scan_plan_v2(files, ranges={1: (500, 600)})
    assert [d["file_path"] for d in plan2["candidates"]] == [
        "data/c.parquet"]
    # no ranges: everything is a candidate
    assert len(scan_plan_v2(files)["candidates"]) == 3


def test_partition_spec_evolution_pruning():
    """Spec-aware pruning: an equality predicate on a partition
    column prunes only entries in manifests whose spec identity-
    includes it; old-spec files are kept (their tuple can't speak)
    and null partition values may not prune."""
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_ENTRY_SCHEMA_V2,
        MANIFEST_LIST_SCHEMA_V2,
        STATUS_ADDED,
        build_table_metadata,
        resolve_table_metadata,
        scan_plan_with_specs,
    )

    def entry(path, lang):
        return {"status": STATUS_ADDED, "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": 0, "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"lang": lang},
                    "record_count": 1, "file_size_in_bytes": 1,
                    "equality_ids": None}}

    files: dict[str, bytes] = {}
    m0 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                   [entry("old-0.parquet", None),
                    entry("old-1.parquet", None)], sync_seed=1)
    m1 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                   [entry("new-en.parquet", "en"),
                    entry("new-de.parquet", "de"),
                    entry("new-null.parquet", None)], sync_seed=2)
    files["metadata/m0.avro"] = m0
    files["metadata/m1.avro"] = m1
    files["metadata/snap-1.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2, [
            {"manifest_path": "metadata/m0.avro",
             "manifest_length": len(m0), "partition_spec_id": 0,
             "content": 0, "sequence_number": 1,
             "added_snapshot_id": 1, "added_files_count": None,
             "existing_files_count": None,
             "deleted_files_count": None},
            {"manifest_path": "metadata/m1.avro",
             "manifest_length": len(m1), "partition_spec_id": 1,
             "content": 0, "sequence_number": 2,
             "added_snapshot_id": 1, "added_files_count": None,
             "existing_files_count": None,
             "deleted_files_count": None},
        ], sync_seed=3)
    files["metadata/v1.metadata.json"] = build_table_metadata(
        {1: "metadata/snap-1.avro"}, 1,
        partition_specs=[
            {"spec-id": 0, "fields": []},
            {"spec-id": 1, "fields": [
                {"name": "lang", "transform": "identity",
                 "source-id": 3, "field-id": 1000}]},
        ], default_spec_id=1)
    meta = resolve_table_metadata(files)
    assert meta["partition_specs"] == {0: set(), 1: {"lang"}}
    plan = scan_plan_with_specs(
        files, partition_eq={"lang": "en"},
        partition_specs=meta["partition_specs"])
    got = sorted(d["file_path"] for d in plan["candidates"])
    # old-spec files kept, new de pruned, new null kept
    assert got == ["new-en.parquet", "new-null.parquet",
                   "old-0.parquet", "old-1.parquet"]
    assert plan["n_skipped"] == 1
    assert plan["n_unprunable_old_spec"] == 2
    import pytest as _pt
    with _pt.raises(ValueError):  # unknown spec id is loud
        scan_plan_with_specs(files, partition_eq={"lang": "en"},
                             partition_specs={0: set()})


def test_expire_snapshots_metadata_and_orphans():
    """Expiry keeps the current snapshot reachable and reclaims only
    members no kept snapshot references — a data file still named by
    a surviving manifest (even as a DELETED tombstone) survives."""
    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_ENTRY_SCHEMA_V2,
        MANIFEST_LIST_SCHEMA_V2,
        STATUS_ADDED,
        STATUS_DELETED,
        build_table_metadata,
        expire_snapshots,
        resolve_table_metadata,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )

    def entry(path, status):
        return {"status": status, "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": 0, "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": 1, "file_size_in_bytes": 1,
                    "equality_ids": None}}

    def mlist_entry(path, blob, seq):
        return {"manifest_path": path, "manifest_length": len(blob),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": seq, "added_snapshot_id": seq,
                "added_files_count": None,
                "existing_files_count": None,
                "deleted_files_count": None}

    files: dict[str, bytes] = {
        "data/f0.parquet": b"A", "data/f1.parquet": b"B",
        "data/f2.parquet": b"C"}
    m1 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                   [entry("data/f0.parquet", STATUS_ADDED),
                    entry("data/f1.parquet", STATUS_ADDED)],
                   sync_seed=1)
    m2 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                   [entry("data/f0.parquet", STATUS_ADDED),
                    entry("data/f1.parquet", STATUS_DELETED),
                    entry("data/f2.parquet", STATUS_ADDED)],
                   sync_seed=2)
    files["metadata/m1.avro"] = m1
    files["metadata/m2.avro"] = m2
    files["metadata/snap-1.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2,
        [mlist_entry("metadata/m1.avro", m1, 1)], sync_seed=3)
    files["metadata/snap-2.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2,
        [mlist_entry("metadata/m2.avro", m2, 2)], sync_seed=4)
    files["metadata/v1.metadata.json"] = build_table_metadata(
        {1: "metadata/snap-1.avro", 2: "metadata/snap-2.avro"}, 2)

    got = expire_snapshots(files, keep_ids={2})
    assert got["n_expired"] == 1
    # snap-1 + m1 reclaimed; f1 SURVIVES (m2's tombstone names it)
    assert got["deleted"] == ["metadata/m1.avro",
                              "metadata/snap-1.avro"]
    assert "data/f1.parquet" in got["files"]
    meta = resolve_table_metadata(got["files"])
    assert meta["version"] == 2
    assert set(meta["snapshots"]) == {2}
    # guardrails: current snapshot unexpirable, unknown ids loud
    import pytest as _pt
    with _pt.raises(ValueError):
        expire_snapshots(files, keep_ids={1})
    with _pt.raises(ValueError):
        expire_snapshots(files, keep_ids={2, 9})


def test_expire_snapshots_partially_expired_members():
    """ADVICE r15: an EXPIRED snapshot whose manifest list/manifest
    is already gone is treated as already-reclaimed (expiry
    proceeds); a KEPT snapshot missing a member raises the module's
    ValueError contract, never a bare KeyError."""
    import pytest as _pt

    from health_monitor_cc_flink_spark.operators.iceberg import (
        MANIFEST_ENTRY_SCHEMA_V2,
        MANIFEST_LIST_SCHEMA_V2,
        STATUS_ADDED,
        build_table_metadata,
        expire_snapshots,
    )
    from health_monitor_cc_flink_spark.sources.avro_ocf import (
        write_ocf,
    )

    def entry(path):
        return {"status": STATUS_ADDED, "snapshot_id": None,
                "sequence_number": None,
                "data_file": {
                    "content": 0, "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": 1, "file_size_in_bytes": 1,
                    "equality_ids": None}}

    def mlist_entry(path, blob, seq):
        return {"manifest_path": path, "manifest_length": len(blob),
                "partition_spec_id": 0, "content": 0,
                "sequence_number": seq, "added_snapshot_id": seq,
                "added_files_count": None,
                "existing_files_count": None,
                "deleted_files_count": None}

    def build(drop=()):
        files = {"data/f0.parquet": b"A", "data/f1.parquet": b"B"}
        m1 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                       [entry("data/f0.parquet")], sync_seed=1)
        m2 = write_ocf(MANIFEST_ENTRY_SCHEMA_V2,
                       [entry("data/f1.parquet")], sync_seed=2)
        files["metadata/m1.avro"] = m1
        files["metadata/m2.avro"] = m2
        files["metadata/snap-1.avro"] = write_ocf(
            MANIFEST_LIST_SCHEMA_V2,
            [mlist_entry("metadata/m1.avro", m1, 1)], sync_seed=3)
        files["metadata/snap-2.avro"] = write_ocf(
            MANIFEST_LIST_SCHEMA_V2,
            [mlist_entry("metadata/m2.avro", m2, 2)], sync_seed=4)
        files["metadata/v1.metadata.json"] = build_table_metadata(
            {1: "metadata/snap-1.avro", 2: "metadata/snap-2.avro"},
            2)
        for d in drop:
            del files[d]
        return files

    # expired snapshot's manifest list already gone -> proceeds
    got = expire_snapshots(build(drop=("metadata/snap-1.avro",)),
                           keep_ids={2})
    assert got["n_expired"] == 1
    assert got["deleted"] == []  # nothing reachable left to reclaim
    # expired snapshot's manifest already gone -> list reclaimed
    got2 = expire_snapshots(build(drop=("metadata/m1.avro",)),
                            keep_ids={2})
    assert got2["deleted"] == ["metadata/snap-1.avro"]
    # a KEPT snapshot's missing member is corrupt -> ValueError
    with _pt.raises(ValueError, match="missing its manifest list"):
        expire_snapshots(build(drop=("metadata/snap-2.avro",)),
                         keep_ids={2})
    with _pt.raises(ValueError, match="missing manifest"):
        expire_snapshots(build(drop=("metadata/m2.avro",)),
                         keep_ids={2})
