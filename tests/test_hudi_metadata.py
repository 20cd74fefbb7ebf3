"""Hudi metadata table (files index): build from a timeline, read
back by log-chain map-merge, parity with the direct walk."""

import json

import pytest

from health_monitor_cc_flink_spark.operators.hudi import (
    base_file_name,
    build_commit,
    reconstruct_table,
)
from health_monitor_cc_flink_spark.operators.hudi_metadata import (
    build_metadata_table,
    read_metadata_listing,
)

T = [f"2026081600000{i}" for i in range(1, 8)]


def _timeline():
    files = {}
    files[f".hoodie/{T[0]}.commit"] = build_commit({
        "lang=en": [{"fileId": "f1",
                     "path": "lang=en/" + base_file_name("f1", T[0]),
                     "numWrites": 10, "totalWriteBytes": 111}],
        "lang=de": [{"fileId": "f2",
                     "path": "lang=de/" + base_file_name("f2", T[0]),
                     "numWrites": 5, "totalWriteBytes": 222}],
    })
    files[f".hoodie/{T[1]}.commit"] = build_commit({
        "lang=en": [{"fileId": "f1",
                     "path": "lang=en/" + base_file_name("f1", T[1]),
                     "numWrites": 12, "totalWriteBytes": 150},
                    {"fileId": "f3",
                     "path": "lang=en/" + base_file_name("f3", T[1]),
                     "numWrites": 7, "totalWriteBytes": 77}],
    })
    files[f".hoodie/{T[2]}.replacecommit"] = build_commit({
        "lang=de": [{"fileId": "f4",
                     "path": "lang=de/" + base_file_name("f4", T[2]),
                     "numWrites": 5, "totalWriteBytes": 99}],
    }, replaced={"lang=de": ["f2"]})
    return files


def test_listing_matches_direct_walk():
    files = _timeline()
    md = build_metadata_table(files)
    # one metadata deltacommit + one log append per data instant
    assert sum(1 for n in md if n.endswith(".deltacommit")) == 3
    assert sum(1 for n in md if "/files/" in n) == 3
    listing = read_metadata_listing(md)
    assert listing["partitions"] == ["lang=de", "lang=en"]
    # replaced group f2's base is tombstoned; BOTH f1 versions list
    # (older versions exist on storage until cleaned)
    assert listing["files"]["lang=de"] == {
        base_file_name("f4", T[2]): 99}
    assert listing["files"]["lang=en"] == {
        base_file_name("f1", T[0]): 111,
        base_file_name("f1", T[1]): 150,
        base_file_name("f3", T[1]): 77,
    }
    # every COW-live base file appears in the listing (the
    # validateMetadataTable containment half)
    snap = reconstruct_table(files)
    for (part, _fid), g in snap["live"].items():
        fname = g["path"].rsplit("/", 1)[-1]
        assert fname in listing["files"][part]


def test_clean_and_rollback_visibility():
    files = _timeline()
    # clean reclaims the old f1 version
    files[f".hoodie/{T[3]}.clean"] = json.dumps({
        "partitionMetadata": {"lang=en": {
            "successDeleteFiles": [
                "lang=en/" + base_file_name("f1", T[0])]}},
    }).encode()
    # a rolled-back commit's files must never surface
    files[f".hoodie/{T[4]}.commit"] = build_commit({
        "lang=en": [{"fileId": "f9",
                     "path": "lang=en/" + base_file_name("f9", T[4]),
                     "numWrites": 1, "totalWriteBytes": 1}]})
    files[f".hoodie/{T[5]}.rollback"] = json.dumps(
        {"commitsRollback": [T[4]]}).encode()
    # an INFLIGHT commit is invisible too
    files[f".hoodie/{T[6]}.commit.inflight"] = b"{}"
    listing = read_metadata_listing(build_metadata_table(files))
    assert listing["files"]["lang=en"] == {
        base_file_name("f1", T[1]): 150,
        base_file_name("f3", T[1]): 77,
    }
    assert base_file_name("f9", T[4]) not in str(listing)


def test_uncommitted_log_append_invisible():
    """A metadata log file whose deltacommit is missing (crashed
    writer) must not contribute to the listing — same visibility
    rule as the data table."""
    files = _timeline()
    md = build_metadata_table(files)
    last_dc = f".hoodie/metadata/.hoodie/{T[2]}.deltacommit"
    orphaned = {n: b for n, b in md.items() if n != last_dc}
    listing = read_metadata_listing(orphaned)
    # the T3 replacecommit's block (f4 add + f2 tombstones) is
    # uncommitted -> listing reflects T1+T2 only
    assert listing["files"]["lang=de"] == {
        base_file_name("f2", T[0]): 222}
    assert base_file_name("f4", T[2]) not in str(listing)


def test_hostile_inputs():
    with pytest.raises(ValueError):
        build_metadata_table({})
    files = _timeline()
    md = build_metadata_table(files)
    # malformed metadata deltacommit json
    bad = dict(md)
    name = next(n for n in md if n.endswith(".deltacommit"))
    bad[name] = b"not json"
    with pytest.raises(ValueError):
        read_metadata_listing(bad)
    # malformed commit json on the data timeline
    files2 = dict(files)
    files2[f".hoodie/{T[3]}.commit"] = b"oops"
    with pytest.raises(ValueError):
        build_metadata_table(files2)


def test_plan_clean_version_retention():
    """KEEP_LATEST_FILE_VERSIONS cleaning: old base-file versions
    reclaim, the newest retain; replaced groups are never
    candidates; the clean metadata flows through the metadata-table
    builder to tombstone exactly the reclaimed files."""
    from health_monitor_cc_flink_spark.operators.hudi import (
        plan_clean,
    )

    files = {}
    # group f1 written at T1, T2, T3 (3 versions); f2 at T1 only;
    # f3 written at T2 then replaced at T4
    files[f".hoodie/{T[0]}.commit"] = build_commit({
        "p": [{"fileId": "f1",
               "path": "p/" + base_file_name("f1", T[0]),
               "numWrites": 1, "totalWriteBytes": 10},
              {"fileId": "f2",
               "path": "p/" + base_file_name("f2", T[0]),
               "numWrites": 1, "totalWriteBytes": 10}]})
    files[f".hoodie/{T[1]}.commit"] = build_commit({
        "p": [{"fileId": "f1",
               "path": "p/" + base_file_name("f1", T[1]),
               "numWrites": 1, "totalWriteBytes": 10},
              {"fileId": "f3",
               "path": "p/" + base_file_name("f3", T[1]),
               "numWrites": 1, "totalWriteBytes": 10}]})
    files[f".hoodie/{T[2]}.commit"] = build_commit({
        "p": [{"fileId": "f1",
               "path": "p/" + base_file_name("f1", T[2]),
               "numWrites": 1, "totalWriteBytes": 10}]})
    files[f".hoodie/{T[3]}.replacecommit"] = build_commit({
        "p": [{"fileId": "f4",
               "path": "p/" + base_file_name("f4", T[3]),
               "numWrites": 1, "totalWriteBytes": 10}]},
        replaced={"p": ["f3"]})
    plan = plan_clean(files, retain_versions=1)
    assert plan["candidates"] == {"p": [
        "p/" + base_file_name("f1", T[0]),
        "p/" + base_file_name("f1", T[1]),
    ]}
    assert plan["n_retained"] == 3  # f1@T3, f2@T1, f4@T4
    # retain 2: only the oldest f1 goes
    plan2 = plan_clean(files, retain_versions=2)
    assert plan2["candidates"] == {"p": [
        "p/" + base_file_name("f1", T[0])]}
    with pytest.raises(ValueError):
        plan_clean(files, retain_versions=0)
    # commit the clean; the metadata listing drops exactly the
    # reclaimed versions
    files[f".hoodie/{T[4]}.clean"] = json.dumps(
        plan["clean_metadata"]).encode()
    listing = read_metadata_listing(build_metadata_table(files))
    assert set(listing["files"]["p"]) == {
        base_file_name("f1", T[2]),
        base_file_name("f2", T[0]),
        base_file_name("f4", T[3]),
    }


def test_column_stats_partition_and_pruning():
    """column_stats chain: append per-(file, column) bounds with a
    data commit, tombstone on reclaim, prune ranges without opening
    files; uncommitted appends invisible."""
    from health_monitor_cc_flink_spark.operators.hudi_metadata \
        import (
            MetadataTableBuilder,
            amend_deltacommit,
            append_column_stats,
            prune_by_column_stats,
            read_column_stats,
        )

    members: dict[str, bytes] = {}
    b = MetadataTableBuilder()
    doc1 = json.loads(build_commit({
        "p": [{"fileId": "f1",
               "path": "p/" + base_file_name("f1", T[0]),
               "numWrites": 4, "totalWriteBytes": 10}]}).decode())
    members.update(b.apply(T[0], "commit", doc1))
    f1 = base_file_name("f1", T[0])
    cs1 = append_column_stats(T[0], 1, T[0], [
        {"partition": "p", "fileName": f1, "columnName": "v",
         "min": 10, "max": 20, "nullCount": 1, "valueCount": 4},
        {"partition": "p", "fileName": f1, "columnName": "w",
         "min": None, "max": None, "nullCount": 4,
         "valueCount": 4},
    ])
    amend_deltacommit(members, T[0], cs1)
    doc2 = json.loads(build_commit({
        "p": [{"fileId": "f2",
               "path": "p/" + base_file_name("f2", T[1]),
               "numWrites": 3, "totalWriteBytes": 10}]}).decode())
    members.update(b.apply(T[1], "commit", doc2))
    f2 = base_file_name("f2", T[1])
    cs2 = append_column_stats(T[1], 2, T[0], [
        {"partition": "p", "fileName": f2, "columnName": "v",
         "min": 100, "max": 200, "nullCount": 0,
         "valueCount": 3}])
    amend_deltacommit(members, T[1], cs2)

    stats = read_column_stats(members)
    assert stats[(f1, "v")] == {"min": 10, "max": 20,
                                "nullCount": 1, "valueCount": 4}
    assert stats[(f2, "v")]["min"] == 100
    # range pruning: [15, 30] hits f1 only; all-null w prunes both
    got = prune_by_column_stats(stats, "v", 15, 30)
    assert got["candidates"] == [f1] and got["pruned"] == [f2]
    got2 = prune_by_column_stats(stats, "w", 0, 10 ** 9)
    assert f1 in got2["pruned"]
    # a file with NO stats row for the column cannot prune
    assert f2 in got2["candidates"] and got2["n_unstated"] == 1
    # tombstone on reclaim drops the rows
    doc3 = {"partitionMetadata": {"p": {
        "successDeleteFiles": ["p/" + f1]}}}
    members.update(b.apply(T[2], "clean", doc3))
    cs3 = append_column_stats(T[2], 3, T[0], [], deleted_files=[
        ("p", f1, "v"), ("p", f1, "w")])
    amend_deltacommit(members, T[2], cs3)
    stats3 = read_column_stats(members)
    assert (f1, "v") not in stats3 and (f1, "w") not in stats3
    assert (f2, "v") in stats3
    # uncommitted col-stats log invisible
    orphan = dict(members)
    dc = f".hoodie/metadata/.hoodie/{T[1]}.deltacommit"
    del orphan[dc]
    stats4 = read_column_stats(orphan)
    assert (f2, "v") not in stats4
