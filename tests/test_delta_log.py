"""Delta log replay semantics: ordering, gaps, last-writer-wins."""

import pytest

from health_monitor_cc_flink_spark.operators.delta_log import (
    build_delta_log,
    commit_filename,
    parse_commit_filename,
    parse_delta_log_files,
    replay_delta_log,
)


def _add(path, size=100, records=10, lang="en"):
    return {"add": {"path": path, "size": size,
                    "partitionValues": {"lang": lang},
                    "stats": f'{{"numRecords": {records}}}',
                    "dataChange": True}}


def _remove(path):
    return {"remove": {"path": path, "dataChange": True}}


def test_filename_roundtrip():
    assert commit_filename(7) == "0" * 19 + "7.json"
    assert parse_commit_filename(commit_filename(42)) == 42
    assert parse_commit_filename("_delta_log/" + commit_filename(3)) == 3
    assert parse_commit_filename("00000000000000000001.checkpoint.parquet") is None
    assert parse_commit_filename("_last_checkpoint") is None


def test_replay_add_remove():
    snap = replay_delta_log({
        0: [{"protocol": {"minReaderVersion": 1}}, _add("a"), _add("b")],
        1: [_remove("a"), _add("c")],
    })
    assert snap["version"] == 1
    assert sorted(snap["live"]) == ["b", "c"]
    assert snap["n_adds"] == 3 and snap["n_removes"] == 1


def test_last_writer_wins_readd():
    snap = replay_delta_log({
        0: [_add("a", size=1)],
        1: [_remove("a")],
        2: [_add("a", size=999, records=77)],
    })
    assert snap["live"]["a"]["size"] == 999
    assert snap["live"]["a"]["num_records"] == 77


def test_replace_without_remove():
    snap = replay_delta_log({0: [_add("a", size=1), _add("a", size=2)]})
    assert snap["live"]["a"]["size"] == 2


def test_version_gap_rejected():
    with pytest.raises(ValueError):
        replay_delta_log({0: [_add("a")], 2: [_add("b")]})
    with pytest.raises(ValueError):
        replay_delta_log({1: [_add("a")]})  # must start at 0


def test_metadata_carried():
    snap = replay_delta_log({
        0: [{"metaData": {"id": "t1", "partitionColumns": ["lang"]}},
            _add("a")],
    })
    assert snap["metadata"]["id"] == "t1"


def test_files_roundtrip_ignores_sidecars():
    files = build_delta_log({0: [_add("a")], 1: [_add("b")]})
    files["_last_checkpoint"] = b'{"version": 1}'
    snap = parse_delta_log_files(files)
    assert sorted(snap["live"]) == ["a", "b"]
    assert snap["version"] == 1


def _checkpoint_parquet(rows):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("stats", pa.string()),
    ])
    rm_t = pa.struct([("path", pa.string())])
    md_t = pa.struct([("id", pa.string())])
    t = pa.table({
        "add": pa.array([r.get("add") for r in rows], add_t),
        "remove": pa.array([r.get("remove") for r in rows], rm_t),
        "metaData": pa.array([r.get("metaData") for r in rows], md_t),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy")
    return buf.getvalue()


def _vacuumed_log(multipart=False, size=None, drop_checkpoint=False,
                  skip_commit=False):
    import json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        checkpoint_filename,
        commit_filename,
    )

    rows = [
        {"metaData": {"id": "tbl"}},
        {"add": {"path": "a.parquet",
                 "partitionValues": [("lang", "en")],
                 "size": 10, "stats": '{"numRecords":5}'}},
        {"add": {"path": "b.parquet",
                 "partitionValues": [("lang", "de")],
                 "size": 20, "stats": '{"numRecords":7}'}},
        {"remove": {"path": "expired.parquet"}},  # tombstone
    ]
    files = {}
    if not drop_checkpoint:
        if multipart:
            files[checkpoint_filename(4, 1, 2)] = (
                _checkpoint_parquet(rows[:2]))
            files[checkpoint_filename(4, 2, 2)] = (
                _checkpoint_parquet(rows[2:]))
        else:
            files[checkpoint_filename(4)] = _checkpoint_parquet(rows)
    files["_last_checkpoint"] = json.dumps(
        {"version": 4, "size": len(rows) if size is None else size}
    ).encode()
    v = 6 if skip_commit else 5
    files[commit_filename(v)] = (
        b'{"add":{"path":"c.parquet","partitionValues":{"lang":"fr"},'
        b'"size":30,"stats":"{\\"numRecords\\":9}"}}\n'
        b'{"remove":{"path":"a.parquet"}}\n')
    return files


@pytest.mark.parametrize("multipart", [False, True])
def test_checkpoint_replay_vacuumed_log(multipart):
    snap = parse_delta_log_files(_vacuumed_log(multipart=multipart))
    assert snap["version"] == 5
    assert snap["checkpoint_version"] == 4
    assert sorted(snap["live"]) == ["b.parquet", "c.parquet"]
    assert snap["live"]["b.parquet"]["num_records"] == 7
    assert snap["live"]["b.parquet"]["partition_values"] == {
        "lang": "de"}
    assert snap["live"]["c.parquet"]["size"] == 30
    # the checkpoint's expired tombstone must not resurrect anything
    assert "expired.parquet" not in snap["live"]
    assert snap["n_removes"] == 1
    assert snap["metadata"] == {"id": "tbl"}


def test_checkpoint_without_trailing_commits():
    files = _vacuumed_log()
    files.pop("00000000000000000005.json")
    snap = parse_delta_log_files(files)
    assert snap["version"] == 4
    assert sorted(snap["live"]) == ["a.parquet", "b.parquet"]


def test_checkpoint_hostile_inputs():
    with pytest.raises(ValueError):
        parse_delta_log_files(_vacuumed_log(drop_checkpoint=True))
    with pytest.raises(ValueError):
        parse_delta_log_files(_vacuumed_log(size=99))
    with pytest.raises(ValueError):  # gap between cp and first commit
        parse_delta_log_files(_vacuumed_log(skip_commit=True))
    import json
    files = _vacuumed_log(multipart=True)
    del files["00000000000000000004.checkpoint.0000000002.0000000002.parquet"]
    with pytest.raises(ValueError):
        parse_delta_log_files(files)


def test_checkpoint_filename_forms():
    from health_monitor_cc_flink_spark.operators.delta_log import (
        parse_checkpoint_filename,
    )

    assert parse_checkpoint_filename(
        "00000000000000000010.checkpoint.parquet") == (10, 1, 1)
    assert parse_checkpoint_filename(
        "00000000000000000010.checkpoint.0000000002.0000000003.parquet"
    ) == (10, 2, 3)
    assert parse_checkpoint_filename("10.checkpoint.parquet") is None
    assert parse_checkpoint_filename(
        "00000000000000000010.json") is None


def test_compaction_roundtrip_and_reference_reader():
    import io
    import json

    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.delta_log import (
        compact_delta_log,
        write_checkpoint_parquet,
    )

    def commit(v):
        a = [{"add": {"path": f"part-{v}.parquet",
                      "partitionValues": {},
                      "size": 1000 + 17 * v,
                      "stats": json.dumps({"numRecords": 100 + v})}}]
        if v == 0:
            a = [{"protocol": {"minReaderVersion": 1,
                               "minWriterVersion": 2}},
                 {"metaData": {"id": "tbl-x"}}] + a
        if v >= 2 and v % 2 == 0:
            a.append({"remove": {"path": f"part-{v - 1}.parquet"}})
        return a

    files = build_delta_log({v: commit(v) for v in range(7)})
    orig = parse_delta_log_files(files)
    compacted = compact_delta_log(files)
    assert sorted(compacted) == [
        "00000000000000000006.checkpoint.parquet",
        "_last_checkpoint"]
    snap = parse_delta_log_files(compacted)
    assert snap["version"] == orig["version"]
    assert snap["metadata"] == {"id": "tbl-x"}
    keep = ("size", "num_records", "partition_values")
    assert ({p: {k: e[k] for k in keep}
             for p, e in snap["live"].items()}
            == {p: {k: e[k] for k in keep}
                for p, e in orig["live"].items()})
    # the reference C++ reader accepts the own-writer checkpoint
    blob = compacted["00000000000000000006.checkpoint.parquet"]
    t = pq.read_table(io.BytesIO(blob))
    assert t.schema.names == ["protocol", "metaData", "add"]
    adds = [a for a in t["add"].to_pylist() if a is not None]
    assert sorted(a["path"] for a in adds) == sorted(orig["live"])
    # partitioned tables serialize their partitionValues map (r16:
    # the refusal lifted once the nested-MAP writer landed)
    blob_p, n_p = write_checkpoint_parquet({"live": {
        "lang=en/a.parquet": {
            "partition_values": {"lang": "en"}, "size": 1,
            "num_records": 1},
        "b.parquet": {
            "partition_values": {}, "size": 2, "num_records": 2},
    }, "metadata": None})
    assert n_p == 4
    tp = pq.read_table(io.BytesIO(blob_p))
    adds_p = {a["path"]: a for a in tp["add"].to_pylist()
              if a is not None}
    assert dict(adds_p["lang=en/a.parquet"]["partitionValues"]) \
        == {"lang": "en"}
    assert dict(adds_p["b.parquet"]["partitionValues"] or {}) == {}


def test_checkpoint_roundtrips_deletion_vectors():
    """Checkpoint writer/reader carry add.deletionVector structs
    (r14: expressible since the nested parquet writer): inline and
    file-backed descriptors survive the parquet roundtrip, DV-less
    adds come back without one."""
    from health_monitor_cc_flink_spark.operators.delta_log import (
        read_checkpoint_parquet,
        write_checkpoint_parquet,
    )

    snap = {
        "metadata": {"id": "dv-table"},
        "live": {
            "a.parquet": {"size": 100, "num_records": 10,
                          "partition_values": {},
                          "deletion_vector": {
                              "storageType": "u",
                              "pathOrInlineDv": "x" * 20,
                              "offset": 1, "sizeInBytes": 34,
                              "cardinality": 3}},
            "b.parquet": {"size": 200, "num_records": 20,
                          "partition_values": {},
                          "deletion_vector": {
                              "storageType": "i",
                              "pathOrInlineDv": "HelloWorld",
                              "sizeInBytes": 6,
                              "cardinality": 1}},
            "c.parquet": {"size": 300, "num_records": 30,
                          "partition_values": {}},
        },
    }
    blob, n = write_checkpoint_parquet(snap)
    back = read_checkpoint_parquet([blob])
    assert n == 5 and back["n_actions"] == 5
    assert back["metadata"] == {"id": "dv-table"}
    a = back["live"]["a.parquet"]["deletion_vector"]
    assert a == {"storageType": "u", "pathOrInlineDv": "x" * 20,
                 "offset": 1, "sizeInBytes": 34, "cardinality": 3}
    b = back["live"]["b.parquet"]["deletion_vector"]
    assert b["storageType"] == "i" and "offset" not in b
    assert back["live"]["c.parquet"]["deletion_vector"] is None
    # DV-less tables keep the old flat shape (no DV columns at all)
    flat = {"metadata": {"id": "t"},
            "live": {"d.parquet": {"size": 1, "num_records": 1,
                                   "partition_values": {}}}}
    blob2, _ = write_checkpoint_parquet(flat)
    import io

    import pyarrow.parquet as pq

    names = pq.read_schema(io.BytesIO(blob2)).names
    assert not any("deletionVector" in c for c in names)
    # pyarrow also reads the DV checkpoint (reference-reader check)
    t = pq.read_table(io.BytesIO(blob))
    dv_rows = t.column("add").to_pylist()
    assert dv_rows[2]["deletionVector"]["storageType"] == "u"


def test_prune_by_stats_keeps_incomparable_types():
    """ADVICE r14: string-typed stats compared against numeric
    bounds raised TypeError mid-plan; incomparable types must KEEP
    the file (the documented 'absence may not prune' conservatism),
    not crash the planner."""
    from health_monitor_cc_flink_spark.operators.delta_log import (
        prune_live_by_stats,
    )

    live = {
        "a.parquet": {"stats": {"minValues": {"c": "alpha"},
                                "maxValues": {"c": "zulu"}}},
        "b.parquet": {"stats": {"minValues": {"c": 50},
                                "maxValues": {"c": 60}}},
        "c.parquet": {"stats": {"minValues": {"c": 500},
                                "maxValues": {"c": 900}}},
    }
    got = prune_live_by_stats(live, "c", 0, 100)
    # numeric stats still prune (c.parquet out); string stats keep
    assert got["candidates"] == ["a.parquet", "b.parquet"]
    assert got["n_skipped"] == 1


def test_column_mapping_resolution_and_rename():
    """Column mapping: physical names resolve from schemaString
    field metadata; a metadata-only RENAME changes the logical key
    while the physical name (and the data files) stay put."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        column_mapping,
        replay_delta_log,
    )

    def meta(logical_val):
        return {"metaData": {
            "id": "t1", "format": {"provider": "parquet"},
            "schemaString": _json.dumps({
                "type": "struct", "fields": [
                    {"name": "id", "type": "long", "nullable": True,
                     "metadata": {
                         "delta.columnMapping.id": 1,
                         "delta.columnMapping.physicalName":
                             "col-aaa"}},
                    {"name": logical_val, "type": "long",
                     "nullable": True,
                     "metadata": {
                         "delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName":
                             "col-bbb"}},
                ]}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
        }}

    commits = {
        0: [meta("val"), {"add": {"path": "f0.parquet", "size": 1,
                                  "partitionValues": {},
                                  "dataChange": True}}],
        1: [meta("score")],  # rename val -> score, data untouched
    }
    snap = replay_delta_log(commits)
    cm = column_mapping(snap["metadata"])
    assert cm["mode"] == "name"
    assert cm["physical"] == {"id": "col-aaa", "score": "col-bbb"}
    assert cm["ids"] == {"id": 1, "score": 2}
    # at version 0 the same physical column was logically "val"
    cm0 = column_mapping(replay_delta_log(
        {0: commits[0]})["metadata"])
    assert cm0["physical"] == {"id": "col-aaa", "val": "col-bbb"}
    # mapping off -> None; corrupt mapped schema -> loud
    assert column_mapping({"schemaString": "{}",
                           "configuration": {}}) is None
    bad = meta("val")["metaData"]
    bad_schema = _json.loads(bad["schemaString"])
    del bad_schema["fields"][1]["metadata"]
    bad["schemaString"] = _json.dumps(bad_schema)
    with pytest.raises(ValueError):
        column_mapping(bad)


def test_read_cdf_explicit_and_derived():
    """CDF: commits with cdc actions use ONLY the change files;
    commits without derive insert/delete from dataChange actions."""
    from health_monitor_cc_flink_spark.operators.delta_log import (
        read_cdf,
    )

    store = {
        "f0": {"v": [1, 2, 3]},
        "f1": {"v": [1, 1002, 3]},
        "c1": {"v": [2, 1002],
               "_change_type": ["update_preimage",
                                "update_postimage"]},
    }
    commits = {
        0: [{"add": {"path": "f0", "dataChange": True}}],
        1: [{"cdc": {"path": "c1", "partitionValues": {},
                     "size": 1, "dataChange": False}},
            {"remove": {"path": "f0", "dataChange": True}},
            {"add": {"path": "f1", "dataChange": True}}],
        2: [{"remove": {"path": "f1", "dataChange": True}}],
    }
    got = read_cdf(commits, 0, 2, lambda p: store[p])
    key = [(g["version"], g["change_type"], tuple(g["columns"]["v"]))
           for g in got]
    assert key == [
        (0, "insert", (1, 2, 3)),
        # v1 has a cdc action: the remove/add there must NOT derive
        (1, "update_postimage", (1002,)),
        (1, "update_preimage", (2,)),
        (2, "delete", (1, 1002, 3)),
    ]
    # range clamp + corrupt cdc file
    assert [g["version"] for g in read_cdf(
        commits, 1, 1, lambda p: store[p])] == [1, 1]
    with pytest.raises(ValueError):
        read_cdf({0: [{"cdc": {"path": "f0"}}]}, 0, 0,
                 lambda p: store[p])


def test_protocol_feature_gating():
    """Forward-compat: supported feature sets pass, an unknown
    readerFeature or a future minReaderVersion refuses LOUDLY."""
    from health_monitor_cc_flink_spark.operators.delta_log import (
        check_read_protocol,
        replay_delta_log,
    )

    check_read_protocol(None)
    check_read_protocol({"minReaderVersion": 1})
    check_read_protocol({"minReaderVersion": 3,
                         "readerFeatures": ["deletionVectors",
                                            "columnMapping"]})
    # r16: v2Checkpoint flipped from refuse to read
    check_read_protocol({"minReaderVersion": 3,
                         "readerFeatures": ["v2Checkpoint"]})
    with pytest.raises(ValueError):
        check_read_protocol({"minReaderVersion": 3,
                             "readerFeatures": ["typeWidening"]})
    with pytest.raises(ValueError):
        check_read_protocol({"minReaderVersion": 4})
    # replay now CARRIES the protocol action
    snap = replay_delta_log({0: [
        {"protocol": {"minReaderVersion": 3,
                      "readerFeatures": ["deletionVectors"]}},
        {"add": {"path": "f0", "size": 1, "partitionValues": {},
                 "dataChange": True}},
    ]})
    assert snap["protocol"]["minReaderVersion"] == 3


def test_protocol_gate_wired_into_read_path():
    """ADVICE r15 (medium): the gate must fire from
    parse_delta_log_files itself — every consumer, not only the
    dedicated gate query — and a checkpoint-seeded (vacuumed) log
    must CARRY the protocol through the checkpoint parquet instead
    of passing as 'legacy v1'."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        compact_delta_log,
        parse_delta_log_files,
    )

    def table(features):
        return build_delta_log({0: [
            {"protocol": {"minReaderVersion": 3,
                          "minWriterVersion": 7,
                          "readerFeatures": features,
                          "writerFeatures": features}},
            {"metaData": {"id": "t"}},
            {"add": {"path": "a.parquet", "size": 9,
                     "stats": _json.dumps({"numRecords": 4})}},
        ]})

    # supported feature set reads fine
    snap = parse_delta_log_files(table(["columnMapping"]))
    assert snap["protocol"]["readerFeatures"] == ["columnMapping"]
    # unsupported feature refuses FROM THE READ ENTRY POINT
    with pytest.raises(ValueError, match="unsupported Delta reader"):
        parse_delta_log_files(table(["typeWidening"]))
    # checkpoint-seeded: compaction preserves the protocol (pre-r16
    # it hardcoded 1/2) and the vacuumed table still refuses
    compacted_ok = compact_delta_log(table(["columnMapping"]))
    snap2 = parse_delta_log_files(compacted_ok)
    assert snap2["protocol"]["minReaderVersion"] == 3
    assert snap2["protocol"]["readerFeatures"] == ["columnMapping"]
    assert snap2["protocol"]["writerFeatures"] == ["columnMapping"]
    # build the bad compacted form by compacting a table whose
    # feature WAS readable is impossible — so forge it: compact a
    # good table, then recompact after swapping the protocol via the
    # JSON commit route is equally impossible post-gate.  Instead
    # verify the checkpoint itself carries arbitrary features by
    # writing one directly from a snapshot dict.
    from health_monitor_cc_flink_spark.operators.delta_log import (
        checkpoint_filename,
        write_checkpoint_parquet,
    )
    bad_snap = {
        "version": 0,
        "live": {"a.parquet": {"size": 9, "partition_values": {},
                               "num_records": 4, "stats": None,
                               "deletion_vector": None}},
        "metadata": {"id": "t"},
        "protocol": {"minReaderVersion": 3,
                     "readerFeatures": ["typeWidening"]},
    }
    blob, n = write_checkpoint_parquet(bad_snap)
    vacuumed = {
        checkpoint_filename(0): blob,
        "_last_checkpoint": _json.dumps(
            {"version": 0, "size": n}).encode(),
    }
    with pytest.raises(ValueError, match="unsupported Delta reader"):
        parse_delta_log_files(vacuumed)


def test_v2_checkpoint_roundtrip():
    """V2 (UUID-named, sidecar) checkpoints: write -> read parity
    with the direct JSON replay, manifest version check, sidecar
    size check, missing-sidecar refusal."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        parse_delta_log_files,
        write_checkpoint_v2,
    )

    commits = {
        0: [{"protocol": {"minReaderVersion": 3,
                          "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"],
                          "writerFeatures": ["v2Checkpoint"]}},
            {"metaData": {"id": "tbl"}}] + [
            {"add": {"path": f"part-{i}.parquet", "size": 10 + i,
                     "stats": _json.dumps({"numRecords": i + 1})}}
            for i in range(7)],
        1: [{"remove": {"path": "part-0.parquet"}}],
    }
    direct = parse_delta_log_files(build_delta_log(commits))
    uuid = "0f7d4a1e-9c2b-4d3e-8a5f-6b7c8d9e0f1a"
    v2 = write_checkpoint_v2(direct, uuid, n_sidecars=3)
    assert sum(1 for k in v2 if k.startswith("_sidecars/")) == 3
    seeded = parse_delta_log_files(v2)
    assert seeded["version"] == direct["version"]
    assert seeded["protocol"] == direct["protocol"]
    assert {p: e["num_records"] for p, e in seeded["live"].items()} \
        == {p: e["num_records"] for p, e in direct["live"].items()}
    # commits after the checkpoint still replay on top
    extra = dict(v2)
    extra.update(build_delta_log(
        {2: [{"add": {"path": "part-9.parquet", "size": 99,
                      "stats": _json.dumps({"numRecords": 5})}}]}))
    snap3 = parse_delta_log_files(extra)
    assert "part-9.parquet" in snap3["live"]
    assert snap3["version"] == 2
    # a missing sidecar refuses
    broken = {k: v for k, v in v2.items()
              if not k.endswith("-001.parquet")}
    with pytest.raises(ValueError, match="missing sidecar"):
        parse_delta_log_files(broken)
    # a corrupted sidecar size refuses
    tampered = dict(v2)
    key = next(k for k in v2 if k.startswith("_sidecars/"))
    tampered[key] = v2[key] + b"x"
    with pytest.raises(ValueError, match="size mismatch"):
        parse_delta_log_files(tampered)


def test_compaction_v2_roundtrip():
    """compact_delta_log(v2=True) emits the UUID-manifest + sidecar
    form; replay equality with the classic compaction and the
    original, deterministic bytes for a fixed input."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        compact_delta_log,
        parse_delta_log_files,
    )

    commits = {
        0: [{"protocol": {"minReaderVersion": 3,
                          "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"],
                          "writerFeatures": ["v2Checkpoint"]}},
            {"metaData": {"id": "t"}}] + [
            {"add": {"path": f"p{i}.parquet", "size": i + 1,
                     "stats": _json.dumps({"numRecords": i + 2})}}
            for i in range(5)],
        1: [{"remove": {"path": "p0.parquet"}}],
    }
    files = build_delta_log(commits)
    direct = parse_delta_log_files(files)
    c2 = compact_delta_log(files, v2=True)
    assert any(".checkpoint." in n and n.endswith(".parquet")
               and len(n.rsplit(".", 2)[-2]) == 36 for n in c2)
    assert sum(1 for n in c2 if n.startswith("_sidecars/")) == 2
    snap = parse_delta_log_files(c2)
    assert snap["version"] == direct["version"]
    assert snap["protocol"] == direct["protocol"]
    assert {p: e["num_records"] for p, e in snap["live"].items()} \
        == {p: e["num_records"] for p, e in direct["live"].items()}
    # deterministic: same input -> same bytes
    assert compact_delta_log(files, v2=True) == c2
    # classic form unchanged
    c1 = compact_delta_log(files)
    snap1 = parse_delta_log_files(c1)
    assert snap1["live"].keys() == snap["live"].keys()


def test_partitioned_checkpoint_roundtrip():
    """Partitioned table compaction (classic and v2): the
    add.partitionValues map survives the checkpoint parquet in both
    directions, including empty maps and multi-key tuples."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        compact_delta_log,
        parse_delta_log_files,
    )

    commits = {0: [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "pt",
                      "partitionColumns": ["lang", "day"]}},
        {"add": {"path": "lang=en/p0.parquet", "size": 5,
                 "partitionValues": {"lang": "en"},
                 "stats": _json.dumps({"numRecords": 3})}},
        {"add": {"path": "lang=de/day=7/p1.parquet", "size": 6,
                 "partitionValues": {"lang": "de", "day": "7"},
                 "stats": _json.dumps({"numRecords": 4})}},
        {"add": {"path": "p2.parquet", "size": 7,
                 "partitionValues": {},
                 "stats": _json.dumps({"numRecords": 5})}},
    ]}
    files = build_delta_log(commits)
    direct = parse_delta_log_files(files)
    want = {p: e["partition_values"]
            for p, e in direct["live"].items()}
    for v2 in (False, True):
        snap = parse_delta_log_files(
            compact_delta_log(files, v2=v2))
        assert {p: e["partition_values"]
                for p, e in snap["live"].items()} == want, v2
        assert {p: e["num_records"]
                for p, e in snap["live"].items()} \
            == {p: e["num_records"]
                for p, e in direct["live"].items()}


def test_version_checksum_verify():
    """<v>.crc summaries verify against replay; tampering and
    orphan checksums are loud."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        checksum_filename,
        replay_delta_log,
        verify_version_checksum,
        write_version_checksum,
    )

    commits = {
        0: [{"protocol": {"minReaderVersion": 1,
                          "minWriterVersion": 2}},
            {"metaData": {"id": "t"}},
            {"add": {"path": "a.parquet", "size": 10,
                     "stats": _json.dumps({"numRecords": 5})}}],
        1: [{"add": {"path": "b.parquet", "size": 20,
                     "stats": _json.dumps({"numRecords": 7})}}],
        2: [{"remove": {"path": "a.parquet"}}],
    }
    files = build_delta_log(commits)
    for v in commits:
        snap = replay_delta_log(
            {k: a for k, a in commits.items() if k <= v})
        files[checksum_filename(v)] = write_version_checksum(snap)
    res = verify_version_checksum(files)
    assert res == {"versions_checked": 3, "valid": True,
                   "mismatches": []}
    # DV tallies ride along
    doc = _json.loads(files[checksum_filename(2)].decode())
    assert doc["tableSizeBytes"] == 20 and doc["numFiles"] == 1
    # field tamper -> named mismatch
    bad = dict(files)
    bad[checksum_filename(1)] = bad[checksum_filename(1)].replace(
        b'"tableSizeBytes":30', b'"tableSizeBytes":31')
    r2 = verify_version_checksum(bad)
    assert not r2["valid"]
    assert r2["mismatches"] == [{
        "version": 1, "field": "tableSizeBytes",
        "expected": 30, "actual": 31}]
    # checksum for a nonexistent version is hostile input
    orphan = dict(files)
    orphan[checksum_filename(9)] = files[checksum_filename(0)]
    with pytest.raises(ValueError, match="no commit"):
        verify_version_checksum(orphan)
    # malformed json is loud
    broken = dict(files)
    broken[checksum_filename(0)] = b"not json"
    with pytest.raises(ValueError, match="malformed"):
        verify_version_checksum(broken)


def test_vacuum_retention_semantics():
    """VACUUM: expired tombstones reclaim, young ones and re-added
    paths survive, unknown-age removes are conservatively kept."""
    import json as _json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_delta_log,
        parse_delta_log_files,
        vacuum_delta,
    )

    NOW = 1_700_000_000_000
    DAY = 86_400_000
    commits = {
        0: [{"metaData": {"id": "t"}}]
        + [{"add": {"path": f"f{i}.parquet", "size": 1,
                    "stats": _json.dumps({"numRecords": 1})}}
           for i in range(5)],
        1: [{"remove": {"path": "f0.parquet",
                        "deletionTimestamp": NOW - 10 * DAY}},
            {"remove": {"path": "f1.parquet",
                        "deletionTimestamp": NOW - 1 * DAY}},
            {"remove": {"path": "f2.parquet"}},  # unknown age
            {"remove": {"path": "f3.parquet",
                        "deletionTimestamp": NOW - 10 * DAY}}],
        2: [{"add": {"path": "f3.parquet", "size": 2,
                     "stats": _json.dumps({"numRecords": 2})}}],
    }
    files = build_delta_log(commits)
    for i in range(5):
        files[f"f{i}.parquet"] = b"DATA"
    got = vacuum_delta(files, retention_ms=7 * DAY, now_ms=NOW)
    # f0 expired -> gone; f1 young, f2 unknown -> kept; f3 re-added
    # -> rescued; f4 live
    assert got["deleted"] == ["f0.parquet"]
    assert got["n_kept_tombstones"] == 2
    for name in ("f1.parquet", "f2.parquet", "f3.parquet",
                 "f4.parquet"):
        assert name in got["files"]
    # current snapshot still replays intact after the vacuum
    snap = parse_delta_log_files(got["files"])
    assert sorted(snap["live"]) == [
        "f3.parquet", "f4.parquet"]
    with pytest.raises(ValueError):
        vacuum_delta(files, retention_ms=-1, now_ms=NOW)
