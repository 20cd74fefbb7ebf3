"""HoodieLogFormat blocks, the MOR log-merge, and MOR timeline
reconstruction (hudi.apache.org storage spec + HoodieLogFormat
javadoc; VERDICT r14 #4)."""

import json

import pytest

from health_monitor_cc_flink_spark.operators.hudi import (
    base_file_name,
    build_commit,
    reconstruct_mor_table,
)
from health_monitor_cc_flink_spark.operators.hudi_log import (
    AVRO_DATA_BLOCK,
    H_INSTANT_TIME,
    log_file_name,
    merge_log_records,
    parse_log_file_name,
    read_log_file,
    write_avro_data_block,
    write_log_block,
)

SCHEMA = json.dumps({
    "type": "record", "name": "rec", "fields": [
        {"name": "key", "type": "long"},
        {"name": "val", "type": "long"},
        {"name": "ts", "type": "long"},
        {"name": "_hoodie_is_deleted", "type": "boolean"},
    ]})


def _rec(k, v, ts, deleted=False):
    return {"key": k, "val": v, "ts": ts,
            "_hoodie_is_deleted": deleted}


def test_log_block_roundtrip_multi():
    recs1 = [_rec(k, 10 * k, 1) for k in range(5)]
    recs2 = [_rec(2, 999, 2), _rec(7, 70, 2)]
    blob = (write_avro_data_block(SCHEMA, recs1, "001")
            + write_avro_data_block(SCHEMA, recs2, "002"))
    blocks = read_log_file(blob)
    assert [b["type"] for b in blocks] == [AVRO_DATA_BLOCK] * 2
    assert blocks[0]["header"][H_INSTANT_TIME] == "001"
    assert blocks[0]["records"] == recs1
    assert blocks[1]["records"] == recs2


def test_log_block_hostile_inputs():
    good = write_avro_data_block(SCHEMA, [_rec(1, 1, 1)], "001")
    with pytest.raises(ValueError):  # magic
        read_log_file(b"#HUDX#" + good[6:])
    with pytest.raises(ValueError):  # truncated content
        read_log_file(good[:-9])
    bad = bytearray(good)
    bad[-1] ^= 0x01  # reverse pointer corrupted
    with pytest.raises(ValueError):
        read_log_file(bytes(bad))
    with pytest.raises(ValueError):  # missing schema header
        read_log_file(write_log_block(
            AVRO_DATA_BLOCK, {H_INSTANT_TIME: "001"}, b"\0" * 8))


def test_log_file_name_roundtrip():
    name = log_file_name("fg-abc", "20260101000000001", 3)
    info = parse_log_file_name(name)
    assert info == {"file_id": "fg-abc",
                    "base_instant": "20260101000000001",
                    "version": 3}
    assert parse_log_file_name("fg_x.parquet") is None


def test_merge_precombine_and_delete_semantics():
    base = [_rec(k, 10 * k, 0) for k in range(4)]
    b1 = {"type": AVRO_DATA_BLOCK,
          "records": [_rec(1, 111, 2), _rec(9, 90, 1)]}
    # lower precombine than b1's key-1 row: must NOT win
    b2 = {"type": AVRO_DATA_BLOCK, "records": [_rec(1, 222, 1)]}
    # delete key 2; tie on key 9 (same ts) -> later block wins
    b3 = {"type": AVRO_DATA_BLOCK,
          "records": [_rec(2, 0, 3, deleted=True), _rec(9, 91, 1)]}
    got = merge_log_records(base, [b1, b2, b3], "key", "ts")
    assert {(r["key"], r["val"]) for r in got} == {
        (0, 0), (1, 111), (3, 30), (9, 91)}


def test_reconstruct_mor_table_chain_and_compaction():
    part = "2026/01"
    fid = "g0"
    t = [str(20260101000000000 + i) for i in range(1, 7)]
    files = {
        # base commit
        f"{t[0]}.commit": build_commit({part: [{
            "fileId": fid, "path": f"{part}/"
            + base_file_name(fid, t[0]), "numWrites": 4}]}),
        # two deltacommits appending logs
        f"{t[1]}.deltacommit": build_commit({part: [{
            "fileId": fid,
            "path": f"{part}/{log_file_name(fid, t[0], 1)}",
            "numWrites": 2}]}),
        f"{t[2]}.deltacommit": build_commit({part: [{
            "fileId": fid,
            "path": f"{part}/{log_file_name(fid, t[0], 2)}",
            "numWrites": 1}]}),
        # compaction folds the chain into a new base
        f"{t[3]}.commit": build_commit({part: [{
            "fileId": fid, "path": f"{part}/"
            + base_file_name(fid, t[3]), "numWrites": 5}]}),
        # a post-compaction log survives
        f"{t[4]}.deltacommit": build_commit({part: [{
            "fileId": fid,
            "path": f"{part}/{log_file_name(fid, t[3], 1)}",
            "numWrites": 1}]}),
        # dangling inflight stays invisible
        f"{t[5]}.deltacommit.inflight": b"",
    }
    state = reconstruct_mor_table(files)
    g = state["live"][(part, fid)]
    assert g["base_instant"] == t[3]
    assert g["base_path"].endswith(f"{base_file_name(fid, t[3])}")
    assert g["log_paths"] == [f"{part}/{log_file_name(fid, t[3], 1)}"]
    assert state["n_pending"] == 1
    # mid-chain view: without the compaction, both logs attach
    pre = {k: v for k, v in files.items() if not k.startswith(t[3])
           and not k.startswith(t[4])}
    g2 = reconstruct_mor_table(pre)["live"][(part, fid)]
    assert g2["base_instant"] == t[0]
    assert g2["n_log_files"] == 2


def test_reconstruct_mor_hostile():
    with pytest.raises(ValueError):  # deltacommit writing a base
        reconstruct_mor_table({"20260101000000001.deltacommit":
                               build_commit({"p": [{
                                   "fileId": "g",
                                   "path": "p/x.parquet"}]})})
    with pytest.raises(ValueError):  # commit appending a log
        reconstruct_mor_table({"20260101000000001.commit":
                               build_commit({"p": [{
                                   "fileId": "g",
                                   "path": "p/"
                                   + log_file_name("g", "1" * 17)}]})})


def test_rollback_excludes_target_instant():
    """A completed rollback instant must make readers skip the
    targeted commit even when its files still sit on the timeline
    (the crash-recovery shape rollbacks exist for)."""
    from health_monitor_cc_flink_spark.operators.hudi import (
        reconstruct_table,
    )

    part = "2026/01"
    t = [str(20260101000000000 + i) for i in range(1, 6)]
    files = {
        f"{t[0]}.commit": build_commit({part: [{
            "fileId": "g0", "path": f"{part}/"
            + base_file_name("g0", t[0]), "numWrites": 4}]}),
        # a bad deltacommit that later gets rolled back
        f"{t[1]}.deltacommit": build_commit({part: [{
            "fileId": "g0",
            "path": f"{part}/{log_file_name('g0', t[0], 1)}",
            "numWrites": 2}]}),
        f"{t[2]}.rollback": json.dumps(
            {"commitsRollback": [t[1]]}).encode(),
        # life goes on after the rollback
        f"{t[3]}.deltacommit": build_commit({part: [{
            "fileId": "g0",
            "path": f"{part}/{log_file_name('g0', t[0], 2)}",
            "numWrites": 1}]}),
    }
    g = reconstruct_mor_table(files)["live"][(part, "g0")]
    assert g["log_paths"] == [f"{part}/{log_file_name('g0', t[0], 2)}"]
    assert g["n_log_files"] == 1
    # COW walker skips it too: rolled-back base rewrite must not win
    files2 = {
        f"{t[0]}.commit": build_commit({part: [{
            "fileId": "g0", "path": f"{part}/"
            + base_file_name("g0", t[0]), "numWrites": 4}]}),
        f"{t[1]}.commit": build_commit({part: [{
            "fileId": "g0", "path": f"{part}/"
            + base_file_name("g0", t[1]), "numWrites": 9}]}),
        f"{t[2]}.rollback": json.dumps(
            {"instantsRollback": [
                {"action": "commit", "commitTime": t[1]}]}).encode(),
    }
    st = reconstruct_table(files2)["live"][(part, "g0")]
    assert st["instant"] == t[0]
    # malformed rollback json is loud
    with pytest.raises(ValueError):
        reconstruct_table({
            f"{t[0]}.commit": build_commit({part: [{
                "fileId": "g0", "path": "x.parquet"}]}),
            f"{t[1]}.rollback": b"not json",
        })


def test_mor_time_travel_as_of():
    """as_of reconstruction: only instants <= the travel point
    participate; a later compaction must not rewrite history."""
    from health_monitor_cc_flink_spark.operators.hudi import (
        reconstruct_mor_table,
        reconstruct_table,
    )

    part = "2026/01"
    t = [str(20260101000000000 + i) for i in range(1, 5)]
    files = {
        f"{t[0]}.commit": build_commit({part: [{
            "fileId": "g0", "path": f"{part}/"
            + base_file_name("g0", t[0]), "numWrites": 4}]}),
        f"{t[1]}.deltacommit": build_commit({part: [{
            "fileId": "g0",
            "path": f"{part}/{log_file_name('g0', t[0], 1)}",
            "numWrites": 2}]}),
        f"{t[2]}.commit": build_commit({part: [{
            "fileId": "g0", "path": f"{part}/"
            + base_file_name("g0", t[2]), "numWrites": 5}]}),
    }
    # at t[1]: base t[0] + one log; latest: compacted base t[2]
    g_then = reconstruct_mor_table(files, as_of=t[1])["live"][
        (part, "g0")]
    assert g_then["base_instant"] == t[0]
    assert g_then["n_log_files"] == 1
    g_now = reconstruct_mor_table(files)["live"][(part, "g0")]
    assert g_now["base_instant"] == t[2]
    assert g_now["n_log_files"] == 0
    # COW as_of
    st = reconstruct_table(files, as_of=t[0])["live"][(part, "g0")]
    assert st["instant"] == t[0]
