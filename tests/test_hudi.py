"""Hudi timeline reconstruction pins."""

import pytest

from health_monitor_cc_flink_spark.operators.hudi import (
    build_commit,
    parse_instant_filename,
    reconstruct_table,
)


def test_instant_filename_forms():
    assert parse_instant_filename("20240101000000.commit") == {
        "time": "20240101000000", "action": "commit",
        "state": "completed"}
    assert parse_instant_filename(
        ".hoodie/20240101000001.deltacommit.inflight")["state"] \
        == "inflight"
    assert parse_instant_filename(
        "20240101000002.replacecommit.requested")["state"] \
        == "requested"
    assert parse_instant_filename("hoodie.properties") is None
    assert parse_instant_filename("20240101000003.archive") is None


def _timeline():
    return {
        "20240101000000.commit": build_commit({"p": [
            {"fileId": "a", "path": "p/a_0-1-0_t0.parquet",
             "numWrites": 10},
            {"fileId": "b", "path": "p/b_0-1-0_t0.parquet",
             "numWrites": 20},
        ]}),
        "20240101000001.commit": build_commit({"p": [
            {"fileId": "a", "path": "p/a_0-1-0_t1.parquet",
             "numWrites": 15},
        ]}),
        "20240101000002.commit.inflight": b"",
        "20240101000003.clean": b'{"policy": "x"}',
    }


def test_latest_slice_wins_and_pending_ignored():
    state = reconstruct_table(_timeline())
    assert state["latest_instant"] == "20240101000001"
    assert state["n_completed"] == 2
    assert state["n_pending"] == 1
    live = state["live"]
    assert live[("p", "a")]["num_writes"] == 15
    assert live[("p", "a")]["instant"] == "20240101000001"
    assert live[("p", "b")]["num_writes"] == 20


def test_replacecommit_retires_file_groups():
    files = _timeline()
    files["20240101000004.replacecommit"] = build_commit(
        {"p": [{"fileId": "c", "path": "p/c_0-1-0_t4.parquet",
                "numWrites": 99}]},
        replaced={"p": ["a"]})
    live = reconstruct_table(files)["live"]
    assert sorted(fid for _, fid in live) == ["b", "c"]


def test_hostile_timelines():
    with pytest.raises(ValueError, match="no completed"):
        reconstruct_table({"20240101000000.commit.inflight": b""})
    bad = _timeline()
    bad["20240101000000.commit"] = b"not json"
    with pytest.raises(ValueError, match="malformed"):
        reconstruct_table(bad)
    dup = _timeline()
    dup["20240101000001.deltacommit"] = build_commit({"p": []})
    with pytest.raises(ValueError, match="duplicate"):
        reconstruct_table(dup)
