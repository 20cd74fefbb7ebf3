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
