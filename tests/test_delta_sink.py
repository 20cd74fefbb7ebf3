"""Streaming Delta sink helpers: idempotent commits, checkpoint
cadence, checkpoint-seeded replay after vacuum (O33 write-side)."""

import json
import os

import pytest

from health_monitor_cc_flink_spark.streaming.sinks import (
    delta_append_commit,
    delta_read_snapshot,
    delta_write_checkpoint,
)


def _add(v):
    a = []
    if v == 0:
        a += [{"protocol": {"minReaderVersion": 1,
                            "minWriterVersion": 2}},
              {"metaData": {"id": "t1"}}]
    a.append({"add": {"path": f"part-{v}.parquet",
                      "partitionValues": {},
                      "size": 100 + v, "modificationTime": 0,
                      "dataChange": True,
                      "stats": json.dumps({"numRecords": 10 + v},
                                          separators=(",", ":"))}})
    return a


def test_commit_checkpoint_replay(tmp_path):
    log = str(tmp_path / "_delta_log")
    for v in range(4):
        assert delta_append_commit(log, v, _add(v)) is True
    assert delta_write_checkpoint(log) == 3
    for v in range(4, 7):
        delta_append_commit(log, v, _add(v))
    snap = delta_read_snapshot(log)
    assert snap["version"] == 6
    assert sorted(snap["live"]) == [f"part-{v}.parquet"
                                    for v in range(7)]
    assert snap["live"]["part-5.parquet"]["num_records"] == 15


def test_vacuumed_log_replays_from_checkpoint(tmp_path):
    log = str(tmp_path / "_delta_log")
    for v in range(5):
        delta_append_commit(log, v, _add(v))
    delta_write_checkpoint(log)
    delta_append_commit(log, 5, _add(5))
    before = delta_read_snapshot(log)
    for v in range(5):  # vacuum every pre-checkpoint commit
        os.remove(os.path.join(log, f"{v:020d}.json"))
    after = delta_read_snapshot(log)
    assert after["version"] == before["version"] == 5
    assert after["live"].keys() == before["live"].keys()


def test_redelivered_epoch_is_noop(tmp_path):
    """foreachBatch delivers at-least-once: a replayed commit with
    identical bytes must be a no-op, not an error or a duplicate."""
    log = str(tmp_path / "_delta_log")
    assert delta_append_commit(log, 0, _add(0)) is True
    assert delta_append_commit(log, 0, _add(0)) is False
    snap = delta_read_snapshot(log)
    assert snap["version"] == 0 and len(snap["live"]) == 1


def test_conflicting_commit_rejected(tmp_path):
    log = str(tmp_path / "_delta_log")
    delta_append_commit(log, 0, _add(0))
    bad = _add(0)
    bad[-1]["add"]["size"] = 999
    with pytest.raises(ValueError, match="conflicting"):
        delta_append_commit(log, 0, bad)


def test_checkpoint_readable_by_own_checkpoint_reader(tmp_path):
    """The sink's checkpoint parquet decodes through the repo's
    checkpoint reader (own parquet page reader underneath)."""
    from health_monitor_cc_flink_spark.operators.delta_log import (
        checkpoint_filename,
        read_checkpoint_parquet,
    )

    log = str(tmp_path / "_delta_log")
    for v in range(3):
        delta_append_commit(log, v, _add(v))
    cv = delta_write_checkpoint(log)
    blob = (tmp_path / "_delta_log"
            / checkpoint_filename(cv)).read_bytes()
    snap = read_checkpoint_parquet([blob])
    assert sorted(snap["live"]) == [f"part-{v}.parquet"
                                    for v in range(3)]
    assert snap["metadata"]["id"] == "t1"
