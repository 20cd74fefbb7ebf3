"""Streaming Delta-log tail: strict version ordering semantics."""

import json
import random

import pytest

from health_monitor_cc_flink_spark.streaming.lake_tail import (
    apply_pending,
)


def _commit(v):
    actions = [{"add": {"path": f"part-{v}.parquet",
                        "partitionValues": {},
                        "size": 1000 + 17 * v,
                        "stats": json.dumps({"numRecords": 100 + v})}}]
    if v >= 2 and v % 2 == 0:
        actions.append({"remove": {"path": f"part-{v - 1}.parquet"}})
    return actions


def test_out_of_order_commits_buffer_then_apply():
    # versions arrive shuffled over several "batches": the tail must
    # apply only contiguous prefixes and converge to the full replay
    random.seed(4)
    order = list(range(8))
    random.shuffle(order)
    applied, live, n_rm = -1, {}, 0
    pending = {}
    for v in order:
        pending[v] = _commit(v)
        applied, live, n_rm, _ = apply_pending(
            applied, live, n_rm, pending)
    assert applied == 7
    assert not pending
    assert sorted(live) == [f"part-{j}.parquet"
                            for j in (0, 2, 4, 6, 7)]
    assert n_rm == 3  # removes at v=2,4,6


def test_gap_blocks_progress():
    applied, live, n_rm = -1, {}, 0
    pending = {1: _commit(1)}  # version 0 missing
    applied, live, n_rm, progressed = apply_pending(
        applied, live, n_rm, pending)
    assert not progressed
    assert applied == -1 and pending  # still buffered
    pending[0] = _commit(0)
    applied, live, n_rm, progressed = apply_pending(
        applied, live, n_rm, pending)
    assert progressed and applied == 1 and not pending


def test_incremental_equals_full_replay():
    from health_monitor_cc_flink_spark.operators.delta_log import (
        replay_delta_log,
    )

    k = 9
    full = replay_delta_log({v: _commit(v) for v in range(k)})
    applied, live, n_rm = -1, {}, 0
    for v in range(k):
        applied, live, n_rm, _ = apply_pending(
            applied, live, n_rm, {v: _commit(v)})
    assert applied == full["version"]
    assert live == full["live"]
    assert n_rm == full["n_removes"]


def _blob(actions):
    return "\n".join(json.dumps(a) for a in actions).encode("utf-8")


def test_redelivery_is_idempotent():
    """At-least-once redelivery (same version, same bytes) is a
    no-op — never a query-killing error — whether the version is
    still pending or already applied."""
    from health_monitor_cc_flink_spark.streaming.lake_tail import (
        ingest_commit,
    )

    pending = {}
    ingest_commit(-1, pending, 1, _blob(_commit(1)))
    # redelivered while still pending: no-op
    ingest_commit(-1, pending, 1, _blob(_commit(1)))
    assert list(pending) == [1]
    # already applied (v <= applied): no-op
    ingest_commit(1, pending := {}, 0, _blob(_commit(0)))
    assert pending == {}


def test_conflicting_payload_at_same_version_rejected():
    from health_monitor_cc_flink_spark.streaming.lake_tail import (
        ingest_commit,
    )

    pending = {}
    ingest_commit(-1, pending, 1, _blob(_commit(1)))
    with pytest.raises(ValueError, match="conflicting"):
        ingest_commit(-1, pending, 1, _blob(_commit(2)))
