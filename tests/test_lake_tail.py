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
