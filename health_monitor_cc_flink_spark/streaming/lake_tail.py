"""Streaming Delta-log TAILING — incremental snapshot maintenance.

A lake ingestion service does not replay a table's log from zero on
every poll: it TAILS the ``_delta_log/`` — applying each newly landed
commit to the snapshot it already holds.  This is that operator as a
structured-streaming stateful transform: the input stream carries
(table_id, version, commit ndjson bytes); ``applyInPandasWithState``
keyed by table keeps {applied version, live-file set, pending
out-of-order commits} as state, applies commits STRICTLY IN VERSION
ORDER (a commit arriving before its predecessor waits in the pending
buffer — micro-batch boundaries give no ordering guarantees), and
emits the advanced snapshot census once per batch with progress.

The per-commit application is the SAME ``replay_delta_log`` the batch
path uses (base=current live, base_version=applied) — batch and
stream replay one code path.  State is bounded: live-file census per
table plus only the out-of-order window of pending commits.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([
    T.StructField("applied", T.LongType()),
    T.StructField("live_json", T.StringType()),
    T.StructField("n_removes", T.LongType()),
    T.StructField("pending_json", T.StringType()),
])

_OUT_SCHEMA = T.StructType([
    T.StructField("table_id", T.LongType()),
    T.StructField("version", T.LongType()),
    T.StructField("n_live", T.LongType()),
    T.StructField("n_removes", T.LongType()),
    T.StructField("sum_size", T.LongType()),
])

MAX_PENDING = 1 << 14


def apply_pending(applied: int, live: dict, n_removes: int,
                  pending: dict) -> tuple[int, dict, int, bool]:
    """Apply buffered commits strictly in version order (stop at the
    first gap) -> (applied, live, n_removes, progressed).  The pure
    core of the stream tail, shared with its tests."""
    from ..operators.delta_log import replay_delta_log

    progressed = False
    while applied + 1 in pending:
        v = applied + 1
        snap = replay_delta_log(
            {v: pending.pop(v)},
            base={"live": live, "metadata": None},
            base_version=applied)
        live = snap["live"]
        n_removes += snap["n_removes"]
        applied = v
        progressed = True
    return applied, live, n_removes, progressed


def ingest_commit(applied: int, pending: dict, v: int,
                  blob: bytes) -> None:
    """Buffer one observed commit into ``pending`` (mutated).
    At-least-once redelivery is normal source behavior after a
    retry/restart, so an already-applied or already-pending version
    with the SAME payload is an idempotent no-op; the hard error is
    reserved for a CONFLICTING payload at a pending version."""
    if v <= applied:
        return
    actions = [json.loads(line) for line in
               bytes(blob).decode("utf-8").splitlines()
               if line.strip()]
    if v in pending:
        if pending[v] != actions:
            raise ValueError(
                f"conflicting commit payload at version {v}")
        return
    pending[v] = actions
    if len(pending) > MAX_PENDING:
        raise ValueError("pending commit cap exceeded")


def streaming_delta_tail(commits: DataFrame) -> DataFrame:
    """(table_id long, version long, commit binary) stream ->
    per-batch advanced snapshot rows."""

    def tail(key, pdfs, state: GroupState):
        import pandas as pd

        (table_id,) = key
        if state.exists:
            applied, live_json, n_removes, pending_json = state.get
            live = json.loads(live_json)
            pending = {int(k): v for k, v in
                       json.loads(pending_json).items()}
        else:
            applied, live, n_removes, pending = -1, {}, 0, {}
        for pdf in pdfs:
            for v, blob in zip(pdf["version"], pdf["commit"]):
                ingest_commit(applied, pending, int(v), blob)
        applied, live, n_removes, progressed = apply_pending(
            applied, live, n_removes, pending)
        state.update((applied, json.dumps(live), n_removes,
                      json.dumps(pending)))
        if not progressed:
            return iter([])
        sum_size = sum(f.get("size") or 0 for f in live.values())
        return iter([pd.DataFrame({
            "table_id": [table_id], "version": [applied],
            "n_live": [len(live)], "n_removes": [n_removes],
            "sum_size": [sum_size],
        })])

    return commits.groupBy("table_id").applyInPandasWithState(
        tail,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
