"""Watermark-finalized streaming CEP: arrival-order independence.

The whole point of finalizing on the event-time timer is that a LATE
click can create a match the purchase already "missed", and a LATE
error can invalidate a match an emit-on-sight matcher would already
have emitted.  This feeds those exact scenarios across separate
micro-batches (maxFilesPerTrigger=1, increasing file mtimes) and
asserts the final match set equals the batch CEP answer.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from health_monitor_cc_flink_spark.streaming.stateful import (
    streaming_cep_click_purchase,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

BASE = 1_767_225_600  # 2026-01-01T00:00:00Z epoch seconds


def _write_batch(spark, spec, out_dir, name, mtime):
    """spec: list of (user_id, event_type, t_offset_s).  One parquet
    file named so the file source sees increasing modification times."""
    data = [
        (i, uid, et, (BASE + off) * 1_000_000)
        for i, (uid, et, off) in enumerate(spec)
    ]
    df = (
        spark.createDataFrame(
            data, "event_id long, user_id long, event_type string, ts_us long"
        )
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .select("event_id", "ts", "user_id", "event_type")
        .coalesce(1)
    )
    tmp = out_dir + f"_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f"{name}.parquet")
    shutil.copyfile(os.path.join(tmp, part), dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


# (user, type, offset_s) — event_ids are assigned per batch but the
# operator orders by (t, event_id) and no two events of one user share t
BATCH1 = [
    (1, "click", 100), (1, "purchase", 200),          # clean match
    (2, "click", 100), (2, "error", 150), (2, "purchase", 200),  # error between
    (3, "purchase", 100),                              # no click
    (4, "click", 100), (4, "purchase", 2000),          # outside 30-min window
    (5, "purchase", 300),                              # click arrives LATE
    (6, "click", 300), (6, "purchase", 400),           # error arrives LATE
]
BATCH2 = [
    (5, "click", 250),   # out-of-order: creates u5's match retroactively
    (6, "error", 350),   # out-of-order: invalidates u6's match
]
BATCH3 = [(99, "view", 100_000)]  # sentinel: pushes watermark past everything


def test_streaming_cep_out_of_order_equals_batch(spark, tmp_path):
    src = str(tmp_path / "cep_src")
    now = time.time()
    _write_batch(spark, BATCH1, src, "a", now - 300)
    _write_batch(spark, BATCH2, src, "b", now - 200)
    _write_batch(spark, BATCH3, src, "c", now - 100)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    out_dir = str(tmp_path / "cep_out")
    (
        streaming_cep_click_purchase(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cep_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.user_id, r.gap_us)
        for r in spark.read.parquet(out_dir).collect()
    }
    # u1 matches (gap 100 s); u5 matches ONLY because the late click was
    # folded in before finalization (gap 50 s); u6 does NOT match ONLY
    # because the late error invalidated it; u2/u3/u4 never match.
    assert got == {(1, 100_000_000), (5, 50_000_000)}


def test_streaming_cep_no_premature_emission(spark, tmp_path):
    """Without the sentinel, nothing is finalized (watermark never
    passes any purchase) — exactly-once means zero early emissions."""
    src = str(tmp_path / "cep_src2")
    now = time.time()
    _write_batch(spark, BATCH1, src, "a", now - 300)

    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    out_dir = str(tmp_path / "cep_out2")
    (
        streaming_cep_click_purchase(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cep_ckpt2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert spark.read.parquet(out_dir).count() == 0


def test_streaming_cep_state_survives_restart(spark, tmp_path):
    """Stop after batch 1 and RESTART from the checkpoint with the late
    events + sentinel: the carried click/error state and the
    out-of-order buffer must persist across runs, and every match is
    emitted exactly once across both runs combined."""
    src = str(tmp_path / "cep_src3")
    out_dir = str(tmp_path / "cep_out3")
    ckpt = str(tmp_path / "cep_ckpt3")
    now = time.time()

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        (
            streaming_cep_click_purchase(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _write_batch(spark, BATCH1, src, "a", now - 300)
    run_once()  # nothing finalizable yet: watermark below all events
    _write_batch(spark, BATCH2, src, "b", now - 200)
    _write_batch(spark, BATCH3, src, "c", now - 100)
    run_once()  # restart: buffer + carries recovered, sentinel finalizes

    got = [
        (r.user_id, r.gap_us) for r in spark.read.parquet(out_dir).collect()
    ]
    assert sorted(got) == [(1, 100_000_000), (5, 50_000_000)]  # exactly once


def test_streaming_window_funnel_late_events_upgrade_steps(spark, tmp_path):
    """A late click+purchase arriving after the signup was seen must
    still produce steps=3 once the window closes — the funnel waits
    for the full pattern window, never scores on sight."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_window_funnel,
    )

    src = str(tmp_path / "funnel_src")
    now = time.time()
    # u1: full funnel, but click/purchase arrive LATE; u2: click only
    _write_batch(spark, [(1, "signup", 100), (1, "purchase", 300),
                         (2, "signup", 100), (2, "click", 150)], src, "a", now - 300)
    _write_batch(spark, [(1, "click", 200)], src, "b", now - 200)
    _write_batch(spark, [(99, "view", 1_000_000)], src, "c", now - 100)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    out_dir = str(tmp_path / "funnel_out")
    (
        streaming_window_funnel(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "funnel_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {(r.user_id, r.steps) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, 3), (2, 2)}


def test_streaming_window_funnel_state_survives_restart(spark, tmp_path):
    """Funnel buffer must persist across checkpointed restarts: signup
    in run 1, its click/purchase + sentinel in run 2 — the signup is
    scored once, correctly, after recovery."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_window_funnel,
    )

    src = str(tmp_path / "f2_src")
    out_dir = str(tmp_path / "f2_out")
    ckpt = str(tmp_path / "f2_ckpt")
    now = time.time()

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        (
            streaming_window_funnel(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _write_batch(spark, [(1, "signup", 100)], src, "a", now - 300)
    run_once()
    _write_batch(spark, [(1, "click", 200), (1, "purchase", 300),
                         (99, "view", 1_000_000)], src, "b", now - 200)
    run_once()
    got = [(r.user_id, r.steps) for r in spark.read.parquet(out_dir).collect()]
    assert got == [(1, 3)]


def test_streaming_rate_limit_late_rows_batch_parity(spark, tmp_path):
    """Late-data contract (matches Spark's built-in windowed agg and the
    batch operator): a late row that still passes Spark's late-event
    filter (which lags the eviction watermark by one batch) joins its
    window BEFORE finalization and counts toward the top-n — the batch
    answer over all events.  A row beyond the late-filter horizon is
    dropped by Spark itself, so a finalized (key, window) can never be
    re-emitted — append output contains each exactly once."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_rate_limit_first_n,
    )

    src = str(tmp_path / "rl_src")
    now = time.time()
    _write_batch(spark, [(1, "click", 70), (1, "click", 80), (1, "click", 90)],
                 src, "a", now - 400)
    _write_batch(spark, [(99, "view", 10_000)], src, "b", now - 300)  # advance wm
    # LATE but within the one-batch late-filter lag: reaches the operator
    # in the same invocation that finalizes window [60, 120)
    _write_batch(spark, [(1, "click", 75)], src, "c", now - 250)
    _write_batch(spark, [(99, "view", 20_000)], src, "d", now - 200)
    # beyond the late-filter horizon (wm is now ~16400): Spark drops it
    # before the operator — must NOT resurrect the finalized window
    _write_batch(spark, [(1, "click", 76)], src, "e", now - 100)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    out_dir = str(tmp_path / "rl_out")
    (
        streaming_rate_limit_first_n(stream, n_keep=2, window_us=60_000_000)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "rl_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = [
        r for r in spark.read.parquet(out_dir).collect() if r.user_id == 1
    ]
    # first n_keep=2 by EVENT time over ALL arrived events = (70, 75) —
    # identical to the batch operator's answer; exactly one emission of
    # the (key, window) pair
    assert sorted(r.ts_us - BASE * 1_000_000 for r in rows) == [
        70_000_000, 75_000_000
    ]
    assert sorted((r.window_start_us, r.seq_in_window) for r in rows) == [
        ((BASE * 1_000_000 + 60_000_000) // 60_000_000 * 60_000_000, 1),
        ((BASE * 1_000_000 + 60_000_000) // 60_000_000 * 60_000_000, 2),
    ]


def test_streaming_cep_idle_key_state_is_cleaned_up(spark, tmp_path):
    """A key whose only event is a click (never a purchase, never any
    further data) must not keep state forever: the carry-TTL timer must
    fire off the watermark alone and remove the state row."""
    src = str(tmp_path / "idle_src")
    out_dir = str(tmp_path / "idle_out")
    ckpt = str(tmp_path / "idle_ckpt")
    now = time.time()

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        q = (
            streaming_cep_click_purchase(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # run 1: the click is finalized (wm passes it) but the carry TTL has
    # not expired yet (wm < click + 30 min) — carry survives with a timer
    _write_batch(spark, [(1, "click", 100)], src, "a", now - 300)
    _write_batch(spark, [(99, "view", 4_700)], src, "b", now - 200)
    q1 = run_once()
    # 2 state rows: key 1's surviving carry + key 99's own in-flight
    # sentinel event (still above the watermark)
    assert q1.lastProgress["stateOperators"][0]["numRowsTotal"] == 2

    # run 2: ONLY a watermark-advancing sentinel — no data for key 1.
    # The armed timer must fire, expire the carry, and remove key 1's
    # state; only key 99's new in-flight sentinel row remains.
    _write_batch(spark, [(99, "view", 100_000)], src, "c", now - 100)
    q2 = run_once()
    assert q2.lastProgress["stateOperators"][0]["numRowsTotal"] == 1
    assert spark.read.parquet(out_dir).count() == 0  # and no spurious matches


def test_streaming_rate_limit_state_survives_restart(spark, tmp_path):
    """Stop before finalization and RESTART from the checkpoint: the
    buffered per-(key, window) best-n state must persist, fold in a
    pre-watermark row from the second run, and emit the event-time
    first-2 exactly once across both runs."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_rate_limit_first_n,
    )

    src = str(tmp_path / "rlr_src")
    out_dir = str(tmp_path / "rlr_out")
    ckpt = str(tmp_path / "rlr_ckpt")
    now = time.time()

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withWatermark("ts", "1 hour")
        )
        (
            streaming_rate_limit_first_n(stream, n_keep=2, window_us=60_000_000)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _write_batch(spark, [(1, "click", 70), (1, "click", 80), (1, "click", 90)],
                 src, "a", now - 300)
    run_once()  # watermark below the window end: nothing emitted yet
    assert spark.read.parquet(out_dir).count() == 0
    # run 2: a still-open-window row with an EARLIER event time than the
    # buffered best, plus the finalizing sentinel
    _write_batch(spark, [(1, "click", 65)], src, "b", now - 200)
    _write_batch(spark, [(99, "view", 10_000)], src, "c", now - 100)
    run_once()
    rows = [r for r in spark.read.parquet(out_dir).collect() if r.user_id == 1]
    assert sorted((r.ts_us - BASE * 1_000_000, r.seq_in_window) for r in rows) == [
        (65_000_000, 1), (70_000_000, 2)
    ]


def test_streaming_anomalies_drop_below_watermark_rows(spark, tmp_path):
    """A row arriving below the watermark must be dropped by the
    streaming scorer, not appended out-of-event-order into the AR
    history: the emitted set contains only the in-watermark rows, and
    the late row produces no output row."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_detect_anomalies,
    )

    src = str(tmp_path / "anom_src")
    now = time.time()
    # batch a: 40 in-order points for key 1 (offsets 0..39 s)
    _write_batch(spark, [(1, "v", i) for i in range(40)], src, "a", now - 400)
    # batch b: far-future row pushes the watermark past batch a
    _write_batch(spark, [(1, "v", 100_000)], src, "b", now - 300)
    # batch c: LATE row (below the watermark now at 100_000 - 3600)
    _write_batch(spark, [(1, "v", 50)], src, "c", now - 200)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    # score event_id as the value column (deterministic integers)
    flagged = streaming_detect_anomalies(
        stream.withColumn("value", F.col("event_id").cast("double")),
        value_col="value",
        ts_col="ts",
        key_col="user_id",
        min_training_size=30,
    )
    out_dir = str(tmp_path / "anom_out")
    (
        flagged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got_ts = sorted(
        r.event_timestamp.timestamp() - BASE
        for r in spark.read.parquet(out_dir).collect()
    )
    # 40 batch-a rows + the future sentinel row; the late offset-50 row
    # must NOT appear (and must not have corrupted the history order)
    assert got_ts == [float(i) for i in range(40)] + [100_000.0]


def test_streaming_window_funnel_idle_key_state_is_cleaned_up(spark, tmp_path):
    """A key whose stream ends without a trailing signup (here: a lone
    click) must not keep its buffered events forever: the cleanup timer
    must fire off the watermark alone and remove the state row."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_window_funnel,
    )

    src = str(tmp_path / "fidle_src")
    out_dir = str(tmp_path / "fidle_out")
    ckpt = str(tmp_path / "fidle_ckpt")
    now = time.time()
    # key 1: a click and nothing else, ever; key 99: watermark sentinels
    _write_batch(spark, [(1, "click", 100)], src, "a", now - 300)
    _write_batch(spark, [(99, "view", 200_000)], src, "b", now - 200)
    _write_batch(spark, [(99, "view", 300_000)], src, "c", now - 100)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        streaming_window_funnel(stream, window_us=600_000_000)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # key 1's state was evicted by the timer; only key 99's own
    # still-in-flight sentinel rows remain
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1
    assert spark.read.parquet(out_dir).count() == 0  # no signup, no rows
