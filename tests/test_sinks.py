"""Idempotent foreachBatch sink: replaying an epoch must not duplicate
output (the exactly-once-output half of O33); distinct epochs append."""

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.streaming import idempotent_parquet_sink
from health_monitor_cc_flink_spark.sources.testdata import load_table


def test_replayed_epoch_is_idempotent(spark, sf_smoke_dir, tmp_path):
    path = str(tmp_path / "out")
    sink = idempotent_parquet_sink(path)
    batch = load_table(spark, sf_smoke_dir, "events").select("event_id", "user_id").limit(100)

    sink(batch, 0)
    n_once = spark.read.parquet(path).count()
    sink(batch, 0)  # replay of the same epoch (failure/retry)
    n_replay = spark.read.parquet(path).count()
    assert n_once == n_replay == 100

    sink(batch, 1)  # a genuinely new epoch appends its own partition
    assert spark.read.parquet(path).count() == 200
    assert {r.batch_id for r in spark.read.parquet(path).select("batch_id").distinct().collect()} == {0, 1}


def test_sink_under_real_stream(spark, sf_smoke_dir, tmp_path):
    """End-to-end: file-stream drained availableNow through the sink; a
    second run with the SAME checkpoint must not re-emit (no new rows)."""
    from health_monitor_cc_flink_spark.sources.testdata import events_stream

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        src = events_stream(spark, sf_smoke_dir)
        (
            src.select("event_id", "user_id")
            .writeStream.foreachBatch(idempotent_parquet_sink(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    n1 = spark.read.parquet(out).count()
    run()  # restart from checkpoint: source exhausted, nothing re-emitted
    n2 = spark.read.parquet(out).count()
    expected = load_table(spark, sf_smoke_dir, "events").count()
    assert n1 == n2 == expected


def test_cdc_merge_tombstone_not_resurrected_across_batches(spark, tmp_path):
    """Cross-batch CDC merge semantics: a LATE update (older event time)
    arriving in a later batch must lose to the stored tombstone, and a
    late update must also lose to a stored newer update — last-writer-
    wins by EVENT time, not arrival time."""
    from health_monitor_cc_flink_spark.streaming.sinks import cdc_merge_batch

    state = str(tmp_path / "cdc_state")
    merge = cdc_merge_batch(state)
    schema = "user_id long, event_type string, value double, ts_us long, event_id long"

    # batch 1: u1 deleted at t=200; u2 updated at t=200
    merge(
        spark.createDataFrame(
            [(1, "error", 0.0, 200, 10), (2, "click", 5.0, 200, 11)], schema
        ),
        0,
    )
    # batch 2 (late arrivals): u1 update at t=150 (must NOT resurrect),
    # u2 update at t=150 (must lose), u3 fresh update
    merge(
        spark.createDataFrame(
            [(1, "click", 9.0, 150, 12), (2, "click", 9.0, 150, 13),
             (3, "view", 7.0, 100, 14)],
            schema,
        ),
        1,
    )
    from pyspark.sql import functions as F

    snap = {
        r.user_id: (r.value, r.tombstone)
        for r in spark.read.parquet(state).collect()
    }
    assert snap[1] == (0.0, True), "tombstone resurrected by late update"
    assert snap[2] == (5.0, False), "newer stored update lost to late arrival"
    assert snap[3] == (7.0, False)
    live = spark.read.parquet(state).filter(~F.col("tombstone")).count()
    assert live == 2


def test_publish_dir_atomically_every_crash_point_recovers(spark, tmp_path):
    """The state-publish protocol (demote final -> _old, promote tmp,
    drop _old) must leave a recoverable committed state at EVERY crash
    point; recover_published_dir restores it.  A bare rmtree+rename has
    a window where a replayed epoch would rebuild state from one batch."""
    import os

    from health_monitor_cc_flink_spark.streaming.sinks import (
        publish_dir_atomically,
        recover_published_dir,
    )

    final = str(tmp_path / "state")

    def write(tag, to):
        spark.createDataFrame([(tag,)], "v string").write.mode("overwrite").parquet(to)

    # normal publish v1 then v2
    write("v1", str(tmp_path / "t1"))
    publish_dir_atomically(str(tmp_path / "t1"), final)
    write("v2", str(tmp_path / "t2"))
    publish_dir_atomically(str(tmp_path / "t2"), final)
    assert spark.read.parquet(final).first().v == "v2"

    # crash point A: between the two renames (final demoted, tmp not yet
    # promoted) — committed state lives in _old and must come back
    os.rename(final, final + "_old")
    recover_published_dir(final)
    assert spark.read.parquet(final).first().v == "v2"
    assert not os.path.exists(final + "_old")

    # crash point B: after promote, before _old cleanup — final wins,
    # stale _old is swept
    write("v3", str(tmp_path / "t3"))
    os.rename(final, final + "_old")
    os.rename(str(tmp_path / "t3"), final)
    recover_published_dir(final)
    assert spark.read.parquet(final).first().v == "v3"
    assert not os.path.exists(final + "_old")


def test_cdc_merge_survives_simulated_crash_between_renames(spark, tmp_path):
    """cdc state after a crash mid-publish + epoch replay must still
    contain keys from EARLIER epochs (the naive swap lost them all)."""
    import os

    from health_monitor_cc_flink_spark.streaming.sinks import cdc_merge_batch

    state = str(tmp_path / "cdc_state")
    merge = cdc_merge_batch(state)
    cols = "user_id long, event_type string, value double, ts_us long, event_id long"
    merge(spark.createDataFrame([(1, "update", 1.0, 100, 1)], cols), 0)
    merge(spark.createDataFrame([(2, "update", 2.0, 200, 2)], cols), 1)

    # simulate dying between the demote and promote renames, then the
    # replayed epoch arriving
    os.rename(state, state + "_old")
    merge(spark.createDataFrame([(2, "update", 2.0, 200, 2)], cols), 1)

    rows = {r.user_id: r.value for r in spark.read.parquet(state).collect()}
    assert rows == {1: 1.0, 2: 2.0}  # key 1 survived the crash + replay
