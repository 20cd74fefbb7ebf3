"""CTAS-style maintained table: after draining the stream, the parquet
snapshot must equal the batch aggregation over the same input — and keep
converging across incremental restarts (new data, same checkpoint)."""

import shutil

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.schemas import TESTDATA_EVENTS_RAW_SCHEMA
from health_monitor_cc_flink_spark.sources.testdata import events_stream, load_table
from health_monitor_cc_flink_spark.streaming.materialize import maintain_table


def test_snapshot_equals_batch_aggregate(spark, sf_smoke_dir, tmp_path):
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    src = events_stream(spark, sf_smoke_dir)
    agg = src.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    maintain_table(agg, snap, ["user_id"], ckpt).awaitTermination()

    got = {r.user_id: (r.n, r.sum_value) for r in spark.read.parquet(snap).collect()}
    want = {
        r.user_id: (r.n, r.sum_value)
        for r in load_table(spark, sf_smoke_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_incremental_restart_converges(spark, sf_smoke_dir, tmp_path):
    """Feed half the data, drain; add the rest, drain with the SAME
    checkpoint: the snapshot must equal the full batch answer (update-mode
    rows re-emit only changed keys; the upsert applies them)."""
    import os

    data_dir, snap, ckpt = str(tmp_path / "in"), str(tmp_path / "snap"), str(tmp_path / "ckpt")
    os.makedirs(data_dir)
    ev = load_table(spark, sf_smoke_dir, "events").select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type", "value", "props"
    )
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(data_dir + "/p1.parquet")

    def drain():
        src = spark.readStream.schema(TESTDATA_EVENTS_RAW_SCHEMA).parquet(data_dir + "/*")
        agg = src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        maintain_table(agg, snap, ["user_id"], ckpt).awaitTermination()

    drain()
    second.write.parquet(data_dir + "/p2.parquet")
    drain()

    got = {r.user_id: r.n for r in spark.read.parquet(snap).collect()}
    want = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_upsert_replaces_null_keyed_group(spark, tmp_path):
    """A NULL grouping key is a legitimate aggregate group; the snapshot
    upsert must REPLACE its row on later epochs, not append next to it
    (a plain equality anti-join never matches NULL==NULL)."""
    from health_monitor_cc_flink_spark.streaming.materialize import upsert_snapshot

    snap = str(tmp_path / "snap")
    apply_fn = upsert_snapshot(snap, ["k"])
    # epoch 1: one NULL-keyed and one normal group
    apply_fn(
        spark.createDataFrame([(None, 1), (7, 10)], "k int, n long"), 1
    )
    # epoch 2: both groups updated
    apply_fn(
        spark.createDataFrame([(None, 2), (7, 20)], "k int, n long"), 2
    )
    rows = {(r.k, r.n) for r in spark.read.parquet(snap).collect()}
    assert rows == {(None, 2), (7, 20)}, rows
