"""Streaming state recovery: a stateful operator restarted from its
checkpoint must carry per-key state across availableNow runs (warm-up
counts span batches), and the engine's fused vs per-stage materialized
pipeline modes must agree."""

import datetime

import pytest
from pyspark.sql import functions as F


def test_stateful_anomaly_state_survives_restart(spark, tmp_path):
    """Feed 20 points, run; feed 20 more, run with SAME checkpoint: rows
    31+ must be scored as trained (warm-up=30 spans the two runs) —
    proving the history buffer persisted in the state store."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_detect_anomalies,
    )

    base = datetime.datetime(2026, 5, 1)
    path = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "patient_id long, event_timestamp timestamp, observed_value double"

    def feed(start, n, vals=None):
        rows = [
            (1, base + datetime.timedelta(seconds=start + i),
             float(vals[i] if vals else 70.0))
            for i in range(n)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    def run_once():
        stream = spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
        (
            streaming_detect_anomalies(
                stream.withWatermark("event_timestamp", "10 seconds"),
                value_col="observed_value",
                ts_col="event_timestamp",
                key_col="patient_id",
                min_training_size=30,
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    feed(0, 20)
    run_once()
    # second batch: 20 steady points then a wild outlier at position 39
    vals = [70.0] * 19 + [500.0]
    feed(20, 20, vals)
    run_once()

    got = sorted(spark.read.parquet(out).collect(), key=lambda r: r.event_timestamp)
    assert len(got) == 40
    # outlier is row index 39 → past the cross-run warm-up of 30 → flagged
    assert got[39].observed_value == 500.0 and got[39].is_anomaly
    # nothing in the warm-up window was flagged
    assert not any(r.is_anomaly for r in got[:30])


def test_fused_and_materialized_pipelines_agree(spark):
    from health_monitor_cc_flink_spark.catalog import EngineCatalog
    from health_monitor_cc_flink_spark.fixtures import health_events_df
    from health_monitor_cc_flink_spark.plans.health_pipeline import run_pipeline
    from health_monitor_cc_flink_spark.sources.memory import patients_df

    events = health_events_df(spark, n_ticks=240, interval_s=0.5, seed=42)
    patients = patients_df(spark)
    cat = EngineCatalog(spark)
    fused = run_pipeline(events, patients, catalog=cat, materialize=False)
    fused_alerts = sorted(
        map(tuple, fused["heartbeat_alerts"].select("patient_id", "event_timestamp").collect())
    )
    mat = run_pipeline(events, patients, catalog=cat, materialize=True)
    mat_alerts = sorted(
        map(tuple, mat["heartbeat_alerts"].select("patient_id", "event_timestamp").collect())
    )
    assert fused_alerts == mat_alerts
