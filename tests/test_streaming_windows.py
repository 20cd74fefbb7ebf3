"""Batch ≡ streaming for the remaining windowing TVFs (HOP, SESSION) on
watermark-closed windows, plus degenerate-input robustness."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.schemas import HEALTH_EVENT_SCHEMA


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("swin") / "events")
    health_events_df(spark, n_ticks=240, interval_s=0.5, seed=42).write.parquet(path)
    return path


def _run_stream(spark, agg_df, tmp_path, name):
    out = str(tmp_path / name)
    (
        agg_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out)


def _closed(batch_df, cutoff_col, cutoff):
    return batch_df.filter(F.col(cutoff_col) <= F.lit(cutoff))


def test_streaming_hop_equals_batch(spark, events_path, tmp_path):
    batch = spark.read.parquet(events_path)
    max_ts = batch.agg(F.max("event_time")).first()[0]

    def hop_agg(df):
        wm = df.withWatermark("event_time", "10 seconds") if df.isStreaming else df
        return (
            wm.groupBy(F.window("event_time", "10 seconds", "5 seconds").alias("w"), "patient_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("patient_id", F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
        )

    stream = spark.readStream.schema(HEALTH_EVENT_SCHEMA).parquet(events_path)
    got = _run_stream(spark, hop_agg(stream), tmp_path, "hop")
    # emitted set = windows closed by the final watermark
    import datetime

    cutoff = max_ts - datetime.timedelta(seconds=10)
    expected = hop_agg(batch).filter(F.col("we") <= F.lit(cutoff)).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected))


def test_streaming_session_equals_batch(spark, tmp_path):
    """Session windows: events with deliberate >gap pauses; compare
    closed sessions between batch and streaming."""
    import datetime

    base = datetime.datetime(2026, 3, 1)
    rows = []
    for k in (1, 2):
        t = base
        for burst in range(3):
            for i in range(5):
                rows.append((k, t))
                t += datetime.timedelta(seconds=2)
            t += datetime.timedelta(seconds=60)  # gap > 30 s closes the session
    df = spark.createDataFrame(rows, "patient_id int, event_time timestamp")
    path = str(tmp_path / "sess")
    df.write.parquet(path)

    def sess_agg(d):
        wm = d.withWatermark("event_time", "5 seconds") if d.isStreaming else d
        return (
            wm.groupBy(F.session_window("event_time", "30 seconds").alias("w"), "patient_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("patient_id", F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
        )

    stream = spark.readStream.schema(df.schema).parquet(path)
    got = _run_stream(spark, sess_agg(stream), tmp_path, "sess_out")
    max_ts = df.agg(F.max("event_time")).first()[0]
    cutoff = max_ts - datetime.timedelta(seconds=5)
    expected = sess_agg(df).filter(F.col("we") <= F.lit(cutoff)).collect()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected))
    # sanity: 2 keys × 3 bursts, last burst still open per key
    assert got.count() == 4


def test_pipeline_handles_empty_input(spark):
    from health_monitor_cc_flink_spark.plans.health_pipeline import run_pipeline
    from health_monitor_cc_flink_spark.sources.memory import patients_df

    empty = spark.createDataFrame([], HEALTH_EVENT_SCHEMA)
    stages = run_pipeline(empty, patients_df(spark))
    assert stages["heartbeat_alerts"].count() == 0
    assert stages["enriched_events"].count() == 0


def test_ml_functions_degenerate_series(spark):
    from health_monitor_cc_flink_spark.functions.timeseries import (
        ml_detect_anomalies,
        ml_forecast,
    )
    import datetime

    base = datetime.datetime(2026, 1, 1)
    # single point, two points, identical timestamps
    rows = [
        (1, base, 70.0),
        (2, base, 70.0),
        (2, base + datetime.timedelta(seconds=1), 71.0),
        (3, base, 70.0),
        (3, base, 70.0),  # duplicate ts within key
        (3, base + datetime.timedelta(seconds=1), 72.0),
    ]
    df = spark.createDataFrame(rows, "patient_id int, event_timestamp timestamp, observed_value double")
    an = ml_detect_anomalies(df, "observed_value", "event_timestamp", ["patient_id"]).collect()
    assert len(an) == 6
    assert not any(r.report.is_anomaly for r in an)  # all inside warm-up
    fc = ml_forecast(df, "observed_value", "event_timestamp", ["patient_id"]).collect()
    assert len(fc) == 6  # one row out per row in, arrays possibly empty
