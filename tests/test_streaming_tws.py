"""transformWithStateInPandas anomaly path: must agree with the batch
operator on the same data (single availableNow pass)."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.plans.health_pipeline import windowed_vitals


@pytest.fixture(scope="module")
def smoothed_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tws") / "wv")
    events = health_events_df(spark, n_ticks=240, interval_s=0.5, seed=42)
    windowed_vitals(events).write.parquet(path)
    return path


def test_tws_matches_batch_anomalies(spark, smoothed_path, tmp_path):
    try:
        import google.protobuf  # noqa: F401  TWS state protocol needs protobuf
        from health_monitor_cc_flink_spark.streaming.tws import tws_detect_anomalies
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf, not present in this env; "
            "applyInPandasWithState path (tests/test_streaming.py) covers stateful ML"
        )

    from health_monitor_cc_flink_spark.functions.timeseries import ml_detect_anomalies

    batch = spark.read.parquet(smoothed_path)
    # FULL report parity, not just the boolean: warm-up rows must be NULL
    # across expected_value/bounds exactly as the batch operator emits them
    expected = {
        (r.patient_id, int(r.event_timestamp.timestamp() * 1_000_000)): (
            r.report.is_anomaly,
            r.report.expected_value,
            r.report.lower_bound,
            r.report.upper_bound,
        )
        for r in ml_detect_anomalies(
            batch, "observed_value", "event_timestamp", ["patient_id"], min_training_size=30
        ).collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(smoothed_path)
    out = str(tmp_path / "out")
    # TWS keeps each state variable in its own column family — only the
    # RocksDB provider supports that (and it's the at-scale choice anyway)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _run_tws(spark, stream, tmp_path, out, tws_detect_anomalies)
    finally:
        if prev_provider:
            spark.conf.set(provider_key, prev_provider)
        else:
            spark.conf.unset(provider_key)
    got = spark.read.parquet(out).collect()
    assert len(got) == len(expected)
    for r in got:
        exp = expected[(r.key, r.event_ts_us)]
        assert exp == (r.is_anomaly, r.expected_value, r.lower_bound, r.upper_bound), (
            r.key,
            r.event_ts_us,
        )


def _run_tws(spark, stream, tmp_path, out, tws_detect_anomalies):
    (
        tws_detect_anomalies(
            stream.withWatermark("event_timestamp", "10 seconds"),
            value_col="observed_value",
            ts_col="event_timestamp",
            key_col="patient_id",
            min_training_size=30,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_tws_checkpoint_restart_converges(spark, smoothed_path, tmp_path):
    """State survives a query restart: drain half the data, stop, add the
    rest, drain again with the SAME checkpoint — per-key RocksDB state
    (history ring buffers) must resume, so the final anomaly flags equal
    the single-pass batch answer exactly."""
    try:
        import google.protobuf  # noqa: F401
        from health_monitor_cc_flink_spark.streaming.tws import tws_detect_anomalies
    except ImportError:
        pytest.skip("google.protobuf unavailable")

    import os

    from health_monitor_cc_flink_spark.functions.timeseries import ml_detect_anomalies

    batch = spark.read.parquet(smoothed_path)
    expected = {
        (r.patient_id, int(r.event_timestamp.timestamp() * 1_000_000)): r.report.is_anomaly
        for r in ml_detect_anomalies(
            batch, "observed_value", "event_timestamp", ["patient_id"], min_training_size=30
        ).collect()
    }

    # split by time: first half, then the rest (event-time order per key is
    # what the operator requires; each drain sees in-order data)
    cut_us = batch.selectExpr(
        "CAST(percentile(unix_micros(event_timestamp), 0.5) AS BIGINT) AS c"
    ).first().c
    cut = F.timestamp_micros(F.lit(cut_us))
    data_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(data_dir)
    batch.filter(F.col("event_timestamp") <= cut).write.parquet(data_dir + "/p1.parquet")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def drain():
        stream = spark.readStream.schema(batch.schema).parquet(data_dir + "/*")
        (
            tws_detect_anomalies(
                stream.withWatermark("event_timestamp", "10 seconds"),
                value_col="observed_value",
                ts_col="event_timestamp",
                key_col="patient_id",
                min_training_size=30,
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    try:
        drain()
        n_first = len(spark.read.parquet(out).collect())
        assert 0 < n_first < len(expected), "first drain should be a strict prefix"
        batch.filter(F.col("event_timestamp") > cut).write.parquet(
            data_dir + "/p2.parquet"
        )
        drain()
    finally:
        if prev_provider:
            spark.conf.set(provider_key, prev_provider)
        else:
            spark.conf.unset(provider_key)

    got = spark.read.parquet(out).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.key, r.event_ts_us)] == r.is_anomaly
