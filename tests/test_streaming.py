"""Streaming equivalence tests (SURVEY.md §5.2.4): each stage run via
Structured Streaming with a file source + availableNow trigger must
match the batch plan (modulo watermark-dropped late rows), and the
end-to-end streaming pipeline must reproduce the golden bradycardia
signal."""

import os

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.plans.health_pipeline import windowed_vitals
from health_monitor_cc_flink_spark.schemas import HEALTH_EVENT_SCHEMA
from health_monitor_cc_flink_spark.sources.memory import patients_df
from health_monitor_cc_flink_spark.streaming import (
    run_streaming_pipeline,
    streaming_windowed_vitals,
)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    health_events_df(spark, n_ticks=480, interval_s=0.5, seed=42).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_streaming_window_agg_equals_batch(spark, events_path, tmp_path):
    """Streaming append-mode emits exactly the windows the final
    watermark closed (watermark = max event time − delay at stream end);
    on those windows results must equal batch bit-for-bit."""
    batch_events = spark.read.parquet(events_path)
    cutoff = batch_events.agg(
        (F.max("event_time") - F.expr("INTERVAL 10 SECONDS")).alias("c")
    ).first().c
    expected = (
        windowed_vitals(batch_events).filter(F.col("event_timestamp") < F.lit(cutoff)).collect()
    )

    stream = spark.readStream.schema(HEALTH_EVENT_SCHEMA).parquet(events_path)
    out = str(tmp_path / "wv")
    (
        streaming_windowed_vitals(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out).collect()
    assert len(got) == len(expected)
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_streaming_pipeline_golden_bradycardia(spark, events_path, tmp_path):
    paths = run_streaming_pipeline(
        spark,
        events_path,
        HEALTH_EVENT_SCHEMA,
        patients_df(spark),
        out_dir=str(tmp_path / "pipe"),
    )
    assert set(paths) == {
        "enriched_events",
        "windowed_vitals",
        "enriched_events_flagged",
        "filtered_enriched_events",
        "heartbeat_alerts",
    }
    # dead-end enrichment branch materialized with joined dimension cols
    enriched = spark.read.parquet(paths["enriched_events"])
    assert {"name", "age"} <= set(enriched.columns)
    assert enriched.count() == 4800

    # cleaning stage drops every anomalous row
    filtered = spark.read.parquet(paths["filtered_enriched_events"])
    assert filtered.filter(F.col("is_anomaly")).count() == 0

    alerts = spark.read.parquet(paths["heartbeat_alerts"])
    alert_patients = {r.patient_id for r in alerts.select("patient_id").distinct().collect()}
    assert alert_patients == {1}
    assert alerts.filter(F.col("forecast_value") >= 40).count() == 0


def test_stream_static_dim_refresh_via_foreachbatch(spark, tmp_path):
    """O32 freshness: with foreachBatch re-reading the dimension from
    disk, a dimension update between micro-batches is visible to later
    batches (the stream-static refresh pattern)."""
    import datetime

    from health_monitor_cc_flink_spark.schemas import PATIENTS_SCHEMA

    base = datetime.datetime(2026, 6, 1)
    src = str(tmp_path / "src")
    dim_path = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "Old Name", 40)], PATIENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(dim_path)

    ev_schema = "patient_id int, event_time timestamp"

    def feed(sec):
        spark.createDataFrame(
            [(1, base + datetime.timedelta(seconds=sec))], ev_schema
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)

        def enrich(batch_df, batch_id):
            dim = spark.read.parquet(dim_path)  # re-read → always current
            batch_df.join(dim, "patient_id").write.mode("append").parquet(out)

        (
            stream.writeStream.foreachBatch(enrich)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    feed(0)
    run_once()
    # update the dimension, then stream more rows
    spark.createDataFrame([(1, "New Name", 41)], PATIENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(dim_path)
    feed(10)
    run_once()

    names = {r.event_time: r.name for r in spark.read.parquet(out).collect()}
    assert names[base] == "Old Name"
    assert names[base + datetime.timedelta(seconds=10)] == "New Name"


def test_stream_table_directory_layout(spark, tmp_path):
    """_stream_table must stream a Spark-written part-file DIRECTORY
    (the production table layout, also what scale-probe replicas write)
    identically to the driver's single-file layout."""
    from health_monitor_cc_flink_spark.sources.testdata import (
        _stream_table,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    # re-write as a directory named documents.parquet under a fresh root
    root = str(tmp_path / "dirsf")
    docs.write.mode("overwrite").parquet(f"{root}/documents.parquet")

    out = (
        _stream_table(spark, root, "documents")
        .groupBy()
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("dir_layout_count")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    n_stream = spark.table("dir_layout_count").first()[0]
    assert n_stream == docs.count()


def test_streaming_pipeline_continuous_mode_starts_and_flows(
    spark, events_path, tmp_path
):
    """available_now=False (the advertised continuous mode) must start
    all five chained queries without crashing — re-source schemas come
    from the upstream DataFrames, not from reading a not-yet-written
    parquet dir — and data must flow through at least the first stages
    while the queries run."""
    import time as _time

    paths = run_streaming_pipeline(
        spark,
        events_path,
        HEALTH_EVENT_SCHEMA,
        patients_df(spark),
        out_dir=str(tmp_path / "cont"),
        available_now=False,
    )
    # the run hands back its own StreamingQuery handles — no scraping
    # spark.streams.active (which races with unrelated queries)
    ours = list(paths.queries.values())
    try:
        assert len(ours) == 5 and all(q.isActive for q in ours)
        assert set(paths.queries) == set(paths)  # one handle per stage
        deadline = _time.time() + 90
        seen = 0
        while _time.time() < deadline:
            try:
                seen = spark.read.parquet(paths["windowed_vitals"]).count()
            except Exception:
                seen = 0
            if seen > 0:
                break
            _time.sleep(2)
        assert seen > 0, "no data flowed through the windowed stage"
        assert spark.read.parquet(paths["enriched_events"]).count() > 0
    finally:
        for q in ours:
            q.stop()
        for q in ours:
            q.awaitTermination(30)


def test_streaming_anomalies_warmup_rows_are_fully_null(spark, tmp_path):
    """Batch/stream parity on the WARM-UP mask: while the prev-fit sigma is
    non-finite (first rows of a key), BOTH batch paths NULL the whole
    report (expected_value included — the raw expected is a finite 0.0 or
    y[0] there), so the streaming scorer must too."""
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_detect_anomalies,
    )

    src = str(tmp_path / "warmup_src")
    spark.createDataFrame(
        [(1, i, 80.0 + (i % 5)) for i in range(12)], "user_id long, t long, v double"
    ).selectExpr(
        "user_id", "timestamp_seconds(t) AS ts", "v AS observed_value"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, observed_value double"
    ).parquet(src)
    flagged = streaming_detect_anomalies(
        stream.withWatermark("ts", "10 seconds"),
        value_col="observed_value",
        ts_col="ts",
        key_col="user_id",
        min_training_size=5,
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("warmup_null_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(spark.table("warmup_null_check").collect(), key=lambda r: r.event_timestamp)
    assert len(rows) == 12
    # rows 0-2: no valid prev fit (sigma inf) -> the whole report is NULL
    for r in rows[:3]:
        assert r.expected_value is None and r.lower_bound is None and r.upper_bound is None
    # from row 3 on the k>=2 fit exists -> all three present
    for r in rows[3:]:
        assert r.expected_value is not None and r.lower_bound is not None


def test_streaming_forecast_constant_history_emits_null_aic(spark, tmp_path):
    """A constant series gives sse=0: sigma clamps finite (rows emit) but
    aic is undefined — batch emits NULL there, so streaming must too (NaN
    would diverge under `aic IS NULL` filters and the oracle hash)."""
    import math

    from health_monitor_cc_flink_spark.streaming.stateful import streaming_forecast

    src = str(tmp_path / "const_src")
    spark.createDataFrame(
        [(1, i, 50.0) for i in range(8)], "user_id long, t long, v double"
    ).selectExpr(
        "user_id", "timestamp_seconds(t) AS ts", "v AS observed_value"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, observed_value double"
    ).parquet(src)
    fc = streaming_forecast(
        stream.withWatermark("ts", "10 seconds"),
        value_col="observed_value",
        ts_col="ts",
        key_col="user_id",
        min_training_size=2,
    )
    q = (
        fc.writeStream.format("memory")
        .queryName("const_aic_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("const_aic_check").collect()
    assert rows, "constant series must still emit forecasts (sigma clamps finite)"
    for r in rows:
        assert r.aic is None or math.isfinite(r.aic), f"NaN leaked into aic: {r}"
    assert any(r.aic is None for r in rows), "sse=0 rows must have NULL aic"
