"""Streaming assembly of the health pipeline (SURVEY.md M5):
file/Kafka stream source → watermarked windowed smoothing → stateful
anomaly filter → stateful forecast → threshold alerts, with per-stage
sinks mirroring the reference's per-topic topology (O27, §7.5).

All stages are append-mode (the reference workload is append-only
everywhere — SURVEY.md §1.3), so results match the batch plans modulo
watermark-dropped late rows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.health_pipeline import ALERT_THRESHOLD
from .stateful import streaming_detect_anomalies, streaming_forecast
from .watermark import with_default_watermark


def read_events_file_stream(
    spark: SparkSession, path: str, schema, ts_col: str = "event_time"
) -> DataFrame:
    """File-based stream source (the test/CI stand-in for the Kafka+Avro
    source in sources/kafka.py; availableNow triggers replay it)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_enriched_events(events: DataFrame, patients: DataFrame) -> DataFrame:
    """S3, streaming: stream-static broadcast join (static side re-read
    per micro-batch under foreachBatch refresh; O32)."""
    return events.join(F.broadcast(patients), on="patient_id", how="inner")


def streaming_windowed_vitals(
    events: DataFrame,
    window: str = "1 second",
    watermark_delay: str | None = None,
    ts_col: str = "event_time",
    key_col: str = "patient_id",
    value_col: str = "vitals.heart_rate",
) -> DataFrame:
    """S4's windowed smoothing, streaming: watermark → tumble → avg.
    Append mode emits once per closed window."""
    wm = with_default_watermark(events, ts_col, watermark_delay)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.avg(value_col).alias("observed_value"))
        .select(
            key_col,
            (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("event_timestamp"),
            "observed_value",
        )
    )


class PipelineRun(dict):
    """``{stage_name: output_path}`` plus ``.queries`` — the live
    ``StreamingQuery`` handle per stage.  In continuous mode the caller
    needs them to await, stop, or read ``.exception()`` from each stage
    (discarding them would make stage failures undetectable); after an
    ``availableNow`` drain they are terminated handles kept for status."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.queries: dict = {}


def run_streaming_pipeline(
    spark: SparkSession,
    events_path: str | None,
    schema,
    patients: DataFrame,
    out_dir: str | None = None,
    window: str = "1 second",
    min_training_size: int = 30,
    threshold: float = ALERT_THRESHOLD,
    available_now: bool = True,
    events_stream: DataFrame | None = None,
) -> dict[str, str]:
    """Run the 4-stage pipeline as chained streaming queries with
    per-stage parquet sinks (faithful topology: each stage's output is a
    named, independently-readable table, like the reference's per-stage
    Kafka topics).  With ``available_now`` the run drains the source and
    terminates — the batch≡streaming test harness.

    Returns a ``PipelineRun``: ``{stage_name: output_path}`` whose
    ``.queries`` maps stage name → its ``StreamingQuery`` (live in
    continuous mode — await/stop/inspect failures through these).
    """
    out_dir = out_dir or tempfile.mkdtemp(prefix="hm_stream_")
    paths = PipelineRun()

    def sink(df: DataFrame, name: str) -> str:
        path = os.path.join(out_dir, name)
        # pre-create the sink dir: in continuous mode the next stage's
        # file-stream source starts against it before the first
        # micro-batch commits, and an empty dir + explicit schema is
        # valid where a missing path is not
        os.makedirs(path, exist_ok=True)
        q = (
            df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", path)
            .option("checkpointLocation", os.path.join(out_dir, f"_ckpt_{name}"))
        )
        q = q.trigger(availableNow=True) if available_now else q.trigger(processingTime="1 second")
        sq = q.start()
        if available_now:
            sq.awaitTermination()
        paths.queries[name] = sq
        paths[name] = path
        return path

    events = (
        events_stream
        if events_stream is not None
        else read_events_file_stream(spark, events_path, schema)
    )

    # stage 1: enrichment (dead-end branch, reference §2.12.1)
    sink(streaming_enriched_events(events, patients), "enriched_events")

    # stage 2a: windowed smoothing.  Spark allows only one stateful
    # operator per append-mode query, so the smoothing aggregation and
    # the stateful anomaly detector run as separate jobs wired through a
    # materialized table — exactly the reference's statement-per-topic
    # topology (each Flink statement is its own job; SURVEY.md O27).
    smoothed = streaming_windowed_vitals(events, window=window)
    sink(smoothed, "windowed_vitals")

    # stage 2b: stateful anomaly detection over the re-sourced stream.
    # Schemas of the re-sourced stages come from the upstream streaming
    # DataFrames (statically known), NOT from reading the materialized
    # parquet — in continuous mode that directory has no committed files
    # yet when this line runs.
    smoothed_src = spark.readStream.schema(smoothed.schema).parquet(
        paths["windowed_vitals"]
    )
    flagged = streaming_detect_anomalies(
        with_default_watermark(smoothed_src, "event_timestamp"),
        value_col="observed_value",
        ts_col="event_timestamp",
        key_col="patient_id",
        min_training_size=min_training_size,
    )
    sink(flagged, "enriched_events_flagged")

    # stage 3: anomaly filter (drop direction, reference §2.12.2) over the
    # materialized stage-2 output — re-sourced as a fresh stream
    flagged_src = spark.readStream.schema(flagged.schema).parquet(
        paths["enriched_events_flagged"]
    )
    filtered = flagged_src.filter(F.col("is_anomaly") == F.lit(False))
    sink(filtered, "filtered_enriched_events")

    # stage 4: stateful forecast + threshold alerts
    filtered_src = spark.readStream.schema(filtered.schema).parquet(
        paths["filtered_enriched_events"]
    )
    fc = streaming_forecast(
        with_default_watermark(filtered_src, "event_timestamp"),
        value_col="observed_value",
        ts_col="event_timestamp",
        key_col="key",
        min_training_size=2,
    )
    alerts = fc.filter(F.col("forecast_value") < threshold).select(
        F.col("key").alias("patient_id"),
        "event_timestamp",
        "current_value",
        "forecast_value",
        "lower_bound",
        "upper_bound",
    )
    sink(alerts, "heartbeat_alerts")
    return paths
