"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``      — flagship smoke query at sf0.001.
- ``queries()``         — every implemented operator (SURVEY.md §2 +
                          data-pipeline extensions) as (spark, sf_dir) → DataFrame.
- ``oracle_sql()``      — matching DuckDB SQL for the hash-compare gate;
                          rows-only ops (pandas-UDF paths, float-order-
                          sensitive centroids) are intentionally absent.

Implementations live in health_monitor_cc_flink_spark/registry*.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from health_monitor_cc_flink_spark.protobuf_shim import bootstrap_protobuf  # noqa: E402
from health_monitor_cc_flink_spark.registry import all_queries  # noqa: E402
from health_monitor_cc_flink_spark.session import ensure_runtime_confs  # noqa: E402

# transformWithStateInPandas needs google.protobuf in the JVM-spawned
# state-server workers; the shim must extend PYTHONPATH BEFORE the
# SparkSession/JVM starts, so run it at import time (no-op elsewhere)
bootstrap_protobuf()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's S4→S6 alert path on the stand-in stream —
    1 s tumbling smoothing per key, AR(1) forecast over the cumulative
    per-key frame, explode + threshold (reference flink_statements.tf
    S4/S6 semantics on the driver's events table)."""
    from pyspark.sql import functions as F

    from health_monitor_cc_flink_spark.functions.timeseries import ml_forecast
    from health_monitor_cc_flink_spark.sources.testdata import load_events

    ensure_runtime_confs(spark)
    events = load_events(spark, "/root/testdata/sf0.001")
    smoothed = (
        events.groupBy(F.window("ts", "1 second").alias("w"), "user_id")
        .agg(F.avg("value").alias("observed_value"))
        .select(
            "user_id",
            F.col("w.end").alias("event_timestamp"),
            "observed_value",
        )
    )
    fc = ml_forecast(
        smoothed,
        value_col="observed_value",
        ts_col="event_timestamp",
        key_cols=["user_id"],
        horizon=1,
        min_training_size=5,
    )
    return (
        fc.select(
            "user_id",
            F.unix_micros("event_timestamp").alias("event_ts_us"),
            F.col("observed_value").alias("current_value"),
            F.explode("forecast_values").alias("f"),
        )
        .select(
            "user_id",
            "event_ts_us",
            "current_value",
            F.col("f.forecast_value").alias("forecast_value"),
        )
        .filter(F.col("forecast_value") < 40)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for spec in all_queries():
        def wrapped(spark, sf_dir, _fn=spec.fn):
            ensure_runtime_confs(spark)
            return _fn(spark, sf_dir)

        out[spec.name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in all_queries() if spec.oracle}
