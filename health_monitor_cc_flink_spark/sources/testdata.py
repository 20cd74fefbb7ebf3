"""Readers for the driver-provided parquet testdata (TESTDATA.md).

The only non-trivial table is ``events``: its ``ts`` column is parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as int64 epoch
nanos; :func:`load_events` keeps that exact integer as ``ts_ns`` (used
whenever an oracle-exact value is needed) and adds a µs-truncated proper
``ts`` TimestampType column for event-time operators.  Truncation is
safe for windowing because floors compose: flooring nanos to µs and then
to any window size equals flooring nanos directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import TESTDATA_TABLES
from ..session import ensure_runtime_confs


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; events gets timestamp normalization."""
    ensure_runtime_confs(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_runtime_confs(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    )


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
