"""SparkSession construction for the engine.

Design notes (100 TB north star, tested on local[32]):

- **AQE on** (`spark.sql.adaptive.enabled`): runtime shuffle-partition
  coalescing + skew-join splitting.  At cluster scale the static
  ``spark.sql.shuffle.partitions`` is only an upper bound; AQE right-sizes
  per stage, which also fixes the reference's tiny-key-cardinality case
  (10 patients; SURVEY.md §4.2 "shuffle partitioning").
- **Arrow on** for every pandas-UDF exchange: the ML time-series
  operators (functions/timeseries.py) cross the JVM↔Python boundary in
  columnar batches, not rows.
- **UTC session timezone**: all event-time semantics are
  timezone-independent, and results stay comparable to naive-timestamp
  oracles (DuckDB) bit-for-bit.
- **nanosAsLong**: some driver-testdata generations store `events.ts`
  as parquet TIMESTAMP(NANOS), which Spark does not map to
  TimestampType; with this conf it reads as int64 nanos.  Newer
  generations use timestamp[us].  sources.testdata probes the footer
  and normalizes either encoding to (ts_ns int64, ts timestamp);
  windowing floors compose, so bucket assignment is identical either
  way.  The conf is harmless when the column is already µs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are runtime-settable; applied to *any* session handed to
#: us (the verification driver builds its own SparkSession, so every
#: query entry point calls :func:`ensure_runtime_confs` defensively).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # nested-schema pruning: S4 reads only vitals.heart_rate out of the
    # wide nested event record (SURVEY.md §4.2) — keep scans narrow.
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def default_shuffle_partitions() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return max(int(cpus), 4)
    return max(os.cpu_count() or 8, 8)


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    return spark


def build_session(
    app_name: str = "health-monitor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    On a real cluster ``master`` comes from the deploy environment; the
    partitioning/AQE settings below are the ones that matter at scale.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or default_master())
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or default_shuffle_partitions()),
        )
        # pandas-UDF batches: large enough to amortize Arrow transfer,
        # small enough to keep peak memory bounded per task.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session → re-apply.
    return ensure_runtime_confs(spark)
