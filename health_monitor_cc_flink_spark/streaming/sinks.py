"""Idempotent batch sinks for ``foreachBatch`` (O33 delivery semantics).

Structured Streaming guarantees ``foreachBatch`` sees each epoch at
least once with a stable ``batch_id``; exactly-once OUTPUT therefore
reduces to making the per-epoch write idempotent.  The standard lake
pattern: write each epoch to its own ``batch_id=N`` partition with
dynamic partition overwrite — a replayed epoch replaces its own
directory instead of appending duplicates.

    q = (df.writeStream
           .foreachBatch(idempotent_parquet_sink(path))
           .option("checkpointLocation", ckpt)
           .start())

Readers see parquet partitioned by ``batch_id``; downstream consumers
that don't care read ``spark.read.parquet(path)`` and drop the column.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Return a ``foreachBatch`` function writing each epoch to
    ``<path>/batch_id=<id>`` with partition-overwrite semantics: replays
    of the same epoch overwrite their own output (exactly-once effect),
    distinct epochs append new partitions."""

    def _write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return _write
