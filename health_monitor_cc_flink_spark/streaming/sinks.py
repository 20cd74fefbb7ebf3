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


def cdc_merge_batch(state_dir: str):
    """foreachBatch merge for streaming CDC apply: per micro-batch,
    reduce the batch to its per-key latest, merge with the persisted
    state under (ts_us, event_id) last-writer-wins, and KEEP tombstone
    rows in state so an out-of-order update arriving after a delete
    cannot resurrect the key.  Atomic swap via write-to-tmp + rename.

    Expects columns (user_id, event_type, value, ts_us, event_id);
    'error' rows are deletes.  Read-out filters tombstones.
    """
    import os
    import shutil

    from pyspark.sql import Window, functions as F

    def merge(batch_df, epoch_id):
        s = batch_df.sparkSession
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        new = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "value",
                "ts_us",
                "event_id",
                (F.col("event_type") == "error").alias("tombstone"),
            )
        )
        if os.path.exists(state_dir):
            both = s.read.parquet(state_dir).unionByName(new)
        else:
            both = new
        merged = (
            both.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        tmp = state_dir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    return merge
