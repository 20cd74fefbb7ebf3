"""Continuously-maintained derived tables (the reference's CTAS semantic).

A Flink `CREATE TABLE AS SELECT` over an aggregation maintains a
changelog-backed table: every input batch UPSERTS the changed keys
(SURVEY §1.3 stream/table duality).  Structured Streaming's update
output mode emits exactly those changed rows; this sink applies them to
a parquet snapshot via read → anti-join → union → atomic swap.  At real
scale the swap becomes a Delta/Iceberg MERGE INTO — the operator
contract (changed-rows in, current-table out) is identical.

    q = maintain_table(agg_df, path, key_cols=["user_id"], ckpt=...)
    q.awaitTermination()
    spark.read.parquet(path)   # == the batch aggregation over all input
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def upsert_snapshot(snapshot_path: str):
    """foreachBatch function: apply a batch of changed rows (update-mode
    output, one row per changed key) to the parquet snapshot."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        key_cols = batch.schema.names[:1] if not hasattr(_apply, "keys") else _apply.keys
        tmp = snapshot_path + f"._staging_{batch_id}"
        if os.path.exists(snapshot_path):
            current = spark.read.parquet(snapshot_path)
            kept = current.join(batch.select(*key_cols), on=key_cols, how="left_anti")
            merged = kept.unionByName(batch)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(snapshot_path)
        shutil.rmtree(tmp, ignore_errors=True)

    return _apply


def maintain_table(
    agg: DataFrame,
    snapshot_path: str,
    key_cols: list[str],
    checkpoint: str,
    available_now: bool = True,
):
    """Start an update-mode query maintaining ``snapshot_path`` as the
    current state of ``agg`` (a streaming aggregation keyed by
    ``key_cols``)."""
    fn = upsert_snapshot(snapshot_path)
    fn.keys = key_cols
    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
