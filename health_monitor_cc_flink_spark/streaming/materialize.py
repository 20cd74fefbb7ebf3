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

from pyspark.sql import DataFrame

from .sinks import publish_dir_atomically, recover_published_dir


def upsert_snapshot(snapshot_path: str, key_cols: list[str]):
    """foreachBatch function: apply a batch of changed rows (update-mode
    output, one row per changed key, keyed by ``key_cols``) to the
    parquet snapshot.

    The snapshot is published via staging-dir + atomic rename
    (:func:`publish_dir_atomically`): a crash at any point leaves either
    the old or the new complete snapshot, and a replayed epoch re-merges
    against the recovered state instead of rebuilding the table from the
    one replayed batch."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        from functools import reduce

        from pyspark.sql import functions as F

        spark = batch.sparkSession
        recover_published_dir(snapshot_path)
        tmp = snapshot_path + "._staging"
        if os.path.exists(snapshot_path):
            current = spark.read.parquet(snapshot_path)
            # NULL-safe anti-join: grouping keys can legitimately be NULL
            # (a NULL-keyed aggregate group), and a plain equality anti-join
            # never matches NULL==NULL — the stale NULL-key row would
            # survive every epoch and accumulate next to its replacement
            upd = batch.select(*key_cols)
            cond = reduce(
                lambda a, b: a & b,
                [current[c].eqNullSafe(upd[c]) for c in key_cols],
            )
            kept = current.join(upd, on=cond, how="left_anti")
            merged = kept.unionByName(batch)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(tmp)
        publish_dir_atomically(tmp, snapshot_path)

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
    fn = upsert_snapshot(snapshot_path, key_cols)
    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
