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

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, functions as F


def recover_published_dir(final_dir: str) -> None:
    """Crash recovery for :func:`publish_dir_atomically`: if a previous
    process died between its two renames, the last committed state lives
    in ``<final>_old`` — restore it.  Call before reading ``final_dir``."""
    old = final_dir + "_old"
    if os.path.exists(old):
        if os.path.exists(final_dir):
            shutil.rmtree(old)  # crash after publish, before cleanup
        else:
            os.rename(old, final_dir)  # crash between the two renames


def publish_dir_atomically(tmp_dir: str, final_dir: str) -> None:
    """Replace ``final_dir`` with ``tmp_dir`` so that EVERY crash point
    leaves a recoverable committed state: demote final to ``_old``,
    promote tmp, drop ``_old``.  A bare rmtree-then-rename (the naive
    swap) has a window where neither directory exists and a replayed
    foreachBatch epoch would silently rebuild state from that one batch;
    here the pre-epoch state survives any crash and
    :func:`recover_published_dir` restores it on the next call.

    CONCURRENT-READER CONTRACT: the swap is crash-atomic for the WRITER,
    not for readers — between the two renames ``final_dir`` briefly does
    not exist, so a reader racing a live continuous-mode writer can see
    PATH_NOT_FOUND for a microsecond window and should retry.  (A fully
    reader-atomic publish needs a symlink/manifest indirection or a table
    format — Delta/Iceberg MERGE — which is the stated at-scale swap-in;
    this filesystem fallback keeps the same operator contract.)"""
    old = final_dir + "_old"
    if os.path.exists(final_dir):
        os.rename(final_dir, old)
    os.rename(tmp_dir, final_dir)
    shutil.rmtree(old, ignore_errors=True)


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Return a ``foreachBatch`` function writing each epoch to
    ``<path>/batch_id=<id>`` with partition-overwrite semantics: replays
    of the same epoch overwrite their own output (exactly-once effect),
    distinct epochs append new partitions.

    Overwrite mode is writer-scoped (``.option("partitionOverwriteMode",
    "dynamic")``) rather than set on the session conf: two concurrent
    queries sharing one session must not race on a global flag — a
    static overwrite sneaking in would truncate the whole table to one
    epoch."""

    def _write(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

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
    from pyspark.sql import Window

    def merge(batch_df, epoch_id):
        s = batch_df.sparkSession
        recover_published_dir(state_dir)
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
        publish_dir_atomically(tmp, state_dir)

    return merge


def delta_append_commit(log_dir: str, version: int,
                        actions: list[dict]) -> bool:
    """Idempotently append ``<version>.json`` to a ``_delta_log/``
    directory.  foreachBatch delivers epochs at-least-once, so a
    replayed commit with IDENTICAL bytes is a no-op (returns False);
    a different payload at an existing version raises — the same
    conflict contract streaming_delta_tail applies on the read side.
    Returns True when the commit was newly written.  Driver-side,
    file-census-sized: only add/remove action metadata flows here,
    never data rows."""
    from ..operators.delta_log import build_delta_log, commit_filename

    os.makedirs(log_dir, exist_ok=True)
    blob = build_delta_log({version: actions})[
        commit_filename(version)]
    path = os.path.join(log_dir, commit_filename(version))
    if os.path.exists(path):
        with open(path, "rb") as f:
            if f.read() == blob:
                return False
        raise ValueError(
            f"conflicting commit payload at version {version}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.rename(tmp, path)  # atomic publish of the commit
    return True


def delta_write_checkpoint(log_dir: str) -> int:
    """Replay the ``_delta_log/`` directory with the own log walker
    and write a checkpoint parquet (own parquet writer) plus
    ``_last_checkpoint`` at the current version; returns that
    version.  Earlier commits stay on disk (vacuum is a separate
    concern) — a reader seeds from the checkpoint and replays only
    later commits."""
    import json

    from ..operators.delta_log import (
        checkpoint_filename,
        parse_delta_log_files,
        write_checkpoint_parquet,
    )

    files = {}
    for name in os.listdir(log_dir):
        with open(os.path.join(log_dir, name), "rb") as f:
            files[name] = f.read()
    # sibling .bin DV files: merge-on-read replays resolve their
    # deletion vectors before the checkpoint is written
    table_dir = os.path.dirname(log_dir.rstrip("/"))
    if table_dir and os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            if name.endswith(".bin"):
                with open(os.path.join(table_dir, name), "rb") as f:
                    files[name] = f.read()
    snap = parse_delta_log_files(files)
    blob, n_actions = write_checkpoint_parquet(snap)
    v = snap["version"]
    ck = os.path.join(log_dir, checkpoint_filename(v))
    tmp = ck + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.rename(tmp, ck)
    lc = json.dumps({"version": v, "size": n_actions},
                    separators=(",", ":")).encode("utf-8")
    tmp = os.path.join(log_dir, "_last_checkpoint.tmp")
    with open(tmp, "wb") as f:
        f.write(lc)
    os.rename(tmp, os.path.join(log_dir, "_last_checkpoint"))
    return v


def delta_read_snapshot(log_dir: str) -> dict:
    """Replay a ``_delta_log/`` directory -> snapshot dict (seeds
    from ``_last_checkpoint`` when present, replays later commits).
    Sibling ``.bin`` deletion-vector files from the table directory
    ride along so merge-on-read snapshots resolve their vectors
    (the replay validates CRC/size/cardinality per descriptor)."""
    from ..operators.delta_log import parse_delta_log_files

    files = {}
    for name in os.listdir(log_dir):
        if name.endswith(".tmp"):
            continue
        with open(os.path.join(log_dir, name), "rb") as f:
            files[name] = f.read()
    table_dir = os.path.dirname(log_dir.rstrip("/"))
    if table_dir and os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            if name.endswith(".bin"):
                with open(os.path.join(table_dir, name), "rb") as f:
                    files[name] = f.read()
    return parse_delta_log_files(files)
