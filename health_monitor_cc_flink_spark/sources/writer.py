"""Write-side utilities: size-targeted compaction.

Small-files death and giant-file skew are the two write-side failure
modes at scale; ``write_compacted`` samples the serialized row size and
repartitions to hit a target file size before writing (optionally
range-partitioned by sort keys for downstream pruning/bucketed reads).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def estimate_row_bytes(df: DataFrame, sample_rows: int = 10_000) -> float:
    """Approximate on-disk bytes/row from a capped sample (parquet
    compresses ~3-5×; we use a conservative 3× over the in-memory CSV-ish
    estimate)."""
    sample = df.limit(sample_rows).select(
        F.length(F.to_json(F.struct(*df.columns))).alias("sz")
    )
    stats = sample.agg(F.avg("sz").alias("avg")).first()
    return max((stats.avg or 64.0) / 3.0, 8.0)


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Write parquet with files sized ≈ ``target_file_mb``.  Returns the
    partition count used.  With ``sort_by``, data is range-partitioned on
    those keys first (clustered files → better min/max pruning)."""
    n_rows = df.count()
    row_b = estimate_row_bytes(df)
    n_parts = max(1, math.ceil(n_rows * row_b / (target_file_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_parts, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_parts)
    out.write.mode(mode).parquet(path)
    return n_parts


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Bucketing is the shuffle-elimination layout for repeated large-scale
    joins/aggregations: two tables bucketed by the same key into the
    same bucket count sort-merge-join with NO Exchange on either side —
    at 100 TB that converts the dominant cost of every fact-fact join
    into a one-time write-side investment.  Requires ``saveAsTable``
    (bucket metadata lives in the session catalog).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
