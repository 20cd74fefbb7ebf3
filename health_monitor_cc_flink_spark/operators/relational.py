"""Relational operator helpers.

Most of the reference's relational surface (projection, filter, join,
aggregation — SURVEY.md §2.2-2.4) maps 1:1 onto the DataFrame API and
needs no wrapper.  This module covers the constructs with non-obvious
Spark spellings:

- ``key_search_agg``: the Confluent lookup table function
  (flink_statements.tf:124-131) surfaced with its array-of-matches
  return shape;
- ``unnest``: CROSS JOIN UNNEST with positional column aliasing (O15);
- ``tumble``/``hop``/``session``: windowing TVFs exposing Flink's
  window_start/window_end/window_time columns (O21; window_time =
  window_end − 1 ms, SURVEY.md §2.12.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def key_search_agg(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    result_col: str = "search_results",
) -> DataFrame:
    """KEY_SEARCH_AGG(dim, DESCRIPTOR(key), stream.key): for each stream
    row, all matching dimension rows as one ARRAY<ROW> column
    (reference flink_statements.tf:124-130).

    Implemented as: pre-aggregate the dimension to one array per key
    (tiny — dimension-sized), then broadcast-join.  Rows with no match
    get an empty array; a following :func:`unnest` reproduces the
    reference's inner-join drop-on-miss semantics.  The idiomatic engine
    path is a plain broadcast join (plans/health_pipeline.enriched_events);
    this form exists for SQL-surface parity.
    """
    packed = dim.groupBy(key).agg(
        F.collect_list(F.struct(*[c for c in dim.columns])).alias(result_col)
    )
    joined = stream.join(F.broadcast(packed), on=key, how="left")
    return joined.withColumn(
        result_col,
        F.coalesce(F.col(result_col), F.array().cast(joined.schema[result_col].dataType)),
    )


def unnest(
    df: DataFrame,
    array_col: str,
    aliases: Sequence[str] | None = None,
    keep: Sequence[str] | None = None,
    outer: bool = False,
) -> DataFrame:
    """CROSS JOIN UNNEST(arr) AS t(c1, c2, ...) — array-of-struct to
    rows with positional field renaming (O15).  ``outer=False`` drops
    rows with empty arrays (the reference's behavior)."""
    explode = F.explode_outer if outer else F.explode
    kept = [F.col(c) for c in (keep if keep is not None else [c for c in df.columns if c != array_col])]
    ex = df.select(*kept, explode(array_col).alias("__e"))
    elem_fields = [f.name for f in ex.schema["__e"].dataType.fields]
    names = list(aliases) if aliases else elem_fields
    return ex.select(
        *[c for c in kept],
        *[F.col(f"__e.{f}").alias(n) for f, n in zip(elem_fields, names)],
    )


def _with_window_cols(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .withColumn("window_time", F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND"))
        .drop("w")
    )


def tumble(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    """TUMBLE(TABLE t, DESCRIPTOR(ts), size) → adds window_start /
    window_end / window_time (flink_statements.tf:180-182)."""
    return _with_window_cols(df.withColumn("w", F.window(ts_col, size)))


def hop(df: DataFrame, ts_col: str, size: str, slide: str) -> DataFrame:
    """HOP (sliding) windowing TVF — not used by the reference but part
    of the platform surface (SURVEY.md §2.6)."""
    return _with_window_cols(df.withColumn("w", F.window(ts_col, size, slide)))


def session(
    df: DataFrame, ts_col: str, gap: str, partition_by: tuple = ()
) -> DataFrame:
    """SESSION windowing TVF (gap-based): every row gets its MERGED
    session's window_start / window_end / window_time, Flink semantics
    (end = last event in the session + gap).

    ``F.session_window`` in a projection would be wrong here: outside a
    groupBy aggregation it emits the unmerged per-row proto-window
    ``[ts, ts+gap)``, splitting every real session into per-event windows.
    Sessions merge via gaps-and-islands instead: a row starts a new
    session when it is more than ``gap`` after its predecessor, the
    running start-count is the session id, and the merged bounds are
    min/max aggregates windowed over (keys, session id) — two sorts on
    the same (keys, ts) order, no extra shuffle between them.

    ``partition_by`` carries Flink's optional PARTITION BY keys; keyless
    sessionization is inherently a single global ordering (same as
    Flink's non-keyed SESSION), so pass keys whenever the stream has
    them."""
    from pyspark.sql import Window

    gap_us = F.expr(f"unix_micros(timestamp_micros(0) + INTERVAL {gap})")
    keys = [F.col(c) for c in partition_by]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    marked = df.withColumn(
        "__is_start",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
        ).otherwise(0),
    ).withColumn(
        "__sid",
        F.sum("__is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy(*keys, F.col("__sid"))
    return (
        marked.withColumn("window_start", F.min(ts_col).over(ws))
        .withColumn(
            "window_end",
            F.timestamp_micros(F.max(us).over(ws) + gap_us),
        )
        .withColumn(
            "window_time", F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND")
        )
        .drop("__is_start", "__sid")
    )


def cumulate(df: DataFrame, ts_col: str, step_s: int, size_s: int) -> DataFrame:
    """CUMULATE windowing TVF (Flink's fourth TVF; no Spark native
    equivalent): base windows of ``size_s`` seconds aligned to the epoch,
    each emitting expanding sub-windows ending at start + k*step.  A row
    belongs to every sub-window of its base window whose end lies after
    the row's timestamp — composed as an explode of the (size/step)
    candidate ends plus a filter, all codegen'd column math.

    Adds window_start / window_end / window_time like :func:`tumble`.
    """
    if size_s % step_s != 0:
        raise ValueError("size must be a multiple of step")
    n = size_s // step_s
    # FLOOR alignment in pure integer micros: Spark's % keeps the dividend's
    # sign, so `sec - sec % size` rounds pre-epoch timestamps toward zero and
    # would assign a 1969 row to a base window STARTING AFTER it; the
    # double-mod floors exactly for any sign (matching F.window's alignment)
    # and integer micros never round (unlike a float unix_timestamp).
    size_us = size_s * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    start = F.timestamp_micros(
        us - ((us % size_us + size_us) % size_us)
    )
    ends = F.array(
        *[
            F.col("__cum_start") + F.expr(f"INTERVAL {k * step_s} SECOND")
            for k in range(1, n + 1)
        ]
    )
    out = (
        df.withColumn("__cum_start", start)
        .withColumn("window_end", F.explode(ends))
        .filter(F.col(ts_col) < F.col("window_end"))
        .withColumnRenamed("__cum_start", "window_start")
        .withColumn("window_time", F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND"))
    )
    return out
