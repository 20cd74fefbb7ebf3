"""Multi-dimensional data layout: Z-order (Morton) clustering.

Range-partitioning a table by ONE key gives min/max file pruning on that
key only; queries filtering on a second dimension still scan everything.
Interleaving the bits of both keys into a single Morton value and
range-partitioning by THAT clusters files into 2-D tiles, so a
rectangular predicate on (x, y) intersects only a few files' min/max
ranges — parquet row-group stats then skip the rest.  This is the
standard lakehouse Z-ORDER optimization, implemented with plain column
expressions (codegen'd; no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_Z_BITS = 16  # per-dimension resolution (2 dims → 32-bit Morton value)


def _normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int = _Z_BITS) -> Column:
    """Scale a numeric column to an integer bucket in [0, 2^bits)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.least(
        (clamped * ((1 << bits) - 1)).cast("bigint"), F.lit((1 << bits) - 1)
    )


def morton_interleave(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """Interleave the low ``bits`` of two bucket columns: x takes even bit
    positions, y odd — a pure shift/mask expression tree, fully codegen'd."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of two numeric
    columns: normalize both to 16-bit buckets (min/max from one tiny agg
    pass), Morton-interleave, range-partition and sort by the Z value.
    Each output file then covers a small 2-D tile of (cols[0], cols[1]),
    and parquet min/max stats prune files/row-groups for rectangular
    predicates on either or both columns."""
    cx, cy = cols
    stats = df.agg(
        F.min(F.col(cx).cast("double")).alias("xlo"),
        F.max(F.col(cx).cast("double")).alias("xhi"),
        F.min(F.col(cy).cast("double")).alias("ylo"),
        F.max(F.col(cy).cast("double")).alias("yhi"),
    ).first()
    xb = _normalize_to_bits(F.col(cx), F.lit(stats.xlo), F.lit(stats.xhi))
    yb = _normalize_to_bits(F.col(cy), F.lit(stats.ylo), F.lit(stats.yhi))
    z = morton_interleave(xb, yb)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
