"""Data-quality profiling: one-pass per-column metrics for arbitrary
DataFrames — the validation step in front of any 100 TB ingest.

``profile`` computes everything in a single aggregation pass (one job,
no per-column scans): null counts, distinct counts, numeric min/max,
string length bounds.  Output is long-form (column, metric, value_*) so
downstream rules can join against thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.DecimalType, T.ShortType)


def profile(df: DataFrame) -> DataFrame:
    """Long-form profile: (column, metric, value) with value split into
    numeric/string channels so types stay clean."""
    aggs = [F.count(F.lit(1)).alias("__row_count")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        if isinstance(f.dataType, NUMERIC_TYPES):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(F.length(c)).cast("double").alias(f"{c}__min_len"))
            aggs.append(F.max(F.length(c)).cast("double").alias(f"{c}__max_len"))
    row = df.agg(*aggs)

    spark = df.sparkSession
    wide = row.collect()[0].asDict()
    n = wide.pop("__row_count")
    out_rows = []
    for k, v in wide.items():
        col_name, metric = k.rsplit("__", 1)
        out_rows.append((col_name, metric, float(v) if v is not None else None))
        if metric == "nulls":
            out_rows.append(
                (col_name, "null_frac", (float(v) / n) if n else None)
            )
    out_rows.append(("*", "row_count", float(n)))
    return spark.createDataFrame(out_rows, "column string, metric string, value double")


def check_constraints(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[str] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Constraint validation: returns one row per violated constraint
    (empty result = all constraints hold).  All checks in one pass each
    kind; suitable as a pipeline gate."""
    spark = df.sparkSession
    violations = []
    if not_null:
        null_counts = df.agg(
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in not_null]
        ).first()
        for c in not_null:
            if null_counts[c]:
                violations.append(("not_null", c, float(null_counts[c])))
    for c in unique:
        dups = df.groupBy(c).count().filter(F.col("count") > 1).count()
        if dups:
            violations.append(("unique", c, float(dups)))
    for c, (lo, hi) in (ranges or {}).items():
        bad = df.filter(~F.col(c).between(lo, hi)).count()
        if bad:
            violations.append(("range", c, float(bad)))
    return spark.createDataFrame(
        violations, "constraint string, column string, n_violations double"
    )
