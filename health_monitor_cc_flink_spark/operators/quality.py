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
    numeric/string channels so types stay clean.

    Fully in-plan: the single wide aggregation row is unpivoted with
    ``stack`` instead of collect()+createDataFrame, so the profile
    composes into larger plans (and streams through foreachBatch)
    without a driver round-trip."""
    aggs = [F.count(F.lit(1)).cast("double").alias("__row_count")]
    pairs: list[tuple[str, str]] = [("*", "__row_count")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("double").alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).cast("double").alias(f"{c}__distinct"))
        pairs += [(c, f"{c}__nulls"), (c, f"{c}__distinct")]
        if isinstance(f.dataType, NUMERIC_TYPES):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            pairs += [(c, f"{c}__min"), (c, f"{c}__max")]
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(F.length(c)).cast("double").alias(f"{c}__min_len"))
            aggs.append(F.max(F.length(c)).cast("double").alias(f"{c}__max_len"))
            pairs += [(c, f"{c}__min_len"), (c, f"{c}__max_len")]
    row = df.agg(*aggs)

    def lit_sql(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    stack_args = ", ".join(
        f"{lit_sql(col)}, {lit_sql('row_count' if a == '__row_count' else a.rsplit('__', 1)[1])}, `{a}`"
        for col, a in pairs
    )
    long = row.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (column, metric, value)"),
        F.col("__row_count").alias("__n"),
    )
    null_frac = long.filter(F.col("metric") == "nulls").select(
        "column",
        F.lit("null_frac").alias("metric"),
        F.when(F.col("__n") > 0, F.col("value") / F.col("__n")).alias("value"),
    )
    return long.select("column", "metric", "value").unionByName(null_frac)


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
