"""Local replica of the driver's Spark-vs-DuckDB comparison so oracle
mismatches surface in `pytest` before the driver ever runs: row count,
column-name set, and order-insensitive exact value comparison with
columns sorted by name."""

from __future__ import annotations

import math

import duckdb

from health_monitor_cc_flink_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Normalize to a canonical comparable value, PRESERVING the
    int-vs-float distinction: the driver's hash formats 123 and 123.0
    differently, so a Spark BIGINT column against a DuckDB DOUBLE oracle
    column must FAIL here even when the values are numerically equal
    (round-1 lesson: scalar_function_battery / pivot_event_counts)."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("b", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", float(v))
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, int):
        return ("i", int(v))
    return v


def _key(row):
    return tuple((x is None, x) for x in row)


def compare_frames(spark_df, duck_rel, name=""):
    """Return (ok, message).  Exact value equality after sorting columns
    by name and rows canonically — the strictest reading of the
    driver's hash comparison."""
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_rel.df()

    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"

    s_rows = sorted(
        (tuple(_norm(v) for v in row) for row in spark_pdf[s_cols].itertuples(index=False)),
        key=_key,
    )
    d_rows = sorted(
        (tuple(_norm(v) for v in row) for row in duck_pdf[s_cols].itertuples(index=False)),
        key=_key,
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            # distinguish exact-mismatch from approx-equality for diagnosis
            def _close(x, y):
                if x == y:
                    return True
                # unwrap ("f", v) / ("i", v) tags for the diagnostic only
                xv = x[1] if isinstance(x, tuple) and len(x) == 2 else x
                yv = y[1] if isinstance(y, tuple) and len(y) == 2 else y
                return (
                    isinstance(xv, (int, float))
                    and isinstance(yv, (int, float))
                    and math.isclose(xv, yv, rel_tol=1e-9, abs_tol=1e-9)
                )

            approx = all(_close(x, y) for x, y in zip(a, b))
            kind = "APPROX-ONLY" if approx else "VALUE"
            return False, f"{name}: {kind} mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return True, f"{name}: ok ({len(s_rows)} rows)"
