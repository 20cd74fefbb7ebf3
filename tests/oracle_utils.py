"""Local replica of the driver's Spark-vs-DuckDB comparison so oracle
mismatches surface in `pytest` before the driver ever runs: row count,
column-name set, and order-insensitive exact value comparison with
columns sorted by name.

Values are taken from ``spark_df.collect()`` and ``duck_rel.fetchall()``
— NOT through pandas.  ``toPandas()`` converts a nullable BIGINT column
to float64 (NULL→NaN, 123→123.0), which destroys the int-vs-float and
NULL-vs-NaN distinctions this gate exists to catch: a Spark BIGINT
against a DuckDB DOUBLE oracle would compare equal through pandas but
hash differently at the driver (the round-1 scalar_function_battery /
pivot_event_counts lesson).
"""

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
    int-vs-float, NULL-vs-NaN, and int-vs-Decimal distinctions — the
    driver's hash formats each differently, so numerically-equal values
    of different types must FAIL here."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("b", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            # NaN is a VALUE, distinct from SQL NULL; the one-element tag
            # compares equal to itself and sorts against ("f", x) tuples on
            # the first element alone (never mixing str with float)
            return ("fnan",)
        return ("f", float(v))
    if hasattr(v, "item") and type(v).__module__ == "numpy":  # numpy scalar
        return _norm(v.item())
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, bytearray):  # Spark BinaryType collects as bytearray
        return bytes(v)
    return v


def _key(row):
    return tuple((x is None, repr(type(x)), x) for x in row)


def compare_frames(spark_df, duck_rel, name=""):
    """Return (ok, message).  Exact value equality after sorting columns
    by name and rows canonically — the strictest reading of the
    driver's hash comparison."""
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    if s_cols != d_cols:
        return False, f"{name}: column mismatch spark={s_cols} duck={d_cols}"

    s_raw = spark_df.collect()
    d_raw = duck_rel.fetchall()
    if len(s_raw) != len(d_raw):
        return False, f"{name}: row count spark={len(s_raw)} duck={len(d_raw)}"

    duck_order = list(duck_rel.columns)
    d_idx = [duck_order.index(c) for c in d_cols]
    s_rows = sorted(
        (tuple(_norm(r[c]) for c in s_cols) for r in s_raw), key=_key
    )
    d_rows = sorted(
        (tuple(_norm(t[i]) for i in d_idx) for t in d_raw), key=_key
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
