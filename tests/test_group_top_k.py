"""Skew-safe two-phase group limit pins (operators/skew.py
group_top_k): ranks must be IDENTICAL to a single row_number window,
including on a 90%-hot group, for any k and salt count."""

import pytest
from pyspark.sql import Window, functions as F

from health_monitor_cc_flink_spark.operators.skew import group_top_k


@pytest.fixture(scope="module")
def spark():
    from health_monitor_cc_flink_spark.session import build_session

    s = build_session(master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _skewed(spark, n=20_000, hot_frac=0.9):
    """~hot_frac of rows land on one group; the rest spread thin."""
    return spark.range(n).select(
        F.when(
            F.col("id") < int(n * hot_frac), F.lit("hot.example.org")
        ).otherwise(
            F.concat(F.lit("site"), (F.col("id") % 97).cast("string"))
        ).alias("grp"),
        (F.xxhash64("id") % 1000).alias("score"),
        F.col("id"),
    )


@pytest.mark.parametrize("k,n_salts", [(2, 32), (1, 4), (5, 8)])
@pytest.mark.parametrize("min_salt", [None, 100])
def test_group_top_k_matches_single_window(spark, k, n_salts, min_salt):
    # min_salt None forces the two-phase plan; 100 makes the probe
    # pick it (the hot group far exceeds 100 rows) — both must rank
    # identically to one window
    df = _skewed(spark)
    order = [F.col("score").desc(), F.col("id")]
    got = group_top_k(
        df, ["grp"], order, ["id"], k, n_salts=n_salts, rank_col="r",
        min_salt_group_rows=min_salt,
    )
    w = Window.partitionBy("grp").orderBy(*order)
    want = (
        df.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_group_top_k_rejects_bad_k(spark):
    with pytest.raises(ValueError, match="k >= 1"):
        group_top_k(_skewed(spark, 10), ["grp"], [F.col("id")], ["id"], 0)


def test_group_top_k_two_phase_plan_shape(spark):
    """The plan must contain TWO window nodes (salted pre-pass +
    final) — the property that caps the per-task row count."""
    df = _skewed(spark, 1000)
    got = group_top_k(df, ["grp"], [F.col("id")], ["id"], 2,
                      min_salt_group_rows=None)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") >= 2


def test_group_top_k_probe_picks_plan(spark):
    """Balanced input below the threshold -> single-window plan (the
    ~2.6x two-phase constant is not paid); a group estimated above
    it -> salted two-phase plan."""
    df = _skewed(spark, 20_000, hot_frac=0.9)
    fast = group_top_k(df, ["grp"], [F.col("id")], ["id"], 2,
                       min_salt_group_rows=100_000)
    plan = fast._jdf.queryExecution().optimizedPlan().toString()
    # "Window [" counts window NODES (WindowGroupLimit also matches
    # a bare "Window" substring)
    assert plan.count("Window [") == 1
    salted = group_top_k(df, ["grp"], [F.col("id")], ["id"], 2,
                         min_salt_group_rows=1_000)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") >= 2


def test_estimate_max_group_rows_detects_hot_group(spark):
    from health_monitor_cc_flink_spark.operators.skew import (
        estimate_max_group_rows,
    )

    df = _skewed(spark, 50_000, hot_frac=0.9)
    est = estimate_max_group_rows(df, ["grp"], ["id"])
    # true hot group is 45k rows; the 1/64 sample estimate must land
    # the right order of magnitude (Poisson sigma ~27 samples)
    assert 25_000 < est < 70_000
    empty = spark.range(0).select(
        F.col("id").cast("string").alias("grp"), "id")
    assert estimate_max_group_rows(empty, ["grp"], ["id"]) == 0
