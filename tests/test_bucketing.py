"""Bucketed co-located joins: the write-side layout that removes the
per-query shuffle from repeated fact-fact joins (SURVEY §4.2 scale
strategy).  Both sides bucketed by the join key into the same bucket
count must sort-merge join with no Exchange in the executed plan."""

import uuid

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.sources.testdata import load_table
from health_monitor_cc_flink_spark.sources.writer import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_smoke_dir):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_bkt_{suffix}", f"ord_bkt_{suffix}"
    write_bucketed(
        load_table(spark, sf_smoke_dir, "lineitem"), lt, ["l_orderkey"], n_buckets=8
    )
    write_bucketed(
        load_table(spark, sf_smoke_dir, "orders"), rt, ["o_orderkey"], n_buckets=8
    )
    yield lt, rt
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def _joined(spark, lt, rt):
    li, orders = spark.table(lt), spark.table(rt)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair, sf_smoke_dir):
    lt, rt = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, lt, rt)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # the join keys must NOT be shuffled (the post-join groupBy on
        # o_orderpriority legitimately exchanges on ITS key)
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        # contrast: the same join over plain parquet must shuffle both sides
        li = load_table(spark, sf_smoke_dir, "lineitem")
        orders = load_table(spark, sf_smoke_dir, "orders")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plain.collect()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" in plain_plan
        # and results agree
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_has_no_shuffle(spark, bucketed_pair):
    """groupBy on the bucket key also reuses the layout (no Exchange)."""
    lt, _ = bucketed_pair
    df = (
        spark.table(lt)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
