"""Salted-join semantics + partition-spread checks."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows of one hot key + 5k spread over 100 keys
    hot = spark.range(50_000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(5_000).select((F.col("id") % 100 + 100).alias("k"), F.col("id").alias("payload"))
    return hot.union(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(300).select(F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("label"))


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").count()
    salted = salted_join(skewed, dim, "k", n_salts=8).groupBy("k").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark, skewed):
    parts = (
        skewed.withColumn("_salt", (F.rand(42) * 8).cast("int"))
        .filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(parts) == 8  # hot key split across all salt partitions
    counts = [r["count"] for r in parts]
    assert max(counts) < 50_000 * 0.25  # no salt holds the whole key


def test_salted_left_join_preserves_misses(spark, dim):
    fact = spark.range(10).select((F.col("id") + 295).alias("k"))  # 295..304; 300+ miss
    out = salted_join(fact, dim, "k", n_salts=4, how="left")
    rows = {r.k: r.label for r in out.collect()}
    assert len(rows) == 10
    assert rows[304] is None and rows[295] == "d295"
