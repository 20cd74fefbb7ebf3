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


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE's runtime skew-join handling must kick in on a hot key: with
    thresholds lowered to test scale the executed SortMergeJoin is marked
    skew=true (the hot partition split across tasks), and the result is
    exact. Complements the manual salted_join path."""
    from pyspark.sql import functions as F

    n_hot, n_cold = 500_000, 1_000
    # md5 payloads so shuffle compression doesn't shrink the hot partition
    # below the skew threshold
    left = (
        spark.range(n_hot).select(F.lit(0).alias("k"), F.md5(F.col("id").cast("string")).alias("payload"))
        .union(
            spark.range(n_cold).select(
                (F.col("id") % 50 + 1).alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
            )
        )
    )
    right = spark.range(51).select(F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("rv"))
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # NOTE: no groupBy on the join key downstream — a required hash
        # distribution on k would forbid AQE from splitting the skewed
        # partition (splitting breaks co-partitioning).
        joined = (
            spark.read.parquet(lp)
            .join(spark.read.parquet(rp), on="k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("n_hot"),
            )
        )
        row = joined.collect()[0]
        assert row.n_hot == n_hot and row.n == n_hot + n_cold
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
