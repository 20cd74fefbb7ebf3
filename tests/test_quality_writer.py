"""Data-quality profiling + constraint checks + compacted writer."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.quality import check_constraints, profile
from health_monitor_cc_flink_spark.sources.testdata import load_table
from health_monitor_cc_flink_spark.sources.writer import write_compacted


def test_profile_metrics(spark, sf_smoke_dir):
    ev = load_table(spark, sf_smoke_dir, "events")
    p = {(r.column, r.metric): r.value for r in profile(ev).collect()}
    assert p[("*", "row_count")] == 1000.0
    assert p[("event_id", "nulls")] == 0.0
    assert p[("event_id", "distinct")] == 1000.0
    assert p[("user_id", "min")] == 0.0 and p[("user_id", "max")] == 14.0
    assert p[("event_type", "min_len")] >= 4.0
    assert p[("value", "null_frac")] == 0.0


def test_constraints_pass_and_fail(spark, sf_smoke_dir):
    ev = load_table(spark, sf_smoke_dir, "events")
    ok = check_constraints(
        ev,
        not_null=["event_id", "ts_ns"],
        unique=["event_id"],
        ranges={"user_id": (0, 14)},
    )
    assert ok.count() == 0
    bad = check_constraints(ev, unique=["user_id"], ranges={"value": (0, 10)})
    rows = {r.constraint: r.n_violations for r in bad.collect()}
    assert rows["unique"] > 0 and rows["range"] > 0


def test_write_compacted_targets_file_size(spark, sf_smoke_dir, tmp_path):
    li = load_table(spark, sf_smoke_dir, "lineitem")
    out = str(tmp_path / "compact")
    n_parts = write_compacted(li, out, target_file_mb=1, sort_by=["l_orderkey"])
    assert n_parts >= 1
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # clustered by sort key: each file's key range is narrow → min/max pruning works
    pruned = back.filter(F.col("l_orderkey") < 100)
    assert pruned.count() == li.filter(F.col("l_orderkey") < 100).count()
