"""Python DataSource writer: commit publishes exactly the acknowledged
task files; failure leaves no visible output (no _SUCCESS, no parts)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.sources.jsonl_sink import register
from health_monitor_cc_flink_spark.sources.testdata import load_table


def test_write_and_roundtrip(spark, sf_smoke_dir, tmp_path):
    register(spark)
    out = str(tmp_path / "audit")
    df = (
        load_table(spark, sf_smoke_dir, "events")
        .select("event_id", "user_id", "event_type")
        .repartition(4)
    )
    df.write.format("jsonl_audit").mode("append").option("path", out).save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == df.count()
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]

    back = spark.read.schema("event_id bigint, user_id bigint, event_type string").json(
        out + "/part-*.jsonl"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_failed_write_publishes_nothing(spark, sf_smoke_dir, tmp_path):
    register(spark)
    out = str(tmp_path / "audit_fail")
    df = load_table(spark, sf_smoke_dir, "events").select("event_id").repartition(2)
    with pytest.raises(Exception):
        df.write.format("jsonl_audit").mode("append").option("path", out).option("fail", "true").save()
    if os.path.isdir(out):
        assert not [f for f in os.listdir(out) if f.startswith("part-") or f == "_SUCCESS"]


def test_second_append_keeps_first_jobs_rows(spark, tmp_path):
    """Two append jobs to one path must both stay published: part names
    carry a per-job id (a second job previously os.replace()d the first
    job's part-00000), and the _SUCCESS manifest accumulates."""
    import json
    import os

    out = str(tmp_path / "audit_append")
    spark.createDataFrame([(1,), (2,)], "a long").coalesce(1).write.format(
        "jsonl_audit"
    ).mode("append").option("path", out).save()
    spark.createDataFrame([(3,), (4,)], "a long").coalesce(1).write.format(
        "jsonl_audit"
    ).mode("append").option("path", out).save()

    rows = spark.read.schema("a long").json(out + "/part-*.jsonl").collect()
    assert sorted(r.a for r in rows) == [1, 2, 3, 4]
    with open(os.path.join(out, "_SUCCESS")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 4 and len(manifest["files"]) == 2


def test_overwrite_sweeps_previous_parts(spark, tmp_path):
    """Overwrite mode replaces ALL previously published parts, including
    ones the new (smaller) job wouldn't collide with by name."""
    out = str(tmp_path / "audit_over")
    spark.createDataFrame([(i,) for i in range(8)], "a long").repartition(
        4
    ).write.format("jsonl_audit").mode("append").option("path", out).save()
    spark.createDataFrame([(100,)], "a long").coalesce(1).write.format(
        "jsonl_audit"
    ).mode("overwrite").option("path", out).save()

    rows = spark.read.schema("a long").json(out + "/part-*.jsonl").collect()
    assert sorted(r.a for r in rows) == [100]
