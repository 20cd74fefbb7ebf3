"""PERMISSIVE-mode corrupt-record capture for the CSV ingest path: the
registry's source_csv_malformed_drop proves DROPMALFORMED quarantines bad
lines (oracle-exact good rows); this pins the capture variant — planted
malformed lines land in _corrupt_record with the raw text preserved, and
the parsed frame must be cached before corrupt-only queries (Spark's
documented QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction)."""

import os

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.registry import all_queries
from health_monitor_cc_flink_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_permissive_capture_quarantines_planted_lines(spark):
    spec = {s.name: s for s in all_queries()}["source_csv_malformed_drop"]
    spec.fn(spark, SF).count()  # builds the polluted CSV dir as a side effect

    from health_monitor_cc_flink_spark.registry import _warehouse_path

    path = _warehouse_path(SF, "events_csv_malformed")
    assert os.path.exists(os.path.join(path, "part-corrupt.csv"))
    df = (
        spark.read.schema(
            "event_id bigint, ts_us bigint, user_id bigint, event_type string, "
            "value double, _corrupt_record string"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    try:
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 2
        raws = sorted(r["_corrupt_record"] for r in bad.collect())
        assert raws == ["not,a,valid", "xx,yy,zz,qq,ww"]
        n_events = load_table(spark, SF, "events").count()
        assert df.filter(F.col("_corrupt_record").isNull()).count() == n_events
    finally:
        df.unpersist()
