"""Every registry query with an oracle must match DuckDB exactly —
this is a local pre-run of the driver's sf0.01 correctness gate.
Runs at sf0.001 by default (fast); set SPARK_GRAFT_PARITY_DIR=/root/testdata/sf0.01
to replicate the driver exactly."""

import os

import pytest

from health_monitor_cc_flink_spark.registry import all_queries

from oracle_utils import compare_frames, duck_connection

PARITY_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.001")

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(PARITY_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    sdf = spec.fn(spark, PARITY_DIR)
    rel = duck.sql(spec.oracle)
    ok, msg = compare_frames(sdf, rel, spec.name)
    assert ok, msg


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only_queries_run(spark, spec):
    df = spec.fn(spark, PARITY_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
