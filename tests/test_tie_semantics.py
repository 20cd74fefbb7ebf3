"""Engine-parity on TIE-HEAVY data the driver's testdata never exercises.

Round-6 review found three latent divergences that the sf* fixtures mask
because they contain zero (user_id, value)-max ties, zero (user_id, ts)
duplicates, and unique customer keys:

  * agg_arg_extremes — DuckDB's ordered max_by keeps the SMALLEST arg on a
    tied maximum; Spark's max(struct) kept the largest.
  * latest_per_key — same divergence on timestamp ties.
  * sessions_bounce_rate — the session-id running sum ordered only by t,
    so same-microsecond rows could land in either session.
  * setop_except — exceptAll+distinct is not EXCEPT-distinct when the left
    side has duplicate rows.

This file regenerates those shapes deliberately (synthetic parquet with the
exact testdata schemas) and asserts Spark==DuckDB on them, so the semantics
stay pinned no matter what the driver's generator emits.  Also pins the
winnowing MOSS guarantee on >1024-token documents (the radix-encoding
overflow regime of the old kh*1024 encoding).
"""

import os

import duckdb
import pytest

from health_monitor_cc_flink_spark.registry import all_queries

from oracle_utils import compare_frames

SPECS = {s.name: s for s in all_queries()}

TIE_QUERIES = [
    "agg_arg_extremes",
    "latest_per_key",
    "sessions_bounce_rate",
    "setop_except",
]


@pytest.fixture(scope="module")
def tie_dir(spark, tmp_path_factory):
    """Synthetic tables with engineered ties, written with the exact
    testdata schemas (sampled real rows + crafted tie rows)."""
    root = str(tmp_path_factory.mktemp("ties"))
    real = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(50)
    crafted = spark.createDataFrame(
        [
            # user 9001: tied MAXIMUM value (99.5 at event_id 6 and 8) and
            # tied minimum (1.5 at 2 and 4)
            (900_001_002, "2024-03-01 10:00:00.000001", 9001, "view", 1.5, None),
            (900_001_004, "2024-03-01 10:00:10.000001", 9001, "view", 1.5, None),
            (900_001_006, "2024-03-01 10:00:20.000001", 9001, "click", 99.5, None),
            (900_001_008, "2024-03-01 10:00:30.000001", 9001, "click", 99.5, None),
            # user 9002: two events in the SAME microsecond (ts tie), with a
            # 30-min session boundary exactly at one of them
            (900_002_001, "2024-03-02 09:00:00.000777", 9002, "signup", 5.0, None),
            (900_002_002, "2024-03-02 09:00:00.000777", 9002, "view", 6.0, None),
            (900_002_003, "2024-03-02 09:40:00.000123", 9002, "purchase", 7.0, None),
            (900_002_004, "2024-03-02 09:40:00.000123", 9002, "view", 8.0, None),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props"
    )
    real.unionByName(crafted).coalesce(1).write.parquet(os.path.join(root, "events.parquet"))

    # customer with DUPLICATE custkeys, some of which also appear in orders:
    # EXCEPT-distinct must drop key 1 entirely (dup on left + present on right)
    spark.createDataFrame(
        [
            (1, "dup-a", 0, 0.0, "SEG"),
            (1, "dup-b", 0, 0.0, "SEG"),
            (2, "only-left-dup", 1, 0.0, "SEG"),
            (2, "only-left-dup2", 1, 0.0, "SEG"),
            (3, "plain", 1, 0.0, "SEG"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(os.path.join(root, "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, "O", 1.0, "1995-01-01")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate",
    ).coalesce(1).write.parquet(os.path.join(root, "orders.parquet"))
    return root


@pytest.fixture(scope="module")
def tie_duck(tie_dir):
    con = duckdb.connect()
    for t in ("events", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tie_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TIE_QUERIES)
def test_tie_parity(spark, tie_dir, tie_duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, tie_dir)
    rel = tie_duck.sql(spec.oracle)
    ok, msg = compare_frames(sdf, rel, name)
    assert ok, msg


def test_winnowing_moss_guarantee_long_docs(spark):
    """Two >1024-token documents sharing one 12-token run must share at
    least one selected fingerprint (winnowing guarantee: any common run of
    >= w+k-1 = 8 tokens is detected).  Regression for the radix encoding:
    with the old kh*1024 + (1023-pos) form, positions past 1023 went
    negative and collided across hash ranges, silently breaking this
    guarantee on exactly these document lengths."""
    from health_monitor_cc_flink_spark.registry_pipeline_ops import winnowing_selection

    shared = " ".join(f"shared{i}" for i in range(12))
    doc_a = " ".join(f"alpha{i}" for i in range(1100)) + " " + shared
    doc_b = shared + " " + " ".join(f"beta{i}" for i in range(1100))
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    rows = winnowing_selection(docs).collect()
    # compare on the decoded k-gram hash (sel div 2^31): positions differ
    # between the two docs by construction, the shared k-gram hashes must not
    a_kh = {r["sel"] // 2**31 for r in rows if r["doc_id"] == 1}
    b_kh = {r["sel"] // 2**31 for r in rows if r["doc_id"] == 2}
    assert a_kh & b_kh, "shared 12-token run produced no common fingerprint"
    # and every encoded value is a valid non-negative radix encoding
    assert all(r["sel"] >= 0 for r in rows)
