"""Query registry: every implemented operator as a (Spark query, DuckDB
oracle SQL) pair over the driver testdata tables.

This file is the engine's coverage ledger for SURVEY.md §2 plus the
training-data-pipeline extensions (dedup / similarity / text /
multimodal).  The driver runs each Spark query and its oracle SQL
side-by-side at sf0.01 and hash-compares row counts, schemas and values
(order-insensitive, columns sorted by name) — so both sides must agree
on names AND exact values.  House rules that make exact agreement
possible:

1. **Time values cross the boundary as integers.**  `events.ts` is
   parquet TIMESTAMP(NANOS); Spark reads int64 nanos (nanosAsLong),
   DuckDB truncates to µs on read.  The shared exact unit is
   microseconds: Spark ``ts_ns div 1000`` ≡ DuckDB ``epoch_us(ts)``.
   No raw timestamp column is ever projected.
2. **No double summation.**  Sums are computed in DECIMAL (exact in
   both engines) and cast to DOUBLE once at the end; averages are
   rounded to 4 decimals.  Row-level double expressions (same IEEE ops,
   same operand order) are bit-identical and need no rounding.
3. **Total order before every LIMIT** (unique tiebreak column).
4. Final schemas stick to string / bigint-int / double / boolean.

Scale notes are inline per query: what shuffles, what broadcasts, what
gets pushed down.  `bench=True` marks the headline queries bench.py runs
at sf0.1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from .sources.testdata import load_table

US_PER_MIN = 60_000_000
US_PER_SEC = 1_000_000


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only check
    bench: bool = False
    doc: str = ""


_REGISTRY: list[QuerySpec] = []


def query(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def deco(fn):
        _REGISTRY.append(QuerySpec(name, fn, oracle, bench, doc))
        return fn

    return deco


#: state partitions for eager streaming drains — sized to the registry
#: streams' state volume (thousands of live keys), not the session's
#: batch shuffle default.  Committing 32 near-empty state stores per
#: micro-batch (times 2+ batches, times up to 4 stateful operators in
#: the cumulate union) dominated drain time; 8 keeps the same plan shape
#: with 4x fewer store commits.  At scale this knob follows state size.
_STREAM_STATE_PARTITIONS = "8"


def _drain_to_memory(spark, df, prefix: str, output_mode: str = "append"):
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink with right-sized state partitions; returns the result
    table.  The shuffle-partition conf is set only for the query's
    lifetime (picked up at stream start) and restored after."""
    import uuid

    name = prefix + uuid.uuid4().hex[:8]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _STREAM_STATE_PARTITIONS)
    try:
        (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(name)


def all_queries() -> list[QuerySpec]:
    """All registered queries, ordered for the driver's correctness gate.

    The driver hash-checks only the FIRST 50 entries of ``queries()`` per
    round, so registration order is not the right exposure order.  We rotate
    using DRIVER_GREEN.json (accumulated per-round driver results): queries
    that were checked but RED go first (prove the fix), then queries never
    driver-checked (oracle-bearing before rows-only — hash coverage is the
    stronger signal), then already-green ones.  Stable sort keeps
    registration order within each band, so the rotation is deterministic.
    """
    from . import registry_pipeline_ops  # noqa: F401  (registers data-pipeline ops)

    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "DRIVER_GREEN.json")
    try:
        with open(path) as f:
            hist = json.load(f)
        green = set(hist.get("green", {}))
        checked = set(hist.get("checked", {}))
        rows_recorded = set(hist.get("rows_recorded", {}))
    except (OSError, ValueError):
        green, checked, rows_recorded = set(), set(), set()

    def band(spec: QuerySpec) -> tuple[int, int]:
        # "done" = hash-green for oracle-bearing queries; for rows-only
        # queries (oracle=None, can never hash-match) = a CLEAN rows-only
        # row was recorded (err=no_oracle with a row count).  A rows-only
        # query that appeared in a window but CRASHED is still red and
        # re-surfaces to prove the fix.
        done = green if spec.oracle else (green | rows_recorded)
        if spec.name in checked and spec.name not in done:
            primary = 0  # previously red (hash mismatch or crash)
        elif spec.name not in checked:
            primary = 1  # never driver-checked
        else:
            primary = 2  # done
        return (primary, 0 if spec.oracle else 1)

    return sorted(_REGISTRY, key=band)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _ts_us(col: str = "ts_ns") -> Column:
    return F.expr(f"{col} div 1000")


# =============================================================================
# TPC-H-style relational queries (bench headliners)
# =============================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="TPC-H Q1 pricing summary: scan-heavy hash agg; predicate pushed to parquet, partial agg map-side.",
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec2("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec2("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_unshipped_revenue_topk",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           epoch_ms(o_orderdate) AS orderdate_ms
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: selective dim filter → join → agg → total-order top-k. "
    "customer/orders sides are broadcast-eligible after filters; AQE picks BHJ.",
)
def q3_unshipped_revenue_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: 6-way join; region/nation/supplier broadcast, fact side "
    "never shuffled until the final small agg.",
)
def q5_nation_revenue(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q6_revenue_delta",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    doc="TPC-H Q6: pure scan+filter+global agg — measures pushdown + codegen throughput.",
)
def q6_revenue_delta(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# =============================================================================
# Operator inventory: projections / filters (SURVEY §2.2, O7-O12)
# =============================================================================


@query(
    "o7_project_rename",
    """
    SELECT l_orderkey AS okey, l_linenumber AS line_no,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    doc="O7 projection+rename; row-level double arithmetic is bit-identical across engines.",
)
def o7_project_rename(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line_no"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("net_price"),
    )


@query(
    "o9_select_star",
    "SELECT * FROM region",
    doc="O9 bare wildcard pass-through.",
)
def o9_select_star(spark, sf_dir):
    return _t(spark, sf_dir, "region").select("*")


@query(
    "o10_json_field_access",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="O10 analog: semi-structured field access over the JSON props column.",
)
def o10_json_field_access(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@query(
    "o11_filter_eq",
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
    doc="O11 equality filter (S5 analog: predicate on a categorical column).",
)
def o11_filter_eq(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@query(
    "o12_filter_threshold",
    "SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events WHERE value < 40",
    doc="O12 numeric threshold filter (S6's forecast_value < 40 analog).",
)
def o12_filter_threshold(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value") < 40)
        .select("event_id", "user_id", "value", _ts_us().alias("ts_us"))
    )


# =============================================================================
# Joins (SURVEY §2.3, O13-O15)
# =============================================================================


@query(
    "o13_broadcast_enrich",
    """
    SELECT e.event_id, e.user_id, c.c_name AS name, e.value, epoch_us(e.ts) AS ts_us
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    bench=True,
    doc="O13 stream-static enrichment as explicit broadcast hash join (S3 analog): "
    "dimension ships to every task, fact side never shuffles.",
)
def o13_broadcast_enrich(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner").select(
        "event_id", "user_id", F.col("c_name").alias("name"), "value", _ts_us().alias("ts_us")
    )


@query(
    "o13b_lookup_miss_drops",
    """
    SELECT e.event_id, e.user_id, s.s_name AS supplier_name
    FROM events e JOIN supplier s ON e.user_id = s.s_suppkey
    """,
    doc="O13 drop-on-miss semantics (SURVEY §2.12.3): user_id 10-14 have no "
    "matching s_suppkey and silently disappear (inner join).",
)
def o13b_lookup_miss_drops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    supp = _t(spark, sf_dir, "supplier")
    return ev.join(F.broadcast(supp), ev.user_id == supp.s_suppkey, "inner").select(
        "event_id", "user_id", F.col("s_name").alias("supplier_name")
    )


@query(
    "o14_key_search_agg_unnest",
    """
    SELECT e.event_id, e.user_id, n.n_name AS nation_name
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n_nationkey
    """,
    doc="O13/O14/O15 composed: KEY_SEARCH_AGG + CROSS JOIN UNNEST surface "
    "(array-of-matches lookup then flatten) — net semantics = chained inner joins.",
)
def o14_key_search_agg_unnest(spark, sf_dir):
    from .operators.relational import key_search_agg, unnest

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dim = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        F.col("c_custkey").alias("user_id"), F.col("n_name")
    )
    packed = key_search_agg(ev, dim, "user_id")
    return unnest(
        packed, "search_results", aliases=["uid2", "nation_name"], keep=["event_id", "user_id"]
    ).select("event_id", "user_id", "nation_name")


@query(
    "o15_unnest_ordinality",
    """
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    """,
    doc="O15 UNNEST with positional aliasing: array<float> → (pos, val) rows.",
)
def o15_unnest_ordinality(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))


# =============================================================================
# Aggregations & windowing TVFs (SURVEY §2.4/§2.6, O16-O17, O21)
# =============================================================================


@query(
    "o16_tumble_minute_avg",
    f"""
    SELECT epoch_us(ts) // {US_PER_MIN} * 60 AS window_start_s,
           user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    bench=True,
    doc="O16/O21: tumbling-window hash aggregation via F.window (1 min). "
    "Window assignment = flooring, so the integer-epoch oracle is exact.",
)
def o16_tumble_minute_avg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "avg_value", "n"
        )
    )


@query(
    "s4_windowed_observed",
    f"""
    SELECT user_id,
           epoch_us(ts) // {US_PER_SEC} AS window_start_s,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS observed_value
    FROM events GROUP BY 1, 2
    """,
    doc="S4's windowed_vitals CTE on the stand-in stream: 1 s tumble, per-key AVG "
    "(reference flink_statements.tf:174-183 with user_id↔patient_id, value↔heart_rate).",
)
def s4_windowed_observed(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 second").alias("w"), "user_id")
        .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("observed_value"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "observed_value")
        .select("user_id", "window_start_s", "observed_value")
    )


@query(
    "o17_agg_functions",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           min(value) AS min_value,
           max(value) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="O17 aggregate-function battery incl. distinct aggregate (beyond reference surface).",
)
def o17_agg_functions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@query(
    "o21_hop_sliding",
    """
    SELECT s.window_start_s, e.user_id, count(*) AS n
    FROM events e
    CROSS JOIN LATERAL (
        SELECT epoch_us(e.ts) // 300000000 * 300 - v.off AS window_start_s
        FROM (VALUES (0), (300)) v(off)
    ) s
    WHERE epoch_us(e.ts) // 1000000 >= s.window_start_s
      AND epoch_us(e.ts) // 1000000 < s.window_start_s + 600
    GROUP BY 1, 2
    """,
    doc="O21 HOP: 10-min windows sliding 5 min; each row lands in 2 windows. "
    "Oracle enumerates the candidate starts per row.",
)
def o21_hop_sliding(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "n")
    )


@query(
    "o21b_session_window",
    """
    WITH d AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
                    OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), s AS (
        SELECT user_id, ts_us,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS session_id
        FROM d
    )
    SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n
    FROM s GROUP BY user_id, session_id
    """,
    doc="O21 SESSION: 30-min-gap session windows via F.session_window; oracle is the "
    "classic gaps-and-islands rewrite on µs epochs.",
)
def o21b_session_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("session_start_us"), "user_id", "n")
        .select("user_id", "session_start_us", "n")
    )


# =============================================================================
# OVER-window frames (SURVEY §2.5, O18) & sort/limit/set ops (§2.11)
# =============================================================================


@query(
    "o18_cumulative_frame",
    """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_so_far,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / (count(*) OVER w) AS avg_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="O18: the ML functions' cumulative per-key event-time frame "
    "(PARTITION BY key ORDER BY ts RANGE UNBOUNDED PRECEDING) as a plain OVER agg. "
    "RANGE (not ROWS) keeps ties deterministic.",
)
def o18_cumulative_frame(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_so_far"),
        (F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("avg_so_far"),
    )


@query(
    "o18b_rank_lag",
    """
    SELECT event_id, user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
           lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_value
    FROM events
    """,
    doc="Ranking + analytic OVER functions (beyond reference surface; SURVEY §2.5 note). "
    "Unique (ts, event_id) ordering keeps row_number deterministic.",
)
def o18b_rank_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
    )


@query(
    "o22_sort_limit_topk",
    """
    SELECT event_id, user_id, value FROM events
    ORDER BY value DESC, event_id LIMIT 50
    """,
    doc="Top-k with total order (value ties broken by unique event_id); Spark plans TakeOrderedAndProject.",
)
def o22_sort_limit_topk(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(50)
    )


@query(
    "setop_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="EXCEPT (distinct): customers with no orders.",
)
def setop_except(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    # subtract IS EXCEPT-distinct (drops a left key entirely if it appears on
    # the right, regardless of left-side multiplicity — exceptAll+distinct
    # would keep a survivor when the left side has duplicates).
    return cust.subtract(ords)


@query(
    "setop_intersect",
    """
    SELECT DISTINCT user_id AS key FROM events
    INTERSECT
    SELECT s_suppkey AS key FROM supplier
    """,
    doc="INTERSECT: stream keys that are also supplier keys.",
)
def setop_intersect(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("key")).distinct()
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"))
    return ev.intersect(supp)


@query(
    "setop_union_all",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
    doc="UNION ALL bag semantics.",
)
def setop_union_all(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.unionAll(supp)


# =============================================================================
# CTE pipeline composition (SURVEY §2.8, O26/O27)
# =============================================================================


@query(
    "o26_cte_pipeline_shape",
    f"""
    WITH windowed AS (
        SELECT user_id,
               epoch_us(ts) // {US_PER_MIN} * 60 AS window_start_s,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS observed_value
        FROM events GROUP BY 1, 2
    ), cleaned AS (
        SELECT * FROM windowed WHERE observed_value <= 180
    )
    SELECT user_id, window_start_s, observed_value,
           CAST(sum(CAST(observed_value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / (count(*) OVER w) AS running_avg
    FROM cleaned
    WINDOW w AS (PARTITION BY user_id ORDER BY window_start_s
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="O26/O27: the S4→S5→S6 pipeline shape as one CTE chain — windowed smoothing, "
    "cleaning filter, cumulative per-key analytic on the cleaned series.",
)
def o26_cte_pipeline_shape(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    windowed = (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("observed_value"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "observed_value")
    )
    cleaned = windowed.filter(F.col("observed_value") <= 180)
    w = (
        Window.partitionBy("user_id")
        .orderBy("window_start_s")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cleaned.select(
        "user_id",
        "window_start_s",
        "observed_value",
        (F.sum(F.col("observed_value").cast("decimal(18,6)")).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("running_avg"),
    )


# =============================================================================
# Join-type matrix beyond the reference (SURVEY §2.3 note: engine exposes
# the full how= matrix; reference itself only needs inner lookup joins)
# =============================================================================


@query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT SEMI join (existence filter; no row multiplication).",
)
def join_left_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join (negative existence).",
)
def join_left_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_left_outer",
    """
    SELECT e.event_id, e.user_id, s.s_name AS supplier_name
    FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey
    """,
    doc="LEFT OUTER join: misses survive with NULL payload (contrast O13b inner drop).",
)
def join_left_outer(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    supp = _t(spark, sf_dir, "supplier")
    return ev.join(F.broadcast(supp), ev.user_id == supp.s_suppkey, "left").select(
        "event_id", "user_id", F.col("s_name").alias("supplier_name")
    )


@query(
    "join_asof_prev_purchase",
    """
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           (SELECT max(epoch_us(p.ts)) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND epoch_us(p.ts) < epoch_us(e.ts)) AS prev_purchase_us
    FROM events e WHERE e.event_type = 'error'
    """,
    doc="AS-OF join (most recent prior purchase per error event): one shuffle on the "
    "key + per-key RANGE frame — no correlated per-row lookups at scale.",
)
def join_asof_prev_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)  # strictly-earlier rows
    )
    prev = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    ).over(w)
    return (
        ev.withColumn("prev_purchase_us", prev)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts_us", "prev_purchase_us")
    )


@query(
    "join_interval_pairs",
    """
    SELECT a.event_id AS eid_a, b.event_id AS eid_b, a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(a.ts) < epoch_us(b.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
    """,
    doc="Interval (range) self-join: same-key event pairs within 1 h. Join key is "
    "(user_id, hour_bin) with the right side duplicated into its own and the "
    "NEXT bin, so every qualifying pair shares a key and candidates are "
    "bounded by per-bin density — linear in output, never quadratic in a "
    "key's total history (scale_probe showed the bare user_id equi-join "
    "going 17× on 10× data; this plan is ~linear).",
)
def join_interval_pairs(spark, sf_dir):
    tol = 3_600_000_000
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    # left row at bin k matches right rows in (ts_a, ts_a+1h], which live in
    # bins k and k+1 — duplicate the LEFT side to (k, k+1)? No: duplicate the
    # left probe into the right's bins: a@k joins b@{k, k+1}; emitting a into
    # both bins keeps the big right side un-duplicated.
    a = ev.select(
        F.col("event_id").alias("eid_a"), "user_id", F.col("ts_us").alias("ts_a")
    ).select(
        "eid_a",
        "user_id",
        "ts_a",
        F.explode(
            F.array(
                (F.col("ts_a") / tol).cast("long"),
                (F.col("ts_a") / tol).cast("long") + 1,
            )
        ).alias("bin"),
    )
    b = ev.select(
        F.col("event_id").alias("eid_b"),
        F.col("user_id").alias("uid_b"),
        F.col("ts_us").alias("ts_b"),
        (_ts_us() / tol).cast("long").alias("bin_b"),
    )
    return (
        a.join(b, (a.user_id == b.uid_b) & (a.bin == b.bin_b))
        .filter((F.col("ts_a") < F.col("ts_b")) & (F.col("ts_b") - F.col("ts_a") <= tol))
        .select("eid_a", "eid_b", "user_id", (F.col("ts_b") - F.col("ts_a")).alias("gap_us"))
    )


# =============================================================================
# Grouping sets / scalar battery (§2.4 note / §2.7)
# =============================================================================


@query(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (subtotal + grand-total rows with NULL keys).",
)
def agg_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions.",
)
def agg_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_function_battery",
    """
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 8)) AS prio,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           abs(o_totalprice - 100000.0) AS abs_delta,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_bucket,
           o_custkey % 7 AS custmod,
           length(o_orderstatus) AS status_len,
           concat(o_orderstatus, '-', o_orderpriority) AS tag
    FROM orders
    """,
    doc="Scalar function battery (string/date/math, all row-level deterministic).",
)
def scalar_function_battery(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio"),
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("abs_delta"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_bucket"),
        (F.col("o_custkey") % 7).alias("custmod"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat("o_orderstatus", F.lit("-"), "o_orderpriority").alias("tag"),
    )


@query(
    "distinct_pairs",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="DISTINCT (shuffle-dedup) projection.",
)
def distinct_pairs(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# =============================================================================
# Structured Streaming under the oracle gate (O28-O30)
# =============================================================================


@query(
    "streaming_tumble_minute",
    """
    WITH w AS (
        SELECT epoch_us(ts) // 60000000 * 60 AS window_start_s, user_id,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT (max(epoch_us(ts)) // 1000 - 600000) AS wm_ms FROM events
    )
    SELECT window_start_s, user_id, n, avg_value
    FROM w, m
    WHERE (window_start_s + 60) * 1000 <= wm_ms
    """,
    doc="A REAL Structured Streaming run under the correctness gate: file-stream "
    "source → 10-min watermark → 1-min tumble → append-mode memory sink "
    "(availableNow).  Emitted set = windows closed by the final watermark "
    "(max event-time ms − delay); the oracle reproduces that cutoff exactly, "
    "so this checks both the aggregation values AND the watermark semantics.",
)
def streaming_tumble_minute(spark, sf_dir):
    from .sources.testdata import events_stream

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "n", "avg_value")
    )
    return _drain_to_memory(spark, agg, "stream_tumble_")




# =============================================================================
# Additional analytic surface: pivot, ranking, arg-extremes, medians,
# date battery, TPC-H Q18 shape, and the SQL text surface
# =============================================================================


@query(
    "pivot_event_counts",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    doc="PIVOT with explicit value list (deterministic columns); oracle = conditional aggregation.",
)
def pivot_event_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    cols = ["click", "error", "purchase", "signup", "view"]
    return out.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in cols]
    )


@query(
    "ranking_battery",
    """
    SELECT event_id, user_id,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4)       OVER w AS quartile,
           lead(value)    OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
    doc="Ranking/analytic OVER battery (dense_rank, percent_rank, ntile, lead) with a "
    "total order per key.",
)
def ranking_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "agg_arg_extremes",
    """
    SELECT user_id,
           max_by(event_id, value ORDER BY value, event_id) AS max_value_event,
           min_by(event_id, value ORDER BY value, event_id) AS min_value_event,
           max(value) AS max_value, min(value) AS min_value
    FROM events GROUP BY user_id
    """,
    doc="arg-max/arg-min aggregates (max_by/min_by); value ties broken deterministically.",
)
def agg_arg_extremes(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # deterministic under value ties, matching the ordered max_by/min_by oracle:
    # DuckDB's `max_by(arg, val ORDER BY val, arg)` keeps the FIRST arg in scan
    # order among tied extremes, i.e. the SMALLEST event_id.  max(struct) would
    # keep the largest, so negate the id inside the struct and negate back.
    return ev.groupBy("user_id").agg(
        (-F.max(F.struct(F.col("value"), (-F.col("event_id")).alias("nid")))["nid"]).alias(
            "max_value_event"
        ),
        F.min(F.struct("value", "event_id"))["event_id"].alias("min_value_event"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


@query(
    "agg_median",
    """
    SELECT event_type, median(value) AS med
    FROM events GROUP BY event_type
    """,
    doc="Exact median (interpolated percentile on sorted doubles — order-insensitive, "
    "so engine-exact unlike running float sums).",
)
def agg_median(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))


@query(
    "date_function_battery",
    """
    SELECT o_orderkey,
           quarter(o_orderdate) AS q,
           dayofyear(o_orderdate) AS doy,
           dayofweek(o_orderdate) AS dow_sun0,
           last_day(o_orderdate)::DATE::VARCHAR AS month_end,
           date_trunc('month', o_orderdate)::DATE::VARCHAR AS month_start,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders
    """,
    doc="Date/time battery; dow normalized to Sunday=0 on both engines, dates "
    "projected as ISO strings (no timestamp-type hashing).",
)
def date_function_battery(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        (F.dayofweek(d) - 1).alias("dow_sun0"),  # Spark: 1=Sunday → 0=Sunday
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
    )


@query(
    "q18_large_volume_orders",
    """
    SELECT o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) >= 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    bench=True,
    doc="TPC-H Q18 shape: big join → agg → HAVING (decimal-exact threshold) → top-k. "
    "The HAVING prunes before the order-by; AQE right-sizes the join shuffle.",
)
def q18_large_volume_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") >= 150)
        .select(
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "sql_surface_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="The engine's SQL text surface: the query is executed via spark.sql over "
    "catalog-registered views (O26/O27 SQL path), not the DataFrame builder.",
)
def sql_surface_q1(spark, sf_dir):
    from .sources.testdata import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "array_function_battery",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           list_sort(string_split(text, ' '))[1] AS min_token,
           list_contains(string_split(text, ' '), 'the') AS has_the,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), '_') AS head3
    FROM documents
    """,
    doc="Array/higher-order function battery over token arrays (size, index, "
    "negative index, sort, contains, slice+join) — all deterministic string ops.",
)
def array_function_battery(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.element_at(F.array_sort(toks), 1).alias("min_token"),
        F.array_contains(toks, "the").alias("has_the"),
        F.concat_ws("_", F.slice(toks, 1, 3)).alias("head3"),
    )


@query(
    "scalar_subquery_filter",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE value > (SELECT max(value) FROM events) - 50
    """,
    doc="Scalar subquery in a predicate (exact: max is order-insensitive).",
)
def scalar_subquery_filter(spark, sf_dir):
    from .sources.testdata import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, user_id, value
        FROM events
        WHERE value > (SELECT max(value) FROM events) - 50
        """
    )


@query(
    "streaming_enrich_join",
    """
    SELECT e.event_id, e.user_id, c.c_name AS name, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="Streaming stream-static broadcast enrichment (O13/O32) under the oracle "
    "gate: file-stream events join static customer dim, availableNow into a "
    "memory sink — stateless, so every input row must appear exactly once.",
)
def streaming_enrich_join(spark, sf_dir):
    from .sources.testdata import events_stream
    from .sources.testdata import load_table

    src = events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    joined = src.join(F.broadcast(cust), src.user_id == cust.c_custkey, "inner").select(
        "event_id", "user_id", F.col("c_name").alias("name"), "value"
    )
    return _drain_to_memory(spark, joined, "stream_enrich_")


@query(
    "o8_qualified_wildcard",
    """
    SELECT d.*, length(d.text) AS text_len
    FROM documents d JOIN region r ON d.doc_id % 5 = r.r_regionkey
    """,
    doc="O8 qualified wildcard expansion (SELECT v.* preserving all columns of the "
    "aliased relation) composed with a join.",
)
def o8_qualified_wildcard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").alias("d")
    r = _t(spark, sf_dir, "region").alias("r")
    return (
        d.join(F.broadcast(r), F.col("d.doc_id") % 5 == F.col("r.r_regionkey"))
        .select("d.*", F.length("d.text").alias("text_len"))
    )


@query(
    "null_semantics_battery",
    """
    SELECT e.event_id,
           s.s_name IS NULL AS missed,
           coalesce(s.s_name, 'UNKNOWN') AS name_or_default,
           nullif(e.event_type, 'error') AS type_or_null,
           e.user_id IS NOT DISTINCT FROM s.s_suppkey AS nullsafe_eq
    FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey
    """,
    doc="NULL semantics battery over an outer join: IS NULL, COALESCE, NULLIF, "
    "null-safe equality (<=> / IS NOT DISTINCT FROM).",
)
def null_semantics_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    supp = _t(spark, sf_dir, "supplier")
    j = ev.join(F.broadcast(supp), ev.user_id == supp.s_suppkey, "left")
    return j.select(
        "event_id",
        F.col("s_name").isNull().alias("missed"),
        F.coalesce("s_name", F.lit("UNKNOWN")).alias("name_or_default"),
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
        F.col("user_id").eqNullSafe(F.col("s_suppkey")).alias("nullsafe_eq"),
    )


@query(
    "union_by_name",
    """
    SELECT custkey, acctbal FROM (
        SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer
        UNION ALL
        SELECT s_suppkey AS custkey, s_acctbal AS acctbal FROM supplier
    )
    """,
    doc="unionByName (schema-aligned union across differently-ordered relations).",
)
def union_by_name(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("acctbal"), F.col("s_suppkey").alias("custkey")
    )
    return cust.unionByName(supp)


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-sliced orders with a correlated EXISTS over the fact "
    "table — plans as a left-semi join (no row multiplication before the agg).",
)
def q4_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_item_topk",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    bench=True,
    doc="TPC-H Q10 shape: returned-item revenue per customer, 4-way join + top-k.",
)
def q10_returned_item_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_ratio",
    """
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share); both "
    "sums decimal-exact, one double division at the end.",
)
def q14_promo_ratio(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").like("PROMO%"), net).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum(net).cast("double")
        )
        .cast("double")
        .alias("promo_revenue_pct")
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_retailprice > 1500 AND l_discount < 0.05)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates across both join sides "
    "(tests predicate normalization/pushdown through the join).",
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_retailprice") > 1500) & (F.col("l_discount") < 0.05))
    )
    return j.filter(cond).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
        SELECT l_partkey AS pk,
               0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN pa ON l_partkey = pa.pk
    WHERE l_quantity < pa.threshold
    """,
    doc="TPC-H Q17 shape: per-group average as a correlated threshold, rewritten as "
    "aggregate + self-join (the scalable decorrelated form). The threshold is a "
    "bit-identical double on both engines (decimal-sum/count, same IEEE ops), so "
    "the comparison is exact.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    return (
        li.join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q22_global_sales_opportunity",
    """
    WITH thr AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: global-average scalar threshold (exact decimal-avg double, "
    "bit-identical in both engines) + NOT EXISTS anti join + group agg.",
)
def q22_global_sales_opportunity(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    rich = cust.crossJoin(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )


@query(
    "streaming_hop_10m5m",
    """
    WITH cand AS (
        SELECT epoch_us(ts) // 300000000 * 300 - v.off AS window_start_s,
               user_id, epoch_us(ts) // 1000000 AS ts_s
        FROM events CROSS JOIN (VALUES (0), (300)) v(off)
    ), w AS (
        SELECT window_start_s, user_id, count(*) AS n
        FROM cand
        WHERE ts_s >= window_start_s AND ts_s < window_start_s + 600
        GROUP BY 1, 2
    ), m AS (
        SELECT (max(epoch_us(ts)) // 1000 - 600000) AS wm_ms FROM events
    )
    SELECT window_start_s, user_id, n
    FROM w, m
    WHERE (window_start_s + 600) * 1000 <= wm_ms
    """,
    doc="Streaming HOP (10 min / 5 min sliding) under the oracle gate: availableNow "
    "file-stream, 10-min watermark, append emission = windows closed by the final "
    "watermark; oracle enumerates candidate starts per row and applies the same "
    "ms cutoff calibrated for the tumble case.",
)
def streaming_hop_10m5m(spark, sf_dir):
    from .sources.testdata import events_stream

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "user_id", "n")
    )
    return _drain_to_memory(spark, agg, "stream_hop_")


@query(
    "streaming_session_30m",
    """
    WITH d AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS ns
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
    ), s AS (
        SELECT user_id, ts_us,
               sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
        FROM d
    ), sess AS (
        SELECT user_id, min(ts_us) AS session_start_us,
               max(ts_us) + 1800000000 AS session_end_us, count(*) AS n
        FROM s GROUP BY user_id, sid
    ), m AS (SELECT (max(epoch_us(ts)) // 1000 - 600000) AS wm_ms FROM events)
    SELECT user_id, session_start_us, session_end_us, n
    FROM sess, m
    WHERE session_end_us // 1000 <= wm_ms
    """,
    doc="Streaming SESSION windows (30-min gap) under the oracle gate: session = "
    "[first event, last event + gap); append emission = sessions whose end the "
    "final watermark passed. Oracle: gaps-and-islands + the calibrated ms cutoff. "
    "Third real streaming run hash-verified against batch SQL.",
)
def streaming_session_30m(spark, sf_dir):
    from .sources.testdata import events_stream

    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n",
        )
    )
    return _drain_to_memory(spark, agg, "stream_sess_")


@query(
    "latest_per_key",
    """
    SELECT user_id, max(epoch_us(ts)) AS last_ts_us,
           max_by(event_type, epoch_us(ts) ORDER BY epoch_us(ts), event_id) AS last_event_type,
           max_by(value, epoch_us(ts) ORDER BY epoch_us(ts), event_id) AS last_value
    FROM events GROUP BY user_id
    """,
    doc="Latest-record-per-key (SCD-1 compaction / upsert materialization): one "
    "hash agg, arg-max by (ts, id) tiebreak — no window sort needed.",
)
def latest_per_key(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    # tiebreak matches the ordered max_by oracle: on equal ts_us, DuckDB's
    # `max_by(x, ts ORDER BY ts, event_id)` keeps the first-scanned (SMALLEST)
    # event_id, so sort the struct by (ts_us, -event_id).
    picked = F.max(
        F.struct(
            F.col("ts_us"), (-F.col("event_id")).alias("nid"), F.col("event_type"), F.col("value")
        )
    )
    return ev.groupBy("user_id").agg(
        F.max("ts_us").alias("last_ts_us"),
        picked["event_type"].alias("last_event_type"),
        picked["value"].alias("last_value"),
    )


@query(
    "funnel_signup_to_purchase",
    """
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup_us,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
        FROM events GROUP BY user_id
    )
    SELECT user_id, first_signup_us, first_purchase_us,
           first_signup_us IS NOT NULL
             AND first_purchase_us IS NOT NULL
             AND first_purchase_us > first_signup_us AS converted
    FROM f
    """,
    doc="Funnel step analysis (signup → later purchase): conditional-min firsts per "
    "key + ordering predicate — single hash agg, integer-exact.",
)
def funnel_signup_to_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias("first_signup_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("first_purchase_us"),
    )
    return f.select(
        "user_id",
        "first_signup_us",
        "first_purchase_us",
        (
            F.col("first_signup_us").isNotNull()
            & F.col("first_purchase_us").isNotNull()
            & (F.col("first_purchase_us") > F.col("first_signup_us"))
        ).alias("converted"),
    )


@query(
    "cohort_weekly_retention",
    """
    WITH firsts AS (
        SELECT user_id, min(epoch_us(ts)) // 604800000000 AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               epoch_us(e.ts) // 604800000000 - f.cohort_week AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS active_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    doc="Cohort retention matrix: first-activity week per key, distinct active "
    "(cohort, offset) cells — all integer epoch-week math.",
)
def cohort_weekly_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("wk", F.expr("(ts_ns div 1000) div 604800000000"))
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@query(
    "upsert_merge_simulation",
    """
    WITH ranked AS (
        SELECT o_custkey AS custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ), updates AS (
        SELECT custkey, o_totalprice AS latest_order_total FROM ranked WHERE rn = 1
    )
    SELECT coalesce(c.c_custkey, u.custkey) AS custkey,
           c.c_name AS name,
           c.c_acctbal AS acctbal,
           u.latest_order_total,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN u.custkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.custkey
    """,
    doc="MERGE INTO semantics without a v2 table: full-outer join + coalesce with "
    "per-row action tagging (insert/update/keep) — the upsert pattern for plain "
    "parquet lakes; arg-max picks each key's latest update deterministically.",
)
def upsert_merge_simulation(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    picked = F.max(
        F.struct(
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ts"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    updates = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        picked["o_totalprice"].alias("latest_order_total")
    )
    j = cust.join(updates, cust.c_custkey == updates.custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        "latest_order_total",
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


@query(
    "o15b_unnest_outer",
    """
    SELECT e.vec_id, u.val
    FROM (SELECT vec_id,
                 CASE WHEN vec_id % 7 = 0 THEN []::FLOAT[]
                      ELSE list_slice(embedding, 1, 3) END AS arr
          FROM embeddings) e
    LEFT JOIN LATERAL (SELECT CAST(unnest(e.arr) AS DOUBLE) AS val) u ON true
    """,
    doc="O15 outer-unnest: empty arrays survive as a NULL row (explode_outer) — "
    "the retain-parent variant of CROSS JOIN UNNEST.",
)
def o15b_unnest_outer(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    arr = F.when(F.col("vec_id") % 7 == 0, F.array().cast("array<float>")).otherwise(
        F.slice("embedding", 1, 3)
    )
    return (
        emb.select("vec_id", arr.alias("arr"))
        .select("vec_id", F.explode_outer("arr").alias("valf"))
        .select("vec_id", F.col("valf").cast("double").alias("val"))
    )


@query(
    "q15_top_supplier_shape",
    """
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape: revenue view + scalar-subquery max filter (pick the top "
    "supplier(s) without a global sort). Decimal-exact revenue → exact equality.",
)
def q15_top_supplier_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(rev, supp.s_suppkey == rev.suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q11_share_threshold_shape",
    """
    WITH nat_rev AS (
        SELECT n_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, rev FROM nat_rev
    WHERE rev > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders) * 0.04
    """,
    doc="TPC-H Q11 shape: group value vs a fraction of the global total (scalar "
    "subquery threshold); both sides decimal-exact, one identical double multiply.",
)
def q11_share_threshold_shape(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    nat_rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"))
    )
    total = orders.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double") * F.lit(0.04)).alias("thr")
    )
    return (
        nat_rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev") > F.col("thr"))
        .select("n_name", "rev")
    )


@query(
    "window_frame_battery",
    """
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v,
           min(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_last3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Window frame battery: first/last/nth over full-partition frames + a bounded "
    "ROWS frame (3-row rolling min); deterministic total order per key.",
)
def window_frame_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    last3 = (
        Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(full).alias("first_v"),
        F.last("value").over(full).alias("last_v"),
        F.nth_value("value", 2).over(full).alias("second_v"),
        F.min("value").over(last3).alias("min_last3"),
    )


@query(
    "streaming_stream_stream_join",
    """
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
    """,
    doc="STREAM-STREAM interval join under the oracle gate: two watermarked "
    "streams of the same source joined on key + 1 h event-time bound (click → "
    "later purchase); inner-join matches emit as they arrive, so the availableNow "
    "run must equal the batch interval join exactly.",
)
def streaming_stream_stream_join(spark, sf_dir):
    return _drain_to_memory(
        spark, _click_purchase_interval_join(spark, sf_dir, "inner"), "stream_ss_join_"
    )


def _click_purchase_interval_join(spark, sf_dir, how: str) -> DataFrame:
    """The stream-stream interval-join family (inner / left_outer /
    full_outer) shares the ENTIRE construction — watermarked click and
    purchase legs from two independent readers of the events stream, the
    per-user 1-hour forward-interval condition, and the (ids, user, gap)
    projection; only the join type differs.  One definition so a change
    to the watermark delay or the interval bound cannot silently diverge
    one family member (coalesce(c_user, p_user) equals c_user whenever
    the left side is present, so the projection is shared too)."""
    from .sources.testdata import events_stream

    def leg(etype: str, prefix: str) -> DataFrame:
        return (
            events_stream(spark, sf_dir)
            .filter(F.col("event_type") == etype)
            .withWatermark("ts", "10 minutes")
            .select(
                F.col("event_id").alias(f"{etype}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    clicks, purchases = leg("click", "c"), leg("purchase", "p")
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


@query(
    "unpivot_stack",
    """
    SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               CAST(o_custkey AS DOUBLE) AS custkey_num
        FROM orders
    ) UNPIVOT (value FOR metric IN (totalprice, custkey_num))
    """,
    doc="UNPIVOT / stack: wide-to-long reshaping (the inverse of pivot).",
)
def unpivot_stack(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey_num"),
    )
    return o.unpivot("o_orderkey", ["totalprice", "custkey_num"], "metric", "value")


@query(
    "safe_arithmetic",
    """
    SELECT o_orderkey,
           o_totalprice / nullif(o_custkey % 5, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
    FROM orders
    """,
    doc="Error-safe arithmetic: divide-by-zero → NULL (nullif guard), TRY_CAST "
    "on unparseable strings → NULL instead of job failure.",
)
def safe_arithmetic(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_totalprice / nullif(o_custkey % 5, 0)").alias("safe_div"),
        F.expr("TRY_CAST(o_orderpriority AS INT)").alias("bad_cast"),
        F.expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
    )


# =============================================================================
# TPC-H shape completion: Q2/Q7/Q8/Q9/Q12/Q13/Q16/Q20/Q21 (adapted to the
# driver schema — no partsupp table, so supplier-part facts derive from
# lineitem; no shipmode/commitdate, so lateness = shipdate vs orderdate+90d).
# Reference parity: the reference has no relational surface beyond SURVEY §2,
# these extend the engine to the full classic decision-support matrix.
# =============================================================================


@query(
    "q7_volume_shipping_shape",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by year. Both "
    "nation sides broadcast; the pair predicate prunes before the fact agg.",
)
def q7_volume_shipping_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # the pair disjunction implies BOTH nations are in {N1, N2}; Catalyst
    # cannot derive that from the OR, so pre-filter the dims explicitly —
    # the supplier/customer joins then drop ~92% of rows before the facts.
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    # broadcast-join each DIM with its nation filter BEFORE the fact joins:
    # supplier/customer shrink to the two nations' rows first, so the
    # lineitem/orders shuffles carry ~8% of the rows instead of pruning
    # AFTER the full 4-way fact join (the filter-early pattern q2 uses)
    sup_n = sup.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust_n = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        li.join(sup_n, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share_shape",
    """
    WITH vol AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share inside a region-filtered "
    "product market — conditional decimal sums, one double division per group.",
)
def q8_market_share_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    sup = _t(spark, sf_dir, "supplier")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    return base.groupBy("o_year").agg((num / F.sum("volume").cast("double")).alias("mkt_share"))


@query(
    "q9_product_profit_shape",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS profit_proxy
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and order year "
    "(no partsupp cost column in this schema, so profit proxy = discounted "
    "revenue). Part filter prunes the fact scan before the wide joins.",
)
def q9_product_profit_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("volume").cast("double").alias("profit_proxy"))
    )


@query(
    "q12_priority_counts_shape",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: priority-class conditional counts per line status "
    "(no shipmode column; linestatus stands in). All-integer, date-sliced.",
)
def q12_priority_counts_shape(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
    """,
    bench=True,
    doc="TPC-H Q13: customer order-count distribution — outer join with a "
    "join-condition filter, then a second aggregation over the first's result. "
    "All-integer; the double groupBy is the classic two-phase shuffle shape.",
)
def q13_customer_distribution(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q16_supplier_cnt_shape",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#15' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part class with a "
    "NOT-IN supplier blacklist (anti join). partsupp derives from lineitem.",
)
def q16_supplier_cnt_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_part_promotion_shape",
    """
    WITH blue_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
    shipped AS (
        SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem JOIN blue_parts ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    part_tot AS (SELECT l_partkey AS pk, sum(qty) AS tot FROM shipped GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped JOIN part_tot ON l_partkey = pk
                 JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(qty AS DOUBLE) > 0.3 * CAST(tot AS DOUBLE)
    """,
    doc="TPC-H Q20 shape: suppliers dominating a product segment — nested IN "
    "subqueries decorrelated into agg + self-join on the per-part total. "
    "Decimal-exact sums, single double compare.",
)
def q20_part_promotion_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    blue = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select("p_partkey")
    sup = _t(spark, sf_dir, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(blue), li.l_partkey == blue.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    part_tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("qty").alias("tot"))
    return (
        shipped.join(part_tot, shipped.l_partkey == part_tot.pk)
        .filter(F.col("qty").cast("double") > F.lit(0.3) * F.col("tot").cast("double"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "q21_waiting_orders_shape",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    bench=True,
    doc="TPC-H Q21 shape: the sole-late-supplier-in-a-multi-supplier-order "
    "pattern — EXISTS as left-semi, NOT EXISTS as left-anti, both equi-keyed "
    "on the order with a non-equi supplier guard (lateness = shipdate > "
    "orderdate + 90d; no commit/receipt dates in this schema).",
)
def q21_waiting_orders_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    l1 = (
        late.join(
            l2, (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2), "left_semi"
        ).join(l3, (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3), "left_anti")
    )
    return (
        l1.join(sup, l1.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q2_min_cost_supplier_shape",
    """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice) AS ps_cost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    costed AS (
        SELECT p_partkey, s_name, s_acctbal, n_name, ps_cost
        FROM part JOIN ps ON p_partkey = ps_partkey
                  JOIN eu ON ps_suppkey = s_suppkey
        WHERE p_size = 15 AND p_type = 'STANDARD'
    ),
    mins AS (SELECT p_partkey AS mk, min(ps_cost) AS mc FROM costed GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost
    FROM costed JOIN mins ON p_partkey = mk AND ps_cost = mc
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part within a region — the "
    "correlated-min subquery decorrelated into a per-part min + join-back on "
    "(part, cost). Pseudo supply cost = min lineitem price per (part, "
    "supplier) since this schema has no partsupp. min(double) is "
    "order-insensitive, so the gate stays exact.",
)
def q2_min_cost_supplier_shape(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # Filter-early: semi-join lineitem against the ~1/250-selective part
    # predicate BEFORE the (part, supplier) min-agg — Catalyst can't push
    # a join below an aggregate on its own, and aggregating the full fact
    # table only to discard 99.6% of groups at the next join is the
    # difference between scanning 100 TB and scanning 400 GB of groups.
    ps = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
        )
        .agg(F.min("l_extendedprice").alias("ps_cost"))
    )
    eu = (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costed = (
        part.join(ps, part.p_partkey == ps.ps_partkey)
        .join(F.broadcast(eu), ps.ps_suppkey == eu.s_suppkey)
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "ps_cost")
    )
    mins = costed.groupBy(F.col("p_partkey").alias("mk")).agg(F.min("ps_cost").alias("mc"))
    return (
        costed.join(
            mins, (costed.p_partkey == mins.mk) & (costed.ps_cost == mins.mc)
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "join_salted_skew",
    """
    SELECT e.user_id, c.c_mktsegment, count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_mktsegment
    """,
    doc="Skew-mitigated (salted) join under the oracle gate: the fact side is "
    "split across 8 random salts, the dim replicated 8x, so one hot key spreads "
    "over 8 tasks instead of stalling one. The salt is dropped before the agg, "
    "so the result must equal the plain join exactly (operators/skew.py).",
)
def join_salted_skew(spark, sf_dir):
    from .operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        ev.select(F.col("user_id").alias("c_custkey"), "value"), cust, on="c_custkey", n_salts=8
    )
    return (
        joined.groupBy(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "streaming_dedup_distinct",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming deduplication under the oracle gate: dropDuplicates over a "
    "file-stream (state = seen keys, exact dedup across micro-batches), "
    "availableNow into a memory sink — must equal batch SELECT DISTINCT. The "
    "projection is exactly the dedup key, so first-seen ties cannot leak "
    "nondeterminism.",
)
def streaming_dedup_distinct(spark, sf_dir):
    from .sources.testdata import events_stream

    src = events_stream(spark, sf_dir)
    deduped = src.select("user_id", "event_type").dropDuplicates()
    return _drain_to_memory(spark, deduped, "stream_dedup_")


@query(
    "streaming_complete_mode_agg",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Complete-output-mode streaming aggregation under the oracle gate: "
    "unwatermarked global counts per event type; each trigger rewrites the full "
    "result, so after availableNow drains the source the sink holds exactly the "
    "batch answer.",
)
def streaming_complete_mode_agg(spark, sf_dir):
    from .sources.testdata import events_stream

    src = events_stream(spark, sf_dir)
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    return _drain_to_memory(spark, agg, "stream_complete_", output_mode="complete")


@query(
    "agg_grouping_sets",
    """
    SELECT event_type, user_id % 3 AS ubucket,
           GROUPING(event_type, user_id % 3) AS gid, count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type, user_id % 3), (event_type), ())
    """,
    doc="GROUPING SETS with grouping_id disambiguation (the general form behind "
    "rollup/cube): subtotal rows carry NULL keys + the standard bitmask, "
    "identical in both engines.",
)
def agg_grouping_sets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3).alias("ubucket")
    )
    view = "events_gs_tmp"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT event_type, ubucket, grouping_id() AS gid, count(*) AS n
        FROM {view}
        GROUP BY GROUPING SETS ((event_type, ubucket), (event_type), ())
        """
    )


def _roundtrip_base(spark, sf_dir):
    return _t(spark, sf_dir, "events").select(
        "event_id", _ts_us().alias("ts_us"), "user_id", "event_type", "value"
    )


_ROUNDTRIP_ORACLE = """
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
"""


def _warehouse_path(sf_dir, name):
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        f"{name}_{os.path.basename(os.path.normpath(sf_dir))}",
    )


@query(
    "agg_bitmap_distinct_exact",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
    FROM events GROUP BY event_type
    """,
    doc="EXACT distinct counting via bitmaps (bitmap_bucket_number / "
    "bitmap_construct_agg / bitmap_count): per-bucket bitmaps are small, "
    "mergeable partial aggregates — the scale path for exact COUNT(DISTINCT) "
    "over a bounded-int key domain, where the naive expand-distinct shuffle "
    "moves every (group, key) pair and HLL only approximates. Oracle = plain "
    "COUNT(DISTINCT).",
)
def agg_bitmap_distinct_exact(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_users"))
    )


@query(
    "sessionize_gaps_islands",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t FROM events
    ), marked AS (
        SELECT user_id, event_id, t,
               CASE WHEN t - lag(t) OVER w > 1800000000 OR lag(t) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), sess AS (
        SELECT user_id, event_id, t,
               CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           count(*) AS n_events,
           min(t) AS session_start_us,
           max(t) AS session_end_us,
           max(t) - min(t) AS duration_us
    FROM sess GROUP BY user_id, session_no
    """,
    doc="Batch sessionization via gaps-and-islands: 30-min inactivity gap "
    "starts a new session; session number = running sum of start flags "
    "(one shuffle on user_id, window + agg reuse the same partitioning). "
    "The batch mirror of the SESSION window TVF (o21b / streaming_session_"
    "30m), with per-session stats — all-integer µs.",
)
def sessionize_gaps_islands(spark, sf_dir):
    gap = 1_800_000_000
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", _ts_us().alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            (F.col("t") - F.lag("t").over(w) > gap) | F.lag("t").over(w).isNull(), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("session_start_us"),
        F.max("t").alias("session_end_us"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    )


@query(
    "source_schema_evolution_merge",
    """
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, value,
           CASE WHEN event_id % 2 = 1 THEN length(event_type) END AS type_len
    FROM events
    """,
    doc="Schema evolution across parquet batches: an old batch (4 columns) and "
    "a new batch carrying an added column are read together with "
    "mergeSchema=true; old rows surface NULL for the new column — the "
    "add-a-column migration every long-lived ingest dataset goes through. "
    "Oracle reproduces the per-batch column presence from the row split.",
)
def source_schema_evolution_merge(spark, sf_dir):
    path = _warehouse_path(sf_dir, "events_evolved")
    base = _t(spark, sf_dir, "events").select(
        "event_id", _ts_us().alias("ts_us"), "user_id", "value",
        F.length("event_type").alias("type_len"),
    )
    old = base.filter(F.col("event_id") % 2 == 0).drop("type_len")
    new = base.filter(F.col("event_id") % 2 == 1)
    old.write.mode("overwrite").parquet(path + "/batch=0")
    new.write.mode("overwrite").parquet(path + "/batch=1")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .select("event_id", "ts_us", "user_id", "value", "type_len")
    )


@query(
    "source_json_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="JSON source/sink round-trip: events written as JSON lines and read back "
    "with an explicit schema must reproduce every row bit-exactly (doubles "
    "serialize with round-trip precision). The multi-format source surface "
    "beyond parquet.",
)
def source_json_roundtrip(spark, sf_dir):
    path = _warehouse_path(sf_dir, "events_json")
    _roundtrip_base(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(
        "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
    ).json(path)


@query(
    "source_csv_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="CSV source/sink round-trip with explicit schema (header on, default "
    "quoting) — same bit-exact contract as the JSON path.",
)
def source_csv_roundtrip(spark, sf_dir):
    path = _warehouse_path(sf_dir, "events_csv")
    _roundtrip_base(spark, sf_dir).write.mode("overwrite").option("header", "true").csv(path)
    return (
        spark.read.schema(
            "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
        )
        .option("header", "true")
        .csv(path)
    )


@query(
    "health_pipeline_sql_alerts",
    None,
    doc="The S3→S6 reference pipeline on the pure-SQL surface: Python UDTFs with "
    "TABLE(...) PARTITION BY ... ORDER BY ... arguments stand in for the OVER-"
    "window ML aggregates (ml_detect_anomalies / ml_forecast as table functions); "
    "output is bit-identical to the DataFrame path (pinned in "
    "tests/test_sql_pipeline.py).",
)
def health_pipeline_sql_alerts(spark, sf_dir):
    from .fixtures import health_events_df
    from .plans.health_pipeline_sql import run_pipeline_sql
    from .sources.memory import patients_df

    events = health_events_df(spark, n_ticks=480, interval_s=0.5, seed=42)
    stages = run_pipeline_sql(spark, events, patients_df(spark))
    return stages["heartbeat_alerts"].select(
        "patient_id",
        F.unix_micros("event_timestamp").alias("event_ts_us"),
        F.round("current_value", 4).alias("current_value"),
        F.round("forecast_value", 4).alias("forecast_value"),
    )


@query(
    "cdc_scd2_intervals",
    """
    WITH v AS (
        SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'signup'
    )
    SELECT user_id, event_id, value AS version_value,
           ts_us AS valid_from_us,
           coalesce(lead(ts_us) OVER w - 1, 253402300799000000) AS valid_to_us,
           CASE WHEN lead(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
    doc="SCD Type-2 dimension history: each change event becomes a "
    "versioned row with a [valid_from, valid_to] interval (valid_to = "
    "next change − 1 µs; open versions get the 9999-12-31 sentinel and "
    "is_current = 1) — the standard warehouse pattern for tracking "
    "dimension history, and the batch materialization of the CDC stream "
    "cdc_apply_changelog compacts.  One lead() window per key (single "
    "shuffle); all-integer outputs keep the gate exact.  Completes the "
    "upsert family: changelog compaction (cdc_apply_changelog), MERGE "
    "tagging (upsert_merge_simulation), and full history (this).",
)
def cdc_scd2_intervals(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    v = ev.select("user_id", "event_id", "value", _ts_us().alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w)
    return v.select(
        "user_id",
        "event_id",
        F.col("value").alias("version_value"),
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(nxt - 1, F.lit(253402300799000000)).alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "cdc_apply_changelog",
    """
    WITH ranked AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, value AS latest_value, ts_us AS updated_at_us
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="Changelog materialization (stream/table duality, SURVEY §1.3): events "
    "as a CDC stream per key — last writer wins, and a trailing delete "
    "('error' here) removes the key from the snapshot. One window shuffle on "
    "the key; at scale this is the compaction query behind every upsert table.",
)
def cdc_apply_changelog(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("value").alias("latest_value"),
            F.col("ts_us").alias("updated_at_us"),
        )
    )


@query(
    "join_range_binned",
    """
    SELECT a.event_id AS eid_a, b.event_id AS eid_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    """,
    doc="Pure range join (no equi key: any two events within 60 s) made scalable "
    "by time-binning: each left row replicates to its bin ±1, the join becomes "
    "an equi-join on the bin, and the exact predicate filters after — O(n) "
    "candidates instead of the O(n²) theta join the naive plan (BNLJ) would run.",
)
def join_range_binned(spark, sf_dir):
    bin_us = 60_000_000
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", _ts_us())
    a = ev.select(
        F.col("event_id").alias("eid_a"),
        F.col("ts_us").alias("ts_a"),
        F.explode(
            F.array(
                F.expr(f"ts_us div {bin_us}") - 1,
                F.expr(f"ts_us div {bin_us}"),
                F.expr(f"ts_us div {bin_us}") + 1,
            )
        ).alias("bin"),
    )
    b = ev.select(
        F.col("event_id").alias("eid_b"),
        F.col("ts_us").alias("ts_b"),
        F.expr(f"ts_us div {bin_us}").alias("bin_b"),
    )
    return (
        a.join(
            b,
            (a.bin == b.bin_b)
            & (a.eid_a < b.eid_b)
            & (F.abs(a.ts_a - b.ts_b) <= bin_us),
        )
        .select("eid_a", "eid_b", (F.col("ts_b") - F.col("ts_a")).alias("gap_us"))
    )


@query(
    "agg_approx_battery",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS approx_users_within_band,
           true AS p50_within_rank_band,
           true AS p95_within_rank_band,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="Native approximate aggregates (approx_count_distinct HLL++, "
    "approx_percentile GK) — the single-pass mergeable forms used instead of "
    "exact distinct/percentile at 100 TB.  HASH-GATED as a certificate "
    "(promoted from rows-only, r7): neither sketch has a DuckDB twin "
    "(re-verified 2026-08-15 — approx_distinct/approx_quantile are "
    "different algorithms), so the gated columns are the exact counts "
    "plus deterministic accuracy certificates: approx_users within "
    "max(2, 3*rsd=6%) of exact, and each GK percentile inside the exact "
    "[p-0.05, p+0.05] RANK band (GK at accuracy=10000 guarantees rank "
    "error <= 1e-4*N, so a +-5% rank band holds with ~500x margin; both "
    "sketches are deterministic for a fixed dataset).  Raw estimate "
    "error bounds stay pinned in tests/test_sketches.py.",
)
def agg_approx_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("_pcts"),
            F.expr("percentile(value, array(0.45, 0.55, 0.90, 1.0))").alias("_ex"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users").cast("double") - F.col("exact_users"))
                <= F.greatest(F.lit(2.0), 0.06 * F.col("exact_users"))
            ).alias("approx_users_within_band"),
            F.element_at("_pcts", 1)
            .between(F.element_at("_ex", 1), F.element_at("_ex", 2))
            .alias("p50_within_rank_band"),
            F.element_at("_pcts", 2)
            .between(F.element_at("_ex", 3), F.element_at("_ex", 4))
            .alias("p95_within_rank_band"),
            "n",
        )
    )


@query(
    "o21c_cumulate_window",
    """
    WITH base AS (
        SELECT user_id, value, epoch_us(ts) AS ts_us,
               (epoch_us(ts) // 1000000) - (epoch_us(ts) // 1000000) % 1200 AS start_s
        FROM events
    )
    SELECT user_id,
           start_s * 1000000 AS window_start_us,
           (start_s + k.k * 300) * 1000000 AS window_end_us,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM base CROSS JOIN (SELECT unnest(range(1, 5)) AS k) k
    WHERE ts_us < (start_s + k.k * 300) * 1000000
    GROUP BY 1, 2, 3
    """,
    doc="CUMULATE windowing TVF (Flink's fourth TVF, SURVEY §2.6; no Spark "
    "native form): 20-min base windows emitting expanding 5-min sub-windows — "
    "composed as an explode of the 4 candidate ends + filter, then the usual "
    "hash agg. Completes the TUMBLE/HOP/SESSION/CUMULATE matrix.",
)
def o21c_cumulate_window(spark, sf_dir):
    from .operators.relational import cumulate

    ev = _t(spark, sf_dir, "events")
    cw = cumulate(ev, "ts", step_s=300, size_s=1200)
    return (
        cw.groupBy("user_id", "window_start", "window_end")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("window_start").alias("window_start_us"),
            F.unix_micros("window_end").alias("window_end_us"),
            "n",
            "sum_value",
        )
    )


@query(
    "udaf_pandas_sumproduct",
    """
    SELECT event_type,
           CAST(sum(user_id * (event_id % 97)) AS BIGINT) AS sp,
           CAST(sum(user_id * (event_id % 97)) AS DOUBLE)
             / CAST(sum(event_id % 97) AS DOUBLE) AS wm
    FROM events GROUP BY event_type
    """,
    doc="Vectorized pandas UDAF on the SQL surface (SURVEY §2.10): an "
    "Arrow-batched grouped aggregate registered via spark.udf.register and "
    "invoked from spark.sql text. All-int64 math → exact regardless of "
    "accumulation order, so the hash gate applies to the UDAF path itself.",
)
def udaf_pandas_sumproduct(spark, sf_dir):
    from .functions.scalar import register_pandas_aggregates

    register_pandas_aggregates(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", (F.col("event_id") % 97).alias("w")
    )
    ev.createOrReplaceTempView("events_udaf_tmp")
    # NOTE: grouped-agg pandas UDFs cannot mix with built-in aggregates in
    # one GROUP BY (INVALID_PANDAS_UDF_PLACEMENT) — both outputs here are
    # pandas UDAFs. int64 sums exact; the double division is bit-identical.
    return spark.sql(
        """
        SELECT event_type, sumproduct(user_id, w) AS sp,
               weighted_mean(user_id, w) AS wm
        FROM events_udaf_tmp GROUP BY event_type
        """
    )


@query(
    "streaming_cumulate_5m20m",
    """
    WITH cand AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               (epoch_us(ts) // 1000000) - (epoch_us(ts) // 1000000) % 1200 AS start_s,
               k.k AS k
        FROM events CROSS JOIN (SELECT unnest(range(1, 5)) AS k) k
    ), w AS (
        SELECT start_s, start_s + k * 300 AS end_s, user_id, count(*) AS n
        FROM cand
        WHERE ts_us < (start_s + k * 300) * 1000000
        GROUP BY 1, 2, 3
    ), m AS (SELECT (max(epoch_us(ts)) // 1000 - 600000) AS wm_ms FROM events)
    SELECT start_s AS window_start_s, end_s AS window_end_s, user_id, n
    FROM w, m
    WHERE (start_s + 1200) * 1000 <= wm_ms
    """,
    doc="Streaming CUMULATE (5-min step, 20-min size) under the oracle gate: "
    "sub-window k = a tumbling base-window agg over rows pre-filtered to "
    "offset < k*step (Spark forbids slide > duration, so the direct "
    "hop-family encoding is unavailable); 4 such branches union in ONE "
    "availableNow query (parallel stateful operators). Append emission is "
    "therefore keyed to the BASE window close — all of a base window's "
    "sub-windows emit when the watermark passes its end, which the oracle "
    "cutoff reproduces ((start+size) <= final watermark).",
)
def streaming_cumulate_5m20m(spark, sf_dir):
    from functools import reduce

    from .sources.testdata import events_stream

    ev = events_stream(spark, sf_dir)
    wm = ev.withWatermark("ts", "10 minutes")
    branches = []
    for k in range(1, 5):
        # filter AFTER the watermark node: each branch's watermark must
        # track the GLOBAL max event time, not the filtered subset's
        sub = wm.filter(F.expr("unix_micros(ts) div 1000000") % 1200 < 300 * k)
        branches.append(
            sub.groupBy(F.window("ts", "1200 seconds").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_timestamp("w.start").alias("window_start_s"),
                (F.unix_timestamp("w.start") + F.lit(300 * k)).alias("window_end_s"),
                "user_id",
                "n",
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), branches)
    return _drain_to_memory(spark, u, "stream_cumulate_")


@query(
    "streaming_ss_left_outer_join",
    """
    WITH c AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
        FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT least(
            (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'click'),
            (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'purchase')
        ) - 600000000 AS wm_us
    ), matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id, p.pts - c.cts AS gap_us
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.pts > c.cts AND p.pts - c.cts <= 3600000000
    )
    SELECT click_id, purchase_id, user_id, gap_us FROM matched
    UNION ALL
    SELECT c.click_id, NULL, c.user_id, NULL
    FROM c, m
    WHERE NOT EXISTS (
        SELECT 1 FROM p WHERE p.user_id = c.user_id
                          AND p.pts > c.cts AND p.pts - c.cts <= 3600000000
    )
    AND c.cts + 3600000000 < wm_us
    """,
    doc="STREAM-STREAM LEFT OUTER interval join under the oracle gate: matches "
    "emit as they arrive; a click with no purchase emits null-padded ONLY once "
    "the (min-of-sources) watermark passes its whole match window — the oracle "
    "reproduces that state-expiry cutoff (cts + bound < min(max_c, max_p) − "
    "delay, calibrated at both SFs).",
)
def streaming_ss_left_outer_join(spark, sf_dir):
    return _drain_to_memory(
        spark,
        _click_purchase_interval_join(spark, sf_dir, "left_outer"),
        "stream_ss_lo_",
    )


@query(
    "streaming_ss_full_outer_join",
    """
    WITH c AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
        FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT least(
            (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'click'),
            (SELECT max(epoch_us(ts)) FROM events WHERE event_type = 'purchase')
        ) - 600000000 AS wm_us
    ), matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id, p.pts - c.cts AS gap_us
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.pts > c.cts AND p.pts - c.cts <= 3600000000
    )
    SELECT click_id, purchase_id, user_id, gap_us FROM matched
    UNION ALL
    SELECT c.click_id, NULL, c.user_id, NULL
    FROM c, m
    WHERE NOT EXISTS (
        SELECT 1 FROM p WHERE p.user_id = c.user_id
                          AND p.pts > c.cts AND p.pts - c.cts <= 3600000000
    )
    AND c.cts + 3600000000 < wm_us
    UNION ALL
    SELECT NULL, p.purchase_id, p.user_id, NULL
    FROM p, m
    WHERE NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = p.user_id
                          AND p.pts > c.cts AND p.pts - c.cts <= 3600000000
    )
    AND p.pts < wm_us
    """,
    doc="STREAM-STREAM FULL OUTER interval join under the oracle gate — the "
    "remaining member of the stream-stream matrix. Null-padded emission is "
    "per-side state expiry: a click expires when the watermark passes its "
    "whole match window (cts + 1 h < wm), a purchase when the watermark "
    "passes its own event time (matching clicks have cts < pts, so pts < wm "
    "ends its candidacy); the oracle reproduces both cutoffs from the "
    "min-of-sources final watermark.",
)
def streaming_ss_full_outer_join(spark, sf_dir):
    return _drain_to_memory(
        spark,
        _click_purchase_interval_join(spark, sf_dir, "full_outer"),
        "stream_ss_fo_",
    )


@query(
    "agg_string_collect",
    """
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types_sorted,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    doc="Ordered collect aggregation: per-key sorted concatenation "
    "(collect_list is unordered in Spark — array_sort makes it deterministic, "
    "matching DuckDB's ORDER BY inside the aggregate).",
)
def agg_string_collect(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("types_sorted"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "join_anti_null_aware",
    """
    SELECT c_custkey, c_name
    FROM (SELECT nullif(c_custkey % 1000, 7) AS k, c_custkey, c_name FROM customer)
    WHERE k NOT IN (SELECT o_custkey % 1000 FROM orders WHERE o_totalprice > 450000)
    """,
    doc="Null-aware anti join (NOT IN with a nullable probe): three-valued "
    "logic drops NULL probes AND matches — Spark plans the dedicated "
    "null-aware anti join instead of a naive per-row subquery.",
)
def join_anti_null_aware(spark, sf_dir):
    from .sources.testdata import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM (SELECT nullif(c_custkey % 1000, 7) AS k, c_custkey, c_name FROM customer)
        WHERE k NOT IN (SELECT o_custkey % 1000 FROM orders WHERE o_totalprice > 450000)
        """
    )


@query(
    "window_range_value_frame",
    """
    SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS roll_1h_milli,
           count(*) OVER w AS roll_1h_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-by-value window frame: per-key rolling 1-hour sum/count ordered "
    "by event time (the streaming sliding-aggregate shape as a batch OVER "
    "frame). Integer milli-units keep the running sum order-insensitive; "
    "timestamp peers share a frame in both engines.",
)
def window_range_value_frame(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(_ts_us().cast("long"))
        .rangeBetween(-3_600_000_000, 0)
    )
    v = F.floor(F.col("value") * 1000)
    return ev.select(
        "user_id",
        _ts_us().alias("ts_us"),
        F.sum(v).over(w).alias("roll_1h_milli"),
        F.count(F.lit(1)).over(w).alias("roll_1h_n"),
    )


@query(
    "stats_regression_components",
    """
    WITH e AS (
        SELECT event_type, user_id AS y, CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(y) AS BIGINT) AS sum_y,
           CAST(sum(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS sum_xx,
           CAST(sum(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sum_xy
    FROM e GROUP BY event_type
    """,
    doc="Exact regression/correlation sufficient statistics (n, Σx, Σy, Σx², "
    "Σxy) in integer milli-units — one distributed pass, mergeable map-side "
    "partials; the consumer derives slope/intercept/r locally. The exact-math "
    "alternative to order-sensitive double corr()/covar() at 100 TB: the "
    "second-order sums accumulate in DECIMAL(38,0) (Σx² of milli-unit values "
    "passes 2^63 around ~4e7 rows per group — int64 would overflow long "
    "before the claimed scale).",
)
def stats_regression_components(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 1000)
    xd = x.cast("decimal(19,0)")
    y = F.col("user_id")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_x"),
        F.sum(y).alias("sum_y"),
        F.sum(xd * x).cast("decimal(38,0)").alias("sum_xx"),
        F.sum(xd * y).cast("decimal(38,0)").alias("sum_xy"),
    )


@query(
    "quantile_per_group",
    """
    SELECT event_type,
           quantile_cont(value, 0.25) AS q25,
           quantile_cont(value, 0.5) AS q50,
           quantile_cont(value, 0.75) AS q75,
           quantile_cont(value, 0.99) AS q99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated quantiles per group (the distribution-profile "
    "battery): sort-based, order-insensitive, so engine-exact on doubles — "
    "extends agg_median to a full per-group profile. At 100 TB the same "
    "surface swaps to approx_percentile (agg_approx_battery).",
)
def quantile_per_group(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.99D))")
    return ev.groupBy("event_type").agg(pct.alias("p")).select(
        "event_type",
        F.col("p")[0].alias("q25"),
        F.col("p")[1].alias("q50"),
        F.col("p")[2].alias("q75"),
        F.col("p")[3].alias("q99"),
    )


@query(
    "cep_click_then_purchase",
    """
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
    ), s AS (
        SELECT *,
            last_value(CASE WHEN event_type = 'click' THEN t END IGNORE NULLS)
                OVER w AS last_click,
            last_value(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS)
                OVER w AS last_err
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_id, t AS purchase_t,
           last_click, t - last_click AS gap_us
    FROM s
    WHERE event_type = 'purchase'
      AND last_click IS NOT NULL
      AND last_click >= t - 1800000000
      AND (last_err IS NULL OR last_err < last_click)
    """,
    doc="Sequential pattern detection (Flink-CEP analog): click FOLLOWED BY "
    "purchase within 30 min with no error between — one shuffle + one per-key "
    "sort via running last_value(...ignore nulls) carries, no self-joins, so "
    "it scales linearly in events per key.",
)
def cep_click_then_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    t = _ts_us()
    e = ev.select("user_id", "event_id", "event_type", t.alias("t"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc = F.last(F.when(F.col("event_type") == "click", F.col("t")), ignorenulls=True).over(w)
    le = F.last(F.when(F.col("event_type") == "error", F.col("t")), ignorenulls=True).over(w)
    return (
        e.withColumn("last_click", lc)
        .withColumn("last_err", le)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
            & (F.col("last_click") >= F.col("t") - 1_800_000_000)
            & (F.col("last_err").isNull() | (F.col("last_err") < F.col("last_click")))
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("t").alias("purchase_t"),
            "last_click",
            (F.col("t") - F.col("last_click")).alias("gap_us"),
        )
    )


_HOURLY_GRID_CTES = """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               CAST(floor(value * 1000) AS BIGINT) AS v
        FROM events
    ), ranked AS (
        SELECT user_id, t - t % 3600000000 AS hour_us, v,
               row_number() OVER (PARTITION BY user_id, t - t % 3600000000
                                  ORDER BY t DESC, event_id DESC) AS rn
        FROM e
    ), obs AS (
        SELECT user_id, hour_us, v FROM ranked WHERE rn = 1
    ), spans AS (
        SELECT user_id, min(hour_us) AS h0, max(hour_us) AS h1
        FROM obs GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, 3600000000)) AS hour_us
        FROM spans
    )"""


def _hourly_obs_grid(spark, sf_dir):
    """Shared construction for the gap-filling family: last observation
    per (user, hour) chosen by (t, event_id) arg-max (one hash agg), and
    the per-key dense hourly grid via sequence+explode (no driver loop).
    Returns (grid, obs); the oracle-side twin is _HOURLY_GRID_CTES — any
    change to the hour bucket or the arg-max tiebreak is made in BOTH,
    nowhere else."""
    hour = 3_600_000_000
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        _ts_us().alias("t"),
        F.floor(F.col("value") * 1000).alias("v"),
    ).withColumn("hour_us", F.col("t") - F.col("t") % hour)
    obs = e.groupBy("user_id", "hour_us").agg(
        F.max_by("v", F.struct("t", "event_id")).alias("v")
    )
    spans = obs.groupBy("user_id").agg(
        F.min("hour_us").alias("h0"), F.max("hour_us").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.lit(hour).cast("long"))).alias("hour_us"),
    )
    return grid, obs


@query(
    "gapfill_hour_forward_fill",
    _HOURLY_GRID_CTES + """
    SELECT g.user_id, g.hour_us // 1000000 AS hour_s,
           last_value(o.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid g LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.hour_us = o.hour_us
    """,
    doc="Time-series gap filling: per-key hourly grid (sequence+explode — no "
    "driver loop) + last-observation-carried-forward via a running "
    "last(ignorenulls). Last observation per hour is arg-max by (t, event_id) "
    "— a single hash agg in Spark (max_by), no pre-sort. The resample/fill "
    "primitive every monitoring rollup needs.",
)
def gapfill_hour_forward_fill(spark, sf_dir):
    grid, obs = _hourly_obs_grid(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "hour_us"], "left")
        .select(
            "user_id",
            (F.col("hour_us") / 1_000_000).cast("long").alias("hour_s"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


@query(
    "join_asof_forward_tolerance",
    """
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS tp FROM events
        WHERE event_type = 'purchase'
    ), x AS (
        SELECT user_id, epoch_us(ts) AS te FROM events WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.tp AS t_purchase_us,
           min(x.te) AS t_error_us,
           min(x.te) - p.tp AS delta_us
    FROM p JOIN x
      ON x.user_id = p.user_id AND x.te > p.tp AND x.te <= p.tp + 3600000000
    GROUP BY 1, 2, 3
    """,
    doc="Forward as-of join with tolerance: for each purchase, the FIRST error "
    "event of the same user within the following hour (the mirror of the "
    "backward as-of at join_asof_prev_purchase). Scale path: both sides "
    "bucketed into 1 h bins, error side duplicated to its bin and the "
    "preceding bin, equi-join on (user, bin) bounds candidates to the "
    "tolerance window — no range theta-join; min() collapses to the first "
    "match. All-integer µs output.",
)
def join_asof_forward_tolerance(spark, sf_dir):
    tol = 3_600_000_000
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", _ts_us().alias("tp")
    ).withColumn("bin", (F.col("tp") / tol).cast("long"))
    x = ev.filter(F.col("event_type") == "error").select(
        "user_id", _ts_us().alias("te")
    )
    # duplicate the right side into its own bin and the previous one so a
    # purchase's (tp, tp+tol] window is fully covered by one equi-join key
    xb = x.select(
        "user_id", "te", F.explode(
            F.array((F.col("te") / tol).cast("long"), (F.col("te") / tol).cast("long") - 1)
        ).alias("bin")
    )
    return (
        p.join(xb, ["user_id", "bin"])
        .filter((F.col("te") > F.col("tp")) & (F.col("te") <= F.col("tp") + tol))
        .groupBy("event_id", "user_id", "tp")
        .agg(F.min("te").alias("t_error_us"))
        .select(
            "event_id",
            "user_id",
            F.col("tp").alias("t_purchase_us"),
            "t_error_us",
            (F.col("t_error_us") - F.col("tp")).alias("delta_us"),
        )
    )


@query(
    "gapfill_linear_interpolation",
    _HOURLY_GRID_CTES + """
    , ctx AS (
        SELECT g.user_id, g.hour_us, o.v,
               last_value(o.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN o.v IS NOT NULL THEN g.hour_us END IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               first_value(o.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN o.v IS NOT NULL THEN g.hour_us END IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM grid g LEFT JOIN obs o
          ON g.user_id = o.user_id AND g.hour_us = o.hour_us
    )
    SELECT user_id, hour_us // 1000000 AS hour_s,
           CASE WHEN hour_us = ph THEN pv
                ELSE pv + CAST(floor((nv - pv) * (hour_us - ph) * 1.0 / (nh - ph)) AS BIGINT)
           END AS v_interp
    FROM ctx
    """,
    doc="Time-series gap filling by LINEAR interpolation (the companion to the "
    "forward-fill variant): per-key hourly grid, prev/next observation via "
    "directional ignore-nulls window frames, interpolated value in exact "
    "integer milli-units (floor of the rational interpolant — both engines "
    "compute the same double quotient of exact ints, well inside 2^53).",
)
def gapfill_linear_interpolation(spark, sf_dir):
    grid, obs = _hourly_obs_grid(spark, sf_dir)
    back = (
        Window.partitionBy("user_id").orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward lookup as a RUNNING frame over descending order: Spark's
    # [currentRow, unboundedFollowing] frame re-scans the partition tail
    # per row (O(n²) — measured 16 s vs 1.5 s on a 1M-row grid); the
    # desc-ordered unbounded-preceding frame is the O(n) incremental
    # equivalent of first_value-ignorenulls-over-the-future.
    fwd_desc = (
        Window.partitionBy("user_id").orderBy(F.desc("hour_us"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = F.when(F.col("v").isNotNull(), F.col("hour_us"))
    ctx = (
        grid.join(obs, ["user_id", "hour_us"], "left")
        .select(
            "user_id",
            "hour_us",
            F.last("v", ignorenulls=True).over(back).alias("pv"),
            F.last(marked, ignorenulls=True).over(back).alias("ph"),
            F.last("v", ignorenulls=True).over(fwd_desc).alias("nv"),
            F.last(marked, ignorenulls=True).over(fwd_desc).alias("nh"),
        )
    )
    interp = F.when(F.col("hour_us") == F.col("ph"), F.col("pv")).otherwise(
        F.col("pv")
        + F.floor(
            (F.col("nv") - F.col("pv")) * (F.col("hour_us") - F.col("ph")) * F.lit(1.0)
            / (F.col("nh") - F.col("ph"))
        )
    )
    return ctx.select(
        "user_id",
        (F.col("hour_us") / 1_000_000).cast("long").alias("hour_s"),
        interp.alias("v_interp"),
    )


@query(
    "time_weighted_avg",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               CAST(floor(value * 1000) AS BIGINT) AS v
        FROM events
    ), seg AS (
        SELECT user_id, v,
               lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
        FROM e
    )
    SELECT user_id,
           CAST(sum(CAST(v AS DECIMAL(19,0)) * dur) AS DOUBLE)
             / CAST(sum(CAST(dur AS DECIMAL(38,0))) AS DOUBLE) AS twa_milli,
           count(*) AS n_segments
    FROM seg WHERE dur IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average per key: each observation weighted by its "
    "holding duration until the next one (lead() with (t, event_id) total "
    "order; the last open-ended observation is excluded). Both the "
    "value×duration products and the duration total accumulate in "
    "DECIMAL(38,0) — exact and order-insensitive — with ONE double division "
    "at the end; the irregular-sampling mean every sensor rollup needs.",
)
def time_weighted_avg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seg = (
        ev.select(
            "user_id",
            "event_id",
            _ts_us().alias("t"),
            F.floor(F.col("value") * 1000).alias("v"),
        )
        .withColumn("dur", F.lead("t").over(w) - F.col("t"))
        .filter(F.col("dur").isNotNull())
    )
    # the PRODUCT must be decimal, not just the sum input: v*dur as an
    # int64 multiply overflows first (v ~ 4e6 milli-units x a 30-day gap
    # ~ 2.6e12 us is ~1e19 > Long.MAX) — cast v to decimal so the multiply
    # itself widens (decimal(19,0) x long -> decimal(38,0))
    return seg.groupBy("user_id").agg(
        (
            F.sum(F.col("v").cast("decimal(19,0)") * F.col("dur")).cast("double")
            / F.sum(F.col("dur").cast("decimal(38,0)")).cast("double")
        ).alias("twa_milli"),
        F.count(F.lit(1)).alias("n_segments"),
    )


@query(
    "source_orc_roundtrip",
    _ROUNDTRIP_ORACLE,
    doc="ORC source/sink round-trip with explicit schema — the third columnar "
    "format of the source surface (parquet/JSON/CSV/ORC), same bit-exact "
    "contract as the JSON path.",
)
def source_orc_roundtrip(spark, sf_dir):
    path = _warehouse_path(sf_dir, "events_orc")
    _roundtrip_base(spark, sf_dir).write.mode("overwrite").orc(path)
    return spark.read.schema(
        "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
    ).orc(path)


@query(
    "source_kafka_avro_roundtrip",
    None,  # the recorded topic is not a DuckDB-visible table → rows-only;
    # codec/offset/value semantics pinned in tests/test_kafka_wire.py
    doc="O1 END-TO-END under the driver gate: the reference's primary "
    "source path (3-partition Kafka topic of Confluent-framed Avro, "
    "main.tf:170-185 / schema.tf:4-151) executed through the REAL "
    "read_kafka_avro_stream — simulator events → SR wire-format Avro "
    "bytes recorded as a 3-partition topic → kafka_sim DataSource "
    "(same record schema + startingOffsets contract as format('kafka')) "
    "→ wire strip → Avro decode → per-patient aggregation.  Deterministic "
    "seeded fixture; integer-exact outputs.  With a broker + "
    "spark-sql-kafka jar the identical call runs with "
    "source_format='kafka'.",
)
def source_kafka_avro_roundtrip(spark, sf_dir):
    import os

    from pyspark.sql import types as T

    from .fixtures import health_events_df
    from .schemas import HEALTH_EVENT_SCHEMA
    from .sources import kafka_sim
    from .sources.avro_codec import confluent_frame, encode_record
    from .sources.kafka import avro_schema_json, read_kafka_avro_stream

    value_schema = T.StructType(
        [f for f in HEALTH_EVENT_SCHEMA.fields if f.name != "event_time"]
    )
    schema_json = avro_schema_json(value_schema)
    # epoch-us computed SPARK-side (unix_micros): collect() returns naive
    # datetimes rendered in the OS-local timezone, so a driver-side
    # `event_time - epoch(1970)` subtraction is off by the UTC offset on
    # any non-UTC host — the recorded topic must be host-tz independent
    rows = sorted(
        health_events_df(spark, n_ticks=60, interval_s=0.5, seed=7)
        .withColumn("ts_us", F.unix_micros("event_time"))
        .collect(),
        key=lambda r: (r.ts_us, r.event_id),
    )
    recs, off = [], {0: 0, 1: 0, 2: 0}
    for i, r in enumerate(rows):
        p = i % 3
        rec = {
            "event_id": r.event_id,
            "patient_id": r.patient_id,
            "device_metadata": r.device_metadata.asDict(),
            "vitals": {
                "heart_rate": r.vitals.heart_rate,
                "blood_oxygen_spO2": r.vitals.blood_oxygen_spO2,
                "blood_pressure": r.vitals.blood_pressure.asDict(),
                "body_temperature_c": r.vitals.body_temperature_c,
            },
        }
        recs.append(
            {
                "partition": p,
                "offset": off[p],
                "key": str(r.patient_id).encode(),
                "value": bytearray(
                    confluent_frame(encode_record(schema_json, rec), 7)
                ),
                "timestamp_us": r.ts_us,
            }
        )
        off[p] += 1
    topic_dir = _warehouse_path(sf_dir, "kafka_topic")
    os.makedirs(topic_dir, exist_ok=True)
    topic_path = os.path.join(topic_dir, "topic.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(recs), topic_path)

    kafka_sim.register(spark)
    stream = read_kafka_avro_stream(
        spark,
        "sim-broker:9092",
        "events",
        value_schema,
        starting_offsets="earliest",
        decoder="python",
        source_format="kafka_sim",
        extra_options={"path": topic_path},
    )
    decoded = _drain_to_memory(spark, stream, "kafka_rt_")
    return decoded.groupBy("patient_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("vitals.heart_rate").cast("long")).alias("hr_sum"),
        F.min(F.unix_micros("event_time")).alias("first_event_us"),
        F.max(F.unix_micros("event_time")).alias("last_event_us"),
    )


@query(
    "source_partitioned_pruning",
    """
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, value, event_type
    FROM events WHERE event_type = 'purchase'
    """,
    doc="Hive-partitioned write + statically partition-pruned read: events laid "
    "out partitionBy(event_type), the predicate resolves to PartitionFilters so "
    "the scan opens only the one matching directory (asserted in "
    "tests/test_plan_pruning.py) — the layout that turns a 100 TB full scan "
    "into a single-partition read.",
)
def source_partitioned_pruning(spark, sf_dir):
    path = _warehouse_path(sf_dir, "events_by_type")
    _roundtrip_base(spark, sf_dir).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)
    df = spark.read.schema(
        "event_id bigint, ts_us bigint, user_id bigint, value double, event_type string"
    ).parquet(path)
    return df.filter(F.col("event_type") == "purchase")


@query(
    "map_function_battery",
    """
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN n END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'error' THEN n END) AS BIGINT) AS n_error,
           count(*) AS n_types,
           bool_or(event_type = 'view') AS has_view
    FROM counts GROUP BY user_id
    """,
    doc="MapType surface: per-key event-type histogram as a map column "
    "(map_from_entries over a sorted collect), consumed via element_at / size "
    "/ map_contains_key — missing keys surface as NULL (map semantics), which "
    "the conditional-aggregation oracle mirrors.",
)
def map_function_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "error").alias("n_error"),
        F.size("m").cast("long").alias("n_types"),
        F.map_contains_key("m", "view").alias("has_view"),
    )


@query(
    "regexp_battery",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]{5,})', 1) AS first_long_word,
           len(regexp_extract_all(text, 'the', 0)) AS n_the,
           regexp_matches(text, 'join .* merge') AS join_then_merge,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels
    FROM documents
    """,
    doc="Regex function battery over documents.text (extract / extract-all "
    "count / rlike / global replace) — patterns restricted to the "
    "Java-regex ∩ RE2 common subset so both engines agree byte-for-byte.",
)
def regexp_battery(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{5,})", 1).alias("first_long_word"),
        F.size(F.expr("regexp_extract_all(text, 'the', 0)")).cast("long").alias("n_the"),
        F.col("text").rlike("join .* merge").alias("join_then_merge"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias("len_no_vowels"),
    )


@query(
    "json_function_battery",
    """
    WITH j AS (
        SELECT event_id,
               printf('{"a": %d, "b": {"c": "%s"}, "arr": [%d, %d]}',
                      user_id, event_type, event_id % 10, user_id % 10) AS payload,
               props
        FROM events
    )
    SELECT event_id,
           CAST(json_extract(payload, '$.a') AS BIGINT) AS a,
           json_extract_string(payload, '$.b.c') AS c,
           CAST(json_extract(payload, '$.arr[1]') AS BIGINT) AS arr1,
           json_array_length(payload, '$.arr') AS arr_len,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM j
    """,
    doc="JSON function battery: construct → path-extract (nested field, array "
    "index, array length) → typed cast, plus the props column from the events "
    "table (get_json_object / from_json on the Spark side; o10's semi-"
    "structured access generalized).",
)
def json_function_battery(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    payload = F.format_string(
        '{"a": %d, "b": {"c": "%s"}, "arr": [%d, %d]}',
        F.col("user_id"),
        F.col("event_type"),
        F.col("event_id") % 10,
        F.col("user_id") % 10,
    )
    j = ev.select("event_id", payload.alias("payload"), "props")
    parsed = F.from_json(
        F.col("payload"), "a bigint, b struct<c: string>, arr array<bigint>"
    )
    return j.select(
        "event_id",
        parsed["a"].alias("a"),
        F.get_json_object("payload", "$.b.c").alias("c"),
        parsed["arr"][1].alias("arr1"),
        F.size(parsed["arr"]).cast("long").alias("arr_len"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "streaming_dedup_within_watermark",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Bounded-state streaming dedup: dropDuplicatesWithinWatermark keeps "
    "per-key state only until the watermark passes it — the ONLY dedup that "
    "survives an infinite stream (plain dropDuplicates state grows without "
    "bound; reference O30's append windows face the same trade). availableNow "
    "over one file is a single micro-batch, so the in-watermark guarantee "
    "covers the whole input and the sink must equal exact batch dedup; the "
    "post-sink per-type rollup makes the check independent of which "
    "duplicate's timestamp survived.",
)
def streaming_dedup_within_watermark(spark, sf_dir):
    from .sources.testdata import events_stream

    ev = events_stream(spark, sf_dir)
    dd = (
        ev.select("user_id", "event_type", "ts")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    return (
        _drain_to_memory(spark, dd, "stream_ddww_")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "source_csv_malformed_drop",
    _ROUNDTRIP_ORACLE,
    doc="Malformed-record tolerance on the CSV ingest path: the written "
    "events CSV is polluted with a planted part-file of malformed lines "
    "(wrong arity, unparsable numerics) and read back with "
    "mode=DROPMALFORMED — bad lines are quarantined by the reader, good "
    "rows survive bit-exactly (oracle = the original events table).  The "
    "ingest-gate contract a 100 TB raw-landing pipeline relies on; the "
    "PERMISSIVE + _corrupt_record capture variant (with its documented "
    "cache requirement) is pinned in tests/test_corrupt_quarantine.py.",
)
def source_csv_malformed_drop(spark, sf_dir):
    import os

    path = _warehouse_path(sf_dir, "events_csv_malformed")
    _roundtrip_base(spark, sf_dir).write.mode("overwrite").option("header", "true").csv(path)
    with open(os.path.join(path, "part-corrupt.csv"), "w") as f:
        f.write("event_id,ts_us,user_id,event_type,value\n")
        f.write("not,a,valid\n")
        f.write("xx,yy,zz,qq,ww\n")
    return (
        spark.read.schema(
            "event_id bigint, ts_us bigint, user_id bigint, event_type string, value double"
        )
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
