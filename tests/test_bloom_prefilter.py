"""The Bloom runtime-filter semi-join must (a) produce exactly the IN
semantics and (b) genuinely prune the fact side BEFORE the join — the
100 TB point of the operator is shuffling/probing only near-matches."""

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.sources.testdata import load_table


def _dim(orders):
    return orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")


def test_bloom_prunes_fact_side(spark, sf_smoke_dir):
    from health_monitor_cc_flink_spark.registry_pipeline_ops import (  # noqa: F401
        join_bloom_semi_prefilter,
    )

    li = load_table(spark, sf_smoke_dir, "lineitem")
    orders = load_table(spark, sf_smoke_dir, "orders")
    dim = _dim(orders)

    n_fact = li.count()
    n_true = li.join(F.broadcast(dim), li.l_orderkey == dim.o_orderkey, "left_semi").count()

    # Rebuild just the pruned (pre-exact-join) stage the operator uses.
    M_BITS = 1 << 16
    pos = [F.pmod(F.xxhash64("o_orderkey", F.lit(s)), F.lit(M_BITS)) for s in (1, 2, 3)]
    bits = dim.select(F.explode(F.array(*pos)).alias("h")).select(
        F.expr("h div 64").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))").alias("b"),
    )
    words = {r["w"]: r["m"] for r in bits.groupBy("w").agg(F.expr("bit_or(b)").alias("m")).collect()}
    bloom = F.array(*[F.lit(int(words.get(w, 0))).cast("long") for w in range(M_BITS // 64)])
    pruned = li.withColumn("_bloom", bloom)
    for i, h in enumerate(
        [F.pmod(F.xxhash64("l_orderkey", F.lit(s)), F.lit(M_BITS)) for s in (1, 2, 3)]
    ):
        pruned = pruned.withColumn(f"_h{i}", h).filter(
            F.expr(
                f"(shiftrightunsigned(element_at(_bloom, CAST(_h{i} div 64 AS INT) + 1),"
                f" CAST(_h{i} % 64 AS INT)) & 1) = 1"
            )
        )
    n_pruned = pruned.count()

    # sound: every true match survives the bloom
    assert n_pruned >= n_true
    # effective: false-positive margin is small relative to what was cut
    assert n_pruned < n_fact * 0.5, (n_pruned, n_fact)
    fp = n_pruned - n_true
    assert fp <= max(50, n_true), (fp, n_true)
