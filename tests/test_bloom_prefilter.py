"""The Bloom runtime-filter semi-join must (a) produce exactly the IN
semantics and (b) genuinely prune the fact side BEFORE the join — the
100 TB point of the operator is shuffling/probing only near-matches."""

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.registry_pipeline_ops import _bloom_prune
from health_monitor_cc_flink_spark.sources.testdata import load_table


def _dim(orders):
    return orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")


def test_bloom_prunes_fact_side(spark, sf_smoke_dir):
    li = load_table(spark, sf_smoke_dir, "lineitem")
    orders = load_table(spark, sf_smoke_dir, "orders")
    dim = _dim(orders)

    n_fact = li.count()
    n_true = li.join(F.broadcast(dim), li.l_orderkey == dim.o_orderkey, "left_semi").count()

    pruned = _bloom_prune(li, "l_orderkey", dim, "o_orderkey")
    n_pruned = pruned.count()
    # the helper must not leak its scratch columns
    assert pruned.columns == li.columns

    # sound: every true match survives the bloom
    assert n_pruned >= n_true
    # effective: false-positive margin is small relative to what was cut
    assert n_pruned < n_fact * 0.5, (n_pruned, n_fact)
    fp = n_pruned - n_true
    assert fp <= max(50, n_true), (fp, n_true)
