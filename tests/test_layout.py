"""Z-order layout: a rectangular 2-D predicate over a Z-clustered table
must intersect far fewer parquet row groups (the min/max stats every
parquet reader prunes on) than over a randomly-laid-out copy."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.layout import morton_interleave, write_zordered
from health_monitor_cc_flink_spark.sources.testdata import load_table


def _row_groups_intersecting(path, rect):
    """(#row groups whose [min,max] boxes intersect rect, total row groups).
    rect = {col: (lo, hi)}."""
    hit = total = 0
    for f in glob.glob(path + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            intersects = True
            for col, (lo, hi) in rect.items():
                st = g.column(schema_names.index(col)).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats → cannot prune → counts as a hit
                if st.max < lo or st.min > hi:
                    intersects = False
                    break
            hit += intersects
    return hit, total


def test_morton_locality(spark):
    # interleave(3, 5): x=0b011 on even bits, y=0b101 on odd -> 0b100111 = 39
    row = spark.range(1).select(
        morton_interleave(F.lit(3).cast("bigint"), F.lit(5).cast("bigint"), bits=3).alias("z")
    ).first()
    assert row.z == 39


def test_zorder_prunes_2d_rectangles(spark, sf_smoke_dir, tmp_path):
    ev = load_table(spark, sf_smoke_dir, "events").select("event_id", "user_id", "value")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(ev, zpath, ("user_id", "value"), n_files=16)
    ev.repartition(16).write.parquet(rpath)  # contrast: random clustering

    # middle ~30% of each dimension's actual range
    st = ev.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("value").alias("vlo"), F.max("value").alias("vhi"),
    ).first()
    u0 = st.ulo + (st.uhi - st.ulo) * 0.35
    u1 = st.ulo + (st.uhi - st.ulo) * 0.65
    v0 = st.vlo + (st.vhi - st.vlo) * 0.35
    v1 = st.vlo + (st.vhi - st.vlo) * 0.65
    rect = {"user_id": (u0, u1), "value": (v0, v1)}
    z_hit, z_total = _row_groups_intersecting(zpath, rect)
    r_hit, r_total = _row_groups_intersecting(rpath, rect)
    # the random layout cannot prune (every file spans both full ranges);
    # the Z-order layout must skip most row groups on the same predicate
    assert r_hit == r_total > 0, (r_hit, r_total)
    assert z_hit <= z_total // 2, (z_hit, z_total)

    # correctness: identical result sets through Spark
    pred = (
        (F.col("user_id") >= u0)
        & (F.col("user_id") <= u1)
        & (F.col("value") >= v0)
        & (F.col("value") <= v1)
    )
    zs = {r.event_id for r in spark.read.parquet(zpath).filter(pred).collect()}
    rs = {r.event_id for r in spark.read.parquet(rpath).filter(pred).collect()}
    assert zs == rs and zs
