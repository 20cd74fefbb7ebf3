"""Plan-quality gates: nested-field schema pruning and scan-level column
pruning must reach the parquet reader (ReadSchema), and predicates must
reach PushedFilters — the non-negotiables for 100 TB scans."""

from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.sources.testdata import load_table


def _scan_line(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return next(l for l in plan.splitlines() if "FileScan parquet" in l or "Scan parquet" in l)


def test_nested_schema_pruning(spark, tmp_path):
    """Selecting one leaf of the nested vitals struct must read ONLY that
    leaf: ReadSchema shows vitals<heart_rate> without the sibling fields."""
    path = str(tmp_path / "nested")
    health_events_df(spark, n_ticks=40, interval_s=0.5, seed=1).write.parquet(path)
    df = spark.read.parquet(path).select(
        "patient_id", F.col("vitals.heart_rate").alias("hr")
    )
    df.collect()
    scan = _scan_line(df)
    assert "heart_rate" in scan
    assert "blood_oxygen" not in scan and "blood_pressure" not in scan, scan


def test_column_pruning_and_pushdown(spark, sf_smoke_dir):
    """A 2-column projection with a filter over the 16-column lineitem
    table must scan only those columns and push the predicate down."""
    li = load_table(spark, sf_smoke_dir, "lineitem")
    df = li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )
    df.collect()
    scan = _scan_line(df)
    assert "ReadSchema" in scan
    read_schema = scan.split("ReadSchema:")[1]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_comment" not in read_schema and "l_quantity" not in read_schema
    assert "PushedFilters: [" in scan and "l_shipdate" in scan.split("PushedFilters:")[1].split("ReadSchema")[0]


def test_hive_partition_pruning(spark, sf_smoke_dir):
    """source_partitioned_pruning's scan must resolve the event_type
    predicate as a PartitionFilter (directory pruning), not a data filter:
    the executed scan reads 1 of the 5 type partitions."""
    from health_monitor_cc_flink_spark.registry import all_queries

    spec = next(s for s in all_queries() if s.name == "source_partitioned_pruning")
    df = spec.fn(spark, sf_smoke_dir)
    df.collect()
    scan = _scan_line(df)
    assert "PartitionFilters" in scan, scan
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    # the literal value must be in the rendered filter (an empty
    # PartitionFilters: [] would otherwise pass a bare substring check)
    assert "event_type" in pf and "purchase" in pf, scan
    # runtime proof of directory pruning: the files actually opened by the
    # scan are all from the one matching partition directory
    files = [
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("event_type=purchase" in f for f in files), files


def test_simhash_pairs_no_cartesian(spark, sf_smoke_dir):
    """Both SimHash hamming-pair queries must generate candidates via the
    rotate-and-band equi-join: no CartesianProduct / BroadcastNestedLoopJoin
    anywhere in the optimized plan (the O(n²) shape that kills 100 TB runs)."""
    from health_monitor_cc_flink_spark.registry import all_queries

    for name in ("dedup_simhash_hamming_pairs", "dedup_simhash64_hamming_pairs"):
        spec = next(s for s in all_queries() if s.name == name)
        plan = spec.fn(spark, sf_smoke_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_eager_queries_scalar_output_schemas(spark, sf_smoke_dir):
    """The no-array/map schema gate for the queries the plan sweep skips
    (they execute eagerly inside fn(): streaming drains, health fixtures,
    persisted-index builds).  These are exactly the rows-only set whose
    canonicalization crashes are invisible until the driver runs them —
    agg_approx_battery's failure mode.  Smoke-sf keeps the eager work
    cheap."""
    import pyspark.sql.types as T

    from health_monitor_cc_flink_spark.registry import all_queries

    eager_prefixes = ("streaming_", "health_", "simulator_", "source_", "cdc_")
    eager_names = {
        "ann_ivf_persisted_topk",
        "ann_pq_persisted_topk",
        "ann_ivfpq_persisted_topk",
        "dedup_clusters",
        "sql_surface_q1",
    }
    # together with test_no_cartesian_sweep (whose skip set equals this
    # include set) every all_queries() entry is schema-gated exactly once
    checked = 0
    for spec in all_queries():
        if not (spec.name.startswith(eager_prefixes) or spec.name in eager_names):
            continue
        df = spec.fn(spark, sf_smoke_dir)
        boxed = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType))
        ]
        assert not boxed, f"{spec.name} outputs array/map columns {boxed}"
        checked += 1
    assert checked >= 20, f"eager sweep only covered {checked} queries"


def test_registry_names_unique():
    """Duplicate @query names silently shadow each other in the driver's
    queries() dict while both run in every sweep — caught once in round 5
    (a second text_repetition_ratio), now impossible."""
    from collections import Counter

    from health_monitor_cc_flink_spark.registry import all_queries

    counts = Counter(s.name for s in all_queries())
    dups = {n: c for n, c in counts.items() if c > 1}
    assert not dups, f"duplicate registry names: {dups}"


def test_no_cartesian_sweep(spark, sf_smoke_dir):
    """Registry-wide plan gate: NO batch relational query may plan a
    CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
    genuinely scalar/tiny side is broadcast (documented allowlist).
    Catches the next accidental all-pairs join at registration time.

    Also gates output schemas: no top-level ArrayType/MapType columns —
    the driver's pandas canonicalizer factorizes every column to sort rows,
    and ndarray cells are unhashable (the exact crash that made
    agg_approx_battery round 4's only red row). Array-valued results must
    be exploded or projected to scalar columns before registration."""
    import pyspark.sql.types as T

    from health_monitor_cc_flink_spark.registry import all_queries

    # excluded: streaming_* run a full drain inside fn(); source_* write
    # fixture files; health_*/simulator build their own fixture data;
    # dedup_clusters iterates eagerly; udaf registers session state.
    skip_prefixes = ("streaming_", "source_", "health_", "simulator_", "cdc_")
    skip_names = {
        "dedup_clusters",
        "sql_surface_q1",
        "ann_ivf_persisted_topk",
        "ann_pq_persisted_topk",
        "ann_ivfpq_persisted_topk",
    }
    # BNLJ-of-tiny allowlist: scalar thresholds / constant dimension rows
    bnlj_ok = {
        "q17_small_quantity_revenue",   # scalar avg threshold broadcast
        "q22_global_sales_opportunity", # scalar avg + tiny cntrycode dim
        "scalar_subquery_filter",       # scalar subquery literal
        "o22_sort_limit_topk",
        "join_salted_skew",             # salt-explode broadcast
        "q11_share_threshold_shape",    # scalar share threshold
        "q15_top_supplier_shape",       # scalar max revenue
        "stats_chi2_contingency",       # scalar grand-total broadcast
        "stats_ks_two_sample",          # scalar (n1, n2) totals broadcast
        "dq_key_skew_report",           # scalar corpus-totals broadcast
        "topk_heavy_hitters_twopass",   # scalar N + f10 certificate broadcast
        "dedup_incremental_against_corpus",  # scalar ingest-cut threshold broadcast
        "corpus_curriculum_shards",     # scalar corpus-count broadcast
        "corpus_mix_temperature_weights",  # scalar corpus-total broadcast
        "basket_part_affinity",         # scalar order-total broadcast
        "dq_benford_first_digit",       # scalar corpus-total broadcast
        "ann_int8_topk",                # n_queries(=4)-row quantized probe broadcast
        "customer_rfm_segments",        # scalar max-date broadcast
        "stats_kaplan_meier",           # scalar max-timestamp broadcast
        "events_pareto_concentration",  # scalar totals broadcast
        "text_keyword_extraction_topk", # scalar corpus-count broadcast
        "text_tfidf_components",        # scalar corpus-count broadcast
        "ir_bm25_topk",                 # scalar (N, S) corpus-stats broadcast
        "class_balance_weights",        # scalar (total, n_classes) broadcast
        "orders_aging_buckets",         # scalar max-date broadcast
        "events_traffic_profile",       # scalar totals broadcast
        "ann_multiprobe_recall_certificate",  # 1-row recall/candidate-count agg join
        "ann_multitable_recall_certificate",  # 1-row recall/candidate-count agg join
        "ann_clustered_recall_curve",  # 4x (1-row recall x 1-row count) agg joins
        "ann_ivfpq_clustered_recall_certificate",  # 2x 1-row agg joins
    }
    checked = 0
    for spec in all_queries():
        if spec.name in skip_names or spec.name.startswith(skip_prefixes):
            continue
        df = spec.fn(spark, sf_smoke_dir)
        boxed = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType))
        ]
        assert not boxed, (
            f"{spec.name} outputs top-level array/map columns {boxed} — "
            "the driver canonicalizer cannot sort/hash these"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{spec.name} plans a CartesianProduct"
        if spec.name not in bnlj_ok:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{spec.name} plans a BroadcastNestedLoopJoin outside the allowlist"
            )
        checked += 1
    assert checked > 100, f"sweep only covered {checked} queries"


def test_corpus_prep_consumers_never_rerun_the_explode(spark, sf_smoke_dir):
    """corpus_prep_pipeline_e2e materializes the per-doc signature/contam
    table once (localCheckpoint) precisely because its two consumers
    would otherwise each re-run the corpus token explode (column pruning
    specializes the branches and defeats ReusedExchange).  Pin it: the
    returned plan must contain ZERO Generate (explode) nodes — every
    shingle explode happened exactly once, inside the checkpoint job —
    and must read the checkpointed RDD instead."""
    from health_monitor_cc_flink_spark.registry import all_queries

    spec = next(s for s in all_queries() if s.name == "corpus_prep_pipeline_e2e")
    df = spec.fn(spark, sf_smoke_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, (
        "a consumer re-ran the shingle explode — the localCheckpoint of "
        "per_doc was removed or bypassed"
    )
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_paragraph_dedup_minimal_shuffle_shape(spark, sf_smoke_dir):
    """dedup_paragraph_keep_first must shuffle exactly once on the
    16-byte fingerprint (the keeper census) and once on doc_id (the
    reassembly agg) — paragraph TEXT never shuffles twice, and there is
    no pairwise join anywhere."""
    from health_monitor_cc_flink_spark.registry import all_queries

    spec = next(s for s in all_queries()
                if s.name == "dedup_paragraph_keep_first")
    plan = spec.fn(spark, sf_smoke_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("hashpartitioning(fp#") == 1, plan
    assert plan.count("hashpartitioning(doc_id#") == 1, plan
    assert "CartesianProduct" not in plan
    # r16: the keeper census is a whole-partition window min, not a
    # groupBy + join-back — the paragraph explode (and its md5
    # fingerprinting) must appear exactly once in the plan
    assert plan.count("posexplode") == 1, plan
