"""ANN quality: IVF probes must recover most of the brute-force top-k."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_ivf_topk,
)
from health_monitor_cc_flink_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def qv(emb):
    return [float(v) for v in emb.filter(F.col("vec_id") == 0).first().embedding]


def test_brute_force_topk_self_is_first(emb, qv):
    rows = brute_force_topk(emb, qv, k=10).collect()
    assert rows[0].vec_id == 0 and rows[0].cos_sim == pytest.approx(1.0, abs=1e-9)
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


@pytest.mark.parametrize("variant", ["label", "kmeans"])
def test_ivf_recall_vs_brute_force(emb, qv, variant):
    exact = {r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()}
    if variant == "label":
        approx = {r.vec_id for r in ivf_topk(emb, qv, k=10, n_probe=3).collect()}
    else:
        approx = {r.vec_id for r in kmeans_ivf_topk(emb, qv, k=10, n_cells=8, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"{variant} IVF recall {recall} too low"
    assert 0 in approx  # the query vector itself must be found


def test_persisted_ivf_prunes_partitions(spark, emb, qv, tmp_path_factory):
    """The persisted index must (a) physically prune: the probe scan reads
    only n_probe of n_cells partition directories, visible as a cell
    PartitionFilter in the plan; (b) stay correct: probing ALL cells
    must reproduce the brute-force top-k exactly."""
    from health_monitor_cc_flink_spark.operators.similarity import (
        build_ivf_index,
        probe_ivf_index,
    )

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(emb, path, n_cells=8, seed=42)

    topk = probe_ivf_index(spark, path, qv, k=10, n_probe=2)
    assert 0 in {r.vec_id for r in topk.collect()}  # query vec in its own cell
    plan = topk._jdf.queryExecution().executedPlan()
    assert "PartitionFilters: [cell" in plan.toString()
    # physical pruning: the executed scan opened only the probed cells' files
    n_total = len(spark.read.parquet(path).inputFiles())
    leaves = plan.collectLeaves()
    num_files = [
        int(leaves.apply(i).metrics().apply("numFiles").value())
        for i in range(leaves.size())
        if "parquet" in leaves.apply(i).nodeName().lower()
    ]
    assert num_files and max(num_files) < n_total, (num_files, n_total)

    # probing every cell == exact brute force
    from health_monitor_cc_flink_spark.operators.similarity import brute_force_topk

    full = probe_ivf_index(spark, path, qv, k=10, n_probe=8).collect()
    exact = brute_force_topk(emb, qv, k=10).collect()
    assert [r.vec_id for r in full] == [r.vec_id for r in exact]


def test_pq_topk_recall_vs_brute(spark, sf_smoke_dir):
    """PQ ADC + exact re-rank must recover (nearly) the brute-force
    top-10 — deterministic: seeded training sample, seeded init, fixed
    iteration count, id tiebreaks everywhere."""
    from health_monitor_cc_flink_spark.operators import similarity as S
    from health_monitor_cc_flink_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = [float(v) for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]

    brute = {r.vec_id for r in S.brute_force_topk(emb, q, k=10).collect()}
    pq = {r.vec_id for r in S.pq_adc_topk(emb, q, k=10).collect()}
    assert len(pq) == 10
    assert len(brute & pq) >= 8, (brute, pq)

    # run-to-run determinism of the whole pipeline
    pq2 = {r.vec_id for r in S.pq_adc_topk(emb, q, k=10).collect()}
    assert pq == pq2


def test_pq_persisted_index_probe_matches_oneshot(spark, emb, qv, tmp_path_factory):
    """The persisted PQ index (train-once codebook + encode-once codes
    table) probed from disk must reproduce the one-shot pq_adc_topk
    result exactly — same seeded codebook, same ADC, same re-rank — and
    the written artifacts must have the expected shapes (M·K codebook
    rows, one codes row per vector, M codes each)."""
    from health_monitor_cc_flink_spark.operators import similarity as S

    path = str(tmp_path_factory.mktemp("pq") / "index")
    S.pq_build_index(emb, path, m=8, n_centroids=16)

    cb = spark.read.parquet(path + "_codebook")
    assert cb.count() == 8 * 16
    codes = spark.read.parquet(path)
    assert codes.count() == emb.count()
    assert codes.select(F.size("codes")).distinct().collect()[0][0] == 8

    probed = S.pq_probe_index(spark, path, emb, qv, k=10, rerank=100).collect()
    oneshot = S.pq_adc_topk(emb, qv, k=10, rerank=100).collect()
    assert [(r.vec_id, round(r.cos_sim, 9)) for r in probed] == [
        (r.vec_id, round(r.cos_sim, 9)) for r in oneshot
    ]

    # probing again without rebuilding: pure reads, same answer
    again = S.pq_probe_index(spark, path, emb, qv, k=10, rerank=100).collect()
    assert [r.vec_id for r in again] == [r.vec_id for r in probed]


def test_ivfpq_prunes_partitions_and_recalls(spark, emb, qv, tmp_path_factory):
    """The composed IVF-PQ index must (a) physically prune — the probe's
    code scan opens only the probed cells' partitions; (b) recall most of
    the brute-force top-10 through BOTH approximations (cell pruning +
    8-byte codes); (c) probing ALL cells equal the flat persisted-PQ
    result (cell partitioning changes what is scanned, not what is
    scored)."""
    from health_monitor_cc_flink_spark.operators import similarity as S

    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    S.build_ivfpq_index(emb, path, n_cells=8, m=8, n_centroids=16)

    topk = S.probe_ivfpq_index(spark, path, emb, qv, k=10, n_probe=3, rerank=100)
    rows = topk.collect()
    assert len(rows) == 10 and 0 in {r.vec_id for r in rows}
    exact = {r.vec_id for r in S.brute_force_topk(emb, qv, k=10).collect()}
    assert len(exact & {r.vec_id for r in rows}) >= 6

    # static partition pruning on the CODE scan (not the raw vectors)
    cand = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin([0, 1, 2]))
        .select("vec_id", "codes")
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]

    # probe-all == flat persisted PQ (same codebook seed, same ADC+rerank)
    flat_path = str(tmp_path_factory.mktemp("ivfpq") / "flat")
    S.pq_build_index(emb, flat_path, m=8, n_centroids=16)
    all_cells = S.probe_ivfpq_index(
        spark, path, emb, qv, k=10, n_probe=8, rerank=100
    ).collect()
    flat = S.pq_probe_index(spark, flat_path, emb, qv, k=10, rerank=100).collect()
    assert [r.vec_id for r in all_cells] == [r.vec_id for r in flat]


def test_int8_quantize_error_bound(spark):
    """Reconstruction error of half-up int8 quantization is bounded by
    scale/2 everywhere (no clipping can occur at |v| <= max|v|), and
    the max-magnitude component always saturates to ±127."""
    import numpy as np

    from health_monitor_cc_flink_spark.operators.similarity import (
        int8_quantize,
    )
    from health_monitor_cc_flink_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = {r.vec_id: r for r in int8_quantize(emb).limit(50).collect()}
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.limit(50).collect()}
    for vid, r in rows.items():
        v = raw[vid]
        scale = r.scale
        codes = np.floor(v / scale + 0.5)
        assert r.code_sum == int(codes.sum())
        assert r.code_min == int(codes.min())
        assert r.code_max == int(codes.max())
        assert np.abs(v - codes * scale).max() <= scale / 2 + 1e-12
        assert max(abs(r.code_min), abs(r.code_max)) == 127


def test_int8_topk_agrees_with_float_ranking(spark):
    """Int8 ranking must agree with exact float cosine-by-dot ranking
    on MOST of the top-5 (quantization recall check): >= 3/5 overlap
    per query on the smoke corpus, and int dots must equal a numpy
    recomputation exactly."""
    import numpy as np

    from health_monitor_cc_flink_spark.operators.similarity import (
        int8_topk,
    )
    from health_monitor_cc_flink_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = int8_topk(emb).collect()
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    scales = {v: np.abs(x).max() / 127.0 for v, x in raw.items()}
    codes = {v: np.floor(x / scales[v] + 0.5) for v, x in raw.items()}
    by_q = {}
    for r in got:
        want = int(codes[r.query_id] @ codes[r.vec_id])
        assert r.int_dot == want, (r.query_id, r.vec_id)
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    for qid, ids in by_q.items():
        assert len(ids) == 5
        sims = {v: float(raw[qid] @ x) / (np.linalg.norm(raw[qid])
                * np.linalg.norm(x))
                for v, x in raw.items() if v != qid}
        float_top = sorted(sims, key=lambda v: (-sims[v], v))[:5]
        assert len(set(ids) & set(float_top)) >= 3, (qid, ids, float_top)


def test_ivf_int8_prunes_and_recalls(spark, emb, qv, tmp_path_factory):
    """int8 IVF (scalar quantization wired into the persisted index):
    (a) physical partition pruning; (b) stored payload is tinyint
    codes + scale, never raw floats; (c) recall certificate vs the
    float brute-force top-10; (d) probing ALL cells agrees with the
    flat int8 ranking (quantization is the only approximation)."""
    from health_monitor_cc_flink_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_int8_index,
        probe_ivf_int8_index,
    )

    path = str(tmp_path_factory.mktemp("ivf8") / "index")
    build_ivf_int8_index(emb, path, n_cells=8, seed=42)

    # (b) storage shape: tinyint codes, float scale, no embedding col
    stored = spark.read.parquet(path)
    dt = dict(stored.dtypes)
    assert dt["codes"] == "array<tinyint>" and "embedding" not in dt

    topk = probe_ivf_int8_index(spark, path, qv, k=10, n_probe=2)
    got = topk.collect()
    assert got[0].vec_id == 0  # the query vector is its own best match
    plan = topk._jdf.queryExecution().executedPlan()
    assert "PartitionFilters: [cell" in plan.toString()
    n_total = len(stored.inputFiles())
    leaves = plan.collectLeaves()
    num_files = [
        int(leaves.apply(i).metrics().apply("numFiles").value())
        for i in range(leaves.size())
        if "parquet" in leaves.apply(i).nodeName().lower()
    ]
    assert num_files and max(num_files) < n_total, (num_files, n_total)

    # (c) recall certificate vs the FLOAT exact path
    exact = {r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()}
    approx = {r.vec_id for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"int8 IVF recall {recall} too low"

    # (d) all-cells probe == flat int8 brute ranking: int8_topk ranks by
    # the same q_scale*scale*int_dot (modulo its self-exclusion), so
    # compare against a direct integer-dot ranking over all vectors
    full = probe_ivf_int8_index(spark, path, qv, k=10, n_probe=8)
    from health_monitor_cc_flink_spark.operators.similarity import int8_codes

    q_absmax = max(abs(v) for v in qv)
    q_scale = q_absmax / 127.0
    q_codes = [int((v / q_scale + 0.5) // 1) for v in qv]
    qc = F.array(*[F.lit(c).cast("long") for c in q_codes])
    flat = (
        int8_codes(emb)
        .select(
            "vec_id",
            (F.lit(q_scale) * F.col("scale") * F.aggregate(
                F.zip_with(qc, "codes", lambda a, b: a * b),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).cast("double")).alias("approx_sim"),
        )
        .orderBy(F.desc("approx_sim"), F.asc("vec_id"))
        .limit(10)
    )
    assert [r.vec_id for r in full.collect()] == [
        r.vec_id for r in flat.collect()
    ]
