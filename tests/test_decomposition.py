"""Distributed PCA building blocks: covariance partials must reduce to
the exact numpy covariance, and the distributed projection must equal
the numpy matmul."""

import numpy as np
import pytest

from health_monitor_cc_flink_spark.operators.decomposition import (
    covariance_partials,
    pca_fit,
    pca_project,
)
from health_monitor_cc_flink_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF, "embeddings")
    rows = df.collect()
    m = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    return df, m, ids


def test_partials_reduce_to_exact_covariance(spark, emb):
    df, m, _ = emb
    parts = covariance_partials(df, "embedding", 64).collect()
    n = sum(p.n for p in parts)
    s = sum(np.array(p.sum_vec) for p in parts)
    o = sum(np.array(p.outer_flat).reshape(64, 64) for p in parts)
    assert n == m.shape[0]
    assert np.allclose(s, m.sum(axis=0), rtol=0, atol=1e-9)
    assert np.allclose(o, m.T @ m, rtol=0, atol=1e-6)


def test_projection_matches_numpy(spark, emb):
    df, m, ids = emb
    vals, comp, mean, n, total_var = pca_fit(df, "embedding", 64, 3)
    got = {r.vec_id: (r.pc1, r.pc2, r.pc3) for r in pca_project(df, "embedding", "vec_id", comp, mean).collect()}
    expected = (m - mean) @ comp.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], expected[i], atol=1e-9)
    # eigenvalues descending and non-negative
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
    assert vals[-1] >= -1e-12
