"""Distributed PCA over the embedding column.

The 100 TB pattern for PCA when d is small (here d = 64) and N is huge:
the d x d covariance is a SUM of per-row outer products, so each
partition reduces its rows to one d x d partial (numpy, Arrow-batched
mapInPandas), the partials are summed (a shuffle of P tiny matrices,
never of vectors), and the eigendecomposition runs driver-side on the
d x d result — O(d^3) once, independent of N.  Projection back onto the
top components is a distributed map.

Numerical note: per-partition partials are float64 numpy sums; the
cross-partition reduction is ordered by partition id so a given
partitioning yields a deterministic matrix, but a different partition
count may differ in the last ulps (inherent to float summation; the
registry query is rows-only, pinned against numpy PCA in
tests/test_rows_only_semantics.py with a tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def covariance_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One (partition_id, n, sum_vec, outer_flat) row per partition.
    partition_id is the cross-partition reduction's DETERMINISTIC sort
    key in pca_fit — (n, sum_vec) alone does not uniquely order partials
    (two partitions can share counts and sums yet have different outer
    products), which would leave the float-summation order to collect()'s
    arrival order."""

    def partials(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        n = 0
        s = np.zeros(dim, dtype=np.float64)
        o = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: np.stack would raise
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            o += m.T @ m
        if n:
            yield pd.DataFrame(
                {
                    "partition_id": [TaskContext.get().partitionId()],
                    "n": [n],
                    "sum_vec": [s.tolist()],
                    "outer_flat": [o.reshape(-1).tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        partials,
        schema="partition_id long, n long, sum_vec array<double>, outer_flat array<double>",
    )


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int):
    """Return (eigvals desc, components [k x d], mean, n, total_var) from
    the partial-covariance reduction, where ``total_var`` = trace(cov) =
    the sum of ALL d eigenvalues (the denominator of the explained-
    variance ratio — the top-k sum alone would overstate it).  Driver
    work is O(P * d^2 + d^3)."""
    import numpy as np

    rows = covariance_partials(df, vec_col, dim).collect()
    n = sum(r.n for r in rows)
    s = np.zeros(dim)
    o = np.zeros((dim, dim))
    # partition_id uniquely orders the partials — (n, sum_vec) does not
    # (equal counts+sums with different outer products would tie, leaving
    # the float-summation order to collect()'s nondeterministic arrival)
    for r in sorted(rows, key=lambda r: r.partition_id):
        s += np.array(r.sum_vec)
        o += np.array(r.outer_flat).reshape(dim, dim)
    mean = s / n
    cov = o / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    # deterministic sign convention: largest-|coord| entry positive
    comp = vecs[:, order].T
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return vals[order], comp, mean, n, float(np.trace(cov))


def pca_project(df: DataFrame, vec_col: str, id_col: str, components, mean) -> DataFrame:
    """Distributed projection onto the fitted components: a pure map
    (broadcast d x k matrix), one output column per component."""
    k, d = components.shape
    mean_arr = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(F.col(vec_col), mean_arr, lambda a, b: a - b)
    out = df.select(id_col, centered.alias("_c"))
    for i in range(k):
        comp_arr = F.array(*[F.lit(float(x)) for x in components[i]])
        out = out.withColumn(
            f"pc{i + 1}",
            F.aggregate(
                F.zip_with(F.col("_c"), comp_arr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    return out.drop("_c")
