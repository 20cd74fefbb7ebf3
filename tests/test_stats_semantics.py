"""Semantic validation of the statistics operators against pure-Python
reference implementations on randomized synthetic events — independent of
the DuckDB oracle (which checks engine parity, not whether the formula is
the statistic it claims to be)."""

import math
import os

import numpy as np
import pytest

from health_monitor_cc_flink_spark.registry import all_queries


def _write_events(spark, tmpdir, seed, n=600):
    rng = np.random.default_rng(seed)
    types = rng.choice(["click", "purchase", "view"], size=n)
    # two-decimal values, distinct distributions per type so KS/MWU move
    base = np.where(types == "click", 50.0, np.where(types == "purchase", 80.0, 65.0))
    vals = np.round(base + rng.normal(0, 20, n).clip(-45, 300), 2)
    ts = np.sort(rng.integers(1_700_000_000_000_000, 1_700_864_000_000_000, n))
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            "event_type": types,
            "value": np.abs(vals),
            "props": "{}",
        }
    )
    path = os.path.join(tmpdir, "events.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return pdf


@pytest.fixture(scope="module")
def specs():
    return {s.name: s for s in all_queries()}


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_ks_matches_reference(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"ks{seed}"))
    pdf = _write_events(spark, tmp, seed)
    row = specs["stats_ks_two_sample"].fn(spark, tmp).collect()[0]
    x = np.sort(pdf.loc[pdf.event_type == "click", "value"].to_numpy())
    y = np.sort(pdf.loc[pdf.event_type == "purchase", "value"].to_numpy())
    grid = np.unique(np.concatenate([x, y]))
    d_ref = max(
        abs(np.searchsorted(x, v, side="right") / len(x)
            - np.searchsorted(y, v, side="right") / len(y))
        for v in grid
    )
    assert row.n1 == len(x) and row.n2 == len(y)
    assert abs(row.ks_d - d_ref) < 1e-12


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_mann_whitney_matches_reference(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"mwu{seed}"))
    pdf = _write_events(spark, tmp, seed)
    row = specs["stats_mann_whitney_u"].fn(spark, tmp).collect()[0]
    x = pdf.loc[pdf.event_type == "click", "value"].to_numpy()
    y = pdf.loc[pdf.event_type == "purchase", "value"].to_numpy()
    combined = np.concatenate([x, y])
    order = np.argsort(combined, kind="mergesort")
    ranks = np.empty(len(combined))
    # average ranks with ties
    sorted_vals = combined[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
        i = j
    r1 = ranks[: len(x)].sum()
    u1 = len(x) * len(y) + len(x) * (len(x) + 1) / 2.0 - r1
    assert row.n1 == len(x) and row.n2 == len(y)
    assert row.r1_x2 == int(round(2 * r1))
    assert row.u1_x2 == int(round(2 * u1))
    assert row.u1_x2 + row.u2_x2 == 2 * row.n1 * row.n2


@pytest.mark.parametrize("seed", [7, 99])
def test_gini_matches_reference(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"gini{seed}"))
    pdf = _write_events(spark, tmp, seed)
    row = specs["stats_gini_concentration"].fn(spark, tmp).collect()[0]
    counts = np.sort(pdf.groupby("user_id").size().to_numpy())
    n = len(counts)
    ref = 2 * np.sum((np.arange(1, n + 1)) * counts) / (n * counts.sum()) - (n + 1) / n
    assert row.n_keys == n
    assert abs(row.gini - ref) < 1e-12
    assert 0.0 <= row.gini < 1.0


@pytest.mark.parametrize("seed", [7])
def test_welch_components_match_reference(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"welch{seed}"))
    pdf = _write_events(spark, tmp, seed)
    rows = {r.event_type: r for r in specs["stats_welch_ttest_components"].fn(spark, tmp).collect()}
    for et in ("click", "purchase"):
        v = pdf.loc[pdf.event_type == et, "value"].to_numpy()
        assert rows[et].n == len(v)
        assert abs(rows[et].mean - v.mean()) < 1e-9
        assert abs(rows[et].sample_var - v.var(ddof=1)) < 1e-6
