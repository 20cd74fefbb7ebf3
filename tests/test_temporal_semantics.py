"""Semantic validation of the temporal operators (nearest as-of, trailing
EWMA, OHLC bars, window funnel) against brute-force pure-Python references
on randomized synthetic events — independent of the DuckDB parity oracle."""

import numpy as np
import pytest

from health_monitor_cc_flink_spark.registry import all_queries

from test_stats_semantics import _write_events


@pytest.fixture(scope="module")
def specs():
    return {s.name: s for s in all_queries()}


@pytest.mark.parametrize("seed", [11, 47])
def test_asof_nearest_matches_bruteforce(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"asof{seed}"))
    pdf = _write_events(spark, tmp, seed)
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
    got = {r.event_id: r for r in specs["join_asof_nearest"].fn(spark, tmp).collect()}
    tol = 600_000_000
    purchases = pdf[pdf.event_type == "purchase"]
    assert len(got) == len(purchases)
    for _, p in purchases.iterrows():
        clicks = pdf[(pdf.event_type == "click") & (pdf.user_id == p.user_id)]
        prev = clicks[clicks.ts_us < p.ts_us].ts_us.max()
        nxt = clicks[clicks.ts_us > p.ts_us].ts_us.min()
        prev = None if np.isnan(prev) else int(prev)
        nxt = None if (isinstance(nxt, float) and np.isnan(nxt)) else (int(nxt) if nxt == nxt else None)
        cand = []
        if prev is not None and p.ts_us - prev <= tol:
            cand.append((p.ts_us - prev, 0, prev))  # 0 = prefer backward on tie
        if nxt is not None and nxt - p.ts_us <= tol:
            cand.append((nxt - p.ts_us, 1, nxt))
        expected = min(cand)[2] if cand else None
        assert got[p.event_id].nearest_click_us == expected, p.event_id


@pytest.mark.parametrize("seed", [11, 47])
def test_ewma_matches_loop(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"ewma{seed}"))
    pdf = _write_events(spark, tmp, seed)
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
    got = {r.event_id: r.ewma64 for r in specs["ts_ewma_trailing"].fn(spark, tmp).collect()}
    for uid, g in pdf.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        vals = g.value.to_numpy()
        ids = g.event_id.to_numpy()
        for i in range(len(vals)):
            frame = vals[max(0, i - 63): i + 1]
            s = frame[0]
            for x in frame[1:]:
                s = s * 0.9 + x * 0.1
            assert got[ids[i]] == pytest.approx(s, abs=1e-12), (uid, ids[i])


@pytest.mark.parametrize("seed", [11])
def test_ohlc_matches_pandas(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"ohlc{seed}"))
    pdf = _write_events(spark, tmp, seed)
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
    pdf["w"] = (pdf.ts_us // 3_600_000_000) * 3_600_000_000
    got = {(r.event_type, r.window_start_us): r for r in specs["events_ohlc_bars"].fn(spark, tmp).collect()}
    ref = pdf.sort_values(["ts_us", "event_id"]).groupby(["event_type", "w"])
    n_checked = 0
    for (et, w), g in ref:
        r = got[(et, w)]
        assert r.open == g.value.iloc[0] and r.close == g.value.iloc[-1]
        assert r.high == g.value.max() and r.low == g.value.min()
        assert r.n == len(g)
        n_checked += 1
    assert n_checked == len(got) > 0


@pytest.mark.parametrize("seed", [11, 47])
def test_window_funnel_matches_bruteforce(spark, tmp_path_factory, specs, seed):
    tmp = str(tmp_path_factory.mktemp(f"fun{seed}"))
    pdf = _write_events(spark, tmp, seed)
    # synthesize signups/purchases: _write_events only makes click/purchase/view,
    # so remap a slice of views to signups for funnel signal
    import pandas as pd

    pdf = pdf.copy()
    pdf.loc[pdf.index % 7 == 0, "event_type"] = "signup"
    import os

    spark.createDataFrame(pdf).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
    got = {r.user_id: r for r in specs["funnel_window_3step"].fn(spark, tmp).collect()}
    day = 86_400_000_000
    seq = pdf.sort_values(["ts_us", "event_id"])
    users_with_signup = set(seq[seq.event_type == "signup"].user_id)
    assert set(got) == users_with_signup
    for uid in users_with_signup:
        g = seq[seq.user_id == uid]
        best = 1
        for _, s in g[g.event_type == "signup"].iterrows():
            clicks = g[(g.event_type == "click") & ((g.ts_us > s.ts_us) | ((g.ts_us == s.ts_us) & (g.event_id > s.event_id)))]
            if clicks.empty or clicks.ts_us.iloc[0] - s.ts_us > day:
                continue
            c = clicks.iloc[0]
            best = max(best, 2)
            purch = g[(g.event_type == "purchase") & ((g.ts_us > c.ts_us) | ((g.ts_us == c.ts_us) & (g.event_id > c.event_id)))]
            if not purch.empty and purch.ts_us.iloc[0] - s.ts_us <= day:
                best = max(best, 3)
        assert got[uid].max_steps == best, uid
