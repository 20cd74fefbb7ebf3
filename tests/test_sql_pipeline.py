"""The SQL-text pipeline (S3..S6 as spark.sql statements + ML table
functions) must agree with the DataFrame pipeline on the golden
bradycardia fixture."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.plans.health_pipeline import run_pipeline
from health_monitor_cc_flink_spark.plans.health_pipeline_sql import run_pipeline_sql
from health_monitor_cc_flink_spark.sources.memory import patients_df


@pytest.fixture(scope="module")
def events(spark):
    return health_events_df(spark, n_ticks=480, interval_s=0.5, seed=42).cache()


def test_sql_pipeline_matches_dataframe_pipeline(spark, events):
    patients = patients_df(spark)
    df_stages = run_pipeline(events, patients)
    sql_stages = run_pipeline_sql(spark, events, patients)

    # S3: identical row multiset on the projected columns
    cols = ["event_id", "patient_id", "name", "age"]
    a = sorted(map(tuple, df_stages["enriched_events"].select(cols).collect()))
    b = sorted(map(tuple, sql_stages["enriched_events"].select(cols).collect()))
    assert a == b

    # S4/S5: same anomaly verdicts per (patient, window)
    df_flags = {
        (r.patient_id, r.event_timestamp): r.report.is_anomaly
        for r in df_stages["enriched_events_flagged"].collect()
    }
    sql_flags = {
        (r.patient_id, r.event_timestamp): r.is_anomaly
        for r in sql_stages["enriched_events_flagged"].collect()
    }
    assert df_flags == sql_flags

    # S6: same alert set (patient, window, forecast rounded)
    def alert_set(df, val_col="forecast_value"):
        return {
            (r.patient_id, r.event_timestamp, round(r[val_col], 9))
            for r in df.collect()
        }

    assert alert_set(sql_stages["heartbeat_alerts"]) == alert_set(
        df_stages["heartbeat_alerts"]
    )
    pats = {r.patient_id for r in sql_stages["heartbeat_alerts"].collect()}
    assert pats == {1}


def test_online_ar1_bit_parity_on_hostile_floats():
    """_OnlineAR1 (the SQL UDTF's incremental fit) must agree BIT-FOR-BIT
    with the vectorized batch kernel even in the catastrophic-cancellation
    regime (values ~1e15 with unit-scale deltas).  Regression: the prior
    `s1 - y_last` reconstruction of the preceding-frame sums diverged on
    6/200 prefixes of exactly this series — fl((s+y)-y) != s — which is why
    the sums are now snapshotted before each update, mirroring
    _ar1_fit_native's preceding-frame cumsum."""
    import math

    import numpy as np

    from health_monitor_cc_flink_spark.functions.sql_udtf import _OnlineAR1
    from health_monitor_cc_flink_spark.functions.timeseries import expanding_ar1

    rng = np.random.default_rng(7)
    y = 1e15 + rng.normal(0, 1, 200)
    fits = expanding_ar1(y)
    m = _OnlineAR1()
    for i, v in enumerate(map(float, y)):
        m.update(v)
        f = m.fit()
        if f is None:
            continue
        for mine, ref in zip(f, (fits[c][i] for c in ("a", "b", "sigma", "rmse", "aic"))):
            assert mine == ref or (math.isnan(mine) and math.isnan(ref)), (
                f"row {i}: {f} vs kernel"
            )


def test_sql_pipeline_does_not_clobber_session_views(spark, events):
    """run_pipeline_sql registers its working views under a per-run
    prefix: an identically-named view another component registered on
    the shared session (e.g. the driver testdata `events` view) must
    survive the run untouched."""
    spark.range(5).selectExpr("id AS user_id").createOrReplaceTempView("events")
    try:
        stages = run_pipeline_sql(spark, events, patients_df(spark))
        assert {r.patient_id for r in stages["heartbeat_alerts"].collect()} == {1}
        assert spark.table("events").columns == ["user_id"]
    finally:
        spark.catalog.dropTempView("events")


def test_run_pipeline_materialize_requires_catalog(spark, events):
    """materialize=True without a catalog must raise, not silently return
    un-checkpointed lazy frames."""
    import pytest as _pytest

    from health_monitor_cc_flink_spark.sources.memory import patients_df as _p

    with _pytest.raises(ValueError, match="materialize"):
        run_pipeline(events, _p(spark), materialize=True)
