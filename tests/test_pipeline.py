"""Golden end-to-end pipeline tests (SURVEY.md §5.2.2): the designed
bradycardia signal must alert for patient 1 and nobody else, and the
§2.12 semantic quirks must hold."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.catalog import EngineCatalog
from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.sources.memory import patients_df
from health_monitor_cc_flink_spark.operators.relational import key_search_agg, unnest
from health_monitor_cc_flink_spark.plans.health_pipeline import (
    enriched_events,
    run_pipeline,
)


@pytest.fixture(scope="module")
def events(spark):
    # 480 ticks × 0.5 s = 4 simulated minutes — past warm-up + glide floor
    return health_events_df(spark, n_ticks=480, interval_s=0.5, seed=42,
                            unknown_patient_rows=5).cache()


@pytest.fixture(scope="module")
def patients(spark):
    return patients_df(spark)


def test_enrichment_schema_and_drop_on_miss(events, patients):
    out = enriched_events(events, patients)
    assert out.columns == [
        "event_time", "event_id", "patient_id", "device_metadata", "vitals", "name", "age",
    ]
    # inner-join drop semantics: the 5 patient_id=99 rows disappear
    assert out.filter(F.col("patient_id") == 99).count() == 0
    n_known = events.filter(F.col("patient_id") != 99).count()
    assert out.count() == n_known
    # name/age joined correctly (db.tf seed rows)
    one = out.filter(F.col("patient_id") == 1).select("name", "age").first()
    assert (one.name, one.age) == ("John Doe", 45)


def test_key_search_agg_matches_join_semantics(events, patients):
    packed = key_search_agg(events, patients, "patient_id")
    # miss → empty array
    assert (
        packed.filter(F.col("patient_id") == 99)
        .filter(F.size("search_results") != 0)
        .count()
        == 0
    )
    flat = unnest(packed, "search_results", aliases=["pid2", "name", "age"],
                  keep=["event_id", "patient_id"])
    join = events.join(patients, "patient_id").select("event_id", "patient_id", "name", "age")
    assert flat.select("event_id", "patient_id", "name", "age").exceptAll(join).count() == 0
    assert join.exceptAll(flat.select("event_id", "patient_id", "name", "age")).count() == 0


def test_golden_bradycardia_alerts(spark, events, patients):
    cat = EngineCatalog(spark)
    stages = run_pipeline(events.filter(F.col("patient_id") != 99), patients, catalog=cat)

    flagged = stages["enriched_events_flagged"]
    assert flagged.columns == ["patient_id", "event_timestamp", "observed_value", "report"]
    # window smoothing: ≤ 1 row per patient per second
    n_windows = flagged.count()
    assert 0 < n_windows <= 10 * 240

    # S5 direction: anomalous rows are DROPPED
    filtered = stages["filtered_enriched_events"]
    assert filtered.filter(F.col("report.is_anomaly")).count() == 0
    assert filtered.count() <= n_windows

    alerts = stages["heartbeat_alerts"].collect()
    alert_patients = {r.patient_id for r in alerts}
    assert alert_patients == {1}, f"expected only patient 1, got {alert_patients}"
    assert all(r.forecast_value < 40 for r in alerts)
    # no alert before fault onset (t+30 s) — warm-up alone guarantees ≥30 windows
    t0 = datetime(2026, 1, 1)
    first_alert = min(r.event_timestamp for r in alerts)
    assert (first_alert - t0).total_seconds() >= 30


def test_catalog_pipeline_registration(spark, events, patients):
    cat = EngineCatalog(spark)
    run_pipeline(events.filter(F.col("patient_id") != 99), patients, catalog=cat)
    for name in (
        "enriched_events",
        "enriched_events_flagged",
        "filtered_enriched_events",
        "heartbeat_alerts",
    ):
        assert spark.table(name) is not None
    assert spark.sql(
        "SELECT count(*) AS n FROM heartbeat_alerts WHERE patient_id <> 1"
    ).first().n == 0
