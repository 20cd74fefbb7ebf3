"""Engine facade smoke: the reference-user entry surface."""

from health_monitor_cc_flink_spark.engine import Engine
from health_monitor_cc_flink_spark.fixtures import health_events_df
from health_monitor_cc_flink_spark.sources.memory import patients_df


def test_engine_facade_end_to_end(spark, sf_smoke_dir):
    eng = Engine(spark)
    tables = eng.register_testdata(sf_smoke_dir)
    assert len(tables) == 10
    assert eng.sql("SELECT count(*) AS n FROM lineitem").first().n > 0

    events = health_events_df(spark, n_ticks=120, interval_s=0.5, seed=42)
    stages = eng.run_health_pipeline(events, patients_df(spark))
    assert set(stages) == {
        "enriched_events",
        "enriched_events_flagged",
        "filtered_enriched_events",
        "heartbeat_alerts",
    }
    # named outputs queryable through the engine's SQL surface (O27)
    assert eng.sql("SELECT count(*) AS n FROM enriched_events").first().n == 1200

    eng.register_ml_functions()
    sql_stages = eng.run_health_pipeline_sql(events, patients_df(spark))
    assert sql_stages["heartbeat_alerts"].columns[0] == "patient_id"


def test_registry_surface_on_facade(spark):
    from health_monitor_cc_flink_spark.engine import Engine

    eng = Engine(spark)
    names = eng.list_operators()
    assert len(names) > 250 and "q1_pricing_summary" in names
    df = eng.run_operator("q1_pricing_summary", "/root/testdata/sf0.001")
    assert df.count() > 0
    assert "pricing" in eng.describe_operator("q1_pricing_summary").lower() or \
           len(eng.describe_operator("q1_pricing_summary")) > 0
    import pytest

    with pytest.raises(KeyError):
        eng.run_operator("no_such_op", "/tmp")
