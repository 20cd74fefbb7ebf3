import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from health_monitor_cc_flink_spark.protobuf_shim import bootstrap_protobuf

bootstrap_protobuf()

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from health_monitor_cc_flink_spark.session import build_session

    spark = build_session(
        app_name="engine-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield spark
    from health_monitor_cc_flink_spark.registry_pipeline_ops import clear_knn_graph_cache

    clear_knn_graph_cache(spark)  # unpersist memoized k-NN edge lists
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle_dir():
    return SF_ORACLE
