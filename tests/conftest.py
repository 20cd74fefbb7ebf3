import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bootstrap_protobuf() -> None:
    """Environment shim: pyspark's transformWithStateInPandas state protocol
    needs ``google.protobuf``, which isn't installed as a site-package here.
    The Google Cloud SDK (if present) ships a pure-Python protobuf runtime;
    expose it via PYTHONPATH so the JVM-spawned Python state-server workers
    inherit it too (must run BEFORE the SparkSession/JVM starts).  The
    gencode/runtime version pin differs only in the '-dev' suffix, hence the
    documented TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK escape hatch.
    No-op when protobuf is already importable or the SDK path is absent."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendored = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(vendored, "google", "protobuf")):
        return
    sys.path.append(vendored)
    existing = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = f"{existing}{os.pathsep if existing else ''}{vendored}"
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_bootstrap_protobuf()

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
