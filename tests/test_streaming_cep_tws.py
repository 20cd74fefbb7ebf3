"""transformWithStateInPandas CEP twin: must match the
applyInPandasWithState matcher (and hence the batch CEP answer) on the
out-of-order scenarios, including matches that can only be emitted from
the TIMER path (keys that receive no input in the finalizing batch) and
state/timer recovery across a checkpoint restart."""

import time

import pytest

from test_streaming_cep import BATCH1, BATCH2, BATCH3, SCHEMA, _write_batch

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas needs google.protobuf; "
    "applyInPandasWithState CEP (tests/test_streaming_cep.py) covers semantics",
)

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


@pytest.fixture()
def rocksdb(spark):
    prev = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB)
    yield
    if prev:
        spark.conf.set(PROVIDER_KEY, prev)
    else:
        spark.conf.unset(PROVIDER_KEY)


def _drain(spark, src, out_dir, ckpt, per_file=False):
    from health_monitor_cc_flink_spark.streaming.tws import tws_cep_click_purchase

    stream = spark.readStream.schema(SCHEMA)
    if per_file:
        stream = stream.option("maxFilesPerTrigger", "1")
    stream = stream.parquet(src).withWatermark("ts", "1 hour")
    (
        tws_cep_click_purchase(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def test_tws_cep_out_of_order_equals_batch(spark, tmp_path, rocksdb):
    src = str(tmp_path / "src")
    now = time.time()
    _write_batch(spark, BATCH1, src, "a", now - 300)
    _write_batch(spark, BATCH2, src, "b", now - 200)
    _write_batch(spark, BATCH3, src, "c", now - 100)
    out = str(tmp_path / "out")
    _drain(spark, src, out, str(tmp_path / "ckpt"), per_file=True)
    # u1/u5 match (u5 only via the late click); u6 invalidated by the
    # late error; u2/u3/u4 never match — same as the legacy twin.  The
    # finalizing batch carries no input for u1/u5, so these rows can
    # ONLY come from handleExpiredTimer.
    got = {(r.user_id, r.gap_us) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 100_000_000), (5, 50_000_000)}


def test_tws_cep_no_premature_emission(spark, tmp_path, rocksdb):
    src = str(tmp_path / "src2")
    _write_batch(spark, BATCH1, src, "a", time.time() - 300)
    out = str(tmp_path / "out2")
    _drain(spark, src, out, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(out).count() == 0


def test_tws_cep_state_survives_restart(spark, tmp_path, rocksdb):
    src = str(tmp_path / "src3")
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    now = time.time()
    _write_batch(spark, BATCH1, src, "a", now - 300)
    _drain(spark, src, out, ckpt)  # watermark below everything: no output
    _write_batch(spark, BATCH2, src, "b", now - 200)
    _write_batch(spark, BATCH3, src, "c", now - 100)
    _drain(spark, src, out, ckpt)  # RocksDB state + timers recovered
    got = sorted(
        (r.user_id, r.gap_us) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 100_000_000), (5, 50_000_000)]  # exactly once
