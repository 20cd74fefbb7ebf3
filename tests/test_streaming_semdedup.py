"""Online SemDeDup (streaming_semdedup_ingest): the driver testdata has
no cos >= 0.9 pairs (verified: zero all-pairs matches at sf0.001/sf0.01),
so the registry oracle only proves the zero-drop path.  These tests
plant REAL near-duplicates and pin the drop branch: the lower-id-mate
rule, cross-batch state (a batch-2 vector dropped against a batch-1
member), and the immutability of earlier decisions."""

import os
import shutil
import time

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

DIM = 64


def _vectors():
    rng = np.random.default_rng(7)
    v0 = rng.normal(size=DIM)
    v3 = rng.normal(size=DIM)
    vecs = {
        0: v0,
        1: v0 + rng.normal(scale=1e-3, size=DIM),  # near-dup of v0 (cos~1)
        2: -v0,                                    # cos=-1: NOT a dup
        3: v3,
        4: 1.5 * v3,                               # scaled copy (cos=1)
        5: rng.normal(size=DIM),
    }
    return {k: v.astype(np.float32) for k, v in vecs.items()}


def _write(spark, vecs, ids, out_dir, name, mtime):
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in ids], SCHEMA
    ).coalesce(1)
    tmp = out_dir + f"_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f"{name}.parquet")
    shutil.copyfile(os.path.join(tmp, part), dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


def _reference_decisions(vecs, threshold=0.9):
    """The batch rule, computed independently in numpy with the SAME
    md5-derived hyperplane cells the operator uses."""
    import hashlib

    signs = np.array(
        [
            [
                1 if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16) % 2 == 0
                else -1
                for i in range(DIM)
            ]
            for j in range(8)
        ],
        dtype=np.int64,
    )

    def cell(v):
        vm = np.floor(v.astype(np.float64) * 1000).astype(np.int64)
        dots = signs @ vm
        return int(sum(1 << j for j in range(8) if dots[j] > 0))

    cells = {i: cell(v) for i, v in vecs.items()}
    out = {}
    for i in sorted(vecs):
        dropped = 0
        for j in sorted(vecs):
            if j >= i or cells[j] != cells[i]:
                continue
            a, b = vecs[i].astype(np.float64), vecs[j].astype(np.float64)
            cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
            if cos >= threshold:
                dropped = 1
        out[i] = (cells[i], dropped)
    return out


def _drain(spark, src, ckpt, out_dir):
    from health_monitor_cc_flink_spark.operators.similarity import (
        hyperplane_lsh_bucket,
    )
    from health_monitor_cc_flink_spark.streaming.stateful import (
        streaming_semdedup_ingest,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    cells = hyperplane_lsh_bucket(
        stream, "vec_id", "embedding", n_bits=8, dim=DIM, carry_cols=("embedding",)
    ).withColumnRenamed("bucket8", "cell")
    (
        streaming_semdedup_ingest(cells)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return {
        r.vec_id: (r.cell, r.is_dropped)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_planted_dups_are_dropped_single_batch(spark, tmp_path):
    vecs = _vectors()
    ref = _reference_decisions(vecs)
    # sanity on the fixture itself: the two planted dups must actually
    # drop in the reference (same cell + cos >= 0.9), the opposite
    # vector must not
    assert ref[1][1] == 1 and ref[4][1] == 1 and ref[2][1] == 0

    src = str(tmp_path / "src")
    _write(spark, vecs, sorted(vecs), src, "a", time.time() - 100)
    got = _drain(spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    assert got == ref


def test_cross_batch_state_and_immutable_decisions(spark, tmp_path):
    """v4 arrives in batch 2 and must be dropped against batch-1's v3
    (state carries the member set); v0's earlier keep decision is not
    re-emitted or changed."""
    vecs = _vectors()
    ref = _reference_decisions(vecs)
    src = str(tmp_path / "src2")
    now = time.time()
    _write(spark, vecs, [0, 1, 2, 3], src, "a", now - 300)
    _write(spark, vecs, [4, 5], src, "b", now - 200)
    got = _drain(spark, src, str(tmp_path / "ckpt2"), str(tmp_path / "out2"))
    # in-order ingest (all batch-2 ids exceed batch-1 ids) => exactly the
    # batch rule, one decision per vector; v4's drop proof (v3) lives in
    # batch-1 state, so the drop is genuinely cross-batch
    assert got == ref
