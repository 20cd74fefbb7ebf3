"""Multimodal plumbing: metadata, feature extraction, resize plan,
frame sampling — deterministic fakes over the real Arrow batch path."""

import pytest
from pyspark.sql import functions as F

from health_monitor_cc_flink_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_metadata,
    fake_feature_extract,
    fake_frame_sample,
    fake_resize,
    with_binary_payload,
)
from health_monitor_cc_flink_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_smoke_dir):
    return with_binary_payload(load_table(spark, sf_smoke_dir, "documents")).cache()


def test_feature_extract_shapes_and_determinism(payloads):
    feats = fake_feature_extract(payloads).collect()
    assert len(feats) == payloads.count()
    for r in feats[:10]:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
    again = {r.doc_id: r.content_hash for r in fake_feature_extract(payloads).collect()}
    assert all(again[r.doc_id] == r.content_hash for r in feats)


def test_resize_plan(payloads):
    plan = fake_resize(payloads, target=(224, 224)).collect()
    for r in plan[:10]:
        assert r.dst_width == 224 and r.dst_height == 224
        assert 0 < r.scale <= 224 / 256
        assert 256 <= r.src_width <= 511


def test_frame_sample_one_to_n(payloads):
    n_docs = payloads.count()
    frames = fake_frame_sample(payloads, n_frames=4)
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("doc_id").count().agg(F.min("count"), F.max("count")).first()
    assert per_doc[0] == per_doc[1] == 4
    offs = frames.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in offs] == [0, 1, 2, 3]
    assert offs[0].frame_offset_ms == 0
    assert all(offs[i].frame_offset_ms <= offs[i + 1].frame_offset_ms for i in range(3))


def test_decode_image_is_gated():
    from health_monitor_cc_flink_spark.operators.multimodal import decode_image

    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"not-an-image")
