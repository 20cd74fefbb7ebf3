"""BSON codec: all element types, streams, hostile input."""

import pytest

from health_monitor_cc_flink_spark.operators.bson import (
    decode_bson,
    decode_bson_stream,
    encode_bson,
)


def test_all_types_roundtrip():
    doc = {"_id": "0" * 24, "s": "héllo", "i32": -5, "i64": 1 << 40,
           "f": 3.5, "t": True, "f2": False, "z": None,
           "arr": ["a", 2, None], "sub": {"x": 1, "y": [True]},
           "b": b"\x00\xff"}
    assert decode_bson(encode_bson(doc)) == doc


def test_int_width_selection():
    enc_small = encode_bson({"v": 100})
    enc_big = encode_bson({"v": 1 << 40})
    assert len(enc_small) < len(enc_big)
    assert decode_bson(enc_small)["v"] == 100
    assert decode_bson(enc_big)["v"] == 1 << 40


def test_stream_back_to_back():
    stream = b"".join(encode_bson({"i": i}) for i in range(25))
    assert [d["i"] for d in decode_bson_stream(stream)] == list(range(25))


def test_truncated_rejected():
    enc = encode_bson({"k": "value"})
    with pytest.raises(ValueError):
        decode_bson(enc[:-3])


def test_bad_length_rejected():
    enc = bytearray(encode_bson({"k": 1}))
    enc[0] = 0xFF  # inflate declared length
    with pytest.raises(ValueError):
        decode_bson(bytes(enc))


def test_unknown_type_rejected():
    enc = bytearray(encode_bson({"k": 1}))
    enc[4] = 0x13  # decimal128: unsupported on purpose
    with pytest.raises(ValueError):
        decode_bson(bytes(enc))


def test_trailing_garbage_rejected():
    with pytest.raises(ValueError):
        decode_bson(encode_bson({"k": 1}) + b"\x01")
