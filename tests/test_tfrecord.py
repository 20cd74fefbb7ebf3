"""TFRecord framing + tf.train.Example protobuf decode."""

import struct

import pytest

from health_monitor_cc_flink_spark.operators.tfrecord import (
    decode_example,
    encode_example,
    proto_decode,
    read_tfrecords,
    write_tfrecords,
)


def test_example_roundtrip_all_list_kinds():
    ex = {"text": "hello world", "tokens": [1, 5, 0, 1 << 40],
          "weights": [0.5, -1.25, 2.0], "raw": b"\x00\xff\x7f"}
    dec = decode_example(encode_example(ex))
    assert dec["text"] == b"hello world"
    assert dec["tokens"] == [1, 5, 0, 1 << 40]
    assert dec["weights"] == [0.5, -1.25, 2.0]
    assert dec["raw"] == b"\x00\xff\x7f"


def test_negative_int64_twos_complement():
    dec = decode_example(encode_example({"v": [-3, -1, 7]}))
    assert dec["v"] == [-3, -1, 7]


def test_unpacked_int64_list_accepted():
    """Parsers must accept unpacked repeated varints too."""
    # Int64List{1: 7, 1: 9} unpacked: tag 0x08 per element
    int64_list = b"\x08\x07\x08\x09"
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = (b"\x0a\x01v" + b"\x12" + bytes([len(feature)]) + feature)
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(example)["v"] == [7, 9]


def test_unpacked_float_accepted():
    # FloatList{1: fixed32} unpacked: tag (1<<3)|5 = 0x0d
    fl = b"\x0d" + struct.pack("<f", 1.5)
    feature = b"\x12" + bytes([len(fl)]) + fl
    entry = b"\x0a\x01w" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(example)["w"] == [1.5]


def test_proto_decode_skips_unknown_fields():
    blob = encode_example({"a": [1]}) + b"\xf8\x7f\x2a"  # field 2047 varint
    fields = proto_decode(blob)
    assert 1 in fields and 2047 in fields


def test_tfrecord_stream_roundtrip():
    recs = [encode_example({"i": [j], "t": f"r{j}"}) for j in range(7)]
    stream = write_tfrecords(recs)
    back = read_tfrecords(stream)
    assert back == recs


def test_tfrecord_data_crc_tamper_rejected():
    stream = bytearray(write_tfrecords([b"payload-bytes"]))
    stream[14] ^= 0x01  # inside the data
    with pytest.raises(ValueError):
        read_tfrecords(bytes(stream))


def test_tfrecord_length_crc_tamper_rejected():
    stream = bytearray(write_tfrecords([b"payload-bytes"]))
    stream[0] ^= 0x01  # length field
    with pytest.raises(ValueError):
        read_tfrecords(bytes(stream))


def test_tfrecord_truncation_rejected():
    stream = write_tfrecords([b"abc", b"defg"])
    with pytest.raises(ValueError):
        read_tfrecords(stream[:-2])
