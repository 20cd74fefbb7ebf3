"""Portable roaring / Z85 / Delta deletion-vector pins."""

import random
import struct

import pytest

from health_monitor_cc_flink_spark.operators.roaring import (
    _deserialize32,
    deserialize_bitmap_array,
    serialize_bitmap_array,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    # the ZeroMQ 32/Z85 spec's reference vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError):
        z85_encode(b"abc")
    with pytest.raises(ValueError):
        z85_decode("ab~de")


@pytest.mark.parametrize("case", [
    [],
    [0],
    [5, 7, 9, 70000, 70001],
    list(range(10000)),  # bitmap container
    [1, (1 << 32) + 7, (3 << 32) + 123],  # multi high-word
])
def test_bitmap_array_roundtrip(case):
    blob = serialize_bitmap_array(case)
    assert deserialize_bitmap_array(blob) == sorted(set(case))


def test_bitmap_array_random_roundtrip():
    random.seed(9)
    vals = sorted(random.sample(range(1 << 34), 3000))
    assert deserialize_bitmap_array(
        serialize_bitmap_array(vals)) == vals


def test_run_container_decode():
    # hand-crafted 12347 stream: one run container, two runs
    cookie = (0 << 16) | 12347
    stream = (struct.pack("<I", cookie) + bytes([1])
              + struct.pack("<HH", 0, 9)
              + struct.pack("<H", 2)
              + struct.pack("<HH", 5, 3)
              + struct.pack("<HH", 100, 5))
    vals, _ = _deserialize32(stream, 0)
    assert vals == [5, 6, 7, 8, 100, 101, 102, 103, 104, 105]


def test_hostile_truncations():
    blob = serialize_bitmap_array(list(range(5000)))
    for cut in range(0, len(blob), 13):
        with pytest.raises(ValueError):
            deserialize_bitmap_array(blob[:cut])
    bad = bytearray(blob)
    bad[0] ^= 1  # magic
    with pytest.raises(ValueError):
        deserialize_bitmap_array(bytes(bad))


def test_dv_file_roundtrip_and_tamper():
    from health_monitor_cc_flink_spark.operators.delta_log import (
        build_dv_file,
        read_dv_from_file,
        resolve_deletion_vector,
    )

    b1 = serialize_bitmap_array([0, 7, 14])
    b2 = serialize_bitmap_array([3])
    fblob, offs = build_dv_file([b1, b2])
    assert read_dv_from_file(fblob, offs[0], len(b1)) == b1
    assert read_dv_from_file(fblob, offs[1], len(b2)) == b2
    tampered = bytearray(fblob)
    tampered[offs[0] + 5] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        read_dv_from_file(bytes(tampered), offs[0], len(b1))
    # inline descriptor resolution with padding
    pad = (-len(b1)) % 4
    desc = {"storageType": "i",
            "pathOrInlineDv": z85_encode(b1 + b"\x00" * pad),
            "sizeInBytes": len(b1), "cardinality": 3}
    assert resolve_deletion_vector(desc, {}) == [0, 7, 14]
    desc["cardinality"] = 2
    with pytest.raises(ValueError, match="cardinality"):
        resolve_deletion_vector(desc, {})


def test_dv_replay_row_bounds():
    """A DV deleting a row index >= numRecords must fail the file."""
    import json

    from health_monitor_cc_flink_spark.operators.delta_log import (
        parse_delta_log_files,
    )

    blob = serialize_bitmap_array([500])  # beyond numRecords=100
    pad = (-len(blob)) % 4
    desc = {"storageType": "i",
            "pathOrInlineDv": z85_encode(blob + b"\x00" * pad),
            "sizeInBytes": len(blob), "cardinality": 1}
    add = {"add": {"path": "a", "partitionValues": {}, "size": 1,
                   "stats": json.dumps({"numRecords": 100}),
                   "deletionVector": desc}}
    files = {"00000000000000000000.json":
             (json.dumps(add) + "\n").encode()}
    with pytest.raises(ValueError, match="beyond numRecords"):
        parse_delta_log_files(files)


def test_serialize_high_word_cap():
    """A single huge-high-word index must raise, not loop writing
    ~2^31 empty bitmaps the deserializer would reject anyway."""
    from health_monitor_cc_flink_spark.operators.roaring import (
        serialize_bitmap_array,
    )

    with pytest.raises(ValueError, match="bitmap count"):
        serialize_bitmap_array([(1 << 21) << 32])
    # just under the deserializer's 1<<20 cap still serializes
    blob = serialize_bitmap_array([((1 << 20) - 1) << 32])
    assert len(blob) >= 12
