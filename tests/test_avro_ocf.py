"""Avro OCF container: codecs, blocks, sync markers, hostile input."""

import json

import pytest

from health_monitor_cc_flink_spark.sources.avro_ocf import (
    read_ocf,
    write_ocf,
)

SCHEMA = json.dumps({
    "type": "record", "name": "Doc", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "rec_idx", "type": "long"},
        {"name": "head", "type": "string"},
        {"name": "n_words", "type": "long"},
    ]})

RECS = [{"doc_id": 5, "rec_idx": j, "head": f"alpha beta r{j}",
         "n_words": 42} for j in range(7)]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_roundtrip_all_codecs(codec):
    data = write_ocf(SCHEMA, RECS, codec=codec, records_per_block=2,
                     sync_seed=5)
    m = read_ocf(data)
    assert m["records"] == RECS
    assert m["codec"] == codec
    assert m["n_blocks"] == 4  # ceil(7/2)


def test_deflate_is_raw_not_zlib():
    """The spec requires RFC 1951 raw deflate without the zlib
    wrapper; a zlib-wrapped block must fail to decode."""
    import zlib

    data = bytearray(write_ocf(SCHEMA, RECS[:2], codec="deflate"))
    raw = b"".join(
        __import__(
            "health_monitor_cc_flink_spark.sources.avro_codec",
            fromlist=["encode_record"],
        ).encode_record(SCHEMA, r) for r in RECS[:2])
    assert zlib.compress(raw) != zlib.compressobj(
        6, zlib.DEFLATED, -15).compress(raw)  # sanity: forms differ


def test_snappy_crc_tamper_rejected():
    data = bytearray(write_ocf(SCHEMA, RECS, codec="snappy",
                               records_per_block=4))
    data[-20] ^= 0x01
    with pytest.raises(ValueError):
        read_ocf(bytes(data))


def test_sync_marker_tamper_rejected():
    data = bytearray(write_ocf(SCHEMA, RECS, codec="null",
                               records_per_block=100))
    data[-1] ^= 0x01  # last 16 bytes are the trailing sync marker
    with pytest.raises(ValueError):
        read_ocf(bytes(data))


def test_not_ocf_rejected():
    with pytest.raises(ValueError):
        read_ocf(b"PAR1" + b"\x00" * 64)


def test_missing_schema_rejected():
    data = write_ocf(SCHEMA, RECS[:1])
    # blank out the avro.schema key so the map parses but lacks it
    bad = data.replace(b"avro.schema", b"avro.sCHema")
    with pytest.raises(ValueError):
        read_ocf(bad)


def test_empty_file_no_blocks():
    m = read_ocf(write_ocf(SCHEMA, []))
    assert m["records"] == [] and m["n_blocks"] == 0


def test_logical_types_roundtrip_through_ocf():
    """Avro-spec logical types: decimal over bytes AND fixed
    (big-endian two's-complement unscaled), date (days since
    epoch), and bare fixed — full OCF round-trip."""
    import datetime
    import decimal
    import json

    sch = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "bytes",
                               "logicalType": "decimal",
                               "precision": 10, "scale": 2}},
        {"name": "df", "type": {"type": "fixed", "name": "dec6",
                                "size": 6, "logicalType": "decimal",
                                "precision": 12, "scale": 3}},
        {"name": "day", "type": {"type": "int",
                                 "logicalType": "date"}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4",
                                "size": 4}},
    ]})
    recs = [
        {"d": decimal.Decimal("-123.45"),
         "df": decimal.Decimal("9.125"),
         "day": datetime.date(1992, 3, 4),
         "fx": b"\x01\x02\x03\x04"},
        {"d": decimal.Decimal("0.01"),
         "df": decimal.Decimal("-0.002"),
         "day": datetime.date(1969, 12, 31),
         "fx": b"\xff\x00\xff\x00"},
    ]
    blob = write_ocf(sch, recs, codec="deflate", sync_seed=7)
    assert read_ocf(blob)["records"] == recs


def test_ocf_enum_and_recursive_schema():
    """OCF blocks decode enum and recursive named-type schemas
    (r16: the stream decoder threads the name environment)."""
    import json as _json

    sch = _json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN"]}},
        {"name": "next", "type": ["null", "R"], "default": None}]})
    recs = [{"c": "RED", "next": {"c": "GREEN", "next": None}},
            {"c": "GREEN", "next": None}]
    for codec in ("null", "deflate", "snappy"):
        assert read_ocf(write_ocf(sch, recs,
                                  codec=codec))["records"] == recs
