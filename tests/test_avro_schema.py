"""Avro schema rendering for the Kafka source (O1/O5): nested records,
deterministic names, full type mapping — pure-Python check (the wire
path needs a broker + spark-avro, gated at runtime)."""

import json

from health_monitor_cc_flink_spark.schemas import HEALTH_EVENT_SCHEMA
from health_monitor_cc_flink_spark.sources.kafka import avro_schema_json


def test_health_event_avro_schema_shape():
    s = json.loads(avro_schema_json(HEALTH_EVENT_SCHEMA, name="Event"))
    assert s["type"] == "record" and s["name"] == "Event"
    fields = {f["name"]: f["type"] for f in s["fields"]}
    assert fields["event_id"] == "string"
    assert fields["patient_id"] == "int"
    assert fields["event_time"] == {"type": "long", "logicalType": "timestamp-micros"}
    vitals = fields["vitals"]
    assert vitals["type"] == "record"
    vf = {f["name"]: f["type"] for f in vitals["fields"]}
    assert vf["heart_rate"] == "int"
    assert vf["body_temperature_c"] == "float"
    bp = vf["blood_pressure"]
    assert bp["type"] == "record"
    assert {f["name"] for f in bp["fields"]} == {"systolic", "diastolic"}


def test_avro_schema_is_deterministic():
    a = avro_schema_json(HEALTH_EVENT_SCHEMA)
    b = avro_schema_json(HEALTH_EVENT_SCHEMA)
    assert a == b
    # record names unique (Avro requires it within a schema)
    names = [
        seg.split('"')[0]
        for seg in a.split('"name": "')[1:]
    ]
    assert len(names) == len(set(names))


def test_union_branch_out_of_range_rejected():
    import io
    import struct

    import pytest

    from health_monitor_cc_flink_spark.sources.avro_codec import _decode

    sch = ["null", "long"]
    # zigzag(5) = 10 -> branch index 5 on a 2-branch union
    with pytest.raises(ValueError):
        _decode(sch, io.BytesIO(bytes([10])))
    # zigzag(-1) = 1 -> negative branch must not wrap to the end
    with pytest.raises(ValueError):
        _decode(sch, io.BytesIO(bytes([1])))


def test_missing_nullable_field_requires_declared_default():
    """ADVICE r14: omitting a nullable field silently encoded null
    for ANY absent key — masking typo'd field names.  The fallback
    is now gated on the schema declaring "default": null."""
    import io
    import json

    import pytest

    from health_monitor_cc_flink_spark.sources.avro_codec import (
        decode_record,
        encode_record,
    )

    sch = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "with_default", "type": ["null", "long"],
             "default": None},
            {"name": "no_default", "type": ["null", "long"]},
        ]})
    # declared default: omission encodes null
    blob = encode_record(sch, {"a": 1, "no_default": 7})
    assert decode_record(sch, blob) == {
        "a": 1, "with_default": None, "no_default": 7}
    # no declared default: omission (e.g. a typo) must raise
    with pytest.raises(KeyError):
        encode_record(sch, {"a": 1, "with_default": 2,
                            "no_defalt": 7})


def test_schema_resolution_evolution_matrix():
    """Avro spec 'Schema Resolution': adds take reader defaults,
    drops skip wire bytes, reorders follow the reader, promotions
    convert (int->long, float->double, string<->bytes), and unions
    resolve per branch."""
    import json

    import pytest

    from health_monitor_cc_flink_spark.sources.avro_codec import (
        decode_record_resolved,
        encode_record,
    )

    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"},
        {"name": "dropme", "type": "string"},
        {"name": "b", "type": ["null", "float"]},
        {"name": "s", "type": "string"},
        {"name": "nested", "type": {
            "type": "record", "name": "nr", "fields": [
                {"name": "x", "type": "int"},
                {"name": "gone", "type": "long"},
            ]}},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
    ]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "b", "type": ["null", "double"]},
        {"name": "a", "type": "long"},
        {"name": "s", "type": "bytes"},
        {"name": "added", "type": ["null", "long"],
         "default": None},
        {"name": "tag", "type": "string", "default": "x"},
        {"name": "nested", "type": {
            "type": "record", "name": "nr", "fields": [
                {"name": "x", "type": "double"},
                {"name": "y", "type": "int", "default": 9},
            ]}},
        {"name": "arr",
         "type": {"type": "array", "items": "long"}},
    ]})
    blob = encode_record(w, {
        "a": 7, "dropme": "gone", "b": 2.5, "s": "hi",
        "nested": {"x": 3, "gone": 99}, "arr": [1, 2, 3]})
    got = decode_record_resolved(w, r, blob)
    assert got == {"b": 2.5, "a": 7, "s": b"hi", "added": None,
                   "tag": "x",
                   "nested": {"x": 3.0, "y": 9},
                   "arr": [1, 2, 3]}
    assert list(got) == ["b", "a", "s", "added", "tag", "nested",
                         "arr"]  # reader field order
    # missing default is loud
    r_bad = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "nodefault", "type": "string"},
    ]})
    w_small = json.dumps({"type": "record", "name": "r",
                          "fields": [{"name": "a", "type": "int"}]})
    blob2 = encode_record(w_small, {"a": 1})
    with pytest.raises(ValueError):
        decode_record_resolved(w_small, r_bad, blob2)
    # illegal promotion (double -> int) is loud
    w_d = json.dumps({"type": "record", "name": "r",
                      "fields": [{"name": "a", "type": "double"}]})
    r_i = json.dumps({"type": "record", "name": "r",
                      "fields": [{"name": "a", "type": "int"}]})
    blob3 = encode_record(w_d, {"a": 1.5})
    with pytest.raises(ValueError):
        decode_record_resolved(w_d, r_i, blob3)
