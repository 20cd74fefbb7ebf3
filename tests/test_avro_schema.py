"""Avro schema rendering for the Kafka source (O1/O5): nested records,
deterministic names, full type mapping — pure-Python check (the wire
path needs a broker + spark-avro, gated at runtime)."""

import json

import pytest

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


def test_union_named_branch_matching_and_aliases():
    """ADVICE r15: a reader union with several record branches must
    match by NAME (or reader alias), not first-record-wins; spec
    'Schema Resolution' + 'Aliases'."""
    from health_monitor_cc_flink_spark.sources.avro_codec import (
        decode_record_resolved,
        encode_record,
    )

    w = json.dumps({"type": "record", "name": "Env", "fields": [
        {"name": "p", "type": {
            "type": "record", "name": "B",
            "fields": [{"name": "x", "type": "long"}]}}]})
    r = json.dumps({"type": "record", "name": "Env", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "A", "fields": [
                {"name": "y", "type": "string", "default": "d"}]},
            {"type": "record", "name": "B", "fields": [
                {"name": "x", "type": "long"}]}]}]})
    blob = encode_record(w, {"p": {"x": 42}})
    # pre-fix this decoded against branch A (kind-only matching)
    assert decode_record_resolved(w, r, blob) == {"p": {"x": 42}}

    # type-level alias: renamed record still resolves
    w2 = json.dumps({"type": "record", "name": "OldName",
                     "fields": [{"name": "x", "type": "long"}]})
    r2 = json.dumps({"type": "record", "name": "NewName",
                     "aliases": ["OldName"],
                     "fields": [{"name": "x", "type": "long"}]})
    assert decode_record_resolved(
        w2, r2, encode_record(w2, {"x": 5})) == {"x": 5}
    # without the alias the mismatch is loud
    r3 = json.dumps({"type": "record", "name": "NewName",
                     "fields": [{"name": "x", "type": "long"}]})
    with pytest.raises(ValueError):
        decode_record_resolved(w2, r3, encode_record(w2, {"x": 5}))

    # field-level alias: renamed field resolves into the reader name
    w4 = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "old_field", "type": "long"},
        {"name": "keep", "type": "string"}]})
    r4 = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "new_field", "aliases": ["old_field"],
         "type": "long"},
        {"name": "keep", "type": "string"}]})
    got = decode_record_resolved(
        w4, r4, encode_record(w4, {"old_field": 7, "keep": "k"}))
    assert got == {"new_field": 7, "keep": "k"}


def test_recursive_named_types_and_enums():
    """Recursive by-name references ('type': 'Node') and enum
    encode/decode/resolution, incl. the reader enum default for an
    unknown writer symbol (Avro spec resolution rules)."""
    from health_monitor_cc_flink_spark.sources.avro_codec import (
        decode_record,
        decode_record_resolved,
        encode_record,
    )

    node = json.dumps({"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "long"},
        {"name": "next", "type": ["null", "Node"],
         "default": None}]})
    rec = {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    assert decode_record(node, encode_record(node, rec)) == rec

    # resolution walks the recursion: reader adds a defaulted field
    # at every level
    r_node = json.dumps({"type": "record", "name": "Node",
                         "fields": [
        {"name": "v", "type": "long"},
        {"name": "tag", "type": "string", "default": "t"},
        {"name": "next", "type": ["null", "Node"],
         "default": None}]})
    got = decode_record_resolved(node, r_node,
                                 encode_record(node, rec))
    assert got == {"v": 1, "tag": "t",
                   "next": {"v": 2, "tag": "t",
                            "next": {"v": 3, "tag": "t",
                                     "next": None}}}

    # enums: roundtrip + unknown-symbol -> reader default
    esch = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN"]}}]})
    assert decode_record(
        esch, encode_record(esch, {"c": "GREEN"})) == {"c": "GREEN"}
    with pytest.raises(ValueError):
        encode_record(esch, {"c": "MAUVE"})
    w_e = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN", "NEW"]}}]})
    r_def = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN", "OTHER"],
                               "default": "OTHER"}}]})
    assert decode_record_resolved(
        w_e, r_def, encode_record(w_e, {"c": "NEW"})) == {
            "c": "OTHER"}
    r_nodef = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "GREEN"]}}]})
    with pytest.raises(ValueError):
        decode_record_resolved(w_e, r_nodef,
                               encode_record(w_e, {"c": "NEW"}))


def test_resolution_matches_java_avro(spark):
    """Spec conformance for the r16 resolution features: the
    reference Java Avro implementation (GenericDatumReader with
    writer+reader schemas — the exact resolution code path every
    Kafka consumer runs) must agree with decode_record_resolved on
    union named-branch matching, type/field aliases, enum defaults
    and recursive named types."""
    from health_monitor_cc_flink_spark.sources.avro_codec import (
        decode_record_resolved,
        encode_record,
    )

    jvm = spark._jvm

    def java_resolve(wjson, rjson, payload):
        parse = jvm.org.apache.avro.Schema.Parser
        ws = parse().parse(wjson)
        rs = parse().parse(rjson)
        reader = jvm.org.apache.avro.generic.GenericDatumReader(
            ws, rs)
        dec = (jvm.org.apache.avro.io.DecoderFactory.get()
               .binaryDecoder(payload, None))
        return reader.read(None, dec)

    # union with two record branches: must pick branch B by NAME
    w1 = json.dumps({"type": "record", "name": "Env", "fields": [
        {"name": "p", "type": {
            "type": "record", "name": "B",
            "fields": [{"name": "x", "type": "long"}]}}]})
    r1 = json.dumps({"type": "record", "name": "Env", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "A", "fields": [
                {"name": "y", "type": "string", "default": "d"}]},
            {"type": "record", "name": "B", "fields": [
                {"name": "x", "type": "long"}]}]}]})
    blob1 = encode_record(w1, {"p": {"x": 42}})
    jrec = java_resolve(w1, r1, blob1)
    assert jrec.get("p").getSchema().getName() == "B"
    assert jrec.get("p").get("x") == 42
    assert decode_record_resolved(w1, r1, blob1) == {"p": {"x": 42}}

    # type-level alias rename
    w2 = json.dumps({"type": "record", "name": "OldName",
                     "fields": [{"name": "x", "type": "long"}]})
    r2 = json.dumps({"type": "record", "name": "NewName",
                     "aliases": ["OldName"],
                     "fields": [{"name": "x", "type": "long"}]})
    blob2 = encode_record(w2, {"x": 5})
    assert java_resolve(w2, r2, blob2).get("x") == 5
    assert decode_record_resolved(w2, r2, blob2) == {"x": 5}

    # field-level alias rename
    w3 = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "old_field", "type": "long"},
        {"name": "keep", "type": "string"}]})
    r3 = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "new_field", "aliases": ["old_field"],
         "type": "long"},
        {"name": "keep", "type": "string"}]})
    blob3 = encode_record(w3, {"old_field": 7, "keep": "k"})
    j3 = java_resolve(w3, r3, blob3)
    assert j3.get("new_field") == 7 and str(j3.get("keep")) == "k"
    assert decode_record_resolved(w3, r3, blob3) == {
        "new_field": 7, "keep": "k"}

    # enum: unknown writer symbol -> reader default (both engines)
    w4 = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "NEW"]}}]})
    r4 = json.dumps({"type": "record", "name": "E", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "Color",
                               "symbols": ["RED", "OTHER"],
                               "default": "OTHER"}}]})
    blob4 = encode_record(w4, {"c": "NEW"})
    assert str(java_resolve(w4, r4, blob4).get("c")) == "OTHER"
    assert decode_record_resolved(w4, r4, blob4) == {"c": "OTHER"}

    # recursive named type with a reader-added defaulted field
    w5 = json.dumps({"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "long"},
        {"name": "next", "type": ["null", "Node"],
         "default": None}]})
    r5 = json.dumps({"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "long"},
        {"name": "tag", "type": "string", "default": "t"},
        {"name": "next", "type": ["null", "Node"],
         "default": None}]})
    rec5 = {"v": 1, "next": {"v": 2, "next": None}}
    blob5 = encode_record(w5, rec5)
    j5 = java_resolve(w5, r5, blob5)
    assert j5.get("v") == 1 and str(j5.get("tag")) == "t"
    assert j5.get("next").get("v") == 2
    assert j5.get("next").get("next") is None
    assert decode_record_resolved(w5, r5, blob5) == {
        "v": 1, "tag": "t",
        "next": {"v": 2, "tag": "t", "next": None}}

    # Java-ENCODED bytes decode identically in Python (reverse
    # direction closes the conformance loop for enums + recursion)
    ws = jvm.org.apache.avro.Schema.Parser().parse(w5)
    baos = jvm.java.io.ByteArrayOutputStream()
    enc = (jvm.org.apache.avro.io.EncoderFactory.get()
           .binaryEncoder(baos, None))
    jvm.org.apache.avro.generic.GenericDatumWriter(ws).write(
        java_resolve(w5, w5, blob5), enc)
    enc.flush()
    assert decode_record_resolved(
        w5, r5, bytes(baos.toByteArray())) == {
        "v": 1, "tag": "t",
        "next": {"v": 2, "tag": "t", "next": None}}
