"""TFRecord + tf.train.Example — the ML training-data container.

Tokenized corpora are ultimately materialized for trainers, and the
dominant interchange is TFRecord files of ``tf.train.Example``
protobufs.  Implemented from the PUBLIC specs from scratch (no
tensorflow in this environment, and none needed):

* TFRecord framing (TensorFlow's documented record layout):
  ``u64-LE length | u32-LE masked-crc32c(length bytes) | data |
  u32-LE masked-crc32c(data)`` — the SAME masked Castagnoli CRC as
  the snappy framing format (operators/snappy.py provides it);
* protobuf WIRE FORMAT (protobuf.dev encoding docs): varints,
  ``(field_number << 3) | wire_type`` tags, wire types 0 (varint),
  1 (64-bit), 2 (length-delimited), 5 (32-bit) — decoded generically
  into {field: [values]} so unknown fields skip structurally;
* the ``tf.train.Example`` message shape (public tensorflow .protos):
  Example{1: Features}, Features{1: map<string, Feature>} (a proto
  map = repeated length-delimited entries {1: key, 2: value}),
  Feature{1: BytesList | 2: FloatList | 3: Int64List}, each list
  {1: repeated payload} — with the float/int64 lists accepting both
  PACKED (length-delimited) and unpacked encodings, as the spec
  requires of parsers.

Writers here are deterministic (synth/oracle vehicles); the encoder
emits packed numeric lists like TensorFlow's.  Hostile input raises
``ValueError``; record sizes and counts are capped.
"""

from __future__ import annotations

import struct

from .snappy import crc32c

MAX_RECORD_BYTES = 1 << 26
MAX_RECORDS = 1 << 20
MAX_FIELDS = 1 << 16


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf wire format ---------------------------------------------

def _uvarint(value: int) -> bytes:
    out = bytearray()
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = value = 0
    while True:
        if pos >= len(data) or shift > 70:
            raise ValueError("protobuf varint truncated/too long")
        b = data[pos]
        value |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return value, pos
        shift += 7


def proto_decode(data: bytes) -> dict[int, list]:
    """Generic wire-format walk -> {field_number: [raw values]}.
    Varints stay ints, 64/32-bit fixed stay raw bytes, and
    length-delimited stay bytes (caller interprets per schema)."""
    fields: dict[int, list] = {}
    pos = 0
    n = len(data)
    count = 0
    while pos < n:
        count += 1
        if count > MAX_FIELDS:
            raise ValueError("protobuf field cap exceeded")
        tag, pos = _read_uvarint(data, pos)
        fnum, wtype = tag >> 3, tag & 0x07
        if fnum == 0:
            raise ValueError("protobuf field number 0")
        if wtype == 0:
            v, pos = _read_uvarint(data, pos)
        elif wtype == 1:
            if pos + 8 > n:
                raise ValueError("protobuf 64-bit truncated")
            v = data[pos:pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_uvarint(data, pos)
            if pos + ln > n:
                raise ValueError("protobuf length-delimited overrun")
            v = data[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            if pos + 4 > n:
                raise ValueError("protobuf 32-bit truncated")
            v = data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf wire type {wtype} unsupported")
        fields.setdefault(fnum, []).append(v)
    return fields


def _ld(fnum: int, payload: bytes) -> bytes:
    return _uvarint((fnum << 3) | 2) + _uvarint(len(payload)) + payload


# -- tf.train.Example --------------------------------------------------

def encode_example(features: dict) -> bytes:
    """{name: bytes | str | [int] | [float]} -> tf.train.Example
    bytes (numeric lists packed, like TensorFlow's writer)."""
    entries = b""
    for name in sorted(features):
        v = features[name]
        if isinstance(v, (bytes, str)):
            raw = v.encode("utf-8") if isinstance(v, str) else v
            flist = _ld(1, _ld(1, raw))  # BytesList{1: value}
        elif v and all(isinstance(x, int) for x in v):
            packed = b"".join(
                _uvarint(x & 0xFFFFFFFFFFFFFFFF) for x in v)
            flist = _ld(3, _ld(1, packed))  # Int64List packed
        elif all(isinstance(x, float) for x in v):
            packed = b"".join(struct.pack("<f", x) for x in v)
            flist = _ld(2, _ld(1, packed))  # FloatList packed
        else:
            raise TypeError(f"unsupported feature value for {name!r}")
        entry = _ld(1, name.encode("utf-8")) + _ld(2, flist)
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, entries)  # Example{1: Features}


def _zigzag_noop_int64(v: int) -> int:
    """int64 features are plain varints (not zigzag); map the
    two's-complement 64-bit value back to signed."""
    return v - (1 << 64) if v >= 1 << 63 else v


def decode_example(data: bytes) -> dict:
    """tf.train.Example bytes -> {name: bytes | [int] | [float]},
    accepting packed and unpacked numeric lists."""
    ex = proto_decode(data)
    out: dict[str, object] = {}
    for features_blob in ex.get(1, []):
        feats = proto_decode(bytes(features_blob))
        for entry in feats.get(1, []):
            kv = proto_decode(bytes(entry))
            if 1 not in kv or 2 not in kv:
                raise ValueError("Features map entry missing key/value")
            name = bytes(kv[1][-1]).decode("utf-8")
            feature = proto_decode(bytes(kv[2][-1]))
            if 1 in feature:  # BytesList
                bl = proto_decode(bytes(feature[1][-1]))
                vals_b = [bytes(x) for x in bl.get(1, [])]
                out[name] = vals_b[0] if len(vals_b) == 1 else vals_b
            elif 2 in feature:  # FloatList
                fl = proto_decode(bytes(feature[2][-1]))
                vals: list[float] = []
                for item in fl.get(1, []):
                    if isinstance(item, int):  # unpacked varint? no:
                        raise ValueError("float list with varint item")
                    raw = bytes(item)
                    if len(raw) == 4:  # unpacked single fixed32
                        vals.append(struct.unpack("<f", raw)[0])
                    else:  # packed
                        if len(raw) % 4:
                            raise ValueError("packed float list ragged")
                        vals.extend(
                            struct.unpack(f"<{len(raw) // 4}f", raw))
                out[name] = vals
            elif 3 in feature:  # Int64List
                il = proto_decode(bytes(feature[3][-1]))
                ivals: list[int] = []
                for item in il.get(1, []):
                    if isinstance(item, int):  # unpacked varint
                        ivals.append(_zigzag_noop_int64(item))
                    else:  # packed blob of varints
                        raw = bytes(item)
                        p = 0
                        while p < len(raw):
                            v, p = _read_uvarint(raw, p)
                            ivals.append(_zigzag_noop_int64(v))
                out[name] = ivals
            else:
                raise ValueError(f"feature {name!r} has no list")
    return out


# -- TFRecord framing ---------------------------------------------------

def write_tfrecords(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        hdr = struct.pack("<Q", len(rec))
        out += hdr
        out += struct.pack("<I", _masked_crc(hdr))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def read_tfrecords(data: bytes) -> list[bytes]:
    """TFRecord stream -> record payloads, both CRCs verified."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord header")
        (ln,) = struct.unpack_from("<Q", data, pos)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        if _masked_crc(data[pos:pos + 8]) != hcrc:
            raise ValueError("TFRecord length CRC mismatch")
        if ln > MAX_RECORD_BYTES:
            raise ValueError("TFRecord record cap exceeded")
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError("TFRecord data truncated")
        rec = data[pos:pos + ln]
        (dcrc,) = struct.unpack_from("<I", data, pos + ln)
        if _masked_crc(rec) != dcrc:
            raise ValueError("TFRecord data CRC mismatch")
        out.append(rec)
        pos += ln + 4
        if len(out) > MAX_RECORDS:
            raise ValueError("TFRecord count cap exceeded")
    return out
