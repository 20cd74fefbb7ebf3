"""BSON decode/encode — the mongodump corpus format.

Database dumps are a standard corpus source and arrive as
``.bson`` files: back-to-back BSON documents with no framing between
them.  From the PUBLIC bsonspec.org specification:

* document = int32 total length (LE, includes itself and the
  trailing NUL) + element list + ``\\x00``;
* element = type byte + cstring key + value; supported types:
  0x01 double, 0x02 string (int32 length incl NUL), 0x03 embedded
  document, 0x04 array (a document with "0","1",... keys), 0x05
  binary (int32 length + subtype byte), 0x07 ObjectId (12 bytes),
  0x08 bool, 0x09 UTC datetime (int64 ms), 0x0A null, 0x10 int32,
  0x12 int64;
* anything else raises — flagging the row beats misdecoding.

The writer is deterministic (dict insertion order).  Every length is
bounds-checked; documents and streams are size-capped.
"""

from __future__ import annotations

import struct

MAX_DOC_BYTES = 1 << 26
MAX_DOCS = 1 << 20
MAX_DEPTH = 32


def _cstring(data: bytes, pos: int) -> tuple[str, int]:
    end = data.find(b"\x00", pos)
    if end < 0:
        raise ValueError("bson cstring unterminated")
    return data[pos:end].decode("utf-8"), end + 1


def _encode_value(v) -> tuple[int, bytes]:
    if isinstance(v, bool):  # before int: bool is an int subclass
        return 0x08, b"\x01" if v else b"\x00"
    if isinstance(v, float):
        return 0x01, struct.pack("<d", v)
    if isinstance(v, int):
        if -(1 << 31) <= v < 1 << 31:
            return 0x10, struct.pack("<i", v)
        return 0x12, struct.pack("<q", v)
    if isinstance(v, str):
        raw = v.encode("utf-8") + b"\x00"
        return 0x02, struct.pack("<i", len(raw)) + raw
    if isinstance(v, bytes):
        return 0x05, struct.pack("<i", len(v)) + b"\x00" + v
    if v is None:
        return 0x0A, b""
    if isinstance(v, list):
        return 0x04, encode_bson(
            {str(i): x for i, x in enumerate(v)})
    if isinstance(v, dict):
        return 0x03, encode_bson(v)
    raise TypeError(f"unsupported BSON value {type(v).__name__}")


def encode_bson(doc: dict) -> bytes:
    body = b""
    for k, v in doc.items():
        t, payload = _encode_value(v)
        body += bytes([t]) + k.encode("utf-8") + b"\x00" + payload
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _decode_doc(data: bytes, pos: int, depth: int) -> tuple[dict, int]:
    if depth > MAX_DEPTH:
        raise ValueError("bson nesting too deep")
    if pos + 5 > len(data):
        raise ValueError("bson document truncated")
    (total,) = struct.unpack_from("<i", data, pos)
    if total < 5 or total > MAX_DOC_BYTES or pos + total > len(data):
        raise ValueError("bson document length out of range")
    end = pos + total
    p = pos + 4
    out: dict = {}
    while True:
        if p >= end:
            raise ValueError("bson element list overran document")
        t = data[p]
        p += 1
        if t == 0:
            if p != end:
                raise ValueError("bson trailing bytes in document")
            return out, end
        key, p = _cstring(data, p)
        if t == 0x01:
            (v,) = struct.unpack_from("<d", data, p)
            p += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", data, p)
            p += 4
            if ln < 1 or p + ln > end or data[p + ln - 1] != 0:
                raise ValueError("bson string malformed")
            v = data[p:p + ln - 1].decode("utf-8")
            p += ln
        elif t in (0x03, 0x04):
            v, p = _decode_doc(data, p, depth + 1)
            if t == 0x04:
                v = [v[str(i)] for i in range(len(v))]
        elif t == 0x05:
            (ln,) = struct.unpack_from("<i", data, p)
            p += 4
            if ln < 0 or p + 1 + ln > end:
                raise ValueError("bson binary overrun")
            v = data[p + 1:p + 1 + ln]  # subtype byte skipped
            p += 1 + ln
        elif t == 0x07:
            v = data[p:p + 12].hex()
            p += 12
        elif t == 0x08:
            v = data[p] != 0
            p += 1
        elif t == 0x09:
            (v,) = struct.unpack_from("<q", data, p)  # UTC ms
            p += 8
        elif t == 0x0A:
            v = None
        elif t == 0x10:
            (v,) = struct.unpack_from("<i", data, p)
            p += 4
        elif t == 0x12:
            (v,) = struct.unpack_from("<q", data, p)
            p += 8
        else:
            raise ValueError(f"bson type 0x{t:02x} unsupported")
        out[key] = v


def decode_bson(data: bytes) -> dict:
    doc, end = _decode_doc(data, 0, 0)
    if end != len(data):
        raise ValueError("bson trailing bytes after document")
    return doc


def decode_bson_stream(data: bytes) -> list[dict]:
    """mongodump layout: documents back-to-back to EOF."""
    out = []
    pos = 0
    while pos < len(data):
        doc, pos = _decode_doc(data, pos, 0)
        out.append(doc)
        if len(out) > MAX_DOCS:
            raise ValueError("bson stream doc cap exceeded")
    return out
