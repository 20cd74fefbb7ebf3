"""ORC file-tail introspection — the third lake file format.

With Parquet (operators/parquet_meta.py, Thrift compact) and Avro OCF
(sources/avro_ocf.py) covered, ORC completes the columnar-file triad.
From the PUBLIC ORC v1 specification (orc.apache.org/specification):

* the file tail reads backwards — last byte is the POSTSCRIPT length;
  the postscript (protobuf, never compressed) carries footerLength,
  compression kind, compressionBlockSize, version, metadataLength and
  ends with the "ORC" magic;
* the FOOTER (protobuf, compressed with the postscript's codec) is
  chunked: each chunk has a 3-byte little-endian header
  ``(chunkLength << 1) | isOriginal`` — original chunks are stored
  raw, others are RAW zlib-deflate / snappy blocks (decoded by this
  repo's from-scratch snappy for kind SNAPPY);
* footer fields: headerLength, contentLength, repeated
  StripeInformation {offset, indexLength, dataLength, footerLength,
  numberOfRows}, repeated Type {kind, subtypes, fieldNames},
  numberOfRows, rowIndexStride;
* the generic protobuf walk is shared with the TFRecord surface
  (operators/tfrecord.proto_decode) — unknown fields skip.

Correctness is pinned by writing fixtures with Spark's own ORC writer
and cross-checking stripe/row/type census against what Spark reads
back (tests/test_orc_meta.py).  Hostile input raises ``ValueError``.
"""

from __future__ import annotations

import zlib

from .snappy import snappy_decompress_block
from .tfrecord import proto_decode

MAX_TAIL_BYTES = 1 << 26

COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4",
               5: "ZSTD"}

TYPE_KIND = {
    0: "BOOLEAN", 1: "BYTE", 2: "SHORT", 3: "INT", 4: "LONG",
    5: "FLOAT", 6: "DOUBLE", 7: "STRING", 8: "BINARY", 9: "TIMESTAMP",
    10: "LIST", 11: "MAP", 12: "STRUCT", 13: "UNION", 14: "DECIMAL",
    15: "DATE", 16: "VARCHAR", 17: "CHAR",
    18: "TIMESTAMP_INSTANT",
}


def _varint_val(v) -> int:
    if not isinstance(v, int):
        raise ValueError("orc: expected varint field")
    return v


def _uint_list(items) -> list[int]:
    """Repeated uint field: accept unpacked varints AND packed
    length-delimited blobs of varints (proto3 packs by default)."""
    from .tfrecord import _read_uvarint

    out: list[int] = []
    for item in items:
        if isinstance(item, int):
            out.append(item)
        else:
            raw = bytes(item)
            pos = 0
            while pos < len(raw):
                v, pos = _read_uvarint(raw, pos)
                out.append(v)
    return out


def _decompress_stream(data: bytes, kind: str) -> bytes:
    """ORC compressed stream: 3-byte LE chunk headers,
    (len << 1) | isOriginal."""
    if kind == "NONE":
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 3 > n:
            raise ValueError("orc chunk header truncated")
        head = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        ln = head >> 1
        if pos + ln > n:
            raise ValueError("orc chunk overruns stream")
        chunk = data[pos:pos + ln]
        pos += ln
        if head & 1:  # original (stored) chunk
            out += chunk
        elif kind == "ZLIB":  # raw deflate per spec
            out += zlib.decompressobj(-15).decompress(
                chunk, MAX_TAIL_BYTES)
        elif kind == "SNAPPY":
            out += snappy_decompress_block(chunk)
        elif kind == "ZSTD":
            from .zstd import zstd_decompress

            out += zstd_decompress(chunk)
        else:
            raise ValueError(f"orc codec {kind} not implemented here")
        if len(out) > MAX_TAIL_BYTES:
            raise ValueError("orc tail cap exceeded")
    return bytes(out)


def decode_column_statistics(raw: bytes) -> dict:
    """ColumnStatistics protobuf -> {n_values, has_null, min, max}
    (typed min/max for integer / double / string stats; None
    otherwise).  Shared by the Metadata-section and ROW_INDEX
    readers."""
    import struct as _s

    cs = proto_decode(raw)
    n_values = cs.get(1, [None])[-1]
    has_null = bool(cs.get(10, [0])[-1])
    mn = mx = None
    if 2 in cs:  # IntegerStatistics, sint64 zigzag
        ist = proto_decode(bytes(cs[2][-1]))
        if 1 in ist:
            mn = (ist[1][-1] >> 1) ^ -(ist[1][-1] & 1)
        if 2 in ist:
            mx = (ist[2][-1] >> 1) ^ -(ist[2][-1] & 1)
    elif 3 in cs:  # DoubleStatistics, fixed64 doubles
        dst = proto_decode(bytes(cs[3][-1]))
        if 1 in dst:
            mn = _s.unpack("<d", bytes(dst[1][-1]))[0]
        if 2 in dst:
            mx = _s.unpack("<d", bytes(dst[2][-1]))[0]
    elif 4 in cs:  # StringStatistics, utf-8 bytes
        sst = proto_decode(bytes(cs[4][-1]))
        if 1 in sst:
            mn = bytes(sst[1][-1]).decode("utf-8")
        if 2 in sst:
            mx = bytes(sst[2][-1]).decode("utf-8")
    return {"n_values": n_values, "has_null": has_null,
            "min": mn, "max": mx}


def parse_orc_metadata(data: bytes) -> list[list[dict]]:
    """The file-tail METADATA section (orc_proto Metadata: repeated
    StripeStatistics, each repeated ColumnStatistics — column 0 is
    the root struct) -> per-stripe lists of decoded stats.  The
    tail-only stripe-pruning input: one read, no index sections,
    no data bytes."""
    tail = parse_orc_tail(data)
    mlen = tail.get("metadata_length") or 0
    if not mlen:
        return []
    # metadata sits immediately before the footer
    ps_len = data[-1]
    footer_len = tail["_footer_length"]
    end = len(data) - 1 - ps_len - footer_len
    raw = _decompress_stream(data[end - mlen:end],
                             tail["compression"])
    out: list[list[dict]] = []
    for ss in proto_decode(raw).get(1, []):
        cols = [decode_column_statistics(bytes(b))
                for b in proto_decode(bytes(ss)).get(1, [])]
        out.append(cols)
    return out


def parse_orc_tail(data: bytes) -> dict:
    """Full ORC file bytes -> {compression, compression_block_size,
    format_version, n_rows, n_cols, schema: [(kind, name)...] of the
    root struct, stripes: [{offset, data_length, n_rows}],
    content_length}."""
    if len(data) < 16 or data[:3] != b"ORC":
        raise ValueError("not an ORC file (magic missing)")
    ps_len = data[-1]
    if ps_len == 0 or ps_len + 1 > len(data):
        raise ValueError("bad ORC postscript length")
    ps = proto_decode(data[-1 - ps_len:-1])
    footer_len = _varint_val(ps.get(1, [0])[-1])
    kind = COMPRESSION.get(_varint_val(ps.get(2, [0])[-1]))
    if kind is None:
        raise ValueError("unknown ORC compression kind")
    block = _varint_val(ps.get(3, [0])[-1]) if 3 in ps else None
    version = ".".join(str(v) for v in _uint_list(ps.get(4, [])))
    magic = ps.get(8000, [b""])[-1]
    if bytes(magic) != b"ORC":
        raise ValueError("ORC postscript magic mismatch")
    tail_end = len(data) - 1 - ps_len
    if footer_len > tail_end:
        raise ValueError("ORC footer overruns file")
    footer_raw = _decompress_stream(
        data[tail_end - footer_len:tail_end], kind)
    footer = proto_decode(footer_raw)
    stripes = []
    for blob in footer.get(3, []):
        si = proto_decode(bytes(blob))
        stripes.append({
            "offset": _varint_val(si.get(1, [0])[-1]),
            "index_length": _varint_val(si.get(2, [0])[-1]),
            "data_length": _varint_val(si.get(3, [0])[-1]),
            "footer_length": _varint_val(si.get(4, [0])[-1]),
            "n_rows": _varint_val(si.get(5, [0])[-1]),
        })
    types = [proto_decode(bytes(b)) for b in footer.get(4, [])]
    if not types:
        raise ValueError("ORC footer has no types")
    root = types[0]
    if TYPE_KIND.get(_varint_val(root.get(1, [0])[-1])) != "STRUCT":
        raise ValueError("ORC root type is not a struct")
    names = [bytes(x).decode("utf-8") for x in root.get(3, [])]
    subtypes = _uint_list(root.get(2, []))
    schema = []
    for name, st in zip(names, subtypes):
        if st >= len(types):
            raise ValueError("ORC subtype index out of range")
        kind_id = _varint_val(types[st].get(1, [0])[-1])
        schema.append((TYPE_KIND.get(kind_id, f"K{kind_id}"), name))
    # the FULL type tree (nested decode walks child type ids)
    type_tree = []
    for t in types:
        kid = _varint_val(t.get(1, [0])[-1])
        sub = _uint_list(t.get(2, []))
        if any(s >= len(types) for s in sub):
            raise ValueError("ORC subtype index out of range")
        type_tree.append({
            "kind": TYPE_KIND.get(kid, f"K{kid}"),
            "subtypes": sub,
            "field_names": [bytes(x).decode("utf-8")
                            for x in t.get(3, [])],
        })
    return {
        "compression": kind,
        "compression_block_size": block,
        "format_version": version,
        "n_rows": _varint_val(footer.get(6, [0])[-1]),
        "n_cols": len(names),
        "schema": schema,
        "types": type_tree,
        "stripes": stripes,
        "content_length": _varint_val(footer.get(2, [0])[-1]),
        "metadata_length": (_varint_val(ps.get(5, [0])[-1])
                            if 5 in ps else 0),
        "_footer_length": footer_len,
    }
