"""Parquet footer introspection — Thrift compact protocol from scratch.

A lake engine should be able to LOOK AT the lake format itself:
row-group layout, per-column-chunk codecs and byte sizes drive
split planning, compaction decisions, and scan-cost estimates at
100 TB.  This reads the REAL Parquet footer (no pyarrow/Spark
delegation) from the PUBLIC specs:

* the file trailer — ``...<footer bytes><4-byte LE footer length>
  PAR1`` (parquet-format README);
* the footer itself — a Thrift **compact protocol** ``FileMetaData``
  struct (thrift compact spec: short-form field headers
  ``(id_delta << 4) | type`` with zigzag-varint long form,
  zigzag-varint i16/i32/i64, varint-length binary, list headers
  ``(size << 4) | elem_type`` with 0xF escape, bool encoded in the
  field-type nibble);
* parquet-format field ids — FileMetaData{1 version, 2 schema,
  3 num_rows, 4 row_groups, 6 created_by}, RowGroup{1 columns,
  2 total_byte_size, 3 num_rows}, ColumnChunk{2 file_offset,
  3 meta_data}, ColumnMetaData{1 type, 2 encodings, 3 path_in_schema,
  4 codec, 5 num_values, 6 total_uncompressed_size,
  7 total_compressed_size, 9 data_page_offset,
  11 dictionary_page_offset}.

The generic reader skips unknown fields structurally, so footers
written by any writer version parse.  Correctness is cross-validated
against DuckDB's ``parquet_metadata()`` over the SAME testdata files
— a fully independent external oracle.  Hostile input raises
``ValueError``; nesting and collection sizes are capped.
"""

from __future__ import annotations

import struct

MAX_DEPTH = 24
MAX_COLLECTION = 1 << 20

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12

PHYSICAL_TYPE = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
    5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
CODEC = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
    5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("thrift: truncated")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        shift = value = 0
        while True:
            b = self._byte()
            value |= (b & 0x7F) << shift
            if not b & 0x80:
                return value
            shift += 7
            if shift > 70:
                raise ValueError("thrift: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.varint()
        if n > len(self.data) - self.pos:
            raise ValueError("thrift: binary overruns input")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def value(self, ctype: int, depth: int):
        if depth > MAX_DEPTH:
            raise ValueError("thrift: nesting too deep")
        if ctype == _CT_TRUE:
            return True
        if ctype == _CT_FALSE:
            return False
        if ctype == _CT_BYTE:
            return self._byte()
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            return self.zigzag()
        if ctype == _CT_DOUBLE:
            if self.pos + 8 > len(self.data):
                raise ValueError("thrift: truncated double")
            (v,) = struct.unpack_from("<d", self.data, self.pos)
            self.pos += 8
            return v
        if ctype == _CT_BINARY:
            return self.binary()
        if ctype in (_CT_LIST, _CT_SET):
            head = self._byte()
            size = head >> 4
            etype = head & 0x0F
            if size == 0x0F:
                size = self.varint()
            if size > MAX_COLLECTION:
                raise ValueError("thrift: list too large")
            return [self._elem(etype, depth + 1)
                    for _ in range(size)]
        if ctype == _CT_MAP:
            size = self.varint()
            if size == 0:
                return {}
            if size > MAX_COLLECTION:
                raise ValueError("thrift: map too large")
            kv = self._byte()
            ktype, vtype = kv >> 4, kv & 0x0F
            return {
                self._bin_key(self._elem(ktype, depth + 1)):
                    self._elem(vtype, depth + 1)
                for _ in range(size)
            }
        if ctype == _CT_STRUCT:
            return self.struct(depth + 1)
        raise ValueError(f"thrift: unknown compact type {ctype}")

    def _elem(self, ctype: int, depth: int):
        """Container element: unlike field headers (where the bool
        VALUE rides in the type nibble), list/set/map bools are one
        byte each (1 true / 2 false per the compact spec)."""
        if ctype in (_CT_TRUE, _CT_FALSE):
            return self._byte() == 1
        return self.value(ctype, depth)

    @staticmethod
    def _bin_key(k):
        return bytes(k) if isinstance(k, (bytes, bytearray)) else k

    def struct(self, depth: int = 0) -> dict:
        """Generic struct read -> {field_id: value}; bools come from
        the type nibble; unknown fields are still decoded (compact
        protocol is self-describing) so they skip structurally."""
        fields: dict[int, object] = {}
        last_id = 0
        while True:
            head = self._byte()
            if head == _CT_STOP:
                return fields
            delta = head >> 4
            ctype = head & 0x0F
            fid = last_id + delta if delta else self.zigzag()
            last_id = fid
            fields[fid] = self.value(ctype, depth)


def schema_leaves(elements: list[dict]) -> list[dict]:
    """Preorder SchemaElement list -> leaf descriptors with the level
    ladder nested decode needs: {path, type, type_length,
    converted_type, scale, precision, max_def_level, max_rep_level,
    rep_def_level}.  SchemaElement field ids (parquet.thrift): 1 type,
    2 type_length, 3 repetition_type (0 REQUIRED / 1 OPTIONAL /
    2 REPEATED), 4 name, 5 num_children, 6 converted_type, 7 scale,
    8 precision.  ``rep_def_level`` is the definition level AT the
    deepest repeated ancestor (0 if the leaf is flat): a def level of
    rep_def_level-1 means present-but-empty list, anything lower means
    the list (or an ancestor) is null."""
    if not isinstance(elements, list) or not elements \
            or not all(isinstance(e, dict) for e in elements):
        raise ValueError("malformed parquet schema element list")
    leaves: list[dict] = []
    idx = 0

    def walk(path: tuple, max_def: int, max_rep: int,
             rep_defs: tuple, depth: int) -> None:
        nonlocal idx
        if depth > MAX_DEPTH:
            raise ValueError("parquet schema too deep")
        if idx >= len(elements):
            raise ValueError("parquet schema tree truncated")
        el = elements[idx]
        idx += 1
        name = el.get(4, b"")
        name = (name.decode("utf-8", "replace")
                if isinstance(name, (bytes, bytearray)) else str(name))
        rep = el.get(3, 0)
        if rep == 1:  # OPTIONAL
            max_def += 1
        elif rep == 2:  # REPEATED
            max_def += 1
            max_rep += 1
            rep_defs = rep_defs + (max_def,)
        here = path + (name,)
        n_children = el.get(5) or 0
        if not isinstance(n_children, int) or n_children < 0:
            raise ValueError("parquet schema: bad child count")
        if n_children:
            for _ in range(n_children):
                walk(here, max_def, max_rep, rep_defs, depth + 1)
            return
        for fid in (1, 2, 6, 7, 8):
            if el.get(fid) is not None \
                    and not isinstance(el.get(fid), int):
                raise ValueError("parquet schema: bad leaf field")
        leaves.append({
            "path": ".".join(here),
            "type": PHYSICAL_TYPE.get(el.get(1), f"T{el.get(1)}"),
            "type_length": el.get(2),
            "converted_type": el.get(6),
            "scale": el.get(7),
            "precision": el.get(8),
            "max_def_level": max_def,
            "max_rep_level": max_rep,
            "rep_def_level": rep_defs[-1] if rep_defs else 0,
            "rep_def_levels": list(rep_defs),
        })

    # root element: consume it, then its children with empty path
    root = elements[0]
    idx = 1
    n_root = root.get(5) or 0
    if not isinstance(n_root, int) or isinstance(n_root, bool) \
            or n_root < 0:
        raise ValueError("parquet schema: bad root child count")
    for _ in range(n_root):
        walk((), 0, 0, (), 1)
    if idx != len(elements):
        raise ValueError("parquet schema element count mismatch")
    return leaves


def _list(v):
    """Hostile-footer guard: the thrift walk is generic, so corrupted
    files can put ints where lists/structs belong — interpretation
    must type-check and raise ValueError, never TypeError."""
    if v is None:
        return []
    if not isinstance(v, list):
        raise ValueError("parquet footer: expected a list field")
    return v


def _struct(v):
    if not isinstance(v, dict):
        raise ValueError("parquet footer: expected a struct field")
    return v


def parse_footer(data: bytes) -> dict:
    """Full parquet file bytes -> {version, num_rows, created_by,
    n_schema_elements, row_groups: [{num_rows, total_byte_size,
    columns: [{path, type, codec, num_values,
    total_compressed_size, total_uncompressed_size,
    data_page_offset, dictionary_page_offset, file_offset}]}]}."""
    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("not a parquet file (PAR1 magic missing)")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    if flen + 8 > len(data):
        raise ValueError("parquet footer length overruns file")
    footer = data[len(data) - 8 - flen:len(data) - 8]
    fm = _Reader(footer).struct()
    row_groups = []
    for rg in _list(fm.get(4)):
        rg = _struct(rg)
        cols = []
        for cc in _list(rg.get(1)):
            cc = _struct(cc)
            md = _struct(cc.get(3, {}))
            path_parts = _list(md.get(3))
            if not all(isinstance(p, (bytes, bytearray))
                       for p in path_parts):
                raise ValueError("parquet footer: bad path element")
            ptype_id, codec_id = md.get(1), md.get(4)
            if not (ptype_id is None or isinstance(ptype_id, int)) \
                    or not (codec_id is None
                            or isinstance(codec_id, int)):
                raise ValueError("parquet footer: bad type/codec id")
            cols.append({
                "path": ".".join(
                    p.decode("utf-8", "replace")
                    for p in path_parts),
                "type": PHYSICAL_TYPE.get(ptype_id, f"T{ptype_id}"),
                "codec": CODEC.get(codec_id, f"C{codec_id}"),
                "num_values": md.get(5),
                "total_uncompressed_size": md.get(6),
                "total_compressed_size": md.get(7),
                "data_page_offset": md.get(9),
                "dictionary_page_offset": md.get(11),
                "file_offset": cc.get(2),
                "bloom_filter_offset": md.get(14),
                "bloom_filter_length": md.get(15),
                "offset_index_offset": cc.get(4),
                "offset_index_length": cc.get(5),
                "column_index_offset": cc.get(6),
                "column_index_length": cc.get(7),
                # Statistics (field 12): min_value/max_value are the
                # well-ordered v2 fields (5/6); null_count field 3
                "statistics": {
                    "min_value": (bytes(md[12][6]) if isinstance(
                        md[12].get(6), (bytes, bytearray))
                        else None),
                    "max_value": (bytes(md[12][5]) if isinstance(
                        md[12].get(5), (bytes, bytearray))
                        else None),
                    "null_count": md[12].get(3),
                } if isinstance(md.get(12), dict) else None,
            })
        row_groups.append({
            "columns": cols,
            "total_byte_size": rg.get(2),
            "num_rows": rg.get(3),
        })
    created_by = fm.get(6)
    return {
        "version": fm.get(1),
        "num_rows": fm.get(3),
        "created_by": (created_by.decode("utf-8", "replace")
                       if isinstance(created_by, bytes) else None),
        "n_schema_elements": len(_list(fm.get(2))),
        "schema_leaves": schema_leaves(_list(fm.get(2))),
        "row_groups": row_groups,
    }


def read_page_index(data: bytes, column: dict) -> dict | None:
    """ColumnIndex + OffsetIndex for one column chunk (parquet.thrift
    ColumnChunk fields 4-7) -> {null_pages, min_values, max_values,
    null_counts, page_locations: [(offset, compressed_size,
    first_row_index)]}; None when the writer emitted no page index.
    These are the page-skipping structures a scan uses to decode
    only pages whose [min, max] can match a predicate."""
    ci_off, ci_len = column.get("column_index_offset"), \
        column.get("column_index_length")
    oi_off, oi_len = column.get("offset_index_offset"), \
        column.get("offset_index_length")
    if ci_off is None or oi_off is None:
        return None
    # offset without length is hostile input, not "no index" — the
    # ValueError contract, never a TypeError from a None slice bound
    if not all(isinstance(v, int) for v in
               (ci_off, ci_len, oi_off, oi_len)):
        raise ValueError("page index: offset/length must be ints")
    if ci_off + ci_len > len(data) or oi_off + oi_len > len(data):
        raise ValueError("page index overruns file")
    ci = _Reader(data[ci_off:ci_off + ci_len]).struct()
    oi = _Reader(data[oi_off:oi_off + oi_len]).struct()
    locs = []
    for pl in _list(oi.get(1)):
        pl = _struct(pl)
        locs.append((pl.get(1), pl.get(2), pl.get(3)))
    if not all(isinstance(v, (bytes, bytearray))
               for v in _list(ci.get(2)) + _list(ci.get(3))):
        raise ValueError("page index: bad min/max value")
    return {
        "null_pages": [bool(b) for b in _list(ci.get(1))],
        "min_values": [bytes(v) for v in _list(ci.get(2))],
        "max_values": [bytes(v) for v in _list(ci.get(3))],
        "boundary_order": ci.get(4),
        "null_counts": ci.get(5),
        "page_locations": locs,
    }
