"""Parquet WRITER from scratch — the engine emits the lake format too.

The read side (parquet_meta/parquet_data) proves the engine
understands storage bytes; this is the inverse capability: writing
valid parquet with no Arrow/Spark in the loop, verified by the
REFERENCE readers (pyarrow's C++ and DuckDB both read these files
back value-exact in tests/test_parquet_write.py).  From the PUBLIC
parquet-format spec:

* Thrift COMPACT protocol writer (field-header deltas, zigzag
  varints, length-prefixed binary, short/long list headers) — the
  mirror of the reader in parquet_meta;
* file layout — ``PAR1`` magic, column chunks of v1 data pages,
  footer FileMetaData + 4-byte length + ``PAR1``;
* pages — PLAIN encoding for INT64 / DOUBLE / BYTE_ARRAY (utf-8
  strings) / BOOLEAN (bit-packed LSB-first), definition levels as
  real RLE runs (bit width 1) behind the 4-byte length prefix,
  optional columns with nulls;
* SNAPPY page compression through this repo's own compressor.

Scope: flat schemas, one row group, v1 pages — the shape a shard
writer emits; the reader side handles everything else.
"""

from __future__ import annotations

import struct

from .snappy import snappy_compress_block

MAX_CELLS = 1 << 26

_CT_I32 = 5
_CT_I64 = 6
_CT_BINARY = 8
_CT_LIST = 9
_CT_STRUCT = 12

#: physical type ids (parquet.thrift Type); STRING = BYTE_ARRAY +
#: the UTF8 converted-type annotation readers use to give back text
_TYPES = {"BOOLEAN": 0, "INT64": 2, "DOUBLE": 5, "BYTE_ARRAY": 6,
          "STRING": 6}


class _W:
    """Thrift compact writer — the mirror of parquet_meta._Reader."""

    def __init__(self):
        self.out = bytearray()
        self._last = [0]

    def varint(self, v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag(self, v: int) -> None:
        self.varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def field(self, fid: int, ctype: int) -> None:
        delta = fid - self._last[-1]
        if 0 < delta <= 15:
            self.out.append((delta << 4) | ctype)
        else:
            self.out.append(ctype)
            self.zigzag(fid)
        self._last[-1] = fid

    def i32(self, fid: int, v: int) -> None:
        self.field(fid, _CT_I32)
        self.zigzag(v)

    def i64(self, fid: int, v: int) -> None:
        self.field(fid, _CT_I64)
        self.zigzag(v)

    def binary(self, fid: int, raw: bytes) -> None:
        self.field(fid, _CT_BINARY)
        self.varint(len(raw))
        self.out += raw

    def list_header(self, size: int, etype: int) -> None:
        if size < 15:
            self.out.append((size << 4) | etype)
        else:
            self.out.append(0xF0 | etype)
            self.varint(size)

    def begin_struct(self, fid: int | None = None) -> None:
        if fid is not None:
            self.field(fid, _CT_STRUCT)
        self._last.append(0)

    def end_struct(self) -> None:
        self.out.append(0)
        self._last.pop()


#: marker value: the enclosing optional GROUP is null on this row
#: (definition level 0), vs plain None = group present, leaf null
GROUP_NULL = object()


def _rle_def_levels(levels: list[int]) -> bytes:
    """Definition levels as genuine RLE runs (any level <= 255 fits
    the 1-byte run value a bit width <= 8 uses)."""
    out = bytearray()
    i = 0
    n = len(levels)
    while i < n:
        j = i
        while j < n and levels[j] == levels[i]:
            j += 1
        run = j - i
        # RLE run: varint(count << 1) + 1-byte value
        v = run << 1
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        out.append(levels[i])
        i = j
    return bytes(out)


def _plain(values: list, ptype: str) -> bytes:
    if ptype == "INT64":
        return struct.pack(f"<{len(values)}q", *values)
    if ptype == "DOUBLE":
        return struct.pack(f"<{len(values)}d", *values)
    if ptype == "BOOLEAN":
        out = bytearray((len(values) + 7) // 8)
        for i, v in enumerate(values):
            if v:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)
    if ptype in ("BYTE_ARRAY", "STRING"):
        out = bytearray()
        for v in values:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(raw))
            out += raw
        return bytes(out)
    raise ValueError(f"plain encode for {ptype} unsupported")


def _page_header(n_vals: int, un_size: int, c_size: int) -> bytes:
    w = _W()
    w.begin_struct()
    w.i32(1, 0)          # type: DATA_PAGE
    w.i32(2, un_size)
    w.i32(3, c_size)
    w.begin_struct(5)    # DataPageHeader
    w.i32(1, n_vals)
    w.i32(2, 0)          # PLAIN
    w.i32(3, 3)          # def level encoding: RLE
    w.i32(4, 3)          # rep level encoding: RLE
    w.end_struct()
    w.end_struct()
    return bytes(w.out)


def write_parquet(columns: list[tuple[str, str, list]], *,
                  codec: str = "SNAPPY") -> bytes:
    """[(name, ptype, values)] (None = null) -> parquet file bytes.
    ptype in INT64 / DOUBLE / BYTE_ARRAY / BOOLEAN; one row group,
    v1 PLAIN pages, optional columns."""
    if not columns:
        raise ValueError("no columns")
    n_rows = len(columns[0][2])
    if any(len(vals) != n_rows for _, _, vals in columns):
        raise ValueError("ragged columns")
    if n_rows * len(columns) > MAX_CELLS:
        raise ValueError("cell cap exceeded")
    if codec not in ("SNAPPY", "UNCOMPRESSED"):
        raise ValueError(f"writer codec {codec} unsupported")
    out = bytearray(b"PAR1")
    chunks = []
    page_rows = 20_000  # bounded pages, the shape real writers emit
    for name, ptype, vals in columns:
        if ptype not in _TYPES:
            raise ValueError(f"unsupported type {ptype}")
        max_def = 2 if "." in name else 1
        offset = len(out)
        un_total = c_total = 0
        for start in range(0, n_rows, page_rows) or [0]:
            page = vals[start:start + page_rows]
            levels = [
                0 if v is GROUP_NULL
                else (max_def - 1 if v is None else max_def)
                for v in page
            ]
            present = [v for v in page
                       if v is not None and v is not GROUP_NULL]
            lv_blob = _rle_def_levels(levels)
            body = (struct.pack("<I", len(lv_blob)) + lv_blob
                    + _plain(present, ptype))
            payload = (snappy_compress_block(body)
                       if codec == "SNAPPY" else body)
            header = _page_header(len(page), len(body),
                                  len(payload))
            out += header
            out += payload
            un_total += len(header) + len(body)
            c_total += len(header) + len(payload)
        chunks.append({
            "name": name, "ptype": ptype, "offset": offset,
            "n_vals": n_rows,
            "un_size": un_total,
            "c_size": c_total,
        })
    total_bytes = sum(c["c_size"] for c in chunks)

    # schema tree from dotted names: ONE optional-group level
    # ("add.path") — the Delta-checkpoint shape; groups keep first-
    # appearance order
    tops: list[tuple[str, list]] = []
    for name, ptype, _ in columns:
        if "." in name:
            grp, leaf = name.split(".", 1)
            if "." in leaf:
                raise ValueError("only one group level supported")
            if not tops or tops[-1][0] != grp or tops[-1][1] is None:
                if any(t[0] == grp for t in tops):
                    raise ValueError("group columns must be "
                                     "contiguous")
                tops.append((grp, []))
            tops[-1][1].append((leaf, ptype))
        else:
            tops.append((name, None))

    w = _W()
    w.begin_struct()
    w.i32(1, 1)          # version
    n_elements = 1 + len(tops) + sum(
        len(ls) for _, ls in tops if ls is not None)
    w.field(2, _CT_LIST)
    w.list_header(n_elements, _CT_STRUCT)
    w.begin_struct()     # root
    w.binary(4, b"schema")
    w.i32(5, len(tops))
    w.end_struct()
    leaf_types = {n: t for n, t, _ in columns}

    def leaf_element(name: str, ptype: str) -> None:
        w.begin_struct()
        w.i32(1, _TYPES[ptype])
        w.i32(3, 1)      # OPTIONAL
        w.binary(4, name.encode("utf-8"))
        if ptype == "STRING":
            w.i32(6, 0)  # converted_type UTF8
        w.end_struct()

    for top, leaves in tops:
        if leaves is None:
            leaf_element(top, leaf_types[top])
        else:
            w.begin_struct()
            w.i32(3, 1)  # OPTIONAL group
            w.binary(4, top.encode("utf-8"))
            w.i32(5, len(leaves))
            w.end_struct()
            for leaf, ptype in leaves:
                leaf_element(leaf, ptype)
    w.i64(3, n_rows)
    # row groups
    w.field(4, _CT_LIST)
    w.list_header(1, _CT_STRUCT)
    w.begin_struct()
    w.field(1, _CT_LIST)
    w.list_header(len(chunks), _CT_STRUCT)
    for c in chunks:
        w.begin_struct()          # ColumnChunk
        w.i64(2, c["offset"])
        w.begin_struct(3)         # ColumnMetaData
        w.i32(1, _TYPES[c["ptype"]])
        w.field(2, _CT_LIST)      # encodings
        w.list_header(2, _CT_I32)
        w.zigzag(0)               # PLAIN
        w.zigzag(3)               # RLE (levels)
        w.field(3, _CT_LIST)      # path_in_schema
        parts = c["name"].split(".")
        w.list_header(len(parts), _CT_BINARY)
        for part in parts:
            raw = part.encode("utf-8")
            w.varint(len(raw))
            w.out += raw
        w.i32(4, 1 if codec == "SNAPPY" else 0)
        w.i64(5, c["n_vals"])
        w.i64(6, c["un_size"])
        w.i64(7, c["c_size"])
        w.i64(9, c["offset"])
        w.end_struct()
        w.end_struct()
    w.i64(2, total_bytes)
    w.i64(3, n_rows)
    w.end_struct()
    w.binary(6, b"health-monitor-cc-flink-spark parquet writer")
    w.end_struct()
    footer = bytes(w.out)
    out += footer
    out += struct.pack("<I", len(footer))
    out += b"PAR1"
    return bytes(out)
