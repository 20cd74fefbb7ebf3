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
* DICTIONARY encoding on request — PLAIN dictionary page +
  RLE_DICTIONARY data pages whose index runs come from the own
  RLE/bit-packed hybrid encoder (mid-stream groups never padded;
  > 2^16 distinct falls back to PLAIN);
* PAGE INDEX on request — ColumnIndex (per-page min/max/null
  counts/boundary order) + OffsetIndex between the data section and
  the footer, plus chunk-level Statistics, so the own
  read_page_index/selective read_column_chunk (and any reference
  reader) can prune pages of files this writer emits;
* SNAPPY page compression through this repo's own compressor.

Scope: one row group per file — the shape a shard writer emits.
Schemas: flat columns, nested OPTIONAL struct groups at arbitrary
depth via dotted names ("vitals.blood_pressure.systolic", with
GroupNull(k) marking a null at intermediate depth k), 3-level LIST
columns, and LISTSTRUCT list-of-struct columns (sibling fields
sharing one repetition structure); the reader side handles
everything else.
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
_TYPES = {"BOOLEAN": 0, "INT32": 1, "INT64": 2, "DOUBLE": 5,
          "BYTE_ARRAY": 6, "STRING": 6, "FLOAT": 4}
#: list columns: "LIST_<leaf>" writes the standard 3-level shape
#: optional group (LIST) { repeated group list { optional element } }
_LIST_TYPES = {"LIST_FLOAT": "FLOAT", "LIST_INT64": "INT64",
               "LIST_DOUBLE": "DOUBLE", "LIST_STRING": "STRING"}
#: list-of-struct leaves: "LISTSTRUCT_<leaf>" with name "top.field"
#: writes optional group top (LIST) { repeated group list {
#: required group element { optional field ... } } } — sibling
#: fields of the same top share one repetition structure and must
#: be passed as contiguous columns with aligned row shapes
_LISTSTRUCT_TYPES = {"LISTSTRUCT_FLOAT": "FLOAT",
                     "LISTSTRUCT_INT64": "INT64",
                     "LISTSTRUCT_DOUBLE": "DOUBLE",
                     "LISTSTRUCT_STRING": "STRING"}
#: map columns: "MAP_<K>_<V>" writes the standard 3-level shape
#: optional group (MAP) { repeated group key_value {
#: required key; optional value } } — rows are dicts or (k, v) pair
#: lists (None = null map, {} = empty map); keys must be non-null.
#: Internally the column expands into two leaf chunks sharing one
#: repetition structure ("MAPKEY_<K>" / "MAPVALUE_<V>").
_MAP_KEY_KINDS = ("STRING", "INT64")
_MAP_VALUE_KINDS = ("INT64", "DOUBLE", "STRING", "FLOAT")
_MAP_TYPES = {f"MAP_{k}_{v}": (k, v)
              for k in _MAP_KEY_KINDS for v in _MAP_VALUE_KINDS}
_MAPKEY_TYPES = {f"MAPKEY_{k}": k for k in _MAP_KEY_KINDS}
_MAPVALUE_TYPES = {f"MAPVALUE_{v}": v for v in _MAP_VALUE_KINDS}


import re as _re

#: INT64-backed LOGICAL types: TIMESTAMP_MICROS (epoch-micros ints,
#: adjusted to UTC) and DECIMAL(p,s) with p <= 18 (unscaled ints) —
#: annotated with both ConvertedType and the modern LogicalType
#: struct so old and new readers agree
_DECIMAL_RE = _re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def _logical_of(ptype: str) -> dict | None:
    if ptype == "TIMESTAMP_MICROS":
        return {"kind": "timestamp", "converted": 10}
    if ptype == "DATE":
        # INT32 days since epoch; ConvertedType DATE + LogicalType
        return {"kind": "date", "converted": 6}
    m = _DECIMAL_RE.match(ptype)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if not 1 <= p <= 18 or not 0 <= s <= p:
            raise ValueError(f"unsupported decimal {ptype}")
        return {"kind": "decimal", "converted": 5,
                "precision": p, "scale": s}
    return None


def _leaf_of(ptype: str) -> str:
    logical = _logical_of(ptype)
    if logical is not None:
        return "INT32" if logical["kind"] == "date" else "INT64"
    return _LIST_TYPES.get(ptype) or _LISTSTRUCT_TYPES.get(ptype) \
        or _MAPKEY_TYPES.get(ptype) or _MAPVALUE_TYPES.get(ptype) \
        or ptype


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

    def boolean(self, fid: int, v: bool) -> None:
        self.field(fid, 1 if v else 2)  # value rides the type nibble

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


class GroupNull:
    """Null at an INTERMEDIATE enclosing group of a nested struct
    path: for a leaf ``a.b.c`` (max def 3), ``GroupNull(1)`` means
    ``a`` present but ``a.b`` null (definition level 1); the module
    singleton GROUP_NULL stays the level-0 shorthand."""

    __slots__ = ("level",)

    def __init__(self, level: int):
        if not isinstance(level, int) or level < 0:
            raise ValueError("GroupNull level must be >= 0")
        self.level = level


def _def_of(v, max_def: int) -> int:
    if v is GROUP_NULL:
        return 0
    if isinstance(v, GroupNull):
        if v.level > max_def - 2:
            raise ValueError(
                f"GroupNull({v.level}) exceeds group depth "
                f"{max_def - 1}")
        return v.level
    return max_def - 1 if v is None else max_def


def _is_null_marker(v) -> bool:
    return v is None or v is GROUP_NULL or isinstance(v, GroupNull)


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


def _rle_hybrid(values: list[int], bit_width: int) -> bytes:
    """RLE/bit-packed hybrid (spec Encodings, no length prefix):
    runs of >= 8 identical values become RLE runs (varint(count<<1)
    + fixed-width LE value); everything else accumulates into
    bit-packed groups of 8 (varint((groups<<1)|1) + packed bits,
    LSB-first) — the same two run forms read_rle_hybrid decodes."""
    out = bytearray()
    byte_w = max(1, (bit_width + 7) // 8)

    def varint(v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    pend: list[int] = []

    def flush_packed() -> None:
        if not pend:
            return
        while len(pend) % 8:
            pend.append(0)
        groups = len(pend) // 8
        varint((groups << 1) | 1)
        acc = 0
        for i, v in enumerate(pend):
            acc |= v << (i * bit_width)
        out.extend(acc.to_bytes(groups * bit_width, "little"))
        pend.clear()

    i, n = 0, len(values)
    while i < n:
        j = i
        while j < n and values[j] == values[i]:
            j += 1
        run = j - i
        # zero-padding a bit-packed group is only legal at stream
        # end (the decoder reads groups*8 REAL values mid-stream),
        # so absorb enough of a run to close the open group first
        fill = -len(pend) % 8
        if pend and run > fill + 7:
            pend.extend([values[i]] * fill)
            flush_packed()
            run -= fill
        if not pend and run >= 8:
            varint(run << 1)
            out.extend(values[i].to_bytes(byte_w, "little"))
        else:
            pend.extend([values[i]] * run)
        i = j
    flush_packed()
    return bytes(out)


def _stat_bytes(v, ptype: str) -> bytes:
    """One value -> the ColumnIndex/Statistics binary encoding of
    its physical type (plain little-endian; strings raw utf-8)."""
    if ptype == "INT64":
        return struct.pack("<q", v)
    if ptype == "INT32":
        return struct.pack("<i", v)
    if ptype == "DOUBLE":
        return struct.pack("<d", v)
    if ptype == "FLOAT":
        return struct.pack("<f", v)
    if ptype == "BOOLEAN":
        return b"\x01" if v else b"\x00"
    return v.encode("utf-8") if isinstance(v, str) else bytes(v)


def _plain(values: list, ptype: str) -> bytes:
    if ptype == "INT64":
        return struct.pack(f"<{len(values)}q", *values)
    if ptype == "INT32":
        return struct.pack(f"<{len(values)}i", *values)
    if ptype == "DOUBLE":
        return struct.pack(f"<{len(values)}d", *values)
    if ptype == "BOOLEAN":
        out = bytearray((len(values) + 7) // 8)
        for i, v in enumerate(values):
            if v:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)
    if ptype == "FLOAT":
        return struct.pack(f"<{len(values)}f", *values)
    if ptype in ("BYTE_ARRAY", "STRING"):
        out = bytearray()
        for v in values:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(raw))
            out += raw
        return bytes(out)
    raise ValueError(f"plain encode for {ptype} unsupported")


def _byte_stream_split_enc(values: list, ptype: str) -> bytes:
    """BYTE_STREAM_SPLIT (Encodings.md): the k-th byte of every
    value's little-endian representation forms the k-th stream —
    the write-side inverse of parquet_data._byte_stream_split."""
    width = 4 if ptype == "FLOAT" else 8
    raw = _plain(values, ptype)
    return b"".join(raw[k::width] for k in range(width))


def _delta_binary_packed_enc(values: list[int]) -> bytes:
    """DELTA_BINARY_PACKED (Encodings.md): block 128, 4 miniblocks
    of 32; header = block size / miniblock count / total count /
    zigzag first value; per block a zigzag min-delta, 4 bit widths,
    and LSB-first packed (delta - min_delta) miniblocks; trailing
    slots of a partial block pad with zeros at the declared width."""
    out = bytearray()

    def uv(v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def zz(v: int) -> None:
        uv((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def wrap64(v: int) -> int:
        # two's-complement 64-bit wrap-around (Encodings.md: "the
        # deltas are computed with wrapping arithmetic"; parquet-mr
        # and arrow both subtract in native int64) — without it,
        # values spanning more than 2^63 produce miniblock widths
        # > 64, which pyarrow and DuckDB reject outright (ADVICE r14)
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    uv(128)
    uv(4)
    uv(len(values))
    if not values:
        zz(0)
        return bytes(out)
    zz(values[0])
    deltas = [wrap64(b - a) for a, b in zip(values, values[1:])]
    for bs in range(0, len(deltas), 128):
        block = deltas[bs:bs + 128]
        mind = min(block)
        zz(mind)
        # offsets are the UNSIGNED 64-bit wrap of (delta - min_delta);
        # decoders rebuild each value as prev + min_delta + offset in
        # wrapping int64 arithmetic
        offs = [(d - mind) & ((1 << 64) - 1) for d in block]
        offs += [0] * (128 - len(offs))
        widths = []
        for mb in range(4):
            chunk = offs[mb * 32:(mb + 1) * 32]
            widths.append(max((v.bit_length() for v in chunk),
                              default=0))
        out.extend(widths)
        for mb in range(4):
            w = widths[mb]
            if w == 0:
                continue
            chunk = offs[mb * 32:(mb + 1) * 32]
            acc = 0
            for i, v in enumerate(chunk):
                acc |= v << (i * w)
            out += acc.to_bytes(32 * w // 8, "little")
    return bytes(out)


def _delta_length_byte_array_enc(values: list) -> bytes:
    """DELTA_LENGTH_BYTE_ARRAY: DELTA_BINARY_PACKED lengths, then
    the concatenated bytes."""
    raws = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
            for v in values]
    return (_delta_binary_packed_enc([len(r) for r in raws])
            + b"".join(raws))


#: writable alternative encodings: name -> (encoding id, allowed
#: physical types)
_ALT_ENCODINGS = {
    "BYTE_STREAM_SPLIT": (9, ("FLOAT", "DOUBLE")),
    "DELTA_BINARY_PACKED": (5, ("INT64",)),
    "DELTA_LENGTH_BYTE_ARRAY": (6, ("BYTE_ARRAY", "STRING")),
}


def _compress_page(body: bytes, codec: str) -> bytes:
    if codec == "SNAPPY":
        return snappy_compress_block(body)
    if codec == "ZSTD":
        from .zstd import zstd_compress

        return zstd_compress(body, checksum=False)
    return body


def _page_header(n_vals: int, un_size: int, c_size: int,
                 encoding: int = 0) -> bytes:
    w = _W()
    w.begin_struct()
    w.i32(1, 0)          # type: DATA_PAGE
    w.i32(2, un_size)
    w.i32(3, c_size)
    w.begin_struct(5)    # DataPageHeader
    w.i32(1, n_vals)
    w.i32(2, encoding)   # PLAIN or RLE_DICTIONARY
    w.i32(3, 3)          # def level encoding: RLE
    w.i32(4, 3)          # rep level encoding: RLE
    w.end_struct()
    w.end_struct()
    return bytes(w.out)


def _page_header_v2(n_slots: int, n_nulls: int, n_rows: int,
                    un_size: int, c_size: int, encoding: int,
                    dl_len: int, rl_len: int,
                    is_compressed: bool) -> bytes:
    """DataPageHeaderV2 (parquet.thrift field 8): levels ride
    OUTSIDE the compressed region with explicit byte lengths."""
    w = _W()
    w.begin_struct()
    w.i32(1, 3)          # type: DATA_PAGE_V2
    w.i32(2, un_size)
    w.i32(3, c_size)
    w.begin_struct(8)
    w.i32(1, n_slots)
    w.i32(2, n_nulls)
    w.i32(3, n_rows)
    w.i32(4, encoding)
    w.i32(5, dl_len)
    w.i32(6, rl_len)
    w.boolean(7, is_compressed)
    w.end_struct()
    w.end_struct()
    return bytes(w.out)


def _dict_page_header(n_dict: int, un_size: int,
                      c_size: int) -> bytes:
    w = _W()
    w.begin_struct()
    w.i32(1, 2)          # type: DICTIONARY_PAGE
    w.i32(2, un_size)
    w.i32(3, c_size)
    w.begin_struct(7)    # DictionaryPageHeader
    w.i32(1, n_dict)
    w.i32(2, 0)          # values PLAIN-encoded
    w.end_struct()
    w.end_struct()
    return bytes(w.out)


def _column_index(pages: list[dict], ptype: str) -> bytes:
    """Per-page stats -> ColumnIndex thrift (parquet.thrift: 1
    null_pages, 2 min_values, 3 max_values, 4 boundary_order,
    5 null_counts).  Null pages carry empty min/max per spec."""
    w = _W()
    w.begin_struct()
    w.field(1, _CT_LIST)
    w.list_header(len(pages), 1)  # bool elems: 1 true / 2 false
    for p in pages:
        w.out.append(1 if p["null_page"] else 2)
    mins = [b"" if p["null_page"] else _stat_bytes(p["min"], ptype)
            for p in pages]
    maxs = [b"" if p["null_page"] else _stat_bytes(p["max"], ptype)
            for p in pages]
    for fid, vals in ((2, mins), (3, maxs)):
        w.field(fid, _CT_LIST)
        w.list_header(len(vals), _CT_BINARY)
        for raw in vals:
            w.varint(len(raw))
            w.out += raw
    # boundary order compares TYPED values (LE int bytes don't
    # byte-compare in value order)
    live = [(p["min"], p["max"]) for p in pages
            if not p["null_page"]]
    if all(a[0] <= b[0] and a[1] <= b[1]
           for a, b in zip(live, live[1:])):
        order = 1  # ASCENDING
    elif all(a[0] >= b[0] and a[1] >= b[1]
             for a, b in zip(live, live[1:])):
        order = 2  # DESCENDING
    else:
        order = 0  # UNORDERED
    w.i32(4, order)
    w.field(5, _CT_LIST)
    w.list_header(len(pages), _CT_I64)
    for p in pages:
        w.zigzag(p["null_count"])
    w.end_struct()
    return bytes(w.out)


def _offset_index(pages: list[dict]) -> bytes:
    """Per-page locations -> OffsetIndex thrift (1 page_locations of
    PageLocation{1 offset, 2 compressed_page_size,
    3 first_row_index})."""
    w = _W()
    w.begin_struct()
    w.field(1, _CT_LIST)
    w.list_header(len(pages), _CT_STRUCT)
    for p in pages:
        w.begin_struct()
        w.i64(1, p["offset"])
        w.i32(2, p["compressed_size"])
        w.i64(3, p["first_row"])
        w.end_struct()
    w.end_struct()
    return bytes(w.out)


def _schema_trie(columns: list[tuple[str, str, list]]) -> dict:
    """Dotted names -> nested schema trie.  Enforces the positional
    contract: a group's columns must be contiguous in the input so
    the trie's DFS order equals the row-group chunk order."""
    root: dict = {"kind": "root", "children": {}}
    prev_path: tuple = ()
    for name, ptype, _ in columns:
        if ptype in _LIST_TYPES:
            # dotted names nest the LIST under optional struct
            # groups, same positional contract as scalar leaves
            # (the shape protocol.readerFeatures in Delta
            # checkpoints needs)
            parts = name.split(".")
            cur = root
            for depth, part in enumerate(parts[:-1]):
                nxt = cur["children"].get(part)
                if nxt is None:
                    nxt = {"kind": "struct", "children": {}}
                    cur["children"][part] = nxt
                elif nxt["kind"] != "struct" \
                        or prev_path[:depth + 1] != tuple(
                            parts[:depth + 1]):
                    raise ValueError(
                        "group columns must be contiguous")
                cur = nxt
            leaf = parts[-1]
            if leaf in cur["children"]:
                raise ValueError(f"duplicate column {name}")
            cur["children"][leaf] = {
                "kind": "list", "ptype": _LIST_TYPES[ptype]}
            prev_path = tuple(parts[:-1])
            continue
        if ptype in _MAPKEY_TYPES or ptype in _MAPVALUE_TYPES:
            # the expanded chunk names end ".key"/".value"; the MAP
            # group is everything before that, and (like LIST since
            # r16) may itself sit under optional struct groups
            mapname = name.rsplit(".", 1)[0]
            parts = mapname.split(".")
            cur = root
            for depth, part in enumerate(parts[:-1]):
                nxt = cur["children"].get(part)
                if nxt is None:
                    if ptype in _MAPVALUE_TYPES:
                        raise ValueError(
                            "MAP key/value chunks must be "
                            "contiguous")
                    nxt = {"kind": "struct", "children": {}}
                    cur["children"][part] = nxt
                elif nxt["kind"] != "struct" \
                        or prev_path[:depth + 1] != tuple(
                            parts[:depth + 1]):
                    raise ValueError(
                        "group columns must be contiguous")
                cur = nxt
            top = parts[-1]
            node = cur["children"].get(top)
            if ptype in _MAPKEY_TYPES:
                if node is not None:
                    raise ValueError(f"duplicate column {mapname}")
                cur["children"][top] = {
                    "kind": "map", "ktype": _MAPKEY_TYPES[ptype],
                    "vtype": None}
                prev_path = tuple(parts) + ("#map",)
            else:
                if node is None or node.get("kind") != "map" \
                        or node.get("vtype") is not None \
                        or prev_path != tuple(parts) + ("#map",):
                    raise ValueError(
                        "MAP key/value chunks must be contiguous")
                node["vtype"] = _MAPVALUE_TYPES[ptype]
                prev_path = tuple(parts[:-1])
            continue
        if ptype in _LISTSTRUCT_TYPES:
            top, field = name.split(".", 1)
            node = root["children"].get(top)
            if node is None:
                node = {"kind": "liststruct", "children": {}}
                root["children"][top] = node
            elif node["kind"] != "liststruct" \
                    or prev_path != (top,):
                raise ValueError("group columns must be contiguous")
            if field in node["children"]:
                raise ValueError(f"duplicate column {name}")
            node["children"][field] = {
                "kind": "leaf", "ptype": _LISTSTRUCT_TYPES[ptype]}
            prev_path = (top,)
            continue
        parts = name.split(".")
        cur = root
        for depth, part in enumerate(parts[:-1]):
            nxt = cur["children"].get(part)
            if nxt is None:
                nxt = {"kind": "struct", "children": {}}
                cur["children"][part] = nxt
            elif nxt["kind"] != "struct" \
                    or prev_path[:depth + 1] != tuple(
                        parts[:depth + 1]):
                raise ValueError("group columns must be contiguous")
            cur = nxt
        leaf = parts[-1]
        if leaf in cur["children"]:
            raise ValueError(f"duplicate column {name}")
        cur["children"][leaf] = {"kind": "leaf", "ptype": ptype}
        prev_path = tuple(parts[:-1])
    return root


def _check_liststruct_alignment(
        columns: list[tuple[str, str, list]]) -> None:
    """Sibling LISTSTRUCT fields share ONE repetition structure:
    per-row null-ness and entry counts must agree across fields."""
    shapes: dict[str, list] = {}
    for name, ptype, vals in columns:
        if ptype not in _LISTSTRUCT_TYPES:
            continue
        top = name.split(".", 1)[0]
        shape = [None if row is None else len(row) for row in vals]
        if top in shapes and shapes[top] != shape:
            raise ValueError(
                f"LISTSTRUCT fields of '{top}' have misaligned row "
                "shapes")
        shapes.setdefault(top, shape)


def write_parquet(columns: list[tuple[str, str, list]], *,
                  codec: str = "SNAPPY",
                  dictionary: bool = False,
                  page_index: bool = False,
                  bloom_filter: bool = False,
                  data_page_version: int = 1,
                  page_rows: int = 20_000,
                  row_group_rows: int | None = None,
                  column_encodings: dict[str, str] | None = None
                  ) -> bytes:
    """[(name, ptype, values)] (None = null) -> parquet file bytes.
    ptype in INT64 / DOUBLE / BYTE_ARRAY / BOOLEAN; optional
    columns; ``row_group_rows`` splits the file into MULTIPLE row
    groups (default one) — each with its own column chunks,
    Statistics, dictionary, Bloom filter and page index, so
    chunk-level min/max pruning and bloom-gated row-group skipping
    work inside a single file, not just across files.

    ``dictionary`` — eligible flat columns (non-BOOLEAN, <= 2^16
    distinct present values) get a PLAIN dictionary page plus
    RLE_DICTIONARY data pages (the own _rle_hybrid index runs);
    others keep PLAIN.  ``page_index`` — flat columns additionally
    emit ColumnIndex/OffsetIndex after the data section plus chunk
    Statistics, making the file prunable by read_page_index /
    selective read_column_chunk (and any reference reader).
    ``bloom_filter`` — flat non-BOOLEAN columns get a
    split-block Bloom filter (operators/parquet_bloom) after the
    data section, referenced from ColumnMetaData fields 14/15 for
    point-lookup row-group skipping.  ``page_rows`` bounds page size
    in rows."""
    if not columns:
        raise ValueError("no columns")
    if page_rows < 1:
        raise ValueError("page_rows must be positive")
    # MAP columns expand into two leaf chunks sharing one repetition
    # structure (required key, optional value) before anything else
    # sees them — dict rows iterate in insertion order, so the file
    # is deterministic for a fixed input
    if any(t in _MAP_TYPES for _, t, _ in columns):
        expanded = []
        for name, ptype, vals in columns:
            if ptype not in _MAP_TYPES:
                expanded.append((name, ptype, vals))
                continue
            kt, vt = _MAP_TYPES[ptype]
            keys: list = []
            vlists: list = []
            for row in vals:
                if _is_null_marker(row):
                    # None / GROUP_NULL / GroupNull(k) pass through
                    # to both leaf chunks (null map or null
                    # ancestor struct)
                    keys.append(row)
                    vlists.append(row)
                    continue
                pairs = (list(row.items()) if isinstance(row, dict)
                         else list(row))
                try:
                    keys.append([k for k, _ in pairs])
                    vlists.append([v for _, v in pairs])
                except (TypeError, ValueError) as exc:
                    raise ValueError(
                        "MAP row must be a dict or (key, value) "
                        "pairs") from exc
            expanded.append((name + ".key", "MAPKEY_" + kt, keys))
            expanded.append((name + ".value", "MAPVALUE_" + vt,
                             vlists))
        columns = expanded
    n_rows = len(columns[0][2])
    if any(len(vals) != n_rows for _, _, vals in columns):
        raise ValueError("ragged columns")
    if n_rows * len(columns) > MAX_CELLS:
        raise ValueError("cell cap exceeded")
    if codec not in ("SNAPPY", "ZSTD", "UNCOMPRESSED"):
        raise ValueError(f"writer codec {codec} unsupported")
    if data_page_version not in (1, 2):
        raise ValueError("data_page_version must be 1 or 2")
    if row_group_rows is not None and row_group_rows < 1:
        raise ValueError("row_group_rows must be positive")
    # alternative value encodings (Encodings.md), per column name:
    # BYTE_STREAM_SPLIT (FLOAT/DOUBLE), DELTA_BINARY_PACKED
    # (INT64), DELTA_LENGTH_BYTE_ARRAY (strings/binary) — the
    # write-side inverses of the own readers, verified by pyarrow
    column_encodings = column_encodings or {}
    ptypes = {n: t for n, t, _ in columns}
    for cname, ename in column_encodings.items():
        if cname not in ptypes:
            raise ValueError(f"unknown encoded column {cname}")
        if ename not in _ALT_ENCODINGS:
            raise ValueError(f"unsupported encoding {ename}")
        if ptypes[cname] in _LIST_TYPES \
                or ptypes[cname] in _LISTSTRUCT_TYPES:
            raise ValueError("alt encodings are for flat columns")
        if _leaf_of(ptypes[cname]) not in _ALT_ENCODINGS[ename][1]:
            raise ValueError(
                f"{ename} does not apply to {ptypes[cname]}")
    _check_liststruct_alignment(columns)
    for name, ptype, _ in columns:
        if ptype not in _TYPES and ptype not in _LIST_TYPES \
                and ptype not in _LISTSTRUCT_TYPES \
                and ptype not in _MAPKEY_TYPES \
                and ptype not in _MAPVALUE_TYPES \
                and _logical_of(ptype) is None:
            raise ValueError(f"unsupported type {ptype}")
        if ptype in _LISTSTRUCT_TYPES and name.count(".") != 1:
            raise ValueError("LISTSTRUCT columns need a 'top.field' "
                             "name")
    rg = row_group_rows or max(n_rows, 1)
    bounds = [(s, min(s + rg, n_rows))
              for s in range(0, n_rows, rg)] or [(0, 0)]
    out = bytearray(b"PAR1")
    groups: list[list[dict]] = []
    for ga, gb in bounds:
      chunks: list[dict] = []
      groups.append(chunks)
      for name, ptype, allvals in columns:
        vals = allvals[ga:gb]
        gn = gb - ga
        is_map_key = ptype in _MAPKEY_TYPES
        is_map_value = ptype in _MAPVALUE_TYPES
        is_list = ptype in _LIST_TYPES or ptype in _LISTSTRUCT_TYPES \
            or is_map_key or is_map_value
        leaf_type = _leaf_of(ptype)
        # nested struct paths at arbitrary depth: every dotted
        # segment is an optional group (+1 def level each), the leaf
        # is optional too; lists keep the fixed 3-level ladder; map
        # keys are REQUIRED inside the repeated group (max def 2)
        if is_map_key:
            # ancestors of the MAP group (name ends ".key") + the
            # optional map group + the repeated key_value; keys are
            # REQUIRED so they add no level
            max_def = (name.count(".") - 1) + 2
        elif is_map_value:
            max_def = (name.count(".") - 1) + 3
        elif ptype in _LIST_TYPES:
            # each ancestor struct adds one def level on top of the
            # 3-level ladder (optional LIST group / repeated list /
            # optional element)
            max_def = name.count(".") + 3
        elif is_list:
            max_def = 3
        else:
            max_def = name.count(".") + 1
        offset = len(out)
        un_total = c_total = 0
        total_slots = 0
        # dictionary eligibility: flat, non-boolean, index fits 16
        # bits (a real writer's fallback-to-plain threshold)
        alt = column_encodings.get(name)
        dict_vals: list | None = None
        if dictionary and not is_list and leaf_type != "BOOLEAN" \
                and alt is None:
            uniq: dict = {}
            for v in vals:
                if not _is_null_marker(v) and v not in uniq:
                    uniq[v] = len(uniq)
            if 0 < len(uniq) <= 1 << 16:
                dict_vals = list(uniq)
        dict_offset = None
        if dict_vals is not None:
            body = _plain(dict_vals, leaf_type)
            payload = _compress_page(body, codec)
            header = _dict_page_header(len(dict_vals), len(body),
                                       len(payload))
            dict_offset = offset
            out += header
            out += payload
            un_total += len(header) + len(body)
            c_total += len(header) + len(payload)
        data_page_offset = len(out)
        pages: list[dict] = []
        for start in range(0, gn, page_rows) or [0]:
            page = vals[start:start + page_rows]
            if is_list:
                # base = number of ancestor struct groups; the
                # ladder sits on top: null list/map -> base, empty
                # -> base+1, null element -> max_def-1, present ->
                # max_def.  GroupNull(k) marks a null ancestor.
                # Map KEYS are required: their ladder tops out one
                # level lower (present -> max_def, no null-element
                # rung), so base = max_def - 2.
                if ptype in _LIST_TYPES:
                    base = max_def - 3
                elif is_map_key:
                    base = max_def - 2
                elif is_map_value:
                    base = max_def - 3
                else:
                    base = 0
                levels: list[int] = []
                reps: list[int] = []
                present = []
                for row in page:
                    if row is GROUP_NULL and base > 0:
                        levels.append(0)
                        reps.append(0)
                    elif isinstance(row, GroupNull) \
                            and row is not GROUP_NULL:
                        if row.level >= base:
                            raise ValueError(
                                f"GroupNull({row.level}) exceeds "
                                f"list ancestor depth {base}")
                        levels.append(row.level)
                        reps.append(0)
                    elif row is None or row is GROUP_NULL:
                        levels.append(base)
                        reps.append(0)
                    elif len(row) == 0:
                        levels.append(base + 1)
                        reps.append(0)
                    else:
                        for k, el in enumerate(row):
                            reps.append(0 if k == 0 else 1)
                            if el is None:
                                if is_map_key:
                                    raise ValueError(
                                        "map keys are required; "
                                        "got a null key")
                                levels.append(max_def - 1)
                            else:
                                levels.append(max_def)
                                present.append(el)
                rep_blob = _rle_def_levels(reps)
                lv_blob = _rle_def_levels(levels)
                values_blob = _plain(present, leaf_type)
                if data_page_version == 2:
                    body = (rep_blob, lv_blob, values_blob)
                else:
                    body = (struct.pack("<I", len(rep_blob))
                            + rep_blob
                            + struct.pack("<I", len(lv_blob))
                            + lv_blob + values_blob)
                n_slots = len(levels)
                n_rows_page = len(page)
                encoding = 0
            else:
                levels = [_def_of(v, max_def) for v in page]
                present = [v for v in page if not _is_null_marker(v)]
                lv_blob = _rle_def_levels(levels)
                if dict_vals is not None:
                    idx = {v: i for i, v in enumerate(dict_vals)}
                    bw = max(1, (len(dict_vals) - 1).bit_length())
                    values_blob = bytes([bw]) + _rle_hybrid(
                        [idx[v] for v in present], bw)
                    encoding = 8  # RLE_DICTIONARY
                elif alt == "BYTE_STREAM_SPLIT":
                    values_blob = _byte_stream_split_enc(
                        present, leaf_type)
                    encoding = 9
                elif alt == "DELTA_BINARY_PACKED":
                    values_blob = _delta_binary_packed_enc(present)
                    encoding = 5
                elif alt == "DELTA_LENGTH_BYTE_ARRAY":
                    values_blob = _delta_length_byte_array_enc(
                        present)
                    encoding = 6
                else:
                    values_blob = _plain(present, leaf_type)
                    encoding = 0
                if data_page_version == 2:
                    body = (b"", lv_blob, values_blob)
                else:
                    body = (struct.pack("<I", len(lv_blob))
                            + lv_blob + values_blob)
                n_slots = len(page)
                n_rows_page = len(page)
            total_slots += n_slots
            if data_page_version == 2:
                rep_blob, lv_blob, values_blob = body
                cvals = _compress_page(values_blob, codec)
                payload = rep_blob + lv_blob + cvals
                un_len = (len(rep_blob) + len(lv_blob)
                          + len(values_blob))
                header = _page_header_v2(
                    n_slots, n_slots - len(present), n_rows_page,
                    un_len, len(payload), encoding,
                    len(lv_blob), len(rep_blob),
                    codec != "UNCOMPRESSED")
                body_len = un_len
            else:
                payload = _compress_page(body, codec)
                header = _page_header(n_slots, len(body),
                                      len(payload),
                                      encoding=encoding)
                body_len = len(body)
            pages.append({
                "offset": len(out),
                "compressed_size": len(header) + len(payload),
                "first_row": start,
                "null_page": not present,
                "min": min(present) if present else None,
                "max": max(present) if present else None,
                "null_count": n_slots - len(present),
            })
            out += header
            out += payload
            un_total += len(header) + body_len
            c_total += len(header) + len(payload)
        chunks.append({
            "name": name, "ptype": ptype, "offset": offset,
            "n_vals": total_slots if is_list else gn,
            "un_size": un_total,
            "c_size": c_total,
            "data_page_offset": data_page_offset,
            "dict_offset": dict_offset,
            "pages": pages if page_index and not is_list else None,
            "bloom": (leaf_type if bloom_filter and not is_list
                      and leaf_type != "BOOLEAN" else None),
            "values": vals,
            "alt_enc": (_ALT_ENCODINGS[alt][0]
                        if alt is not None else None),
        })
    all_chunks = [c for g in groups for c in g]

    # split-block Bloom filters between the data section and the
    # page indexes (explicit offsets; placement is writer's choice);
    # one filter PER ROW-GROUP CHUNK — the row-group-skip granule
    for c in all_chunks:
        if c["bloom"] is None:
            continue
        from .parquet_bloom import SplitBlockBloom, write_bloom_blob

        present = {v for v in c["values"] if not _is_null_marker(v)}
        if not present:
            c["bloom"] = None
            continue
        bf = SplitBlockBloom.sized_for(len(present))
        for v in present:
            bf.insert(v, c["bloom"])
        blob = write_bloom_blob(bf)
        c["bf_off"], c["bf_len"] = len(out), len(blob)
        out += blob

    # page indexes live between the data section and the footer
    # (parquet-format PageIndex layout: all ColumnIndex structs,
    # then all OffsetIndex structs, row-group major)
    for c in all_chunks:
        if c["pages"] is None:
            continue
        blob = _column_index(c["pages"], _leaf_of(c["ptype"]))
        c["ci_off"], c["ci_len"] = len(out), len(blob)
        out += blob
    for c in all_chunks:
        if c["pages"] is None:
            continue
        blob = _offset_index(c["pages"])
        c["oi_off"], c["oi_len"] = len(out), len(blob)
        out += blob

    # schema tree from dotted names at ARBITRARY depth (every
    # dotted segment is an optional group; r13 scope was one level)
    # plus the two repeated shapes: LIST_<t> (3-level standard) and
    # LISTSTRUCT_<t> (repeated list of required element group with
    # optional fields).  Column order must equal the trie's DFS
    # order — readers map row-group chunks to schema leaves
    # positionally — so a group's columns must be contiguous.
    tree = _schema_trie(columns)

    def _count(node: dict) -> int:
        if node["kind"] == "leaf":
            return 1
        if node["kind"] == "struct":
            return 1 + sum(_count(ch)
                           for ch in node["children"].values())
        if node["kind"] == "list":
            return 3  # group + repeated list + element leaf
        if node["kind"] == "map":
            return 4  # group + repeated key_value + key + value
        # liststruct: group + repeated list + element group + fields
        return 3 + len(node["children"])

    w = _W()
    w.begin_struct()
    w.i32(1, 1)          # version
    n_elements = 1 + sum(_count(ch)
                         for ch in tree["children"].values())
    w.field(2, _CT_LIST)
    w.list_header(n_elements, _CT_STRUCT)
    w.begin_struct()     # root
    w.binary(4, b"schema")
    w.i32(5, len(tree["children"]))
    w.end_struct()

    def leaf_element(name: str, ptype: str,
                     repetition: int = 1) -> None:
        logical = _logical_of(ptype)
        w.begin_struct()
        w.i32(1, _TYPES[_leaf_of(ptype)])
        w.i32(3, repetition)
        w.binary(4, name.encode("utf-8"))
        if ptype == "STRING":
            w.i32(6, 0)  # converted_type UTF8
        elif logical is not None:
            w.i32(6, logical["converted"])
            if logical["kind"] == "decimal":
                w.i32(7, logical["scale"])
                w.i32(8, logical["precision"])
                w.begin_struct(10)   # LogicalType
                w.begin_struct(5)    # DECIMAL DecimalType
                w.i32(1, logical["scale"])
                w.i32(2, logical["precision"])
                w.end_struct()
                w.end_struct()
            elif logical["kind"] == "date":
                w.begin_struct(10)   # LogicalType
                w.begin_struct(6)    # DATE (empty struct)
                w.end_struct()
                w.end_struct()
            else:  # timestamp, micros, adjusted to UTC
                w.begin_struct(10)   # LogicalType
                w.begin_struct(8)    # TIMESTAMP TimestampType
                w.boolean(1, True)   # isAdjustedToUTC
                w.begin_struct(2)    # unit: TimeUnit
                w.begin_struct(2)    # MICROS (empty struct)
                w.end_struct()
                w.end_struct()
                w.end_struct()
                w.end_struct()
        w.end_struct()

    def group_element(name: str, n_children: int,
                      repetition: int = 1,
                      converted: int | None = None,
                      logical: int | None = None) -> None:
        w.begin_struct()
        w.i32(3, repetition)
        w.binary(4, name.encode("utf-8"))
        w.i32(5, n_children)
        if converted is not None:
            w.i32(6, converted)
        if logical is not None:
            # LogicalType union: MAP = field 2, LIST = field 3
            # (empty structs)
            w.begin_struct(10)
            w.begin_struct(logical)
            w.end_struct()
            w.end_struct()
        w.end_struct()

    def emit(name: str, node: dict) -> None:
        if node["kind"] == "leaf":
            leaf_element(name, node["ptype"])
        elif node["kind"] == "struct":
            group_element(name, len(node["children"]))
            for child, sub in node["children"].items():
                emit(child, sub)
        elif node["kind"] == "list":
            group_element(name, 1, converted=3)       # LIST
            group_element("list", 1, repetition=2)    # REPEATED
            leaf_element("element", node["ptype"])
        elif node["kind"] == "map":
            if node["vtype"] is None:
                raise ValueError("MAP column missing value chunk")
            # ConvertedType MAP = 1 (NOT 2 = MAP_KEY_VALUE, which
            # readers require to carry two children) + the modern
            # LogicalType MapType
            group_element(name, 1, converted=1, logical=2)
            group_element("key_value", 2, repetition=2)
            leaf_element("key", node["ktype"], repetition=0)
            leaf_element("value", node["vtype"])
        else:  # liststruct
            group_element(name, 1, converted=3)
            group_element("list", 1, repetition=2)
            group_element("element", len(node["children"]),
                          repetition=0)               # REQUIRED
            for field, sub in node["children"].items():
                leaf_element(field, sub["ptype"])

    for top, node in tree["children"].items():
        emit(top, node)
    w.i64(3, n_rows)
    # row groups
    w.field(4, _CT_LIST)
    w.list_header(len(groups), _CT_STRUCT)
    for (ga, gb), chunks in zip(bounds, groups):
      w.begin_struct()
      w.field(1, _CT_LIST)
      w.list_header(len(chunks), _CT_STRUCT)
      for c in chunks:
        w.begin_struct()          # ColumnChunk
        w.i64(2, c["offset"])
        w.begin_struct(3)         # ColumnMetaData
        w.i32(1, _TYPES[_leaf_of(c["ptype"])])
        w.field(2, _CT_LIST)      # encodings
        if c["dict_offset"] is not None:
            encs = [0, 3, 8]
        elif c.get("alt_enc") is not None:
            encs = [c["alt_enc"], 3]
        else:
            encs = [0, 3]
        w.list_header(len(encs), _CT_I32)
        for e in encs:
            w.zigzag(e)           # PLAIN / RLE / RLE_DICTIONARY
        w.field(3, _CT_LIST)      # path_in_schema
        if c["ptype"] in _LIST_TYPES:
            parts = c["name"].split(".") + ["list", "element"]
        elif c["ptype"] in _MAPKEY_TYPES:
            parts = (c["name"].rsplit(".", 1)[0].split(".")
                     + ["key_value", "key"])
        elif c["ptype"] in _MAPVALUE_TYPES:
            parts = (c["name"].rsplit(".", 1)[0].split(".")
                     + ["key_value", "value"])
        elif c["ptype"] in _LISTSTRUCT_TYPES:
            top, field = c["name"].split(".", 1)
            parts = [top, "list", "element", field]
        else:
            parts = c["name"].split(".")
        w.list_header(len(parts), _CT_BINARY)
        for part in parts:
            raw = part.encode("utf-8")
            w.varint(len(raw))
            w.out += raw
        w.i32(4, {"SNAPPY": 1, "ZSTD": 6}.get(codec, 0))
        w.i64(5, c["n_vals"])
        w.i64(6, c["un_size"])
        w.i64(7, c["c_size"])
        w.i64(9, c["data_page_offset"])
        if c["dict_offset"] is not None:
            w.i64(11, c["dict_offset"])
        if c["pages"] is not None:
            live = [p for p in c["pages"] if not p["null_page"]]
            ltype = _leaf_of(c["ptype"])
            w.begin_struct(12)    # Statistics
            w.i64(3, sum(p["null_count"] for p in c["pages"]))
            if live:
                w.binary(5, _stat_bytes(
                    max(p["max"] for p in live), ltype))
                w.binary(6, _stat_bytes(
                    min(p["min"] for p in live), ltype))
            w.end_struct()
        if c.get("bf_off") is not None and c["bloom"] is not None:
            w.i64(14, c["bf_off"])
            w.i32(15, c["bf_len"])
        w.end_struct()            # ColumnMetaData
        if c["pages"] is not None:
            w.i64(4, c["oi_off"])
            w.i32(5, c["oi_len"])
            w.i64(6, c["ci_off"])
            w.i32(7, c["ci_len"])
        w.end_struct()            # ColumnChunk
      w.i64(2, sum(c["c_size"] for c in chunks))
      w.i64(3, gb - ga)
      w.end_struct()              # RowGroup
    w.binary(6, b"health-monitor-cc-flink-spark parquet writer")
    w.end_struct()
    footer = bytes(w.out)
    out += footer
    out += struct.pack("<I", len(footer))
    out += b"PAR1"
    return bytes(out)
