"""ORC WRITER from scratch — the second columnar format the engine
can emit (parquet_write.py is the first).

Valid ORC v1 files with no Arrow/Spark in the write loop, verified by
the REFERENCE readers — Arrow's C++ ORC and Spark's Java ORC both
read these files back value-exact (tests/test_orc_write.py), and the
repo's own stripe reader closes the triangle.  From the PUBLIC ORC
spec + orc_proto.proto:

* protobuf writer (varint / length-delimited fields, packed repeated
  uint32 for Type.subtypes) mirroring the tfrecord walker;
* byte-RLE encoder (runs of 3..130 / literal groups) for PRESENT and
  BOOLEAN bit streams;
* integer RLEv2 writer emitting the DIRECT sub-format (closed-form
  width table, big-endian bit packing, 512-value blocks) — a valid
  subset every reader accepts; signed streams zigzag;
* per-column streams — LONG (DATA), DOUBLE (IEEE LE), STRING
  (DIRECT_V2: DATA concat + LENGTH), BOOLEAN (byte-RLE bits),
  TIMESTAMP (trunc seconds + signed zero-compressed nanos — the
  C++ convention that round-trips pre-1970 fractional instants),
  DECIMAL (signed varints + scale stream, precision/scale in the
  footer type), with PRESENT streams for nullable data;
* SNAPPY chunk framing ((len<<1)|isOriginal 3-byte headers) through
  this repo's own compressor, for streams, stripe footer and footer;
* file layout — "ORC" magic, one stripe, stripe footer, footer,
  postscript, trailing postscript length + "ORC" magic.
"""

from __future__ import annotations

import struct

from .snappy import snappy_compress_block

MAX_CELLS = 1 << 26

_KINDS = {"BOOLEAN": 0, "BYTE": 1, "SHORT": 2, "INT": 3,
          "LONG": 4, "FLOAT": 5, "DOUBLE": 6, "STRING": 7,
          "BINARY": 8, "TIMESTAMP": 9, "DECIMAL": 14, "DATE": 15,
          "VARCHAR": 16, "CHAR": 17}
#: declared-width bounds for the sized integer kinds (a value outside
#: makes the footer type a lie and overflows readers' narrow vectors)
_INT_BOUNDS = {"BYTE": (-(1 << 7), (1 << 7) - 1),
               "SHORT": (-(1 << 15), (1 << 15) - 1),
               "INT": (-(1 << 31), (1 << 31) - 1),
               "DATE": (-(1 << 31), (1 << 31) - 1)}
#: compound type ids (orc_proto Type.Kind); a column's kind spec may
#: be a scalar name above or a nested tuple —
#:   ("STRUCT", [(field_name, kind_spec), ...])   rows are dicts
#:   ("LIST", elem_kind_spec)                     rows are lists
#:   ("MAP", key_kind_spec, value_kind_spec)      rows are dicts /
#:                                                [(k, v), ...] pairs
#:   ("UNION", [kind_spec, ...])                  rows are (tag, v)
#:   ("CHAR", max_len) / ("VARCHAR", max_len)     rows are strings
_COMPOUND = {"LIST": 10, "MAP": 11, "STRUCT": 12, "UNION": 13}
_TS_BASE = 1420070400  # 2015-01-01 UTC, the ORC timestamp epoch
_WIDTH = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
          18, 19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64]


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_varint(fid: int, v: int) -> bytes:
    return _uvarint(fid << 3) + _uvarint(v)


def pb_bytes(fid: int, raw: bytes) -> bytes:
    return _uvarint((fid << 3) | 2) + _uvarint(len(raw)) + raw


def pb_fixed64(fid: int, v: float) -> bytes:
    return _uvarint((fid << 3) | 1) + struct.pack("<d", v)


def pb_sint64(fid: int, v: int) -> bytes:
    return pb_varint(fid, _zigzag_enc(v))


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def byte_rle_encode(data: bytes) -> bytes:
    """The PRESENT/BOOLEAN byte coding: runs of 3..130 same bytes,
    literal groups of 1..128 otherwise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j < n and j - i < 130 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(j - i - 3)
            out.append(data[i])
            i = j
            continue
        # literal group: scan until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(256 - (k - i))
        out += data[i:k]
        i = k
    return bytes(out)


def _direct_block(out: bytearray, block_zz: list[int]) -> None:
    need = max((v.bit_length() for v in block_zz), default=1) or 1
    width = next(w for w in _WIDTH if w >= need)
    code = _WIDTH.index(width)
    n = len(block_zz)
    out.append(0x40 | (code << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    acc = 0
    for v in block_zz:
        acc = (acc << width) | v
    nbits = width * n
    nbytes = (nbits + 7) // 8
    acc <<= nbytes * 8 - nbits
    out += acc.to_bytes(nbytes, "big")


def _append_uvarint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def rlev2_encode(values: list[int], *, signed: bool,
                 mode: str = "auto") -> bytes:
    """RLEv2 integer stream.  ``mode="direct"`` emits DIRECT blocks
    only (the r13 behavior, kept for size-comparison certificates);
    the default picks per-run sub-encodings the own reader and
    the reference readers all decode:

    * SHORT_REPEAT for 3..10 equal values (1-byte header + value);
    * DELTA for >= 4 monotone values (fixed-sign deltas; width
      code 0 when the delta is constant — covers long equal runs
      too, since delta 0 is a fixed delta);
    * DIRECT for everything else, 512-value blocks.
    """
    out = bytearray()

    def zz(v: int) -> int:
        return _zigzag_enc(v) if signed else v

    if mode == "direct":
        vals = [zz(v) for v in values]
        if any(v < 0 for v in vals):
            raise ValueError(
                "unsigned rlev2 write got negative value")
        for i in range(0, len(vals), 512):
            _direct_block(out, vals[i:i + 512])
        return bytes(out)
    if mode != "auto":
        raise ValueError(f"unknown rlev2 mode {mode}")
    if not signed and any(v < 0 for v in values):
        raise ValueError("unsigned rlev2 write got negative value")

    n = len(values)
    i = 0
    lit_start = 0  # pending DIRECT literals [lit_start, i)

    def flush_literals(end: int) -> None:
        for s in range(lit_start, end, 512):
            _direct_block(out, [zz(v)
                                for v in values[s:min(s + 512,
                                                      end)]])

    while i < n:
        # equal run?
        j = i + 1
        while j < n and values[j] == values[i]:
            j += 1
        run = j - i
        if run >= 3:
            flush_literals(i)
            v = values[i]
            if 3 <= run <= 10 and zz(v).bit_length() <= 64:
                vz = zz(v)
                width = max(1, (vz.bit_length() + 7) // 8)
                out.append(((width - 1) << 3) | (run - 3))
                out += vz.to_bytes(width, "big")
            else:
                # DELTA with constant delta 0 (width code 0)
                k = i
                while k < j:
                    cnt = min(j - k, 512)
                    out.append(0xC0 | ((cnt - 1) >> 8))
                    out.append((cnt - 1) & 0xFF)
                    _append_uvarint(out, _zigzag_enc(v)
                                    if signed else v)
                    _append_uvarint(out, _zigzag_enc(0))
                    k += cnt
            i = j
            lit_start = i
            continue
        # monotone run?  deltas all >= 0 (sign from delta0 >= 0)
        # or all <= 0, first delta nonzero so the sign is explicit
        j = i + 1
        if j < n:
            d0 = values[j] - values[i]
            if d0 != 0:
                sign = 1 if d0 > 0 else -1
                while j + 1 < n and j + 1 - i < 512:
                    d = values[j + 1] - values[j]
                    if d * sign < 0 or not (
                            -(1 << 63) <= d < (1 << 63)):
                        # sign flip, or a pair whose difference
                        # overflows signed 64-bit (Java
                        # isSafeSubtract): end the run here
                        break
                    j += 1
                mono = j + 1 - i
                # the header's first delta is a SIGNED zigzag varint
                # that Java/C++ readers decode into a 64-bit long:
                # when |delta0| exceeds 2^63-1 (values spanning most
                # of the int64 range) the varint overflows and
                # pyarrow silently decodes WRONG values (ADVICE r14)
                # — bail to DIRECT literals, matching the Java
                # writer's isSafeSubtract overflow check
                if mono >= 4 and not (
                        -(1 << 63) <= values[i + 1] - values[i]
                        < (1 << 63)):
                    mono = 0
                if mono >= 4:
                    flush_literals(i)
                    cnt = mono
                    deltas = [abs(values[k + 1] - values[k])
                              for k in range(i, i + cnt - 1)]
                    rest = deltas[1:]
                    if all(d == deltas[0] for d in rest):
                        wcode = 0
                    else:
                        need = max(max(rest).bit_length(), 1)
                        width = next(w for w in _WIDTH
                                     if w >= need)
                        wcode = _WIDTH.index(width)
                        if wcode == 0:
                            # width code 0 means FIXED delta; a
                            # 1-bit packed stream needs code >= 1
                            wcode = 1
                            width = _WIDTH[1]
                    out.append(0xC0 | (wcode << 1)
                               | ((cnt - 1) >> 8))
                    out.append((cnt - 1) & 0xFF)
                    _append_uvarint(out, zz(values[i]))
                    _append_uvarint(out, _zigzag_enc(
                        sign * deltas[0]))
                    if wcode:
                        width = _WIDTH[wcode]
                        acc = 0
                        for d in rest:
                            acc = (acc << width) | d
                        nbits = width * len(rest)
                        nbytes = (nbits + 7) // 8
                        acc <<= nbytes * 8 - nbits
                        out += acc.to_bytes(nbytes, "big")
                    i += cnt
                    lit_start = i
                    continue
        i += 1
    flush_literals(n)
    return bytes(out)


def format_nanos(nanos: int) -> int:
    """The SECONDARY zero-compression trick, inverse of
    orc_data.decode_nanos: with z >= 2 trailing decimal zeros
    stripped, the low 3 bits store z-1 (the spec's 1000 -> (1<<3)|2
    example: three zeros, stored 2)."""
    if nanos == 0:
        return 0
    if nanos % 100:
        return nanos << 3
    nanos //= 100
    zeros = 2
    while nanos % 10 == 0 and zeros < 8:
        nanos //= 10
        zeros += 1
    return (nanos << 3) | (zeros - 1)


def _bits_msb(flags: list[bool]) -> bytes:
    out = bytearray((len(flags) + 7) // 8)
    for i, f in enumerate(flags):
        if f:
            out[i // 8] |= 0x80 >> (i % 8)
    return bytes(out)


_COMPRESSION_BLOCK = 1 << 18  # postscript compressionBlockSize


def _compress_stream(raw: bytes, codec: str) -> bytes:
    if codec == "NONE":
        return raw
    out = bytearray()
    # chunk at compressionBlockSize: readers size their buffers from
    # the postscript and reject chunks whose ORIGINAL length exceeds
    # it; stored (isOriginal) when the codec loses
    for i in range(0, len(raw) or 1, _COMPRESSION_BLOCK):
        chunk = raw[i:i + _COMPRESSION_BLOCK]
        if codec == "ZSTD":
            from .zstd import zstd_compress

            comp = zstd_compress(chunk, checksum=False)
        else:
            comp = snappy_compress_block(chunk)
        if len(comp) < len(chunk):
            out += (len(comp) << 1).to_bytes(3, "little")
            out += comp
        else:
            out += ((len(chunk) << 1) | 1).to_bytes(3, "little")
            out += chunk
    return bytes(out)


def _column_stats(kind: str, present: list, n_slots: int) -> bytes:
    """RowIndexEntry ColumnStatistics: numberOfValues (field 1),
    hasNull (field 10), plus the typed sub-message for the kinds
    that have a natural one."""
    out = pb_varint(1, len(present))
    if kind in ("LONG", "INT", "SHORT", "BYTE") and present:
        sub = (pb_sint64(1, min(present)) + pb_sint64(2, max(present))
               + pb_sint64(3, sum(present)))
        out += pb_bytes(2, sub)  # IntegerStatistics
    elif kind in ("DOUBLE", "FLOAT") and present:
        if kind == "FLOAT":
            # the DATA stream stores float32-rounded values; stats
            # computed on the original float64s can exclude the
            # stored value (0.1 rounds UP in float32) and make a
            # min/max-pruning reader skip matching rows (ADVICE r15)
            import struct as _struct

            present = [_struct.unpack("<f", _struct.pack("<f", v))[0]
                       for v in present]
        sub = (pb_fixed64(1, min(present)) + pb_fixed64(2, max(present))
               + pb_fixed64(3, sum(present)))
        out += pb_bytes(3, sub)  # DoubleStatistics
    elif kind in ("STRING", "CHAR", "VARCHAR") and present:
        raws = sorted(present)
        sub = (pb_bytes(1, raws[0].encode("utf-8"))
               + pb_bytes(2, raws[-1].encode("utf-8"))
               + pb_sint64(3, sum(len(v.encode("utf-8"))
                                  for v in present)))
        out += pb_bytes(4, sub)  # StringStatistics
    elif kind == "BOOLEAN":
        out += pb_bytes(5, pb_varint(1, sum(bool(v)
                                            for v in present)))
    out += pb_varint(10, 1 if len(present) < n_slots else 0)
    return out


_BLOOM_KINDS = ("LONG", "DOUBLE", "STRING")


def _kind_of(spec) -> str:
    return spec if isinstance(spec, str) else spec[0]


def _validate_kind(spec) -> None:
    """Recursive kind-spec validation (hostile input -> ValueError)."""
    if isinstance(spec, str):
        if spec not in _KINDS:
            raise ValueError(f"unsupported kind {spec}")
        return
    if isinstance(spec, tuple) and spec \
            and spec[0] in ("CHAR", "VARCHAR"):
        if len(spec) != 2 or not isinstance(spec[1], int) \
                or spec[1] < 1:
            raise ValueError(f"{spec[0]} spec needs a positive "
                             "maximumLength")
        return
    if not isinstance(spec, tuple) or not spec \
            or spec[0] not in _COMPOUND:
        raise ValueError(f"unsupported kind spec {spec!r}")
    if spec[0] == "STRUCT":
        if len(spec) != 2 or not spec[1]:
            raise ValueError("STRUCT spec needs a non-empty field "
                             "list")
        for field in spec[1]:
            if not isinstance(field, tuple) or len(field) != 2:
                raise ValueError("STRUCT field must be (name, kind)")
            _validate_kind(field[1])
    elif spec[0] == "LIST":
        if len(spec) != 2:
            raise ValueError("LIST spec needs one element kind")
        _validate_kind(spec[1])
    elif spec[0] == "MAP":
        if len(spec) != 3:
            raise ValueError("MAP spec needs key and value kinds")
        _validate_kind(spec[1])
        _validate_kind(spec[2])
    else:  # UNION
        if len(spec) != 2 or not spec[1]:
            raise ValueError("UNION spec needs a non-empty child "
                             "kind list")
        if len(spec[1]) > 256:
            # tags ride a byte stream; the spec caps children
            raise ValueError("UNION supports at most 256 children")
        for child in spec[1]:
            _validate_kind(child)


def _struct_children(present: list, fname: str) -> list:
    try:
        return [row[fname] for row in present]
    except (KeyError, TypeError, IndexError) as exc:
        raise ValueError(
            f"STRUCT row missing field {fname!r} (pass an explicit "
            "None for nulls)") from exc


def _map_pairs(present: list) -> list:
    pairs = []
    for row in present:
        items = row.items() if isinstance(row, dict) else row
        try:
            pairs.append([(k, v) for k, v in items])
        except (TypeError, ValueError) as exc:
            raise ValueError(
                "MAP row must be a dict or (key, value) pairs"
            ) from exc
    return pairs


def _union_tags(spec, present: list) -> list[int]:
    """UNION rows are (tag, value) pairs; validate tags against the
    declared child list."""
    n_children = len(spec[1])
    tags = []
    for row in present:
        try:
            tag = int(row[0])
        except (TypeError, ValueError, IndexError) as exc:
            raise ValueError(
                "UNION row must be a (tag, value) pair") from exc
        if not 0 <= tag < n_children:
            raise ValueError(
                f"UNION tag {tag} outside declared children")
        tags.append(tag)
    return tags


def _walk_kinds(spec, vals, fn) -> None:
    """Pre-order walk over a column's type tree with each node's
    PRESENT values; ``fn(kind_spec, present)`` fires per node —
    column-global passes (decimal scales) use this so their node
    order matches the per-stripe encoder's id assignment."""
    kind = _kind_of(spec)
    present = [v for v in vals if v is not None]
    fn(spec, present)
    if kind == "STRUCT":
        for fname, fspec in spec[1]:
            _walk_kinds(fspec, _struct_children(present, fname), fn)
    elif kind == "LIST":
        _walk_kinds(spec[1], [e for v in present for e in v], fn)
    elif kind == "MAP":
        pairs = _map_pairs(present)
        _walk_kinds(spec[1], [k for p in pairs for k, _ in p], fn)
        _walk_kinds(spec[2], [v for p in pairs for _, v in p], fn)
    elif kind == "UNION":
        tags = _union_tags(spec, present)
        for t, child in enumerate(spec[1]):
            _walk_kinds(child, [v for tg, (_, v) in
                                zip(tags, present) if tg == t], fn)


def _flatten_type_tree(columns: list) -> list[dict]:
    """Pre-order type nodes for the footer: index = column id (root
    struct = 0), each {kind, subtypes, names} — the same walk order
    as the stripe encoder, so stream column ids line up."""
    types: list[dict] = [
        {"kind": "STRUCT", "subtypes": [], "names": []}]

    def add(spec, parent: int) -> None:
        nid = len(types)
        kind = _kind_of(spec)
        node = {"kind": kind, "subtypes": [], "names": []}
        types.append(node)
        types[parent]["subtypes"].append(nid)
        if kind == "STRUCT":
            for fname, fspec in spec[1]:
                node["names"].append(fname)
                add(fspec, nid)
        elif kind == "LIST":
            add(spec[1], nid)
        elif kind == "MAP":
            add(spec[1], nid)
            add(spec[2], nid)
        elif kind == "UNION":
            for child in spec[1]:
                add(child, nid)
        elif kind in ("CHAR", "VARCHAR"):
            node["max_len"] = spec[1]

    for name, spec, _ in columns:
        types[0]["names"].append(name)
        add(spec, 0)
    return types


def _encode_columns(columns: list[tuple[str, str, list]],
                    lo: int, hi: int, *, dictionary: bool,
                    decimal_scales: dict[int, int]
                    ) -> tuple[list, list, list]:
    """Encode rows [lo, hi) of every column -> (streams, encodings,
    col_info) for one stripe.  DECIMAL values rescale to the
    COLUMN-GLOBAL scale in ``decimal_scales`` so the footer type's
    declared scale holds across stripes.  Compound kinds recurse:
    STRUCT children take the parent's present rows' field values,
    LIST/MAP write a LENGTH stream (RLEv2 unsigned) and children take
    the concatenated elements — the spec's parent-drives-child stream
    model, the exact inverse of orc_data.read_stripe_column."""
    streams: list[tuple[int, int, bytes]] = []  # (column, kind, raw)
    encodings: list = [0]  # root struct: DIRECT
    col_info: list[tuple[str, list, int]] = []  # (kind, present, n)
    ci_ref = [1]
    budget = [MAX_CELLS]

    def encode_node(spec, vals: list) -> None:
        ci = ci_ref[0]
        ci_ref[0] += 1
        budget[0] -= len(vals)
        if budget[0] < 0:
            raise ValueError("nested cell cap exceeded")
        kind = _kind_of(spec)
        flags = [v is not None for v in vals]
        present = [v for v in vals if v is not None]
        col_info.append((kind, present, len(vals)))
        if not all(flags):
            streams.append(
                (ci, 0, byte_rle_encode(_bits_msb(flags))))
        if kind == "STRUCT":
            encodings.append(0)
            for fname, fspec in spec[1]:
                encode_node(fspec, _struct_children(present, fname))
            return
        if kind == "LIST":
            streams.append((ci, 2, rlev2_encode(
                [len(v) for v in present], signed=False)))
            encodings.append(2)
            encode_node(spec[1], [e for v in present for e in v])
            return
        if kind == "MAP":
            pairs = _map_pairs(present)
            streams.append((ci, 2, rlev2_encode(
                [len(p) for p in pairs], signed=False)))
            encodings.append(2)
            encode_node(spec[1], [k for p in pairs for k, _ in p])
            encode_node(spec[2], [v for p in pairs for _, v in p])
            return
        if kind == "UNION":
            # DATA = byte-RLE tag stream; child i holds only the
            # values whose tag selects it (spec "Union Column
            # Serialization")
            tags = _union_tags(spec, present)
            streams.append((ci, 1, byte_rle_encode(bytes(tags))))
            encodings.append(0)  # DIRECT
            for t, child in enumerate(spec[1]):
                encode_node(child, [v for tg, (_, v) in
                                    zip(tags, present) if tg == t])
            return
        if kind in ("LONG", "INT", "SHORT", "DATE"):
            if kind in _INT_BOUNDS:
                lo_b, hi_b = _INT_BOUNDS[kind]
                if any(not lo_b <= v <= hi_b for v in present):
                    raise ValueError(
                        f"{kind} value outside declared width")
            streams.append(
                (ci, 1, rlev2_encode(present, signed=True)))
            encodings.append(2)  # DIRECT_V2
        elif kind == "BYTE":
            lo_b, hi_b = _INT_BOUNDS["BYTE"]
            if any(not lo_b <= v <= hi_b for v in present):
                raise ValueError("BYTE value outside declared width")
            # tinyint rides byte-RLE (NOT RLEv2), two's complement
            streams.append(
                (ci, 1, byte_rle_encode(
                    bytes((v + 256) % 256 for v in present))))
            encodings.append(0)
        elif kind == "FLOAT":
            streams.append(
                (ci, 1, struct.pack(f"<{len(present)}f", *present)))
            encodings.append(0)  # DIRECT
        elif kind == "BINARY":
            raws = [bytes(v) for v in present]
            streams.append((ci, 1, b"".join(raws)))
            streams.append(
                (ci, 2, rlev2_encode([len(r) for r in raws],
                                     signed=False)))
            encodings.append(2)
        elif kind == "DOUBLE":
            streams.append(
                (ci, 1, struct.pack(f"<{len(present)}d", *present)))
            encodings.append(0)  # DIRECT
        elif kind == "BOOLEAN":
            streams.append(
                (ci, 1, byte_rle_encode(
                    _bits_msb([bool(v) for v in present]))))
            encodings.append(0)
        elif kind == "TIMESTAMP":
            # values are epoch NANOS ints.  The C++ writer convention
            # (seconds truncated toward zero, SIGNED zero-compressed
            # nanos carried two's-complement in the unsigned stream)
            # is the one that round-trips pre-1970 fractional
            # instants through both the Arrow C++ reader and this
            # repo's reader; the Java floor+positive-nanos form is
            # historically inconsistent there (ORC-101 lineage)
            secs = []
            nanos = []
            for v in present:
                s_t = (v // 1_000_000_000 if v >= 0
                       else -((-v) // 1_000_000_000))
                nv = v - s_t * 1_000_000_000
                f = format_nanos(abs(nv))
                if nv < 0:
                    f = ((-(f >> 3)) << 3) | (f & 7)
                secs.append(s_t - _TS_BASE)
                nanos.append(f % (1 << 64))
            streams.append((ci, 1, rlev2_encode(secs, signed=True)))
            streams.append(
                (ci, 5, rlev2_encode(nanos, signed=False)))
            encodings.append(2)
        elif kind == "DECIMAL":
            # DATA = signed unbounded varints of the unscaled int,
            # SECONDARY = scale RLEv2; every value rescaled to the
            # column-global scale so the footer type is authoritative
            scale = decimal_scales[ci]
            body = bytearray()
            for v in present:
                unscaled = int(v.scaleb(scale))
                if abs(unscaled) >= 10 ** 18:
                    # the footer declares precision 18; a wider value
                    # would make that declaration lie and overflow
                    # readers' decimal64 fast path
                    raise ValueError(
                        "decimal exceeds declared precision 18")
                z = _zigzag_enc(unscaled)
                while True:
                    b = z & 0x7F
                    z >>= 7
                    if z:
                        body.append(b | 0x80)
                    else:
                        body.append(b)
                        break
            streams.append((ci, 1, bytes(body)))
            streams.append(
                (ci, 5, rlev2_encode([scale] * len(present),
                                     signed=True)))
            encodings.append(2)
        elif kind in ("CHAR", "VARCHAR"):
            max_len = spec[1]
            if any(len(v) > max_len for v in present):
                raise ValueError(
                    f"{kind} value exceeds declared "
                    f"maximumLength {max_len}")
            # CHAR/VARCHAR serialize exactly like STRING (DIRECT_V2;
            # the footer type's maximumLength carries the width)
            raws = [v.encode("utf-8") for v in present]
            streams.append((ci, 1, b"".join(raws)))
            streams.append(
                (ci, 2, rlev2_encode([len(r) for r in raws],
                                     signed=False)))
            encodings.append(2)
        elif kind == "STRING" and dictionary \
                and 0 < len(set(present)) <= len(present) \
                and len(set(present)) <= 1 << 16:
            # DICTIONARY_V2 (spec: sorted dictionary): DATA = RLEv2
            # indices, LENGTH = sorted-entry byte lengths,
            # DICTIONARY_DATA = concatenated sorted utf-8
            words = sorted(set(present))
            pos = {w: i for i, w in enumerate(words)}
            raws = [w.encode("utf-8") for w in words]
            streams.append((ci, 1, rlev2_encode(
                [pos[v] for v in present], signed=False)))
            streams.append(
                (ci, 2, rlev2_encode([len(r) for r in raws],
                                     signed=False)))
            streams.append((ci, 3, b"".join(raws)))
            encodings.append((3, len(words)))
        else:  # STRING DIRECT_V2
            raws = [v.encode("utf-8") for v in present]
            streams.append((ci, 1, b"".join(raws)))
            streams.append(
                (ci, 2, rlev2_encode([len(r) for r in raws],
                                     signed=False)))
            encodings.append(2)

    for _, spec, allvals in columns:
        encode_node(spec, allvals[lo:hi])
    return streams, encodings, col_info


def write_orc(columns: list[tuple[str, str, list]], *,
              codec: str = "SNAPPY",
              dictionary: bool = False,
              bloom_filter: bool = False,
              bloom_fpp: float = 0.05,
              stripe_rows: int | None = None) -> bytes:
    """[(name, kind, values)] (None = null; kind LONG / DOUBLE /
    STRING / BOOLEAN / TIMESTAMP (epoch-nanos ints) / DECIMAL
    (decimal.Decimal)) -> ORC file bytes.

    COMPOUND kinds nest to any depth (r15; previously flat-scalar
    only while the own reader walked compound types):
    ``("STRUCT", [(field, kind), ...])`` over dict rows,
    ``("LIST", elem_kind)`` over list rows, and
    ``("MAP", key_kind, value_kind)`` over dict / pair-list rows.
    Each compound column writes the spec's parent-drives-child
    stream family — PRESENT at every level, LENGTH (RLEv2) for
    LIST/MAP — with children as their own pre-order column ids, the
    exact inverse of orc_data.read_stripe_column's recursive
    assembly; the reference's 2-deep ``vitals.blood_pressure``
    event shape round-trips through pyarrow and the own reader
    (health_simulator.py:61-96 via SURVEY §3).

    ``stripe_rows`` splits the file into MULTIPLE stripes (default
    one) — each with its own streams, encodings, index section and
    Bloom filters, so stripe-level skipping works inside a single
    file; DECIMAL columns rescale to a column-global scale so the
    footer type holds across stripes.

    ``dictionary`` — STRING columns with <= 2^16 distinct values
    (per stripe) are written DICTIONARY_V2 (sorted dictionary per
    the spec: RLEv2 index DATA, sorted-entry LENGTHs, concatenated
    DICTIONARY_DATA).

    ``bloom_filter`` — writes an INDEX section ahead of each
    stripe's data streams: a ROW_INDEX stream per column (one
    RowIndexEntry with real ColumnStatistics — each stripe is one
    row group) and a BLOOM_FILTER_UTF8 stream for LONG / DOUBLE /
    STRING columns, Java-hash-compatible (operators/orc_bloom:
    signed-shift Wang for longs/doubles, Murmur3-64 seed 104729 for
    strings).  The footer deliberately leaves rowIndexStride unset:
    one row group per stripe makes seek positions degenerate,
    reference readers then ignore the index section entirely (they
    read these files value-exact), while the own reader finds the
    blooms through the stripe-footer stream list — the same
    consumer split as the parquet SBBF path."""
    if not columns:
        raise ValueError("no columns")
    n_rows = len(columns[0][2])
    if any(len(v) != n_rows for _, _, v in columns):
        raise ValueError("ragged columns")
    if n_rows * len(columns) > MAX_CELLS:
        raise ValueError("cell cap exceeded")
    if codec not in ("SNAPPY", "ZSTD", "NONE"):
        raise ValueError(f"writer codec {codec} unsupported")
    if stripe_rows is not None and stripe_rows < 1:
        raise ValueError("stripe_rows must be positive")
    for _, spec, _ in columns:
        _validate_kind(spec)
    # column-global decimal scales (footer declares ONE scale),
    # keyed by pre-order column id — the same walk order as the
    # stripe encoder, so nested decimals resolve too
    decimal_scales: dict[int, int] = {}
    decimal_meta: dict[int, tuple[int, int]] = {}
    ci_ref = [1]

    def collect_decimal(spec, present: list) -> None:
        ci = ci_ref[0]
        ci_ref[0] += 1
        if _kind_of(spec) != "DECIMAL":
            return
        scale = max((-v.as_tuple().exponent for v in present),
                    default=0)
        if scale < 0:
            raise ValueError("positive-exponent decimal unsupported")
        decimal_scales[ci] = scale
        decimal_meta[ci] = (18, scale)

    for _, spec, vals in columns:
        _walk_kinds(spec, vals, collect_decimal)

    sr = stripe_rows or max(n_rows, 1)
    bounds = [(s, min(s + sr, n_rows))
              for s in range(0, n_rows, sr)] or [(0, 0)]
    out = bytearray(b"ORC")
    stripe_infos: list[bytes] = []
    stripe_stats: list[bytes] = []  # Metadata StripeStatistics
    for lo, hi in bounds:
        stripe_offset = len(out)
        streams, encodings, col_info = _encode_columns(
            columns, lo, hi, dictionary=dictionary,
            decimal_scales=decimal_scales)
        stripe_n = hi - lo
        # Metadata section StripeStatistics: root struct stats +
        # one ColumnStatistics per column (same shapes the row
        # index carries), so a TAIL-ONLY read can prune stripes
        ss = pb_bytes(1, pb_varint(1, stripe_n) + pb_varint(10, 0))
        for kind, present, n_slots in col_info:
            ss += pb_bytes(1, _column_stats(kind, present,
                                            n_slots))
        stripe_stats.append(ss)
        stream_meta = []
        index_length = 0
        if bloom_filter:
            from .orc_bloom import (
                STREAM_BLOOM_FILTER_UTF8,
                OrcBloomFilter,
                write_bloom_index,
            )

            index_streams: list[tuple[int, int, bytes]] = []
            # ROW_INDEX per column (root struct included), one
            # RowIndexEntry — the stripe is one row group;
            # positions are degenerate (stream starts) and omitted
            root_entry = pb_bytes(2, pb_varint(1, stripe_n)
                                  + pb_varint(10, 0))
            index_streams.append((0, 6, pb_bytes(1, root_entry)))
            for ci, (kind, present, n_slots) in enumerate(
                    col_info, start=1):
                entry = pb_bytes(
                    2, _column_stats(kind, present, n_slots))
                index_streams.append((ci, 6, pb_bytes(1, entry)))
            for ci, (kind, present, _ns) in enumerate(
                    col_info, start=1):
                if kind not in _BLOOM_KINDS or not present:
                    continue
                bf = OrcBloomFilter.sized_for(len(set(present)),
                                              bloom_fpp)
                for v in present:
                    if kind == "LONG":
                        bf.add_long(v)
                    elif kind == "DOUBLE":
                        bf.add_double(v)
                    else:
                        bf.add_string(v)
                index_streams.append(
                    (ci, STREAM_BLOOM_FILTER_UTF8,
                     write_bloom_index([bf])))
            index_start = len(out)
            for col, skind, raw in index_streams:
                blob = _compress_stream(raw, codec)
                out += blob
                stream_meta.append((col, skind, len(blob)))
            index_length = len(out) - index_start

        data_start = len(out)
        for col, skind, raw in streams:
            blob = _compress_stream(raw, codec)
            out += blob
            stream_meta.append((col, skind, len(blob)))
        data_length = len(out) - data_start

        sf = bytearray()
        for col, skind, ln in stream_meta:
            sf += pb_bytes(1, pb_varint(1, skind) + pb_varint(2, col)
                           + pb_varint(3, ln))
        for enc in encodings:
            if isinstance(enc, tuple):  # (kind, dictionarySize)
                sf += pb_bytes(2, pb_varint(1, enc[0])
                               + pb_varint(2, enc[1]))
            else:
                sf += pb_bytes(2, pb_varint(1, enc))
        sf_blob = _compress_stream(bytes(sf), codec)
        out += sf_blob
        stripe_infos.append(pb_varint(1, stripe_offset)
                            + pb_varint(2, index_length)
                            + pb_varint(3, data_length)
                            + pb_varint(4, len(sf_blob))
                            + pb_varint(5, stripe_n))

    # Metadata section (orc_proto Metadata: repeated
    # StripeStatistics = 1) between the stripes and the footer
    metadata = bytearray()
    for ss in stripe_stats:
        metadata += pb_bytes(1, ss)
    metadata_blob = _compress_stream(bytes(metadata), codec)
    out += metadata_blob

    footer = bytearray()
    content_length = len(out) - len(metadata_blob)
    footer += pb_varint(2, content_length)
    for si in stripe_infos:
        footer += pb_bytes(3, si)
    # types: the pre-order tree (root struct = id 0; STRUCT children
    # get subtypes + fieldNames, LIST one subtype, MAP two)
    for ci, node in enumerate(_flatten_type_tree(columns)):
        kind = node["kind"]
        t = pb_varint(1, _COMPOUND.get(kind, _KINDS.get(kind, 12)))
        if node["subtypes"]:
            t += pb_bytes(2, b"".join(_uvarint(i)
                                      for i in node["subtypes"]))
        for fname in node["names"]:
            t += pb_bytes(3, fname.encode("utf-8"))
        if kind == "DECIMAL":
            prec, scale = decimal_meta.get(ci, (18, 0))
            t += pb_varint(5, prec) + pb_varint(6, scale)
        if kind in ("CHAR", "VARCHAR"):
            t += pb_varint(4, node["max_len"])
        footer += pb_bytes(4, t)
    footer += pb_varint(6, n_rows)
    footer_blob = _compress_stream(bytes(footer), codec)
    out += footer_blob

    ps = bytearray()
    ps += pb_varint(1, len(footer_blob))
    ps += pb_varint(2, {"SNAPPY": 2, "ZSTD": 5}.get(codec, 0))
    if codec != "NONE":
        ps += pb_varint(3, 1 << 18)  # compressionBlockSize
    ps += pb_varint(4, 0)
    ps += pb_varint(4, 12)  # version 0.12
    ps += pb_varint(5, len(metadata_blob))
    ps += pb_bytes(8000, b"ORC")
    if len(ps) > 255:
        raise ValueError("postscript too long")
    out += ps
    out.append(len(ps))
    return bytes(out)
