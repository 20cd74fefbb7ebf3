"""Parquet DATA PAGE decode — reading the lake format's bytes itself.

operators/parquet_meta.py walks the footer; this goes the rest of the
way: it decodes actual column-chunk VALUES from the page bytes, with
no pyarrow/Spark in the loop — the strongest possible proof that the
engine understands its storage format.  From the PUBLIC parquet-format
spec:

* page headers — Thrift compact (the same generic reader as the
  footer): PageHeader{type, uncompressed/compressed sizes,
  DataPageHeader{num_values, encoding, def/rep level encodings},
  DictionaryPageHeader{num_values, encoding},
  DataPageHeaderV2{num_values, num_nulls, level byte lengths,
  is_compressed};
* page decompression — UNCOMPRESSED, SNAPPY (this repo's
  from-scratch decoder), GZIP/zlib;
* the RLE / BIT-PACKED HYBRID encoding (spec §Encodings): varint run
  headers, LSB 0 ⇒ RLE run of a fixed-width little-endian value,
  LSB 1 ⇒ (header>>1) groups of 8 bit-packed values LSB-first;
  4-byte length prefix for v1 definition levels, bare for v2 levels
  and for dictionary indices (which carry a leading bit-width byte);
* value encodings — PLAIN for INT32/INT64/DOUBLE/FLOAT (little-
  endian arrays), PLAIN BYTE_ARRAY (u32 length + bytes),
  PLAIN_DICTIONARY/RLE_DICTIONARY index resolution against the
  chunk's dictionary page;
* definition levels materializing NULLs for optional columns
  (max_def_level = 1 at top level).

Correctness gate: column aggregates decoded here must equal SQL
aggregates over the same file computed by DuckDB (the registry
oracle) and by Spark's vectorized reader (tests).  Hostile input
raises ``ValueError``; page sizes and counts are capped.
"""

from __future__ import annotations

import struct
import zlib

from .parquet_meta import _Reader
from .snappy import snappy_decompress_block

MAX_PAGE_BYTES = 1 << 26
MAX_PAGES = 1 << 16


def _bit_width(max_level: int) -> int:
    return max_level.bit_length()


def read_rle_hybrid(data: bytes, pos: int, end: int, bit_width: int,
                    n: int) -> tuple[list[int], int]:
    """Decode n values of RLE/bit-packed hybrid at bit_width."""
    out: list[int] = []
    byte_w = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < n:
        if pos >= end:
            raise ValueError("rle hybrid underrun")
        header = 0
        shift = 0
        while True:
            if pos >= end:
                raise ValueError("rle hybrid varint truncated")
            b = data[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if header & 1:  # bit-packed groups
            groups = header >> 1
            count = groups * 8
            nbytes = groups * bit_width
            if pos + nbytes > end:
                raise ValueError("bit-packed run truncated")
            acc = int.from_bytes(data[pos:pos + nbytes], "little")
            pos += nbytes
            for i in range(count):
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            count = header >> 1
            if bit_width == 0:
                v = 0
            else:
                if pos + byte_w > end:
                    raise ValueError("rle run value truncated")
                v = int.from_bytes(data[pos:pos + byte_w], "little")
                pos += byte_w
            out.extend([v] * count)
        if len(out) > n + 8 * 64:
            raise ValueError("rle hybrid overrun")
    return out[:n], pos


def _plain_values(data: bytes, pos: int, n: int, ptype: str,
                  type_length: int | None = None) -> list:
    # bool IS an int subclass — a corrupted thrift field decoded as
    # True would render f"<Trueq" struct formats; require a real int
    if not isinstance(n, int) or isinstance(n, bool) or n < 0:
        raise ValueError("bad plain value count")
    widths = {"INT64": 8, "INT32": 4, "DOUBLE": 8, "FLOAT": 4}
    if ptype in widths and pos + widths[ptype] * n > len(data):
        raise ValueError("plain values truncated")
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        if not type_length or type_length < 0:
            raise ValueError("FLBA requires a positive type_length")
        end = pos + type_length * n
        if end > len(data):
            raise ValueError("flba values truncated")
        return [data[pos + i * type_length:
                     pos + (i + 1) * type_length]
                for i in range(n)], end
    if ptype == "INT64":
        end = pos + 8 * n
        return list(struct.unpack_from(f"<{n}q", data, pos)), end
    if ptype == "INT32":
        end = pos + 4 * n
        return list(struct.unpack_from(f"<{n}i", data, pos)), end
    if ptype == "DOUBLE":
        end = pos + 8 * n
        return list(struct.unpack_from(f"<{n}d", data, pos)), end
    if ptype == "FLOAT":
        end = pos + 4 * n
        return list(struct.unpack_from(f"<{n}f", data, pos)), end
    if ptype == "BOOLEAN":
        # PLAIN booleans are bit-packed LSB-first
        nbytes = (n + 7) // 8
        if pos + nbytes > len(data):
            raise ValueError("boolean values truncated")
        return [bool(data[pos + i // 8] & (1 << (i % 8)))
                for i in range(n)], pos + nbytes
    if ptype == "INT96":
        # legacy Spark/Impala timestamps: 8-byte LE nanos-of-day +
        # 4-byte LE Julian day; returned as epoch NANOS ints
        end = pos + 12 * n
        if end > len(data):
            raise ValueError("int96 values truncated")
        out = []
        for i in range(n):
            o = pos + 12 * i
            (nanos,) = struct.unpack_from("<q", data, o)
            (jday,) = struct.unpack_from("<i", data, o + 8)
            out.append((jday - 2440588) * 86_400_000_000_000 + nanos)
        return out, end
    if ptype == "BYTE_ARRAY":
        out = []
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError("byte_array length truncated")
            (ln,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if pos + ln > len(data):
                raise ValueError("byte_array overrun")
            out.append(data[pos:pos + ln])
            pos += ln
        return out, pos
    raise ValueError(f"plain decode for {ptype} unsupported")


def _decompress(payload: bytes, codec: str, expected: int) -> bytes:
    if codec == "UNCOMPRESSED":
        raw = payload
    elif codec == "SNAPPY":
        raw = snappy_decompress_block(payload)
    elif codec == "GZIP":
        raw = zlib.decompress(payload, 31, MAX_PAGE_BYTES)
    elif codec == "ZSTD":
        from .zstd import zstd_decompress

        raw = zstd_decompress(payload)
    else:
        raise ValueError(f"page codec {codec} unsupported here")
    if len(raw) != expected:
        raise ValueError("page decompressed size mismatch")
    return raw


def read_dictionary_page(data: bytes, dictionary_page_offset: int,
                         ptype: str, codec: str,
                         type_length: int | None = None) -> list:
    """Decode ONE dictionary page -> values list.  Selective page
    readers (page-index pruning) should call this once per column
    chunk and pass the result to every read_column_chunk call via
    ``dictionary=`` — re-decoding the (large) dictionary per selected
    page was the dominant cost of the page-prune scan (r17, guide
    §4.5: heavyweight init once)."""
    if not isinstance(dictionary_page_offset, int) \
            or dictionary_page_offset < 0:
        raise ValueError("bad dictionary page offset")
    r = _Reader(data)
    r.pos = dictionary_page_offset
    hdr = r.struct()
    if hdr.get(1) != 2:
        raise ValueError("dictionary_page_offset is not a "
                         "dictionary page")
    c_size, un_size = hdr.get(3), hdr.get(2)
    dh = hdr.get(7, {})
    if not isinstance(c_size, int) or not isinstance(
            un_size, int) or not isinstance(dh, dict) \
            or not isinstance(dh.get(1), int) \
            or dh.get(1) < 0 or c_size < 0 \
            or un_size > MAX_PAGE_BYTES:
        raise ValueError("bad dictionary page header")
    payload = data[r.pos:r.pos + c_size]
    if len(payload) != c_size:
        raise ValueError("dictionary page truncated")
    raw = _decompress(payload, codec, un_size)
    dictionary, _ = _plain_values(
        raw, 0, dh.get(1), ptype, type_length)
    return dictionary


def read_column_chunk(data: bytes, *, start_offset: int,
                      num_values: int, ptype: str, codec: str,
                      max_def_level: int = 1,
                      max_rep_level: int = 0,
                      rep_def_level: int = 0,
                      type_length: int | None = None,
                      dictionary_page_offset: int | None = None,
                      rep_def_levels: list[int] | None = None,
                      dictionary: list | None = None
                      ) -> list:
    """Decode one column chunk -> values list (None for nulls),
    walking dictionary + data pages (v1 and v2) from
    ``start_offset`` until ``num_values`` are produced.

    With ``max_rep_level`` = 1 (a list leaf; get the level ladder
    from parquet_meta.schema_leaves), the return value is one entry
    per ROW: a list of element values, ``[]`` for an empty list,
    ``None`` for a null list.  ``num_values`` still counts leaf-level
    SLOTS (ColumnMetaData.num_values), not rows.  Deeper nesting
    (list<list<...>>, any repetition depth) assembles through
    ``rep_def_levels`` — the schema walk's definition level AT each
    repeated ancestor (parquet_meta.schema_leaves emits it); with
    only ``rep_def_level`` given, single-level behavior is
    preserved.

    ``dictionary_page_offset`` supports SELECTIVE page decode (page
    skipping via the OffsetIndex): point ``start_offset`` at any
    data page with ``num_values`` = that page's slot count, passing
    the chunk's dictionary offset separately so dictionary-encoded
    pages still resolve."""
    if not isinstance(start_offset, int) or start_offset < 0 \
            or not isinstance(num_values, int) or num_values < 0 \
            or (dictionary_page_offset is not None
                and not isinstance(dictionary_page_offset, int)):
        # corrupted footers can hand back lists/None for offsets —
        # the hostile-input contract is ValueError, not TypeError
        raise ValueError("bad column chunk offsets")
    if max_rep_level > 0:
        if rep_def_levels is None:
            rep_def_levels = [rep_def_level]
        if len(rep_def_levels) != max_rep_level:
            raise ValueError("rep_def_levels must give the def "
                             "level of every repeated ancestor")
    pos = start_offset
    if dictionary is None and dictionary_page_offset is not None \
            and dictionary_page_offset != start_offset:
        dictionary = read_dictionary_page(
            data, dictionary_page_offset, ptype, codec, type_length)
    out: list = []
    all_reps: list[int] = []
    all_defs: list[int] = []
    n_pages = 0
    while len(out) < num_values:
        n_pages += 1
        if n_pages > MAX_PAGES:
            raise ValueError("page cap exceeded")
        r = _Reader(data)
        r.pos = pos
        hdr = r.struct()
        pos = r.pos
        page_type = hdr.get(1)
        un_size = hdr.get(2)
        c_size = hdr.get(3)
        if not isinstance(c_size, int) or not isinstance(
                un_size, int) or c_size < 0 \
                or un_size > MAX_PAGE_BYTES:
            raise ValueError("bad page sizes")
        payload = data[pos:pos + c_size]
        if len(payload) != c_size:
            raise ValueError("page payload truncated")
        pos += c_size
        if page_type == 2:  # dictionary page
            dhdr = hdr.get(7, {})
            n_dict = dhdr.get(1) if isinstance(dhdr, dict) else None
            if not isinstance(n_dict, int) or n_dict < 0:
                raise ValueError("bad dictionary page header")
            raw = _decompress(payload, codec, un_size)
            dictionary, _ = _plain_values(raw, 0, n_dict, ptype,
                                          type_length)
            continue
        if page_type == 0:  # data page v1
            dp = hdr.get(5, {})
            if not isinstance(dp, dict):
                raise ValueError("bad data page header")
            n_vals = dp.get(1)
            encoding = dp.get(2)
            if not isinstance(n_vals, int) or n_vals < 0:
                raise ValueError("bad page value count")
            raw = _decompress(payload, codec, un_size)
            p = 0
            if max_rep_level > 0:
                if p + 4 > len(raw):
                    raise ValueError("rep level prefix truncated")
                (rl_len,) = struct.unpack_from("<I", raw, p)
                p += 4
                reps, _ = read_rle_hybrid(
                    raw, p, p + rl_len, _bit_width(max_rep_level),
                    n_vals)
                p += rl_len
            else:
                reps = [0] * n_vals
            if max_def_level > 0:
                if p + 4 > len(raw):
                    raise ValueError("def level prefix truncated")
                (dl_len,) = struct.unpack_from("<I", raw, p)
                p += 4
                defs, _ = read_rle_hybrid(
                    raw, p, p + dl_len, _bit_width(max_def_level),
                    n_vals)
                p += dl_len
            else:
                defs = [max_def_level] * n_vals
        elif page_type == 3:  # data page v2
            dp = hdr.get(8, {})
            if not isinstance(dp, dict):
                raise ValueError("bad data page header")
            n_vals = dp.get(1)
            encoding = dp.get(4)
            dl_bytes = dp.get(5, 0)
            rl_bytes = dp.get(6, 0)
            if not all(isinstance(v, int) and v >= 0 for v in
                       (n_vals, dl_bytes, rl_bytes)):
                raise ValueError("bad page value count")
            levels = payload[:rl_bytes + dl_bytes]
            body = payload[rl_bytes + dl_bytes:]
            if hdr.get(8, {}).get(7, True) is not False:
                body = _decompress(
                    body, codec,
                    un_size - rl_bytes - dl_bytes)
            if max_rep_level > 0 and rl_bytes:
                reps, _ = read_rle_hybrid(
                    levels, 0, rl_bytes,
                    _bit_width(max_rep_level), n_vals)
            else:
                reps = [0] * n_vals
            if max_def_level > 0 and dl_bytes:
                defs, _ = read_rle_hybrid(
                    levels, rl_bytes, rl_bytes + dl_bytes,
                    _bit_width(max_def_level), n_vals)
            else:
                defs = [max_def_level] * n_vals
            raw, p = body, 0
        else:
            raise ValueError(f"unexpected page type {page_type}")
        n_present = sum(1 for d in defs if d == max_def_level)
        if encoding == 0:  # PLAIN
            vals, _ = _plain_values(raw, p, n_present, ptype,
                                    type_length)
        elif encoding in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
            if dictionary is None:
                raise ValueError("dictionary page missing")
            if p >= len(raw):
                raise ValueError("dictionary index width missing")
            bw = raw[p]
            idx, _ = read_rle_hybrid(raw, p + 1, len(raw), bw,
                                     n_present)
            try:
                vals = [dictionary[i] for i in idx]
            except IndexError as exc:
                raise ValueError("dictionary index out of range") from exc
        elif encoding == 5:  # DELTA_BINARY_PACKED
            if ptype not in ("INT32", "INT64"):
                raise ValueError("delta-binary-packed on non-int")
            vals, _ = read_delta_binary_packed(raw, p, n_present)
        elif encoding == 6:  # DELTA_LENGTH_BYTE_ARRAY
            vals, _ = read_delta_length_byte_array(raw, p, n_present)
        elif encoding == 7:  # DELTA_BYTE_ARRAY
            vals, _ = read_delta_byte_array(raw, p, n_present)
        elif encoding == 9:  # BYTE_STREAM_SPLIT
            vals = _byte_stream_split(raw, p, n_present, ptype,
                                      type_length)
        elif encoding == 3 and ptype == "BOOLEAN":
            # v2 booleans as RLE-hybrid at bit width 1, 4-byte
            # length prefix
            if p + 4 > len(raw):
                raise ValueError("rle boolean prefix truncated")
            (bl,) = struct.unpack_from("<I", raw, p)
            bits, _ = read_rle_hybrid(raw, p + 4, p + 4 + bl, 1,
                                      n_present)
            vals = [bool(b) for b in bits]
        else:
            raise ValueError(f"value encoding {encoding} unsupported")
        it = iter(vals)
        for d in defs:
            out.append(next(it) if d == max_def_level else None)
        if max_rep_level:
            all_reps.extend(reps)
            all_defs.extend(defs)
    if len(out) != num_values:
        raise ValueError("column chunk value count mismatch")
    if max_rep_level == 0:
        return out
    return _assemble_nested(out, all_defs, all_reps,
                            max_def_level, rep_def_levels)


def _assemble_nested(slots: list, defs: list[int], reps: list[int],
                     max_def: int, rep_defs: list[int]) -> list:
    """Dremel record assembly for any repetition depth: rep r keeps
    the lists at depths 1..r open; descending from there, a slot
    with def >= rep_defs[t] opens a new list at depth t+1, def ==
    rep_defs[t]-1 places an EMPTY list, anything lower a NULL; a
    slot that reaches leaf depth contributes the value (or a null
    element when def < max_def)."""
    k = len(rep_defs)
    if k < 1 or any(d < 1 for d in rep_defs) \
            or sorted(rep_defs) != rep_defs:
        raise ValueError("bad repetition def ladder")
    records: list = []
    stack: list = []
    rec = None
    started = False
    for v, d, r in zip(slots, defs, reps):
        if r > k:
            raise ValueError("repetition level exceeds ladder depth")
        if r == 0:
            if started:
                records.append(rec)
            started = True
            stack = []
            if d >= rep_defs[0]:
                rec = []
                stack.append(rec)
            elif d == rep_defs[0] - 1:
                rec = []
                continue
            else:
                rec = None
                continue
        else:
            if r > len(stack):
                raise ValueError("repetition level without open list")
            del stack[r:]
        t = len(stack)
        while t < k:
            if d >= rep_defs[t]:
                new: list = []
                stack[t - 1].append(new)
                stack.append(new)
                t += 1
            elif d == rep_defs[t] - 1:
                stack[t - 1].append([])
                break
            else:
                stack[t - 1].append(None)
                break
        else:
            stack[k - 1].append(v if d == max_def else None)
    if started:
        records.append(rec)
    return records


def _byte_stream_split(data: bytes, pos: int, n: int, ptype: str,
                       type_length: int | None) -> list:
    """BYTE_STREAM_SPLIT (parquet-format Encodings.md): the k-th byte
    of every value is stored contiguously in stream k — k streams of
    n bytes each — which compresses floats far better than PLAIN.
    Reassemble by transposing the (width, n) byte matrix."""
    widths = {"FLOAT": 4, "DOUBLE": 8, "INT32": 4, "INT64": 8}
    if ptype in widths:
        w = widths[ptype]
    elif ptype == "FIXED_LEN_BYTE_ARRAY" and type_length:
        w = type_length
    else:
        raise ValueError(f"byte-stream-split on {ptype} unsupported")
    if pos + w * n > len(data):
        raise ValueError("byte-stream-split truncated")
    if n == 0:
        return []
    import numpy as np

    mat = np.frombuffer(data, dtype=np.uint8, count=w * n,
                        offset=pos).reshape(w, n)
    packed = mat.T.tobytes()
    if ptype == "FLOAT":
        return list(struct.unpack(f"<{n}f", packed))
    if ptype == "DOUBLE":
        return list(struct.unpack(f"<{n}d", packed))
    if ptype == "INT32":
        return list(struct.unpack(f"<{n}i", packed))
    if ptype == "INT64":
        return list(struct.unpack(f"<{n}q", packed))
    return [packed[i * w:(i + 1) * w] for i in range(n)]


def flba_decimal_unscaled(raw: bytes) -> int:
    """FIXED_LEN_BYTE_ARRAY decimal -> unscaled int (big-endian
    two's complement, parquet LogicalTypes.md)."""
    return int.from_bytes(raw, "big", signed=True)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = value = 0
    while True:
        if pos >= len(data) or shift > 70:
            raise ValueError("varint truncated")
        b = data[pos]
        value |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return value, pos
        shift += 7


def read_delta_binary_packed(data: bytes, pos: int,
                             n: int) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet-format Encodings.md): header =
    <block size in values> <miniblocks per block> <total count>
    <first value zigzag>; each block = <min delta zigzag>
    <bitwidth byte per miniblock> <bit-packed deltas LSB-first>."""
    block_size, pos = _read_uvarint(data, pos)
    n_mini, pos = _read_uvarint(data, pos)
    total, pos = _read_uvarint(data, pos)
    if n_mini == 0 or block_size % 128 or block_size % n_mini:
        raise ValueError("bad delta-binary-packed header")
    vals_per_mini = block_size // n_mini
    first_raw, pos = _read_uvarint(data, pos)
    out = [_zigzag_decode(first_raw)]
    while len(out) < total:
        min_raw, pos = _read_uvarint(data, pos)
        min_delta = _zigzag_decode(min_raw)
        if pos + n_mini > len(data):
            raise ValueError("delta miniblock widths truncated")
        widths = data[pos:pos + n_mini]
        pos += n_mini
        for w in widths:
            if len(out) >= total:
                # trailing miniblocks may still occupy bytes; spec
                # writers pad — consume and stop
                nbytes = (vals_per_mini * w + 7) // 8
                pos += nbytes
                continue
            nbytes = (vals_per_mini * w + 7) // 8
            if pos + nbytes > len(data):
                raise ValueError("delta miniblock truncated")
            if w == 0:
                deltas = [0] * vals_per_mini
            else:
                acc = int.from_bytes(data[pos:pos + nbytes], "little")
                mask = (1 << w) - 1
                deltas = [(acc >> (i * w)) & mask
                          for i in range(vals_per_mini)]
            pos += nbytes
            for d in deltas:
                if len(out) >= total:
                    break
                # wrapping int64 reconstruction (Encodings.md): the
                # writer computes deltas and min-delta offsets with
                # two's-complement wrap-around, so values spanning
                # more than 2^63 rebuild correctly only modulo 2^64
                v = (out[-1] + min_delta + d) & ((1 << 64) - 1)
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
    if n > total:
        raise ValueError("delta-binary-packed short of requested n")
    return out[:n], pos


def read_delta_length_byte_array(data: bytes, pos: int,
                                 n: int) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY: lengths as DELTA_BINARY_PACKED, then
    the concatenated bytes."""
    lengths, pos = read_delta_binary_packed(data, pos, n)
    out = []
    for ln in lengths:
        if ln < 0 or pos + ln > len(data):
            raise ValueError("delta-length byte array overrun")
        out.append(data[pos:pos + ln])
        pos += ln
    return out, pos


def read_delta_byte_array(data: bytes, pos: int,
                          n: int) -> tuple[list[bytes], int]:
    """DELTA_BYTE_ARRAY: prefix lengths (delta-packed) + suffixes as
    DELTA_LENGTH_BYTE_ARRAY; value = prefix of previous + suffix."""
    prefixes, pos = read_delta_binary_packed(data, pos, n)
    suffixes, pos = read_delta_length_byte_array(data, pos, n)
    out: list[bytes] = []
    prev = b""
    for pl, suf in zip(prefixes, suffixes):
        if pl < 0 or pl > len(prev):
            raise ValueError("delta-byte-array bad prefix length")
        prev = prev[:pl] + suf
        out.append(prev)
    return out, pos
