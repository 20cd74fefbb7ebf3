"""Portable RoaringBitmap (+ Delta's 64-bit RoaringBitmapArray) and
Z85 — from the PUBLIC RoaringFormatSpec, the Delta Lake PROTOCOL.md
deletion-vector sections, and the ZeroMQ Z85 spec (32/Z85).

Modern Delta tables mark deleted rows with DELETION VECTORS instead
of rewriting files: an ``add`` action carries a descriptor whose
bitmap — a sequence of standard 32-bit portable roaring bitmaps
keyed by the row-index high word — lives inline (Z85) or in a
sidecar ``.bin``.  A reader that ignores them over-reports rows the
same way a v1 Iceberg walk does.

* 32-bit portable roaring: cookie 12346 (no runs, +4-byte container
  count) or 12347 (run bitset follows, count-1 in the high 16 bits);
  per-container 2-byte key + 2-byte cardinality-1 descriptors;
  offset header; array (<=4096 u16 values), bitmap (8 KiB), and run
  (n_runs x (start, length-1)) containers — all little-endian;
* RoaringBitmapArray (Delta PROTOCOL.md): magic 1681511377 LE +
  8-byte bitmap count, then each 32-bit bitmap in portable form,
  index i covering values [i<<32, (i+1)<<32);
* Z85: 4 bytes -> 5 chars over the 85-char ZeroMQ alphabet,
  big-endian per group (UUIDs and inline DVs in descriptors).

Encoder + decoder both live here (no reference implementation ships
in this environment, so the format is pinned by spec-structure tests
and exact round-trips; hostile input raises ``ValueError``).
"""

from __future__ import annotations

import struct

MAGIC = 1681511377
_COOKIE_RUNS = 12347
_COOKIE_NO_RUNS = 12346
MAX_CONTAINERS = 1 << 16
MAX_VALUES = 1 << 26

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack_from(">I", data, i)
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 text must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            if c not in _Z85_INV:
                raise ValueError("z85 character out of alphabet")
            v = v * 85 + _Z85_INV[c]
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


def _serialize32(values: list[int]) -> bytes:
    """Sorted distinct u32 values -> portable 32-bit roaring bytes
    (no-run form: array containers <= 4096, else bitmap)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<I", _COOKIE_NO_RUNS)
    out += struct.pack("<I", len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: position of each container from stream start
    pos = 8 + 4 * len(keys) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(pos)
        card = len(containers[k])
        pos += 2 * card if card <= 4096 else 8192
    for off in offsets:
        out += struct.pack("<I", off)
    for k in keys:
        lows = containers[k]
        if len(lows) <= 4096:
            out += struct.pack(f"<{len(lows)}H", *lows)
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            out += bits
    return bytes(out)


def _deserialize32(data: bytes, pos: int) -> tuple[list[int], int]:
    if pos + 4 > len(data):
        raise ValueError("roaring cookie truncated")
    (cookie,) = struct.unpack_from("<I", data, pos)
    has_runs = (cookie & 0xFFFF) == _COOKIE_RUNS
    if has_runs:
        n = (cookie >> 16) + 1
        pos += 4
        run_bits = data[pos:pos + (n + 7) // 8]
        if len(run_bits) < (n + 7) // 8:
            raise ValueError("roaring run bitset truncated")
        pos += (n + 7) // 8
    elif cookie == _COOKIE_NO_RUNS:
        pos += 4
        if pos + 4 > len(data):
            raise ValueError("roaring count truncated")
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_bits = b""
    else:
        raise ValueError("bad roaring cookie")
    if n > MAX_CONTAINERS:
        raise ValueError("roaring container count out of range")
    if pos + 4 * n > len(data):
        raise ValueError("roaring descriptors truncated")
    desc = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, pos + 4 * i)
        desc.append((k, cm1 + 1))
    pos += 4 * n
    # offset header present when no runs, or >= 4 containers
    if not has_runs or n >= 4:
        if pos + 4 * n > len(data):
            raise ValueError("roaring offsets truncated")
        pos += 4 * n
    values: list[int] = []
    for i, (k, card) in enumerate(desc):
        is_run = bool(run_bits and
                      run_bits[i // 8] & (1 << (i % 8)))
        base = k << 16
        if is_run:
            if pos + 2 > len(data):
                raise ValueError("run count truncated")
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            if pos + 4 * n_runs > len(data):
                raise ValueError("run pairs truncated")
            for r in range(n_runs):
                start, lm1 = struct.unpack_from(
                    "<HH", data, pos + 4 * r)
                values.extend(base + start + j
                              for j in range(lm1 + 1))
            pos += 4 * n_runs
        elif card <= 4096:
            if pos + 2 * card > len(data):
                raise ValueError("array container truncated")
            values.extend(
                base + v for v in struct.unpack_from(
                    f"<{card}H", data, pos))
            pos += 2 * card
        else:
            if pos + 8192 > len(data):
                raise ValueError("bitmap container truncated")
            chunk = data[pos:pos + 8192]
            pos += 8192
            for byte_i in range(8192):
                b = chunk[byte_i]
                while b:
                    low = b & -b
                    values.append(base + (byte_i << 3)
                                  + low.bit_length() - 1)
                    b ^= low
        if len(values) > MAX_VALUES:
            raise ValueError("roaring value cap exceeded")
    return values, pos


def serialize_bitmap_array(values: list[int]) -> bytes:
    """Sorted distinct u64 row indexes -> Delta RoaringBitmapArray
    bytes (magic + count + per-high-word 32-bit bitmaps)."""
    values = sorted(set(values))
    if values and (values[0] < 0 or values[-1] >> 32 >= 1 << 31):
        raise ValueError("row index out of range")
    groups: dict[int, list[int]] = {}
    for v in values:
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_maps = (max(groups) + 1) if groups else 0
    if n_maps > 1 << 20:
        # same cap as deserialize_bitmap_array — a lone huge high
        # word would otherwise loop emitting 2^31 empty bitmaps
        raise ValueError("bitmap count out of range")
    out = bytearray(struct.pack("<Iq", MAGIC, n_maps))
    for i in range(n_maps):
        out += _serialize32(groups.get(i, []))
    return bytes(out)


def deserialize_bitmap_array(data: bytes) -> list[int]:
    if len(data) < 12:
        raise ValueError("bitmap array header truncated")
    magic, n_maps = struct.unpack_from("<Iq", data, 0)
    if magic != MAGIC:
        raise ValueError("bad bitmap array magic")
    if not 0 <= n_maps <= 1 << 20:
        raise ValueError("bitmap count out of range")
    pos = 12
    values: list[int] = []
    for i in range(n_maps):
        vals32, pos = _deserialize32(data, pos)
        values.extend((i << 32) + v for v in vals32)
        if len(values) > MAX_VALUES:
            raise ValueError("bitmap array value cap exceeded")
    if pos != len(data):
        raise ValueError("trailing bytes after bitmap array")
    return values
