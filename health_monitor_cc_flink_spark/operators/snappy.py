"""Snappy compression — block format + framing format, from scratch.

Snappy is the default codec of the big-data stack (Parquet, ORC,
Avro, LevelDB/RocksDB SSTs, Kafka message sets); a corpus engine that
walks foreign data files needs to read it without a native library.
Implemented from the PUBLIC format descriptions in google/snappy
(``format_description.txt`` block format, ``framing_format.txt``
stream format):

* block format — little-endian varint uncompressed-length preamble,
  then tagged elements: literals (tag ``00``, 6-bit length with 1-4
  extension bytes for 60-63), copy-1 (tag ``01``, 3-bit len-4, 11-bit
  offset), copy-2 (tag ``10``, 6-bit len-1, 16-bit LE offset), copy-4
  (tag ``11``, 32-bit LE offset).  Overlapping copies (offset < len,
  the RLE trick) are honored byte-by-byte.
* framing format — ``\\xff`` stream-identifier chunk ("sNaPpY"),
  compressed (``\\x00``) / uncompressed (``\\x01``) data chunks of at
  most 65536 uncompressed bytes, each guarded by the MASKED CRC-32C
  (Castagnoli, reflected 0x1EDC6F41; mask = rotr15 + 0xA282EAD8);
  padding/reserved-skippable chunks tolerated per spec.
* the encoder is a greedy 4-byte hash matcher — any spec-conformant
  encoding is valid; correctness is pinned by decode(encode(x)) == x
  plus hostile-input rejection, the same policy as the flate path.

Hostile input raises ``ValueError``; output length is preallocated
from the preamble and every copy is bounds-checked.
"""

from __future__ import annotations

import struct

MAX_OUTPUT_BYTES = 1 << 28

# -- CRC-32C (Castagnoli), reflected, init/final-xor 0xFFFFFFFF -------
_CRC32C_TABLE = []
for _b in range(256):
    _r = _b
    for _ in range(8):
        _r = (_r >> 1) ^ 0x82F63B78 if _r & 1 else _r >> 1
    _CRC32C_TABLE.append(_r)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- block format ------------------------------------------------------

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
        if pos >= len(data) or shift > 35:
            raise ValueError("bad snappy varint preamble")
        b = data[pos]
        value |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return value, pos
        shift += 7


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += struct.pack("<H", n)
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += struct.pack("<I", n)
    out += lit


def snappy_compress_block(data: bytes) -> bytes:
    """Greedy 4-byte-hash snappy block encoder."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend match
            mlen = 4
            while (i + mlen < n and mlen < 64
                   and data[cand + mlen] == data[i + mlen]):
                mlen += 1
            if i > lit_start:
                _emit_literal(out, data[lit_start:i])
            offset = i - cand
            if 4 <= mlen <= 11 and offset < (1 << 11):
                out.append(0x01 | ((mlen - 4) << 2)
                           | ((offset >> 8) << 5))
                out.append(offset & 0xFF)
            else:
                out.append(0x02 | ((mlen - 1) << 2))
                out += struct.pack("<H", offset)
            i += mlen
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


#: per-tag-byte decode plan, precomputed once (r17, guide §4.2): the
#: decode loop runs once per element (~1M elements per MB of dense
#: pages), so fold the kind/length bit-twiddling of all 256 tag bytes
#: into one table lookup.  mode 0 = short literal (ln = final length),
#: mode 1 = extended literal (ln = number of length bytes), mode
#: 2/3/4 = copy-1/2/4 (ln = final copy length).
def _build_tag_table() -> tuple:
    table = []
    for tag in range(256):
        kind = tag & 0x03
        if kind == 0:
            ln = tag >> 2
            table.append((1, ln - 59) if ln >= 60 else (0, ln + 1))
        elif kind == 1:
            table.append((2, 4 + ((tag >> 2) & 0x07)))
        elif kind == 2:
            table.append((3, (tag >> 2) + 1))
        else:
            table.append((4, (tag >> 2) + 1))
    return tuple(table)


_TAG_TABLE = _build_tag_table()


def snappy_decompress_block(data: bytes) -> bytes:
    expected, pos = _read_uvarint(data, 0)
    if expected > MAX_OUTPUT_BYTES:
        raise ValueError("snappy output exceeds cap")
    out = bytearray()
    n = len(data)
    tag_table = _TAG_TABLE
    while pos < n:
        mode, ln = tag_table[data[pos]]
        pos += 1
        if mode == 0:  # short literal, length from the tag byte
            end = pos + ln
            if end > n:
                raise ValueError("literal overruns input")
            out += data[pos:end]
            pos = end
        elif mode == 3:  # copy-2 (most common copy on real pages)
            if pos + 2 > n:
                raise ValueError("truncated copy-2")
            offset = data[pos] | (data[pos + 1] << 8)
            pos += 2
            if offset == 0 or offset > len(out):
                raise ValueError("snappy copy offset out of range")
            if len(out) + ln > expected:
                raise ValueError("snappy copy overruns output")
            start = len(out) - offset
            if offset >= ln:
                out += out[start:start + ln]
            else:  # overlapping copy: byte-at-a-time per spec
                for k in range(ln):
                    out.append(out[start + k])
        elif mode == 2:  # copy-1
            if pos + 1 > n:
                raise ValueError("truncated copy-1")
            offset = ((data[pos - 1] >> 5) << 8) | data[pos]
            pos += 1
            if offset == 0 or offset > len(out):
                raise ValueError("snappy copy offset out of range")
            if len(out) + ln > expected:
                raise ValueError("snappy copy overruns output")
            start = len(out) - offset
            if offset >= ln:
                out += out[start:start + ln]
            else:
                for k in range(ln):
                    out.append(out[start + k])
        elif mode == 1:  # extended literal, ln = number of length bytes
            if pos + ln > n:
                raise ValueError("truncated literal length")
            ext = int.from_bytes(data[pos:pos + ln], "little") + 1
            pos += ln
            end = pos + ext
            if end > n:
                raise ValueError("literal overruns input")
            out += data[pos:end]
            pos = end
        else:  # copy-4
            if pos + 4 > n:
                raise ValueError("truncated copy-4")
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy copy offset out of range")
            if len(out) + ln > expected:
                raise ValueError("snappy copy overruns output")
            start = len(out) - offset
            if offset >= ln:
                out += out[start:start + ln]
            else:
                for k in range(ln):
                    out.append(out[start + k])
        if len(out) > expected:
            raise ValueError("snappy output overruns preamble")
    if len(out) != expected:
        raise ValueError(
            f"snappy output {len(out)} != preamble {expected}")
    return bytes(out)


# -- framing format ----------------------------------------------------

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
MAX_CHUNK = 65536


def snappy_frame_compress(data: bytes, *,
                          chunk_bytes: int = MAX_CHUNK) -> bytes:
    """Snappy framing-format writer: stream identifier + one chunk
    per ``chunk_bytes`` slice, compressed form used when smaller."""
    if not 1 <= chunk_bytes <= MAX_CHUNK:
        raise ValueError("chunk_bytes out of spec range")
    out = bytearray(_STREAM_ID)
    for i in range(0, len(data), chunk_bytes) or [0]:
        chunk = data[i:i + chunk_bytes]
        crc = _masked_crc(chunk)
        comp = snappy_compress_block(chunk)
        if len(comp) < len(chunk):
            body = struct.pack("<I", crc) + comp
            out.append(0x00)
        else:
            body = struct.pack("<I", crc) + chunk
            out.append(0x01)
        out += len(body).to_bytes(3, "little") + body
    return bytes(out)


def snappy_frame_decompress(data: bytes) -> tuple[bytes, int]:
    """Framing-format reader -> (payload, n_data_chunks); every chunk
    CRC verified, skippable chunks (0x80-0xFD) skipped, reserved
    unskippable (0x02-0x7F) rejected per spec."""
    if data[:10] != _STREAM_ID:
        raise ValueError("missing snappy stream identifier")
    pos = 10
    out = bytearray()
    n_chunks = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            raise ValueError("chunk overruns input")
        body = data[pos:pos + ln]
        pos += ln
        if ctype in (0x00, 0x01):
            if ln < 4:
                raise ValueError("data chunk too short for CRC")
            (crc,) = struct.unpack_from("<I", body, 0)
            payload = body[4:]
            if ctype == 0x00:
                payload = snappy_decompress_block(payload)
            if len(payload) > MAX_CHUNK:
                raise ValueError("chunk exceeds 64 KiB uncompressed cap")
            if _masked_crc(payload) != crc:
                raise ValueError("snappy chunk CRC mismatch")
            out += payload
            n_chunks += 1
        elif ctype == 0xFF:
            if body != _STREAM_ID[4:]:
                raise ValueError("bad repeated stream identifier")
        elif ctype >= 0x80 or ctype == 0xFE:
            continue  # skippable
        else:
            raise ValueError(f"reserved unskippable chunk 0x{ctype:02x}")
        if len(out) > MAX_OUTPUT_BYTES:
            raise ValueError("snappy stream exceeds output cap")
    return bytes(out), n_chunks
