"""LZ4 block format, from scratch.

LZ4 is the other default big-data codec (Parquet LZ4_RAW, Kafka,
RocksDB); implemented from the PUBLIC lz4_Block_format.md spec:

* sequences of [token][literal-length ext*][literals][2-byte LE
  offset][match-length ext*] — token high nibble = literal length
  (15 ⇒ 255-extension bytes), low nibble = match length − 4
  (minmatch; 15 ⇒ extensions);
* the last sequence is literals-only (no offset/matchlen);
* offset 0 is invalid; overlapping matches (offset < length) copy
  byte-by-byte — the RLE idiom;
* encoder end-of-block rules honored: the last 5 bytes are always
  literals and no match starts within 12 bytes of the end (the
  spec's parsing-restriction margin), so any conformant decoder —
  including Arrow's, against which the tests cross-validate — accepts
  the output.

The encoder is a greedy 4-byte hash matcher; correctness policy is
decode(encode(x)) == x plus two-way cross-validation against Arrow's
native lz4_raw codec in tests.  Hostile input raises ``ValueError``
with every copy bounds-checked against a caller-supplied output cap.
"""

from __future__ import annotations

import struct

MAX_OUTPUT_BYTES = 1 << 28

_MINMATCH = 4
_LAST_LITERALS = 5
_MFLIMIT = 12


def lz4_compress_block(data: bytes) -> bytes:
    out = bytearray()
    n = len(data)

    def emit(lit_start: int, lit_end: int, mlen: int = 0,
             offset: int = 0) -> None:
        nonlocal out
        lit_len = lit_end - lit_start
        token_lit = min(lit_len, 15)
        token_mat = min(mlen - _MINMATCH, 15) if mlen else 0
        out.append((token_lit << 4) | token_mat)
        rem = lit_len - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out += data[lit_start:lit_end]
        if mlen:
            out += struct.pack("<H", offset)
            rem = mlen - _MINMATCH - 15
            while rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    if n < _MFLIMIT + 1:
        emit(0, n)
        return bytes(out)
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0
    limit = n - _MFLIMIT  # no match may start at/after this point
    while i < limit:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF \
                and data[cand:cand + 4] == key:
            mlen = 4
            max_len = n - _LAST_LITERALS - i
            while mlen < max_len and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            emit(lit_start, i, mlen, i - cand)
            i += mlen
            lit_start = i
        else:
            i += 1
    emit(lit_start, n)
    return bytes(out)


def lz4_decompress_block(data: bytes, expected: int) -> bytes:
    """Decode one LZ4 block; ``expected`` is the known uncompressed
    size (LZ4 blocks don't self-describe it — containers carry it)."""
    if expected > MAX_OUTPUT_BYTES:
        raise ValueError("lz4 output exceeds cap")
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated literal-length ext")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("literals overrun input")
        out += data[pos:pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise ValueError("truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4 match offset out of range")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated match-length ext")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MINMATCH
        if len(out) + mlen > expected:
            raise ValueError("lz4 match overruns expected output")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:
            for k in range(mlen):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(f"lz4 output {len(out)} != expected {expected}")
    return bytes(out)
