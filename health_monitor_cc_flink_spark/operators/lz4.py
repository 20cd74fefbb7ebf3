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


# -- xxHash32 (public algorithm; used by the LZ4 frame format) ---------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while pos + 16 <= n:
            for _ in range(1):
                pass
            (a, b, c, d) = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + a * _P2) & _M, 13) * _P1) & _M
            v2 = (_rotl((v2 + b * _P2) & _M, 13) * _P1) & _M
            v3 = (_rotl((v3 + c * _P2) & _M, 13) * _P1) & _M
            v4 = (_rotl((v4 + d * _P2) & _M, 13) * _P1) & _M
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 4 <= n:
        (w,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + w * _P3) & _M, 17) * _P4) & _M
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M, 11) * _P1) & _M
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


# -- LZ4 FRAME format (lz4_Frame_format.md) -----------------------------

_FRAME_MAGIC = 0x184D2204
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_compress(data: bytes, *, block_bytes: int = 1 << 16,
                       content_checksum: bool = True,
                       block_checksums: bool = False) -> bytes:
    """LZ4 frame writer: magic, FLG/BD descriptor with the xxh32
    header checksum byte, independent blocks (stored raw when
    compression does not help, high bit set), optional per-block and
    content xxh32 checksums, EndMark."""
    bd_id = next(k for k, v in sorted(_BD_SIZES.items())
                 if block_bytes <= v)
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    if block_checksums:
        flg |= 1 << 4
    if content_checksum:
        flg |= 1 << 2
    desc = bytes([flg, bd_id << 4])
    out = bytearray(struct.pack("<I", _FRAME_MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), block_bytes) if data else []:
        chunk = data[i:i + block_bytes]
        comp = lz4_compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            body = comp
        else:
            out += struct.pack("<I", len(chunk) | (1 << 31))
            body = chunk
        out += body
        if block_checksums:
            out += struct.pack("<I", xxh32(body))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """LZ4 frame reader: header checksum verified, stored and
    compressed blocks, optional block/content xxh32 checks."""
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _FRAME_MAGIC:
        raise ValueError("not an LZ4 frame")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("unsupported LZ4 frame version")
    independent = bool(flg & (1 << 5))
    block_checksums = bool(flg & (1 << 4))
    has_content_size = bool(flg & (1 << 3))
    content_checksum = bool(flg & (1 << 2))
    if flg & 1:
        raise ValueError("dictionary LZ4 frames unsupported")
    bd = data[5]
    max_block = _BD_SIZES.get(bd >> 4)
    if max_block is None:
        raise ValueError("bad LZ4 frame BD byte")
    pos = 6
    expected_size = None
    if has_content_size:
        (expected_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    hc = data[pos]
    pos += 1
    if (xxh32(data[4:pos - 1]) >> 8) & 0xFF != hc:
        raise ValueError("LZ4 frame header checksum mismatch")
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated LZ4 frame block header")
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:  # EndMark
            break
        stored = bool(word & (1 << 31))
        ln = word & 0x7FFFFFFF
        if ln > max_block + 16 or pos + ln > len(data):
            raise ValueError("LZ4 frame block overruns input")
        body = data[pos:pos + ln]
        pos += ln
        if block_checksums:
            if pos + 4 > len(data):
                raise ValueError("truncated LZ4 block checksum")
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(body) != bc:
                raise ValueError("LZ4 frame block checksum mismatch")
        if stored:
            out += body
        else:
            # linked blocks (block-independence unset) may copy from a
            # 64 KB window of PRIOR output; pass that history in
            history = b"" if independent else bytes(out[-65536:])
            out += _decompress_bounded(body, max_block, history)
        if len(out) > MAX_OUTPUT_BYTES:
            raise ValueError("LZ4 frame output cap exceeded")
    if content_checksum:
        if pos + 4 > len(data):
            raise ValueError("missing LZ4 content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != cc:
            raise ValueError("LZ4 content checksum mismatch")
    if expected_size is not None and len(out) != expected_size:
        raise ValueError("LZ4 content size mismatch")
    return bytes(out)


def _decompress_bounded(block: bytes, max_out: int,
                        history: bytes = b"") -> bytes:
    """Frame blocks don't carry their decoded size; decode with the
    spec's max-block bound instead of an exact expectation.  For
    linked-block frames ``history`` is the prior-output window that
    matches may reach back into."""
    h = len(history)
    out = bytearray(history)
    max_out += h
    pos = 0
    n = len(block)
    while pos < n:
        token = block[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated literal-length ext")
                b = block[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("literals overrun input")
        out += block[pos:pos + lit_len]
        pos += lit_len
        if pos == n:
            break
        if pos + 2 > n:
            raise ValueError("truncated match offset")
        (offset,) = struct.unpack_from("<H", block, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4 match offset out of range")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated match-length ext")
                b = block[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        mlen += _MINMATCH
        if len(out) + mlen > max_out:
            raise ValueError("lz4 block exceeds frame max block size")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:
            for k in range(mlen):
                out.append(out[start + k])
    return bytes(out[h:])
