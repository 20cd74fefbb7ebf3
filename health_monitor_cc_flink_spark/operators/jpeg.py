"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) encode + decode in pure numpy.

No media library: the container has no PIL/libjpeg, and the multimodal
story needs the one format real corpora actually contain.  Same design
as the PNG/APNG/WAV codecs in ``multimodal.py`` — a spec-correct,
deterministic subset implemented from the PUBLIC standard, hash-gated
end-to-end against a closed-form DuckDB oracle:

* **Encoder** (``encode_jpeg_gray``): 8-bit grayscale, single scan,
  baseline sequential DCT.  Level shift, vectorized 8x8 orthonormal
  DCT-II (one einsum over all blocks), quantization with the Annex K
  luminance table, zigzag, differential DC + run-length AC Huffman
  coding with the Annex K luminance code tables, 0xFF byte stuffing.
  Edge-replicate padding for dims not a multiple of 8.
* **Decoder** (``decode_jpeg_gray``): marker parse (SOI/APP/COM/DQT/
  SOF0/DHT/SOS/EOI), canonical Huffman decode (mincode/maxcode/valptr,
  T.81 F.2.2.3), dequantize, vectorized IDCT, crop.  Tables are read
  from the FILE, so any baseline grayscale JPEG decodes, not just our
  own.  Progressive (SOF2), multi-component scans, 12-bit precision,
  arithmetic coding and restart markers raise ``NotImplementedError``
  explicitly; corrupt streams raise ``ValueError`` so the feature path
  can flag the row instead of aborting the job (JPEG has no CRC).
* **Coefficient-space path** (``encode_jpeg_from_qcoeffs`` /
  ``decode_jpeg_coeffs``): the entropy layer is LOSSLESS on quantized
  coefficients, so tests pin exact coefficient roundtrips (exercising
  ZRL runs, EOB, byte stuffing, DC prediction) independently of the
  lossy DCT path.

Scale: entropy coding is per-payload Python (a few hundred symbols for
the flat-block gate images), everything block-parallel is numpy; the
whole decode runs inside Arrow ``mapInPandas`` batches like the PNG
path — CPU-bound map work with no shuffle.

Parity anchor: the reference pipeline treats media as opaque bytes
(tables.tf defines no media type); this is part of the beyond-reference
training-data surface mandated by SURVEY.md §6.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Constants from the public spec (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

#: Annex K Table K.1 — luminance quantization table, row-major.
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

#: Annex K Table K.3 — luminance DC: BITS (codes per length 1..16), HUFFVAL.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

#: Annex K Table K.5 — luminance AC: BITS, HUFFVAL (162 run/size symbols).
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """T.81 Figure A.6 zigzag as flat row-major indices, derived (not
    transcribed): diagonal s=r+c, even diagonals run bottom-left to
    top-right."""
    order = []
    for s in range(15):
        rs = (
            range(min(s, 7), max(0, s - 7) - 1, -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
        order.extend(r * 8 + (s - r) for r in rs)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

#: Decode-side cap on declared pixel count (64 Mpx ≈ 256 MB of int32
#: coefficients): beyond this a hostile SOF0 would OOM the executor
#: before any entropy data is validated.
MAX_PIXELS = 1 << 26

_POW2 = 1 << np.arange(25, dtype=np.int64)[::-1]  # MSB-first bit weights


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: F = C @ B @ C.T, B = C.T @ F @ C."""
    j = np.arange(8, dtype=np.float64)
    c = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / 16) * np.sqrt(2.0 / 8)
    c[0, :] /= np.sqrt(2.0)
    return c


_DCT = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman machinery (T.81 Annex C table construction, F.2.2.3 decode)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment per Annex C."""
    if sum(bits) != len(vals):
        raise ValueError("huffman BITS/HUFFVAL mismatch")
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        if bits[length - 1] > (1 << length) - code:
            raise ValueError("huffman table overflows code space")
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """mincode/maxcode/valptr canonical decoder (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        _canonical_codes(bits, vals)  # validates
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, bits: np.ndarray, pos: int) -> tuple[int, int]:
        code = 0
        n = len(bits)
        for length in range(1, 17):
            if pos >= n:
                raise ValueError("truncated entropy stream")
            code = (code << 1) | int(bits[pos])
            pos += 1
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]], pos
        raise ValueError("invalid huffman code")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1 bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend_bits(v: int, cat: int) -> int:
    """Value -> cat-bit raw code (negative values one's-complemented)."""
    return v if v >= 0 else v + (1 << cat) - 1


def _receive_extend(raw: int, cat: int) -> int:
    return raw if raw >= (1 << (cat - 1)) else raw - (1 << cat) + 1


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _blockify(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    """uint8 (h, w) -> float64 (nblocks, 8, 8) with edge-replicate pad."""
    h, w = arr.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    bh, bw = arr.shape[0] // 8, arr.shape[1] // 8
    blocks = arr.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks.astype(np.float64), bh, bw


def quantized_coeffs(arr: np.ndarray, quant: np.ndarray = STD_LUMA_QUANT) -> np.ndarray:
    """Forward path up to (and including) quantization: (nblocks, 8, 8)
    int32 quantized coefficients in natural (row, col) order."""
    blocks, _, _ = _blockify(np.asarray(arr, dtype=np.uint8))
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks - 128.0, _DCT)
    return np.round(coeffs / quant).astype(np.int32)


#: Canonical code dicts for the fixed Annex K tables, derived once at
#: import (encode_jpeg_gray runs once per row inside mapInPandas).
_DC_CODES = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
_AC_CODES = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)


def _entropy_encode(qc_flat: np.ndarray) -> bytes:
    """(nblocks, 64) zigzag-ordered quantized coeffs -> entropy bytes."""
    dc_codes, ac_codes = _DC_CODES, _AC_CODES
    w = _BitWriter()
    pred = 0
    for blk in qc_flat:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        cat = _category(diff)
        code, length = dc_codes[cat]
        w.put(code, length)
        if cat:
            w.put(_extend_bits(diff, cat), cat)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                w.put(code, length)
                run -= 16
            cat = _category(v)
            code, length = ac_codes[(run << 4) | cat]
            w.put(code, length)
            w.put(_extend_bits(v, cat), cat)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            w.put(code, length)
    return w.flush()


def _segments(w: int, h: int, quant: np.ndarray, data: bytes) -> bytes:
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, b"\x00" + bytes(quant.reshape(-1)[ZIGZAG].astype(np.uint8)))  # DQT
    out += seg(
        0xC0,  # SOF0: 8-bit, 1 component, no subsampling, qtable 0
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )
    out += seg(0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))  # DHT dc0
    out += seg(0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))  # DHT ac0
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(arr: np.ndarray, quant: np.ndarray = STD_LUMA_QUANT) -> bytes:
    """8-bit grayscale array -> complete baseline JPEG bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape
    qc = quantized_coeffs(arr, quant)
    data = _entropy_encode(qc.reshape(-1, 64)[:, ZIGZAG])
    return _segments(w, h, quant, data)


def encode_jpeg_from_qcoeffs(
    qc: np.ndarray, w: int, h: int, quant: np.ndarray = STD_LUMA_QUANT
) -> bytes:
    """Entropy-encode GIVEN quantized coefficients (nblocks, 8, 8) —
    the lossless coefficient-space path used by roundtrip pins."""
    qc = np.asarray(qc, dtype=np.int64)
    if qc.shape != (((h + 7) // 8) * ((w + 7) // 8), 8, 8):
        raise ValueError("qcoeffs shape does not match dims")
    data = _entropy_encode(qc.reshape(-1, 64)[:, ZIGZAG])
    return _segments(w, h, quant, data)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

_UNSUPPORTED_SOF = {
    0xC1: "extended sequential",
    0xC2: "progressive",
    0xC3: "lossless",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _parse_segments(payload: bytes):
    """Yield (marker, payload_bytes, scan_data) walking the stream;
    scan_data is non-None only for SOS."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        while i + 1 < n and payload[i + 1] == 0xFF:  # legal fill bytes
            i += 1
        if i + 1 >= n:
            raise ValueError("truncated marker")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: no payload
            continue
        if i + 2 > n:
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(payload[i : i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated segment")
        body = payload[i + 2 : i + seglen]
        i += seglen
        if marker != 0xDA:
            yield marker, body, None
            continue
        # entropy-coded scan: unstuff until the next real marker
        scan = bytearray()
        while i < n:
            b = payload[i]
            if b != 0xFF:
                scan.append(b)
                i += 1
                continue
            nxt = payload[i + 1] if i + 1 < n else None
            if nxt == 0x00:
                scan.append(0xFF)
                i += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("restart markers not supported")
            else:
                break
        yield marker, body, bytes(scan)


def decode_jpeg_coeffs(payload: bytes):
    """Parse + entropy-decode a baseline grayscale JPEG.

    Returns ``(qcoeffs, quant, w, h)`` with qcoeffs (nblocks, 8, 8)
    int32 in natural order — the exact quantized coefficients, before
    any lossy arithmetic, so coefficient roundtrips can be pinned
    bit-for-bit.  Malformed input raises ``ValueError`` (never
    ``IndexError``), so callers can flag corrupt rows uniformly."""
    try:
        return _decode_jpeg_coeffs(payload)
    except IndexError as exc:  # any residual short-read on hostile bytes
        raise ValueError(f"malformed JPEG stream: {exc}") from exc


def _decode_jpeg_coeffs(payload: bytes):
    payload = bytes(payload)
    quant_tables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    dims = None
    qsel = 0
    dc_id = ac_id = 0
    scan = None
    for marker, body, scan_data in _parse_segments(payload):
        if marker in _UNSUPPORTED_SOF:
            raise NotImplementedError(f"{_UNSUPPORTED_SOF[marker]} JPEG not supported")
        if marker == 0xC0:  # SOF0
            if len(body) < 9:
                raise ValueError("truncated SOF0 segment")
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise NotImplementedError("only single-component (grayscale) scans")
            if w == 0 or h == 0:
                # T.81 allows height 0 (deferred to a DNL marker); the
                # stats contract needs real dims, so flag, don't crash
                raise ValueError("zero image dimension (DNL-deferred height?)")
            qsel = body[8]
            dims = (w, h)
        elif marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                if j + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                quant_tables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                if j + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                if j + 17 + nv > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                j += 17 + nv
        elif marker == 0xDA:  # SOS
            if len(body) < 6:
                raise ValueError("truncated SOS segment")
            if body[0] != 1:
                raise NotImplementedError("only single-component scans")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan = scan_data
    if dims is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    if qsel not in quant_tables or (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("scan references undefined tables")
    w, h = dims
    if w * h > MAX_PIXELS:
        # hostile declared dims would drive a multi-GB coefficient
        # allocation before a single scan bit is read — flag, don't OOM
        raise ValueError(f"declared dimensions {w}x{h} exceed decoder limit")
    bw, bh = (w + 7) // 8, (h + 7) // 8
    dc_dec, ac_dec = huff[(0, dc_id)], huff[(1, ac_id)]
    bits = np.unpackbits(np.frombuffer(scan, dtype=np.uint8))
    qc = np.zeros((bh * bw, 64), dtype=np.int32)
    pos, pred = 0, 0

    def read_raw(pos: int, cat: int) -> tuple[int, int]:
        if pos + cat > len(bits):
            raise ValueError("truncated entropy stream")
        return int(bits[pos : pos + cat] @ _POW2[-cat:]), pos + cat

    for b in range(bh * bw):
        cat, pos = dc_dec.decode(bits, pos)
        if cat > 11:
            raise ValueError("invalid DC category")
        diff = 0
        if cat:
            raw, pos = read_raw(pos, cat)
            diff = _receive_extend(raw, cat)
        pred += diff
        qc[b, 0] = pred
        k = 1
        while k < 64:
            rs, pos = ac_dec.decode(bits, pos)
            run, cat = rs >> 4, rs & 0x0F
            if cat == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run overflows block")
            raw, pos = read_raw(pos, cat)
            qc[b, k] = _receive_extend(raw, cat)
            k += 1
    out = np.zeros((bh * bw, 64), dtype=np.int32)
    out[:, ZIGZAG] = qc
    return out.reshape(-1, 8, 8), quant_tables[qsel], w, h


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline grayscale JPEG bytes -> uint8 (h, w) pixel array."""
    qc, quant, w, h = decode_jpeg_coeffs(payload)
    coeffs = qc.astype(np.float64) * quant
    blocks = np.einsum("ji,njk,kl->nil", _DCT, coeffs, _DCT)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    img = (
        blocks.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    return np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)[:h, :w]
