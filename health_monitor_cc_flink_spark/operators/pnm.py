"""Netpbm (PNM) and QOI image codecs in pure numpy/stdlib.

Two small LOSSLESS raster formats real corpora carry:

* **PNM** (public Netpbm spec): P1/P2/P3 ASCII and P4/P5/P6 binary
  variants — bitmap, graymap, pixmap — with comment handling, maxval
  up to 65535 (16-bit samples are big-endian in the binary forms,
  P5/P6), and P4's MSB-first packed rows.  The academic-dataset
  staple.
* **QOI** (the public "Quite OK Image" 1.0 spec, qoiformat.org): the
  byte-oriented lossless format: 14-byte header, 8 op kinds
  (QOI_OP_RGB / RGBA / INDEX / DIFF / LUMA / RUN), the 64-entry
  running-pixel index keyed by (3r+5g+7b+11a) %% 64, and the 8-byte
  end marker.

Both decoders raise ``ValueError`` on malformed input under explicit
dimension caps; encoders are deterministic — the synth/oracle vehicle,
like every codec in this repo.
"""

from __future__ import annotations

import re

import numpy as np

MAX_PIXELS = 1 << 26


# ---------------------------------------------------------------------------
# PNM
# ---------------------------------------------------------------------------


def _pnm_tokens(data: bytes, n: int, start: int):
    """Yield ``n`` whitespace-separated ASCII tokens starting at
    ``start``, skipping '#' comments; returns (tokens, next_pos)."""
    toks = []
    i = start
    ln = len(data)
    while len(toks) < n:
        while i < ln and data[i : i + 1].isspace():
            i += 1
        if i < ln and data[i] == 0x23:  # '#'
            while i < ln and data[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < ln and not data[j : j + 1].isspace() and data[j] != 0x23:
            j += 1
        if j == i:
            raise ValueError("truncated PNM header/ASCII data")
        toks.append(data[i:j])
        i = j
    return toks, i


def decode_pnm(payload: bytes) -> np.ndarray:
    """PNM bytes -> ndarray: (h, w) for P1/P2/P4/P5, (h, w, 3) for
    P3/P6; dtype uint8 (maxval <= 255) or uint16.  P1/P4 return 0/1
    values (bitmap convention: 1 = black, kept as stored)."""
    p = bytes(payload)
    if len(p) < 2 or p[0:1] != b"P" or p[1] not in b"123456":
        raise ValueError("not a PNM: bad magic")
    kind = p[1] - 0x30
    bitmap = kind in (1, 4)
    color = kind in (3, 6)
    n_head = 2 if bitmap else 3
    toks, pos = _pnm_tokens(p, n_head, 2)
    w, h = int(toks[0]), int(toks[1])
    maxval = 1 if bitmap else int(toks[2])
    if w <= 0 or h <= 0 or w * h * (3 if color else 1) > MAX_PIXELS:
        raise ValueError("PNM dimensions invalid or exceed cap")
    if not 1 <= maxval <= 65535:
        raise ValueError("PNM maxval out of range")
    spp = 3 if color else 1
    n_vals = w * h * spp
    if kind in (1, 2, 3):  # ASCII
        vals, _ = _pnm_tokens(p, n_vals, pos)
        arr = np.array([int(v) for v in vals], dtype=np.int64)
    elif kind == 4:  # packed bitmap: rows padded to whole bytes
        # exactly ONE whitespace byte separates header from raster
        pos += 1
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        if pos + need > len(p):
            raise ValueError("truncated P4 raster")
        rows = np.frombuffer(p[pos : pos + need], dtype=np.uint8).reshape(
            h, row_bytes
        )
        bits = np.unpackbits(rows, axis=1)[:, :w]
        return bits.astype(np.uint8)
    else:  # P5/P6 binary
        pos += 1
        sample = 2 if maxval > 255 else 1
        need = n_vals * sample
        if pos + need > len(p):
            raise ValueError("truncated PNM raster")
        dt = np.dtype(">u2") if sample == 2 else np.dtype(np.uint8)
        arr = np.frombuffer(p[pos : pos + need], dtype=dt).astype(np.int64)
    if arr.min(initial=0) < 0 or int(arr.max(initial=0)) > maxval:
        raise ValueError("PNM sample exceeds maxval")
    out = arr.astype(np.uint16 if maxval > 255 else np.uint8)
    if color:
        return out.reshape(h, w, 3)
    return out.reshape(h, w)


def encode_pnm(arr: np.ndarray, ascii_form: bool = False,
               maxval: int | None = None) -> bytes:
    """(h, w) gray / 0-1 bitmap or (h, w, 3) RGB -> PNM bytes.  uint16
    input writes maxval 65535 big-endian (binary forms only); a (h, w)
    array whose values are all 0/1 with ``maxval=1`` writes P1/P4."""
    a = np.asarray(arr)
    color = a.ndim == 3
    if color and a.shape[2] != 3:
        raise ValueError("encode_pnm needs (h,w) or (h,w,3)")
    if maxval is None:
        maxval = 65535 if a.dtype == np.uint16 else 255
    bitmap = maxval == 1 and not color
    h, w = a.shape[:2]
    if int(a.max(initial=0)) > maxval:
        raise ValueError("sample exceeds maxval")
    if bitmap:
        if ascii_form:
            body = b"\n".join(
                b" ".join(b"%d" % v for v in row) for row in a
            )
            return b"P1\n%d %d\n" % (w, h) + body + b"\n"
        packed = np.packbits(a.astype(np.uint8), axis=1)
        return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
    kind_a, kind_b = (b"P3", b"P6") if color else (b"P2", b"P5")
    head = b"%s\n# synth\n%d %d\n%d\n" % (
        kind_a if ascii_form else kind_b, w, h, maxval
    )
    flat = a.reshape(-1)
    if ascii_form:
        if maxval > 255:
            raise ValueError("ASCII 16-bit PNM not emitted by this writer")
        body = b"\n".join(
            b" ".join(b"%d" % v for v in flat[i : i + 12])
            for i in range(0, len(flat), 12)
        )
        return head + body + b"\n"
    if maxval > 255:
        return head + flat.astype(">u2").tobytes()
    return head + flat.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# QOI (qoiformat.org, spec v1.0)
# ---------------------------------------------------------------------------

_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w, 4) RGBA -> QOI bytes (channels
    3/4, colorspace 0)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("encode_qoi needs (h,w,3) or (h,w,4) uint8")
    h, w, ch = a.shape
    out = bytearray(_QOI_MAGIC)
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += bytes([ch, 0])
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = a.reshape(-1, ch)
    for px in flat:
        cur = (int(px[0]), int(px[1]), int(px[2]),
               int(px[3]) if ch == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _qoi_hash(*cur)
        if index[idx] == cur:
            out.append(idx)  # QOI_OP_INDEX
        else:
            index[idx] = cur
            r, g, b, al = cur
            pr, pg, pb, pa = prev
            if al == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                               | (db + 2))  # QOI_OP_DIFF
                elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                      and -8 <= db - dg <= 7):
                    out.append(0x80 | (dg + 32))  # QOI_OP_LUMA
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes([0xFE, r, g, b])  # QOI_OP_RGB
            else:
                out += bytes([0xFF, r, g, b, al])  # QOI_OP_RGBA
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _QOI_END
    return bytes(out)


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI bytes -> uint8 (h, w, channels) array (3 or 4 channels, as
    stored)."""
    p = bytes(payload)
    if len(p) < 14 + 8 or p[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI: bad magic or truncated")
    w = int.from_bytes(p[4:8], "big")
    h = int.from_bytes(p[8:12], "big")
    ch, colorspace = p[12], p[13]
    if ch not in (3, 4) or colorspace not in (0, 1):
        raise ValueError("bad QOI header fields")
    if w <= 0 or h <= 0 or w * h * ch > MAX_PIXELS:
        raise ValueError("QOI dimensions invalid or exceed cap")
    if p[-8:] != _QOI_END:
        raise ValueError("QOI end marker missing")
    data = p[14:-8]
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i = 0
    k = 0
    n = len(data)
    while k < n_px:
        if i >= n:
            raise ValueError("QOI stream ends before all pixels")
        byte = data[i]
        i += 1
        if byte == 0xFE:  # RGB
            if i + 3 > n:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[i], data[i + 1], data[i + 2]
            i += 3
        elif byte == 0xFF:  # RGBA
            if i + 4 > n:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = data[i], data[i + 1], data[i + 2], data[i + 3]
            i += 4
        else:
            tag = byte >> 6
            if tag == 0:  # INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:  # LUMA
                if i >= n:
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                second = data[i]
                i += 1
                r = (r + dg + ((second >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (second & 0xF) - 8) % 256
            else:  # RUN
                run = (byte & 0x3F) + 1
                if k + run > n_px:
                    raise ValueError("QOI run overruns image")
                out[k : k + run] = (r, g, b, a)
                k += run
                continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        out[k] = (r, g, b, a)
        k += 1
    img = out.reshape(h, w, 4)
    return np.ascontiguousarray(img[:, :, :ch])
