"""Windows BMP (DIB) encode + decode in pure numpy/stdlib.

The legacy raster format still common in crawled archives and
document dumps.  Implemented from the PUBLIC Windows BITMAPFILEHEADER
/ BITMAPINFOHEADER layout — structure-only, like TIFF:

* ``decode_bmp`` — BITMAPINFOHEADER (40-byte) DIBs: 8-bit paletted
  (BI_RGB or BI_RLE8 run-length) and 24-bit BGR (BI_RGB), bottom-up
  AND top-down (negative height) row orders, 4-byte row padding,
  palette lookup to (h, w, 3) RGB.
* ``encode_bmp`` — writes conformant files: 8-bit with a palette
  (BI_RGB or BI_RLE8) or 24-bit BGR; ``top_down=True`` emits the
  negative-height variant.
* ``rle8_encode`` / ``rle8_decode`` — BI_RLE8: (count, value) runs,
  escapes 0 0 = end of line, 0 1 = end of bitmap, 0 2 = delta move,
  0 n>=3 = absolute run padded to a word boundary.

Malformed input raises ``ValueError``; hostile dims/runs are capped so
crafted files flag the row, never OOM or overrun.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 26


def rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) uint8 index array (row 0 = BOTTOM row, as
    stored).  Pixels not painted by any run default to 0, matching the
    common renderer behavior for delta-skipped regions."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while True:
        if i + 2 > n:
            raise ValueError("truncated RLE8 stream")
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                raise ValueError("RLE8 run overruns row")
            out[y, x : x + c] = v
            x += c
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("RLE8 line count overruns image")
            continue
        if v == 1:  # end of bitmap
            return out
        if v == 2:  # delta
            if i + 2 > n:
                raise ValueError("truncated RLE8 delta")
            dx, dy = data[i], data[i + 1]
            i += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError("RLE8 delta overruns image")
            continue
        # absolute run of v pixels, padded to a word
        if y >= h or x + v > w:
            raise ValueError("RLE8 absolute run overruns row")
        if i + v > n:
            raise ValueError("truncated RLE8 absolute run")
        out[y, x : x + v] = np.frombuffer(data[i : i + v], dtype=np.uint8)
        x += v
        i += v + (v & 1)  # word padding


def rle8_encode(idx: np.ndarray) -> bytes:
    """(h, w) uint8 index rows (row 0 = bottom) -> BI_RLE8 bytes using
    encoded runs only (always legal; absolute runs are a decoder
    surface, exercised by tests with hand-built streams)."""
    h, w = idx.shape
    out = bytearray()
    for y in range(h):
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> uint8 (h, w, 3) RGB (8-bit paletted resolved) or
    (h, w, 3) for 24-bit; returned top-down regardless of storage
    order."""
    p = bytes(payload)
    if p[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    if len(p) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack("<I", p[10:14])[0]
    hdr_size = struct.unpack("<I", p[14:18])[0]
    if hdr_size < 40:
        raise ValueError("unsupported DIB header size")
    w, h_raw = struct.unpack("<ii", p[18:26])
    planes, bpp = struct.unpack("<HH", p[26:30])
    comp = struct.unpack("<I", p[30:34])[0]
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("invalid BMP dimensions")
    if planes != 1:
        raise ValueError("BMP planes must be 1")
    if w * h * 3 > MAX_PIXELS:
        raise ValueError("declared dimensions exceed decoder limit")
    if bpp == 8:
        if comp not in (0, 1):
            raise NotImplementedError(f"8-bit compression {comp} not supported")
        n_colors = struct.unpack("<I", p[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(p):
            raise ValueError("truncated BMP palette")
        quads = np.frombuffer(p[pal_off:pal_end], dtype=np.uint8).reshape(-1, 4)
        palette = quads[:, [2, 1, 0]]  # BGRx -> RGB
        if comp == 1:
            if top_down:
                raise ValueError("RLE8 with top-down rows is spec-invalid")
            idx = rle8_decode(p[data_off:], w, h)
        else:
            stride = (w + 3) & ~3
            need = stride * h
            if data_off + need > len(p):
                raise ValueError("truncated BMP pixel data")
            rows = np.frombuffer(
                p[data_off : data_off + need], dtype=np.uint8
            ).reshape(h, stride)[:, :w]
            idx = rows
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of range")
        img = palette[idx]
    elif bpp == 24:
        if comp != 0:
            raise NotImplementedError(f"24-bit compression {comp} not supported")
        stride = (w * 3 + 3) & ~3
        need = stride * h
        if data_off + need > len(p):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            p[data_off : data_off + need], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        img = rows[:, :, ::-1]  # BGR -> RGB
    else:
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    return np.ascontiguousarray(img if top_down else img[::-1])


def encode_bmp(arr, palette=None, compression: int = 0,
               top_down: bool = False) -> bytes:
    """(h, w) index array + ``palette`` (n<=256, 3 RGB) -> 8-bit BMP
    (BI_RGB or, with ``compression=1``, BI_RLE8); (h, w, 3) RGB ->
    24-bit BI_RGB.  Input is top-down; stored bottom-up unless
    ``top_down`` (negative height; BI_RGB only)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if compression == 1 and top_down:
        raise ValueError("RLE8 cannot be stored top-down")
    if palette is not None:
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError("palette must be (n<=256, 3) uint8")
        if a.ndim != 2:
            raise ValueError("palette encoding needs a (h,w) index array")
        if int(a.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        h, w = a.shape
        bpp = 8
        quads = np.zeros((pal.shape[0], 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRx
        pal_bytes = quads.tobytes()
        rows = a if top_down else a[::-1]
        if compression == 1:
            pix = rle8_encode(rows)
        else:
            stride = (w + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, :w] = rows
            pix = padded.tobytes()
    else:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("24-bit encoding needs a (h,w,3) RGB array")
        if compression != 0:
            raise ValueError("24-bit BMP supports BI_RGB only")
        h, w = a.shape[:2]
        bpp = 24
        pal_bytes = b""
        rows = a if top_down else a[::-1]
        stride = (w * 3 + 3) & ~3
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = rows[:, :, ::-1].reshape(h, w * 3)
        pix = padded.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, compression,
        len(pix), 2835, 2835,
        len(pal_bytes) // 4, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(pix), 0, 0,
                           data_off)
    return file_hdr + info + pal_bytes + pix
