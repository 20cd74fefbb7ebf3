"""Truevision TGA (Targa) raster decode + build.

TGA is the lossless interchange raster game/VFX corpora carry
(textures, render output); the PUBLIC Truevision TGA 2.0 spec is an
18-byte little-endian header + optional colormap + pixel data:

* image types 1 (colormapped), 2 (truecolor BGR/BGRA), 3 (grayscale)
  and their RLE forms 9/10/11 — RLE packets are a count byte whose
  high bit selects run (one pixel repeated count+1 times) vs raw
  (count+1 literal pixels), packets never crossing the image end;
* pixel depths 8 (gray / colormap index), 24 (BGR), 32 (BGRA);
* descriptor bit 5 selects top-to-bottom vs the default
  bottom-to-top row origin — decode normalizes to top-down;
* the optional TGA 2.0 footer ("TRUEVISION-XFILE.\\0") tolerated.

Decoded output is row-major top-down per-pixel channel tuples in
RGB(A)/gray order.  Hostile input raises ``ValueError``; dimensions
and RLE expansion are capped.
"""

from __future__ import annotations

import struct

MAX_DIM = 1 << 14
MAX_PIXELS = 1 << 24

_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def build_tga(*, image_type: int, width: int, height: int,
              pixels: list[tuple], palette: list[tuple] | None = None,
              top_down: bool = True, footer: bool = False,
              image_id: bytes = b"") -> bytes:
    """Deterministic TGA writer.  ``pixels`` is row-major TOP-DOWN:
    ints for gray/index types, (r,g,b) or (r,g,b,a) for truecolor.
    For colormapped types pass ``palette`` as [(r,g,b), ...] and
    pixel values as indices.  RLE types (9/10/11) are encoded with
    maximal runs."""
    base = image_type & 0x07
    rle = image_type & 0x08
    if base == 1:
        if palette is None:
            raise ValueError("colormapped TGA needs a palette")
        depth, cm_type = 8, 1
        cm_spec = struct.pack("<HHB", 0, len(palette), 24)
    else:
        palette = None
        cm_type = 0
        cm_spec = struct.pack("<HHB", 0, 0, 0)
        if base == 3:
            depth = 8
        else:
            depth = 32 if (pixels and len(pixels[0]) == 4) else 24
    descriptor = (0x20 if top_down else 0x00) | (
        0x08 if depth == 32 else 0x00)
    hdr = (struct.pack("<BBB", len(image_id), cm_type, image_type)
           + cm_spec
           + struct.pack("<HHHHBB", 0, 0, width, height, depth,
                         descriptor))
    body = bytearray(hdr + image_id)
    if palette is not None:
        for r, g, b in palette:
            body += struct.pack("BBB", b, g, r)

    def pack_px(p) -> bytes:
        if depth == 8:
            return struct.pack("B", p if isinstance(p, int) else p[0])
        if depth == 24:
            r, g, b = p
            return struct.pack("BBB", b, g, r)
        r, g, b, a = p
        return struct.pack("BBBB", b, g, r, a)

    rows = [pixels[y * width:(y + 1) * width] for y in range(height)]
    if not top_down:
        rows = rows[::-1]
    if not rle:
        for row in rows:
            for p in row:
                body += pack_px(p)
    else:
        for row in rows:  # RLE packets must not cross scan lines
            x = 0
            while x < width:
                run = 1
                while (x + run < width and run < 128
                       and row[x + run] == row[x]):
                    run += 1
                if run >= 2:
                    body += struct.pack("B", 0x80 | (run - 1))
                    body += pack_px(row[x])
                    x += run
                else:
                    lit = 1
                    while (x + lit < width and lit < 128
                           and (x + lit + 1 >= width
                                or row[x + lit] != row[x + lit + 1])):
                        lit += 1
                    body += struct.pack("B", lit - 1)
                    for p in row[x:x + lit]:
                        body += pack_px(p)
                    x += lit
    if footer:
        body += struct.pack("<II", 0, 0) + _FOOTER_SIG
    return bytes(body)


def parse_tga(data: bytes) -> dict:
    """TGA bytes -> {image_type, width, height, n_channels, pixels}
    with pixels row-major TOP-DOWN as flat per-pixel tuples (gray
    pixels as 1-tuples) in RGB(A) order."""
    if len(data) < 18:
        raise ValueError("truncated TGA header")
    (id_len, cm_type, image_type) = struct.unpack_from("<BBB", data, 0)
    cm_first, cm_len, cm_depth = struct.unpack_from("<HHB", data, 3)
    (_, _, width, height, depth, descriptor
     ) = struct.unpack_from("<HHHHBB", data, 8)
    base = image_type & 0x07
    rle = bool(image_type & 0x08)
    if base not in (1, 2, 3):
        raise ValueError(f"unsupported TGA image type {image_type}")
    if not (0 < width <= MAX_DIM and 0 < height <= MAX_DIM):
        raise ValueError("TGA dimensions out of range")
    if width * height > MAX_PIXELS:
        raise ValueError("TGA pixel cap exceeded")
    if descriptor & 0x10:
        raise ValueError("right-to-left TGA unsupported")
    pos = 18 + id_len
    palette = None
    if cm_type == 1:
        if cm_depth != 24:
            raise ValueError(f"unsupported colormap depth {cm_depth}")
        need = cm_len * 3
        if pos + need > len(data):
            raise ValueError("truncated TGA colormap")
        palette = [
            (data[pos + 3 * i + 2], data[pos + 3 * i + 1],
             data[pos + 3 * i])
            for i in range(cm_len)
        ]
        pos += need
    if base == 1:
        if palette is None:
            raise ValueError("colormapped TGA without colormap")
        if depth != 8:
            raise ValueError("only 8-bit colormap indices supported")
        bpp = 1
    elif base == 3:
        if depth != 8:
            raise ValueError("only 8-bit grayscale supported")
        bpp = 1
    else:
        if depth not in (24, 32):
            raise ValueError(f"unsupported truecolor depth {depth}")
        bpp = depth // 8

    n_px = width * height
    raw = bytearray()
    if not rle:
        need = n_px * bpp
        if pos + need > len(data):
            raise ValueError("truncated TGA pixel data")
        raw += data[pos:pos + need]
    else:
        want = n_px * bpp
        while len(raw) < want:
            if pos >= len(data):
                raise ValueError("truncated TGA RLE stream")
            hdr = data[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:
                if pos + bpp > len(data):
                    raise ValueError("truncated RLE run pixel")
                raw += data[pos:pos + bpp] * count
                pos += bpp
            else:
                need = count * bpp
                if pos + need > len(data):
                    raise ValueError("truncated RLE raw packet")
                raw += data[pos:pos + need]
                pos += need
            if len(raw) > want:
                raise ValueError("TGA RLE overruns image")

    def px(i: int) -> tuple:
        o = i * bpp
        if base == 3:
            return (raw[o],)
        if base == 1:
            j = raw[o] - cm_first
            if not 0 <= j < len(palette):
                raise ValueError("TGA colormap index out of range")
            return palette[j]
        if bpp == 3:
            return (raw[o + 2], raw[o + 1], raw[o])
        return (raw[o + 2], raw[o + 1], raw[o], raw[o + 3])

    rows = [[px(y * width + x) for x in range(width)]
            for y in range(height)]
    if not descriptor & 0x20:  # bottom-up: flip to top-down
        rows = rows[::-1]
    n_channels = {1: 3, 2: bpp, 3: 1}[base]
    return {
        "image_type": image_type,
        "width": width,
        "height": height,
        "n_channels": n_channels,
        "pixels": [p for row in rows for p in row],
    }
