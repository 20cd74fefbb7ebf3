"""Windows BMP (DIB) encode + decode in pure numpy/stdlib.

The legacy raster format still common in crawled archives and
document dumps.  Implemented from the PUBLIC Windows BITMAPFILEHEADER
/ BITMAPINFOHEADER layout — structure-only, like TIFF:

* ``decode_bmp`` — BITMAPINFOHEADER (40-byte) DIBs: 1/4/8-bit
  paletted (BI_RGB; 8-bit BI_RLE8 and 4-bit BI_RLE4 run-length with
  alternating-nibble encoded runs), 16-bit XRGB1555
  (5-bit channels replicated to 8), 24-bit BGR and 32-bit BGRA,
  bottom-up AND top-down (negative height) row orders, 32-bit row
  padding, MSB-first sub-byte index unpack, palette lookup to
  (h, w, 3) RGB; 32-bit inputs keep their alpha and return (h, w, 4)
  RGBA.
* ``encode_bmp`` — writes conformant files: 1/4/8-bit with a palette
  (8-bit also BI_RLE8), 24-bit BGR or 32-bit BGRA; ``top_down=True``
  emits the negative-height variant.
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


def rle4_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE4 -> (h, w) uint8 nibble-index array (row 0 = BOTTOM row,
    as stored).  Encoded runs ALTERNATE the two nibbles of the value
    byte (hi, lo, hi, ...); absolute runs carry packed nibbles padded
    to a word boundary; escapes are the RLE8 set (0 0 = end of line,
    0 1 = end of bitmap, 0 2 = delta).  Unpainted pixels default 0."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while True:
        if i + 2 > n:
            raise ValueError("truncated RLE4 stream")
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run: alternate hi/lo nibbles
            if y >= h or x + c > w:
                raise ValueError("RLE4 run overruns row")
            pair = np.array([v >> 4, v & 0x0F], dtype=np.uint8)
            out[y, x : x + c] = np.resize(pair, c)
            x += c
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("RLE4 line count overruns image")
            continue
        if v == 1:  # end of bitmap
            return out
        if v == 2:  # delta
            if i + 2 > n:
                raise ValueError("truncated RLE4 delta")
            dx, dy = data[i], data[i + 1]
            i += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError("RLE4 delta overruns image")
            continue
        # absolute run of v nibbles; bytes consumed pad to a word
        if y >= h or x + v > w:
            raise ValueError("RLE4 absolute run overruns row")
        nbytes = (v + 1) // 2
        if i + nbytes > n:
            raise ValueError("truncated RLE4 absolute run")
        raw = np.frombuffer(data[i : i + nbytes], dtype=np.uint8)
        nibbles = np.empty(nbytes * 2, dtype=np.uint8)
        nibbles[0::2] = raw >> 4
        nibbles[1::2] = raw & 0x0F
        out[y, x : x + v] = nibbles[:v]
        x += v
        i += nbytes + (nbytes & 1)  # word padding


def rle4_encode(idx: np.ndarray) -> bytes:
    """(h, w) uint8 nibble rows (values < 16, row 0 = bottom) ->
    BI_RLE4 bytes: maximal constant runs as encoded runs (both nibbles
    equal), everything else as alternating pairs; absolute runs are a
    decoder surface, exercised by tests with hand-built streams."""
    h, w = idx.shape
    if int(idx.max(initial=0)) > 15:
        raise ValueError("RLE4 needs nibble values")
    out = bytearray()
    for y in range(h):
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2:
                v = int(row[x])
                out += bytes([run, (v << 4) | v])
                x += run
            else:
                nxt = int(row[x + 1]) if x + 1 < w else 0
                c = 2 if x + 1 < w else 1
                out += bytes([c, (int(row[x]) << 4) | nxt])
                x += c
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> uint8 pixel array, returned top-down regardless of
    storage order: (h, w, 3) RGB for 1/4/8-bit paletted, 16-bit
    XRGB1555 and 24-bit BGR inputs; (h, w, 4) RGBA for 32-bit BGRA
    inputs (alpha preserved — drop ``[..., :3]`` for RGB-only use)."""
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
    if bpp in (1, 4, 8):
        if comp == 1 and bpp != 8:
            raise NotImplementedError("BI_RLE8 needs 8-bit pixels")
        if comp == 2 and bpp != 4:
            raise NotImplementedError("BI_RLE4 needs 4-bit pixels")
        if comp not in (0, 1, 2):
            raise NotImplementedError(f"{bpp}-bit compression {comp} not supported")
        n_colors = struct.unpack("<I", p[46:50])[0] or (1 << bpp)
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(p):
            raise ValueError("truncated BMP palette")
        quads = np.frombuffer(p[pal_off:pal_end], dtype=np.uint8).reshape(-1, 4)
        palette = quads[:, [2, 1, 0]]  # BGRx -> RGB
        if comp in (1, 2):
            if top_down:
                raise ValueError("RLE with top-down rows is spec-invalid")
            dec = rle8_decode if comp == 1 else rle4_decode
            idx = dec(p[data_off:], w, h)
        else:
            stride = ((w * bpp + 31) // 32) * 4  # rows pad to 32 bits
            need = stride * h
            if data_off + need > len(p):
                raise ValueError("truncated BMP pixel data")
            rows = np.frombuffer(
                p[data_off : data_off + need], dtype=np.uint8
            ).reshape(h, stride)
            if bpp == 8:
                idx = rows[:, :w]
            else:  # sub-byte: MSB-first packed indices
                bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
                weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
                idx = (
                    (bits.reshape(h, w, bpp) * weights).sum(axis=2)
                ).astype(np.uint8)
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
    elif bpp == 16:
        # BI_RGB 16-bit is XRGB1555 little-endian; channels replicate
        # their 5 bits into 8 ((v << 3) | (v >> 2)) like real decoders
        if comp != 0:
            raise NotImplementedError(f"16-bit compression {comp} not supported")
        stride = (w * 2 + 3) & ~3
        need = stride * h
        if data_off + need > len(p):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            p[data_off : data_off + need], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 2]
        pix = rows.reshape(h, w, 2).astype(np.uint16)
        v = pix[:, :, 0] | (pix[:, :, 1] << 8)
        r5 = ((v >> 10) & 31).astype(np.uint8)
        g5 = ((v >> 5) & 31).astype(np.uint8)
        b5 = (v & 31).astype(np.uint8)
        rep = lambda c: ((c << 3) | (c >> 2)).astype(np.uint8)  # noqa: E731
        img = np.stack([rep(r5), rep(g5), rep(b5)], axis=2)
    elif bpp == 32:
        # BGRA (or BGRX); BI_RGB only — rows are naturally word-aligned
        if comp != 0:
            raise NotImplementedError(f"32-bit compression {comp} not supported")
        need = w * 4 * h
        if data_off + need > len(p):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            p[data_off : data_off + need], dtype=np.uint8
        ).reshape(h, w, 4)
        img = rows[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
    else:
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    return np.ascontiguousarray(img if top_down else img[::-1])


def encode_bmp(arr, palette=None, compression: int = 0,
               top_down: bool = False,
               bits_per_pixel: int | None = None) -> bytes:
    """(h, w) index array + ``palette`` (n<=256, 3 RGB) -> paletted BMP
    (BI_RGB; ``compression=1`` = BI_RLE8 at 8-bit, ``compression=2`` =
    BI_RLE4 at 4-bit); (h, w, 3) RGB -> 24-bit BI_RGB.  Input is
    top-down; stored bottom-up unless ``top_down`` (negative height;
    BI_RGB only)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if compression not in (0, 1, 2):
        raise ValueError("compression must be 0 (BI_RGB), 1 (RLE8) or 2 (RLE4)")
    if compression in (1, 2) and top_down:
        raise ValueError("RLE cannot be stored top-down")
    if palette is not None:
        pal = np.ascontiguousarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError("palette must be (n<=256, 3) uint8")
        if a.ndim != 2:
            raise ValueError("palette encoding needs a (h,w) index array")
        if int(a.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        h, w = a.shape
        bpp = 8 if bits_per_pixel is None else bits_per_pixel
        if bpp not in (1, 4, 8):
            raise ValueError("bits_per_pixel must be 1, 4 or 8")
        if compression == 1 and bpp != 8:
            raise ValueError("BI_RLE8 needs 8-bit indices")
        if compression == 2 and bpp != 4:
            raise ValueError("BI_RLE4 needs 4-bit indices")
        if int(a.max(initial=0)) >= 1 << bpp:
            raise ValueError(f"index out of range for {bpp}-bit")
        quads = np.zeros((pal.shape[0], 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRx
        pal_bytes = quads.tobytes()
        rows = a if top_down else a[::-1]
        if compression == 1:
            pix = rle8_encode(rows)
        elif compression == 2:
            pix = rle4_encode(rows)
        elif bpp == 8:
            stride = (w + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, :w] = rows
            pix = padded.tobytes()
        else:  # sub-byte: MSB-first bit pack, rows padded to 32 bits
            stride = ((w * bpp + 31) // 32) * 4
            bits = (
                (rows[:, :, None] >> np.arange(bpp - 1, -1, -1)) & 1
            ).reshape(h, w * bpp).astype(np.uint8)
            packed = np.packbits(bits, axis=1)
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : packed.shape[1]] = packed
            pix = padded.tobytes()
    else:
        if a.ndim != 3 or a.shape[2] not in (3, 4):
            raise ValueError(
                "truecolor encoding needs a (h,w,3) RGB or (h,w,4) RGBA array"
            )
        if compression != 0:
            raise ValueError("truecolor BMP supports BI_RGB only")
        h, w = a.shape[:2]
        pal_bytes = b""
        rows = a if top_down else a[::-1]
        if a.shape[2] == 4:
            bpp = 32
            pix = rows[:, :, [2, 1, 0, 3]].tobytes()  # RGBA -> BGRA
        elif bits_per_pixel == 16:
            # XRGB1555: channels quantized v >> 3 (decode replicates
            # the 5 bits back to 8, so the roundtrip is v -> rep(v>>3))
            bpp = 16
            r5 = (rows[:, :, 0] >> 3).astype(np.uint16)
            g5 = (rows[:, :, 1] >> 3).astype(np.uint16)
            b5 = (rows[:, :, 2] >> 3).astype(np.uint16)
            v = (r5 << 10) | (g5 << 5) | b5
            stride = (w * 2 + 3) & ~3
            padded = np.zeros((h, stride), dtype=np.uint8)
            le = v.astype("<u2").view(np.uint8).reshape(h, w * 2)
            padded[:, : w * 2] = le
            pix = padded.tobytes()
        else:
            bpp = 24
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


# -----------------------------------------------------------------------------
# ICO — the favicon container (ICONDIR + entries); members are either
# PNG streams or headerless DIBs (BITMAPINFOHEADER with DOUBLED height:
# XOR color data then a 1-bit AND transparency mask, rows padded to 32
# bits).  Web scrapes are full of these.
# -----------------------------------------------------------------------------

MAX_ICO_MEMBERS = 256


def decode_ico(payload: bytes) -> list:
    """ICO bytes -> list of (kind, ndarray) per member: ('png', any
    PNG-decoder output) or ('bmp', (h, w, 4) RGBA with alpha from the
    AND mask).  Malformed containers raise ``ValueError``."""
    from .multimodal import _PNG_SIG, decode_png

    p = bytes(payload)
    if len(p) < 6:
        raise ValueError("truncated ICO header")
    reserved, rtype, count = struct.unpack("<HHH", p[:6])
    if reserved != 0 or rtype != 1:
        raise ValueError("not an ICO: bad ICONDIR")
    if count == 0 or count > MAX_ICO_MEMBERS:
        raise ValueError("ICO member count out of range")
    if 6 + 16 * count > len(p):
        raise ValueError("truncated ICONDIR entries")
    out = []
    for e in range(count):
        base = 6 + 16 * e
        size, off = struct.unpack("<II", p[base + 8 : base + 16])
        if off + size > len(p):
            raise ValueError("ICO member out of bounds")
        member = p[off : off + size]
        if member[:8] == _PNG_SIG:
            out.append(("png", decode_png(member)))
            continue
        # headerless DIB: BITMAPINFOHEADER with doubled height
        if len(member) < 40:
            raise ValueError("truncated ICO DIB header")
        hdr_size = struct.unpack("<I", member[:4])[0]
        if hdr_size != 40:
            raise ValueError("unsupported ICO DIB header size")
        w, h2 = struct.unpack("<ii", member[4:12])
        planes, bpp = struct.unpack("<HH", member[12:16])
        comp = struct.unpack("<I", member[16:20])[0]
        if h2 % 2 or h2 <= 0 or w <= 0:
            raise ValueError("ICO DIB height must be positive and doubled")
        h = h2 // 2
        if comp != 0 or planes != 1:
            raise NotImplementedError("compressed ICO DIBs not supported")
        if w * h * 4 > MAX_PIXELS:
            raise ValueError("ICO dimensions exceed decoder limit")
        if bpp == 8:
            n_colors = struct.unpack("<I", member[32:36])[0] or 256
            pal_off = 40
            pal_end = pal_off + 4 * n_colors
            quads = np.frombuffer(
                member[pal_off:pal_end], dtype=np.uint8
            ).reshape(-1, 4)
            palette = quads[:, [2, 1, 0]]
            stride = (w + 3) & ~3
            xor_end = pal_end + stride * h
            if xor_end > len(member):
                raise ValueError("truncated ICO XOR data")
            idx = np.frombuffer(
                member[pal_end:xor_end], dtype=np.uint8
            ).reshape(h, stride)[:, :w]
            if int(idx.max(initial=0)) >= palette.shape[0]:
                raise ValueError("ICO palette index out of range")
            rgb = palette[idx]
        elif bpp == 24:
            stride = (w * 3 + 3) & ~3
            pal_end = 40
            xor_end = pal_end + stride * h
            if xor_end > len(member):
                raise ValueError("truncated ICO XOR data")
            rows = np.frombuffer(
                member[pal_end:xor_end], dtype=np.uint8
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            rgb = rows[:, :, ::-1]
        else:
            raise NotImplementedError(f"{bpp}-bit ICO DIB not supported")
        mask_stride = ((w + 31) // 32) * 4
        mask_end = xor_end + mask_stride * h
        if mask_end > len(member):
            raise ValueError("truncated ICO AND mask")
        mask_rows = np.frombuffer(
            member[xor_end:mask_end], dtype=np.uint8
        ).reshape(h, mask_stride)
        bits = np.unpackbits(mask_rows, axis=1)[:, :w]
        alpha = np.where(bits == 1, 0, 255).astype(np.uint8)
        rgba = np.concatenate([rgb, alpha[:, :, None]], axis=2)
        out.append(("bmp", np.ascontiguousarray(rgba[::-1])))
    return out


def encode_ico(members) -> bytes:
    """[(kind, payload_or_arrays)] -> ICO bytes.  kind 'png': payload
    is ready PNG bytes.  kind 'bmp': payload is ((h, w) index array,
    (n, 3) palette, (h, w) bool transparency) encoded as a headerless
    8-bit DIB with AND mask."""
    if not 1 <= len(members) <= MAX_ICO_MEMBERS:
        raise ValueError("ICO needs 1..256 members")
    blobs = []
    dims = []
    for kind, payload in members:
        if kind == "png":
            from .multimodal import decode_png

            img = decode_png(payload)  # also validates
            dims.append((img.shape[1], img.shape[0]))
            blobs.append(bytes(payload))
            continue
        idx, pal, trans = payload
        idx = np.ascontiguousarray(idx, dtype=np.uint8)
        pal = np.ascontiguousarray(pal, dtype=np.uint8)
        trans = np.ascontiguousarray(trans, dtype=bool)
        h, w = idx.shape
        if trans.shape != (h, w):
            raise ValueError("transparency mask shape mismatch")
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        quads = np.zeros((pal.shape[0], 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]
        stride = (w + 3) & ~3
        xor = np.zeros((h, stride), dtype=np.uint8)
        xor[:, :w] = idx[::-1]  # bottom-up
        mask_stride = ((w + 31) // 32) * 4
        mask = np.zeros((h, mask_stride * 8), dtype=np.uint8)
        mask[:, :w] = trans[::-1].astype(np.uint8)
        mask_bytes = np.packbits(mask, axis=1)[:, :mask_stride]
        hdr = struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0,
            stride * h + mask_stride * h, 0, 0, pal.shape[0], 0,
        )
        blobs.append(hdr + quads.tobytes() + xor.tobytes()
                     + mask_bytes.tobytes())
        dims.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 1, len(members)))
    off = 6 + 16 * len(members)
    for (w, h), blob in zip(dims, blobs):
        out += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 8, len(blob), off
        )
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
