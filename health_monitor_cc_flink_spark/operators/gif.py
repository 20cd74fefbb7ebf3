"""GIF (GIF87a/GIF89a) encode + decode in pure numpy.

The fifth real image codec in the multimodal stack: GIF is the one
remaining ubiquitous web image format after PNG/JPEG/WebP, and its
palette pipeline is LOSSLESS for any image of <= 256 distinct colors —
so, like PNG/WebP/FLAC, every roundtrip is bit-exact and any
deterministic synthetic image yields a closed-form DuckDB oracle.

Implemented from the PUBLIC GIF89a specification:

* **Decoder** (``decode_gif`` / ``decode_gif_frames``): header +
  logical screen descriptor, global/local color tables, the full
  variable-code-width LZW decompressor (clear/end codes, dictionary
  growth to 4095, 12-bit cap, LSB-first packing, deferred-clear
  tolerance), interlaced images (4-pass row order), graphic control
  extensions (transparency index, disposal methods none/keep/
  restore-background), application/comment/plain-text extension
  skipping, and multi-frame animations composited onto the logical
  canvas.  Malformed streams raise ``ValueError`` — never
  ``IndexError`` — so Arrow feature paths can flag rows.
* **Encoder** (``encode_gif``): single- or multi-frame GIF89a with a
  global palette built from the image (<= 256 distinct colors
  required — GIF is palette-native; quantization is a modeling
  choice, not a codec, so it is out of scope), real LZW compression
  (variable width, dictionary growth, clear-code resets), optional
  interlacing and per-frame delays.  Bit-exact roundtrip for every
  encodable input.

Scale: same Arrow CPU-map envelope as the other codecs; LZW is
per-payload Python over byte arrays (gate images stay small and
palette runs compress well).
"""

from __future__ import annotations

import numpy as np

#: Decode-side cap on canvas pixels (hostile dims flag, don't OOM).
MAX_PIXELS = 1 << 24

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (variable code width, LSB-first packing — GIF89a Appendix F)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Decompress one image's LZW stream to ``expected`` palette
    indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("invalid LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit cursor over the whole stream, LSB-first; O(1) reads via a
    # 3-byte int.from_bytes window (width <= 12, offset <= 7 -> 19 bits)
    padded = data + b"\x00\x00\x00"
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    n = len(data) * 8
    while True:
        if pos + width > n:
            raise ValueError("truncated LZW stream")
        byte0 = pos >> 3
        code = (
            int.from_bytes(padded[byte0 : byte0 + 3], "little") >> (pos & 7)
        ) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # some encoders omit the end code or pad; accept once the
            # raster is complete (the spec's own 'deferred clear' note)
            break
    if len(out) < expected:
        raise ValueError("LZW stream ended before raster complete")
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int) -> None:
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        if next_code < 4096:
            table[cand] = next_code
            # width grows when the NEXT code to assign no longer fits
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(end)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF data sub-blocks")
        n = payload[i]
        i += 1
        if n == 0:
            return bytes(out), i
        if i + n > len(payload):
            raise ValueError("truncated GIF data sub-blocks")
        out += payload[i : i + n]
        i += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes):
    """GIF bytes -> (list of uint8 (h, w, 4) RGBA canvas snapshots —
    one per frame, composited with the spec disposal methods —,
    logical width, height).  Malformed input raises ``ValueError``."""
    try:
        return _decode_gif_frames(payload)
    except IndexError as exc:  # residual short-read on hostile bytes
        raise ValueError(f"malformed GIF stream: {exc}") from exc


def _decode_gif_frames(payload: bytes):
    payload = bytes(payload)
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_idx = payload[11]
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("GIF canvas dimensions out of range")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(payload):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    canvas = np.zeros((h, w, 4), dtype=np.uint8)  # transparent canvas
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    while True:
        if i >= len(payload):
            raise ValueError("missing GIF trailer")
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if i >= len(payload):
                raise ValueError("truncated extension")
            label = payload[i]
            i += 1
            data, i = _read_sub_blocks(payload, i)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("truncated graphic control extension")
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if i + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(payload[i : i + 2], "little")
        top = int.from_bytes(payload[i + 2 : i + 4], "little")
        fw = int.from_bytes(payload[i + 4 : i + 6], "little")
        fh = int.from_bytes(payload[i + 6 : i + 8], "little")
        ipacked = payload[i + 8]
        i += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("GIF frame exceeds logical canvas")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if i + 3 * n > len(payload):
                raise ValueError("truncated local color table")
            table = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if table is None:
            raise ValueError("GIF frame without any color table")
        if i >= len(payload):
            raise ValueError("truncated LZW header")
        min_code = payload[i]
        i += 1
        data, i = _read_sub_blocks(payload, i)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(table):
            raise ValueError("palette index out of range")
        saved = None
        if disposal == 3:
            saved = canvas[top : top + fh, left : left + fw].copy()
        patch = canvas[top : top + fh, left : left + fw]
        rgba = np.concatenate(
            [table[idx], np.full((fh, fw, 1), 255, dtype=np.uint8)], axis=2
        )
        if transparent is not None:
            mask = idx == transparent
            rgba[mask] = patch[mask]  # transparent pixels keep canvas
        patch[:] = rgba
        frames.append(canvas.copy())
        # disposal AFTER the frame is shown (spec 23.c)
        if disposal == 2:  # restore to background: spec-background is
            # the bg color, but every modern renderer clears to
            # transparent — follow that de-facto behavior
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3 and saved is not None:
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    _ = bg_idx  # background color: only used via disposal semantics
    return frames, w, h


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (h, w, 4) RGBA array (first frame as
    composited on the logical canvas)."""
    frames, _, _ = decode_gif_frames(payload)
    return frames[0]


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def encode_gif(
    frames,
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_color=None,
) -> bytes:
    """uint8 (h, w, 3) RGB frame or list of same-shape frames ->
    complete GIF89a bytes.  All frames share one global palette built
    from their union of colors (> 256 distinct raises — GIF is
    palette-native, quantization is out of codec scope).
    ``transparent_color``: optional (r, g, b) rendered transparent."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames or any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("expected (h, w, 3) uint8 frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    if not (1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("dimensions out of GIF range")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8).reshape(1, 3)
        if not (colors == tc).all(axis=1).any():
            colors = np.concatenate([colors, tc])
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors (GIF needs a palette)")
    lut = {tuple(c): k for k, c in enumerate(colors)}
    bits = max(1, int(len(colors) - 1).bit_length())
    table_size = 1 << bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) & 0x07) | ((bits - 1) << 4), 0, 0])
    out += palette.tobytes()
    if len(frames) > 1:  # Netscape loop extension for animations
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, bits)
    for f in frames:
        if len(frames) > 1 or transparent_color is not None:
            flags = 0
            tidx = 0
            if transparent_color is not None:
                flags |= 0x01
                tidx = lut[tuple(np.asarray(transparent_color, dtype=np.uint8))]
            if len(frames) > 1:
                flags |= 0x04  # disposal: do not dispose
            out += bytes([0x21, 0xF9, 4, flags])
            out += int(delay_cs).to_bytes(2, "little") + bytes([tidx, 0])
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint8
        ).reshape(h, w)
        if interlace:
            rows = [idx[y] for start, step in _INTERLACE_PASSES
                    for y in range(start, h, step)]
            idx = np.stack(rows)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(idx.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)
