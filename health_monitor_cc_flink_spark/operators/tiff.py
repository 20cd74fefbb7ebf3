"""Baseline TIFF (TIFF 6.0) encode + decode in pure numpy/stdlib.

The scanned-document / print-pipeline format real multimodal corpora
contain alongside PNG/JPEG — and, structurally, the IFD
(Image File Directory) tag walk is the same machinery EXIF metadata
rides in inside JPEG APP1 segments, so this module doubles as the
repo's IFD parser.  Implemented from the PUBLIC TIFF 6.0 specification
(Adobe, 1992): no probability/transform tables at all, just structure
— which is what makes the full format honestly implementable here,
unlike lossy VP8/H.264 whose spec constants are not available in this
environment.

* ``parse_tiff_ifd`` — header (II little-endian / MM big-endian +
  magic 42), IFD entry walk (tag, type, count, inline-or-offset
  value), typed value decoding for BYTE/ASCII/SHORT/LONG/RATIONAL.
* ``decode_tiff`` — 8- and 16-bit grayscale (photometric 0/1,
  MinIsBlack and MinIsWhite) and RGB (photometric 2; 6 = YCbCr for
  JPEG), strip AND tile (tags 322-325) layouts, Compression 1 (none),
  5 (LZW, MSB-first with early change), 32773 (PackBits) or 7
  (new-style JPEG per TIFF Technical Note 2: each segment is a JPEG
  stream, optionally abbreviated against a tag-347 JPEGTables block —
  decoded by ``operators/jpeg.py``), Predictor 2 (horizontal
  differencing — what real LZW TIFFs use), II and MM byte orders,
  multi-strip with RowsPerStrip.
* ``encode_tiff`` — writes spec-conformant files in either byte
  order, all four compressions, strip or tiled layout, 8/16-bit —
  the test/oracle vehicle, like every other codec's synth path.
* ``packbits_encode`` / ``packbits_decode`` — the Apple PackBits RLE
  (TIFF 6.0 §9): literal runs (n >= 0: n+1 bytes), repeat runs
  (-127 <= n <= -1: next byte 1-n times), -128 no-op.

Malformed input raises ``ValueError`` (never IndexError/KeyError);
hostile dimensions/strip counts are capped so a crafted file flags its
row instead of OOMing the executor.
"""

from __future__ import annotations

import struct

import numpy as np

#: Decode caps against hostile headers.
MAX_PIXELS = 1 << 26          # total samples across the image
MAX_IFD_ENTRIES = 4096
MAX_STRIPS = 1 << 16

#: Tag names for the metadata surface (public TIFF 6.0 tag registry).
TAG_NAMES = {
    256: "ImageWidth", 257: "ImageLength", 258: "BitsPerSample",
    259: "Compression", 262: "PhotometricInterpretation",
    270: "ImageDescription", 271: "Make", 272: "Model",
    273: "StripOffsets", 274: "Orientation", 277: "SamplesPerPixel",
    278: "RowsPerStrip", 279: "StripByteCounts", 282: "XResolution",
    283: "YResolution", 296: "ResolutionUnit", 305: "Software",
    306: "DateTime", 317: "Predictor", 322: "TileWidth",
    323: "TileLength", 324: "TileOffsets", 325: "TileByteCounts",
    347: "JPEGTables", 530: "YCbCrSubSampling",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def packbits_decode(data: bytes, max_out: int) -> bytes:
    """PackBits RLE decode with an output cap (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c == 128:  # no-op
            continue
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        else:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        if len(out) > max_out:
            raise ValueError("PackBits expansion exceeds cap")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits RLE encode: maximal repeat runs (>= 3 repeats pay off;
    2-byte repeats are folded into literals), literals capped at 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the repeat run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i = j
            continue
        # literal run: until the next >=3 repeat or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 3 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF 6.0 §13 LZW decode: MSB-first code packing, 9→12-bit
    widths with EARLY CHANGE (the width grows one code earlier than
    GIF's LSB variant), Clear=256, EOI=257.  Output capped."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    i = 0
    n = len(data)
    while True:
        while nbits < width:
            if i >= n:
                raise ValueError("truncated LZW stream (no EOI)")
            acc = (acc << 8) | data[i]
            i += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # Clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            if code > 255:
                raise ValueError("LZW stream starts with a table code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW expansion exceeds cap")
        prev = entry
        # early change (TIFF 6.0 §13): the decoder's table lags the
        # encoder's by exactly one entry, so it must widen one slot
        # earlier — at (1<<w)-2 where the encoder widens at (1<<w)-1
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if len(table) >= 4094:
            # spec requires the ENCODER to emit Clear here; tolerate
            # one more code then demand it
            if len(table) > 4095:
                raise ValueError("LZW table overflow without Clear")


def lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW encode: leading Clear, early-change widths,
    Clear when the table fills, trailing EOI."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # leading Clear
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # early change: the width in force must fit next_code itself
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(256, width)  # Clear: reset the table
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        put(table[cur], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_values(payload: bytes, bo: str, vtype: int, count: int,
                 raw: bytes):
    """Decode one IFD entry's value list; ``raw`` is the 4 inline
    bytes; larger values follow the offset."""
    size = _TYPE_SIZES[vtype] * count
    if size <= 4:
        buf = raw[:size]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + size > len(payload):
            raise ValueError("IFD value offset out of bounds")
        buf = payload[off : off + size]
    if vtype in (1, 7):  # BYTE / UNDEFINED (e.g. tag 347 JPEGTables)
        return list(buf)
    if vtype == 2:
        return [buf.split(b"\x00")[0].decode("latin-1")]
    if vtype == 3:
        return list(struct.unpack(bo + f"{count}H", buf))
    if vtype == 4:
        return list(struct.unpack(bo + f"{count}I", buf))
    # RATIONAL: (numerator, denominator) pairs
    vals = struct.unpack(bo + f"{2 * count}I", buf)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]


def _parse_ifd(payload: bytes, bo: str, ifd_off: int) -> dict[int, list]:
    """Walk ONE IFD at ``ifd_off`` -> {tag: [values]}."""
    if ifd_off + 2 > len(payload) or ifd_off < 0:
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    if n_entries > MAX_IFD_ENTRIES:
        raise ValueError("IFD entry count exceeds cap")
    end = ifd_off + 2 + 12 * n_entries
    if end + 4 > len(payload):
        raise ValueError("truncated IFD")
    tags: dict[int, list] = {}
    for e in range(n_entries):
        base = ifd_off + 2 + 12 * e
        tag, vtype, count = struct.unpack(
            bo + "HHI", payload[base : base + 8]
        )
        if vtype not in _TYPE_SIZES:
            raise ValueError(f"unknown IFD value type {vtype}")
        if count > MAX_PIXELS:
            raise ValueError("IFD value count exceeds cap")
        tags[tag] = _read_values(
            payload, bo, vtype, count, payload[base + 8 : base + 12]
        )
    return tags


def parse_tiff_ifd(payload: bytes):
    """TIFF bytes -> (byte_order ('II'|'MM'), {tag: [values]}).  Walks
    the FIRST IFD (multi-page files: later IFDs are ignored, like a
    thumbnail-less metadata pass).  Unknown tags are kept (by number);
    unknown value types raise."""
    payload = bytes(payload)
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    return order.decode("ascii"), _parse_ifd(payload, bo, ifd_off)


def write_ifd(bo: str, entries: list, first_value_off: int) -> bytes:
    """Serialize one IFD: ``entries`` = [(tag, vtype, values)] with
    values as ints (BYTE/SHORT/LONG), str (ASCII, NUL appended) or
    (num, den) tuples (RATIONAL).  Overflow values are placed directly
    after the IFD, which starts at ``first_value_off`` in the final
    stream (needed to compute offsets).  Returns IFD + overflow bytes;
    the next-IFD pointer is 0."""
    packed_vals = []
    for tag, vtype, values in entries:
        if vtype == 2:
            buf = values[0].encode("latin-1") + b"\x00"
            count = len(buf)
        elif vtype == 5:
            buf = b"".join(
                struct.pack(bo + "II", n, d) for (n, d) in values
            )
            count = len(values)
        else:
            fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[vtype]
            buf = struct.pack(bo + fmt * len(values), *values)
            count = len(values)
        packed_vals.append((tag, vtype, count, buf))
    ifd_len = 2 + 12 * len(entries) + 4
    overflow_base = first_value_off + ifd_len
    out = struct.pack(bo + "H", len(entries))
    overflow = b""
    for tag, vtype, count, buf in packed_vals:
        if len(buf) <= 4:
            out += (
                struct.pack(bo + "HHI", tag, vtype, count)
                + buf.ljust(4, b"\x00")
            )
        else:
            out += struct.pack(
                bo + "HHII", tag, vtype, count, overflow_base + len(overflow)
            )
            overflow += buf
    return out + struct.pack(bo + "I", 0) + overflow


MAX_TIFF_PAGES = 1024


def parse_tiff_pages(payload: bytes):
    """TIFF bytes -> (byte_order, [tags per page]) following the
    next-IFD chain (multi-page scans/faxes).  Cycles and hostile page
    counts raise."""
    payload = bytes(payload)
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    pages = []
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("IFD chain cycle")
        seen.add(ifd_off)
        if len(pages) >= MAX_TIFF_PAGES:
            raise ValueError("IFD chain exceeds page cap")
        pages.append(_parse_ifd(payload, bo, ifd_off))
        (n_entries,) = struct.unpack(
            bo + "H", payload[ifd_off : ifd_off + 2]
        )
        ptr = ifd_off + 2 + 12 * n_entries
        (ifd_off,) = struct.unpack(bo + "I", payload[ptr : ptr + 4])
    return order.decode("ascii"), pages


def decode_tiff_pages(payload: bytes) -> list:
    """Multi-page TIFF -> list of decoded page arrays."""
    payload = bytes(payload)
    order, pages = parse_tiff_pages(payload)
    bo = "<" if order == "II" else ">"
    return [_decode_page(payload, tags, bo) for tags in pages]


def split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full interchange JPEG -> (tables stream, abbreviated image
    stream) for the tag-347 JPEGTables layout (TIFF Technical Note 2):
    tables = SOI + every DQT/DHT segment + EOI; image = SOI + the
    remaining segments (SOF/DRI/SOS + entropy data + EOI)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray(b"\xff\xd8")
    image = bytearray(b"\xff\xd8")
    i = 2
    n = len(stream)
    while i + 4 <= n:
        if stream[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = stream[i + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI, verbatim
            image += stream[i:]
            tables += b"\xff\xd9"
            return bytes(tables), bytes(image)
        seg_len = struct.unpack(">H", stream[i + 2 : i + 4])[0]
        seg = stream[i : i + 2 + seg_len]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            image += seg
        i += 2 + seg_len
    raise ValueError("JPEG stream has no SOS")


def _merge_jpeg_tables(tables: bytes, stream: bytes) -> bytes:
    """Splice a JPEGTables stream's table segments ahead of an
    abbreviated per-segment stream: SOI + tables[2:-2] + stream[2:]."""
    if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
        raise ValueError("malformed JPEGTables stream")
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    return b"\xff\xd8" + bytes(tables[2:-2]) + bytes(stream[2:])


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> ndarray: (h, w) gray or (h, w, 3) RGB — the
    FIRST page of a multi-page file (use decode_tiff_pages for all).
    Strip OR tile (tags 322-325) layout; Compression none/LZW/
    PackBits/JPEG (7, with optional tag-347 JPEGTables), Predictor 2,
    8- or 16-bit samples (uint8/uint16 out, either byte order),
    II/MM, MinIsWhite gray inverted to MinIsBlack convention."""
    payload = bytes(payload)
    order, tags = parse_tiff_ifd(payload)
    return _decode_page(payload, tags, "<" if order == "II" else ">")


def _decode_page(payload: bytes, tags: dict, bo: str = "<") -> np.ndarray:
    def one(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required tag {TAG_NAMES.get(tag, tag)}")
            return default
        return int(tags[tag][0])

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    predictor = one(317, 1)
    bits = tags.get(258, [8])
    bps = int(bits[0])
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if w <= 0 or h <= 0:
        raise ValueError("invalid TIFF dimensions")
    if bps not in (8, 16) or any(int(b) != bps for b in bits):
        raise NotImplementedError("only uniform 8 or 16 bits per sample")
    if photo in (0, 1):
        if spp != 1:
            raise ValueError("gray photometric with SamplesPerPixel != 1")
    elif photo == 2:
        if spp != 3:
            raise ValueError("RGB photometric with SamplesPerPixel != 3")
    elif photo == 6:
        # YCbCr is only meaningful here as the JPEG-compressed color
        # layout (TIFF TechNote 2); the JPEG stream self-describes and
        # decodes straight to RGB
        if comp != 7 or spp != 3:
            raise NotImplementedError("photometric 6 only with JPEG")
    else:
        raise NotImplementedError(f"photometric {photo} not supported")
    if comp not in (1, 5, 32773, 7):
        raise NotImplementedError(f"compression {comp} not supported")
    if comp == 7 and bps != 8:
        raise NotImplementedError("JPEG-in-TIFF supports 8-bit only")
    if comp == 7 and predictor != 1:
        raise ValueError("predictor is invalid with JPEG compression")
    if w * h * spp > MAX_PIXELS:
        raise ValueError("declared dimensions exceed decoder limit")

    jpegtables = bytes(tags[347]) if 347 in tags else None
    sample_bytes = bps // 8
    dt_file = np.dtype(bo + "u2") if bps == 16 else np.dtype(np.uint8)
    dt_out = np.uint16 if bps == 16 else np.uint8

    def decode_segment(raw: bytes, rows: int, cols: int) -> np.ndarray:
        """One strip or tile -> (rows, cols, spp) native-order array."""
        if comp == 7:
            from .jpeg import decode_jpeg

            stream = _merge_jpeg_tables(jpegtables, raw) if jpegtables else raw
            img = decode_jpeg(bytes(stream))
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape != (rows, cols, spp):
                raise ValueError("JPEG segment dims disagree with tags")
            return img.astype(np.uint8)
        want = rows * cols * spp * sample_bytes
        if comp == 32773:
            raw = packbits_decode(raw, want)
        elif comp == 5:
            raw = lzw_decode(raw, want)
        if len(raw) != want:
            raise ValueError("segment length disagrees with dimensions")
        seg = np.frombuffer(raw, dtype=dt_file).astype(dt_out)
        seg = seg.reshape(rows, cols, spp)
        if predictor == 2:
            # horizontal differencing (tag 317): per-row, per-channel
            # cumulative sum over the SAMPLE width restores the values
            seg = (
                np.cumsum(seg.astype(np.uint64), axis=1) % (1 << bps)
            ).astype(dt_out)
        return seg

    if 322 in tags:  # tiled layout (TIFF 6.0 §15)
        tw, th = one(322), one(323)
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError("tile dims must be positive multiples of 16")
        offsets, counts = tags.get(324), tags.get(325)
        if offsets is None or counts is None:
            raise ValueError("missing tile offsets/byte counts")
        across, down = -(-w // tw), -(-h // th)
        n_tiles = across * down
        if n_tiles > MAX_STRIPS or len(offsets) != n_tiles or len(counts) != n_tiles:
            raise ValueError("tile table disagrees with dimensions")
        if down * th * across * tw * spp > 4 * MAX_PIXELS:
            raise ValueError("padded tile grid exceeds decoder limit")
        img = np.zeros((down * th, across * tw, spp), dtype=dt_out)
        for t in range(n_tiles):
            off, cnt = int(offsets[t]), int(counts[t])
            if off < 0 or cnt < 0 or off + cnt > len(payload):
                raise ValueError("tile out of bounds")
            ty, tx = divmod(t, across)  # left-to-right, top-to-bottom
            img[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = (
                decode_segment(payload[off : off + cnt], th, tw)
            )
        img = img[:h, :w]
    else:  # strip layout
        rows_per_strip = one(278, h)
        if rows_per_strip <= 0:
            raise ValueError("invalid RowsPerStrip")
        offsets = tags.get(273)
        counts = tags.get(279)
        if offsets is None or counts is None:
            raise ValueError("missing strip offsets/byte counts")
        n_strips = -(-h // rows_per_strip)
        if n_strips > MAX_STRIPS or len(offsets) != n_strips or len(counts) != n_strips:
            raise ValueError("strip table disagrees with dimensions")
        parts = []
        for s in range(n_strips):
            off, cnt = int(offsets[s]), int(counts[s])
            if off + cnt > len(payload) or off < 0 or cnt < 0:
                raise ValueError("strip out of bounds")
            strip_rows = min(rows_per_strip, h - s * rows_per_strip)
            parts.append(
                decode_segment(payload[off : off + cnt], strip_rows, w)
            )
        img = np.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    if photo == 0:  # MinIsWhite: invert to the usual convention
        img = ((1 << bps) - 1 - img.astype(np.uint32)).astype(dt_out)
    if spp == 1:
        return img.reshape(h, w)
    return np.ascontiguousarray(img)


def _encode_page(arr, bo: str, compression: int,
                 rows_per_strip: int | None, photometric: int | None,
                 software: str, predictor: int, base: int,
                 tile: tuple[int, int] | None = None,
                 jpeg_tables: bool = False):
    """Build one page section starting at absolute offset ``base``:
    [segments | software | pad | IFD | overflow].  Returns (section
    bytes, absolute IFD offset, position of the next-IFD pointer
    WITHIN the section)."""
    a = np.ascontiguousarray(arr)
    if a.dtype == np.uint16:
        bps = 16
    elif a.dtype == np.uint8:
        bps = 8
    else:
        raise ValueError("encode_tiff needs a uint8 or uint16 array")
    if a.ndim == 2:
        h, w = a.shape
        spp = 1
        photo = 1 if photometric is None else photometric
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        spp = 3
        # color JPEG-in-TIFF stores YCbCr (TechNote 2 convention)
        photo = 6 if compression == 7 else 2
    else:
        raise ValueError("encode_tiff supports (h,w) gray or (h,w,3) RGB")
    if compression not in (1, 5, 32773, 7):
        raise ValueError(
            "compression must be 1 (none), 5 (LZW), 32773 (PackBits) "
            "or 7 (JPEG)"
        )
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and compression in (1, 7):
        raise ValueError("predictor 2 needs a lossless compression scheme")
    if compression == 7 and bps != 8:
        raise ValueError("JPEG-in-TIFF is 8-bit only")
    if jpeg_tables and compression != 7:
        raise ValueError("jpeg_tables requires compression 7")
    mask = (1 << bps) - 1
    if photo == 0:
        a = (mask - a.astype(np.uint32)).astype(a.dtype)

    def compress_segment(seg: np.ndarray) -> bytes:
        """(rows, cols, spp) native-order array -> segment bytes
        (lossless paths; JPEG is handled separately)."""
        if predictor == 2:
            diff = seg.astype(np.int64).copy()
            diff[:, 1:, :] -= seg.astype(np.int64)[:, :-1, :]
            seg = (diff & mask).astype(a.dtype)
        raw = seg.astype(bo + f"u{bps // 8}").tobytes() if bps == 16 \
            else seg.tobytes()
        if compression == 32773:
            return packbits_encode(raw)
        if compression == 5:
            return lzw_encode(raw)
        return raw

    def jpeg_segment(seg: np.ndarray) -> bytes:
        from .jpeg import encode_jpeg_gray, encode_jpeg_rgb

        if spp == 1:
            return encode_jpeg_gray(seg[:, :, 0])
        return encode_jpeg_rgb(seg, "444")

    cube = a.reshape(h, w, spp)
    segments: list[bytes] = []
    tables: bytes | None = None
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tile dims must be positive multiples of 16")
        across, down = -(-w // tw), -(-h // th)
        padded = np.zeros((down * th, across * tw, spp), dtype=a.dtype)
        padded[:h, :w] = cube
        for ty in range(down):
            for tx in range(across):
                seg = padded[ty * th : (ty + 1) * th,
                             tx * tw : (tx + 1) * tw]
                segments.append(
                    jpeg_segment(seg) if compression == 7
                    else compress_segment(seg)
                )
        rps = None
    else:
        rps = h if rows_per_strip is None else max(1, rows_per_strip)
        for s in range(-(-h // rps)):
            seg = cube[s * rps : (s + 1) * rps]
            segments.append(
                jpeg_segment(seg) if compression == 7
                else compress_segment(seg)
            )
    if jpeg_tables:
        split = [split_jpeg_tables(st) for st in segments]
        tables = split[0][0]
        if any(t != tables for t, _ in split):
            raise ValueError("JPEG segments disagree on tables")
        segments = [img for _, img in split]

    sw = software.encode("latin-1") + b"\x00"
    strip_offs = []
    pos = base
    for st in segments:
        strip_offs.append(pos)
        pos += len(st)
    sw_off = pos
    pos += len(sw)
    if pos % 2:  # IFDs must be word-aligned
        pos += 1
    ifd_off = pos

    # ASCII software tag handled manually (stored at sw_off);
    # tags kept in ascending order (TIFF 6.0 requires it)
    fields = [
        (256, 4, [w]), (257, 4, [h]),
        (258, 3, [bps] * spp), (259, 3, [compression]),
        (262, 3, [photo]),
        (277, 3, [spp]),
        (305, 2, None),  # Software -> sw_off
    ]
    if tile is not None:
        fields += [
            (322, 4, [tw]), (323, 4, [th]),
            (324, 4, strip_offs),
            (325, 4, [len(st) for st in segments]),
        ]
    else:
        fields += [
            (273, 4, strip_offs), (278, 4, [rps]),
            (279, 4, [len(st) for st in segments]),
        ]
    if predictor == 2:
        fields.append((317, 3, [2]))
    if tables is not None:
        fields.append((347, 7, list(tables)))
    if photo == 6:
        fields.append((530, 3, [1, 1]))  # 444 — what the encoder emits
    fields.sort(key=lambda f: f[0])
    n_entries = len(fields)
    overflow_off = ifd_off + 2 + 12 * n_entries + 4
    entries = b""
    overflow = b""
    for tag, vtype, values in fields:
        if tag == 305:
            entries += struct.pack(bo + "HHII", 305, 2, len(sw), sw_off)
            continue
        count = len(values)
        size = _TYPE_SIZES[vtype] * count
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[vtype]
        packed = struct.pack(bo + fmt * count, *values)
        if size <= 4:
            entries += (
                struct.pack(bo + "HHI", tag, vtype, count)
                + packed.ljust(4, b"\x00")
            )
        else:
            entries += struct.pack(
                bo + "HHII", tag, vtype, count, overflow_off + len(overflow)
            )
            overflow += packed
    ifd = struct.pack(bo + "H", n_entries) + entries + struct.pack(bo + "I", 0)

    out = bytearray()
    for st in segments:
        out += st
    out += sw
    if (base + len(out)) % 2:
        out += b"\x00"
    next_ptr_pos = len(out) + 2 + 12 * n_entries  # within the section
    out += ifd
    out += overflow
    return bytes(out), ifd_off, next_ptr_pos


def encode_tiff(arr, byte_order: str = "II", compression: int = 1,
                rows_per_strip: int | None = None,
                photometric: int | None = None,
                software: str = "health-monitor-spark",
                predictor: int = 1,
                tile: tuple[int, int] | None = None,
                jpeg_tables: bool = False) -> bytes:
    """uint8/uint16 (h, w) gray or (h, w, 3) RGB -> complete TIFF
    file.  ``byte_order`` 'II' or 'MM'; ``compression`` 1/5/32773 or
    7 (JPEG, 8-bit; 3-channel input stored as YCbCr per TechNote 2,
    with ``jpeg_tables=True`` factoring DQT/DHT into tag 347);
    ``tile=(tw, th)`` (multiples of 16) writes the tiled layout
    instead of strips of ``rows_per_strip`` rows; optional
    Predictor 2.  uint16 input writes BitsPerSample 16 in the file's
    byte order.  Deterministic layout: header, segments, IFD."""
    return encode_tiff_multipage(
        [arr], byte_order, compression, rows_per_strip, photometric,
        software, predictor, tile, jpeg_tables,
    )


def encode_tiff_multipage(pages, byte_order: str = "II",
                          compression: int = 1,
                          rows_per_strip: int | None = None,
                          photometric: int | None = None,
                          software: str = "health-monitor-spark",
                          predictor: int = 1,
                          tile: tuple[int, int] | None = None,
                          jpeg_tables: bool = False) -> bytes:
    """List of image arrays -> one multi-page TIFF (next-IFD chain) —
    the multi-page scan/fax shape real document corpora carry."""
    if not pages:
        raise ValueError("multi-page TIFF needs at least one page")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    bo = "<" if byte_order == "II" else ">"
    sections = []
    ifd_offs = []
    ptr_positions = []  # absolute positions of each next-IFD pointer
    base = 8
    for a in pages:
        sec, ifd_off, ptr_pos = _encode_page(
            a, bo, compression, rows_per_strip, photometric, software,
            predictor, base, tile, jpeg_tables,
        )
        sections.append(bytearray(sec))
        ifd_offs.append(ifd_off)
        ptr_positions.append(ptr_pos)
        base += len(sec)
    for i in range(len(sections) - 1):  # chain the IFDs
        p = ptr_positions[i]
        sections[i][p : p + 4] = struct.pack(bo + "I", ifd_offs[i + 1])
    out = bytearray()
    out += byte_order.encode("ascii") + struct.pack(bo + "HI", 42, ifd_offs[0])
    for sec in sections:
        out += sec
    return bytes(out)


# -----------------------------------------------------------------------------
# EXIF — the camera/phone metadata block inside JPEG APP1 segments is a
# TIFF stream (header + IFDs), so the walker above reads it directly.
# Tag IDs from the public EXIF 2.x registry.
# -----------------------------------------------------------------------------

EXIF_TAG_NAMES = {
    0x010F: "Make", 0x0110: "Model", 0x0112: "Orientation",
    0x0131: "Software", 0x0132: "DateTime", 0x8769: "ExifIFDPointer",
    0x829A: "ExposureTime", 0x8827: "ISOSpeedRatings",
    0x9003: "DateTimeOriginal", 0xA002: "PixelXDimension",
    0xA003: "PixelYDimension", 0x8825: "GPSInfoIFDPointer",
}

#: GPS IFD tag ids collide with the 0th-IFD number space, so they get
#: their own name map (public EXIF 2.x GPS attribute registry).
GPS_TAG_NAMES = {
    0x0001: "GPSLatitudeRef", 0x0002: "GPSLatitude",
    0x0003: "GPSLongitudeRef", 0x0004: "GPSLongitude",
    0x0005: "GPSAltitudeRef", 0x0006: "GPSAltitude",
}


def parse_exif(app1_payload: bytes) -> dict[str, list]:
    """EXIF APP1 payload ('Exif\\x00\\x00' + TIFF stream) -> flat
    {tag_name_or_number: [values]} merging the 0th IFD and, when tag
    0x8769 points at one, the Exif sub-IFD.  Malformed payloads raise
    ``ValueError``."""
    p = bytes(app1_payload)
    if p[:6] != b"Exif\x00\x00":
        raise ValueError("not an EXIF APP1 payload")
    tiff = p[6:]
    order, tags = parse_tiff_ifd(tiff)
    bo = "<" if order == "II" else ">"
    if 0x8769 in tags:
        sub_off = int(tags[0x8769][0])
        tags.update(_parse_ifd(tiff, bo, sub_off))
    out = {EXIF_TAG_NAMES.get(t, t): v for t, v in tags.items()}
    if 0x8825 in tags:
        gps = _parse_ifd(tiff, bo, int(tags[0x8825][0]))
        out.update({GPS_TAG_NAMES.get(t, t): v for t, v in gps.items()})
    return out


def exif_gps_decimal(meta: dict) -> tuple[float, float] | None:
    """Parsed EXIF metadata -> (lat, lon) in signed decimal degrees,
    or None when no GPS IFD is present.  The three rationals are combined
    in the FIXED order d + m/60 + s/3600 (each rational evaluated as
    num/den in double first), so both engines of the oracle gate
    produce bit-identical doubles; S/W refs negate."""
    if "GPSLatitude" not in meta or "GPSLongitude" not in meta:
        return None

    def dec(triplet, ref: str, neg: str) -> float:
        (dn, dd), (mn, md), (sn, sd) = triplet
        v = dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0
        return -v if ref == neg else v

    lat = dec(meta["GPSLatitude"], meta.get("GPSLatitudeRef", ["N"])[0], "S")
    lon = dec(meta["GPSLongitude"], meta.get("GPSLongitudeRef", ["E"])[0], "W")
    return lat, lon


def build_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime_original: str,
    iso: int,
    pixel_x: int,
    pixel_y: int,
    byte_order: str = "II",
    gps: tuple | None = None,
) -> bytes:
    """Write a spec-shaped EXIF APP1 payload: 0th IFD (Make, Model,
    Orientation, ExifIFDPointer) + Exif sub-IFD (DateTimeOriginal,
    ISOSpeedRatings, PixelXDimension, PixelYDimension) — the synth /
    oracle vehicle for EXIF extraction, like every codec's encoder."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    bo = "<" if byte_order == "II" else ">"
    # 0th IFD starts right after the 8-byte TIFF header.  Sizes are
    # computed by serializing twice: first with a placeholder pointer
    # to learn the 0th IFD's total length, then for real.
    def zeroth_entries(ptr, gps_ptr):
        ents = [
            (0x010F, 2, [make]),
            (0x0110, 2, [model]),
            (0x0112, 3, [orientation]),
            (0x8769, 4, [ptr]),
        ]
        if gps is not None:
            ents.append((0x8825, 4, [gps_ptr]))
        return ents

    probe = write_ifd(bo, zeroth_entries(0, 0), 8)
    sub_off = 8 + len(probe)
    zeroth = write_ifd(bo, zeroth_entries(sub_off, 0), 8)
    if len(zeroth) != len(probe):
        raise ValueError("IFD size changed with pointer value")
    sub = write_ifd(
        bo,
        [
            (0x8827, 3, [iso]),
            (0x9003, 2, [datetime_original]),
            (0xA002, 4, [pixel_x]),
            (0xA003, 4, [pixel_y]),
        ],
        sub_off,
    )
    if gps is not None:
        # gps = (lat_ref, lat_rationals x3, lon_ref, lon_rationals x3)
        gps_off = sub_off + len(sub)
        zeroth = write_ifd(bo, zeroth_entries(sub_off, gps_off), 8)
        lat_ref, lat_trip, lon_ref, lon_trip = gps
        gps_ifd = write_ifd(
            bo,
            [
                (0x0001, 2, [lat_ref]),
                (0x0002, 5, list(lat_trip)),
                (0x0003, 2, [lon_ref]),
                (0x0004, 5, list(lon_trip)),
            ],
            gps_off,
        )
        header = byte_order.encode("ascii") + struct.pack(bo + "HI", 42, 8)
        return b"Exif\x00\x00" + header + zeroth + sub + gps_ifd
    header = byte_order.encode("ascii") + struct.pack(bo + "HI", 42, 8)
    return b"Exif\x00\x00" + header + zeroth + sub
