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
* ``decode_tiff`` — baseline subset: 8-bit grayscale (photometric
  0/1, MinIsBlack and MinIsWhite) and RGB (photometric 2), strip-
  based, Compression 1 (none), 5 (LZW, MSB-first with early change)
  or 32773 (PackBits), Predictor 2 (horizontal differencing — what
  real LZW TIFFs use), II and MM byte orders, multi-strip with
  RowsPerStrip.
* ``encode_tiff`` — writes spec-conformant files in either byte
  order, none/PackBits, configurable rows per strip — the test/oracle
  vehicle, like every other codec's synth path.
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
    306: "DateTime", 317: "Predictor",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


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
    if vtype == 1:
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
            fmt = {1: "B", 3: "H", 4: "I"}[vtype]
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
    _, pages = parse_tiff_pages(payload)
    return [_decode_page(payload, tags) for tags in pages]


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> uint8 ndarray: (h, w) gray or (h, w, 3) RGB —
    the FIRST page of a multi-page file (use decode_tiff_pages for
    all).  Strip-based, Compression none/LZW/PackBits, Predictor 2,
    II/MM, MinIsWhite gray inverted to MinIsBlack convention."""
    payload = bytes(payload)
    _, tags = parse_tiff_ifd(payload)
    return _decode_page(payload, tags)


def _decode_page(payload: bytes, tags: dict) -> np.ndarray:
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
    if predictor not in (1, 2):
        raise NotImplementedError(f"predictor {predictor} not supported")
    if w <= 0 or h <= 0:
        raise ValueError("invalid TIFF dimensions")
    if any(int(b) != 8 for b in bits):
        raise NotImplementedError("only 8 bits per sample supported")
    if photo in (0, 1):
        if spp != 1:
            raise ValueError("gray photometric with SamplesPerPixel != 1")
    elif photo == 2:
        if spp != 3:
            raise ValueError("RGB photometric with SamplesPerPixel != 3")
    else:
        raise NotImplementedError(f"photometric {photo} not supported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"compression {comp} not supported")
    if w * h * spp > MAX_PIXELS:
        raise ValueError("declared dimensions exceed decoder limit")
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
    row_bytes = w * spp
    out = bytearray()
    for s in range(n_strips):
        off, cnt = int(offsets[s]), int(counts[s])
        if off + cnt > len(payload) or off < 0 or cnt < 0:
            raise ValueError("strip out of bounds")
        strip = payload[off : off + cnt]
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        want = strip_rows * row_bytes
        if comp == 32773:
            strip = packbits_decode(strip, want)
        elif comp == 5:
            strip = lzw_decode(strip, want)
        if len(strip) != want:
            raise ValueError("strip length disagrees with dimensions")
        if predictor == 2:
            # horizontal differencing (tag 317): per-row, per-channel
            # cumulative sum mod 256 restores the samples
            rows = np.frombuffer(strip, dtype=np.uint8).reshape(
                strip_rows, w, spp
            )
            strip = (
                np.cumsum(rows.astype(np.uint32), axis=1) % 256
            ).astype(np.uint8).tobytes()
        out += strip
    img = np.frombuffer(bytes(out), dtype=np.uint8)
    if photo == 0:  # MinIsWhite: invert to the usual convention
        img = 255 - img
    if spp == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, 3)


def _encode_page(arr, bo: str, compression: int,
                 rows_per_strip: int | None, photometric: int | None,
                 software: str, predictor: int, base: int):
    """Build one page section starting at absolute offset ``base``:
    [strips | software | pad | IFD | overflow].  Returns (section
    bytes, absolute IFD offset, position of the next-IFD pointer
    WITHIN the section)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        spp = 1
        photo = 1 if photometric is None else photometric
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        spp = 3
        photo = 2
    else:
        raise ValueError("encode_tiff supports (h,w) gray or (h,w,3) RGB")
    if compression not in (1, 5, 32773):
        raise ValueError(
            "compression must be 1 (none), 5 (LZW) or 32773 (PackBits)"
        )
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and compression == 1:
        raise ValueError("predictor 2 needs a compression scheme")
    rps = h if rows_per_strip is None else max(1, rows_per_strip)
    if photo == 0:
        a = 255 - a
    flat = a.reshape(h, w * spp)
    strips = []
    for s in range(-(-h // rps)):
        block = flat[s * rps : (s + 1) * rps]
        if predictor == 2:
            rows = block.reshape(block.shape[0], w, spp).astype(np.int16)
            diff = rows.copy()
            diff[:, 1:, :] -= rows[:, :-1, :]
            block = (diff % 256).astype(np.uint8).reshape(
                block.shape[0], w * spp
            )
        raw = block.tobytes()
        if compression == 32773:
            raw = packbits_encode(raw)
        elif compression == 5:
            raw = lzw_encode(raw)
        strips.append(raw)

    sw = software.encode("latin-1") + b"\x00"
    strip_offs = []
    pos = base
    for st in strips:
        strip_offs.append(pos)
        pos += len(st)
    sw_off = pos
    pos += len(sw)
    if pos % 2:  # IFDs must be word-aligned
        pos += 1
    ifd_off = pos

    # ASCII software tag handled manually (stored at sw_off)
    fields = [
        (256, 4, [w]), (257, 4, [h]),
        (258, 3, [8] * spp), (259, 3, [compression]),
        (262, 3, [photo]), (273, 4, strip_offs),
        (277, 3, [spp]), (278, 4, [rps]),
        (279, 4, [len(st) for st in strips]),
        (305, 2, None),  # Software -> sw_off
    ]
    if predictor == 2:
        fields.insert(9, (317, 3, [2]))
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
        fmt = {1: "B", 3: "H", 4: "I"}[vtype]
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
    for st in strips:
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
                predictor: int = 1) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> complete TIFF file.
    ``byte_order`` 'II' or 'MM'; ``compression`` 1/5/32773; strips of
    ``rows_per_strip`` rows (default: whole image in one strip);
    optional Predictor 2.  Deterministic layout: header, pixel strips,
    then the IFD."""
    return encode_tiff_multipage(
        [arr], byte_order, compression, rows_per_strip, photometric,
        software, predictor,
    )


def encode_tiff_multipage(pages, byte_order: str = "II",
                          compression: int = 1,
                          rows_per_strip: int | None = None,
                          photometric: int | None = None,
                          software: str = "health-monitor-spark",
                          predictor: int = 1) -> bytes:
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
            predictor, base,
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
    0xA003: "PixelYDimension",
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
    return {EXIF_TAG_NAMES.get(t, t): v for t, v in tags.items()}


def build_exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime_original: str,
    iso: int,
    pixel_x: int,
    pixel_y: int,
    byte_order: str = "II",
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
    zeroth_entries = lambda ptr: [  # noqa: E731
        (0x010F, 2, [make]),
        (0x0110, 2, [model]),
        (0x0112, 3, [orientation]),
        (0x8769, 4, [ptr]),
    ]
    probe = write_ifd(bo, zeroth_entries(0), 8)
    sub_off = 8 + len(probe)
    zeroth = write_ifd(bo, zeroth_entries(sub_off), 8)
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
    header = byte_order.encode("ascii") + struct.pack(bo + "HI", 42, 8)
    return b"Exif\x00\x00" + header + zeroth + sub
