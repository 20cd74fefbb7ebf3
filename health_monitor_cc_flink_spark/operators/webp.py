"""WebP lossless (VP8L) encode + decode in pure numpy.

The fourth real image codec in the multimodal stack (after PNG, JPEG
baseline and JPEG progressive): WebP-lossless is the format modern
scrapers meet most often after JPEG/PNG, and like PNG it is LOSSLESS —
every roundtrip is bit-exact, so any deterministic synthetic image
yields a closed-form DuckDB oracle directly.

Implemented from the PUBLIC "WebP Lossless Bitstream Specification"
(and RFC 1951 for the canonical-prefix-code conventions it borrows):

* **Decoder** (``decode_webp``): RIFF/WEBP container, VP8L header,
  ALL FOUR transforms (predictor with its 14 modes and linear-array
  border semantics, color transform with signed fixed-point deltas,
  subtract-green, color-indexing with sub-byte pixel bundling),
  color cache, meta prefix codes (entropy image), simple and
  normal-form prefix codes with 16/17/18 repeat coding, LZ77 with the
  derived 120-entry neighborhood distance map and plain distances.
  Lossy VP8 / extended VP8X raise ``NotImplementedError``; malformed
  streams raise ``ValueError`` — never IndexError — so Arrow feature
  paths can flag rows.
* **Encoder** (``encode_webp_lossless``): valid subset — optional
  subtract-green transform, greedy LZ77 over the two highest-value
  distances (previous pixel, pixel above: both map through the
  neighborhood table), per-channel canonical prefix codes (simple
  2-symbol form or normal form with 17/18 zero-run coding), no color
  cache, single prefix group.  Bit-exact roundtrip for every input.

Scale: same Arrow CPU-map envelope as the other codecs; the entropy
loop is per-payload Python over numpy-unpacked bits (gate images stay
small, and LZ77 runs keep symbol counts low).
"""

from __future__ import annotations

import heapq

import numpy as np

#: Decode-side cap on declared pixel count (ARGB uint32 buffer).
MAX_PIXELS = 1 << 24

_SIG = 0x2F
#: Code-length-code read order (spec "Prefix code lengths" / RFC 1951).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MUL = 0x1E35A7BD  # color-cache multiplier from the spec


def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry LZ77 neighborhood map, derived rather than
    transcribed: all (dx, dy) with dy in 0..7, dx in -7..8 (dx >= 1
    when dy == 0), ordered by squared distance, then |dx|, positive dx
    first — reproduces the spec's published table."""
    cand = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx < 1)
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand


_DIST_MAP = _distance_map()
_DIST_MAP_INV = {p: i + 1 for i, p in enumerate(_DIST_MAP)}

class _LsbReader:
    """LSB-first bit reader (VP8L shares DEFLATE's bit packing) with
    O(1) multi-bit reads via a 5-byte ``int.from_bytes`` window."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.nbits = len(self.data) * 8
        self._padded = self.data + b"\x00" * 5
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("truncated VP8L bitstream")
        byte0 = pos >> 3
        chunk = int.from_bytes(self._padded[byte0 : byte0 + 5], "little")
        self.pos = pos + n
        return (chunk >> (pos & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to n bits without consuming (zero-padded past the end)."""
        pos = self.pos
        byte0 = pos >> 3
        nbytes = ((pos & 7) + n + 7) >> 3
        chunk = int.from_bytes(self._padded[byte0 : byte0 + nbytes], "little")
        return (chunk >> (pos & 7)) & ((1 << n) - 1)


class _LsbWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Prefix codes are written MSB-of-code first (RFC 1951)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr, bitorder="little").tobytes()


# ---------------------------------------------------------------------------
# Canonical prefix codes (RFC 1951 conventions, as the spec mandates)
# ---------------------------------------------------------------------------


def _canonical_codes_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per RFC 1951 canonical assignment."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            if next_code[ln] >= (1 << ln):
                raise ValueError("prefix code overflows code space")
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _revbits(v: int, n: int) -> int:
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


class _PrefixDecoder:
    """Canonical decoder over a peeked-window lookup table (one peek +
    one list index per symbol instead of a per-bit dict walk); codes
    longer than the table window fall back to the walk.  A
    single-symbol code reads 0 bits (spec: length-0 codes)."""

    _LUT_BITS = 11

    def __init__(self, lengths: list[int]):
        used = [s for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0]
            self.table = None
            return
        self.single = None
        codes = _canonical_codes_from_lengths(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(ln for ln, _ in self.table)
        self._build_lut()

    def _build_lut(self) -> None:
        lb = min(self.max_len, self._LUT_BITS)
        self.lut_bits = lb
        lut = np.full(1 << lb, -1, dtype=np.int64)
        for (ln, code), sym in self.table.items():
            if ln <= lb:
                # stream order presents the code MSB-first, and the
                # peeked window is LSB-first: index by the reversed code
                lut[_revbits(code, ln) :: 1 << ln] = (sym << 5) | ln
        self.lut = lut.tolist()

    @classmethod
    def single_symbol(cls, sym: int) -> "_PrefixDecoder":
        d = cls.__new__(cls)
        d.single = sym
        d.table = None
        return d

    @classmethod
    def two_symbols(cls, s0: int, s1: int) -> "_PrefixDecoder":
        d = cls.__new__(cls)
        d.single = None
        d.table = {(1, 0): s0, (1, 1): s1}
        d.max_len = 1
        d._build_lut()
        return d

    def decode(self, rdr: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        entry = self.lut[rdr.peek(self.lut_bits)]
        if entry >= 0:
            ln = entry & 31
            if rdr.pos + ln > rdr.nbits:
                raise ValueError("truncated VP8L bitstream")
            rdr.pos += ln
            return entry >> 5
        code = rdr.read(self.lut_bits)
        # resume the walk with the already-consumed window reversed
        # back into MSB-first order
        code = _revbits(code, self.lut_bits)
        for ln in range(self.lut_bits + 1, self.max_len + 1):
            code = (code << 1) | rdr.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(rdr: _LsbReader, alphabet_size: int) -> _PrefixDecoder:
    if rdr.read(1):  # simple code: 1 or 2 symbols
        num_symbols = rdr.read(1) + 1
        first_8bits = rdr.read(1)
        s0 = rdr.read(8 if first_8bits else 1)
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            return _PrefixDecoder.single_symbol(s0)
        s1 = rdr.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("simple-code symbols out of range")
        return _PrefixDecoder.two_symbols(s0, s1)
    # normal form: code-length code, then symbol lengths w/ repeats
    num_cl = 4 + rdr.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = rdr.read(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    lengths = [0] * alphabet_size
    if rdr.read(1):  # explicit max symbol count
        length_nbits = 2 + 2 * rdr.read(3)
        max_symbol = 2 + rdr.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_dec.decode(rdr)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + rdr.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + rdr.read(3), 0
            else:
                repeat, fill = 11 + rdr.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("prefix code length repeat overflows")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixDecoder(lengths)


def _prefix_value(code: int, rdr: _LsbReader) -> int:
    """Length/distance prefix value: 24-symbol log-scale coding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + rdr.read(extra) + 1


def _value_to_prefix(v: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value -> (code, extra_bits,
    extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    extra = u.bit_length() - 2
    if u >= 3 << extra:
        return 2 * extra + 3, extra, u - (3 << extra)
    return 2 * extra + 2, extra, u - (2 << extra)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_pixels(rdr: _LsbReader, w: int, h: int, allow_meta: bool):
    """Decode one entropy-coded ARGB image (spec §'Decoding of the
    image data'): optional color cache, optional meta prefix codes
    (top-level only), prefix-code groups, then the LZ77-coded pixel
    stream.  Returns a (h*w,) int64 array of ARGB words."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError("VP8L image dimensions out of range")
    cache_bits = 0
    if rdr.read(1):
        cache_bits = rdr.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and rdr.read(1):
        meta_bits = rdr.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_pixels(rdr, mw, mh, False)
        # meta index = (red << 8) | green
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        if n_groups > 1 << 16:
            raise ValueError("too many meta prefix groups")
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(rdr, green_size),
                _read_prefix_code(rdr, 256),  # red
                _read_prefix_code(rdr, 256),  # blue
                _read_prefix_code(rdr, 256),  # alpha
                _read_prefix_code(rdr, 40),  # distance
            )
        )
    pixels = np.zeros(w * h, dtype=np.int64)
    n = w * h
    pos = 0
    mw = -(-w // (1 << meta_bits)) if meta is not None else 0

    def emit(argb: int) -> None:
        nonlocal pos
        pixels[pos] = argb
        if cache is not None:
            cache[(_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        pos += 1

    grp = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        g_dec, r_dec, b_dec, a_dec, d_dec = grp
        sym = g_dec.decode(rdr)
        if sym < 256:  # literal
            red = r_dec.decode(rdr)
            blue = b_dec.decode(rdr)
            alpha = a_dec.decode(rdr)
            emit((alpha << 24) | (red << 16) | (sym << 8) | blue)
        elif sym < 280:  # LZ77 backward reference
            length = _prefix_value(sym - 256, rdr)
            dist_code = _prefix_value(d_dec.decode(rdr), rdr)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                emit(int(pixels[pos - dist]))
        else:  # color cache
            if cache is None:
                raise ValueError("cache symbol without color cache")
            idx = sym - 280
            if idx >= len(cache):
                raise ValueError("color cache index out of range")
            emit(cache[idx])
    return pixels


def _inv_predictor(pixels: np.ndarray, w: int, h: int, bits: int,
                   pred_img: np.ndarray) -> np.ndarray:
    """Inverse predictor transform (spec §'Predictor transform'):
    linear-array neighbor addressing, border overrides (first pixel
    black, top row L, left column T), 14 modes."""
    p = pixels
    pw = -(-w // (1 << bits))

    def avg2(a: int, b: int) -> int:
        return (
            (((a >> 24) + (b >> 24)) >> 1) << 24
            | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
            | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
            | (((a & 0xFF) + (b & 0xFF)) >> 1)
        )

    def clamp_add_sub_full(a: int, b: int, c: int) -> int:
        out = 0
        for shift in (24, 16, 8, 0):
            v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
            out |= max(0, min(255, v)) << shift
        return out

    def clamp_add_sub_half(a: int, b: int) -> int:
        out = 0
        for shift in (24, 16, 8, 0):
            av = (a >> shift) & 0xFF
            bv = (b >> shift) & 0xFF
            v = av + int((av - bv) / 2)  # C-style truncation toward zero
            out |= max(0, min(255, v)) << shift
        return out

    def select(left: int, top: int, topleft: int) -> int:
        p_l = p_t = 0
        for shift in (24, 16, 8, 0):
            lv = (left >> shift) & 0xFF
            tv = (top >> shift) & 0xFF
            tlv = (topleft >> shift) & 0xFF
            pred = lv + tv - tlv
            p_l += abs(pred - lv)
            p_t += abs(pred - tv)
        return left if p_l <= p_t else top

    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(p[i - 1])  # top row: L
        elif x == 0:
            pred = int(p[i - w])  # left column: T
        else:
            mode = (int(pred_img[(y >> bits) * pw + (x >> bits)]) >> 8) & 0xFF
            left = int(p[i - 1])
            top = int(p[i - w])
            tl = int(p[i - w - 1])
            tr = int(p[i - w + 1])  # rightmost column aliases row start
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = avg2(avg2(left, tr), top)
            elif mode == 6:
                pred = avg2(left, tl)
            elif mode == 7:
                pred = avg2(left, top)
            elif mode == 8:
                pred = avg2(tl, top)
            elif mode == 9:
                pred = avg2(top, tr)
            elif mode == 10:
                pred = avg2(avg2(left, tl), avg2(top, tr))
            elif mode == 11:
                pred = select(left, top, tl)
            elif mode == 12:
                pred = clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = clamp_add_sub_half(avg2(left, top), tl)
            else:
                raise ValueError("invalid predictor mode")
        v = int(p[i])
        p[i] = (
            (((v >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((v >> 16) + (pred >> 16)) & 0xFF)) << 16
            | ((((v >> 8) + (pred >> 8)) & 0xFF)) << 8
            | (((v + pred) & 0xFF))
        )
    return p


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(pixels: np.ndarray, w: int, h: int, bits: int,
                         ct_img: np.ndarray) -> np.ndarray:
    """Inverse color transform: signed fixed-point green->red,
    green->blue, red->blue deltas per block (spec §'Color transform')."""
    pw = -(-w // (1 << bits))
    for i in range(w * h):
        x, y = i % w, i // w
        cte = int(ct_img[(y >> bits) * pw + (x >> bits)])
        g2r = _s8(cte & 0xFF)
        g2b = _s8((cte >> 8) & 0xFF)
        r2b = _s8((cte >> 16) & 0xFF)
        v = int(pixels[i])
        green = _s8((v >> 8) & 0xFF)
        red = ((v >> 16) & 0xFF) + ((g2r * green) >> 5)
        red &= 0xFF
        blue = (v & 0xFF) + ((g2b * green) >> 5) + ((r2b * _s8(red)) >> 5)
        pixels[i] = (v & 0xFF00FF00) | (red << 16) | (blue & 0xFF)
    return pixels


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> uint8 (h, w, 4) RGBA array (lossless/VP8L only).

    Raises ``NotImplementedError`` for lossy VP8 / extended VP8X
    streams and ``ValueError`` — never ``IndexError`` — for malformed
    input, so Arrow feature paths can flag corrupt rows."""
    try:
        return _decode_webp(payload)
    except IndexError as exc:  # residual short-read on hostile bytes
        raise ValueError(f"malformed WebP stream: {exc}") from exc


def _decode_webp(payload: bytes) -> np.ndarray:
    import struct

    payload = bytes(payload)
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    fourcc = payload[12:16]
    if fourcc in (b"VP8 ", b"VP8X"):
        raise NotImplementedError("lossy/extended WebP not supported (VP8L only)")
    if fourcc != b"VP8L":
        raise ValueError("unknown WebP chunk")
    (size,) = struct.unpack("<I", payload[16:20])
    data = payload[20 : 20 + size]
    if len(data) < 5 or data[0] != _SIG:
        raise ValueError("bad VP8L signature")
    rdr = _LsbReader(data[1:])
    w = rdr.read(14) + 1
    h = rdr.read(14) + 1
    rdr.read(1)  # alpha hint
    if rdr.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > MAX_PIXELS:
        raise ValueError("declared dimensions exceed decoder limit")
    # transforms are read in stream order and inverted in reverse
    transforms = []
    seen = set()
    cur_w = w
    while rdr.read(1):
        ttype = rdr.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = rdr.read(3) + 2
            sw = -(-cur_w // (1 << bits))
            sh = -(-h // (1 << bits))
            sub = _decode_pixels(rdr, sw, sh, False)
            transforms.append((ttype, bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = rdr.read(8) + 1
            deltas = _decode_pixels(rdr, n_colors, 1, False)
            palette = np.cumsum(
                deltas.reshape(-1, 1) >> np.array([24, 16, 8, 0]) & 0xFF,
                axis=0,
            ) & 0xFF  # per-channel delta coding
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (width_bits, n_colors), palette))
            cur_w = -(-cur_w // (1 << width_bits))
    pixels = _decode_pixels(rdr, cur_w, h, True)
    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:
            width_bits, n_colors = arg
            if width_bits:
                # unbundle packed indices from the green channel
                per = 1 << width_bits
                ib = 8 >> width_bits  # bits per index
                packed = (pixels.reshape(h, -1) >> 8) & 0xFF
                idx = np.zeros((h, packed.shape[1] * per), dtype=np.int64)
                for k in range(per):
                    idx[:, k::per] = (packed >> (k * ib)) & ((1 << ib) - 1)
                idx = idx[:, :w].reshape(-1)
            else:
                idx = (pixels >> 8) & 0xFF
            if int(idx.max()) >= len(sub):
                raise ValueError("palette index out of range")
            chans = sub[idx]  # (n, 4) A,R,G,B columns
            pixels = (
                (chans[:, 0] << 24) | (chans[:, 1] << 16)
                | (chans[:, 2] << 8) | chans[:, 3]
            )
            cur_w = w
        elif ttype == 2:  # add green back to red and blue
            g = (pixels >> 8) & 0xFF
            r = ((pixels >> 16) & 0xFF) + g & 0xFF
            b = (pixels & 0xFF) + g & 0xFF
            pixels = (pixels & 0xFF00FF00) | (r << 16) | b
        elif ttype == 1:
            pixels = _inv_color_transform(pixels, w, h, arg, sub)
        else:
            pixels = _inv_predictor(pixels, w, h, arg, sub)
    out = np.zeros((h * w, 4), dtype=np.uint8)
    out[:, 0] = (pixels >> 16) & 0xFF  # R
    out[:, 1] = (pixels >> 8) & 0xFF  # G
    out[:, 2] = pixels & 0xFF  # B
    out[:, 3] = (pixels >> 24) & 0xFF  # A
    return out.reshape(h, w, 4)


# ---------------------------------------------------------------------------
# Encode (valid subset)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length, max 15 (falls back to equal-weight
    Huffman — still a complete code — if real frequencies would exceed
    the format's 15-bit limit)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}

    def build(weights):
        heap = [(wgt, i, (s,)) for i, (s, wgt) in enumerate(weights.items())]
        heapq.heapify(heap)
        depth = {s: 0 for s in weights}
        nxt = len(heap)
        while len(heap) > 1:
            w1, _, g1 = heapq.heappop(heap)
            w2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, nxt, g1 + g2))
            nxt += 1
        return depth

    depth = build(freqs)
    if max(depth.values()) > 15:
        depth = build({s: 1 for s in syms})
    return depth


def _write_prefix_code(w: _LsbWriter, lengths_map: dict[int, int],
                       alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code definition (simple form for <=2 symbols, else
    normal form with 17/18 zero-run coding); returns symbol -> (code,
    length) for the payload writer."""
    syms = sorted(lengths_map)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.put(1, 1)  # simple
        w.put(len(syms) - 1, 1)
        if syms[0] <= 1 and len(syms) == 1:
            w.put(0, 1)  # 1-bit first symbol
            w.put(syms[0], 1)
        else:
            w.put(1, 1)
            w.put(syms[0], 8)
        if len(syms) == 2:
            w.put(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    lengths = [0] * alphabet_size
    for s, ln in lengths_map.items():
        lengths[s] = ln
    # run-length the zero gaps with 17/18, literals otherwise
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra_bits, extra)
    i = 0
    while i < alphabet_size:
        if lengths[i] == 0:
            j = i
            while j < alphabet_size and lengths[j] == 0:
                j += 1
            run = j - i
            if j == alphabet_size:
                break  # trailing zeros: cut off via max_symbol below
            while run >= 11:
                chunk = min(run, 138)
                tokens.append((18, 7, chunk - 11))
                run -= chunk
            while run >= 3:
                chunk = min(run, 10)
                tokens.append((17, 3, chunk - 3))
                run -= chunk
            tokens.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lengths_map = _huffman_lengths(cl_freqs)
    # the code-length code itself uses plain 3-bit lengths (<=7); the
    # equal-weight fallback guarantees <=ceil(log2(19))=5 bits
    if max(cl_lengths_map.values()) > 7:
        cl_lengths_map = _huffman_lengths({s: 1 for s in cl_freqs})
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    num_cl = max(
        (i + 1 for i, sym in enumerate(_CL_ORDER) if cl_lengths[sym]),
        default=4,
    )
    num_cl = max(num_cl, 4)
    w.put(0, 1)  # normal form
    w.put(num_cl - 4, 4)
    for i in range(num_cl):
        w.put(cl_lengths[_CL_ORDER[i]], 3)
    # explicit symbol count so trailing zeros need no tokens
    n_tokens = len(tokens)
    w.put(1, 1)
    length_nbits_code = 0
    while (2 + 2 * length_nbits_code) < max(2, (n_tokens - 2).bit_length()):
        length_nbits_code += 1
    if length_nbits_code > 7:
        raise ValueError("prefix code too large to describe")
    w.put(length_nbits_code, 3)
    w.put(n_tokens - 2, 2 + 2 * length_nbits_code)
    cl_codes = _canonical_codes_from_lengths(cl_lengths)
    if len(cl_freqs) == 1:
        # single used code-length symbol: the decoder's CL code reads
        # zero bits, so emit none
        cl_codes = {next(iter(cl_freqs)): (0, 0)}
    for sym, extra_bits, extra in tokens:
        code, ln = cl_codes[sym]
        w.put_code(code, ln)
        if extra_bits:
            w.put(extra, extra_bits)
    if len(syms) == 1:
        # single used symbol: zero-bit payload code (spec length-0)
        return {syms[0]: (0, 0)}
    return _canonical_codes_from_lengths(lengths)


def encode_webp_lossless(rgba: np.ndarray, subtract_green: bool = True) -> bytes:
    """uint8 (h, w, 4) RGBA (or (h, w, 3) RGB, alpha=255) -> complete
    lossless WebP bytes.  Valid-subset encoder: optional subtract-green
    transform, greedy LZ77 over distances 1 (previous pixel) and w
    (pixel above) via the neighborhood map, canonical per-channel
    prefix codes, no color cache, one prefix group."""
    import struct

    rgba = np.asarray(rgba, dtype=np.uint8)
    if rgba.ndim == 3 and rgba.shape[2] == 3:
        rgba = np.concatenate(
            [rgba, np.full(rgba.shape[:2] + (1,), 255, dtype=np.uint8)], axis=2
        )
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("expected (h, w, 3|4) uint8 image")
    h, w = rgba.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    flat = rgba.reshape(-1, 4).astype(np.int64)
    argb = (flat[:, 3] << 24) | (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    if subtract_green:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b
    n = w * h
    # greedy LZ77: at each position try dist=1 and dist=w, keep longest
    tokens: list[tuple] = []  # ('lit', argb) | ('copy', length, dist)
    pos = 0
    while pos < n:
        best_len, best_dist = 0, 0
        for dist in (1, w):
            if dist > pos:
                continue
            ln = 0
            while pos + ln < n and ln < 4096 and argb[pos + ln - dist] == argb[pos + ln]:
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, dist
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            pos += best_len
        else:
            tokens.append(("lit", int(argb[pos])))
            pos += 1
    # histograms
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
            rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
            bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
            af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
        else:
            _, length, dist = t
            lcode, _, _ = _value_to_prefix(length)
            gf[256 + lcode] = gf.get(256 + lcode, 0) + 1
            if dist == 1:
                dist_code = _DIST_MAP_INV[(1, 0)]
            elif dist == w:
                dist_code = _DIST_MAP_INV[(0, 1)]
            else:
                dist_code = dist + 120
            dcode, _, _ = _value_to_prefix(dist_code)
            df[dcode] = df.get(dcode, 0) + 1
    for fr in (rf, bf, af):
        if not fr:
            fr[0] = 1  # unused channel still needs a (trivial) code
    if not df:
        df[0] = 1
    # bitstream
    out = _LsbWriter()
    out.put(w - 1, 14)
    out.put(h - 1, 14)
    out.put(0, 1)  # alpha hint
    out.put(0, 3)  # version
    if subtract_green:
        out.put(1, 1)
        out.put(2, 2)  # transform type: subtract green
    out.put(0, 1)  # no (more) transforms
    out.put(0, 1)  # no color cache
    out.put(0, 1)  # no meta prefix codes
    g_codes = _write_prefix_code(out, _huffman_lengths(gf), 256 + 24)
    r_codes = _write_prefix_code(out, _huffman_lengths(rf), 256)
    b_codes = _write_prefix_code(out, _huffman_lengths(bf), 256)
    a_codes = _write_prefix_code(out, _huffman_lengths(af), 256)
    d_codes = _write_prefix_code(out, _huffman_lengths(df), 40)
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            for codes, sym in (
                (g_codes, (v >> 8) & 0xFF),
                (r_codes, (v >> 16) & 0xFF),
                (b_codes, v & 0xFF),
                (a_codes, (v >> 24) & 0xFF),
            ):
                code, ln = codes[sym]
                out.put_code(code, ln)
        else:
            _, length, dist = t
            lcode, lbits, lextra = _value_to_prefix(length)
            code, ln = g_codes[256 + lcode]
            out.put_code(code, ln)
            if lbits:
                out.put(lextra, lbits)
            if dist == 1:
                dist_code = _DIST_MAP_INV[(1, 0)]
            elif dist == w:
                dist_code = _DIST_MAP_INV[(0, 1)]
            else:
                dist_code = dist + 120
            dcode, dbits, dextra = _value_to_prefix(dist_code)
            code, ln = d_codes[dcode]
            out.put_code(code, ln)
            if dbits:
                out.put(dextra, dbits)
    stream = bytes([_SIG]) + out.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
