"""WebP lossless (VP8L) codec pins (operators/webp.py, pure numpy).

Lossless ⇒ every encode→decode roundtrip must be bit-exact.  The
encoder emits a valid subset, so the decoder-only surface (color
cache, meta prefix codes, predictor / color / color-indexing
transforms) is exercised with handcrafted spec-built streams whose
expected images are computed by independent forward transforms here.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.webp import (
    _HASH_MUL,
    _LsbWriter,
    _huffman_lengths,
    _value_to_prefix,
    _write_prefix_code,
    decode_webp,
    encode_webp_lossless,
)


def _container(stream: bytes) -> bytes:
    body = b"VP8L" + struct.pack("<I", len(stream) + 1) + bytes([0x2F]) + stream
    if (len(stream) + 1) % 2:
        body += b"\x00"
    body = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _argb(rgba) -> int:
    r, g, b, a = rgba
    return (a << 24) | (r << 16) | (g << 8) | b


def _write_header(w, width, height):
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(0, 1)
    w.put(0, 3)


def _literal_codes(w, pixels_argb, extra_green=()):
    """Write the 5 prefix codes for a literal stream; returns the code
    maps (green, red, blue, alpha, dist)."""
    gf, rf, bf, af = {}, {}, {}, {}
    for v in pixels_argb:
        gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
        rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
        bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
        af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
    for s in extra_green:
        gf[s] = gf.get(s, 0) + 1
    green_size = 256 + 24 + (len(extra_green) and 1 << 4 or 0)
    g = _write_prefix_code(w, _huffman_lengths(gf), green_size)
    r = _write_prefix_code(w, _huffman_lengths(rf), 256)
    b = _write_prefix_code(w, _huffman_lengths(bf), 256)
    a = _write_prefix_code(w, _huffman_lengths(af), 256)
    d = _write_prefix_code(w, _huffman_lengths({0: 1}), 40)
    return g, r, b, a, d


def _emit_literal(w, codes, v):
    g, r, b, a, _ = codes
    for cmap, sym in (
        (g, (v >> 8) & 0xFF),
        (r, (v >> 16) & 0xFF),
        (b, v & 0xFF),
        (a, (v >> 24) & 0xFF),
    ):
        code, ln = cmap[sym]
        w.put_code(code, ln)


def _write_literal_image(w, pixels_argb):
    """Entropy-coded sub-image (no cache, literals only)."""
    w.put(0, 1)  # no color cache
    codes = _literal_codes(w, pixels_argb)
    for v in pixels_argb:
        _emit_literal(w, codes, v)


def test_roundtrip_families():
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:24, 0:17]
    images = [
        np.full((16, 16, 4), [10, 200, 30, 255], dtype=np.uint8),
        np.stack(
            [(x + y) % 256, (2 * x) % 256, (3 * y) % 256, np.full_like(x, 255)],
            axis=2,
        ).astype(np.uint8),
        rng.integers(0, 256, (20, 20, 4)).astype(np.uint8),
        np.repeat(rng.integers(0, 256, (1, 20, 4)), 15, axis=0).astype(np.uint8),
        np.repeat(rng.integers(0, 256, (15, 1, 4)), 20, axis=1).astype(np.uint8),
        np.array([[[5, 6, 7, 8]]], dtype=np.uint8),
    ]
    for img in images:
        for sg in (True, False):
            dec = decode_webp(encode_webp_lossless(img, subtract_green=sg))
            np.testing.assert_array_equal(dec, img)
    # RGB input gets alpha=255
    rgb = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    dec = decode_webp(encode_webp_lossless(rgb))
    np.testing.assert_array_equal(dec[:, :, :3], rgb)
    assert (dec[:, :, 3] == 255).all()
    # predictable content must actually compress (LZ77 + entropy work)
    flat = np.zeros((32, 32, 4), dtype=np.uint8)
    assert len(encode_webp_lossless(flat)) < 100


def test_value_prefix_inverse():
    from health_monitor_cc_flink_spark.operators.webp import _prefix_value

    class FakeReader:
        def __init__(self, v):
            self.v = v

        def read(self, n):
            assert n <= 24
            return self.v & ((1 << n) - 1)

    for v in list(range(1, 300)) + [4095, 4096, 100000]:
        code, bits, extra = _value_to_prefix(v)
        assert 0 <= code < 40
        assert _prefix_value(code, FakeReader(extra)) == v


def test_color_cache_stream():
    """Handcrafted stream: literals then cache hits must reproduce the
    repeating pixels."""
    A = _argb((1, 2, 3, 255))
    B = _argb((200, 100, 50, 255))
    cache_bits = 4
    idx = {v: (_HASH_MUL * v & 0xFFFFFFFF) >> (32 - cache_bits) for v in (A, B)}
    assert idx[A] != idx[B]
    w = _LsbWriter()
    _write_header(w, 4, 2)
    w.put(0, 1)  # no transforms
    w.put(1, 1)  # color cache present
    w.put(cache_bits, 4)
    w.put(0, 1)  # no meta prefix
    cache_syms = [280 + idx[A], 280 + idx[B]]
    codes = _literal_codes(w, [A, B], extra_green=cache_syms)
    g = codes[0]
    _emit_literal(w, codes, A)
    _emit_literal(w, codes, B)
    for s in (cache_syms[0], cache_syms[1]) * 3:
        code, ln = g[s]
        w.put_code(code, ln)
    img = decode_webp(_container(w.bytes()))
    want = np.array(
        [[(1, 2, 3, 255), (200, 100, 50, 255)] * 2] * 2, dtype=np.uint8
    ).reshape(2, 4, 4)
    np.testing.assert_array_equal(img, want)


def test_meta_prefix_groups():
    """Two prefix groups selected by the entropy image: the same green
    symbol decodes to different literals per block."""
    left = _argb((10, 20, 30, 255))
    right = _argb((40, 50, 60, 255))
    w = _LsbWriter()
    _write_header(w, 8, 2)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(1, 1)  # meta prefix present
    w.put(0, 3)  # meta_bits = 2 -> 4x4 blocks -> 2x1 meta image
    _write_literal_image(w, [_argb((0, 0, 0, 0)), _argb((0, 1, 0, 0))])
    for v in (left, right):  # one 5-code group per meta index
        codes = _literal_codes(w, [v])
        # literal emission below needs the maps; single-symbol codes
        # consume zero bits, so each pixel costs nothing in group form
        if v == left:
            left_codes = codes
        else:
            right_codes = codes
    for pos in range(16):
        x = pos % 8
        _emit_literal(w, left_codes if x < 4 else right_codes,
                      left if x < 4 else right)
    img = decode_webp(_container(w.bytes()))
    assert (img[:, :4] == (10, 20, 30, 255)).all()
    assert (img[:, 4:] == (40, 50, 60, 255)).all()


def _forward_predict(img: np.ndarray, mode: int) -> np.ndarray:
    """Independent forward predictor (spec semantics) for an image
    small enough to use ONE predictor block."""
    h, w = img.shape[:2]
    p = img.astype(np.int64)
    argb = (p[:, :, 3] << 24) | (p[:, :, 0] << 16) | (p[:, :, 1] << 8) | p[:, :, 2]
    flat = argb.reshape(-1)
    res = np.zeros_like(flat)

    def chans(v):
        return np.array([(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])

    def pack(c):
        return (int(c[0]) << 24) | (int(c[1]) << 16) | (int(c[2]) << 8) | int(c[3])

    def avg2(a, b):
        return pack((chans(a) + chans(b)) >> 1)

    for i in range(h * w):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(flat[i - 1])
        elif x == 0:
            pred = int(flat[i - w])
        else:
            L, T = int(flat[i - 1]), int(flat[i - w])
            TL = int(flat[i - w - 1])
            TR = int(flat[i - w + 1])
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = avg2(avg2(L, TR), T)
            elif mode == 6:
                pred = avg2(L, TL)
            elif mode == 7:
                pred = avg2(L, T)
            elif mode == 8:
                pred = avg2(TL, T)
            elif mode == 9:
                pred = avg2(T, TR)
            elif mode == 10:
                pred = avg2(avg2(L, TL), avg2(T, TR))
            elif mode == 11:
                c = chans(L) + chans(T) - chans(TL)
                pl = int(np.abs(c - chans(L)).sum())
                pt = int(np.abs(c - chans(T)).sum())
                pred = L if pl <= pt else T
            elif mode == 12:
                pred = pack(np.clip(chans(L) + chans(T) - chans(TL), 0, 255))
            else:
                ave = (chans(L) + chans(T)) >> 1
                half = np.array([int(a + np.trunc((a - b) / 2)) for a, b in
                                 zip(ave, chans(TL))])
                pred = pack(np.clip(half, 0, 255))
        res[i] = pack((chans(int(flat[i])) - chans(pred)) & 0xFF)
    return res


@pytest.mark.parametrize("mode", range(14))
def test_predictor_transform_all_modes(mode):
    rng = np.random.default_rng(100 + mode)
    img = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    res = _forward_predict(img, mode)
    w = _LsbWriter()
    _write_header(w, 8, 8)
    w.put(1, 1)  # transform present
    w.put(0, 2)  # predictor transform
    w.put(1, 3)  # size_bits = 3 -> one 8x8 block
    _write_literal_image(w, [_argb((0, mode, 0, 0))])
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    codes = _literal_codes(w, list(res))
    for v in res:
        _emit_literal(w, codes, int(v))
    out = decode_webp(_container(w.bytes()))
    np.testing.assert_array_equal(out, img)


def test_color_transform_stream():
    rng = np.random.default_rng(55)
    img = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    g2r, g2b, r2b = 17, -30 & 0xFF, 5

    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    res = []
    for px in img.reshape(-1, 4):
        r, g, b, a = (int(v) for v in px)
        tr = (r - delta(g2r, g)) & 0xFF
        tb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
        res.append((a << 24) | (tr << 16) | (g << 8) | tb)
    w = _LsbWriter()
    _write_header(w, 4, 4)
    w.put(1, 1)
    w.put(1, 2)  # color transform
    w.put(0, 3)  # size_bits = 2 -> one 4x4 block
    # cte pixel: blue byte = g2r, green byte = g2b, red byte = r2b
    _write_literal_image(w, [(0 << 24) | (r2b << 16) | (g2b << 8) | g2r])
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    codes = _literal_codes(w, res)
    for v in res:
        _emit_literal(w, codes, v)
    out = decode_webp(_container(w.bytes()))
    np.testing.assert_array_equal(out, img)


def test_color_indexing_with_bundling():
    """4-color palette -> 2-bit indices, 4 pixels bundled per green
    byte; palette entries are delta-coded."""
    palette = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255), (7, 8, 9, 255)]
    w_img, h_img = 10, 3
    rng = np.random.default_rng(77)
    idx = rng.integers(0, 4, (h_img, w_img))
    w = _LsbWriter()
    _write_header(w, w_img, h_img)
    w.put(1, 1)
    w.put(3, 2)  # color indexing
    w.put(len(palette) - 1, 8)
    deltas = []
    prev = (0, 0, 0, 0)
    for r, g, b, a in palette:
        deltas.append(_argb((
            (r - prev[0]) & 0xFF, (g - prev[1]) & 0xFF,
            (b - prev[2]) & 0xFF, (a - prev[3]) & 0xFF)))
        prev = (r, g, b, a)
    _write_literal_image(w, deltas)
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    # bundled image: width ceil(10/4)=3, 2 bits per index, LSB-first
    packed_rows = []
    for y in range(h_img):
        row = []
        for x0 in range(0, 12, 4):
            v = 0
            for k in range(4):
                if x0 + k < w_img:
                    v |= int(idx[y, x0 + k]) << (2 * k)
            row.append(_argb((0, v, 0, 255)))
        packed_rows.extend(row)
    codes = _literal_codes(w, packed_rows)
    for v in packed_rows:
        _emit_literal(w, codes, v)
    out = decode_webp(_container(w.bytes()))
    want = np.array([[palette[idx[y, x]] for x in range(w_img)]
                     for y in range(h_img)], dtype=np.uint8)
    np.testing.assert_array_equal(out, want)


def test_malformed_and_unsupported():
    img = np.zeros((4, 4, 4), dtype=np.uint8)
    payload = bytearray(encode_webp_lossless(img))
    with pytest.raises(ValueError):
        decode_webp(b"NOPE")
    with pytest.raises(ValueError):
        decode_webp(bytes(payload[:15]))
    lossy = payload.copy()
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(lossy))
    vp8x = payload.copy()
    vp8x[12:16] = b"VP8X"
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(vp8x))
    with pytest.raises(ValueError):
        decode_webp(bytes(payload[:-3]))  # truncated entropy data
    # hostile dims: 16383x16383 > MAX_PIXELS must be rejected up front
    w = _LsbWriter()
    _write_header(w, 1 << 14, 1 << 14)
    with pytest.raises(ValueError, match="decoder limit"):
        decode_webp(_container(w.bytes() + b"\x00" * 8))


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    with pytest.raises((ValueError, NotImplementedError)):
        decode_webp(b"RIFF\x00\x01\x00\x00WEBPVP8L" + data)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_fuzz_roundtrip_random_images(data):
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    sg = data.draw(st.booleans())
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=h * w * 4, max_size=h * w * 4)
    )
    img = np.array(vals, dtype=np.uint8).reshape(h, w, 4)
    np.testing.assert_array_equal(
        decode_webp(encode_webp_lossless(img, subtract_green=sg)), img
    )
