"""GIF codec pins (operators/gif.py, pure numpy, GIF89a spec).

GIF's palette pipeline is lossless for <= 256-color images: every
encode→decode roundtrip must be bit-exact, including interlacing,
LZW dictionary growth/reset, animations, and transparency."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def test_lzw_layer_roundtrips_exactly():
    rng = np.random.default_rng(5)
    for min_code in (2, 4, 8):
        alphabet = 1 << min_code
        for n in (1, 10, 1000, 20000):
            data = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
            comp = _lzw_encode(data, min_code)
            assert _lzw_decode(comp, min_code, n) == data
    # dictionary overflow forces a clear-code reset mid-stream
    worst = bytes(range(256)) * 100  # 25600 symbols, low repetition
    comp = _lzw_encode(worst, 8)
    assert _lzw_decode(comp, 8, len(worst)) == worst
    # repetitive input must actually compress
    runs = (b"\x00" * 500 + b"\x01" * 500) * 10
    assert len(_lzw_encode(runs, 2)) < len(runs) // 10


def test_roundtrip_families():
    rng = np.random.default_rng(9)
    img = np.zeros((20, 30, 3), np.uint8)
    img[5:15, 10:20] = [255, 0, 0]
    img[:, 25:] = [0, 0, 255]
    y, x = np.mgrid[0:16, 0:16]
    img256 = np.stack(
        [(y * 16 + x) % 256, (y * 16 + x) // 2 % 256, np.full_like(x, 7)],
        axis=2,
    ).astype(np.uint8)
    assert len(np.unique(img256.reshape(-1, 3), axis=0)) == 256
    two = (
        np.where(rng.integers(0, 2, (13, 17, 1)).astype(bool), 255, 0)
        .repeat(3, axis=2)
        .astype(np.uint8)
    )
    for im in (img, img256, two, np.array([[[1, 2, 3]]], np.uint8)):
        for interlace in (False, True):
            dec = decode_gif(encode_gif(im, interlace=interlace))
            np.testing.assert_array_equal(dec[:, :, :3], im)
            assert (dec[:, :, 3] == 255).all()


def test_animation_compositing_and_transparency():
    base = np.zeros((10, 10, 3), np.uint8)
    f2 = base.copy()
    f2[2:5, 2:5] = [9, 9, 9]
    frames, w, h = decode_gif_frames(encode_gif([base, f2], delay_cs=5))
    assert (w, h) == (10, 10) and len(frames) == 2
    np.testing.assert_array_equal(frames[0][:, :, :3], base)
    np.testing.assert_array_equal(frames[1][:, :, :3], f2)
    # transparent color: those pixels keep the (empty) canvas -> alpha 0
    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 1] = [5, 5, 5]
    dec = decode_gif(encode_gif(img, transparent_color=(0, 0, 0)))
    assert (dec[0, 0] == [0, 0, 0, 0]).all()
    assert (dec[1, 1] == [5, 5, 5, 255]).all()


def test_palette_limit_enforced():
    rng = np.random.default_rng(11)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))


def test_malformed_streams_fail_cleanly():
    img = np.zeros((8, 8, 3), np.uint8)
    payload = bytearray(encode_gif(img))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        decode_gif(bytes(payload[:10]))  # truncated descriptor
    with pytest.raises(ValueError):
        decode_gif(bytes(payload[:-1]))  # missing trailer
    # hostile dims: flag before allocating
    huge = payload.copy()
    huge[6:8] = (0xFFFF).to_bytes(2, "little")
    huge[8:10] = (0xFFFF).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_gif(bytes(huge))
    # truncated LZW data: drop the last sub-block bytes
    cut = bytes(payload[:-10]) + b"\x3b"
    with pytest.raises(ValueError):
        decode_gif(cut)


def test_extensions_are_skipped():
    img = np.zeros((4, 4, 3), np.uint8)
    payload = bytearray(encode_gif(img))
    # splice a comment extension before the image descriptor
    at = payload.index(0x2C, 13)
    payload[at:at] = b"\x21\xfe\x05hello\x00"
    dec = decode_gif(bytes(payload))
    np.testing.assert_array_equal(dec[:, :, :3], img)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + data)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_fuzz_roundtrip_random_palette_images(data):
    h = data.draw(st.integers(1, 16))
    w = data.draw(st.integers(1, 16))
    ncolors = data.draw(st.integers(1, 8))
    interlace = data.draw(st.booleans())
    palette = data.draw(
        st.lists(
            st.tuples(*(st.integers(0, 255),) * 3),
            min_size=ncolors,
            max_size=ncolors,
        )
    )
    idx = data.draw(
        st.lists(st.integers(0, ncolors - 1), min_size=h * w, max_size=h * w)
    )
    img = np.array([palette[i] for i in idx], dtype=np.uint8).reshape(h, w, 3)
    dec = decode_gif(encode_gif(img, interlace=interlace))
    np.testing.assert_array_equal(dec[:, :, :3], img)
