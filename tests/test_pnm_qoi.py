"""Netpbm (PNM) + QOI codec pins (operators/pnm.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.pnm import (
    decode_pnm,
    decode_qoi,
    encode_pnm,
    encode_qoi,
)


def test_pnm_roundtrip_matrix():
    rng = np.random.default_rng(17)
    g8 = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    g16 = rng.integers(0, 65536, (9, 7), dtype=np.uint16)
    rgb = rng.integers(0, 256, (11, 5, 3), dtype=np.uint8)
    rgb16 = rng.integers(0, 65536, (6, 8, 3), dtype=np.uint16)
    bits = rng.integers(0, 2, (10, 19), dtype=np.uint8)
    cases = [(g8, {}), (g8, {"ascii_form": True}),
             (rgb, {}), (rgb, {"ascii_form": True}),
             (g16, {}), (rgb16, {}),
             (bits, {"maxval": 1}),
             (bits, {"maxval": 1, "ascii_form": True})]
    for arr, kw in cases:
        out = decode_pnm(encode_pnm(arr, **kw))
        assert out.dtype == arr.dtype and np.array_equal(out, arr), kw


def test_pnm_comments_and_hostiles():
    # comments are legal anywhere in the header
    raw = b"P2 # c1\n# c2\n3 2\n# c3\n255\n1 2 3 4 5 6\n"
    assert decode_pnm(raw).tolist() == [[1, 2, 3], [4, 5, 6]]
    for bad in (b"P7 junk", b"P5\n10 10\n255\nshort",
                b"P2\n2 2\n255\n1 2 3", b"P5\n-3 4\n255\n",
                b"P2\n2 1\n255\n300 1"):
        with pytest.raises(ValueError):
            decode_pnm(bad)


def test_qoi_roundtrip_all_ops():
    rng = np.random.default_rng(19)
    for ch in (3, 4):
        img = rng.integers(0, 256, (17, 23, ch), dtype=np.uint8)
        img[3:6] = img[2]  # runs
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)
    y, x = np.mgrid[0:32, 0:32]
    grad = np.stack([(x + y) % 256, (2 * x) % 256, (3 * y) % 256],
                    axis=2).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(grad)), grad)
    flat = np.full((40, 40, 3), 7, np.uint8)  # runs cross the 62 cap
    enc = encode_qoi(flat)
    assert np.array_equal(decode_qoi(enc), flat)
    assert len(enc) < 80  # runs actually compress


def test_qoi_hostiles():
    y, x = np.mgrid[0:8, 0:8]
    grad = np.stack([x, y, x + y], axis=2).astype(np.uint8)
    good = encode_qoi(grad)
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"qoix" + good[4:])
    with pytest.raises(ValueError):
        decode_qoi(good[:-3])  # end marker gone
    huge = (b"qoif" + (1 << 20).to_bytes(4, "big") * 2 + b"\x03\x00"
            + b"\x00" * 8)
    with pytest.raises(ValueError, match="cap|marker"):
        decode_qoi(huge)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_both_decoders_fail_cleanly(data):
    for payload in (b"P5\n" + data, b"qoif" + data):
        try:
            if payload[:4] == b"qoif":
                decode_qoi(payload)
            else:
                decode_pnm(payload)
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(3, 4),
       st.integers(0, 2**32 - 1))
def test_fuzz_qoi_roundtrip(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)
