"""FLAC codec pins (operators/flac.py, pure numpy, RFC 9639 subset).

FLAC is lossless: EVERY roundtrip must be bit-exact, and the format's
own integrity layers (header CRC-8, frame CRC-16, STREAMINFO md5)
must catch corruption."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.flac import (
    _crc8,
    _utf8_like,
    decode_flac,
    encode_flac,
)


def test_roundtrip_shapes_and_compression():
    rng = np.random.default_rng(3)
    saw = (((np.arange(5000) * 7 + 31) % 2048) - 1024).astype(np.int16)
    const = np.full(1000, -123, dtype=np.int16)
    ramp = np.clip(
        np.cumsum(rng.integers(-3, 4, 9000)), -32768, 32767
    ).astype(np.int16)
    for s in (saw, const, ramp):
        payload = encode_flac(s, 8000)
        out, sr = decode_flac(payload)
        np.testing.assert_array_equal(out, s)
        assert sr == 8000
    # predictable signals must actually compress (FIXED + rice working)
    assert len(encode_flac(saw, 8000)) < len(saw) * 2 * 0.5
    assert len(encode_flac(const, 8000)) < 100


def test_roundtrip_stereo_and_multiframe():
    rng = np.random.default_rng(5)
    st2 = np.stack(
        [(((np.arange(4000) * 5) % 1024) - 512), rng.integers(-99, 99, 4000)],
        axis=1,
    ).astype(np.int16)
    out, sr = decode_flac(encode_flac(st2, 44100))
    np.testing.assert_array_equal(out, st2)
    mono = (((np.arange(10000) * 3) % 512) - 256).astype(np.int16)
    out, _ = decode_flac(encode_flac(mono, 16000, block_size=1024))
    np.testing.assert_array_equal(out, mono)  # 10 frames, UTF8-like numbers


def test_utf8_like_frame_numbers():
    # decoder must consume frame numbers >= 0x80 (multi-byte form)
    assert _utf8_like(5) == bytes([5])
    assert _utf8_like(0x80) == bytes([0xC2, 0x80])  # same as real UTF-8
    mono = np.tile(np.arange(-64, 64, dtype=np.int16), 200 * 16)
    payload = encode_flac(mono, 8000, block_size=192)  # >128 frames
    out, _ = decode_flac(payload)
    np.testing.assert_array_equal(out, mono)


def test_integrity_layers_catch_corruption():
    rng = np.random.default_rng(7)
    s = rng.integers(-1000, 1000, 2000).astype(np.int16)
    payload = bytearray(encode_flac(s, 8000))
    # header CRC-8: flip inside the frame header
    hdr = bytearray(payload)
    sync = hdr.index(b"\xff\xf8")
    hdr[sync + 2] ^= 0x04
    with pytest.raises(ValueError):
        decode_flac(bytes(hdr))
    # frame CRC-16: flip deep inside the entropy data
    body = bytearray(payload)
    body[-50] ^= 0xA5
    with pytest.raises(ValueError):
        decode_flac(bytes(body))
    # md5: verify=False skips CRCs only when asked
    out, _ = decode_flac(bytes(payload), verify=True)
    np.testing.assert_array_equal(out, s)


def test_malformed_streams_fail_cleanly():
    with pytest.raises(ValueError):
        decode_flac(b"NOPE")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # no metadata
    rng = np.random.default_rng(9)
    payload = encode_flac(rng.integers(-5, 5, 500).astype(np.int16), 8000)
    with pytest.raises(ValueError):
        decode_flac(payload[:40])  # truncated in STREAMINFO/frames


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    with pytest.raises((ValueError, NotImplementedError)):
        decode_flac(b"fLaC" + data)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_fuzz_roundtrip_random_signals(data):
    n = data.draw(st.integers(1, 700))
    vals = data.draw(
        st.lists(st.integers(-32768, 32767), min_size=n, max_size=n)
    )
    s = np.array(vals, dtype=np.int16)
    out, sr = decode_flac(encode_flac(s, 22050, block_size=256))
    assert sr == 22050
    np.testing.assert_array_equal(out, s)


def test_trailing_garbage_and_bad_sample_rate_rejected():
    rng = np.random.default_rng(11)
    s = rng.integers(-500, 500, 800).astype(np.int16)
    payload = encode_flac(s, 8000)
    with pytest.raises(ValueError, match="trailing"):
        decode_flac(payload + b"GARBAGE")
    # flip a bit inside the (format-unprotected) sample-rate field: the
    # decoder at least bounds-checks it against RFC 9639's maximum
    hacked = bytearray(payload)
    sr_byte = 8 + 10  # STREAMINFO starts at 8; sample rate at bit 80
    hacked[sr_byte] = 0xFF
    hacked[sr_byte + 1] = 0xFF
    try:
        decode_flac(bytes(hacked))
        raise AssertionError("out-of-range sample rate accepted")
    except ValueError:
        pass
