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


def test_lpc_roundtrip_and_wins_on_resonant_signal():
    # a sinusoid is the canonical LPC-friendly signal: s[i] ~
    # 2cos(w)s[i-1] - s[i-2], which FIXED's integer [2,-1] cannot model
    i = np.arange(4000)
    sin = np.round(9000 * np.sin(2 * np.pi * i / 41.0)).astype(np.int16)
    auto = encode_flac(sin, 8000)
    forced = encode_flac(sin, 8000, force_lpc=True)
    out, _ = decode_flac(auto)
    np.testing.assert_array_equal(out, sin)
    out, _ = decode_flac(forced)
    np.testing.assert_array_equal(out, sin)
    # LPC must beat the best FIXED-only encode on this signal — assert
    # through the public API by comparing against a FIXED-heavy signal
    # ratio: the sin must compress below 6 bits/sample, unreachable for
    # diff-based predictors at this frequency (measured ~11 bits)
    assert len(auto) * 8 / len(sin) < 6


def test_stereo_decorrelation_modes_roundtrip():
    rng = np.random.default_rng(13)
    base = np.round(7000 * np.sin(2 * np.pi * np.arange(3000) / 29.0))
    L = np.clip(base + rng.integers(-2, 3, 3000), -32768, 32767).astype(np.int16)
    R = np.clip(base - rng.integers(-2, 3, 3000), -32768, 32767).astype(np.int16)
    st2 = np.stack([L, R], axis=1)
    sizes = {}
    for mode in ("indep", "ls", "rs", "ms", "auto"):
        payload = encode_flac(st2, 16000, stereo_mode=mode)
        out, sr = decode_flac(payload)
        np.testing.assert_array_equal(out, st2)
        assert sr == 16000
        sizes[mode] = len(payload)
    # correlated channels: every decorrelated mode beats independent,
    # and auto picks the measured minimum
    assert max(sizes["ls"], sizes["rs"], sizes["ms"]) < sizes["indep"]
    assert sizes["auto"] == min(sizes.values())


def test_lpc_extreme_values_roundtrip():
    # full-scale alternation + plateaus: LPC quantization must stay
    # lossless at the int16 extremes in every stereo mode
    ext = np.tile(
        np.array([32767, -32768, 32767, 0, -1, 1], dtype=np.int16), 500
    )
    st2 = np.stack([ext, (-ext) // 2], axis=1).astype(np.int16)
    for mode in ("indep", "ls", "rs", "ms"):
        out, _ = decode_flac(
            encode_flac(st2, 8000, stereo_mode=mode, force_lpc=True)
        )
        np.testing.assert_array_equal(out, st2)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_fuzz_roundtrip_stereo_lpc(data):
    n = data.draw(st.integers(2, 500))
    mode = data.draw(st.sampled_from(["auto", "indep", "ls", "rs", "ms"]))
    force = data.draw(st.booleans())
    vals = data.draw(
        st.lists(
            st.tuples(
                st.integers(-32768, 32767), st.integers(-32768, 32767)
            ),
            min_size=n,
            max_size=n,
        )
    )
    s = np.array(vals, dtype=np.int16)
    out, sr = decode_flac(
        encode_flac(s, 22050, block_size=256, stereo_mode=mode, force_lpc=force)
    )
    assert sr == 22050
    np.testing.assert_array_equal(out, s)


def test_frame_streaminfo_bps_mismatch_rejected():
    # RFC 9639: a non-zero frame sample-size code must agree with
    # STREAMINFO.  Our encoder writes 0b100 (16-bit); rewrite it to
    # 0b001 (8-bit) in the frame header and fix the CRC-8 so only the
    # cross-check can catch the lie.
    s = (((np.arange(600) * 7) % 512) - 256).astype(np.int16)
    payload = bytearray(encode_flac(s, 8000))
    sync = payload.index(b"\xff\xf8")
    # byte 3 of the header: [chan_code:4][bps_code:3][reserved:1]
    b = payload[sync + 3]
    assert (b >> 1) & 0x7 == 0b100
    payload[sync + 3] = (b & 0xF1) | (0b001 << 1)
    # re-point CRC-8 over the rewritten header bytes
    hdr_len = 4 + 1 + 2  # fixed fields + utf8(frame 0) + 16-bit blocksize
    payload[sync + hdr_len] = _crc8(bytes(payload[sync : sync + hdr_len]))
    with pytest.raises(ValueError, match="sample-size mismatch"):
        decode_flac(bytes(payload))


def test_wasted_bits_overflow_rejected():
    # a subframe claiming >= bps wasted bits is malformed by
    # construction: eff <= 0 must raise ValueError, not crash numpy
    from health_monitor_cc_flink_spark.operators.flac import (
        _BitReader,
        _decode_subframe,
    )

    w_bits = np.zeros(64, dtype=np.uint8)
    # subframe header: pad=0, type=000000 (CONSTANT), wasted flag=1,
    # then unary 15 (16 wasted bits) -> eff = 16-16 = 0
    w_bits[7] = 1  # wasted flag at bit 7
    w_bits[8 + 15] = 1  # unary terminator after 15 zeros
    rd = _BitReader(np.packbits(w_bits).tobytes())
    with pytest.raises(ValueError, match="wasted bits"):
        _decode_subframe(rd, 16, 16)
