"""G.711 mu-law / A-law codec pins (operators/g711.py, ITU-T G.711)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.g711 import (
    alaw_decode,
    alaw_encode,
    decode_g711_wav,
    encode_g711_wav,
    ulaw_decode,
    ulaw_encode,
)


def test_codeword_idempotence():
    """encode(decode(byte)) == byte for every codeword — the map pair
    is exact.  The single exception is mu-law negative zero (0x7F),
    which decodes to 0 and canonically re-encodes as +0 (0xFF)."""
    u = np.arange(256, dtype=np.uint8)
    re_u = ulaw_encode(ulaw_decode(u))
    assert (re_u[u != 0x7F] == u[u != 0x7F]).all()
    assert re_u[0x7F] == 0xFF and int(ulaw_decode(np.array([0x7F], np.uint8))[0]) == 0
    np.testing.assert_array_equal(alaw_encode(alaw_decode(u)), u)


def test_known_extremes():
    # published G.711 extremes (sox/audioop convention, 16-bit domain):
    # wire byte 0x00 is complemented -> sign bit set -> most negative
    assert int(ulaw_decode(np.array([0x00], np.uint8))[0]) == -32124
    assert int(ulaw_decode(np.array([0x80], np.uint8))[0]) == 32124
    u = np.arange(256, dtype=np.uint8)
    assert ulaw_decode(u).min() == -32124 and ulaw_decode(u).max() == 32124
    assert alaw_decode(u).min() == -32256 and alaw_decode(u).max() == 32256


def test_companding_error_bounds():
    """Segmented companding: quantization error is proportional to the
    segment step (|x|/16 envelope, small absolute floor)."""
    rng = np.random.default_rng(1)
    x = rng.integers(-32635, 32636, 20000).astype(np.int16)
    for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
        err = np.abs(dec(enc(x)).astype(int) - x)
        bound = np.maximum(np.abs(x.astype(int)) / 16, 40)
        assert (err <= bound).all()
        # re-encoding the decoded value is stable (decision levels sit
        # between reconstruction values)
        once = dec(enc(x))
        np.testing.assert_array_equal(dec(enc(once)), once)


def test_monotonicity():
    """Within each sign, decoded magnitude is monotone in the codeword's
    (segment, mantissa) — companding preserves order."""
    u = np.arange(256, dtype=np.uint8)
    for dec in (ulaw_decode, alaw_decode):
        lin = dec(u).astype(int)
        pos = np.sort(lin[lin > 0])
        assert (np.diff(pos) > 0).all()


def test_wav_roundtrip_and_malformed():
    comp = (np.arange(1000) * 7 % 256).astype(np.uint8)
    for law, dec in (("ulaw", ulaw_decode), ("alaw", alaw_decode)):
        wav = encode_g711_wav(comp, 8000, law)
        lin, sr, got_law = decode_g711_wav(wav)
        assert sr == 8000 and got_law == law
        np.testing.assert_array_equal(lin, dec(comp))
    # stereo deinterleave
    lin, _, _ = decode_g711_wav(encode_g711_wav(comp, 8000, "ulaw", channels=2))
    assert lin.shape == (500, 2)
    with pytest.raises(ValueError):
        decode_g711_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_g711_wav(encode_g711_wav(comp, 8000, "ulaw")[:30])
    # PCM tag belongs to the stdlib reader path
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x00")
    pcm = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_g711_wav(pcm)


def test_against_audioop_if_available():
    """Cross-check against CPython's audioop (removed in 3.13 — skip
    when absent) to pin the exact table convention."""
    audioop = pytest.importorskip("audioop")
    # EXHAUSTIVE: every 16-bit input encodes byte-identically
    x = np.arange(-32768, 32768, dtype="<i2")
    np.testing.assert_array_equal(
        ulaw_encode(x),
        np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), dtype=np.uint8),
    )
    np.testing.assert_array_equal(
        alaw_encode(x),
        np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), dtype=np.uint8),
    )
    # ... and every codeword decodes identically
    comp = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(
        ulaw_decode(comp),
        np.frombuffer(audioop.ulaw2lin(comp.tobytes(), 2), dtype="<i2"),
    )
    np.testing.assert_array_equal(
        alaw_decode(comp),
        np.frombuffer(audioop.alaw2lin(comp.tobytes(), 2), dtype="<i2"),
    )


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=100))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    with pytest.raises((ValueError, NotImplementedError)):
        decode_g711_wav(b"RIFF" + data)
