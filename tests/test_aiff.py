"""AIFF codec pins (operators/aiff.py — big-endian IFF + 80-bit f80)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.aiff import (
    decode_aiff,
    encode_aiff,
    f80_decode,
    f80_encode,
)


def test_f80_exact_for_audio_rates():
    for r in (1, 8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000,
              192000, 2_000_003):
        assert f80_decode(f80_encode(r)) == float(r), r
    # known byte vector: 44100 = 0x400E AC44...
    assert f80_encode(44100)[:2] == b"\x40\x0e"
    assert f80_encode(44100)[2:4] == b"\xac\x44"
    with pytest.raises(ValueError):
        f80_encode(0)
    with pytest.raises(ValueError):
        f80_decode(b"\x7f\xff" + b"\x00" * 8)  # non-finite
    with pytest.raises(ValueError):
        f80_decode(b"\x00" * 9)


def test_roundtrip_mono_stereo_and_padding():
    t = np.arange(1101)  # ODD sample count -> odd SSND body -> padding
    pcm = np.where((t // 50) % 2 == 0, 700, -700).astype(np.int16)
    s, rate, bd = decode_aiff(encode_aiff(pcm, 44100))
    assert (rate, bd) == (44100, 16)
    assert np.array_equal(s[:, 0], pcm)
    stereo = np.stack([pcm, -pcm], axis=1)
    s2, rate2, _ = decode_aiff(encode_aiff(stereo, 8000))
    assert rate2 == 8000 and np.array_equal(s2, stereo)


def test_corrupt_payloads_flag_cleanly():
    good = encode_aiff(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="FORM"):
        decode_aiff(b"FORX" + good[4:])
    with pytest.raises(ValueError, match="form type"):
        decode_aiff(good[:8] + b"AIFC" + good[12:])
    with pytest.raises(ValueError):
        decode_aiff(good[:30])
    # declared frame count beyond the data
    bad = bytearray(good)
    comm = good.index(b"COMM")
    bad[comm + 10 : comm + 14] = struct.pack(">L", 10_000)
    with pytest.raises(ValueError, match="shorter than declared"):
        decode_aiff(bytes(bad))
    # hostile frame count caps before allocation
    bad[comm + 10 : comm + 14] = struct.pack(">L", 1 << 30)
    with pytest.raises(ValueError, match="limit"):
        decode_aiff(bytes(bad))
    # unsupported depth is explicit
    d8 = bytearray(good)
    d8[comm + 14 : comm + 16] = struct.pack(">h", 8)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_aiff(bytes(d8))


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        decode_aiff(b"FORM" + data)
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc
