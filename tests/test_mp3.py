"""MP3 metadata pins (operators/mp3.py — ID3v2 + MPEG frame walk)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.mp3 import (
    _syncsafe,
    _syncsafe_bytes,
    encode_mp3_stub,
    mp3_metadata,
    parse_id3v2,
    walk_mpeg_frames,
)


def test_syncsafe_roundtrip():
    for n in (0, 1, 127, 128, 300_000, (1 << 28) - 1):
        assert _syncsafe(_syncsafe_bytes(n)) == n
    with pytest.raises(ValueError):
        _syncsafe(b"\x80\x00\x00\x00")
    with pytest.raises(ValueError):
        _syncsafe_bytes(1 << 28)


def test_stub_roundtrip_all_rates():
    for kbps in (32, 64, 128, 192, 320):
        for sr in (44100, 48000, 32000):
            p = encode_mp3_stub("A Title", "An Artist", 7, kbps, sr)
            meta = mp3_metadata(p)
            assert meta["title"] == "A Title"
            assert meta["artist"] == "An Artist"
            assert meta["n_frames"] == 7
            assert meta["bitrate_kbps"] == kbps
            assert meta["sample_rate"] == sr
            assert meta["audio_bytes"] == 7 * (144 * kbps * 1000 // sr)
            assert meta["duration_ms"] == 7 * 1152 * 1000 // sr


def test_tagless_stream_and_id3v1_trailer():
    p = encode_mp3_stub("t", "a", 3)
    _, end = parse_id3v2(p)
    bare = p[end:]
    n, kbps, sr, nbytes, dur = walk_mpeg_frames(bare)
    assert n == 3 and kbps == 128 and sr == 44100
    # a trailing ID3v1 'TAG' block stops the walk cleanly
    n2, _, _, nbytes2, _ = walk_mpeg_frames(bare + b"TAG" + b"\x00" * 125)
    assert n2 == 3 and nbytes2 == nbytes


def test_id3v24_syncsafe_frame_sizes():
    # v2.4 uses syncsafe frame sizes: build one by patching the stub
    p = bytearray(encode_mp3_stub("xyz", "q", 1))
    p[3] = 4  # ID3v2.4
    # frame sizes in the stub are plain big-endian but < 128, so they
    # are ALSO valid syncsafe values -> must parse identically
    meta = mp3_metadata(bytes(p))
    assert meta["title"] == "xyz" and meta["artist"] == "q"


def test_malformed_streams_fail_cleanly():
    p = encode_mp3_stub("t", "a", 2)
    with pytest.raises(ValueError):
        mp3_metadata(p[: len(p) - 10])  # truncated final frame
    with pytest.raises(ValueError):
        mp3_metadata(b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f")  # tag > payload
    with pytest.raises(ValueError):
        mp3_metadata(b"\x00" * 100)  # no frame sync
    bad_ver = bytearray(p)
    bad_ver[3] = 9
    with pytest.raises(ValueError):
        mp3_metadata(bytes(bad_ver))
    # reserved bitrate index 15
    _, end = parse_id3v2(p)
    bad_rate = bytearray(p)
    bad_rate[end + 2] |= 0xF0
    with pytest.raises(ValueError):
        mp3_metadata(bytes(bad_rate))


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        mp3_metadata(b"ID3" + data)
    except ValueError:
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-ValueError escape: {type(exc)}") from exc
