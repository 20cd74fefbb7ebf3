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


def _frame(version, layer, bidx, sidx, n_payload, pad=0):
    h = (0x7FF << 21) | (version << 19) | (layer << 17) | (1 << 16) \
        | (bidx << 12) | (sidx << 10) | (pad << 9) | (0b11 << 6)
    return h.to_bytes(4, "big") + b"\x00" * n_payload


def test_mpeg1_layer2_bitrate_table():
    # MPEG-1 Layer II (layer bits 2), 48 kHz, bitrate index 12 -> 256
    # kbps per the public Layer-II table (NOT the Layer-III 224).
    kbps, sr = 256, 48000
    flen = 1152 // 8 * kbps * 1000 // sr  # 768
    stream = _frame(3, 2, 12, 1, flen - 4) * 3
    n, got_kbps, got_sr, nbytes, dur = walk_mpeg_frames(stream)
    assert (n, got_kbps, got_sr) == (3, 256, 48000)
    assert nbytes == 3 * flen
    assert dur == 3 * 1152 * 1000 // sr


def test_mpeg2_layer1_bitrate_table():
    # MPEG-2 Layer I (version bits 2, layer bits 3), 22050 Hz, bitrate
    # index 5 -> 80 kbps per the MPEG-2 Layer-I table (NOT V1's 160).
    kbps, sr = 80, 22050
    flen = (12 * kbps * 1000 // sr) * 4  # 172
    stream = _frame(2, 3, 5, 0, flen - 4) * 2
    n, got_kbps, got_sr, nbytes, dur = walk_mpeg_frames(stream)
    assert (n, got_kbps, got_sr) == (2, 80, 22050)
    assert nbytes == 2 * flen
    assert dur == 2 * 384 * 1000 // sr


def test_mpeg2_layer2_shares_v2_table_and_1152_samples():
    # MPEG-2 Layer II uses the shared V2 L2/L3 table AND 1152 samples
    # (unlike MPEG-2 Layer III's 576).
    kbps, sr = 64, 24000
    flen = 1152 // 8 * kbps * 1000 // sr  # 384
    stream = _frame(2, 2, 8, 1, flen - 4) * 2
    n, got_kbps, got_sr, nbytes, dur = walk_mpeg_frames(stream)
    assert (n, got_kbps, got_sr) == (2, 64, 24000)
    assert dur == 2 * 1152 * 1000 // sr


# -- ID3v1 trailer ------------------------------------------------------

def test_id3v1_roundtrip_and_v11_track():
    from health_monitor_cc_flink_spark.operators.mp3 import (
        build_id3v1,
        parse_id3v1,
    )

    tag = build_id3v1(title="My Song", artist="An Artist",
                      album="Album X", year="1999", comment="hi",
                      track=7, genre=17)
    assert len(tag) == 128
    m = parse_id3v1(b"\x00" * 64 + tag)
    assert m["title"] == "My Song"
    assert m["artist"] == "An Artist"
    assert m["album"] == "Album X"
    assert m["year"] == "1999"
    assert m["comment"] == "hi"
    assert m["track"] == 7
    assert m["genre"] == "Rock"


def test_id3v1_v10_no_track():
    """Plain v1.0: a full 30-byte comment leaves no track convention."""
    from health_monitor_cc_flink_spark.operators.mp3 import (
        build_id3v1,
        parse_id3v1,
    )

    tag = bytearray(build_id3v1(title="t", artist="a", album="b",
                                year="2000", comment="c" * 28,
                                track=5, genre=0))
    tag[125] = ord("c")  # overwrite the NUL: comment runs 30 bytes
    m = parse_id3v1(bytes(tag))
    assert m["track"] is None
    assert m["comment"].startswith("c" * 28)


def test_id3v1_absent_returns_none():
    from health_monitor_cc_flink_spark.operators.mp3 import parse_id3v1

    assert parse_id3v1(b"\x00" * 200) is None
    assert parse_id3v1(b"short") is None


def test_id3v1_truncation_to_30_bytes():
    from health_monitor_cc_flink_spark.operators.mp3 import (
        build_id3v1,
        parse_id3v1,
    )

    m = parse_id3v1(build_id3v1(
        title="x" * 50, artist="a", album="b", year="2000",
        comment="c", track=1, genre=8))
    assert m["title"] == "x" * 30
    assert m["genre"] == "Jazz"
