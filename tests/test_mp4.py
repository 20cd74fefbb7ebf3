"""ISO-BMFF walk edge cases: layouts, versions, largesize, hostile."""

import struct

import pytest

from health_monitor_cc_flink_spark.operators.mp4 import (
    MAX_DEPTH,
    build_mp4,
    parse_mp4,
)


def _build(d, text="alpha beta gamma delta"):
    nw = len(text.split(" "))
    return build_mp4(
        brand=("isom", "mp42", "avc1")[d % 3],
        duration_ms=(nw % 300 + 1) * 40,
        n_video_samples=nw,
        width=(d % 16) * 16 + 64,
        height=(d % 9) * 16 + 64,
        audio=d % 2 == 1,
        mdat=text.encode(),
        fast_start=d % 2 == 0,
        mvhd_version=(d // 2) % 2,
    )


@pytest.mark.parametrize("d", range(8))
def test_roundtrip_layouts_and_versions(d):
    m = parse_mp4(_build(d))
    assert m["brand"] == ("isom", "mp42", "avc1")[d % 3]
    assert m["duration_ms"] == (4 % 300 + 1) * 40
    assert len(m["tracks"]) == (2 if d % 2 else 1)
    vid = m["tracks"][0]
    assert vid["handler"] == "vide"
    assert int(vid["width"]) == (d % 16) * 16 + 64
    assert int(vid["height"]) == (d % 9) * 16 + 64
    assert vid["n_samples"] == 4
    assert vid["stsd"][0]["fourcc"] == "avc1"
    assert m["mdat"] == b"alpha beta gamma delta"
    if d % 2:
        aud = m["tracks"][1]
        assert aud["handler"] == "soun"
        assert aud["stsd"][0]["samplerate"] == 44100
        assert aud["stsd"][0]["channels"] == 2


def test_largesize_box():
    """A size==1 box with 64-bit largesize parses identically."""
    base = _build(0)
    # rewrite the mdat box header to the largesize form
    idx = base.find(b"mdat") - 4
    size = struct.unpack_from(">I", base, idx)[0]
    payload = base[idx + 8 : idx + size]
    large = (
        base[:idx]
        + struct.pack(">I4sQ", 1, b"mdat", 16 + len(payload))
        + payload
        + base[idx + size :]
    )
    assert parse_mp4(large)["mdat"] == parse_mp4(base)["mdat"]


def test_size_zero_box_to_eof():
    base = _build(2)  # fast-start: mdat is last
    idx = base.rfind(b"mdat") - 4
    patched = base[:idx] + struct.pack(">I", 0) + base[idx + 4 :]
    assert parse_mp4(patched)["mdat"] == parse_mp4(base)["mdat"]


def test_not_bmff_rejected():
    with pytest.raises(ValueError):
        parse_mp4(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_truncated_rejected():
    with pytest.raises(ValueError):
        parse_mp4(_build(0)[:40])


def test_overrun_box_rejected():
    base = _build(0)
    idx = base.find(b"moov") - 4
    bad = base[:idx] + struct.pack(">I", 1 << 30) + base[idx + 4 :]
    with pytest.raises(ValueError):
        parse_mp4(bad)


def test_depth_bomb_rejected():
    inner = struct.pack(">I4s", 8, b"free")
    for _ in range(MAX_DEPTH + 2):
        inner = struct.pack(">I4s", 8 + len(inner), b"moov") + inner
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00\x00\x02\x00"
    with pytest.raises(ValueError):
        parse_mp4(ftyp + inner)
