"""Ogg framing edge cases: CRC, lacing spill, continued packets."""

import pytest

from health_monitor_cc_flink_spark.operators.ogg import (
    build_ogg,
    ogg_crc,
    parse_ogg,
)


def _build(d, audio=b"0123456789" * 20, **kw):
    return build_ogg(
        codec=("vorbis", "opus")[d % 2],
        serial=d,
        channels=d % 2 + 1,
        rate=(44100, 48000)[d % 2],
        vendor="health-monitor-synth",
        comments=[f"TITLE=t{d}", f"ARTIST=doc{d}"],
        audio=audio,
        **kw,
    )


def test_ogg_crc_is_not_zlib():
    import zlib

    data = b"The quick brown fox"
    assert ogg_crc(data) != zlib.crc32(data)
    assert ogg_crc(b"") == 0


@pytest.mark.parametrize("d", range(4))
def test_roundtrip(d):
    audio = f"audio {d} ".encode() * (7 * d + 3)
    m = parse_ogg(_build(d, audio))
    assert m["codec"] == ("vorbis", "opus")[d % 2]
    assert m["audio"] == audio
    ndp = -(-len(audio) // 64)
    assert m["n_pages"] == 2 + -(-ndp // 4)
    assert m["n_packets"] == (3 if d % 2 == 0 else 2) + ndp
    assert m["comments"] == [f"TITLE=t{d}", f"ARTIST=doc{d}"]


def test_large_packet_255_lacing_spill():
    audio = b"z" * 1000
    m = parse_ogg(_build(1, audio, packet_bytes=700))
    assert m["audio"] == audio


def test_packet_multiple_of_255_gets_zero_lacing():
    audio = b"q" * 510  # one packet of exactly 2*255
    m = parse_ogg(_build(1, audio, packet_bytes=510))
    assert m["audio"] == audio


def test_crc_tamper_rejected():
    b = bytearray(_build(0))
    b[-1] ^= 0xFF
    with pytest.raises(ValueError):
        parse_ogg(bytes(b))


def test_bad_capture_rejected():
    with pytest.raises(ValueError):
        parse_ogg(b"NotO" + b"\x00" * 40)


def test_truncated_rejected():
    with pytest.raises(ValueError):
        parse_ogg(_build(0)[:30])
