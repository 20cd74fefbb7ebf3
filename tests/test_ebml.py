"""EBML/Matroska walk edge cases: vints, unknown-size, hostile."""

import pytest

from health_monitor_cc_flink_spark.operators.ebml import (
    SEGMENT,
    build_mkv,
    encode_vint_size,
    parse_mkv,
    read_vint,
)


def _build(d, payload=b"0123456789abcdef" * 5):
    return build_mkv(
        doctype=("matroska", "webm")[d % 2],
        duration_ms=(d % 500 + 1) * 20,
        title=f"Video {d}",
        video_codec=("V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")[d % 3],
        width=(d % 16) * 16 + 64,
        height=(d % 9) * 16 + 64,
        audio=d % 2 == 1,
        payload=payload,
    )


def test_vint_roundtrip_widths():
    for v in (0, 1, 126, 127, 128, 1 << 13, (1 << 14) - 2, 1 << 20,
              (1 << 35) + 7):
        enc = encode_vint_size(v)
        got, pos = read_vint(enc, 0, keep_marker=False)
        assert (got, pos) == (v, len(enc))


def test_vint_id_keeps_marker():
    v, _ = read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True)
    assert v == 0x1A45DFA3


@pytest.mark.parametrize("d", range(6))
def test_roundtrip(d):
    pay = f"payload for {d} ".encode() * (d + 1)
    m = parse_mkv(_build(d, pay))
    assert m["doctype"] == ("matroska", "webm")[d % 2]
    assert m["payload"] == pay
    assert m["n_blocks"] == -(-len(pay) // 32)
    assert m["n_clusters"] == -(-m["n_blocks"] // 4)
    assert len(m["tracks"]) == (2 if d % 2 else 1)


def test_unknown_size_segment():
    b = _build(0)
    i = b.find(SEGMENT.to_bytes(4, "big"))
    ln = 8 - b[i + 4].bit_length() + 1
    patched = b[: i + 4] + b"\xff" + b[i + 4 + ln :]
    assert parse_mkv(patched)["payload"] == parse_mkv(b)["payload"]


def test_unknown_size_elsewhere_rejected():
    b = _build(0)
    i = b.find(b"\x15\x49\xa9\x66")  # Info
    ln = 8 - b[i + 4].bit_length() + 1
    patched = b[: i + 4] + b"\xff" + b[i + 4 + ln :]
    with pytest.raises(ValueError):
        parse_mkv(patched)


def test_not_ebml_rejected():
    with pytest.raises(ValueError):
        parse_mkv(b"RIFF" + b"\x00" * 32)


def test_overrun_rejected():
    b = _build(1)
    i = b.find(b"\x16\x54\xae\x6b")  # Tracks
    patched = b[: i + 4] + encode_vint_size(1 << 20) + b[i + 5 :]
    with pytest.raises(ValueError):
        parse_mkv(patched)
