"""SRT / WebVTT subtitle parser pins (operators/subtitles.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.subtitles import (
    build_srt,
    build_vtt,
    parse_srt,
    parse_vtt,
)

CUES = [
    {"start_ms": 0, "end_ms": 2500, "text": "hello world"},
    {"start_ms": 2500, "end_ms": 7_265_123, "text": "two\nlines"},
]


def test_srt_roundtrip_multiline_and_long_timings():
    got = parse_srt(build_srt(CUES))
    assert [(c["idx"], c["start_ms"], c["end_ms"], c["text"])
            for c in got] == [
        (1, 0, 2500, "hello world"), (2, 2500, 7_265_123, "two\nlines")]


def test_vtt_variants_and_hourless_timing():
    for kw in ({}, {"with_ids": True}, {"note": "synth"}):
        got = parse_vtt(build_vtt(CUES, **kw))
        assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
            (0, 2500, "hello world"), (2500, 7_265_123, "two\nlines")], kw
    # the hours field is optional in WebVTT
    got = parse_vtt(b"WEBVTT\n\n01:02.003 --> 01:03.500\nx\n")
    assert got[0]["start_ms"] == 62003 and got[0]["end_ms"] == 63500
    # cue settings after the arrow are tolerated
    got = parse_vtt(b"WEBVTT\n\n00:01.000 --> 00:02.000 align:left\nx\n")
    assert got[0]["end_ms"] == 2000
    # BOM tolerated
    assert parse_vtt(b"\xef\xbb\xbfWEBVTT\n\n00:01.000 --> 00:02.000\nx\n")


def test_hostiles_flag_cleanly():
    for fn, bad in ((parse_srt, b"1\nbadtiming\ntext"), (parse_srt, b""),
                    (parse_vtt, b"no header"),
                    (parse_srt, b"1\n00:00:02,000 --> 00:00:01,000\nx"),
                    (parse_srt, b"x\n00:00:01,000 --> 00:00:02,000\nt"),
                    (parse_srt, b"1\n00:00:61,000 --> 00:01:02,000\nx"),
                    (parse_vtt, b"WEBVTT\n\nonly text no timing")):
        with pytest.raises(ValueError):
            fn(bad)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_fail_cleanly(data):
    for fn, payload in ((parse_srt, data), (parse_vtt, b"WEBVTT\n\n" + data)):
        try:
            fn(payload)
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 10**7), st.integers(1, 10**6),
              st.text(st.characters(min_codepoint=32, max_codepoint=500),
                      max_size=30)),
    min_size=1, max_size=5,
))
def test_fuzz_roundtrip(raw):
    cues = [{"start_ms": s, "end_ms": s + d, "text": t.strip()}
            for s, d, t in raw]
    assert [(c["start_ms"], c["end_ms"]) for c in parse_srt(build_srt(cues))] \
        == [(c["start_ms"], c["end_ms"]) for c in cues]
    assert [(c["start_ms"], c["end_ms"]) for c in parse_vtt(build_vtt(cues))] \
        == [(c["start_ms"], c["end_ms"]) for c in cues]
