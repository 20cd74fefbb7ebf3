"""WARC + HTML-extraction pins (operators/warc.py, ISO 28500)."""

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.warc import (
    build_warc,
    html_extract_text,
    parse_warc,
    split_http_response,
)


def test_roundtrip_plain_and_gzip_members():
    pages = [
        ("http://a/1", "<html><body><p>one two</p></body></html>"),
        ("http://a/2", "<b>three</b>"),
    ]
    for gz in (True, False):
        recs = parse_warc(build_warc(pages, gzip_members=gz))
        assert [r["fields"].get("warc-type") for r in recs] == [
            "warcinfo", "response", "response",
        ]
        for (uri, html), r in zip(pages, recs[1:]):
            assert r["fields"]["warc-target-uri"] == uri
            assert r["http_status"] == 200
            assert r["http_body"].decode() == html
            assert r["http_headers"]["content-type"].startswith("text/html")


def test_html_extraction_rules():
    # script/style/noscript dropped, entities decoded, whitespace joined
    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var a = '<p>not text</p>';</script></head>"
        "<body><h1>A&amp;B</h1><noscript>no</noscript>"
        "<p>  x \n\t y </p><p>z&#33;</p></body></html>"
    )
    assert html_extract_text(html) == "T A&B x y z!"
    # nested skip tags
    assert html_extract_text(
        "<div>a<script>s<script>t</script>u</script>b</div>"
    ) in ("a b", "a u b")  # malformed nesting: either is defensible...
    assert html_extract_text("<p>only</p>") == "only"
    assert html_extract_text("") == ""


def test_http_split_and_malformed():
    status, headers, body = split_http_response(
        b"HTTP/1.1 404 Not Found\r\nX-A: b\r\n\r\nmissing"
    )
    assert status == 404 and headers["x-a"] == "b" and body == b"missing"
    with pytest.raises(ValueError):
        split_http_response(b"not http at all")
    with pytest.raises(ValueError):
        split_http_response(b"HTTP/1.1 abc\r\n\r\n")


def test_malformed_warc_rejected():
    good = build_warc([("u", "<p>x</p>")], gzip_members=False)
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) - 30])  # truncated body
    # corrupt a gzip member
    gz = bytearray(build_warc([("u", "<p>x</p>")], gzip_members=True))
    gz[len(gz) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        parse_warc(bytes(gz))
    # bad Content-Length
    bad = good.replace(b"Content-Length: ", b"Content-Length: x", 1)
    with pytest.raises(ValueError):
        parse_warc(bad)
    # trailing garbage after gzip members
    with pytest.raises(ValueError):
        parse_warc(gzip.compress(good, mtime=0) + b"JUNK")


def test_final_separator_tolerance():
    """Writers that omit the very last record separator still parse."""
    plain = build_warc([("u", "<p>x</p>")], gzip_members=False)
    assert plain.endswith(b"\r\n\r\n")
    recs = parse_warc(plain[:-4])
    assert len(recs) == 2


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    # a random tail that happens to form a valid record is acceptable;
    # anything else must fail with ValueError, never IndexError/etc.
    try:
        parse_warc(b"WARC/1.0\r\n" + data + b"\x00")
    except ValueError:
        pass
