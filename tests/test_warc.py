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


def test_chunked_transfer_encoding_dechunked():
    from health_monitor_cc_flink_spark.operators.warc import decode_http_body

    html = b"<p>alpha beta</p>"
    chunked = (b"5\r\n" + html[:5] + b"\r\n"
               + hex(len(html) - 5)[2:].encode() + b";ext=1\r\n"
               + html[5:] + b"\r\n0\r\nTrailer: x\r\n\r\n")
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
    status, headers, body = split_http_response(http)
    assert decode_http_body(headers, body) == html
    # end-to-end through parse_warc: a chunked response record
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           + f"Content-Length: {len(http)}\r\n\r\n".encode()
           + http + b"\r\n\r\n")
    (r,) = parse_warc(rec)
    assert r["http_body"] == html
    assert html_extract_text(r["http_body"].decode()) == "alpha beta"


def test_content_encoding_gzip_and_deflate():
    import zlib

    from health_monitor_cc_flink_spark.operators.warc import decode_http_body

    html = b"<i>gz body</i>"
    assert decode_http_body({"content-encoding": "gzip"},
                            gzip.compress(html, mtime=0)) == html
    assert decode_http_body({"content-encoding": "deflate"},
                            zlib.compress(html)) == html
    # chunked THEN gzip (TE applies before CE on the decode side)
    gz = gzip.compress(html, mtime=0)
    chunked = hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    assert decode_http_body(
        {"transfer-encoding": "chunked", "content-encoding": "gzip"},
        chunked) == html


def test_unsupported_codings_flag_not_corrupt():
    from health_monitor_cc_flink_spark.operators.warc import decode_http_body

    with pytest.raises(ValueError, match="transfer-encoding"):
        decode_http_body({"transfer-encoding": "gzip, chunked"}, b"x")
    with pytest.raises(ValueError, match="content-encoding"):
        decode_http_body({"content-encoding": "br"}, b"x")
    with pytest.raises(ValueError, match="chunk"):
        decode_http_body({"transfer-encoding": "chunked"}, b"not hex\r\n")
    with pytest.raises(ValueError, match="corrupt"):
        decode_http_body({"content-encoding": "gzip"}, b"\x1f\x8bbroken")


def test_charset_detection_precedence_and_failures():
    """BOM > Content-Type > UTF-8 probe > Latin-1 fallback; declared-
    but-wrong charsets flag, unknown charsets flag."""
    from health_monitor_cc_flink_spark.operators.warc import decode_text_body

    # BOM wins even when the header declares something else
    body = b"\xff\xfe" + "café".encode("utf-16-le")
    cs, txt = decode_text_body({"content-type": "text/html; charset=iso-8859-1"}, body)
    assert (cs, txt) == ("utf-16-le", "café")
    cs, txt = decode_text_body({}, b"\xfe\xff" + "über".encode("utf-16-be"))
    assert (cs, txt) == ("utf-16-be", "über")
    cs, txt = decode_text_body({}, b"\xef\xbb\xbf" + "naïve".encode())
    assert (cs, txt) == ("utf-8", "naïve")
    # declared charset honored (case-insensitive, quoted)
    cs, txt = decode_text_body(
        {"content-type": 'text/html; charset="Windows-1252"'},
        "café".encode("windows-1252"))
    assert (cs, txt) == ("windows-1252", "café")
    # no declaration: valid utf-8 -> utf-8; invalid -> latin-1 fallback
    assert decode_text_body({}, "déjà".encode())[0] == "utf-8"
    cs, txt = decode_text_body({}, b"caf\xe9")  # bare latin-1 byte
    assert (cs, txt) == ("iso-8859-1", "café")
    # declared utf-8 with invalid bytes flags (UnicodeDecodeError is a
    # ValueError), and unknown charsets flag
    with pytest.raises(ValueError):
        decode_text_body({"content-type": "text/html; charset=utf-8"},
                         b"\xff\xff\xff")
    with pytest.raises(ValueError, match="unsupported charset"):
        decode_text_body({"content-type": "text/html; charset=shift_jis"},
                         b"abc")


def test_build_warc_charset_pages_roundtrip():
    from health_monitor_cc_flink_spark.operators.warc import (
        build_warc,
        decode_text_body,
        html_extract_text,
        parse_warc,
    )

    pages = [("http://x/0", "<p>café zero</p>", "utf-16-le"),
             ("http://x/1", "<p>über one</p>", "iso-8859-1"),
             ("http://x/2", "<p>plain two</p>")]  # 2-tuple back-compat
    recs = [r for r in parse_warc(build_warc(pages))
            if r["fields"].get("warc-type") == "response"]
    got = [decode_text_body(r["http_headers"], r["http_body"]) for r in recs]
    assert [c for c, _ in got] == ["utf-16-le", "iso-8859-1", "utf-8"]
    assert [html_extract_text(t) for _, t in got] == [
        "café zero", "über one", "plain two"]


def test_html_metadata_extraction():
    from health_monitor_cc_flink_spark.operators.warc import (
        html_extract_metadata,
    )

    html = (
        "<html><head><title>My  Page &amp; More</title>"
        '<meta property="og:title" content="OG Title"/>'
        '<meta property="og:type" content="article"/>'
        '<meta property="og:title" content="dup ignored"/>'
        '<meta name="description" content="not og"/>'
        '<script type="application/ld+json">{"@type": "Article"}'
        "</script>"
        '<script>var x = "plain script ignored";</script>'
        "</head><body>body text</body></html>"
    )
    meta = html_extract_metadata(html)
    assert meta["title"] == "My Page & More"   # entities + ws collapse
    assert meta["og"] == {"title": "OG Title", "type": "article"}
    assert meta["jsonld"] == ['{"@type": "Article"}']
    # pages without any metadata yield empty structures, no crash
    empty = html_extract_metadata("<p>hi</p>")
    assert empty == {"title": "", "og": {}, "jsonld": []}
