"""SURT keys, WET/WAT/CDX-J builders and parsers."""

import pytest

from health_monitor_cc_flink_spark.operators.cdx import (
    build_cdxj,
    build_wat,
    build_wet,
    parse_cdxj,
    parse_wat,
    parse_wet,
    surt,
)


@pytest.mark.parametrize("url,key", [
    ("http://www.Example.COM/Path/Page", "com,example)/path/page"),
    ("https://sub.host.example.org/", "org,example,host,sub)/"),
    ("http://example.com", "com,example)/"),
    ("http://example.com/x?b=2&a=1", "com,example)/x?a=1&b=2"),
    ("http://example.com/x?B=2&a=1#frag", "com,example)/x?a=1&b=2"),
    ("http://www.corpus3.example/7/1?b=2&a=1",
     "example,corpus3)/7/1?a=1&b=2"),
])
def test_surt(url, key):
    assert surt(url) == key


def test_surt_rejects_non_http():
    with pytest.raises(ValueError):
        surt("ftp://example.com/x")
    with pytest.raises(ValueError):
        surt("http:///nohost")


CAPS = [
    {"uri": "http://www.b.example/1?z=1&a=2", "text": "hello world",
     "title": "T1", "links": ["/a", "/b"], "status": 200,
     "mime": "text/html", "digest": "md5:abc", "length": 11},
    {"uri": "http://a.example/2", "text": "second page text",
     "title": "T2", "links": [], "status": 404,
     "mime": "text/html", "digest": "md5:def", "length": 16},
]


def test_wet_roundtrip():
    recs = parse_wet(build_wet(CAPS))
    assert [(r["uri"], r["text"]) for r in recs] == [
        (c["uri"], c["text"]) for c in CAPS
    ]


def test_wat_roundtrip():
    recs = parse_wat(build_wat(CAPS))
    assert [(r["uri"], r["title"], r["links"], r["status"])
            for r in recs] == [
        (c["uri"], c["title"], c["links"], c["status"]) for c in CAPS
    ]


def test_cdxj_sorted_and_roundtrip():
    text = build_cdxj(CAPS)
    rows = parse_cdxj(text)
    # a.example sorts before b.example in SURT space
    assert rows[0]["url"] == "http://a.example/2"
    assert rows[1]["urlkey"] == "example,b)/1?a=2&z=1"
    assert rows[0]["status"] == 404
    assert rows[1]["digest"] == "md5:abc"


def test_cdxj_out_of_order_rejected():
    text = build_cdxj(CAPS)
    lines = text.strip().splitlines()
    with pytest.raises(ValueError):
        parse_cdxj("\n".join(reversed(lines)))


def test_cdxj_malformed_rejected():
    with pytest.raises(ValueError):
        parse_cdxj("only-two fields\n")
