"""XML / sitemap / RSS-Atom parser pins (operators/xml.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.xml import (
    build_rss,
    build_sitemap,
    parse_xml,
    rss_items,
    sitemap_urls,
)


def test_sitemap_roundtrip_with_entities():
    urls = [
        {"loc": "https://ex.org/a?x=1&y=2", "lastmod": "2026-01-05",
         "priority": 0.8},
        {"loc": "https://ex.org/<odd>", "priority": 0.5},
        {"loc": "https://ex.org/plain"},
    ]
    got = sitemap_urls(build_sitemap(urls))
    assert [g["loc"] for g in got] == [u["loc"] for u in urls]
    assert got[0]["lastmod"] == "2026-01-05" and got[0]["priority"] == 0.8
    assert got[2]["lastmod"] is None and got[2]["priority"] is None
    assert not any(g["is_index"] for g in got)


def test_sitemapindex_detected():
    idx = (b'<?xml version="1.0"?><sitemapindex xmlns="x">'
           b"<sitemap><loc>https://e/a.xml</loc></sitemap>"
           b"<sitemap><loc>https://e/b.xml</loc></sitemap>"
           b"</sitemapindex>")
    got = sitemap_urls(idx)
    assert [g["loc"] for g in got] == ["https://e/a.xml", "https://e/b.xml"]
    assert all(g["is_index"] for g in got)


def test_rss_cdata_and_atom():
    items = [{"title": f"T&{i} <b>", "link": f"https://e/{i}",
              "pubDate": "Mon, 05 Jan 2026"} for i in range(4)]
    got = rss_items(build_rss(items))  # even: escaped, odd: CDATA
    assert [g["title"] for g in got] == [f"T&{i} <b>" for i in range(4)]
    atom = (b'<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
            b'<entry><title>e1</title><link href="https://e/1"/>'
            b"<updated>2026-01-01</updated></entry></feed>")
    assert rss_items(atom) == [
        {"title": "e1", "link": "https://e/1", "published": "2026-01-01"}]


def test_parser_entities_attrs_selfclose():
    root = parse_xml(b'<a x="1&amp;2"><b/>t&#65;&#x42;<c>u</c></a>')
    assert root.attrs["x"] == "1&2"
    assert root.text == "tAB"
    assert [c.tag for c in root.children] == ["b", "c"]
    assert root.first("c").text == "u"
    # namespace prefixes kept; local-name matching still finds them
    ns = parse_xml(b"<sm:urlset><sm:url><sm:loc>x</sm:loc></sm:url></sm:urlset>")
    assert ns.local() == "urlset" and ns.first("loc").text == "x"


def test_hostile_xml_flags_cleanly():
    for bad in (b"<a><b></a>", b"<a>", b"text only", b"<a></a><b></b>",
                b"<a>&bogus;</a>", b"\xff\xfe<a/>", b"<a>trail</a>junk"):
        with pytest.raises(ValueError):
            parse_xml(bad)
    with pytest.raises(ValueError, match="root"):
        sitemap_urls(b"<notasitemap></notasitemap>")
    with pytest.raises(ValueError, match="root"):
        rss_items(b"<html></html>")
    deep = b"<a>" * 100 + b"x" + b"</a>" * 100
    with pytest.raises(ValueError, match="depth"):
        parse_xml(deep)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=400))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        parse_xml(data)
    except ValueError:
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.text(st.characters(min_codepoint=32, max_codepoint=1000,
                          exclude_characters="\x00"),
            min_size=1, max_size=30),
    min_size=1, max_size=5,
))
def test_fuzz_rss_title_roundtrip(titles):
    items = [{"title": t, "link": f"https://e/{i}", "pubDate": "d"}
             for i, t in enumerate(titles)]
    got = rss_items(build_rss(items))
    # build strips nothing, but extraction trims edge whitespace
    assert [g["title"] for g in got] == [t.strip() for t in titles]
