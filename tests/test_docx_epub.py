"""DOCX + EPUB composition pins (operators/docx.py, operators/epub.py)."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.docx import (
    build_docx,
    parse_docx,
)
from health_monitor_cc_flink_spark.operators.epub import (
    build_epub,
    parse_epub,
)

PARAS = [
    ("Heading words here", True),
    ("body text with & ampersand <tag> and 'quotes'", False),
    ("one", False),
    ("two words", False),
]


def test_docx_roundtrip_and_metadata():
    for compress in (True, False):
        b = build_docx(PARAS, title="My Title", creator="auth",
                       compress=compress)
        got = parse_docx(b)
        assert got["title"] == "My Title" and got["creator"] == "auth"
        assert [(p["text"], p["heading"]) for p in got["paragraphs"]] \
            == PARAS


def test_docx_tab_br_and_run_order():
    """Hand-built document.xml: tabs, breaks, and >2 runs reassemble
    in document order."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="x"><w:body>'
        "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t>"
        "<w:br/><w:t>c</w:t></w:r></w:p>"
        "<w:p><w:pPr><w:pStyle w:val=\"Heading2\"/></w:pPr>"
        "<w:r><w:t>h</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    got = parse_docx(buf.getvalue())
    assert got["paragraphs"][0]["text"] == "a\tb\nc"
    assert got["paragraphs"][1] == {"text": "h", "heading": True}


def test_docx_hostiles_flag_cleanly():
    with pytest.raises(ValueError, match="zip"):
        parse_docx(b"not a zip at all")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<a/>")
    with pytest.raises(ValueError, match="document.xml"):
        parse_docx(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document><unclosed>")
    with pytest.raises(ValueError):
        parse_docx(buf.getvalue())


CHAPTERS = [
    ("Chapter 0", ["para one words", "para two & <more>"]),
    ("Chapter 1", ["solo para"]),
]


def test_epub_roundtrip_spine_order():
    b = build_epub(CHAPTERS, title="The Book")
    got = parse_epub(b)
    assert got["title"] == "The Book"
    assert [c["text"] for c in got["chapters"]] == [
        "Chapter 0 para one words para two & <more>",
        "Chapter 1 solo para",
    ]
    # OCF: mimetype stored first
    with zipfile.ZipFile(io.BytesIO(b)) as zf:
        first = zf.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED


def test_epub_hostiles_flag_cleanly():
    with pytest.raises(ValueError, match="zip"):
        parse_epub(b"PK\x03\x04 truncated")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        parse_epub(buf.getvalue())
    # spine idref pointing nowhere
    b = bytearray(build_epub(CHAPTERS))
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(bytes(b))) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for info in zin.infolist():
            data = zin.read(info.filename)
            if info.filename == "OEBPS/content.opf":
                data = data.replace(b'idref="c1"', b'idref="nope"')
            zout.writestr(info.filename, data)
    with pytest.raises(ValueError, match="idref"):
        parse_epub(buf.getvalue())


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.text(st.characters(min_codepoint=32, max_codepoint=255),
                max_size=40),
        st.booleans(),
    ),
    min_size=1, max_size=5,
))
def test_docx_fuzz_roundtrip(paras):
    # builder normalizes nothing; parser must return exact text
    got = parse_docx(build_docx(paras))
    assert [(p["text"], p["heading"]) for p in got["paragraphs"]] == paras


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=600))
def test_docx_epub_fuzz_arbitrary_bytes_fail_cleanly(data):
    for fn in (parse_docx, parse_epub):
        try:
            fn(data)
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"non-contract escape: {type(exc)}") from exc
