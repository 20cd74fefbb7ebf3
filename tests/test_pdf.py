"""PDF structural parse + text extraction pins (operators/pdf.py,
ISO 32000-1 subset)."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.pdf import (
    encode_pdf,
    parse_pdf,
    pdf_extract_text,
)

PAGES = [
    ["hello world", "second line with (parens) and \\ backslash"],
    ["page two line one"],
    [],
]


def test_roundtrip_matrix():
    want = ["\n".join(p) for p in PAGES]
    for compress in (False, True):
        for tj in (False, True):
            pdf = encode_pdf(PAGES, compress=compress, use_tj_array=tj)
            assert pdf_extract_text(pdf) == want, (compress, tj)


def test_trailer_and_object_surface():
    doc = parse_pdf(encode_pdf(PAGES))
    assert doc.trailer["Size"] == 10  # 3 fixed + 2 per page + free entry
    root = doc.resolve(doc.trailer["Root"])
    assert doc.resolve(root["Type"]) == "Catalog"
    pages = doc.resolve(doc.resolve(root["Pages"])["Kids"])
    assert len(pages) == 3


def test_string_escapes_and_hex_strings():
    # octal escape, nested parens, hex string via a hand-built page
    body = (b"BT /F1 12 Tf (\\101\\102) Tj (a(b)c) Tj <48 65 78> Tj "
            b"[(x) -250 (y)] TJ ET")
    pdf = _hand_pdf(body)
    assert pdf_extract_text(pdf) == ["AB\na(b)c\nHex\nxy"]


def _hand_pdf(content: bytes, length=None, filt=b"") -> bytes:
    """Minimal single-page PDF around a raw content stream."""
    ln = len(content) if length is None else length
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
        4: (b"<< /Length " + str(ln).encode() + filt
            + b" >>\nstream\n" + content + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in range(1, 5):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    x = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for n in range(1, 5):
        out += f"{offs[n]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n{x}\n%%EOF\n"
            ).encode()
    return bytes(out)


def test_flate_stream_and_bad_flate():
    raw = b"BT (flated) Tj ET"
    pdf = _hand_pdf(zlib.compress(raw), filt=b" /Filter /FlateDecode")
    assert pdf_extract_text(pdf) == ["flated"]
    bad = _hand_pdf(b"\xff\xfe\xfd\xfc", filt=b" /Filter /FlateDecode")
    with pytest.raises(ValueError, match="Flate"):
        pdf_extract_text(bad)


def test_unsupported_subsets_explicit():
    with pytest.raises(NotImplementedError, match="filter"):
        pdf_extract_text(
            _hand_pdf(b"x" * 4, filt=b" /Filter /LZWDecode")
        )
    # an xref STREAM start (a number where 'xref' belongs)
    pdf = bytearray(encode_pdf(PAGES))
    i = pdf.rfind(b"xref")
    pdf[i : i + 4] = b"7 0 "
    with pytest.raises((NotImplementedError, ValueError)):
        parse_pdf(bytes(pdf))


def test_hostile_inputs_flag_cleanly():
    good = encode_pdf(PAGES)
    with pytest.raises(ValueError, match="header"):
        parse_pdf(b"not a pdf at all")
    with pytest.raises(ValueError):
        parse_pdf(good[:80])
    # bad /Length overrunning the file
    pdf = _hand_pdf(b"BT (x) Tj ET", length=1 << 20)
    with pytest.raises(ValueError, match="overruns|Length"):
        pdf_extract_text(pdf)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        pdf_extract_text(b"%PDF-1.4\n" + data)
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                st.characters(min_codepoint=32, max_codepoint=255),
                max_size=40,
            ),
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    ),
    st.booleans(),
    st.booleans(),
)
def test_fuzz_roundtrip_any_latin1_text(pages, compress, tj):
    pdf = encode_pdf(pages, compress=compress, use_tj_array=tj)
    assert pdf_extract_text(pdf) == ["\n".join(p) for p in pages]


def test_mutual_length_reference_cycle_guard():
    """Two streams whose /Length entries reference each other must
    flag as ValueError, not recurse past the interpreter limit."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R >>\nstream\nBT (x) Tj ET\nendstream",
        5: b"<< /Length 4 0 R >>\nstream\nzz\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in range(1, 6):
        offs[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    x = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        out += f"{offs[n]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size 6 /Root 1 0 R >>\n"
            f"startxref\n{x}\n%%EOF\n").encode()
    with pytest.raises(ValueError, match="cycle"):
        pdf_extract_text(bytes(out))


def test_xref_stream_matrix():
    """PDF 1.5 structural matrix: xref stream x ObjStm x PNG-Up
    predictor, each crossed with content compression and TJ form."""
    want = ["\n".join(p) for p in PAGES]
    for objstm in (False, True):
        for pred in (False, True):
            for compress in (False, True):
                pdf = encode_pdf(
                    PAGES, compress=compress, use_tj_array=compress,
                    xref_stream=True, use_objstm=objstm, predictor=pred,
                )
                assert pdf_extract_text(pdf) == want, (objstm, pred)
                doc = parse_pdf(pdf)
                root = doc.resolve(doc.trailer["Root"])
                assert doc.resolve(root["Type"]) == "Catalog"


def test_objstm_packs_dict_objects():
    doc = parse_pdf(encode_pdf(PAGES, xref_stream=True, use_objstm=True))
    # Catalog/Pages/Font/Page dicts routed through the ObjStm map,
    # content streams as plain offsets
    assert 1 in doc._compressed and 4 in doc._compressed
    assert 5 in doc._offsets and 5 not in doc._compressed
    assert doc.resolve(doc.get_object(3)["BaseFont"]) == "Helvetica"


def _incremental_free(base: bytes) -> bytes:
    """Append a revision that shrinks the doc to page 1 and FREES
    objects 6..9 (pages 2-3 and their content streams)."""
    prev = int(base[base.rfind(b"startxref") :].split()[1])
    out = bytearray(base)
    new2 = b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"
    off2 = len(out)
    out += b"2 0 obj\n" + new2 + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n2 1\n" + f"{off2:010d} 00000 n \n".encode()
    out += b"6 4\n" + b"0000000000 00001 f \n" * 4
    out += (
        f"trailer\n<< /Size 10 /Root 1 0 R /Prev {prev} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_incremental_update_free_tombstones():
    """A newer revision's 'f' entry must SHADOW the older 'n' entry:
    deleted objects stay deleted (ADVICE r10: stale-offset
    resurrection)."""
    upd = _incremental_free(encode_pdf(PAGES))
    doc = parse_pdf(upd)
    # updated object 2 wins over the original
    kids = doc.resolve(doc.resolve(doc.trailer["Root"])["Pages"])["Kids"]
    assert len(doc.resolve(kids)) == 1
    # freed objects are tombstoned, not resurrected from rev-1 offsets
    for num in (6, 7, 8, 9):
        with pytest.raises(ValueError, match="missing"):
            doc.get_object(num)
    assert pdf_extract_text(upd) == ["\n".join(PAGES[0])]


def test_hybrid_xrefstm_precedence():
    """Hybrid-reference file (§7.5.8.4): a classic table whose trailer
    names /XRefStm — the stream's entries are consulted BEFORE the
    table's, so an object the table marks free but the stream locates
    still resolves."""
    base = encode_pdf(PAGES, xref_stream=True, use_objstm=True)
    stream_off = int(base[base.rfind(b"startxref") :].split()[1])
    out = bytearray(base)
    xref_off = len(out)
    # the table claims the Catalog (obj 1) is free — stream must win
    out += b"xref\n0 2\n0000000000 65535 f \n0000000000 00001 f \n"
    out += (
        f"trailer\n<< /Size 12 /Root 1 0 R /XRefStm {stream_off} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    assert pdf_extract_text(bytes(out)) == ["\n".join(p) for p in PAGES]


def test_predictor_forms():
    """Unfilter pins: PNG Sub/Up/Average/Paeth and TIFF horizontal
    differencing against hand-filtered rows."""
    from health_monitor_cc_flink_spark.operators.pdf import _apply_predictor

    plain = bytes(range(1, 15))  # two rows of 7
    # PNG Up: row2 stored as diff vs row1
    up = bytes([2]) + plain[:7] + bytes([2]) + bytes(7 for _ in range(7))
    assert _apply_predictor(up, {"Predictor": 12, "Columns": 7}) == plain
    # PNG Sub within one row
    row = bytes([10, 5, 5, 5])
    sub = bytes([1, 10, 251, 0, 0])
    assert _apply_predictor(sub, {"Predictor": 10, "Columns": 4})[:1] == b"\n"
    assert _apply_predictor(sub, {"Predictor": 10, "Columns": 4}) == row
    # TIFF predictor 2
    tiff = bytes([10, 246, 10, 246])
    assert _apply_predictor(
        tiff, {"Predictor": 2, "Columns": 4}
    ) == bytes([10, 0, 10, 0])
    with pytest.raises(ValueError, match="row-aligned"):
        _apply_predictor(b"\x00" * 9, {"Predictor": 12, "Columns": 7})
