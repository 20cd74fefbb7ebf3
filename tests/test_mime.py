"""RFC 5322 / MIME email parse pins (operators/mime.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.mime import (
    b64_decode_strict,
    build_email,
    decode_encoded_words,
    parse_email,
    qp_decode,
    qp_encode,
)

BODY = "hello world " * 30
HTML = "<p>" + BODY + "</p>"
ATT = bytes(range(256)) * 3


def test_simple_text_all_ctes():
    for cte in ("7bit", "quoted-printable", "base64"):
        m = parse_email(build_email("Test subject", "a@x.org", "b@y.org",
                                    BODY, text_cte=cte))
        assert m["subject"] == "Test subject"
        assert len(m["parts"]) == 1
        assert m["parts"][0]["text"] == BODY, cte


def test_multipart_alternative_and_mixed():
    m = parse_email(build_email("Alt", "a@x", "b@y", BODY, html_body=HTML,
                                text_cte="base64"))
    assert [p["content_type"] for p in m["parts"]] == [
        "text/plain", "text/html"]
    assert m["parts"][0]["text"] == BODY and m["parts"][1]["text"] == HTML
    m = parse_email(build_email("Caffè ☕", "a@x", "b@y", BODY,
                                html_body=HTML, attachment=ATT,
                                text_cte="quoted-printable",
                                subject_encoded_word=True))
    assert m["subject"] == "Caffè ☕"  # RFC 2047 B-form round-trip
    assert [p["content_type"] for p in m["parts"]] == [
        "text/plain", "text/html", "application/octet-stream"]
    assert m["parts"][2]["data"] == ATT


def test_header_unfolding_and_q_form():
    raw = (b"Subject: a folded\r\n  subject line\r\n"
           b"X-Long:\r\n\ttab continuation\r\n"
           b"Content-Type: text/plain; charset=utf-8\r\n"
           b"\r\nbody")
    m = parse_email(raw)
    assert m["headers"]["subject"] == "a folded subject line"
    assert m["headers"]["x-long"] == "tab continuation"
    assert m["parts"][0]["text"] == "body"
    # Q-form encoded word: underscores are spaces
    assert decode_encoded_words("=?utf-8?Q?caf=C3=A9_time?=") == "café time"


def test_qp_vectors_and_roundtrip():
    assert qp_decode(b"a=3Db") == b"a=b"
    assert qp_decode(b"long=\r\nline") == b"longline"  # soft break
    with pytest.raises(ValueError, match="escape"):
        qp_decode(b"bad=Z9")
    s = ("línea ünïcode = and more " * 8).encode("utf-8")
    enc = qp_encode(s)
    assert max(len(ln) for ln in enc.split(b"\r\n")) <= 76
    assert qp_decode(enc) == s


def test_hostile_messages_flag_cleanly():
    for bad in (
        b"no separator at all",
        b"Header without colon\r\n\r\nbody",
        b"Content-Type: multipart/mixed\r\n\r\nno boundary param",
        b"Content-Type: multipart/mixed; boundary=q\r\n\r\nno close",
        b"Content-Transfer-Encoding: base64\r\n\r\nnot base64!!",
    ):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_email(bad)
    with pytest.raises(NotImplementedError, match="transfer"):
        parse_email(b"Content-Transfer-Encoding: uuencode\r\n\r\nx")
    with pytest.raises(ValueError):
        b64_decode_strict(b"abc")  # not a multiple of 4


def test_deep_nesting_capped():
    inner = b"Content-Type: text/plain\r\n\r\nleaf"
    for depth in range(12):
        b = f"b{depth}".encode()
        inner = (b"Content-Type: multipart/mixed; boundary=" + b
                 + b"\r\n\r\n--" + b + b"\r\n" + inner
                 + b"\r\n--" + b + b"--\r\n")
    with pytest.raises(ValueError, match="depth"):
        parse_email(inner)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        parse_email(data)
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_qp_roundtrip(data):
    assert qp_decode(qp_encode(data)) == data


def test_qp_no_trailing_whitespace_on_encoded_lines():
    """RFC 2045 §6.7 rule 3: no encoded line may end with a literal
    space or tab — foreign decoders may strip trailing whitespace."""
    import re

    cases = [
        b"hello world ",
        b"trailing tab\t",
        b"mid line\r\nsecond \r\nthird",
        b"a" * 74 + b" ",   # escape would overflow: soft-break first
        b"a" * 73 + b" ",   # escape fits on the line
        b"a" * 200 + b" \r\n tail ",
        b" ",
        b"\t\r\n",
    ]
    for c in cases:
        e = qp_encode(c)
        assert qp_decode(e) == c
        for ln in re.split(rb"[\r\n]", e):
            assert not ln.endswith((b" ", b"\t")), (c, ln)
            assert len(ln) <= 76, (c, ln)
