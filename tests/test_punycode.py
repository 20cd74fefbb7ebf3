"""RFC 3492 punycode vs CPython's built-in codec (reference impl)."""

import random

import pytest

from health_monitor_cc_flink_spark.operators.punycode import (
    idna_decode_host,
    idna_encode_host,
    punycode_decode,
    punycode_encode,
)

FIXED = ["münchen", "bücher", "ünîcödé", "中文网", "العربية",
         "ليهمابتكلموشعربي؟", "3年b組金八先生", "правда", "ελληνικά",
         "mixed-ascii-日本語", "-leading", "trailing-"]


@pytest.mark.parametrize("label", FIXED)
def test_fixed_vectors_match_stdlib(label):
    mine = punycode_encode(label)
    assert mine == label.encode("punycode").decode("ascii")
    assert punycode_decode(mine) == label


def test_fuzz_500_labels_match_stdlib():
    rng = random.Random(0x1D4A)
    for _ in range(500):
        n = rng.randrange(1, 24)
        label = "".join(
            chr(rng.choice([rng.randrange(97, 123),
                            rng.randrange(0x80, 0x2FFF)]))
            for _ in range(n))
        mine = punycode_encode(label)
        assert mine == label.encode("punycode").decode("ascii"), label
        assert punycode_decode(mine) == label


def test_pure_ascii_label():
    assert punycode_encode("plain") == "plain-"
    assert punycode_decode("plain-") == "plain"


def test_idna_host_roundtrip():
    host = "www.München.Example"
    ace = idna_encode_host(host)
    assert ace == "www.xn--mnchen-3ya.example"
    assert idna_decode_host(ace) == host.lower()


def test_idna_ascii_passthrough():
    assert idna_encode_host("API.Example.COM") == "api.example.com"


def test_bad_digit_rejected():
    with pytest.raises(ValueError):
        punycode_decode("abc-é")


def test_empty_label_rejected():
    with pytest.raises(ValueError):
        idna_encode_host("a..b")


def test_surrogate_code_point_rejected():
    import pytest

    from health_monitor_cc_flink_spark.operators.punycode import (
        punycode_decode,
        punycode_encode,
    )

    # a label decoding into the surrogate range must raise, not
    # produce a lone-surrogate string that breaks UTF-8 encode later
    # (Python strings hold lone surrogates fine; Arrow/UTF-8 does not)
    label = punycode_encode("a" + chr(0xD801))  # crafted hostile input
    with pytest.raises(ValueError):
        punycode_decode(label)
