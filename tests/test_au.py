"""Sun AU container: encodings, offsets, unknown-size, hostile."""

import numpy as np
import pytest

from health_monitor_cc_flink_spark.operators.au import build_au, parse_au
from health_monitor_cc_flink_spark.operators.g711 import (
    ulaw_decode,
    ulaw_encode,
)


def test_pcm16_roundtrip_be():
    s = (np.arange(100, dtype=np.int64) * 31 % 4001 - 2000)
    b = build_au(encoding=3, rate=16000, channels=2,
                 data=s.astype(">i2").tobytes())
    m = parse_au(b)
    assert m["encoding_name"] == "pcm16"
    assert (m["samples"] == s).all()
    assert m["n_samples"] == 100 and m["channels"] == 2


def test_pcm8_signed():
    s = np.array([-128, -1, 0, 1, 127], dtype=np.int8)
    m = parse_au(build_au(encoding=2, rate=8000, channels=1,
                          data=s.tobytes()))
    assert m["samples"].tolist() == [-128, -1, 0, 1, 127]


def test_ulaw_matches_g711_module():
    lin = np.array([0, 100, -100, 8000, -8000, 32000], dtype=np.int16)
    enc = ulaw_encode(lin)
    m = parse_au(build_au(encoding=1, rate=8000, channels=1,
                          data=enc.astype(np.uint8).tobytes()))
    assert (m["samples"] == ulaw_decode(enc).astype(np.int32)).all()


def test_annotation_displaces_offset():
    data = np.zeros(10, dtype=np.int8).tobytes()
    b = build_au(encoding=2, rate=8000, channels=1, data=data,
                 annotation=b"a long annotation field\x00")
    assert parse_au(b)["n_samples"] == 10


def test_unknown_size_reads_to_eof():
    data = np.arange(-5, 5, dtype=np.int8).tobytes()
    b = build_au(encoding=2, rate=8000, channels=1, data=data,
                 unknown_size=True)
    assert parse_au(b)["samples"].tolist() == list(range(-5, 5))


def test_declared_size_truncates():
    data = np.arange(10, dtype=np.int8).tobytes()
    b = build_au(encoding=2, rate=8000, channels=1, data=data)
    # append trailing garbage; declared size must win
    assert parse_au(b + b"\xff\xff")["n_samples"] == 10


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        parse_au(b"RIFF" + b"\x00" * 24)


def test_unsupported_encoding_rejected():
    b = bytearray(build_au(encoding=2, rate=8000, channels=1,
                           data=b"\x00"))
    b[15] = 27  # IEEE float encoding: out of supported set
    with pytest.raises(ValueError):
        parse_au(bytes(b))


def test_odd_pcm16_rejected():
    with pytest.raises(ValueError):
        parse_au(build_au(encoding=3, rate=8000, channels=1,
                          data=b"\x00\x01\x02"))


def test_channel_mismatch_rejected():
    with pytest.raises(ValueError):
        parse_au(build_au(encoding=2, rate=8000, channels=2,
                          data=b"\x00\x01\x02"))
