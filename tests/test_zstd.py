"""From-scratch RFC 8878 zstd decoder vs Arrow's bundled libzstd."""

import json
import random

import pyarrow as pa
import pytest

from health_monitor_cc_flink_spark.operators.zstd import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)


def test_xxh64_known_vectors():
    # public xxHash reference vectors
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"a" * 101) == xxh64(b"a" * 100 + b"a")


def _samples():
    random.seed(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    return [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(range(256)) * 50,
        b"\x00" * 10000,
        ("fox " * 5000).encode(),
        bytes(random.randrange(256) for _ in range(5000)),
        bytes(random.choice(b"abcd") for _ in range(20000)),
        (" ".join(random.choice(words)
                  for _ in range(30000))).encode(),
        json.dumps([{"id": i, "v": i * 0.5}
                    for i in range(5000)]).encode(),
        b"x" * 400000,  # multi-block
        (b"abcabcabc" * 3000) + b"X" + (b"abcabcabc" * 1500),
    ]


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
def test_their_compress_our_decompress(level):
    codec = pa.Codec("zstd", compression_level=level)
    for s in _samples():
        assert zstd_decompress(
            codec.compress(s, asbytes=True)) == s


def test_our_compress_their_decompress():
    codec = pa.Codec("zstd")
    for s in _samples():
        framed = zstd_compress(s)
        assert codec.decompress(framed, len(s), asbytes=True) == s
        assert zstd_decompress(framed) == s  # and our own round-trip


def test_checksum_tamper_detected():
    framed = bytearray(zstd_compress(b"payload " * 200))
    framed[-1] ^= 1
    with pytest.raises(ValueError):
        zstd_decompress(bytes(framed))


def test_skippable_frame_skipped():
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(
        4, "little") + b"xyz"
    framed = skip + zstd_compress(b"data")
    assert zstd_decompress(framed) == b"data"


def test_hostile_truncation_and_bitflips_raise_valueerror():
    codec = pa.Codec("zstd", compression_level=3)
    base = codec.compress(b"the quick brown fox " * 500, asbytes=True)
    for cut in range(0, len(base), 23):
        try:
            zstd_decompress(base[:cut])
        except ValueError:
            pass  # never IndexError/struct.error/hang
    random.seed(3)
    for _ in range(150):
        b = bytearray(base)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        try:
            zstd_decompress(bytes(b))
        except ValueError:
            pass


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        zstd_decompress(b"\x00\x00\x00\x00rest")


def test_zstd_parquet_and_orc_files_decode(tmp_path):
    import pyarrow.parquet as pq
    from pyarrow import orc

    from health_monitor_cc_flink_spark.operators.orc_data import (
        read_stripe_column,
    )
    from health_monitor_cc_flink_spark.operators.orc_meta import (
        parse_orc_tail,
    )
    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    vals = [(i * 37) % 1000 - 500 for i in range(20000)]
    svals = [f"v{i % 60}" for i in range(20000)]
    t = pa.table({"x": pa.array(vals, pa.int64()),
                  "s": pa.array(svals)})

    p = tmp_path / "z.parquet"
    pq.write_table(t, p, compression="zstd")
    data = p.read_bytes()
    m = parse_footer(data)
    xs = []
    for rg in m["row_groups"]:
        cc = next(c for c in rg["columns"] if c["path"] == "x")
        assert cc["codec"] == "ZSTD"
        xs.extend(read_column_chunk(
            data,
            start_offset=(cc["dictionary_page_offset"]
                          or cc["data_page_offset"]),
            num_values=cc["num_values"], ptype=cc["type"],
            codec=cc["codec"]))
    assert xs == vals

    o = tmp_path / "z.orc"
    orc.write_table(t, o, compression="zstd")
    data = o.read_bytes()
    m = parse_orc_tail(data)
    assert m["compression"] == "ZSTD"
    xs, ss = [], []
    for s in m["stripes"]:
        xs.extend(read_stripe_column(data, s, "LONG", 1,
                                     m["compression"], s["n_rows"]))
        ss.extend(read_stripe_column(data, s, "STRING", 2,
                                     m["compression"], s["n_rows"]))
    assert xs == vals
    assert ss == svals
