"""ORC stripe data decode vs pyarrow's and Spark's ORC writers."""

import random

import pyarrow as pa
import pytest
from pyarrow import orc

from health_monitor_cc_flink_spark.operators.orc_data import (
    decode_byte_rle,
    decode_rlev2,
    read_stripe_column,
)
from health_monitor_cc_flink_spark.operators.orc_meta import (
    parse_orc_tail,
)

random.seed(0x0BC)
INT_CASES = {
    "short_repeat": [7] * 100,
    "delta_up": list(range(1000)),
    "delta_down": list(range(0, -3000, -3)),
    "direct": [(i * 37) % 1000 - 500 for i in range(600)],
    "patched_base": [10] * 300 + [1 << 40] + [11] * 200,
    # narrow 5-bit base with 2^11 outliers: the (gap,patch) pairs pack
    # at a NON-byte-aligned closestFixedBits width — the r11 decoder
    # byte-rounded it and misdecoded exactly this shape
    "patched_narrow": [
        2048 + i if i % 47 == 0 else (i * 13) % 32 for i in range(512)
    ],
    "patched_narrow_sparse": [5] * 500 + [2048, 4000] + [9] * 10,
    "random_wide": [random.randrange(-10**12, 10**12)
                    for _ in range(5000)],
    "random_narrow": [random.randrange(0, 3) for _ in range(5000)],
}


def _roundtrip_int(vals, tmp_path, codec="snappy"):
    path = tmp_path / "t.orc"
    orc.write_table(pa.table({"c": pa.array(vals, type=pa.int64())}),
                    path, compression=codec)
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    got = []
    for s in m["stripes"]:
        got.extend(read_stripe_column(data, s, "LONG", 1,
                                      m["compression"], s["n_rows"]))
    return got


@pytest.mark.parametrize("name", sorted(INT_CASES),
                         ids=lambda n: n)
def test_rlev2_subformats_vs_pyarrow_writer(name, tmp_path):
    vals = INT_CASES[name]
    assert _roundtrip_int(vals, tmp_path) == vals


def test_uncompressed_and_zlib(tmp_path):
    vals = INT_CASES["direct"]
    assert _roundtrip_int(vals, tmp_path, codec="uncompressed") == vals
    assert _roundtrip_int(vals, tmp_path, codec="zlib") == vals


def test_strings_and_nulls(tmp_path):
    svals = [None if i % 7 == 3 else f"v{i % 50}" for i in range(2000)]
    dvals = [None if i % 5 == 0 else i / 4.0 for i in range(2000)]
    path = tmp_path / "sn.orc"
    orc.write_table(pa.table({"s": pa.array(svals),
                              "d": pa.array(dvals,
                                            type=pa.float64())}),
                    path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    got_s, got_d = [], []
    for s in m["stripes"]:
        got_s.extend(read_stripe_column(data, s, "STRING", 1,
                                        m["compression"], s["n_rows"]))
        got_d.extend(read_stripe_column(data, s, "DOUBLE", 2,
                                        m["compression"], s["n_rows"]))
    assert got_s == svals
    assert got_d == dvals


def test_spark_written_lineitem_value_exact(spark, tmp_path):
    import glob

    import duckdb

    from health_monitor_cc_flink_spark.sources.testdata import load_table

    out = str(tmp_path / "li")
    (load_table(spark, "/root/testdata/sf0.001", "lineitem")
     .coalesce(1).write.mode("overwrite")
     .option("compression", "snappy").orc(out))
    (path,) = glob.glob(out + "/part-*.orc")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    kinds = {n: k for k, n in m["schema"]}
    ids = {n: i + 1 for i, (_, n) in enumerate(m["schema"])}
    con = duckdb.connect()
    ref = con.sql(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag "
        "FROM read_parquet("
        "'/root/testdata/sf0.001/lineitem.parquet')").fetchall()
    con.close()
    for j, col in enumerate(("l_orderkey", "l_linenumber",
                             "l_quantity", "l_returnflag")):
        got = []
        for s in m["stripes"]:
            got.extend(read_stripe_column(
                data, s, kinds[col], ids[col], m["compression"],
                s["n_rows"]))
        assert got == [r[j] for r in ref], col


def test_byte_rle():
    # run of 10 zeros (ctrl 7), then 3 literals (ctrl 253)
    assert decode_byte_rle(bytes([7, 0, 253, 1, 2, 3])) == (
        b"\x00" * 10 + b"\x01\x02\x03")
    with pytest.raises(ValueError):
        decode_byte_rle(bytes([7]))


def test_rlev2_hostile():
    with pytest.raises(ValueError):
        decode_rlev2(b"\x40", signed=True, n=10)  # truncated direct
    with pytest.raises(ValueError):
        decode_rlev2(b"", signed=True, n=1)
    # patched-base stream truncated inside the 4-byte header must be a
    # ValueError, not IndexError (kind==2 is first>>6 == 2)
    with pytest.raises(ValueError):
        decode_rlev2(bytes([0x80, 0x01, 0x22]), signed=True, n=3)


def test_timestamp_and_decimal_columns(tmp_path):
    """Real ORC TIMESTAMP (seconds+nanos streams, incl. the C++
    writer's signed-nanos pre-1970 convention) and DECIMAL (signed
    varint + scale) across codecs, value-exact vs the writer."""
    import calendar
    import datetime
    import decimal

    ts = [
        datetime.datetime(1992, 3, 4, 5, 6, 7),
        datetime.datetime(2020, 1, 1),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 123456),
        datetime.datetime(2015, 1, 1),
        datetime.datetime(1998, 12, 1, 0, 0, 0, 500000),
        datetime.datetime(2014, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(1970, 1, 1),
        datetime.datetime(1960, 6, 15, 12, 0, 0, 250000),
        datetime.datetime(1970, 1, 1, 0, 0, 0, 123456),
        datetime.datetime(1969, 12, 31, 23, 59, 58, 500000),
    ]
    dec = [decimal.Decimal(s) for s in (
        "12.34", "-0.01", "99999.99", "0.00", "-12345.67", "1.00",
        "-99999.99", "50.05", "0.01", "-0.99")]
    want_ts = [calendar.timegm(x.timetuple()) * 10**9
               + x.microsecond * 1000 for x in ts]
    for codec in ("snappy", "zstd", "uncompressed"):
        path = tmp_path / f"t_{codec}.orc"
        orc.write_table(
            pa.table({"ts": pa.array(ts, pa.timestamp("ns")),
                      "d": pa.array(dec, pa.decimal128(10, 2))}),
            path, compression=codec)
        with open(path, "rb") as f:
            data = f.read()
        m = parse_orc_tail(data)
        s = m["stripes"][0]
        assert read_stripe_column(
            data, s, "TIMESTAMP", 1, m["compression"],
            s["n_rows"]) == want_ts
        assert read_stripe_column(
            data, s, "DECIMAL", 2, m["compression"],
            s["n_rows"]) == dec


def test_decimal_nulls(tmp_path):
    import decimal

    dec = [None if i % 3 == 0 else decimal.Decimal(i * 7 - 50) / 100
           for i in range(200)]
    path = tmp_path / "dn.orc"
    orc.write_table(
        pa.table({"d": pa.array(dec, pa.decimal128(10, 2))}),
        path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    got = []
    for s in m["stripes"]:
        got.extend(read_stripe_column(data, s, "DECIMAL", 1,
                                      m["compression"], s["n_rows"]))
    assert got == dec


def test_nanos_trick_decode():
    from health_monitor_cc_flink_spark.operators.orc_data import (
        decode_nanos,
    )

    assert decode_nanos((1 << 3) | 2) == 1000  # the spec's example
    assert decode_nanos(0) == 0
    assert decode_nanos((5 << 3) | 7) == 500_000_000
    assert decode_nanos(123456000 << 3) == 123456000
    # C++ writer's signed form: -0.5 s stores -(5e8) zero-compressed
    assert decode_nanos((-33) % (1 << 64)) == -500_000_000
    with pytest.raises(ValueError):
        decode_nanos((999_999_9999 << 3))


def test_boolean_tinyint_binary_columns(tmp_path):
    """BOOLEAN rides bit-packed byte-RLE (like PRESENT); tinyint is
    byte-RLE signed (NOT RLEv2 — the old router misdecoded it);
    BINARY is the STRING shape without utf-8."""
    bools = [None if i % 11 == 5 else (i % 3 == 0)
             for i in range(3000)]
    tiny = [(i * 7) % 256 - 128 for i in range(3000)]
    bins = [bytes([i % 251, (255 - i) % 251]) for i in range(3000)]
    path = tmp_path / "btb.orc"
    orc.write_table(
        pa.table({"b": pa.array(bools),
                  "i8": pa.array(tiny, pa.int8()),
                  "bin": pa.array(bins, pa.binary())}),
        path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    gb, gi, gbin = [], [], []
    for s in m["stripes"]:
        gb.extend(read_stripe_column(data, s, "BOOLEAN", 1,
                                     m["compression"], s["n_rows"]))
        gi.extend(read_stripe_column(data, s, "BYTE", 2,
                                     m["compression"], s["n_rows"]))
        gbin.extend(read_stripe_column(data, s, "BINARY", 3,
                                       m["compression"], s["n_rows"]))
    assert gb == bools
    assert gi == tiny
    assert gbin == bins


def test_nested_list_map_struct_columns(tmp_path):
    """LIST / MAP / STRUCT / list<struct> decode recursively: the
    parent LENGTH stream partitions the child column's slots."""
    n = 2000
    lists = [None if i % 9 == 7 else [j * 2 + i for j in range(i % 5)]
             for i in range(n)]
    maps = [[(f"k{j}", j + i) for j in range(i % 4)] for i in range(n)]
    structs = [None if i % 13 == 11 else {"a": i * 3, "b": f"s{i % 7}"}
               for i in range(n)]
    nested = [[{"x": i + j} for j in range(i % 3)] for i in range(n)]
    t = pa.table({
        "l": pa.array(lists, pa.list_(pa.int64())),
        "m": pa.array(maps, pa.map_(pa.string(), pa.int64())),
        "st": pa.array(structs, pa.struct([("a", pa.int64()),
                                           ("b", pa.string())])),
        "ls": pa.array(nested,
                       pa.list_(pa.struct([("x", pa.int64())]))),
    })
    path = tmp_path / "lm.orc"
    orc.write_table(t, path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    ids = dict(zip([nm for _, nm in m["schema"]],
                   m["types"][0]["subtypes"]))
    s = m["stripes"][0]

    def col(name):
        cid = ids[name]
        return read_stripe_column(
            data, s, m["types"][cid]["kind"], cid, m["compression"],
            s["n_rows"], types=m["types"])

    assert col("l") == lists
    assert col("m") == [dict(r) for r in maps]
    assert col("st") == structs
    assert col("ls") == nested


def test_nested_without_types_raises(tmp_path):
    t = pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))})
    path = tmp_path / "l.orc"
    orc.write_table(t, path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_orc_tail(data)
    with pytest.raises(ValueError, match="types"):
        read_stripe_column(data, m["stripes"][0], "LIST", 1,
                           m["compression"], m["stripes"][0]["n_rows"])
