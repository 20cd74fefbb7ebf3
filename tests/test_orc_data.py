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
