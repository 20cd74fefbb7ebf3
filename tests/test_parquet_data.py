"""Parquet data-page decode vs DuckDB and vs pyarrow-written files."""

import duckdb
import pytest

from health_monitor_cc_flink_spark.operators.parquet_data import (
    read_column_chunk,
    read_rle_hybrid,
)
from health_monitor_cc_flink_spark.operators.parquet_meta import (
    parse_footer,
)

PATH = "/root/testdata/sf0.001/lineitem.parquet"


def _decode_column(data, m, col):
    vals = []
    for rg in m["row_groups"]:
        cc = next(c for c in rg["columns"] if c["path"] == col)
        start = cc["dictionary_page_offset"] or cc["data_page_offset"]
        vals.extend(read_column_chunk(
            data, start_offset=start, num_values=cc["num_values"],
            ptype=cc["type"], codec=cc["codec"]))
    return vals


@pytest.mark.parametrize("col", [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
])
def test_int_columns_match_duckdb(col):
    with open(PATH, "rb") as f:
        data = f.read()
    vals = _decode_column(data, parse_footer(data), col)
    con = duckdb.connect()
    ref = [r[0] for r in con.sql(
        f"SELECT {col} FROM read_parquet('{PATH}')"
    ).fetchall()]
    con.close()
    assert vals == ref  # full value-by-value, not just aggregates


def test_byte_array_column_values():
    with open(PATH, "rb") as f:
        data = f.read()
    vals = _decode_column(data, parse_footer(data), "l_returnflag")
    con = duckdb.connect()
    ref = [r[0].encode() for r in con.sql(
        f"SELECT l_returnflag FROM read_parquet('{PATH}')"
    ).fetchall()]
    con.close()
    assert vals == ref


def test_rle_hybrid_mixed_runs():
    # RLE run of 9 zeros (header 9<<1=18, 1 byte value) then one
    # bit-packed group of 8 values 0..7 at bit width 3
    packed = bytes([0x88, 0xC6, 0xFA])  # 0,1,2,3,4,5,6,7 LSB-first
    data = bytes([18, 0]) + bytes([0x03]) + packed
    vals, pos = read_rle_hybrid(data, 0, len(data), 3, 17)
    assert vals == [0] * 9 + list(range(8))
    assert pos == len(data)


def test_nulls_and_v2_pages(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "x": pa.array([1, None, 3, None, 5] * 100, type=pa.int64()),
        "s": pa.array((["a", None, "bb", "ccc", None] * 100)),
    })
    for version in ("1.0", "2.0"):
        path = tmp_path / f"v{version}.parquet"
        pq.write_table(table, path, compression="snappy",
                       data_page_version=version)
        with open(path, "rb") as f:
            data = f.read()
        m = parse_footer(data)
        xs = _decode_column(data, m, "x")
        assert xs == [1, None, 3, None, 5] * 100
        ss = _decode_column(data, m, "s")
        assert ss == [b"a", None, b"bb", b"ccc", None] * 100


def test_plain_fallback_large_dictionary(tmp_path):
    """Arrow falls back to PLAIN pages when the dictionary grows too
    big — the reader must handle mid-chunk encoding switches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({"x": pa.array(range(200_000), type=pa.int64())})
    path = tmp_path / "big.parquet"
    pq.write_table(table, path, compression="snappy",
                   dictionary_pagesize_limit=4096)
    with open(path, "rb") as f:
        data = f.read()
    xs = _decode_column(data, parse_footer(data), "x")
    assert xs == list(range(200_000))


def test_delta_encodings(tmp_path):
    """DELTA_BINARY_PACKED ints and DELTA_BYTE_ARRAY strings as
    written by Arrow's v2 pages."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "x": pa.array([i * i - 7 * i for i in range(10_000)],
                      type=pa.int64()),
        "s": pa.array([f"prefix_common_{i // 10}_{i}"
                       for i in range(10_000)]),
    })
    path = tmp_path / "delta.parquet"
    pq.write_table(
        table, path, compression="snappy", use_dictionary=False,
        column_encoding={"x": "DELTA_BINARY_PACKED",
                         "s": "DELTA_BYTE_ARRAY"},
        version="2.6", data_page_version="2.0")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    assert _decode_column(data, m, "x") == [
        i * i - 7 * i for i in range(10_000)]
    assert _decode_column(data, m, "s") == [
        f"prefix_common_{i // 10}_{i}".encode() for i in range(10_000)]
