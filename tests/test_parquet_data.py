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


def _decode_leaf(data, m, path):
    leaf = next(l for l in m["schema_leaves"] if l["path"] == path)
    vals = []
    for rg in m["row_groups"]:
        cc = next(c for c in rg["columns"] if c["path"] == path)
        start = cc["dictionary_page_offset"] or cc["data_page_offset"]
        vals.extend(read_column_chunk(
            data, start_offset=start, num_values=cc["num_values"],
            ptype=cc["type"], codec=cc["codec"],
            max_def_level=leaf["max_def_level"],
            max_rep_level=leaf["max_rep_level"],
            rep_def_level=leaf["rep_def_level"],
            type_length=leaf["type_length"]))
    return vals, leaf


def test_schema_leaves_level_ladder():
    with open("/root/testdata/sf0.001/embeddings.parquet", "rb") as f:
        data = f.read()
    leaves = {l["path"]: l for l in parse_footer(data)["schema_leaves"]}
    assert leaves["vec_id"]["max_def_level"] == 1
    assert leaves["vec_id"]["max_rep_level"] == 0
    el = leaves["embedding.list.element"]
    assert (el["max_def_level"], el["max_rep_level"],
            el["rep_def_level"]) == (3, 1, 2)


def test_list_column_real_embeddings_vs_pyarrow():
    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.001/embeddings.parquet"
    with open(path, "rb") as f:
        data = f.read()
    rows, _ = _decode_leaf(data, parse_footer(data),
                           "embedding.list.element")
    ref = pq.read_table(path)["embedding"].to_pylist()
    assert len(rows) == len(ref)
    for a, b in zip(rows, ref):
        assert len(a) == len(b)
        assert all(abs(x - y) < 1e-7 for x, y in zip(a, b))


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_list_null_empty_shapes(tmp_path, page_version):
    import pyarrow as pa
    import pyarrow.parquet as pq

    lv = [[1.0, 2.0], [], None, [3.0], [None, 4.0],
          [5.0] * 300, [], None, [6.0]]
    t = pa.table({"e": pa.array(lv, pa.list_(pa.float32()))})
    path = tmp_path / "lists.parquet"
    pq.write_table(t, path, compression="snappy",
                   data_page_version=page_version)
    with open(path, "rb") as f:
        data = f.read()
    rows, _ = _decode_leaf(data, parse_footer(data), "e.list.element")
    assert rows == t["e"].to_pylist()


def test_byte_stream_split(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "f": pa.array([i / 8 for i in range(5000)], pa.float32()),
        "g": pa.array([i / 3 for i in range(5000)], pa.float64()),
    })
    path = tmp_path / "bss.parquet"
    pq.write_table(t, path, use_byte_stream_split=["f", "g"],
                   use_dictionary=False, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    fvals, _ = _decode_leaf(data, m, "f")
    gvals, _ = _decode_leaf(data, m, "g")
    assert fvals == t["f"].to_pylist()
    assert gvals == t["g"].to_pylist()


def test_flba_decimal(tmp_path):
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        flba_decimal_unscaled,
    )

    vals = [decimal.Decimal(i * 7 - 5000) / 100 for i in range(3000)]
    t = pa.table({"d": pa.array(vals, pa.decimal128(12, 2))})
    path = tmp_path / "dec.parquet"
    pq.write_table(t, path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    raw, leaf = _decode_leaf(data, parse_footer(data), "d")
    assert (leaf["scale"], leaf["precision"]) == (2, 12)
    got = [decimal.Decimal(flba_decimal_unscaled(b)).scaleb(-2)
           for b in raw]
    assert got == vals


def test_deep_nesting_rejected():
    with pytest.raises(ValueError):
        read_column_chunk(b"", start_offset=0, num_values=1,
                          ptype="INT64", codec="UNCOMPRESSED",
                          max_rep_level=2)


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_boolean_column(tmp_path, page_version):
    import pyarrow as pa
    import pyarrow.parquet as pq

    bools = [None if i % 11 == 5 else (i % 3 == 0)
             for i in range(3000)]
    path = tmp_path / "b.parquet"
    pq.write_table(pa.table({"b": pa.array(bools)}), path,
                   compression="snappy",
                   data_page_version=page_version)
    with open(path, "rb") as f:
        data = f.read()
    got, _ = _decode_leaf(data, parse_footer(data), "b")
    assert got == bools


def test_int96_legacy_timestamps(tmp_path):
    import calendar
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [datetime.datetime(1992, 3, 4, 5, 6, 7, 123456),
          datetime.datetime(2020, 1, 1),
          datetime.datetime(1970, 1, 1),
          datetime.datetime(1960, 6, 15, 12, 0, 0, 250000)] * 50
    path = tmp_path / "i96.parquet"
    pq.write_table(pa.table({"t": pa.array(ts, pa.timestamp("ns"))}),
                   path, use_deprecated_int96_timestamps=True,
                   compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    assert m["row_groups"][0]["columns"][0]["type"] == "INT96"
    got, _ = _decode_leaf(data, m, "t")
    want = [calendar.timegm(x.timetuple()) * 10**9
            + x.microsecond * 1000 for x in ts]
    assert got == want


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_list_of_list_assembly(tmp_path, page_version):
    """Dremel assembly at repetition depth 2: every null/empty shape
    (None, [], [None], [[]], [[None]]) plus fuzzed rows."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    random.seed(5)
    ll = [None, [], [None], [[]], [[None]], [[1, 2], [3]],
          [[], [4, None, 5], None], [[6]] * 3]
    for _ in range(300):
        ll.append([
            None if random.random() < .1 else
            [None if random.random() < .1 else random.randrange(100)
             for _ in range(random.randrange(4))]
            for _ in range(random.randrange(4))])
    t = pa.table({"x": pa.array(ll, pa.list_(pa.list_(pa.int64())))})
    path = tmp_path / "ll.parquet"
    pq.write_table(t, path, compression="snappy",
                   data_page_version=page_version)
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    leaf = m["schema_leaves"][0]
    assert leaf["rep_def_levels"] == [2, 4]
    cc = m["row_groups"][0]["columns"][0]
    got = read_column_chunk(
        data,
        start_offset=(cc["dictionary_page_offset"]
                      or cc["data_page_offset"]),
        num_values=cc["num_values"], ptype=cc["type"],
        codec=cc["codec"], max_def_level=leaf["max_def_level"],
        max_rep_level=leaf["max_rep_level"],
        rep_def_levels=leaf["rep_def_levels"])
    assert got == t["x"].to_pylist()


def test_triple_nested_lists(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    l3 = ([[[[float(i)]]] for i in range(50)]
          + [None, [], [[]], [[[]]], [[None], [[1.5, None]]]])
    t = pa.table({"y": pa.array(
        l3, pa.list_(pa.list_(pa.list_(pa.float64()))))})
    path = tmp_path / "l3.parquet"
    pq.write_table(t, path, compression="snappy")
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    leaf = m["schema_leaves"][0]
    assert leaf["rep_def_levels"] == [2, 4, 6]
    cc = m["row_groups"][0]["columns"][0]
    got = read_column_chunk(
        data,
        start_offset=(cc["dictionary_page_offset"]
                      or cc["data_page_offset"]),
        num_values=cc["num_values"], ptype=cc["type"],
        codec=cc["codec"], max_def_level=leaf["max_def_level"],
        max_rep_level=leaf["max_rep_level"],
        rep_def_levels=leaf["rep_def_levels"])
    assert got == t["y"].to_pylist()


def test_selective_read_shared_dictionary(tmp_path):
    """r17: read_dictionary_page decodes a chunk's dictionary once and
    read_column_chunk(dictionary=...) must produce exactly what the
    per-page out-of-line decode produced — the page-prune scan's
    heavyweight-init-once contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_dictionary_page,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        read_page_index,
    )

    vals = [i // 3 for i in range(4000)]  # dict-friendly, sorted
    t = pa.table({"k": pa.array(vals, pa.int64())})
    path = tmp_path / "dict.parquet"
    pq.write_table(t, path, compression="snappy",
                   write_page_index=True, data_page_size=1024)
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    cc = m["row_groups"][0]["columns"][0]
    assert cc["dictionary_page_offset"] is not None
    shared = read_dictionary_page(
        data, cc["dictionary_page_offset"], cc["type"], cc["codec"])
    pi = read_page_index(data, cc)
    locs = pi["page_locations"]
    assert len(locs) > 2
    n = m["row_groups"][0]["num_rows"]
    out_shared, out_perpage = [], []
    for i in range(len(locs)):
        a = locs[i][2]
        b = locs[i + 1][2] if i + 1 < len(locs) else n
        out_perpage.extend(read_column_chunk(
            data, start_offset=locs[i][0], num_values=b - a,
            ptype=cc["type"], codec=cc["codec"],
            dictionary_page_offset=cc["dictionary_page_offset"]))
        out_shared.extend(read_column_chunk(
            data, start_offset=locs[i][0], num_values=b - a,
            ptype=cc["type"], codec=cc["codec"],
            dictionary_page_offset=cc["dictionary_page_offset"],
            dictionary=shared))
    assert out_shared == out_perpage == vals
    # hostile offsets still fail fast
    import pytest
    with pytest.raises(ValueError):
        read_dictionary_page(data, cc["data_page_offset"],
                             cc["type"], cc["codec"])
