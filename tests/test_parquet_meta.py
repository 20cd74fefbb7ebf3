"""From-scratch Parquet footer walk vs DuckDB's parquet_metadata()
and pyarrow-written edge-case files."""

import glob

import duckdb
import pytest

from health_monitor_cc_flink_spark.operators.parquet_meta import (
    parse_footer,
)

FILES = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))


def _duck_rows(path):
    con = duckdb.connect()
    rows = con.sql(
        "SELECT row_group_id, column_id, path_in_schema, type, "
        "compression, num_values, total_compressed_size, "
        "total_uncompressed_size, data_page_offset, "
        "dictionary_page_offset, row_group_num_rows "
        f"FROM parquet_metadata('{path}') "
        "ORDER BY row_group_id, column_id"
    ).fetchall()
    con.close()
    return [tuple(r) for r in rows]


@pytest.mark.parametrize("path", FILES, ids=lambda p: p.split("/")[-1])
def test_matches_duckdb_on_every_testdata_table(path):
    with open(path, "rb") as f:
        m = parse_footer(f.read())
    mine = []
    for gi, rg in enumerate(m["row_groups"]):
        for ci, c in enumerate(rg["columns"]):
            # nested path separator: spec-standard "." here vs
            # DuckDB's ", " rendering — normalize to compare
            mine.append((
                gi, ci, c["path"].replace(".", ", "), c["type"],
                c["codec"],
                c["num_values"], c["total_compressed_size"],
                c["total_uncompressed_size"], c["data_page_offset"],
                c["dictionary_page_offset"], rg["num_rows"],
            ))
    assert mine == _duck_rows(path)


def test_multi_row_group_and_codecs(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "i": pa.array(range(1000), type=pa.int32()),
        "s": pa.array([f"v{i % 7}" for i in range(1000)]),
        "f": pa.array([i / 3.0 for i in range(1000)],
                      type=pa.float64()),
    })
    path = tmp_path / "multi.parquet"
    pq.write_table(table, path, row_group_size=300,
                   compression="zstd")
    with open(path, "rb") as f:
        m = parse_footer(f.read())
    assert len(m["row_groups"]) == 4  # 300+300+300+100
    assert [rg["num_rows"] for rg in m["row_groups"]] == [300] * 3 + [100]
    c0 = m["row_groups"][0]["columns"]
    assert [c["path"] for c in c0] == ["i", "s", "f"]
    assert {c["codec"] for c in c0} == {"ZSTD"}
    assert [c["type"] for c in c0] == ["INT32", "BYTE_ARRAY", "DOUBLE"]
    assert sum(rg["num_rows"] for rg in m["row_groups"]) == m["num_rows"]


def test_uncompressed_and_nested_schema(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "outer": pa.array([{"a": 1, "b": "x"}] * 10,
                          type=pa.struct([("a", pa.int64()),
                                          ("b", pa.string())])),
    })
    path = tmp_path / "nested.parquet"
    pq.write_table(table, path, compression="none")
    with open(path, "rb") as f:
        m = parse_footer(f.read())
    cols = m["row_groups"][0]["columns"]
    assert [c["path"] for c in cols] == ["outer.a", "outer.b"]
    assert {c["codec"] for c in cols} == {"UNCOMPRESSED"}


def test_not_parquet_rejected():
    with pytest.raises(ValueError):
        parse_footer(b"Obj\x01" + b"\x00" * 64)


def test_truncated_footer_rejected():
    with open(FILES[0], "rb") as f:
        data = f.read()
    with pytest.raises(ValueError):
        parse_footer(data[:100] + data[-8:])


def test_page_index_and_statistics(tmp_path):
    """ColumnIndex/OffsetIndex decode (incl. container-bool bytes)
    and chunk Statistics vs pyarrow's writer."""
    import struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        read_page_index,
    )

    n = 50_000
    path = tmp_path / "pi.parquet"
    pq.write_table(
        pa.table({"x": pa.array(range(n), pa.int64())}), path,
        compression="snappy", write_page_index=True,
        data_page_size=8192)
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    cc = m["row_groups"][0]["columns"][0]
    st = cc["statistics"]
    assert struct.unpack("<q", st["min_value"])[0] == 0
    assert struct.unpack("<q", st["max_value"])[0] == n - 1
    assert st["null_count"] == 0
    pi = read_page_index(data, cc)
    locs = pi["page_locations"]
    assert len(locs) > 3
    assert locs[0][2] == 0
    assert pi["null_pages"] == [False] * len(locs)
    # per-page min/max tile the range in row order
    prev_max = -1
    for i in range(len(locs)):
        mn = struct.unpack("<q", pi["min_values"][i])[0]
        mx = struct.unpack("<q", pi["max_values"][i])[0]
        assert mn == prev_max + 1 and mx >= mn
        prev_max = mx
    assert prev_max == n - 1


def test_selective_page_decode(tmp_path):
    """Decoding a single page via the OffsetIndex + out-of-line
    dictionary page equals the corresponding full-chunk slice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        read_page_index,
    )

    n = 50_000
    vals = [f"k{i // 100:05d}" for i in range(n)]
    path = tmp_path / "sel.parquet"
    pq.write_table(pa.table({"s": pa.array(vals)}), path,
                   compression="snappy", write_page_index=True,
                   data_page_size=8192)
    with open(path, "rb") as f:
        data = f.read()
    m = parse_footer(data)
    rg = m["row_groups"][0]
    cc = rg["columns"][0]
    pi = read_page_index(data, cc)
    locs = pi["page_locations"]
    i = len(locs) // 2
    a = locs[i][2]
    b = locs[i + 1][2] if i + 1 < len(locs) else rg["num_rows"]
    got = read_column_chunk(
        data, start_offset=locs[i][0], num_values=b - a,
        ptype=cc["type"], codec=cc["codec"],
        dictionary_page_offset=cc["dictionary_page_offset"])
    assert [v.decode() for v in got] == vals[a:b]


def test_corrupted_footer_raises_valueerror_only():
    """24k-iteration bit-flip/truncation fuzz distilled: footer
    interpretation must type-check every thrift field it indexes —
    ints where lists/structs belong, bools where counts belong
    (bool IS an int subclass), floats where child counts belong —
    and raise ValueError, never TypeError/AttributeError/
    struct.error."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    import io

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )

    buf = io.BytesIO()
    ll = [[None, [1, 2]], [], None, [[3]]] * 20
    pq.write_table(
        pa.table({"x": pa.array(ll, pa.list_(pa.list_(pa.int64()))),
                  "s": pa.array([f"k{i}" for i in range(80)])}),
        buf, compression="snappy")
    base = buf.getvalue()
    random.seed(77)
    for _ in range(1500):
        b = bytearray(base)
        for _ in range(random.randrange(1, 4)):
            b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        data = bytes(b)
        try:
            m = parse_footer(data)
            for leaf in m["schema_leaves"]:
                for rg in m["row_groups"]:
                    cc = next((c for c in rg["columns"]
                               if c["path"] == leaf["path"]), None)
                    if cc is None:
                        continue
                    nv = cc["num_values"]
                    read_column_chunk(
                        data,
                        start_offset=(cc["dictionary_page_offset"]
                                      or cc["data_page_offset"] or 4),
                        num_values=nv if isinstance(nv, int)
                        and not isinstance(nv, bool) and nv >= 0
                        else 0,
                        ptype=cc["type"], codec=cc["codec"],
                        max_def_level=leaf["max_def_level"],
                        max_rep_level=leaf["max_rep_level"],
                        rep_def_levels=leaf["rep_def_levels"],
                        type_length=leaf["type_length"])
        except ValueError:
            pass  # the only permitted failure mode


def test_page_index_offset_without_length_rejected():
    """Hostile footer: column_index_offset set but length absent must
    raise the module's ValueError contract, not TypeError from a
    None slice bound."""
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        read_page_index,
    )

    base = {"column_index_offset": 4, "column_index_length": 10,
            "offset_index_offset": 14, "offset_index_length": 10}
    for missing in ("column_index_length", "offset_index_length"):
        cc = dict(base, **{missing: None})
        with pytest.raises(ValueError, match="page index"):
            read_page_index(b"\x00" * 64, cc)
    # offsets absent is the legitimate "no index" signal
    assert read_page_index(b"", {"column_index_offset": None,
                                 "column_index_length": None,
                                 "offset_index_offset": None,
                                 "offset_index_length": None}) is None
