"""From-scratch parquet writer vs the reference readers."""

import io

import duckdb
import pytest

from health_monitor_cc_flink_spark.operators.parquet_write import (
    write_parquet,
)

COLS = [
    ("x", "INT64", [i * 7 - 500 for i in range(5000)]),
    ("d", "DOUBLE",
     [None if i % 11 == 3 else i / 8 for i in range(5000)]),
    ("s", "STRING",
     [None if i % 7 == 2 else f"v{i % 50}" for i in range(5000)]),
    ("b", "BOOLEAN",
     [None if i % 13 == 5 else (i % 3 == 0) for i in range(5000)]),
]


@pytest.mark.parametrize("codec", ["SNAPPY", "UNCOMPRESSED"])
def test_reference_readers_read_back_exact(codec, tmp_path):
    import pyarrow.parquet as pq

    blob = write_parquet(COLS, codec=codec)
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in COLS:
        assert t[name].to_pylist() == vals, name
    path = tmp_path / "w.parquet"
    path.write_bytes(blob)
    rows = duckdb.sql(
        f"SELECT * FROM read_parquet('{path}')").fetchall()
    assert [tuple(r) for r in rows] == list(
        zip(*(v for _, _, v in COLS)))


def test_own_reader_closes_the_triangle():
    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    blob = write_parquet(COLS)
    m = parse_footer(blob)
    assert m["num_rows"] == 5000
    for name, _, vals in COLS:
        cc = next(c for c in m["row_groups"][0]["columns"]
                  if c["path"] == name)
        got = read_column_chunk(
            blob, start_offset=cc["data_page_offset"],
            num_values=cc["num_values"], ptype=cc["type"],
            codec=cc["codec"])
        if name == "s":
            got = [v.decode() if v is not None else None
                   for v in got]
        assert got == vals, name


def test_empty_and_all_null_columns(tmp_path):
    import pyarrow.parquet as pq

    blob = write_parquet([("x", "INT64", [None, None, None]),
                          ("s", "STRING", ["a", None, "b"])])
    t = pq.read_table(io.BytesIO(blob))
    assert t["x"].to_pylist() == [None, None, None]
    assert t["s"].to_pylist() == ["a", None, "b"]


def test_hostile_inputs():
    with pytest.raises(ValueError):
        write_parquet([])
    with pytest.raises(ValueError):
        write_parquet([("x", "INT64", [1]), ("y", "INT64", [1, 2])])
    with pytest.raises(ValueError):
        write_parquet([("x", "INT96", [1])])
    with pytest.raises(ValueError):
        write_parquet([("x", "INT64", [1])], codec="ZSTD")


def test_multi_page_chunks():
    import pyarrow.parquet as pq

    cols = [("x", "INT64", list(range(50_000))),
            ("s", "STRING",
             [None if i % 7 == 2 else f"v{i % 50}"
              for i in range(50_000)])]
    blob = write_parquet(cols)
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in cols:
        assert t[name].to_pylist() == vals


def test_zero_rows():
    import pyarrow.parquet as pq

    blob = write_parquet([("x", "INT64", [])])
    assert pq.read_table(io.BytesIO(blob)).num_rows == 0


def test_list_float_column_roundtrip(tmp_path):
    """Writing list<float> via the standard 3-level shape: pyarrow,
    DuckDB, Spark, and the own reader all read the lists back."""
    import random

    import duckdb as _ddb
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    random.seed(2)
    lists = [None, [], [None], [1.5, 2.5], [3.0]]
    for _ in range(300):
        lists.append(
            None if random.random() < .05 else
            [None if random.random() < .1
             else random.randrange(1000) / 4
             for _ in range(random.randrange(5))])
    blob = write_parquet([("vid", "INT64", list(range(len(lists)))),
                          ("emb", "LIST_FLOAT", lists)])
    t = pq.read_table(io.BytesIO(blob))
    assert t["emb"].to_pylist() == lists  # /4 grid is float32-exact
    path = tmp_path / "lw.parquet"
    path.write_bytes(blob)
    (n, total) = _ddb.sql(
        f"SELECT count(*), sum(len(emb)) "
        f"FROM read_parquet('{path}')").fetchall()[0]
    assert n == len(lists)
    assert total == sum(len(x) for x in lists if x is not None)
    m = parse_footer(blob)
    leaf = next(l for l in m["schema_leaves"]
                if l["path"] == "emb.list.element")
    cc = next(c for c in m["row_groups"][0]["columns"]
              if c["path"] == "emb.list.element")
    rows = read_column_chunk(
        blob, start_offset=cc["data_page_offset"],
        num_values=cc["num_values"], ptype=cc["type"],
        codec=cc["codec"], max_def_level=leaf["max_def_level"],
        max_rep_level=1, rep_def_levels=leaf["rep_def_levels"])
    assert rows == lists


def test_list_column_spark_reader(spark, tmp_path):
    blob = write_parquet([
        ("vid", "INT64", [0, 1, 2]),
        ("emb", "LIST_FLOAT", [[1.5, 2.5], None, []]),
    ])
    d = tmp_path / "pqdir"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(blob)
    rows = spark.read.parquet(str(d)).orderBy("vid").collect()
    assert [r["emb"] for r in rows] == [[1.5, 2.5], None, []]
