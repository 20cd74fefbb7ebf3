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


@pytest.mark.parametrize("codec", ["SNAPPY", "ZSTD", "UNCOMPRESSED"])
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
        write_parquet([("x", "INT64", [1])], codec="BROTLI")
    with pytest.raises(ValueError):
        write_parquet([("x", "INT64", [1])], page_rows=0)


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


@pytest.mark.parametrize("codec", ["SNAPPY", "ZSTD", "UNCOMPRESSED"])
def test_dictionary_and_page_index_reference_readers(codec, tmp_path):
    """Dictionary-encoded pages + ColumnIndex/OffsetIndex + chunk
    Statistics read back value-exact by BOTH reference readers."""
    import pyarrow.parquet as pq

    blob = write_parquet(COLS, codec=codec, dictionary=True,
                         page_index=True, page_rows=512)
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in COLS:
        assert t[name].to_pylist() == vals, name
    p = tmp_path / "dp.parquet"
    p.write_bytes(blob)
    (n, sx, ds) = duckdb.sql(
        f"SELECT count(*), sum(x), count(DISTINCT s) "
        f"FROM read_parquet('{p}')").fetchall()[0]
    assert (n, sx, ds) == (5000, sum(v for _, _, vals in COLS[:1]
                                     for v in vals), 50)


def test_own_reader_page_prunes_own_file():
    """The own page-index reader + selective chunk decode work on
    the own writer's output: ascending boundary order, correct page
    stats, exact values from a single pruned page resolved against
    the out-of-line dictionary."""
    import struct as _s

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
        read_page_index,
    )

    n = 4000
    xs = list(range(n))
    blob = write_parquet([("x", "INT64", xs)], dictionary=True,
                         page_index=True, page_rows=256)
    m = parse_footer(blob)
    cc = m["row_groups"][0]["columns"][0]
    assert cc["dictionary_page_offset"] is not None
    st = cc["statistics"]
    assert _s.unpack("<q", st["min_value"])[0] == 0
    assert _s.unpack("<q", st["max_value"])[0] == n - 1
    assert st["null_count"] == 0
    pi = read_page_index(blob, cc)
    assert pi["boundary_order"] == 1  # ASCENDING
    locs = pi["page_locations"]
    assert len(locs) == (n + 255) // 256
    assert [l[2] for l in locs] == list(range(0, n, 256))
    for i in range(len(locs)):
        assert _s.unpack("<q", pi["min_values"][i])[0] == 256 * i
    i = 7
    vals = read_column_chunk(
        blob, start_offset=locs[i][0], num_values=256,
        ptype=cc["type"], codec=cc["codec"],
        dictionary_page_offset=cc["dictionary_page_offset"])
    assert vals == xs[256 * i:256 * (i + 1)]


def test_page_index_null_page_and_orders():
    """A page of pure nulls marks null_pages with empty min/max;
    descending and unordered data get the right boundary_order."""
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
        read_page_index,
    )

    def index_of(vals, ptype="INT64"):
        blob = write_parquet([("c", ptype, vals)],
                             page_index=True, page_rows=4)
        m = parse_footer(blob)
        return read_page_index(blob, m["row_groups"][0]["columns"][0])

    pi = index_of([1, 2, 3, 4, None, None, None, None, 5, 6, 7, 8])
    assert pi["null_pages"] == [False, True, False]
    assert pi["min_values"][1] == b"" and pi["max_values"][1] == b""
    assert pi["null_counts"] == [0, 4, 0]
    assert pi["boundary_order"] == 1
    assert index_of(list(range(12, 0, -1)))["boundary_order"] == 2
    assert index_of([1, 9, 2, 8, 3, 7, 4, 6, 5, 5, 5, 5]
                    )["boundary_order"] == 0


def test_rle_hybrid_roundtrip_against_reader():
    import random

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_rle_hybrid,
    )
    from health_monitor_cc_flink_spark.operators.parquet_write import (
        _rle_hybrid,
    )

    rng = random.Random(7)
    for bw in (1, 2, 3, 5, 8, 11, 16):
        vals = []
        while len(vals) < 997:
            if rng.random() < 0.4:  # run
                vals += [rng.randrange(1 << bw)] * rng.randrange(1, 40)
            else:
                vals.append(rng.randrange(1 << bw))
        vals = vals[:997]
        blob = _rle_hybrid(vals, bw)
        got, _ = read_rle_hybrid(blob, 0, len(blob), bw, len(vals))
        assert got == vals, bw


def test_dictionary_falls_back_to_plain_when_wide():
    """> 2^16 distinct values keeps PLAIN (no dictionary page)."""
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    vals = list(range(70_000))
    blob = write_parquet([("x", "INT64", vals)], dictionary=True)
    m = parse_footer(blob)
    assert m["row_groups"][0]["columns"][0][
        "dictionary_page_offset"] is None
    assert pq.read_table(io.BytesIO(blob))["x"].to_pylist() == vals


@pytest.mark.parametrize("codec", ["SNAPPY", "ZSTD", "UNCOMPRESSED"])
@pytest.mark.parametrize("dic", [False, True])
def test_data_page_v2(codec, dic, tmp_path):
    """DATA_PAGE_V2 emission (levels outside the compressed region,
    explicit byte lengths, is_compressed flag) read back exactly by
    pyarrow, DuckDB, and the own reader — incl. nulls, lists, and
    dictionary pages."""
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.iceberg import (
        read_flat_parquet,
    )

    n = 3000
    cols = [
        ("x", "INT64",
         [None if i % 11 == 3 else i * 7 - 500 for i in range(n)]),
        ("s", "STRING",
         [None if i % 7 == 2 else f"v{i % 50}" for i in range(n)]),
        ("lst", "LIST_INT64",
         [None if i % 13 == 5 else
          ([] if i % 9 == 1 else [i, None, i + 1])
          for i in range(n)]),
    ]
    blob = write_parquet(cols, codec=codec, dictionary=dic,
                         data_page_version=2, page_rows=512,
                         page_index=True)
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in cols:
        assert t[name].to_pylist() == vals, name
    p = tmp_path / "v2.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{p}')"
    ).fetchall() == [(n,)]
    got = read_flat_parquet(blob)
    assert got["x"] == cols[0][2]
    with pytest.raises(ValueError):
        write_parquet(cols, data_page_version=3)


def test_nested_struct_arbitrary_depth(tmp_path):
    """2-deep struct paths (the reference's own
    vitals.blood_pressure.systolic event shape, schema.tf:67-129):
    pyarrow, DuckDB, and the own reader all agree, including nulls
    at every definition level (leaf null, intermediate-group null
    via GroupNull(1), outer-group null via GROUP_NULL)."""
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )
    from health_monitor_cc_flink_spark.operators.parquet_write import (
        GROUP_NULL,
        GroupNull,
    )

    sys_v = [120, None, GroupNull(1), GROUP_NULL, 140]
    dia_v = [80, 75, GroupNull(1), GROUP_NULL, None]
    pulse = [70.0, 71.5, 72.0, GROUP_NULL, 74.0]
    blob = write_parquet([
        ("vitals.blood_pressure.systolic", "INT64", sys_v),
        ("vitals.blood_pressure.diastolic", "INT64", dia_v),
        ("vitals.pulse", "DOUBLE", pulse),
        ("patient_id", "INT64", [1, 2, 3, 4, 5]),
    ], dictionary=True, page_index=True, bloom_filter=True)
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("vitals").to_pylist() == [
        {"blood_pressure": {"systolic": 120, "diastolic": 80},
         "pulse": 70.0},
        {"blood_pressure": {"systolic": None, "diastolic": 75},
         "pulse": 71.5},
        {"blood_pressure": None, "pulse": 72.0},
        None,
        {"blood_pressure": {"systolic": 140, "diastolic": None},
         "pulse": 74.0},
    ]
    p = tmp_path / "nested.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        "SELECT vitals.blood_pressure.systolic, vitals.pulse, "
        f"patient_id FROM read_parquet('{p}')").fetchall() == [
        (120, 70.0, 1), (None, 71.5, 2), (None, 72.0, 3),
        (None, None, 4), (140, 74.0, 5)]
    m = parse_footer(blob)
    expected = {
        "vitals.blood_pressure.systolic":
            (3, [120, None, None, None, 140]),
        "vitals.blood_pressure.diastolic":
            (3, [80, 75, None, None, None]),
        "vitals.pulse": (2, [70.0, 71.5, 72.0, None, 74.0]),
        "patient_id": (1, [1, 2, 3, 4, 5]),
    }
    for lf, cc in zip(m["schema_leaves"],
                      m["row_groups"][0]["columns"]):
        want_def, want = expected[lf["path"]]
        assert lf["max_def_level"] == want_def
        got = read_column_chunk(
            blob, start_offset=cc["data_page_offset"],
            num_values=cc["num_values"], ptype=lf["type"],
            codec="SNAPPY", max_def_level=lf["max_def_level"],
            dictionary_page_offset=cc.get("dictionary_page_offset"))
        assert got == want, lf["path"]


def test_liststruct_roundtrip(tmp_path):
    """List-of-struct: sibling fields share one repetition
    structure (required element group, optional fields)."""
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    ks = [["a", "b"], None, [], ["c", None]]
    vs = [[1, 2], None, [], [3, 4]]
    blob = write_parquet([
        ("tags.k", "LISTSTRUCT_STRING", ks),
        ("tags.v", "LISTSTRUCT_INT64", vs),
        ("rid", "INT64", [10, 11, 12, 13]),
    ])
    t = pq.read_table(io.BytesIO(blob))
    assert t.column("tags").to_pylist() == [
        [{"k": "a", "v": 1}, {"k": "b", "v": 2}],
        None, [],
        [{"k": "c", "v": 3}, {"k": None, "v": 4}]]
    p = tmp_path / "ls.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT tags, rid FROM read_parquet('{p}')"
    ).fetchall()[3] == ([{"k": "c", "v": 3}, {"k": None, "v": 4}],
                        13)
    m = parse_footer(blob)
    lf, cc = m["schema_leaves"][1], m["row_groups"][0]["columns"][1]
    assert lf["path"] == "tags.list.element.v"
    got = read_column_chunk(
        blob, start_offset=cc["data_page_offset"],
        num_values=cc["num_values"], ptype=lf["type"],
        codec="SNAPPY", max_def_level=lf["max_def_level"],
        max_rep_level=lf["max_rep_level"],
        rep_def_levels=[lf["rep_def_level"]])
    assert got == vs
    # misaligned sibling shapes are rejected
    with pytest.raises(ValueError, match="misaligned"):
        write_parquet([
            ("tags.k", "LISTSTRUCT_STRING", [["a"], ["b"]]),
            ("tags.v", "LISTSTRUCT_INT64", [[1, 2], [3]]),
        ])
    # non-contiguous group columns are rejected
    with pytest.raises(ValueError, match="contiguous"):
        write_parquet([
            ("g.a", "INT64", [1]),
            ("flat", "INT64", [2]),
            ("g.b", "INT64", [3]),
        ])


def test_multiple_row_groups_roundtrip(tmp_path):
    """row_group_rows splits the file into real row groups, each
    with its own chunk Statistics, dictionary, bloom and page
    index — pyarrow, DuckDB and the own reader agree; stats are
    per-group tight and blooms hit only the owning group."""
    import struct

    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_bloom import (
        read_bloom_blob,
    )
    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    n = 1000
    ks = [i * 7 for i in range(n)]
    ss = [None if i % 5 == 3 else f"v{i % 40}" for i in range(n)]
    blob = write_parquet(
        [("k", "INT64", ks), ("s", "STRING", ss)],
        dictionary=True, page_index=True, bloom_filter=True,
        row_group_rows=128, page_rows=32)
    pf = pq.ParquetFile(io.BytesIO(blob))
    assert pf.num_row_groups == 8
    t = pf.read()
    assert t["k"].to_pylist() == ks and t["s"].to_pylist() == ss
    p = tmp_path / "rg.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT count(*), sum(k) FROM read_parquet('{p}')"
    ).fetchall() == [(n, sum(ks))]
    m = parse_footer(blob)
    assert len(m["row_groups"]) == 8
    needle = 7 * 500  # lives only in row group 3
    hits = []
    for i, rgm in enumerate(m["row_groups"]):
        cc = next(c for c in rgm["columns"] if c["path"] == "k")
        st = cc["statistics"]
        mn = struct.unpack("<q", st["min_value"])[0]
        mx = struct.unpack("<q", st["max_value"])[0]
        assert mn == ks[i * 128] and mx == ks[min(n, (i + 1) * 128)
                                              - 1]
        bf = read_bloom_blob(blob, cc["bloom_filter_offset"])
        if bf.check(needle, "INT64"):
            hits.append(i)
        assert all(bf.check(v, "INT64")
                   for v in ks[i * 128:(i + 1) * 128])
    assert hits == [3]
    # selective decode of ONE row group through the own reader
    rgm = m["row_groups"][3]
    cc = next(c for c in rgm["columns"] if c["path"] == "k")
    got = read_column_chunk(
        blob,
        start_offset=cc["dictionary_page_offset"]
        or cc["data_page_offset"],
        num_values=cc["num_values"], ptype="INT64", codec="SNAPPY",
        dictionary_page_offset=cc["dictionary_page_offset"])
    assert got == ks[384:512]
    assert needle in got


def test_alternative_encodings_roundtrip(tmp_path):
    """BYTE_STREAM_SPLIT / DELTA_BINARY_PACKED /
    DELTA_LENGTH_BYTE_ARRAY write paths — the inverses of the own
    readers; pyarrow, DuckDB and the own reader verify, and the
    delta encoding actually wins on sorted ints."""
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    n = 2000
    ks = [i * 13 + (i % 7) for i in range(n)]
    ds = [None if i % 11 == 4 else (i - 900) / 8 for i in range(n)]
    ss = [None if i % 9 == 2 else f"str-{i % 61}-{i}"
          for i in range(n)]
    enc = {"k": "DELTA_BINARY_PACKED", "d": "BYTE_STREAM_SPLIT",
           "s": "DELTA_LENGTH_BYTE_ARRAY"}
    blob = write_parquet(
        [("k", "INT64", ks), ("d", "DOUBLE", ds),
         ("s", "STRING", ss)],
        column_encodings=enc, page_rows=300)
    t = pq.read_table(io.BytesIO(blob))
    assert t["k"].to_pylist() == ks
    assert t["d"].to_pylist() == ds
    assert t["s"].to_pylist() == ss
    p = tmp_path / "enc.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT count(*), sum(k) FROM read_parquet('{p}')"
    ).fetchall() == [(n, sum(ks))]
    m = parse_footer(blob)
    for lf, cc in zip(m["schema_leaves"],
                      m["row_groups"][0]["columns"]):
        got = read_column_chunk(
            blob, start_offset=cc["data_page_offset"],
            num_values=cc["num_values"], ptype=lf["type"],
            codec="SNAPPY", max_def_level=lf["max_def_level"])
        want = {"k": ks, "d": ds, "s": ss}[lf["path"]]
        if lf["path"] == "s":
            got = [None if v is None else v.decode() for v in got]
        assert got == want, lf["path"]
    # the size claim: delta beats plain on sorted ints
    plain = write_parquet([("k", "INT64", ks)],
                          codec="UNCOMPRESSED")
    delta = write_parquet([("k", "INT64", ks)],
                          codec="UNCOMPRESSED",
                          column_encodings={
                              "k": "DELTA_BINARY_PACKED"})
    assert len(delta) < len(plain) / 3
    # edge cases: single value, empty, negative deltas
    for vals in ([5], [], [10, 3, -4, -4, 100, 7],
                 list(range(0, -500, -1))):
        b = write_parquet([("k", "INT64", vals)],
                          column_encodings={
                              "k": "DELTA_BINARY_PACKED"})
        assert pq.read_table(
            io.BytesIO(b))["k"].to_pylist() == vals
    # misuse rejected
    with pytest.raises(ValueError, match="does not apply"):
        write_parquet([("k", "INT64", [1])],
                      column_encodings={"k": "BYTE_STREAM_SPLIT"})
    with pytest.raises(ValueError, match="unknown encoded"):
        write_parquet([("k", "INT64", [1])],
                      column_encodings={"z": "BYTE_STREAM_SPLIT"})


def test_logical_types_timestamp_decimal(spark, tmp_path):
    """INT64-backed logical types: TIMESTAMP(MICROS, UTC) and
    DECIMAL(18,s) — pyarrow, DuckDB and Spark's vectorized reader
    all type the columns, values exact; composes with
    DELTA_BINARY_PACKED (the classic timestamp encoding)."""
    import datetime

    import pyarrow.parquet as pq

    n = 400
    ts = [1_700_000_000_000000 + i * 60_000_000 for i in range(n)]
    dec = [i * 125 - 3000 for i in range(n)]  # unscaled, scale 2
    blob = write_parquet(
        [("ts", "TIMESTAMP_MICROS", ts),
         ("amt", "DECIMAL(18,2)", dec)],
        column_encodings={"ts": "DELTA_BINARY_PACKED"})
    t = pq.read_table(io.BytesIO(blob))
    assert str(t.schema.field("ts").type) == "timestamp[us, tz=UTC]"
    assert str(t.schema.field("amt").type) == "decimal128(18, 2)"
    assert t["ts"][0].as_py() == datetime.datetime(
        2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc)
    assert [int(v.scaleb(2)) for v in t["amt"].to_pylist()] == dec
    p = tmp_path / "lt.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT sum(amt) FROM read_parquet('{p}')"
    ).fetchall()[0][0] * 100 == sum(dec)
    rows = (spark.read.parquet(str(p))
            .selectExpr("count(*) AS n",
                        "sum(cast(amt AS DOUBLE)) AS s",
                        "min(ts) AS mn").collect())
    assert rows[0].n == n
    assert rows[0].s == sum(dec) / 100
    assert rows[0].mn == datetime.datetime(2023, 11, 14, 22, 13, 20)
    with pytest.raises(ValueError, match="unsupported decimal"):
        write_parquet([("a", "DECIMAL(22,2)", [1])])


def test_int32_and_date_columns(spark, tmp_path):
    """INT32 physical + DATE logical (INT32 days since epoch):
    pyarrow types date32, DuckDB reads dates, Spark's vectorized
    reader agrees; dictionary/page-index/bloom all compose."""
    import datetime

    import pyarrow.parquet as pq

    n = 600
    days = [19000 + i for i in range(n)]
    i32 = [None if i % 7 == 3 else i * 3 - 900 for i in range(n)]
    blob = write_parquet(
        [("d", "DATE", days), ("x", "INT32", i32)],
        dictionary=True, page_index=True, bloom_filter=True)
    t = pq.read_table(io.BytesIO(blob))
    assert str(t.schema.field("d").type) == "date32[day]"
    assert str(t.schema.field("x").type) == "int32"
    assert t["d"][0].as_py() == datetime.date(2022, 1, 8)
    assert t["x"].to_pylist() == i32
    p = tmp_path / "d32.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT min(d), sum(x) FROM read_parquet('{p}')"
    ).fetchall() == [(datetime.date(2022, 1, 8),
                      sum(v for v in i32 if v is not None))]
    rows = spark.read.parquet(str(p)).selectExpr(
        "min(d) AS mn", "count(x) AS c").collect()
    assert rows[0].mn == datetime.date(2022, 1, 8)
    assert rows[0].c == sum(v is not None for v in i32)


def test_delta_binary_packed_wraps_int64_extremes(tmp_path):
    """ADVICE r14: deltas computed with unbounded Python ints made
    miniblock widths exceed 64 bits for values spanning more than
    2^63 — pyarrow ('delta bit width larger than integer bit width')
    and DuckDB ('width (65) exceeds the supported max') both
    rejected the file.  The spec requires two's-complement WRAPPING
    64-bit delta arithmetic; verify the full triangle."""
    import duckdb
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    vals = [-(2 ** 63), 2 ** 63 - 1, 0, -(2 ** 63) + 5,
            2 ** 63 - 3, -7, 2 ** 62, -(2 ** 62) - 1]
    blob = write_parquet(
        [("k", "INT64", vals)],
        codec="UNCOMPRESSED",
        column_encodings={"k": "DELTA_BINARY_PACKED"})
    p = tmp_path / "wrap.parquet"
    p.write_bytes(blob)
    assert pq.read_table(p)["k"].to_pylist() == vals
    got = duckdb.sql(
        f"SELECT k FROM read_parquet('{p}')").fetchall()
    assert [r[0] for r in got] == vals
    ft = parse_footer(blob)
    cc = ft["row_groups"][0]["columns"][0]
    own = read_column_chunk(
        blob, start_offset=cc["data_page_offset"],
        num_values=cc["num_values"], ptype="INT64",
        codec="UNCOMPRESSED")
    assert own == vals


@pytest.mark.parametrize("codec", ["SNAPPY", "ZSTD", "UNCOMPRESSED"])
def test_map_logical_type_roundtrip(codec, tmp_path):
    """VERDICT r14 #5: MAP logical type — optional group (MAP) {
    repeated key_value { required key; optional value } } — the one
    remaining logical shape the own Dremel assembler could take but
    the writer could not emit.  pyarrow + DuckDB + own reader
    triangle, null maps / empty maps / null values, both key kinds."""
    import duckdb
    import pyarrow.parquet as pq

    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    n = 300
    maps = [None if i % 8 == 6 else
            {f"k{j}": (None if j == 1 and i % 5 == 0 else i * 10 + j)
             for j in range(i % 4)} for i in range(n)]
    imaps = [None if i % 7 == 3 else
             [(i + j, f"s{j}") for j in range(i % 3)]
             for i in range(n)]
    blob = write_parquet([
        ("id", "INT64", list(range(n))),
        ("attrs", "MAP_STRING_INT64", maps),
        ("names", "MAP_INT64_STRING", imaps),
    ], page_rows=77, codec=codec)
    p = tmp_path / "m.parquet"
    p.write_bytes(blob)
    t = pq.read_table(p)
    assert [None if m is None else dict(m)
            for m in t["attrs"].to_pylist()] == maps
    assert [None if m is None else list(m)
            for m in t["names"].to_pylist()] == imaps
    for i, (a, nm) in enumerate(duckdb.sql(
            f"SELECT attrs, names FROM read_parquet('{p}') "
            "ORDER BY id").fetchall()):
        da = (None if a is None else
              dict(zip(a["key"], a["value"])) if isinstance(a, dict)
              else dict(a))
        assert da == maps[i]
        dn = (None if nm is None else
              list(zip(nm["key"], nm["value"]))
              if isinstance(nm, dict) else list(nm))
        assert dn == imaps[i]
    # own reader closes the triangle
    ft = parse_footer(blob)
    got = {}
    for lv, cc in zip(ft["schema_leaves"],
                      ft["row_groups"][0]["columns"]):
        if lv["path"] == "id":
            continue
        got[lv["path"]] = read_column_chunk(
            blob, start_offset=cc["data_page_offset"],
            num_values=cc["num_values"], ptype=lv["type"],
            codec=codec, max_def_level=lv["max_def_level"],
            max_rep_level=lv["max_rep_level"],
            rep_def_levels=lv["rep_def_levels"])
    own = [None if k is None else
           dict(zip([x.decode() for x in k], v))
           for k, v in zip(got["attrs.key_value.key"],
                           got["attrs.key_value.value"])]
    assert own == maps


def test_map_hostile_inputs():
    with pytest.raises(ValueError):  # null key
        write_parquet([("m", "MAP_STRING_INT64", [{None: 1}])])
    with pytest.raises(ValueError):  # non-pair rows
        write_parquet([("m", "MAP_STRING_INT64", [[1, 2, 3]])])
    with pytest.raises(ValueError):  # unknown map type combo
        write_parquet([("m", "MAP_DOUBLE_INT64", [{}])])
