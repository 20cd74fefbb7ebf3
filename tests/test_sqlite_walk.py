"""From-scratch SQLite reader vs the stdlib (reference) writer."""

import sqlite3

import pytest

from health_monitor_cc_flink_spark.operators.sqlite import (
    SQLiteFile,
    read_sqlite_table,
)


def _db(page_size=512):
    con = sqlite3.connect(":memory:")
    con.execute(f"PRAGMA page_size={page_size}")
    return con


def test_all_serial_types_roundtrip():
    con = _db()
    con.execute("CREATE TABLE t (i INT, r REAL, s TEXT, b BLOB, "
                "z INT, one INT)")
    rows = [
        (0, 0.5, "", b"", None, 1),
        (-1, -2.25, "héllo", b"\x00\xff", None, 0),
        (127, 1e10, "x" * 40, b"b" * 17, None, 1),
        (-(1 << 47), 3.0, "neg", b"", None, 0),
        ((1 << 62), -7.125, "big", b"\x01", None, 1),
    ]
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?)", rows)
    con.commit()
    got = read_sqlite_table(bytes(con.serialize()), "t")
    assert [tuple(v) for _, v in got] == rows


def test_multipage_btree_order():
    con = _db(512)
    con.execute("CREATE TABLE t (i INT, s TEXT)")
    rows = [(j, f"value {j} padding padding") for j in range(500)]
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    con.commit()
    data = bytes(con.serialize())
    assert SQLiteFile(data).n_pages > 10  # genuinely multi-page
    got = read_sqlite_table(data, "t")
    assert [tuple(v) for _, v in got] == rows
    assert [r for r, _ in got] == sorted(r for r, _ in got)


def test_overflow_chain():
    con = _db(512)
    con.execute("CREATE TABLE t (s TEXT)")
    big = "abcdefgh" * 2000  # 16 KB >> 512-byte pages
    con.execute("INSERT INTO t VALUES (?)", (big,))
    con.commit()
    got = read_sqlite_table(bytes(con.serialize()), "t")
    assert got[0][1][0] == big


def test_integer_primary_key_rowid_alias():
    con = _db()
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?,?)",
                    [(10, "a"), (99, "b")])
    con.commit()
    got = read_sqlite_table(bytes(con.serialize()), "t")
    # the ipk column is stored NULL; the rowid carries the value
    assert [(r, v[0], v[1]) for r, v in got] == [
        (10, None, "a"), (99, None, "b")]


def test_master_rows_and_missing_table():
    con = _db()
    con.execute("CREATE TABLE a (x INT)")
    con.execute("CREATE INDEX ia ON a (x)")
    con.commit()
    data = bytes(con.serialize())
    master = SQLiteFile(data).master_rows()
    assert {(r["type"], r["name"]) for r in master} == {
        ("table", "a"), ("index", "ia")}
    with pytest.raises(ValueError):
        read_sqlite_table(data, "nope")


def test_not_sqlite_rejected():
    with pytest.raises(ValueError):
        read_sqlite_table(b"PAR1" + b"\x00" * 200, "t")
