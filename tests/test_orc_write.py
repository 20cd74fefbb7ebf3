"""From-scratch ORC writer vs the reference readers."""

import pathlib

import pytest
from pyarrow import orc

from health_monitor_cc_flink_spark.operators.orc_write import (
    byte_rle_encode,
    rlev2_encode,
    write_orc,
)

COLS = [
    ("x", "LONG", [i * 7 - 500 for i in range(5000)]),
    ("d", "DOUBLE",
     [None if i % 11 == 3 else i / 8 for i in range(5000)]),
    ("s", "STRING",
     [None if i % 7 == 2 else f"v{i % 50}" for i in range(5000)]),
    ("b", "BOOLEAN",
     [None if i % 13 == 5 else (i % 3 == 0) for i in range(5000)]),
]


@pytest.mark.parametrize("codec", ["SNAPPY", "NONE"])
def test_arrow_orc_reads_back_exact(codec, tmp_path):
    blob = write_orc(COLS, codec=codec)
    p = tmp_path / "w.orc"
    p.write_bytes(blob)
    t = orc.read_table(p)
    for name, _, vals in COLS:
        assert t[name].to_pylist() == vals, name


def test_spark_java_orc_reads_back_exact(spark, tmp_path):
    """The SECOND reference reader: Spark's Java ORC."""
    blob = write_orc(COLS)
    d = tmp_path / "orcdir"
    d.mkdir()
    (d / "part-0.orc").write_bytes(blob)
    rows = (spark.read.orc(str(d))
            .orderBy("x").collect())
    assert len(rows) == 5000
    got = [(r["x"], r["d"], r["s"], r["b"]) for r in rows]
    want = sorted(zip(*(v for _, _, v in COLS)),
                  key=lambda t: t[0])
    assert got == want


def test_own_reader_closes_the_triangle():
    from health_monitor_cc_flink_spark.operators.orc_data import (
        read_stripe_column,
    )
    from health_monitor_cc_flink_spark.operators.orc_meta import (
        parse_orc_tail,
    )

    blob = write_orc(COLS)
    m = parse_orc_tail(blob)
    assert m["compression"] == "SNAPPY"
    s = m["stripes"][0]
    for cid, (name, kind, vals) in enumerate(COLS, start=1):
        got = read_stripe_column(blob, s, kind, cid,
                                 m["compression"], s["n_rows"])
        assert got == vals, name


def test_rlev2_direct_roundtrip():
    from health_monitor_cc_flink_spark.operators.orc_data import (
        decode_rlev2,
    )

    for vals, signed in (
        ([0, 1, -5, 10**12, -(10**12)], True),
        (list(range(2000)), False),
        ([7] * 600, True),
    ):
        blob = rlev2_encode(vals, signed=signed)
        assert decode_rlev2(blob, signed=signed,
                            n=len(vals)) == vals


def test_byte_rle_roundtrip():
    from health_monitor_cc_flink_spark.operators.orc_data import (
        decode_byte_rle,
    )

    import random

    random.seed(1)
    for data in (b"\x00" * 500, bytes(range(200)),
                 bytes(random.choice(b"\x00\xffab")
                       for _ in range(3000))):
        assert decode_byte_rle(byte_rle_encode(data),
                               len(data)) == data


def test_hostile_inputs():
    with pytest.raises(ValueError):
        write_orc([])
    with pytest.raises(ValueError):
        write_orc([("x", "LONG", [1]), ("y", "LONG", [1, 2])])
    with pytest.raises(ValueError):
        write_orc([("x", "TIMESTAMP", [1])])
