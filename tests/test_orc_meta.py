"""From-scratch ORC tail walk vs Spark's own ORC writer/reader."""

import glob

import pytest

from health_monitor_cc_flink_spark.operators.orc_meta import (
    parse_orc_tail,
)
from health_monitor_cc_flink_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def orc_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("orc")
    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    paths = {}
    for codec in ("snappy", "zlib", "none"):
        out = str(base / codec)
        (df.coalesce(1).write.mode("overwrite")
         .option("compression", codec).orc(out))
        (paths[codec],) = glob.glob(out + "/part-*.orc")
    return paths


@pytest.mark.parametrize("codec,kind", [
    ("snappy", "SNAPPY"), ("zlib", "ZLIB"), ("none", "NONE"),
])
def test_tail_walk_all_codecs(orc_paths, codec, kind):
    with open(orc_paths[codec], "rb") as f:
        m = parse_orc_tail(f.read())
    assert m["compression"] == kind
    assert m["n_rows"] == 6000
    assert sum(s["n_rows"] for s in m["stripes"]) == m["n_rows"]
    assert m["n_cols"] == 11
    assert m["schema"][0] == ("LONG", "l_orderkey")
    assert m["schema"][8] == ("STRING", "l_returnflag")
    assert all(s["data_length"] > 0 for s in m["stripes"])


def test_stripe_offsets_monotone(orc_paths):
    with open(orc_paths["snappy"], "rb") as f:
        m = parse_orc_tail(f.read())
    offs = [s["offset"] for s in m["stripes"]]
    assert offs == sorted(offs)
    assert offs[0] >= 3  # after the "ORC" header magic


def test_matches_spark_readback(spark, orc_paths):
    got = spark.read.orc(orc_paths["snappy"].rsplit("/", 1)[0])
    with open(orc_paths["snappy"], "rb") as f:
        m = parse_orc_tail(f.read())
    assert got.count() == m["n_rows"]
    assert len(got.columns) == m["n_cols"]
    assert [n for _, n in m["schema"]] == got.columns


def test_not_orc_rejected():
    with pytest.raises(ValueError):
        parse_orc_tail(b"PAR1" + b"\x00" * 64)


def test_truncated_rejected(orc_paths):
    with open(orc_paths["none"], "rb") as f:
        data = f.read()
    with pytest.raises(ValueError):
        parse_orc_tail(data[:40] + data[-1:])


def test_metadata_section_stripe_statistics():
    """The writer now emits the file-tail Metadata section
    (StripeStatistics per stripe); parse_orc_metadata reads it with
    ONE tail read — per-stripe typed min/max agree with the data,
    and reference readers still read the files (covered for Spark
    in test_orc_write)."""
    import io

    from pyarrow import orc as porc

    from health_monitor_cc_flink_spark.operators.orc_meta import (
        parse_orc_metadata,
        parse_orc_tail,
    )
    from health_monitor_cc_flink_spark.operators.orc_write import (
        write_orc,
    )

    n = 1000
    ks = [i * 7 for i in range(n)]
    ss = [None if i % 5 == 3 else f"v{i % 40}" for i in range(n)]
    ds = [(i - 500) / 8 for i in range(n)]
    blob = write_orc([("k", "LONG", ks), ("s", "STRING", ss),
                      ("d", "DOUBLE", ds)], stripe_rows=128)
    assert porc.ORCFile(io.BytesIO(blob)).read()["k"].to_pylist() \
        == ks
    m = parse_orc_tail(blob)
    assert m["metadata_length"] > 0
    stats = parse_orc_metadata(blob)
    assert len(stats) == 8
    for i, cols in enumerate(stats):
        lo, hi = i * 128, min(n, (i + 1) * 128) - 1
        assert cols[1]["min"] == ks[lo] and cols[1]["max"] == ks[hi]
        assert cols[3]["min"] == ds[lo] and cols[3]["max"] == ds[hi]
        assert cols[2]["has_null"] is True
        assert cols[0]["n_values"] == hi - lo + 1
    # NONE codec path too
    b2 = write_orc([("k", "LONG", ks)], codec="NONE")
    assert parse_orc_metadata(b2)[0][1]["max"] == ks[-1]
