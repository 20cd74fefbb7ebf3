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
