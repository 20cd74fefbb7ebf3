"""Split-block Bloom filters: spec construction, no false negatives,
FP rate, hostile input, writer/reader integration."""

import io
import random

import pytest

from health_monitor_cc_flink_spark.operators.parquet_bloom import (
    SplitBlockBloom,
    bloom_hash,
    read_bloom_blob,
    write_bloom_blob,
)
from health_monitor_cc_flink_spark.operators.parquet_meta import (
    parse_footer,
)
from health_monitor_cc_flink_spark.operators.parquet_write import (
    write_parquet,
)


def test_no_false_negatives_and_fp_rate():
    rng = random.Random(5)
    keys = rng.sample(range(10 ** 12), 5000)
    bf = SplitBlockBloom.sized_for(len(keys))
    for k in keys:
        bf.insert(k, "INT64")
    assert all(bf.check(k, "INT64") for k in keys)
    present = set(keys)
    absent = [k for k in rng.sample(range(10 ** 12), 20000)
              if k not in present]
    fp = sum(bf.check(k, "INT64") for k in absent) / len(absent)
    assert fp < 0.02


def test_blob_roundtrip_and_hostile():
    bf = SplitBlockBloom(4)
    for v in ("a", "b", "c"):
        bf.insert(v, "STRING")
    blob = write_bloom_blob(bf)
    back = read_bloom_blob(blob, 0)
    assert back.words == bf.words
    assert back.check("b", "STRING")
    with pytest.raises(ValueError):
        read_bloom_blob(blob[:10], 0)
    with pytest.raises(ValueError):
        read_bloom_blob(blob, len(blob) + 5)
    with pytest.raises(ValueError):
        SplitBlockBloom(3)  # not a power of two
    with pytest.raises(ValueError):
        SplitBlockBloom.from_bytes(b"\x00" * 31)


def test_writer_emits_referenced_blooms(tmp_path):
    """ColumnMetaData fields 14/15 point at a parseable filter;
    reference readers skip the unknown section cleanly."""
    import duckdb
    import pyarrow.parquet as pq

    n = 3000
    keys = [i * 13 for i in range(n)]
    s = [f"w{i % 40}" for i in range(n)]
    blob = write_parquet(
        [("k", "INT64", keys), ("s", "STRING", s)],
        dictionary=True, page_index=True, bloom_filter=True)
    t = pq.read_table(io.BytesIO(blob))
    assert t["k"].to_pylist() == keys
    p = tmp_path / "bf.parquet"
    p.write_bytes(blob)
    assert duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{p}')"
    ).fetchall() == [(n,)]
    m = parse_footer(blob)
    for cc in m["row_groups"][0]["columns"]:
        assert cc["bloom_filter_offset"] is not None
        bf = read_bloom_blob(blob, cc["bloom_filter_offset"])
        assert bf.z >= 1
    cc = next(c for c in m["row_groups"][0]["columns"]
              if c["path"] == "k")
    bf = read_bloom_blob(blob, cc["bloom_filter_offset"])
    assert all(bf.check(k, "INT64") for k in keys)
    assert sum(bf.check(k * 13 + 7, "INT64")
               for k in range(n)) < n // 10


def test_hash_is_spec_xxh64_of_plain_encoding():
    """The hash input is the plain encoding: INT64 little-endian,
    strings raw utf-8 — pinned against the verified xxh64."""
    import struct

    from health_monitor_cc_flink_spark.operators.zstd import xxh64

    assert bloom_hash(123456, "INT64") == xxh64(
        struct.pack("<q", 123456))
    assert bloom_hash("héllo", "STRING") == xxh64(
        "héllo".encode("utf-8"))
    with pytest.raises(ValueError):
        bloom_hash(True, "BOOLEAN")


def test_signed_zero_no_false_negative(tmp_path):
    """0.0 and -0.0 are == but plain-encode differently; the writer
    dedups inserts through a Python set (which keeps an arbitrary one
    of the pair), so the encodings must be canonicalized or a file
    containing -0.0 answers check(-0.0) False — a false negative that
    makes a bloom-gated point lookup skip a matching row group
    (ADVICE r13)."""
    import pyarrow.parquet as pq

    for ptype in ("DOUBLE", "FLOAT"):
        assert bloom_hash(0.0, ptype) == bloom_hash(-0.0, ptype)
        bf = SplitBlockBloom(4)
        bf.insert(-0.0, ptype)
        assert bf.check(0.0, ptype) and bf.check(-0.0, ptype)

    # end-to-end through the writer's set-dedup path: a DOUBLE column
    # whose only zero is negative must still bloom-hit both spellings
    vals = [-0.0, 1.5, 2.5, 3.5]
    blob = write_parquet([("v", "DOUBLE", vals)], bloom_filter=True)
    t = pq.read_table(io.BytesIO(blob))
    got = t["v"].to_pylist()
    assert got[1:] == vals[1:] and got[0] == 0.0
    m = parse_footer(blob)
    cc = m["row_groups"][0]["columns"][0]
    bf = read_bloom_blob(blob, cc["bloom_filter_offset"])
    assert bf.check(-0.0, "DOUBLE"), "value present in file missed"
    assert bf.check(0.0, "DOUBLE")
    assert not bf.check(9.25, "DOUBLE")
