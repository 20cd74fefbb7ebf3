"""ORC Bloom filters: Java-hash conformance (via the JVM on the
Spark classpath), writer/reader roundtrip, certificates, hostile
input."""

import io
import random
import struct

import pytest

from health_monitor_cc_flink_spark.operators.orc_bloom import (
    OrcBloomFilter,
    murmur3_hash64,
    parse_bloom_index,
    read_column_blooms,
    wang_hash64,
    write_bloom_index,
)
from health_monitor_cc_flink_spark.operators.orc_meta import (
    parse_orc_tail,
)
from health_monitor_cc_flink_spark.operators.orc_write import (
    write_orc,
)

M64 = (1 << 64) - 1


def test_wang_hash_matches_java_reflection(spark):
    """getLongHash pinned against the actual JVM implementation —
    the shipped ORC uses SIGNED right shifts (lshr), observable at
    key 0 (hash 0) and any key with bit 63 set mid-pipeline."""
    gw = spark.sparkContext._gateway
    jvm = spark._jvm
    cls = jvm.java.lang.Class.forName(
        "org.apache.orc.util.BloomFilter")
    carr = gw.new_array(jvm.java.lang.Class, 1)
    carr[0] = jvm.java.lang.Long.TYPE
    m = cls.getDeclaredMethod("getLongHash", carr)
    m.setAccessible(True)

    def jh(v):
        aarr = gw.new_array(jvm.java.lang.Object, 1)
        aarr[0] = jvm.java.lang.Long(v)
        return m.invoke(None, aarr) & M64

    rng = random.Random(7)
    keys = [0, 1, -1, 2 ** 32 + 7, 2 ** 63 - 1, -2 ** 63] + \
        [rng.randrange(-2 ** 63, 2 ** 63) for _ in range(60)]
    assert all(jh(v) == wang_hash64(v) for v in keys)
    assert wang_hash64(0) == 0  # the signed-shift signature


def test_murmur3_hash64_matches_java(spark):
    jvm = spark._jvm
    rng = random.Random(3)
    for _ in range(60):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 40)))
        j = jvm.org.apache.orc.util.Murmur3.hash64(
            bytearray(data)) & M64
        assert j == murmur3_hash64(data)


def test_java_written_blooms_pass_own_check(spark, tmp_path):
    """The gold certificate: Spark's Java ORC writer emits
    BLOOM_FILTER_UTF8 streams; the own reader parses them and every
    inserted value passes — hash, bitset layout, and serialization
    all conform or this fails."""
    import glob

    rows = [(i * 13 + 1 - 2 ** 40 * (i % 3), f"w{i % 97}",
             (i - 700) / 8) for i in range(1500)]
    df = spark.createDataFrame(
        rows, "k long, s string, d double").coalesce(1)
    p = str(tmp_path / "jorc")
    (df.write.mode("overwrite")
       .option("orc.bloom.filter.columns", "k,s,d").orc(p))
    data = open(glob.glob(p + "/*.orc")[0], "rb").read()
    m = parse_orc_tail(data)
    st = m["stripes"][0]

    def any_pass(blooms, t):
        return any(t(bf) for bf in blooms)

    bk = read_column_blooms(data, st, m["compression"], 1)
    bs = read_column_blooms(data, st, m["compression"], 2)
    bd = read_column_blooms(data, st, m["compression"], 3)
    assert all(any_pass(bk, lambda bf, v=v: bf.test_long(v))
               for v, _, _ in rows)
    assert all(any_pass(bs, lambda bf, s=s: bf.test_string(s))
               for _, s, _ in rows)
    assert all(any_pass(bd, lambda bf, d=d: bf.test_double(d))
               for _, _, d in rows)
    absent = [v * 7 + 3 for v in range(1000)]
    fp = sum(any_pass(bk, lambda bf, v=v: bf.test_long(v))
             for v in absent) / len(absent)
    assert fp < 0.1


def test_own_writer_blooms_roundtrip(spark, tmp_path):
    ks = [i * 13 + 1 for i in range(2000)]
    ss = [None if i % 7 == 2 else f"w{i % 37}" for i in range(2000)]
    ds = [-0.0 if i == 5 else (i - 1000) / 8 for i in range(2000)]
    blob = write_orc([("k", "LONG", ks), ("s", "STRING", ss),
                      ("d", "DOUBLE", ds)], bloom_filter=True)
    from pyarrow import orc as porc

    t = porc.ORCFile(io.BytesIO(blob)).read()
    assert t["k"].to_pylist() == ks
    assert t["s"].to_pylist() == ss
    p = tmp_path / "own.orc"
    p.write_bytes(blob)
    got = spark.read.orc(str(p)).orderBy("k").collect()
    assert [r.k for r in got] == ks
    m = parse_orc_tail(blob)
    st = m["stripes"][0]
    assert st["index_length"] > 0
    bk = read_column_blooms(blob, st, m["compression"], 1)[0]
    bs = read_column_blooms(blob, st, m["compression"], 2)[0]
    bd = read_column_blooms(blob, st, m["compression"], 3)[0]
    assert all(bk.test_long(v) for v in ks)
    assert all(bs.test_string(v) for v in ss if v is not None)
    assert all(bd.test_double(v) for v in ds)
    # signed-zero canonicalization: the file holds -0.0, both
    # spellings must pass (same defect class as ADVICE r13 parquet)
    assert bd.test_double(0.0) and bd.test_double(-0.0)
    absent = [v * 13 + 5 for v in range(2000)]
    fp = sum(bk.test_long(v) for v in absent) / len(absent)
    assert fp < 0.1
    with pytest.raises(ValueError):
        read_column_blooms(blob, st, m["compression"], 99)


def test_bloom_index_blob_roundtrip_and_hostile():
    bf = OrcBloomFilter.sized_for(100)
    for v in range(50):
        bf.add_long(v * 3)
    back = parse_bloom_index(write_bloom_index([bf]))
    assert len(back) == 1
    assert back[0].words == bf.words
    assert back[0].k == bf.k
    assert all(back[0].test_long(v * 3) for v in range(50))
    with pytest.raises(ValueError):
        OrcBloomFilter(63, 1)  # not word-aligned
    with pytest.raises(ValueError):
        OrcBloomFilter(64, 0)
    with pytest.raises(ValueError):
        OrcBloomFilter.sized_for(10, fpp=1.5)
    # utf8bitset not word-aligned
    raw = write_bloom_index([bf])
    bad = raw[:-1]  # truncate one byte of the bitset
    with pytest.raises(ValueError):
        parse_bloom_index(bad)


def test_double_bits_match_java_double_to_long_bits():
    """addDouble == addLong(doubleToLongBits): pin the bit pattern
    conversion (signed little-endian q of the IEEE bytes)."""
    for v in (0.125, -3.75, 1e300, -1e-300, 2.0):
        bits = struct.unpack("<q", struct.pack("<d", v))[0]
        bf = OrcBloomFilter(640, 4)
        bf.add_double(v)
        assert bf.test_long(bits)


def test_java_written_negative_zero_not_skipped():
    """ADVICE r14: Java's writer hashes doubleToLongBits(-0.0)
    UNcanonicalized; this writer canonicalizes on add.  The read
    side must probe both bit patterns for zero so neither writer's
    files produce a false negative (a wrongly-skipped stripe)."""
    import struct

    from health_monitor_cc_flink_spark.operators.orc_bloom import (
        OrcBloomFilter,
    )

    # simulate a Java-written bloom: -0.0 inserted by raw bit
    # pattern, bypassing the write-side canonicalization
    java = OrcBloomFilter.sized_for(4, 0.05)
    java.add_long(struct.unpack("<q", struct.pack("<d", -0.0))[0])
    assert java.test_double(0.0)
    assert java.test_double(-0.0)

    # own-written bloom (canonicalized +0.0) keeps matching both
    own = OrcBloomFilter.sized_for(4, 0.05)
    own.add_double(-0.0)
    assert own.test_double(0.0)
    assert own.test_double(-0.0)

    # a bloom with NEITHER pattern still rejects zero (no blanket
    # keep — the probe is two hashes, not a bypass)
    empty = OrcBloomFilter.sized_for(4, 0.05)
    empty.add_double(1.5)
    assert not empty.test_double(0.0)
