"""From-scratch RFC 8878 zstd decoder vs Arrow's bundled libzstd."""

import json
import random

import pyarrow as pa
import pytest

from health_monitor_cc_flink_spark.operators.zstd import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)


def test_xxh64_known_vectors():
    # public xxHash reference vectors
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"a" * 101) == xxh64(b"a" * 100 + b"a")


def _samples():
    random.seed(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    return [
        b"",
        b"a",
        b"hello world " * 100,
        bytes(range(256)) * 50,
        b"\x00" * 10000,
        ("fox " * 5000).encode(),
        bytes(random.randrange(256) for _ in range(5000)),
        bytes(random.choice(b"abcd") for _ in range(20000)),
        (" ".join(random.choice(words)
                  for _ in range(30000))).encode(),
        json.dumps([{"id": i, "v": i * 0.5}
                    for i in range(5000)]).encode(),
        b"x" * 400000,  # multi-block
        (b"abcabcabc" * 3000) + b"X" + (b"abcabcabc" * 1500),
    ]


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
def test_their_compress_our_decompress(level):
    codec = pa.Codec("zstd", compression_level=level)
    for s in _samples():
        assert zstd_decompress(
            codec.compress(s, asbytes=True)) == s


def test_our_compress_their_decompress():
    codec = pa.Codec("zstd")
    for s in _samples():
        framed = zstd_compress(s)
        assert codec.decompress(framed, len(s), asbytes=True) == s
        assert zstd_decompress(framed) == s  # and our own round-trip


def test_checksum_tamper_detected():
    framed = bytearray(zstd_compress(b"payload " * 200))
    framed[-1] ^= 1
    with pytest.raises(ValueError):
        zstd_decompress(bytes(framed))


def test_skippable_frame_skipped():
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(
        4, "little") + b"xyz"
    framed = skip + zstd_compress(b"data")
    assert zstd_decompress(framed) == b"data"


def test_hostile_truncation_and_bitflips_raise_valueerror():
    codec = pa.Codec("zstd", compression_level=3)
    base = codec.compress(b"the quick brown fox " * 500, asbytes=True)
    for cut in range(0, len(base), 23):
        try:
            zstd_decompress(base[:cut])
        except ValueError:
            pass  # never IndexError/struct.error/hang
    random.seed(3)
    for _ in range(150):
        b = bytearray(base)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        try:
            zstd_decompress(bytes(b))
        except ValueError:
            pass


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        zstd_decompress(b"\x00\x00\x00\x00rest")


def test_zstd_parquet_and_orc_files_decode(tmp_path):
    import pyarrow.parquet as pq
    from pyarrow import orc

    from health_monitor_cc_flink_spark.operators.orc_data import (
        read_stripe_column,
    )
    from health_monitor_cc_flink_spark.operators.orc_meta import (
        parse_orc_tail,
    )
    from health_monitor_cc_flink_spark.operators.parquet_data import (
        read_column_chunk,
    )
    from health_monitor_cc_flink_spark.operators.parquet_meta import (
        parse_footer,
    )

    vals = [(i * 37) % 1000 - 500 for i in range(20000)]
    svals = [f"v{i % 60}" for i in range(20000)]
    t = pa.table({"x": pa.array(vals, pa.int64()),
                  "s": pa.array(svals)})

    p = tmp_path / "z.parquet"
    pq.write_table(t, p, compression="zstd")
    data = p.read_bytes()
    m = parse_footer(data)
    xs = []
    for rg in m["row_groups"]:
        cc = next(c for c in rg["columns"] if c["path"] == "x")
        assert cc["codec"] == "ZSTD"
        xs.extend(read_column_chunk(
            data,
            start_offset=(cc["dictionary_page_offset"]
                          or cc["data_page_offset"]),
            num_values=cc["num_values"], ptype=cc["type"],
            codec=cc["codec"]))
    assert xs == vals

    o = tmp_path / "z.orc"
    orc.write_table(t, o, compression="zstd")
    data = o.read_bytes()
    m = parse_orc_tail(data)
    assert m["compression"] == "ZSTD"
    xs, ss = [], []
    for s in m["stripes"]:
        xs.extend(read_stripe_column(data, s, "LONG", 1,
                                     m["compression"], s["n_rows"]))
        ss.extend(read_stripe_column(data, s, "STRING", 2,
                                     m["compression"], s["n_rows"]))
    assert xs == vals
    assert ss == svals


def _block_types(framed: bytes) -> list[int]:
    """Walk frame blocks -> block type ids (0 raw / 1 rle / 2 fse)."""
    import struct as _s

    pos = 4
    fhd = framed[pos]
    pos += 1
    fcs_code = fhd >> 6
    single = (fhd >> 5) & 1
    assert single and fcs_code == 3
    (fcs,) = _s.unpack_from("<Q", framed, pos)
    pos += 8
    types = []
    while True:
        bh = int.from_bytes(framed[pos:pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        types.append(btype)
        pos += 1 if btype == 1 else bsize
        if last:
            return types


def test_lz_mode_emits_compressed_blocks():
    """The default mode produces genuine Compressed_Blocks (FSE-coded
    sequences), not Raw fallbacks, on compressible input — and
    libzstd accepts them."""
    codec = pa.Codec("zstd")
    data = b"the quick brown fox. " * 2000
    framed = zstd_compress(data)
    assert 2 in _block_types(framed)
    assert len(framed) < len(data) // 50
    assert codec.decompress(framed, len(data), asbytes=True) == data
    # multi-block input keeps compressing across block boundaries
    big = bytes(range(256)) * 1024  # 256 KiB, period 256
    framed = zstd_compress(big)
    assert _block_types(framed).count(2) >= 2
    assert codec.decompress(framed, len(big), asbytes=True) == big
    assert zstd_decompress(framed) == big


def test_store_mode_still_raw():
    data = b"the quick brown fox. " * 200
    framed = zstd_compress(data, mode="store")
    assert _block_types(framed) == [0]
    assert zstd_decompress(framed) == data
    with pytest.raises(ValueError):
        zstd_compress(b"x", mode="nope")


def test_rle_block_for_constant_runs():
    codec = pa.Codec("zstd")
    data = b"Q" * 100_000
    framed = zstd_compress(data)
    assert set(_block_types(framed)) == {1}
    assert codec.decompress(framed, len(data), asbytes=True) == data


def test_sequence_encoder_code_boundaries():
    """ll/ml/offset values straddling every code-ladder boundary
    (direct->extra-bit transitions) roundtrip through both
    decoders."""
    codec = pa.Codec("zstd")
    rng = __import__("random").Random(3)
    # craft data whose matches hit assorted lengths and offsets
    for trial in range(6):
        parts = []
        seed = bytes(rng.randrange(256) for _ in range(64))
        parts.append(seed)
        for _ in range(60):
            off = rng.randrange(1, len(b"".join(parts)))
            ln = rng.choice([3, 4, 15, 16, 17, 31, 34, 35, 36, 37,
                             64, 127, 1029])
            blob = b"".join(parts)
            start = rng.randrange(0, max(1, len(blob) - ln))
            parts.append(blob[start:start + ln])
            parts.append(bytes(rng.randrange(256)
                               for _ in range(rng.choice(
                                   [0, 1, 15, 16, 17, 65]))))
        data = b"".join(parts)
        framed = zstd_compress(data)
        assert zstd_decompress(framed) == data, trial
        assert codec.decompress(
            framed, len(data), asbytes=True) == data, trial


def test_many_sequences_two_byte_count():
    """> 127 sequences exercises the 2-byte Number_of_Sequences
    form."""
    codec = pa.Codec("zstd")
    data = b"".join(b"block%04d" % (i % 7) for i in range(3000))
    framed = zstd_compress(data)
    assert 2 in _block_types(framed)
    assert zstd_decompress(framed) == data
    assert codec.decompress(framed, len(data), asbytes=True) == data


def test_random_compress_roundtrip_property():
    import random as _r

    codec = pa.Codec("zstd")
    rng = _r.Random(11)
    for _ in range(25):
        n = rng.randrange(0, 5000)
        style = rng.random()
        if style < 0.3:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif style < 0.6:
            word = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 30)))
            data = (word * (n // max(1, len(word)) + 1))[:n]
        else:
            data = bytes(rng.choice(b"abcd") for _ in range(n))
        framed = zstd_compress(data)
        assert zstd_decompress(framed) == data
        assert codec.decompress(framed, n, asbytes=True) == data


def test_huffman_literals_one_and_four_stream():
    """Compressible literals with no LZ matches exercise the Huffman
    literals path: <=1023 regenerated -> 1-stream, larger ->
    4-stream with the jump table; libzstd accepts both."""
    import random as _r

    from health_monitor_cc_flink_spark.operators.zstd import (
        _huffman_literals_section,
    )

    codec = pa.Codec("zstd")
    rng = _r.Random(5)
    small = bytes(rng.choice(b"abcdefgh ") for _ in range(900))
    big = bytes(rng.choice(b"abcdefgh ") for _ in range(9000))
    for data in (small, big):
        sec = _huffman_literals_section(data)
        assert sec is not None and len(sec) < len(data)
        framed = zstd_compress(data)
        assert len(framed) < len(data)
        assert zstd_decompress(framed) == data
        assert bytes(codec.decompress(framed, len(data))) == data
    # 1-stream vs 4-stream header forms
    assert (small and (_huffman_literals_section(small)[0] >> 2) & 3
            == 0)
    assert (_huffman_literals_section(big)[0] >> 2) & 3 in (2, 3)


def test_huffman_length_limit_eleven():
    """Fibonacci-ish frequencies force unbounded Huffman depth far
    past 11; package-merge must cap at 11 with a complete tree the
    decoder accepts."""
    from health_monitor_cc_flink_spark.operators.zstd import (
        _package_merge_lengths,
    )

    a, b = 1, 2
    freqs = {}
    for s in range(20):
        freqs[s] = a
        a, b = b, a + b
    lengths = _package_merge_lengths(freqs, 11)
    assert max(lengths.values()) <= 11
    assert sum(2 ** (11 - l) for l in lengths.values()) == 1 << 11
    # end-to-end: data drawn from that distribution roundtrips
    data = b"".join(bytes([s]) * f for s, f in freqs.items())
    framed = zstd_compress(data)
    assert zstd_decompress(framed) == data
    assert bytes(pa.Codec("zstd").decompress(
        framed, len(data))) == data


def test_huffman_high_symbol_uses_fse_weights():
    """A literal byte > 128 can't ride the direct 4-bit weights form
    (header 128+n caps at symbol 128): the tree description switches
    to the FSE-compressed two-state form (header < 128), which
    libzstd must accept."""
    from health_monitor_cc_flink_spark.operators.zstd import (
        _huffman_literals_section,
    )

    codec = pa.Codec("zstd")
    data = bytes([10, 200, 220, 240, 250, 255][i % 6]
                 for i in range(3000))
    sec = _huffman_literals_section(data)
    assert sec is not None
    assert sec[3] < 128  # tree header byte: FSE form
    framed = zstd_compress(data)
    assert len(framed) < len(data)
    assert zstd_decompress(framed) == data
    assert bytes(codec.decompress(framed, len(data))) == data


def test_fse_distribution_writer_roundtrip():
    """fse_write_distribution is the exact inverse of
    fse_read_distribution across random normalized shapes."""
    import random as _r

    from health_monitor_cc_flink_spark.operators.zstd import (
        fse_normalize,
        fse_read_distribution,
        fse_write_distribution,
    )

    rng = _r.Random(7)
    for _ in range(150):
        nsym = rng.randrange(2, 14)
        counts = {s: rng.randrange(1, 1000)
                  for s in rng.sample(range(13), nsym)}
        probs = fse_normalize(counts, 6)
        assert sum(probs) == 1 << 6
        blob = fse_write_distribution(probs, 6)
        got, acc, _ = fse_read_distribution(blob, 255)
        assert acc == 6
        assert got == probs[:len(got)]
        assert all(p == 0 for p in probs[len(got):])


def test_fse_weights_form_chosen_when_smaller():
    """Wide low-cardinality weight vectors compress below the direct
    4-bit form and the encoder picks the FSE form."""
    import random as _r

    codec = pa.Codec("zstd")
    rng = _r.Random(3)
    # 120 distinct symbols -> 60-byte direct form; weights are
    # near-uniform so the FSE form undercuts it
    alpha = bytes(range(120))
    data = bytes(rng.choice(alpha) for _ in range(20000))
    framed = zstd_compress(data)
    assert zstd_decompress(framed) == data
    assert bytes(codec.decompress(framed, len(data))) == data


def test_rle_literals_inside_compressed_block():
    """A block whose literals are one repeated byte (but which has
    matches) uses the RLE literals form."""
    codec = pa.Codec("zstd")
    data = b"a" * 500 + b"XYZQ" + b"a" * 500 + b"XYZQ"
    framed = zstd_compress(data)
    assert zstd_decompress(framed) == data
    assert bytes(codec.decompress(framed, len(data))) == data


def test_custom_and_rle_sequence_table_modes():
    """Skewed sequence statistics flip the encoder to custom FSE
    table descriptions (mode 2) or RLE (mode 1) per ladder when
    smaller than predefined — libzstd and the own decoder both
    accept the result, and the section really uses a non-predefined
    mode."""
    import random as _r

    from health_monitor_cc_flink_spark.operators.zstd import (
        _encode_sequences,
        _lz_sequences,
    )

    codec = pa.Codec("zstd")
    rng = _r.Random(17)
    # constant-shape repetitions: ll/ml/offset codes heavily skewed
    data = b"".join(b"A" * 17 + bytes([rng.randrange(128)])
                    for _ in range(3000))
    seqs, _ = _lz_sequences(data, 0, len(data), {})
    section = _encode_sequences(seqs)
    n = len(seqs)
    modes_off = 1 if n < 128 else (2 if n < 0x7F00 else 3)
    assert section[modes_off] != 0  # some ladder left predefined 0
    framed = zstd_compress(data)
    assert zstd_decompress(framed) == data
    assert bytes(codec.decompress(framed, len(data))) == data


def test_repeat_offsets_across_blocks():
    """Repeat-offset codes (offset_value 1-3) mirror the decoder's
    3-slot history incl. the ll==0 shift; the state is frame-scoped
    and must NOT advance over Raw-fallback blocks — exercised by a
    compressible/incompressible/compressible multi-block frame."""
    import random as _r

    codec = pa.Codec("zstd")
    rng = _r.Random(23)
    blk = 1 << 17  # block-aligned so the middle block is pure noise
    text = (b"the same stride repeats " * 6000)[:blk]
    noise = bytes(rng.randrange(256) for _ in range(blk))
    data = text + noise + text
    framed = zstd_compress(data)
    types = _block_types(framed)
    assert 0 in types and 2 in types  # both forms present
    assert zstd_decompress(framed) == data
    assert bytes(codec.decompress(framed, len(data))) == data
    # dense single-offset repetition compresses near-perfectly
    stride = b"".join(b"ABCDEFGH" + bytes([i & 0xFF])
                      for i in range(20000))
    framed = zstd_compress(stride)
    assert len(framed) < len(stride) // 400
    assert zstd_decompress(framed) == stride
    assert bytes(codec.decompress(framed, len(stride))) == stride


def test_far_match_candidates_skipped_not_crashed(monkeypatch):
    """A hash-table hit further back than PREDEFINED offset mode can
    encode (of_code > 28) must be treated as stale — emit literals —
    instead of crashing in the FSE encoder (ADVICE r13).  The real cap
    is 2^29-4 (only reachable on >512 MiB single-segment frames); we
    shrink it to exercise the skip path at test size."""
    from health_monitor_cc_flink_spark.operators import zstd as z

    monkeypatch.setattr(z, "_MAX_MATCH_DIST", 64)
    rng = random.Random(9)
    filler = bytes(rng.randrange(256) for _ in range(300))
    data = b"needleneedleneedle" + filler + b"needleneedleneedle"
    frame = z.zstd_compress(data)  # crashed before the cap
    assert z.zstd_decompress(frame) == data
    import pyarrow as _pa
    assert _pa.decompress(
        frame, decompressed_size=len(data), codec="zstd") == data
    # sequences that ARE within the cap still match (same data, no cap)
    monkeypatch.setattr(z, "_MAX_MATCH_DIST", (1 << 29) - 4)
    frame2 = z.zstd_compress(data)
    assert z.zstd_decompress(frame2) == data
    assert len(frame2) <= len(frame)


def test_encoder_memo_caches_are_code_caches_only():
    """r17: the entropy-table memos (_HUF_CODE_CACHE /
    _SEQ_TABLE_CACHE) key on frequency DISTRIBUTIONS, never on input
    bytes — warm-cache output must be byte-identical to cold-cache
    output for every input, and the bound must reset wholesale."""
    from health_monitor_cc_flink_spark.operators import zstd as z

    rng = random.Random(17)
    cases = [bytes(rng.choice(b"abcdefgh") for _ in range(n))
             for n in (0, 1, 37, 400, 5000)]
    cases.append(bytes(rng.randrange(256) for _ in range(3000)))
    cases.append(b"runrunrun" * 500)
    cold = []
    for d in cases:
        z._HUF_CODE_CACHE.clear()
        z._SEQ_TABLE_CACHE.clear()
        cold.append(z.zstd_compress(d))
    warm = [z.zstd_compress(d) for d in cases]  # caches now populated
    assert warm == cold
    for d, frame in zip(cases, warm):
        assert z.zstd_decompress(frame) == d
    # distinct distributions produce distinct cache keys, bounded
    assert len(z._HUF_CODE_CACHE) <= z._ENC_CACHE_MAX
    # overflow resets wholesale instead of growing unbounded
    z._HUF_CODE_CACHE.clear()
    for i in range(z._ENC_CACHE_MAX):
        z._HUF_CODE_CACHE[("sentinel", i)] = None
    z.zstd_compress(cases[3])  # 8-symbol literals: Huffman applies
    assert len(z._HUF_CODE_CACHE) < z._ENC_CACHE_MAX
