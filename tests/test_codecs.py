"""Snappy / LZ4 from-scratch codecs, cross-validated against Arrow's
native implementations (the strongest correctness pin available for a
compressor: bytes we emit must decode by the reference C++ decoder,
and reference-encoded bytes must decode by ours)."""

import os
import random

import pyarrow as pa
import pytest

from health_monitor_cc_flink_spark.operators.lz4 import (
    lz4_compress_block,
    lz4_decompress_block,
)
from health_monitor_cc_flink_spark.operators.snappy import (
    crc32c,
    snappy_compress_block,
    snappy_decompress_block,
    snappy_frame_compress,
    snappy_frame_decompress,
)

random.seed(0xC0DEC)
CASES = [
    b"",
    b"a",
    b"0123456789ab",          # below LZ4's 13-byte match floor
    b"0123456789abc",
    b"ab" * 3000,             # highly repetitive
    b"the quick brown fox jumps over the lazy dog " * 250,
    os.urandom(9000),          # incompressible
    bytes(random.randrange(6) for _ in range(60000)),  # mixed entropy
    b"z" * 120000,             # pure RLE / overlapping copies
]


def test_crc32c_known_vector():
    # the canonical CRC-32C check value (RFC 3720 appendix B.4)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@pytest.mark.parametrize("data", CASES, ids=lambda d: f"n{len(d)}")
def test_snappy_block_cross_validation(data):
    ref = pa.Codec("snappy")
    mine = snappy_compress_block(data)
    assert snappy_decompress_block(mine) == data
    assert ref.decompress(mine, len(data), asbytes=True) == data
    theirs = ref.compress(data, asbytes=True)
    assert snappy_decompress_block(theirs) == data


@pytest.mark.parametrize("data", CASES, ids=lambda d: f"n{len(d)}")
def test_snappy_framing_roundtrip(data):
    framed = snappy_frame_compress(data, chunk_bytes=4096)
    dec, n_chunks = snappy_frame_decompress(framed)
    assert dec == data
    assert n_chunks == max(-(-len(data) // 4096), 1)


def test_snappy_frame_crc_tamper_rejected():
    framed = bytearray(snappy_frame_compress(b"hello world " * 400))
    framed[-1] ^= 0x01
    with pytest.raises(ValueError):
        snappy_frame_decompress(bytes(framed))


def test_snappy_frame_skippable_chunks_skipped():
    framed = snappy_frame_compress(b"payload")
    # splice a skippable padding chunk (0xFE) after the stream id
    padded = framed[:10] + b"\xfe\x03\x00\x00xyz" + framed[10:]
    dec, _ = snappy_frame_decompress(padded)
    assert dec == b"payload"


def test_snappy_frame_reserved_unskippable_rejected():
    framed = snappy_frame_compress(b"payload")
    bad = framed[:10] + b"\x42\x01\x00\x00q" + framed[10:]
    with pytest.raises(ValueError):
        snappy_frame_decompress(bad)


def test_snappy_preamble_mismatch_rejected():
    blk = bytearray(snappy_compress_block(b"abcdefgh"))
    blk[0] += 1  # inflate the declared uncompressed length
    with pytest.raises(ValueError):
        snappy_decompress_block(bytes(blk))


@pytest.mark.parametrize("data", CASES, ids=lambda d: f"n{len(d)}")
def test_lz4_block_cross_validation(data):
    ref = pa.Codec("lz4_raw")
    mine = lz4_compress_block(data)
    assert lz4_decompress_block(mine, len(data)) == data
    assert ref.decompress(mine, len(data), asbytes=True) == data
    theirs = ref.compress(data, asbytes=True)
    assert lz4_decompress_block(theirs, len(data)) == data


def test_lz4_zero_offset_rejected():
    # token: 1 literal + match; offset 0 is invalid per spec
    bad = bytes([0x10]) + b"A" + b"\x00\x00"
    with pytest.raises(ValueError):
        lz4_decompress_block(bad, 6)


def test_lz4_truncated_rejected():
    good = lz4_compress_block(b"the quick brown fox " * 50)
    with pytest.raises(ValueError):
        lz4_decompress_block(good[:-3], 1000)


# -- LZ4 frame format + xxHash32 ----------------------------------------

def test_xxh32_known_vectors():
    from health_monitor_cc_flink_spark.operators.lz4 import xxh32

    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"Hello World") == 0xB1FD16EE
    assert xxh32(b"Hello World", seed=1) != xxh32(b"Hello World")


@pytest.mark.parametrize("data", CASES, ids=lambda d: f"n{len(d)}")
def test_lz4_frame_cross_validation(data):
    from health_monitor_cc_flink_spark.operators.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    ref = pa.Codec("lz4")  # Arrow's 'lz4' codec IS the frame format
    mine = lz4_frame_compress(data, block_checksums=True)
    assert lz4_frame_decompress(mine) == data
    assert ref.decompress(mine, len(data), asbytes=True) == data
    theirs = ref.compress(data, asbytes=True)  # linked-block frames
    assert lz4_frame_decompress(theirs) == data


def test_lz4_frame_header_checksum_tamper():
    from health_monitor_cc_flink_spark.operators.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    framed = bytearray(lz4_frame_compress(b"payload " * 100))
    framed[4] ^= 0x04  # flip the content-checksum FLG bit
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(framed))


def test_lz4_frame_content_checksum_tamper():
    from health_monitor_cc_flink_spark.operators.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    framed = bytearray(lz4_frame_compress(b"z" * 5000))
    framed[-1] ^= 0x01
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(framed))


def test_lz4_frame_truncated_block_checksum():
    from health_monitor_cc_flink_spark.operators.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    framed = lz4_frame_compress(b"payload " * 400, block_checksums=True)
    with pytest.raises(ValueError):
        lz4_frame_decompress(framed[: len(framed) - 10])
    # truncations at every tail offset must raise ValueError, never
    # struct.error / IndexError
    for cut in range(1, 24):
        try:
            lz4_frame_decompress(framed[: len(framed) - cut])
        except ValueError:
            pass
