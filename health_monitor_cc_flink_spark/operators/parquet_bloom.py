"""Parquet split-block Bloom filters (SBBF) — read and write.

The parquet-format spec's BloomFilter.md defines the point-lookup
data-skipping structure modern writers attach per column chunk: a
SPLIT-BLOCK Bloom filter (Putze/Sanders/Singler cache-efficient
variant) over XXH64 hashes of the column's plain-encoded values,
stored as a thrift-compact ``BloomFilterHeader`` + raw bitset at
``ColumnMetaData.bloom_filter_offset`` (field 14, length field 15).

Construction (spec "Split block Bloom filters"):

* a filter is ``z`` 32-byte BLOCKS (eight 32-bit little-endian
  words); ``z`` is a power of two;
* hashing a value: XXH64(plain-encoded bytes, seed 0) — INT64/DOUBLE
  little-endian 8 bytes, BYTE_ARRAY/STRING the raw bytes (no length
  prefix);
* block selection: ``((h >> 32) * z) >> 32`` (fastrange over the top
  32 bits);
* in-block mask: for word ``i`` of 8, bit ``(x * SALT[i]) >> 27`` of
  that word, where ``x`` is the low 32 bits of the hash and SALT is
  the spec's eight odd constants — one bit per word, 8 bits total;
* insert ORs the mask in; a membership check ANDs it (no false
  negatives, ~0.5-1%% false positives at the spec's sizing).

The environment's pyarrow (16.1) and DuckDB (1.0) expose no Bloom
read/write API, so cross-engine validation is not available here;
correctness rests on the spec construction (the XXH64 underneath is
cross-validated against the public reference vectors in
tests/test_zstd.py) plus no-false-negative / FP-rate property tests.

Cites reference behavior: the managed Flink tables this engine
re-implements expose no storage internals at all
(flink_statements.tf provisions them fully opaque); the Bloom path
exists for the 100 TB point-lookup shape — skip a row group without
touching its pages.
"""

from __future__ import annotations

import struct

from .zstd import xxh64

#: the spec's eight odd SALT constants (BloomFilter.md)
SALT = (0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31)

MAX_BLOOM_BYTES = 1 << 24


def _plain_bytes(value, ptype: str) -> bytes:
    if ptype == "INT64":
        return struct.pack("<q", value)
    if ptype == "INT32":
        return struct.pack("<i", value)
    if ptype == "DOUBLE":
        # canonicalize signed zero: 0.0 == -0.0 in every predicate,
        # but their plain encodings differ — the writer dedups values
        # via a Python set (which collapses the pair arbitrarily), so
        # without this a file containing -0.0 could answer
        # check(-0.0) == False, a false negative that makes a
        # bloom-gated point lookup skip a matching row group
        # (ADVICE r13).  parquet-mr writes +0.0 for both for the
        # same reason.
        if value == 0.0:
            value = 0.0
        return struct.pack("<d", value)
    if ptype == "FLOAT":
        if value == 0.0:
            value = 0.0
        return struct.pack("<f", value)
    if ptype in ("BYTE_ARRAY", "STRING"):
        return value.encode("utf-8") if isinstance(value, str) \
            else bytes(value)
    raise ValueError(f"bloom hash for {ptype} unsupported")


def bloom_hash(value, ptype: str) -> int:
    """XXH64(plain-encoded value, seed 0) — the spec's hash input."""
    return xxh64(_plain_bytes(value, ptype))


class SplitBlockBloom:
    """One SBBF bitset: ``z`` 32-byte blocks as a flat list of
    8*z little-endian 32-bit words."""

    __slots__ = ("z", "words")

    def __init__(self, num_blocks: int,
                 words: list[int] | None = None):
        if num_blocks < 1 or num_blocks & (num_blocks - 1):
            raise ValueError("bloom block count must be a power "
                             "of two")
        self.z = num_blocks
        self.words = words if words is not None \
            else [0] * (8 * num_blocks)

    @classmethod
    def sized_for(cls, ndv: int) -> "SplitBlockBloom":
        """Spec sizing: ~10.5 bits/value hits ~1%% FP; round blocks
        up to a power of two."""
        bits = max(256, ndv * 21 // 2)
        z = 1
        while z * 256 < bits:
            z <<= 1
        return cls(z)

    def _block_and_mask(self, h: int) -> tuple[int, list[int]]:
        idx = ((h >> 32) * self.z) >> 32
        x = h & 0xFFFFFFFF
        mask = [1 << (((x * SALT[i]) & 0xFFFFFFFF) >> 27)
                for i in range(8)]
        return idx, mask

    def insert_hash(self, h: int) -> None:
        idx, mask = self._block_and_mask(h)
        base = 8 * idx
        for i in range(8):
            self.words[base + i] |= mask[i]

    def check_hash(self, h: int) -> bool:
        idx, mask = self._block_and_mask(h)
        base = 8 * idx
        return all(self.words[base + i] & mask[i] for i in range(8))

    def insert(self, value, ptype: str) -> None:
        self.insert_hash(bloom_hash(value, ptype))

    def check(self, value, ptype: str) -> bool:
        return self.check_hash(bloom_hash(value, ptype))

    def to_bytes(self) -> bytes:
        return struct.pack(f"<{len(self.words)}I", *self.words)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "SplitBlockBloom":
        if len(raw) % 32 or not raw:
            raise ValueError("bloom bitset not a whole block count")
        z = len(raw) // 32
        if z & (z - 1):
            raise ValueError("bloom block count must be a power "
                             "of two")
        words = list(struct.unpack(f"<{8 * z}I", raw))
        return cls(z, words)


def write_bloom_blob(bloom: SplitBlockBloom) -> bytes:
    """BloomFilterHeader (thrift compact: 1 numBytes, 2 algorithm
    union {1: SplitBlock}, 3 hash union {1: XxHash}, 4 compression
    union {1: Uncompressed}) + raw bitset."""
    from .parquet_write import _W

    raw = bloom.to_bytes()
    w = _W()
    w.begin_struct()
    w.i32(1, len(raw))
    for fid in (2, 3, 4):  # unions: one empty struct at field 1
        w.begin_struct(fid)
        w.begin_struct(1)
        w.end_struct()
        w.end_struct()
    w.end_struct()
    return bytes(w.out) + raw


def read_bloom_blob(data: bytes, offset: int) -> SplitBlockBloom:
    """Parse a BloomFilterHeader + bitset at ``offset`` (the
    ColumnMetaData.bloom_filter_offset target)."""
    from .parquet_meta import _Reader

    if not isinstance(offset, int) or not 0 <= offset < len(data):
        raise ValueError("bad bloom filter offset")
    r = _Reader(data)
    r.pos = offset
    hdr = r.struct()
    n = hdr.get(1)
    if not isinstance(n, int) or n <= 0 or n > MAX_BLOOM_BYTES:
        raise ValueError("bad bloom numBytes")
    if not isinstance(hdr.get(2), dict) or 1 not in hdr[2]:
        raise ValueError("bloom algorithm is not split-block")
    if not isinstance(hdr.get(3), dict) or 1 not in hdr[3]:
        raise ValueError("bloom hash is not xxhash")
    raw = data[r.pos:r.pos + n]
    if len(raw) != n:
        raise ValueError("bloom bitset truncated")
    return SplitBlockBloom.from_bytes(raw)
