"""Puffin files + Iceberg v3 deletion-vector blobs.

Puffin (PUBLIC spec, iceberg.apache.org/puffin-spec/) is Iceberg's
statistics/blob container: ``Magic  Blob*  Footer`` where the footer
is ``Magic  FooterPayload(JSON)  PayloadSize(4 LE)  Flags(4)  Magic``
and the payload lists each blob's {type, fields, snapshot-id,
sequence-number, offset, length, properties}.  Iceberg v3 stores
DELETION VECTORS as ``deletion-vector-v1`` blobs in Puffin files: the
delete manifest entry names the covered data file
(``referenced_data_file``) and the blob's position
(``content_offset`` / ``content_size_in_bytes``) so a scan reads the
DV directly — no footer round-trip on the hot path (the spec requires
readers to be able to locate the blob by offset alone).

The v3 DV blob layout is deliberately BYTE-COMPATIBLE with Delta
Lake's deletion vectors (the two specs converged on one format):

* 4-byte big-endian length of (magic + vector),
* the 4-byte magic (0x6439D3D1 little-endian — the spec's
  ``D1 D3 39 64`` byte sequence, the same value Delta's
  RoaringBitmapArray uses),
* the vector: 8-byte LE count of 32-bit roaring bitmaps, then each
  bitmap in the portable RoaringFormatSpec serialization, index i
  covering row positions [i<<32, (i+1)<<32),
* 4-byte big-endian CRC-32 of (magic + vector).

``operators/roaring.py`` (r13) already implements the bitmap array;
this module adds the Puffin container and the blob framing.  Hostile
input raises ``ValueError``.
"""

from __future__ import annotations

import json
import struct
import zlib

from .roaring import deserialize_bitmap_array, serialize_bitmap_array

MAGIC = b"PFA1"
#: footer flags: byte 0 bit 0 = footer payload is lz4-compressed
FLAG_FOOTER_COMPRESSED = 1

DELETION_VECTOR_V1 = "deletion-vector-v1"

MAX_BLOBS = 1 << 16


def serialize_dv_blob(positions: list[int]) -> bytes:
    """Sorted distinct row positions -> deletion-vector-v1 blob
    bytes (length + magic+vector + CRC, as framed above)."""
    data = serialize_bitmap_array(sorted(set(positions)))
    return (struct.pack(">I", len(data)) + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))


def read_dv_blob(blob: bytes) -> list[int]:
    """deletion-vector-v1 blob bytes -> sorted row positions, every
    frame field cross-checked."""
    if len(blob) < 8:
        raise ValueError("deletion vector blob truncated")
    (length,) = struct.unpack_from(">I", blob, 0)
    if 4 + length + 4 != len(blob):
        raise ValueError("deletion vector length mismatch")
    data = blob[4:4 + length]
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_bitmap_array(data)


def write_puffin(blobs: list[dict],
                 properties: dict | None = None) -> bytes:
    """[{data: bytes, type: str, properties: {...}, fields: [...],
    snapshot-id, sequence-number}] -> Puffin file bytes
    (uncompressed footer).  Returns the file; each input dict gains
    ``offset``/``length`` for manifest wiring."""
    if len(blobs) > MAX_BLOBS:
        raise ValueError("puffin blob cap exceeded")
    out = bytearray(MAGIC)
    meta = []
    for b in blobs:
        data = b["data"]
        b["offset"] = len(out)
        b["length"] = len(data)
        out += data
        meta.append({
            "type": b.get("type", DELETION_VECTOR_V1),
            "fields": list(b.get("fields") or []),
            "snapshot-id": b.get("snapshot-id", 0),
            "sequence-number": b.get("sequence-number", 0),
            "offset": b["offset"],
            "length": b["length"],
            "properties": dict(b.get("properties") or {}),
        })
    payload = json.dumps(
        {"blobs": meta, "properties": dict(properties or {})},
        sort_keys=True, separators=(",", ":")).encode("utf-8")
    out += MAGIC
    out += payload
    out += struct.pack("<I", len(payload))
    out += struct.pack("<I", 0)  # flags: uncompressed footer
    out += MAGIC
    return bytes(out)


def read_puffin(data: bytes) -> dict:
    """Puffin bytes -> {blobs: [metadata dicts], properties} with
    the structure fully validated (magics, footer framing, blob
    ranges inside the data section)."""
    if len(data) < 4 + 4 + 4 + 4 + 4 or data[:4] != MAGIC:
        raise ValueError("bad puffin header magic")
    if data[-4:] != MAGIC:
        raise ValueError("bad puffin trailer magic")
    (flags,) = struct.unpack_from("<I", data, len(data) - 8)
    if flags & FLAG_FOOTER_COMPRESSED:
        raise ValueError(
            "compressed puffin footer unsupported; refusing")
    if flags & ~0x1:
        raise ValueError(f"unknown puffin footer flags {flags:#x}")
    (psize,) = struct.unpack_from("<I", data, len(data) - 12)
    payload_end = len(data) - 12
    payload_start = payload_end - psize
    if payload_start < 8 \
            or data[payload_start - 4:payload_start] != MAGIC:
        raise ValueError("bad puffin footer magic")
    try:
        doc = json.loads(data[payload_start:payload_end])
    except ValueError as exc:
        raise ValueError("puffin footer json malformed") from exc
    blobs = doc.get("blobs")
    if not isinstance(blobs, list) or len(blobs) > MAX_BLOBS:
        raise ValueError("puffin footer blobs malformed")
    data_end = payload_start - 4
    for b in blobs:
        off, ln = b.get("offset"), b.get("length")
        if not isinstance(off, int) or not isinstance(ln, int) \
                or off < 4 or ln < 0 or off + ln > data_end:
            raise ValueError("puffin blob range out of bounds")
    return {"blobs": blobs,
            "properties": doc.get("properties") or {}}


def read_dv_at(data: bytes, offset: int, size: int) -> list[int]:
    """The SCAN-path read: pull a deletion-vector-v1 blob straight
    from ``[offset, offset+size)`` of a Puffin file — the spec
    guarantees the manifest's content_offset/content_size make the
    footer walk unnecessary."""
    if offset < 4 or size < 0 or offset + size > len(data):
        raise ValueError("deletion vector offset out of range")
    return read_dv_blob(data[offset:offset + size])
