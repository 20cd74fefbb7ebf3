"""EBML / Matroska (MKV, WebM) structure walk + build.

The web-video half of a multimodal corpus ships as WebM/MKV; like the
MP4 walk this extracts container METADATA — doctype, timestamp scale,
duration, track layout, codec IDs, dimensions, block census — from
the PUBLIC EBML (RFC 8794) and Matroska specs, from scratch:

* VINT coding — the length-marker leading-1 scheme for element SIZES
  (marker stripped) and element IDs (read as the raw marker-included
  bytes, per RFC 8794 §5);
* the unknown-size escape (all-1 VINT) accepted for Segment only;
* master elements recursed structurally, integer / float (4- and
  8-byte IEEE 754) / string leaf payloads;
* SimpleBlock framing (track VINT + 16-bit relative timestamp +
  flags byte + opaque payload — codec bitstreams stay opaque per the
  no-invented-tables policy).

``build_mkv`` is the deterministic synth/oracle vehicle.  Hostile
input raises ``ValueError``; the walk is depth/element capped and
every declared size is bounds-checked.

Reference parity note: beyond-reference corpus surface (the reference
has no video path), same tier as the MP4/WARC/PDF walks.
"""

from __future__ import annotations

import struct

MAX_ELEMENTS = 1 << 14
MAX_DEPTH = 8

# -- element IDs (marker-included raw form, as they appear on disk) --
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TITLE = 0x7BA9
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQ = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
CLUSTER_TS = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTERS = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO,
            AUDIO, CLUSTER}


def read_vint(data: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int]:
    """Decode one VINT at ``pos`` -> (value, new_pos).  Element IDs
    keep the length marker (``keep_marker=True``); sizes strip it.
    An all-1s size VINT means 'unknown size' and returns -1."""
    if pos >= len(data):
        raise ValueError("vint past end")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid vint leading byte 0")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("truncated vint")
    if keep_marker:
        v = 0
        for i in range(length):
            v = (v << 8) | data[pos + i]
        return v, pos + length
    v = first & (0xFF >> length)
    all_ones = v == (0xFF >> length)
    for i in range(1, length):
        b = data[pos + i]
        v = (v << 8) | b
        all_ones = all_ones and b == 0xFF
    return (-1 if all_ones else v), pos + length


def _uint(payload: bytes) -> int:
    v = 0
    for b in payload:
        v = (v << 8) | b
    return v


def _float(payload: bytes) -> float:
    if len(payload) == 4:
        return struct.unpack(">f", payload)[0]
    if len(payload) == 8:
        return struct.unpack(">d", payload)[0]
    raise ValueError(f"bad EBML float width {len(payload)}")


class _Walk:
    def __init__(self, data: bytes):
        self.data = data
        self.n = 0
        self.doctype: str | None = None
        self.timestamp_scale = 1_000_000
        self.duration: float | None = None
        self.title: str | None = None
        self.tracks: list[dict] = []
        self._trk: dict | None = None
        self.n_clusters = 0
        self.n_blocks = 0
        self.block_payloads: list[bytes] = []

    def walk(self, start: int, end: int, depth: int) -> None:
        if depth > MAX_DEPTH:
            raise ValueError("ebml nesting too deep")
        pos = start
        while pos < end:
            self.n += 1
            if self.n > MAX_ELEMENTS:
                raise ValueError("ebml element cap exceeded")
            eid, pos = read_vint(self.data, pos, keep_marker=True)
            size, pos = read_vint(self.data, pos, keep_marker=False)
            if size == -1:
                if eid != SEGMENT:
                    raise ValueError("unknown-size on non-Segment element")
                size = end - pos
            if pos + size > end:
                raise ValueError(f"ebml element 0x{eid:X} overruns parent")
            body = self.data[pos:pos + size]
            if eid in _MASTERS:
                if eid == TRACK_ENTRY:
                    self._trk = {"type": None, "codec": None}
                    self.tracks.append(self._trk)
                elif eid == CLUSTER:
                    self.n_clusters += 1
                self.walk(pos, pos + size, depth + 1)
                if eid == TRACK_ENTRY:
                    self._trk = None
            else:
                self._leaf(eid, body)
            pos += size

    def _leaf(self, eid: int, body: bytes) -> None:
        t = self._trk
        if eid == DOCTYPE:
            self.doctype = body.decode("utf-8")
        elif eid == TIMESTAMP_SCALE:
            self.timestamp_scale = _uint(body)
        elif eid == DURATION:
            self.duration = _float(body)
        elif eid == TITLE:
            self.title = body.decode("utf-8")
        elif eid == TRACK_TYPE and t is not None:
            t["type"] = _uint(body)
        elif eid == CODEC_ID and t is not None:
            t["codec"] = body.decode("utf-8")
        elif eid == TRACK_NUMBER and t is not None:
            t["number"] = _uint(body)
        elif eid == PIXEL_WIDTH and t is not None:
            t["width"] = _uint(body)
        elif eid == PIXEL_HEIGHT and t is not None:
            t["height"] = _uint(body)
        elif eid == SAMPLING_FREQ and t is not None:
            t["samplerate"] = _float(body)
        elif eid == CHANNELS and t is not None:
            t["channels"] = _uint(body)
        elif eid == SIMPLE_BLOCK:
            self.n_blocks += 1
            _, p = read_vint(body, 0, keep_marker=False)  # track number
            if len(body) < p + 3:
                raise ValueError("SimpleBlock header truncated")
            self.block_payloads.append(body[p + 3:])


def parse_mkv(data: bytes) -> dict:
    """Walk an EBML/Matroska file -> structural metadata dict with
    ``doctype, timestamp_scale, duration_ms, title, tracks,
    n_clusters, n_blocks, payload`` (concatenated SimpleBlock
    payload bytes, codec-opaque)."""
    if data[:4] != EBML_HEADER.to_bytes(4, "big"):
        raise ValueError("not an EBML file")
    w = _Walk(data)
    w.walk(0, len(data), 0)
    if w.doctype is None:
        raise ValueError("missing EBML DocType")
    dur_ms = None
    if w.duration is not None:
        dur_ms = int(round(w.duration * w.timestamp_scale / 1_000_000))
    return {
        "doctype": w.doctype,
        "timestamp_scale": w.timestamp_scale,
        "duration_ms": dur_ms,
        "title": w.title,
        "tracks": w.tracks,
        "n_clusters": w.n_clusters,
        "n_blocks": w.n_blocks,
        "payload": b"".join(w.block_payloads),
    }


# -- deterministic writer ---------------------------------------------

def encode_vint_size(value: int) -> bytes:
    """Encode a SIZE as the shortest VINT."""
    if value < 0:
        raise ValueError("negative size")
    for length in range(1, 9):
        # top value is reserved for 'unknown'
        if value < (1 << (7 * length)) - 1:
            v = value | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("size too large for vint")


def _elem(eid: int, payload: bytes) -> bytes:
    return (eid.to_bytes((eid.bit_length() + 7) // 8, "big")
            + encode_vint_size(len(payload)) + payload)


def _u(eid: int, value: int) -> bytes:
    n = max((value.bit_length() + 7) // 8, 1)
    return _elem(eid, value.to_bytes(n, "big"))


def _f(eid: int, value: float) -> bytes:
    return _elem(eid, struct.pack(">d", value))


def _s(eid: int, value: str) -> bytes:
    return _elem(eid, value.encode("utf-8"))


def build_mkv(*, doctype: str, duration_ms: int, title: str,
              video_codec: str, width: int, height: int,
              audio: bool, audio_codec: str = "A_OPUS",
              audio_rate: float = 48000.0, audio_channels: int = 2,
              payload: bytes = b"", block_bytes: int = 32,
              blocks_per_cluster: int = 4) -> bytes:
    """Deterministic Matroska writer: EBML header, Info, one video
    TrackEntry (+ optional audio), and the payload split into
    ``block_bytes`` SimpleBlocks grouped ``blocks_per_cluster`` per
    Cluster — codec payloads opaque."""
    header = _elem(EBML_HEADER, b"".join((
        _u(0x4286, 1), _u(0x42F7, 1), _u(0x42F2, 4), _u(0x42F3, 8),
        _s(DOCTYPE, doctype), _u(0x4287, 4), _u(0x4285, 2),
    )))
    info = _elem(INFO, b"".join((
        _u(TIMESTAMP_SCALE, 1_000_000),
        _f(DURATION, float(duration_ms)),
        _s(TITLE, title),
        _s(0x4D80, "health-monitor-synth"),   # MuxingApp
        _s(0x5741, "health-monitor-synth"),   # WritingApp
    )))
    video = _elem(TRACK_ENTRY, b"".join((
        _u(TRACK_NUMBER, 1), _u(TRACK_UID, 1), _u(TRACK_TYPE, 1),
        _s(CODEC_ID, video_codec),
        _elem(VIDEO, _u(PIXEL_WIDTH, width) + _u(PIXEL_HEIGHT, height)),
    )))
    tracks = video
    if audio:
        tracks += _elem(TRACK_ENTRY, b"".join((
            _u(TRACK_NUMBER, 2), _u(TRACK_UID, 2), _u(TRACK_TYPE, 2),
            _s(CODEC_ID, audio_codec),
            _elem(AUDIO, _f(SAMPLING_FREQ, audio_rate)
                  + _u(CHANNELS, audio_channels)),
        )))
    blocks = [payload[i:i + block_bytes]
              for i in range(0, len(payload), block_bytes)] or [b""]
    clusters = b""
    for c0 in range(0, len(blocks), blocks_per_cluster):
        body = _u(CLUSTER_TS, c0 * 40)
        for j, blk in enumerate(blocks[c0:c0 + blocks_per_cluster]):
            sb = (encode_vint_size(1)          # track 1 as VINT
                  + struct.pack(">hB", j * 40, 0x80)  # rel ts, keyframe
                  + blk)
            body += _elem(SIMPLE_BLOCK, sb)
        clusters += _elem(CLUSTER, body)
    segment = _elem(SEGMENT, info + _elem(TRACKS, tracks) + clusters)
    return header + segment
