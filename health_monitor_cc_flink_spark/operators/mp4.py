"""ISO Base Media File Format (MP4) box-structure walk + build.

Video corpora overwhelmingly ship as MP4/MOV containers; a training
pipeline needs the container METADATA (duration, track layout, codec
fourcc, dimensions, sample counts) long before — and far more often
than — any frame decode.  This implements the PUBLIC ISO/IEC
14496-12 box grammar from scratch (no mp4 library exists in this
environment anyway): 32-bit ``size`` + fourcc ``type`` headers, the
``size==1`` 64-bit largesize escape, ``size==0`` box-to-EOF, pure
container boxes recursed structurally, and the FullBox version/flags
prefix for the leaf boxes we read:

* ``ftyp``  — major/minor brand + compatible brands
* ``mvhd``  — movie timescale + duration (version 0 and 1)
* ``tkhd``  — track id, 16.16 fixed-point presentation width/height
* ``mdhd``  — media timescale + duration
* ``hdlr``  — handler type ('vide' / 'soun' / ...)
* ``stsd``  — sample-description entry fourcc; VisualSampleEntry
  width/height and AudioSampleEntry channelcount / 16.16 samplerate
* ``stsz``  — sample_size / sample_count table header
* ``stts``  — decoding time-to-sample (total sample duration)
* ``mdat``  — payload bytes (hashed, never decoded — codec bitstream
  decode is out of scope by the repo's no-invented-tables policy)

``build_mp4`` is the deterministic synth/oracle vehicle and writes
both the fast-start (moov before mdat) and streaming (mdat first)
layouts real files exhibit.  Codec PAYLOADS are opaque: ``avc1`` /
``mp4a`` sample entries carry the documented header fields only, no
invented H.264/AAC bitstreams.

Hostile input raises ``ValueError``; the walk is depth- and
box-count-capped and every size is bounds-checked so crafted files
flag their row instead of looping.

Reference parity note: the reference repo has no video path at all —
this is beyond-reference corpus surface, same tier as WARC/PDF.
"""

from __future__ import annotations

import struct

MAX_BOXES = 1 << 12
MAX_DEPTH = 8

# Pure container boxes: no payload of their own, children start at
# offset 0 of the body (ISO 14496-12 §4.2 Box hierarchy).
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts",
    b"udta", b"mvex", b"moof", b"traf",
}


def _fixed16_16(v: int) -> float:
    return v / 65536.0


class _Walk:
    """Bounded recursive box walk accumulating the leaf fields."""

    def __init__(self, data: bytes):
        self.data = data
        self.n_boxes = 0
        self.ftyp: dict | None = None
        self.mvhd: dict | None = None
        self.tracks: list[dict] = []
        self._cur_trak: dict | None = None
        self.mdat_spans: list[tuple[int, int]] = []

    def run(self) -> None:
        self._walk(0, len(self.data), 0)

    def _walk(self, start: int, end: int, depth: int) -> None:
        if depth > MAX_DEPTH:
            raise ValueError("mp4 box nesting too deep")
        pos = start
        while pos < end:
            if end - pos < 8:
                raise ValueError("truncated mp4 box header")
            self.n_boxes += 1
            if self.n_boxes > MAX_BOXES:
                raise ValueError("mp4 box count cap exceeded")
            size, btype = struct.unpack_from(">I4s", self.data, pos)
            hdr = 8
            if size == 1:
                if end - pos < 16:
                    raise ValueError("truncated largesize box")
                size = struct.unpack_from(">Q", self.data, pos + 8)[0]
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(f"mp4 box {btype!r} overruns container")
            body0, body1 = pos + hdr, pos + size
            if btype in _CONTAINERS:
                if btype == b"trak":
                    trk: dict = {"handler": None, "stsd": [],
                                 "n_samples": 0, "stts_dur": 0}
                    self.tracks.append(trk)
                    prev, self._cur_trak = self._cur_trak, trk
                    self._walk(body0, body1, depth + 1)
                    self._cur_trak = prev
                else:
                    self._walk(body0, body1, depth + 1)
            else:
                self._leaf(btype, body0, body1)
            pos += size

    # -- leaf boxes ---------------------------------------------------
    def _full(self, p0: int, p1: int) -> tuple[int, int]:
        if p1 - p0 < 4:
            raise ValueError("truncated FullBox")
        version = self.data[p0]
        return version, p0 + 4

    def _leaf(self, btype: bytes, p0: int, p1: int) -> None:
        d = self.data
        if btype == b"ftyp":
            if p1 - p0 < 8 or (p1 - p0) % 4:
                raise ValueError("bad ftyp")
            compat = [d[i:i + 4].decode("latin-1")
                      for i in range(p0 + 8, p1, 4)]
            self.ftyp = {
                "major": d[p0:p0 + 4].decode("latin-1"),
                "minor": struct.unpack_from(">I", d, p0 + 4)[0],
                "compatible": compat,
            }
        elif btype == b"mvhd":
            v, q = self._full(p0, p1)
            if v == 1:
                _, _, ts, dur = struct.unpack_from(">QQIQ", d, q)
            else:
                _, _, ts, dur = struct.unpack_from(">IIII", d, q)
            if ts == 0:
                raise ValueError("mvhd timescale 0")
            self.mvhd = {"timescale": ts, "duration": dur}
        elif btype == b"tkhd" and self._cur_trak is not None:
            v, q = self._full(p0, p1)
            # v0: ctime(4) mtime(4) track_id(4) rsvd(4) dur(4);
            # v1: 8/8/4/4/8 — then rsvd(8) layer(2) alt(2) vol(2)
            # rsvd(2) matrix(36) width(4) height(4)
            track_id = struct.unpack_from(
                ">I", d, q + (16 if v == 1 else 8))[0]
            tail = q + (32 if v == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
            w, h = struct.unpack_from(">II", d, tail)
            self._cur_trak["track_id"] = track_id
            self._cur_trak["width"] = _fixed16_16(w)
            self._cur_trak["height"] = _fixed16_16(h)
        elif btype == b"mdhd" and self._cur_trak is not None:
            v, q = self._full(p0, p1)
            if v == 1:
                _, _, ts, dur = struct.unpack_from(">QQIQ", d, q)
            else:
                _, _, ts, dur = struct.unpack_from(">IIII", d, q)
            if ts == 0:
                raise ValueError("mdhd timescale 0")
            self._cur_trak["media_timescale"] = ts
            self._cur_trak["media_duration"] = dur
        elif btype == b"hdlr" and self._cur_trak is not None:
            _, q = self._full(p0, p1)
            self._cur_trak["handler"] = d[q + 4:q + 8].decode("latin-1")
        elif btype == b"stsd" and self._cur_trak is not None:
            _, q = self._full(p0, p1)
            (count,) = struct.unpack_from(">I", d, q)
            pos = q + 4
            for _ in range(min(count, 32)):
                if p1 - pos < 8:
                    raise ValueError("truncated stsd entry")
                esize, efour = struct.unpack_from(">I4s", d, pos)
                if esize < 16 or pos + esize > p1:
                    raise ValueError("stsd entry overrun")
                entry = {"fourcc": efour.decode("latin-1")}
                hand = self._cur_trak.get("handler")
                body = pos + 8 + 6 + 2  # reserved(6) + data_ref_index(2)
                if hand == "vide" and esize >= 16 + 70:
                    # VisualSampleEntry: pre(16) w(2) h(2) ...
                    w, h = struct.unpack_from(">HH", d, body + 16)
                    entry["width"], entry["height"] = w, h
                elif hand == "soun" and esize >= 16 + 20:
                    # AudioSampleEntry: rsvd(8) ch(2) bits(2) pre(4)
                    # samplerate 16.16(4)
                    ch, bits = struct.unpack_from(">HH", d, body + 8)
                    (sr,) = struct.unpack_from(">I", d, body + 16)
                    entry["channels"] = ch
                    entry["sample_bits"] = bits
                    entry["samplerate"] = sr >> 16
                self._cur_trak["stsd"].append(entry)
                pos += esize
        elif btype == b"stsz" and self._cur_trak is not None:
            _, q = self._full(p0, p1)
            sample_size, count = struct.unpack_from(">II", d, q)
            if sample_size == 0 and p1 - (q + 8) < 4 * count:
                raise ValueError("stsz table truncated")
            self._cur_trak["n_samples"] = count
            if sample_size == 0:
                sizes = struct.unpack_from(f">{count}I", d, q + 8)
                self._cur_trak["sample_bytes"] = sum(sizes)
            else:
                self._cur_trak["sample_bytes"] = sample_size * count
        elif btype == b"stts" and self._cur_trak is not None:
            _, q = self._full(p0, p1)
            (count,) = struct.unpack_from(">I", d, q)
            if p1 - (q + 4) < 8 * count:
                raise ValueError("stts table truncated")
            total = 0
            for i in range(count):
                n, delta = struct.unpack_from(">II", d, q + 4 + 8 * i)
                total += n * delta
            self._cur_trak["stts_dur"] = total
        elif btype == b"mdat":
            self.mdat_spans.append((p0, p1))


def parse_mp4(data: bytes) -> dict:
    """Walk an ISO-BMFF file -> structural metadata dict.

    Returns ``{brand, minor, compatible, timescale, duration,
    duration_ms, tracks: [{handler, track_id, width, height,
    media_timescale, media_duration, stsd:[...], n_samples,
    sample_bytes, stts_dur}], mdat: bytes}``.
    """
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp)")
    w = _Walk(data)
    w.run()
    if w.ftyp is None or w.mvhd is None:
        raise ValueError("missing ftyp or mvhd")
    mdat = b"".join(data[a:b] for a, b in w.mdat_spans)
    ts, dur = w.mvhd["timescale"], w.mvhd["duration"]
    return {
        "brand": w.ftyp["major"],
        "minor": w.ftyp["minor"],
        "compatible": w.ftyp["compatible"],
        "timescale": ts,
        "duration": dur,
        "duration_ms": dur * 1000 // ts,
        "tracks": w.tracks,
        "mdat": mdat,
    }


# -- deterministic writer (synth/oracle vehicle) ----------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full_box(btype: bytes, version: int, flags: int,
              payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        head = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        head = struct.pack(">IIII", 0, 0, timescale, duration)
    tail = (
        struct.pack(">i", 0x00010000)      # rate 1.0
        + struct.pack(">h", 0x0100)        # volume 1.0
        + b"\x00" * 10                     # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24                     # pre_defined
        + struct.pack(">I", 0xFFFFFFFF)    # next_track_ID
    )
    return _full_box(b"mvhd", version, 0, head + tail)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _tkhd(track_id: int, duration: int, width: int, height: int) -> bytes:
    payload = (
        struct.pack(">IIII", 0, 0, track_id, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8                      # reserved[2]
        + struct.pack(">hhhh", 0, 0, 0x0100, 0)  # layer alt vol rsvd
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16)
    )
    return _full_box(b"tkhd", 0, 7, payload)  # flags: enabled|in_movie|preview


def _mdhd(timescale: int, duration: int) -> bytes:
    payload = (struct.pack(">IIII", 0, 0, timescale, duration)
               + struct.pack(">HH", 0x55C4, 0))  # language 'und'
    return _full_box(b"mdhd", 0, 0, payload)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    payload = (b"\x00" * 4 + handler + b"\x00" * 12
               + name + b"\x00")
    return _full_box(b"hdlr", 0, 0, payload)


def _visual_sample_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)        # reserved + dref idx
        + b"\x00" * 16                             # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                     # frame_count
        + b"\x00" * 32                             # compressorname
        + struct.pack(">Hh", 24, -1)               # depth, pre_defined
    )
    return _box(fourcc, body)


def _audio_sample_entry(fourcc: bytes, channels: int,
                        samplerate: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HH", channels, 16)
        + b"\x00" * 4
        + struct.pack(">I", samplerate << 16)
    )
    return _box(fourcc, body)


def _stbl(sample_entry: bytes, n_samples: int, delta: int,
          sample_size: int) -> bytes:
    stsd = _full_box(b"stsd", 0, 0,
                     struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0,
                     struct.pack(">III", 1, n_samples, delta))
    stsc = _full_box(b"stsc", 0, 0,
                     struct.pack(">IIII", 1, 1, max(n_samples, 1), 1))
    stsz = _full_box(b"stsz", 0, 0,
                     struct.pack(">II", sample_size, n_samples))
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(track_id: int, handler: bytes, name: bytes, timescale: int,
          duration: int, width: int, height: int, sample_entry: bytes,
          n_samples: int, delta: int, sample_size: int,
          header: bytes) -> bytes:
    minf = _box(b"minf",
                header
                + _box(b"dinf", _full_box(
                    b"dref", 0, 0,
                    struct.pack(">I", 1)
                    + _full_box(b"url ", 0, 1, b"")))
                + _stbl(sample_entry, n_samples, delta, sample_size))
    mdia = _box(b"mdia", _mdhd(timescale, duration)
                + _hdlr(handler, name) + minf)
    return _box(b"trak",
                _tkhd(track_id, duration, width, height) + mdia)


def build_mp4(*, brand: str, duration_ms: int, n_video_samples: int,
              width: int, height: int, audio: bool,
              audio_channels: int = 2, audio_rate: int = 44100,
              mdat: bytes = b"", fast_start: bool = True,
              mvhd_version: int = 0) -> bytes:
    """Deterministic ISO-BMFF writer: one avc1 video track (header
    fields only, opaque payload) and optionally one mp4a audio track;
    ``fast_start`` places moov before mdat (progressive layout) vs
    after (as muxers write while recording)."""
    movie_ts = 1000
    vts = 600
    vdur = duration_ms * vts // 1000
    delta = max(vdur // max(n_video_samples, 1), 1)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    traks = _trak(
        1, b"vide", b"VideoHandler", vts, vdur, width, height,
        _visual_sample_entry(b"avc1", width, height),
        n_video_samples, delta, 0x100, vmhd,
    )
    if audio:
        adur = duration_ms * audio_rate // 1000
        smhd = _full_box(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        traks += _trak(
            2, b"soun", b"SoundHandler", audio_rate, adur, 0, 0,
            _audio_sample_entry(b"mp4a", audio_channels, audio_rate),
            max(adur // 1024, 1), 1024, 0x180, smhd,
        )
    moov = _box(b"moov",
                _mvhd(movie_ts, duration_ms * movie_ts // 1000,
                      mvhd_version) + traks)
    ftyp = _box(b"ftyp", brand.encode("latin-1")
                + struct.pack(">I", 0x200)
                + brand.encode("latin-1") + b"isom")
    mdat_box = _box(b"mdat", mdat)
    free = _box(b"free", b"\x00" * 8)
    if fast_start:
        return ftyp + moov + free + mdat_box
    return ftyp + free + mdat_box + moov
