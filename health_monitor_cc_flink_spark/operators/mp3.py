"""MP3 container metadata (ID3v2 tags + MPEG audio frame walk), pure
Python/numpy — audio-corpus METADATA harvesting without audio decode.

Real audio pipelines triage MP3 corpora by tag + header metadata
(title/artist, bitrate, sample rate, duration) long before any PCM is
needed; full MPEG audio decode is a polyphase/huffman DSP stack that
stays honestly out of scope (like H.264 on the video side).
Implemented from the PUBLIC ID3v2.3/2.4 informal standards and the
MPEG-1/2 audio frame header layout:

* ``parse_id3v2`` — tag header with syncsafe sizes, v2.3 (plain) and
  v2.4 (syncsafe) frame sizes, text frames (encoding byte 0/3 =
  latin-1/utf-8), unknown frames skipped.
* ``walk_mpeg_frames`` — frame-sync scan: version/layer validation,
  bitrate + sample-rate table lookup, padding, per-frame byte length
  (Layer III: 144*bitrate/samplerate + padding; Layer I:
  (12*bitrate/samplerate + padding)*4), CBR duration estimate.
* ``encode_mp3_stub`` — writes a structurally-valid MP3: ID3v2.3 tag
  (TIT2/TPE1) followed by n CBR MPEG-1 Layer III frames with zeroed
  payloads (valid headers, silent/garbage audio) — the test/oracle
  vehicle, exactly like the other codecs' synth paths.

Malformed input raises ``ValueError`` (never IndexError).
"""

from __future__ import annotations

#: kbit/s by bitrate index (index 0 free, 15 bad) — one table per
#: (MPEG version, layer) class from the public frame-header spec.
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320, -1]
_BITRATES_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320, 384, -1]
_BITRATES_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
                   352, 384, 416, 448, -1]
_BITRATES_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                   192, 224, 256, -1]
#: MPEG-2/2.5 Layers II and III share one table.
_BITRATES_V2_L23 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                    144, 160, -1]
_SAMPLE_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
                 0: [11025, 12000, 8000]}  # version bits -> rates

#: Cap on frames walked (hostile streams flag, don't spin).
MAX_FRAMES = 1 << 20


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("invalid syncsafe integer")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _syncsafe_bytes(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("syncsafe overflow")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def parse_id3v2(payload: bytes):
    """Leading ID3v2 tag -> (dict of text frames {id: str}, tag_end
    offset).  Returns ({}, 0) when no tag is present; malformed tags
    raise ``ValueError``."""
    payload = bytes(payload)
    if payload[:3] != b"ID3":
        return {}, 0
    if len(payload) < 10:
        raise ValueError("truncated ID3v2 header")
    ver = payload[3]
    if ver not in (3, 4):
        raise ValueError(f"unsupported ID3v2.{ver}")
    flags = payload[5]
    if flags & 0x40:
        raise ValueError("extended ID3v2 header not supported")
    size = _syncsafe(payload[6:10])
    end = 10 + size
    if end > len(payload):
        raise ValueError("ID3v2 tag exceeds payload")
    frames: dict[str, str] = {}
    i = 10
    while i + 10 <= end:
        fid = payload[i : i + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(0x30 <= c <= 0x5A for c in fid):
            raise ValueError("invalid ID3v2 frame id")
        raw = payload[i + 4 : i + 8]
        fsize = _syncsafe(raw) if ver == 4 else int.from_bytes(raw, "big")
        i += 10
        if i + fsize > end:
            raise ValueError("ID3v2 frame exceeds tag")
        data = payload[i : i + fsize]
        i += fsize
        if fid[0:1] == b"T" and fsize >= 1:
            enc = data[0]
            body = data[1:].split(b"\x00")[0]
            if enc == 0:
                frames[fid.decode("ascii")] = body.decode("latin-1")
            elif enc == 3:
                frames[fid.decode("ascii")] = body.decode("utf-8")
            # UTF-16 variants (1/2) skipped: not emitted by our synth,
            # and silently skipping beats misdecoding
    return frames, end


def walk_mpeg_frames(payload: bytes, offset: int = 0):
    """Scan MPEG audio frames from ``offset`` -> (n_frames,
    bitrate_kbps of the first frame, sample_rate, total_audio_bytes,
    duration_ms under CBR).  Trailing non-frame bytes (e.g. an ID3v1
    'TAG' block) stop the walk; a stream with no valid frame raises."""
    payload = bytes(payload)
    i = offset
    n = 0
    first = None
    while i + 4 <= len(payload):
        if n > MAX_FRAMES:
            raise ValueError("frame count exceeds walker limit")
        h = int.from_bytes(payload[i : i + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version == 1 or layer == 0:
            raise ValueError("reserved MPEG version/layer")
        bidx = (h >> 12) & 0xF
        sidx = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        if sidx == 3:
            raise ValueError("reserved sample-rate index")
        sample_rate = _SAMPLE_RATES[version][sidx]
        if layer == 3:  # Layer I
            table = _BITRATES_V1_L1 if version == 3 else _BITRATES_V2_L1
        elif layer == 2:  # Layer II
            table = _BITRATES_V1_L2 if version == 3 else _BITRATES_V2_L23
        elif version == 3:  # Layer III, MPEG-1
            table = _BITRATES_V1_L3
        else:  # Layer III, MPEG-2/2.5
            table = _BITRATES_V2_L23
        kbps = table[bidx]
        if kbps <= 0:
            raise ValueError("free-form/bad bitrate not supported")
        if layer == 3:
            flen = (12 * kbps * 1000 // sample_rate + pad) * 4
            samples = 384
        else:
            # Layer II: always 1152 samples; Layer III: 1152 samples
            # MPEG-1, 576 MPEG-2/2.5
            samples = 1152 if (layer == 2 or version == 3) else 576
            flen = samples // 8 * kbps * 1000 // sample_rate + pad
        if i + flen > len(payload):
            raise ValueError("truncated MPEG frame")
        if first is None:
            first = (kbps, sample_rate, samples)
        n += 1
        i += flen
    if first is None:
        raise ValueError("no MPEG frame at stream start")
    kbps, sample_rate, samples = first
    duration_ms = n * samples * 1000 // sample_rate
    return n, kbps, sample_rate, i - offset, duration_ms


def mp3_metadata(payload: bytes) -> dict:
    """Full triage: ID3v2 text frames + frame-walk stats."""
    tags, end = parse_id3v2(payload)
    n, kbps, sr, audio_bytes, dur = walk_mpeg_frames(payload, end)
    return {
        "title": tags.get("TIT2"),
        "artist": tags.get("TPE1"),
        "n_frames": n,
        "bitrate_kbps": kbps,
        "sample_rate": sr,
        "audio_bytes": audio_bytes,
        "duration_ms": dur,
    }


def encode_mp3_stub(
    title: str,
    artist: str,
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
) -> bytes:
    """Structurally-valid MP3 bytes: ID3v2.3 tag with TIT2/TPE1, then
    ``n_frames`` CBR MPEG-1 Layer III frames with zeroed payloads."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    b_idx = _BITRATES_V1_L3.index(bitrate_kbps)

    def text_frame(fid: bytes, text: str) -> bytes:
        data = b"\x00" + text.encode("latin-1")
        return fid + len(data).to_bytes(4, "big") + b"\x00\x00" + data

    body = text_frame(b"TIT2", title) + text_frame(b"TPE1", artist)
    tag = b"ID3\x03\x00\x00" + _syncsafe_bytes(len(body)) + body
    # header: sync, MPEG-1 (11), Layer III (01), no CRC (1), bitrate,
    # sample rate, no padding, mono channel mode (11)
    h = (
        (0x7FF << 21) | (0x3 << 19) | (0x1 << 17) | (1 << 16)
        | (b_idx << 12) | (sr_idx << 10) | (0x3 << 6)
    )
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    frame = h.to_bytes(4, "big") + b"\x00" * (flen - 4)
    return tag + frame * n_frames


#: ID3v1 genre names we emit/expect (indices into the public ID3v1
#: genre list; only the handful the synth cycles — the full 192-entry
#: Winamp extension list adds nothing to the parse logic under test).
ID3V1_GENRES = {0: "Blues", 1: "Classic Rock", 2: "Country",
                8: "Jazz", 13: "Pop", 17: "Rock", 255: None}


def _id3v1_field(raw: bytes) -> str:
    """30-byte fixed field -> string: NUL- or space-padded per the
    de-facto ID3v1 convention."""
    return raw.split(b"\x00")[0].decode("latin-1").rstrip(" ")


def build_id3v1(*, title: str, artist: str, album: str, year: str,
                comment: str, track: int, genre: int) -> bytes:
    """128-byte ID3v1.1 trailer (TAG + 30/30/30-byte text fields +
    4-byte year + 28-byte comment + NUL + track + genre)."""
    def f30(s: str) -> bytes:
        raw = s.encode("latin-1")[:30]
        return raw + b"\x00" * (30 - len(raw))

    cm = comment.encode("latin-1")[:28]
    return (b"TAG" + f30(title) + f30(artist) + f30(album)
            + year.encode("latin-1")[:4].ljust(4, b"\x00")
            + cm + b"\x00" * (28 - len(cm))
            + b"\x00" + bytes([track & 0xFF, genre & 0xFF]))


def parse_id3v1(payload: bytes) -> dict | None:
    """Last-128-bytes ID3v1(.1) trailer -> dict, or None if absent.
    The v1.1 track convention applies when comment byte 28 is NUL and
    byte 29 is nonzero."""
    if len(payload) < 128:
        return None
    tag = payload[-128:]
    if tag[:3] != b"TAG":
        return None
    comment_raw = tag[97:127]
    track = None
    if comment_raw[28] == 0 and comment_raw[29] != 0:
        track = comment_raw[29]
        comment_raw = comment_raw[:28]
    return {
        "title": _id3v1_field(tag[3:33]),
        "artist": _id3v1_field(tag[33:63]),
        "album": _id3v1_field(tag[63:93]),
        "year": tag[93:97].split(b"\x00")[0].decode("latin-1"),
        "comment": _id3v1_field(comment_raw),
        "track": track,
        "genre_id": tag[127],
        "genre": ID3V1_GENRES.get(tag[127]),
    }
