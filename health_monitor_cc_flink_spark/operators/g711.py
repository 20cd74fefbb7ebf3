"""G.711 companded audio (mu-law / A-law) in WAV containers, pure numpy.

Telephony corpora (call-center audio, voicemail datasets) ship as WAV
files with format tag 7 (mu-law) or 6 (A-law) — 8 bits per sample that
the stdlib ``wave`` module refuses to read (PCM only).  Implemented
from the PUBLIC ITU-T G.711 companding definitions:

* ``ulaw_decode`` / ``ulaw_encode`` — mu-255 segmented companding
  (BIAS 0x84, 8 segments, complemented on the wire).
* ``alaw_decode`` / ``alaw_encode`` — A-87.6 companding (0x55 XOR
  mask, segment 0 linear).
* ``encode_g711_wav`` / ``decode_g711_wav`` — minimal RIFF/WAVE
  framing with fmt tags 6/7 (hand-rolled: the stdlib writer is
  PCM-only), mono/stereo, malformed input raising ``ValueError``.

Both decode directions are exact integer table maps, so any
deterministic companded byte stream has a closed-form linear-sample
oracle (the decode formula is plain integer arithmetic — see the
registry query's SQL twin).
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # 132
_CLIP = 32635

#: Max samples a declared data chunk may carry (hostile-payload cap).
MAX_SAMPLES = 1 << 26


def ulaw_decode(u: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear samples (ITU-T G.711 mu-255)."""
    u = (~np.asarray(u, dtype=np.uint8)).astype(np.int64) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear samples -> mu-law bytes (exact CCITT reference
    arithmetic, byte-identical to sox/audioop: 14-bit domain via
    arithmetic >>2, so negative magnitudes round toward -inf)."""
    p = np.asarray(x, dtype=np.int64) >> 2
    mask = np.where(p < 0, 0x7F, 0xFF)
    p = np.where(p < 0, -p, p)
    p = np.minimum(p, 8159) + 33  # 14-bit clip + (BIAS >> 2)
    # segment: first s with p <= (0x3F << s)
    seg = np.clip(
        np.floor(np.log2(p)).astype(np.int64) - 5, 0, 8
    )
    uval = np.where(
        seg >= 8,
        0x7F,  # out of range: clamp to the top codeword
        (seg << 4) | ((p >> (seg + 1)) & 0x0F),
    )
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear samples (ITU-T G.711 A-87.6)."""
    a = (np.asarray(a, dtype=np.uint8).astype(np.int64)) ^ 0x55
    sign = a & 0x80
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear samples -> A-law bytes (exact CCITT reference
    arithmetic, byte-identical to sox/audioop: 13-bit domain via
    arithmetic >>3, negative magnitude as one's complement)."""
    p = np.asarray(x, dtype=np.int64) >> 3
    mask = np.where(p >= 0, 0xD5, 0x55)
    p = np.where(p >= 0, p, -p - 1)
    # segment: first s with p <= (0x1F << s); p == 0 -> segment 0
    seg = np.clip(
        np.floor(np.log2(np.maximum(p, 1))).astype(np.int64) - 4, 0, 8
    )
    aval = np.where(
        seg >= 8,
        0x7F,  # out of range: clamp to the top codeword
        (seg << 4) | np.where(seg < 2, (p >> 1) & 0x0F, (p >> seg) & 0x0F),
    )
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


_TAGS = {"ulaw": 7, "alaw": 6}


def encode_g711_wav(
    companded: np.ndarray, sample_rate: int = 8000, law: str = "ulaw",
    channels: int = 1,
) -> bytes:
    """Companded uint8 samples (already mu-/A-law bytes, interleaved if
    stereo) -> complete WAV bytes with fmt tag 7 (mu) or 6 (A)."""
    if law not in _TAGS:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    data = np.asarray(companded, dtype=np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", _TAGS[law], channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_g711_wav(payload: bytes):
    """G.711 WAV bytes -> (int16 samples (n,) mono or (n, ch),
    sample_rate, law).  Raises ``ValueError`` for malformed input and
    ``NotImplementedError`` for non-G.711 format tags (PCM belongs to
    the stdlib reader path)."""
    payload = bytes(payload)
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if i + 8 + size > len(payload):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = payload[i + 8 : i + 8 + size]
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt or data chunk")
    tag, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag not in (6, 7):
        raise NotImplementedError(
            f"format tag {tag} is not G.711 (use the PCM reader for tag 1)"
        )
    if bits != 8:
        raise ValueError("G.711 WAV must be 8 bits per sample")
    if channels < 1 or len(data) % channels:
        raise ValueError("data chunk does not divide into channels")
    if len(data) > MAX_SAMPLES:
        raise ValueError("declared sample count exceeds decoder limit")
    raw = np.frombuffer(data, dtype=np.uint8)
    lin = ulaw_decode(raw) if tag == 7 else alaw_decode(raw)
    if channels > 1:
        lin = lin.reshape(-1, channels)
    law = "ulaw" if tag == 7 else "alaw"
    return lin, sample_rate, law
