"""Sun/NeXT AU (.au / .snd) audio container.

The legacy speech-corpus container (TIMIT-era distributions, telephony
captures) — a 24-byte big-endian header from the PUBLIC Sun audio
file format: magic ``.snd`` (0x2E736E64), data offset, data size
(0xFFFFFFFF = unknown, read to EOF), encoding, sample rate, channels,
then an optional annotation between header and data.

Supported encodings (the lossless/companded set; the repo's G.711
mu-law expansion does the companding math, byte-pinned against the
CCITT reference elsewhere):

* 1 — 8-bit ITU-T mu-law
* 2 — 8-bit signed linear PCM
* 3 — 16-bit signed big-endian linear PCM

Anything else raises, flagging the row.  ``build_au`` is the
deterministic synth/oracle vehicle.
"""

from __future__ import annotations

import struct

import numpy as np

from .g711 import ulaw_decode

MAGIC = 0x2E736E64
UNKNOWN_SIZE = 0xFFFFFFFF
MAX_DATA_BYTES = 1 << 26

ENCODING_NAMES = {1: "ulaw", 2: "pcm8", 3: "pcm16"}


def build_au(*, encoding: int, rate: int, channels: int,
             data: bytes, annotation: bytes = b"",
             unknown_size: bool = False) -> bytes:
    """Deterministic AU writer; ``data`` is the already-encoded byte
    stream (mu-law bytes for 1, signed bytes for 2, BE int16 for 3)."""
    if encoding not in ENCODING_NAMES:
        raise ValueError(f"unsupported AU encoding {encoding}")
    offset = 24 + len(annotation)
    size = UNKNOWN_SIZE if unknown_size else len(data)
    return (struct.pack(">IIIIII", MAGIC, offset, size, encoding,
                        rate, channels)
            + annotation + data)


def parse_au(payload: bytes) -> dict:
    """AU bytes -> {encoding, encoding_name, rate, channels,
    n_samples, samples} with samples decoded to linear int16-range
    numpy int32 (mu-law expanded via the repo's G.711 tables)."""
    if len(payload) < 24:
        raise ValueError("truncated AU header")
    magic, offset, size, encoding, rate, channels = struct.unpack_from(
        ">IIIIII", payload, 0)
    if magic != MAGIC:
        raise ValueError("bad AU magic")
    if offset < 24 or offset > len(payload):
        raise ValueError("AU data offset out of range")
    if encoding not in ENCODING_NAMES:
        raise ValueError(f"unsupported AU encoding {encoding}")
    if channels < 1 or channels > 16:
        raise ValueError("AU channel count out of range")
    data = payload[offset:]
    if size != UNKNOWN_SIZE:
        if size > len(data):
            raise ValueError("AU data size overruns file")
        data = data[:size]
    if len(data) > MAX_DATA_BYTES:
        raise ValueError("AU data cap exceeded")
    if encoding == 1:
        samples = ulaw_decode(
            np.frombuffer(data, dtype=np.uint8)).astype(np.int32)
    elif encoding == 2:
        samples = np.frombuffer(data, dtype=np.int8).astype(np.int32)
    else:
        if len(data) % 2:
            raise ValueError("odd byte count for 16-bit AU data")
        samples = np.frombuffer(data, dtype=">i2").astype(np.int32)
    if channels and len(samples) % channels:
        raise ValueError("AU sample count not divisible by channels")
    return {
        "encoding": encoding,
        "encoding_name": ENCODING_NAMES[encoding],
        "rate": rate,
        "channels": channels,
        "n_samples": len(samples),
        "samples": samples,
    }
