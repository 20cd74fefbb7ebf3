"""AIFF (Audio Interchange File Format) encode + decode, pure
numpy/stdlib — the BIG-ENDIAN legacy audio container next to WAV in
real audio corpora.  Implemented from the PUBLIC AIFF-1.3 (Apple,
1989) IFF layout:

* FORM/AIFF container with even-padded chunks;
* COMM chunk: channels, frame count, sample size, and the format's
  famous 80-bit IEEE 754 EXTENDED float sample rate (1 sign bit,
  15-bit exponent biased 16383, 64-bit mantissa with an explicit
  integer bit) — parsed and written exactly for integer rates;
* SSND chunk: offset/blockSize prefix then big-endian PCM samples.

Malformed input raises ``ValueError``; declared sizes are bounded.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SAMPLES = 1 << 26


def f80_encode(rate: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE extended float bytes."""
    if rate <= 0:
        raise ValueError("sample rate must be positive")
    bits = rate.bit_length()
    exponent = 16383 + bits - 1
    mantissa = rate << (64 - bits)  # explicit integer bit at the top
    return struct.pack(">HQ", exponent, mantissa)


def f80_decode(b: bytes) -> float:
    """80-bit IEEE extended float bytes -> float (exact for the
    integer rates audio files carry)."""
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    exponent, mantissa = struct.unpack(">HQ", b)
    sign = -1.0 if exponent & 0x8000 else 1.0
    exponent &= 0x7FFF
    if exponent == 0 and mantissa == 0:
        return 0.0
    if exponent == 0x7FFF:
        raise ValueError("non-finite sample rate")
    return sign * mantissa * 2.0 ** (exponent - 16383 - 63)


def encode_aiff(samples, rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> complete AIFF bytes."""
    a = np.asarray(samples, dtype=">i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    comm = struct.pack(">hLh", ch, n, 16) + f80_encode(rate)
    ssnd = struct.pack(">LL", 0, 0) + a.tobytes()
    out = bytearray()
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        out += cid + struct.pack(">L", len(body)) + body
        if len(body) % 2:
            out += b"\x00"  # IFF even padding
    return b"FORM" + struct.pack(">L", 4 + len(out)) + b"AIFF" + bytes(out)


def decode_aiff(payload: bytes):
    """AIFF bytes -> (samples int16 (n, ch), rate int, bit_depth).
    16-bit PCM only (the overwhelmingly common depth); other depths
    raise ``NotImplementedError``."""
    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"FORM":
        raise ValueError("not an AIFF: missing FORM")
    (form_size,) = struct.unpack(">L", p[4:8])
    if p[8:12] != b"AIFF":
        raise ValueError("not an AIFF: wrong form type")
    if form_size + 8 > len(p):
        raise ValueError("FORM size exceeds payload")
    comm = ssnd = None
    i = 12
    end = 8 + form_size
    while i + 8 <= end:
        cid = p[i : i + 4]
        (size,) = struct.unpack(">L", p[i + 4 : i + 8])
        body_end = i + 8 + size
        if body_end > end:
            raise ValueError(f"truncated {cid!r} chunk")
        body = p[i + 8 : body_end]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        i = body_end + (size & 1)  # skip the even-padding byte
    if comm is None or ssnd is None:
        raise ValueError("missing COMM or SSND chunk")
    if len(comm) < 18:
        raise ValueError("truncated COMM chunk")
    ch, n_frames, bit_depth = struct.unpack(">hLh", comm[:8])
    rate_f = f80_decode(comm[8:18])
    rate = int(round(rate_f))
    if ch <= 0 or n_frames < 0:
        raise ValueError("invalid COMM fields")
    if bit_depth != 16:
        raise NotImplementedError(f"{bit_depth}-bit AIFF not supported")
    if n_frames * ch > MAX_SAMPLES:
        raise ValueError("declared frame count exceeds decoder limit")
    if len(ssnd) < 8:
        raise ValueError("truncated SSND chunk")
    offset, _block = struct.unpack(">LL", ssnd[:8])
    data = ssnd[8 + offset :]
    need = n_frames * ch * 2
    if len(data) < need:
        raise ValueError("SSND data shorter than declared frames")
    a = np.frombuffer(data[:need], dtype=">i2").reshape(n_frames, ch)
    return a.astype(np.int16), rate, bit_depth
