"""Punycode (RFC 3492) + IDNA ASCII-compatible encoding for hostnames.

Web-scale crawls meet internationalized domain names immediately; the
frontier/SURT layer needs the ACE (``xn--``) form.  Implemented from
the PUBLIC RFC 3492 — the full bootstring algorithm, not a table:

* parameters base=36 tmin=1 tmax=26 skew=38 damp=700
  initial_bias=72 initial_n=128;
* the bias adaptation function (§6.1), generalized-variable-length
  integer insertion coding, and the basic/extended code-point split
  with the ``-`` delimiter;
* ``idna_encode`` lowercases and encodes each dot label to its
  ``xn--`` ACE form when non-ASCII (pure RFC 3492 transformation;
  the full IDNA2008 mapping/bidi rules are out of scope and the
  encoder rejects labels needing them — empty/overlong labels).

Cross-validated in tests against CPython's built-in ``punycode``
codec over both fixed vectors (RFC 3492 §7.1 samples) and random
unicode labels.  Malformed input raises ``ValueError``.
"""

from __future__ import annotations

_BASE = 36
_TMIN = 1
_TMAX = 26
_SKEW = 38
_DAMP = 700
_INITIAL_BIAS = 72
_INITIAL_N = 128
MAX_LABEL = 512


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit_char(d: int) -> str:
    return chr(d + 22 + 75 * (d < 26))  # 0..25 -> a..z, 26..35 -> 0..9


def _char_digit(c: str) -> int:
    o = ord(c)
    if 0x61 <= o <= 0x7A:  # a-z
        return o - 0x61
    if 0x41 <= o <= 0x5A:  # A-Z
        return o - 0x41
    if 0x30 <= o <= 0x39:  # 0-9
        return o - 0x30 + 26
    raise ValueError(f"invalid punycode digit {c!r}")


def punycode_encode(label: str) -> str:
    if len(label) > MAX_LABEL:
        raise ValueError("label too long")
    basic = [c for c in label if ord(c) < 0x80]
    out = list(basic)
    if basic:
        out.append("-")
    n = _INITIAL_N
    delta = 0
    bias = _INITIAL_BIAS
    h = b = len(basic)
    codepoints = sorted({ord(c) for c in label if ord(c) >= 0x80})
    total = len(label)
    for m in codepoints:
        delta += (m - n) * (h + 1)
        if delta < 0:
            raise ValueError("punycode delta overflow")
        n = m
        for c in label:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _BASE
                while True:
                    t = (_TMIN if k <= bias
                         else _TMAX if k >= bias + _TMAX
                         else k - bias)
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    if h != total:
        raise ValueError("punycode encode incomplete")
    return "".join(out)


def punycode_decode(text: str) -> str:
    pos = text.rfind("-")
    if pos > 0:
        output = list(text[:pos])
        rest = text[pos + 1:]
    else:
        output = []
        rest = text[1:] if pos == 0 else text
    if any(ord(c) >= 0x80 for c in output):
        raise ValueError("non-basic code point before delimiter")
    n = _INITIAL_N
    i = 0
    bias = _INITIAL_BIAS
    p = 0
    while p < len(rest):
        oldi = i
        w = 1
        k = _BASE
        while True:
            if p >= len(rest):
                raise ValueError("truncated punycode variable integer")
            digit = _char_digit(rest[p])
            p += 1
            i += digit * w
            if i > 1 << 31:
                raise ValueError("punycode decode overflow")
            t = (_TMIN if k <= bias
                 else _TMAX if k >= bias + _TMAX
                 else k - bias)
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            # lone surrogates are not valid scalar values: they pass
            # chr() but explode at any later UTF-8 encode (Arrow),
            # far from the parse site — reject here like strict IDNA
            raise ValueError("punycode code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
        if len(output) > MAX_LABEL:
            raise ValueError("punycode label too long")
    return "".join(output)


def idna_encode_host(host: str) -> str:
    """Hostname -> ACE form: lowercase, per-label xn-- encoding."""
    labels = host.lower().split(".")
    out = []
    for lab in labels:
        if not lab:
            raise ValueError("empty label in host")
        if all(ord(c) < 0x80 for c in lab):
            out.append(lab)
        else:
            enc = "xn--" + punycode_encode(lab)
            if len(enc) > 63:
                raise ValueError("ACE label over 63 octets")
            out.append(enc)
    return ".".join(out)


def idna_decode_host(host: str) -> str:
    """ACE hostname -> unicode form (labels without xn-- pass through)."""
    out = []
    for lab in host.lower().split("."):
        if lab.startswith("xn--"):
            out.append(punycode_decode(lab[4:]))
        else:
            out.append(lab)
    return ".".join(out)
