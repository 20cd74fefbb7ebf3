"""RFC 5322 / MIME email parse + build in pure stdlib (no email pkg).

Mailing-list archives and mbox dumps are a staple web-corpus source;
this implements the PUBLIC RFC 5322 (headers), RFC 2045/2046 (MIME
multipart + transfer encodings) and RFC 2047 (encoded-word headers)
subsets from scratch — deliberately NOT via the stdlib ``email``
package, so the parse rules under test are the ones documented here.

* ``parse_email`` — header block split on the first blank line,
  continuation-line UNFOLDING, case-insensitive header map,
  Content-Type parameter parsing (quoted and token boundary/charset),
  recursive multipart walking (nested multiparts, preamble/epilogue
  dropped per RFC 2046 §5.1.1), Content-Transfer-Encoding decode
  (7bit/8bit/binary pass-through, quoted-printable, base64), RFC 2047
  encoded-word decode (B and Q forms) in Subject.
* ``build_email`` — writes conformant messages: simple text, nested
  multipart/alternative inside multipart/mixed, QP soft line breaks at
  76 chars, base64 wrapped at 76, encoded-word subjects — the
  synth/oracle vehicle.

Malformed input raises ``ValueError``; depth/size caps bound hostile
nesting so a crafted message flags its row instead of recursing away.
"""

from __future__ import annotations

import base64
import binascii
import re

MAX_PARTS = 256
MAX_DEPTH = 8


# ---------------------------------------------------------------------------
# Transfer encodings (RFC 2045 §6.7-6.8)
# ---------------------------------------------------------------------------


def qp_encode(data: bytes, line_len: int = 76) -> bytes:
    """Quoted-printable encode: '=XX' for non-printables / '=' /
    trailing spaces, soft line breaks ('=' + CRLF) at ``line_len``.
    RFC 2045 §6.7 rule 3: a space/tab MUST NOT end an encoded line —
    before a hard break or at end of body it becomes =20/=09 (soft-
    breaking first if that would overflow); before a soft break the
    escaped form carries to the next line."""
    out = bytearray()
    line = bytearray()

    def flush_soft():
        nonlocal line
        carry = b""
        if line[-1:] in (b" ", b"\t"):
            carry = b"=%02X" % line[-1]
            del line[-1]
        out.extend(line)
        out.extend(b"=\r\n")
        line = bytearray(carry)

    def flush_hard():
        nonlocal line
        if line[-1:] in (b" ", b"\t"):
            esc = b"=%02X" % line[-1]
            del line[-1]
            if len(line) + len(esc) > line_len:
                out.extend(line)
                out.extend(b"=\r\n")
                line = bytearray(esc)
            else:
                line.extend(esc)
        out.extend(line)
        line = bytearray()

    for b in data:
        if b in b"\r\n":
            # hard line breaks pass through (normalize: emit as-is)
            flush_hard()
            out.append(b)
            continue
        enc = (
            bytes([b])
            if (0x20 <= b <= 0x7E and b != 0x3D)
            else b"=%02X" % b
        )
        if len(line) + len(enc) > line_len - 1:
            flush_soft()
        line.extend(enc)
    flush_hard()
    return bytes(out)


def qp_decode(data: bytes) -> bytes:
    """Quoted-printable decode: '=XX' hex escapes, soft line breaks
    removed; malformed escapes raise."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0x3D:
            out.append(b)
            i += 1
            continue
        if data[i + 1 : i + 3] == b"\r\n":  # soft break CRLF
            i += 3
        elif data[i + 1 : i + 2] == b"\n":  # tolerate bare LF
            i += 2
        else:
            h = data[i + 1 : i + 3]
            if len(h) < 2 or not re.fullmatch(rb"[0-9A-Fa-f]{2}", h):
                raise ValueError("bad quoted-printable escape")
            out.append(int(h, 16))
            i += 3
    return bytes(out)


def b64_decode_strict(data: bytes) -> bytes:
    compact = re.sub(rb"\s+", b"", data)
    if len(compact) % 4:
        raise ValueError("base64 body length not a multiple of 4")
    try:
        return base64.b64decode(compact, validate=True)
    except (binascii.Error, ValueError) as exc:
        raise ValueError("bad base64 body") from exc


def decode_transfer(data: bytes, cte: str) -> bytes:
    cte = cte.strip().lower()
    if cte in ("", "7bit", "8bit", "binary"):
        return data
    if cte == "quoted-printable":
        return qp_decode(data)
    if cte == "base64":
        return b64_decode_strict(data)
    raise NotImplementedError(f"transfer encoding {cte!r} not supported")


# ---------------------------------------------------------------------------
# Headers (RFC 5322 §2.2, RFC 2047)
# ---------------------------------------------------------------------------


def _split_headers(raw: bytes):
    """-> (headers list[(name, value)], body bytes).  Header block ends
    at the first empty line; continuation lines (leading WSP) UNFOLD
    into the previous header with a single space."""
    m = re.search(rb"\r?\n\r?\n", raw)
    if m is None:
        raise ValueError("email has no header/body separator")
    head, body = raw[: m.start()], raw[m.end() :]
    headers: list[tuple[str, str]] = []
    for line in re.split(rb"\r?\n", head):
        if not line:
            continue
        if line[0:1] in (b" ", b"\t"):
            if not headers:
                raise ValueError("email continuation line before any header")
            name, val = headers[-1]
            headers[-1] = (
                name,
                (val + " " + line.strip().decode("latin-1")).strip(),
            )
            continue
        if b":" not in line:
            raise ValueError("malformed email header line")
        name, _, val = line.partition(b":")
        if not name or name.strip() != name or b" " in name:
            raise ValueError("malformed email header name")
        headers.append(
            (name.decode("latin-1"), val.strip().decode("latin-1"))
        )
    return headers, body


_ENCODED_WORD = re.compile(
    r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?="
)


def decode_encoded_words(value: str) -> str:
    """RFC 2047 encoded-word decode (B and Q) anywhere in a header
    value; Q-form '_' means space (§4.2)."""

    def one(m: re.Match) -> str:
        charset, form, payload = m.group(1), m.group(2).lower(), m.group(3)
        if form == "b":
            raw = b64_decode_strict(payload.encode("ascii"))
        else:
            raw = qp_decode(payload.replace("_", " ").encode("ascii"))
        try:
            return raw.decode(charset)
        except (LookupError, UnicodeDecodeError) as exc:
            raise ValueError(f"bad encoded-word charset {charset}") from exc

    return _ENCODED_WORD.sub(one, value)


def parse_content_type(value: str):
    """'type/subtype; a=b; c="d"' -> (type/subtype lowercased,
    {param: value})."""
    parts = value.split(";")
    ctype = parts[0].strip().lower()
    if "/" not in ctype:
        raise ValueError(f"bad Content-Type {value!r}")
    params = {}
    for p in parts[1:]:
        if "=" not in p:
            continue
        k, _, v = p.partition("=")
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        params[k.strip().lower()] = v
    return ctype, params


# ---------------------------------------------------------------------------
# Message parsing (RFC 2045/2046)
# ---------------------------------------------------------------------------


def parse_email(raw: bytes) -> dict:
    """Email bytes -> {'headers': {lowercased name: unfolded value},
    'subject': encoded-words decoded, 'parts': [leaf parts in document
    order]} — each part {'content_type', 'charset', 'text' (decoded
    str for text/*) or 'data' (bytes otherwise)}.  A non-multipart
    message yields exactly one part."""
    raw = bytes(raw)
    headers, body = _split_headers(raw)
    hmap = {}
    for name, val in headers:
        hmap.setdefault(name.lower(), val)
    parts: list[dict] = []
    _walk_part(hmap, body, parts, 0)
    out = {
        "headers": hmap,
        "subject": decode_encoded_words(hmap.get("subject", "")),
        "parts": parts,
    }
    return out


def _walk_part(hmap: dict, body: bytes, parts: list, depth: int) -> None:
    if depth > MAX_DEPTH:
        raise ValueError("MIME nesting exceeds depth cap")
    if len(parts) >= MAX_PARTS:
        raise ValueError("MIME part count exceeds cap")
    ctype, params = parse_content_type(
        hmap.get("content-type", "text/plain; charset=us-ascii")
    )
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("multipart without a boundary parameter")
        delim = b"--" + boundary.encode("latin-1")
        # split on CRLF-delimited boundary lines (RFC 2046 §5.1.1);
        # preamble (before first delim) and epilogue (after --close)
        # are dropped
        segments = re.split(
            rb"(?:^|\r?\n)" + re.escape(delim) + rb"(--)?[ \t]*(?:\r?\n|$)",
            body,
        )
        # re.split with one group interleaves the close-marker captures:
        # [preamble, cap0, content0, cap1, content1, ...] where capI is
        # b"--" when boundary I was the closing delimiter (the content
        # after it is the epilogue, not a part)
        chunks = segments[0::2]
        closes = segments[1::2]
        inner = []
        closed = False
        for i, c in enumerate(closes):
            if c == b"--":
                closed = True
                break
            inner.append(chunks[i + 1])
        if not closed:
            raise ValueError("multipart missing the closing boundary")
        if len(inner) < 1:
            raise ValueError("multipart with no parts")
        for seg in inner:
            sub_headers, sub_body = _split_headers(seg)
            sub_map = {}
            for name, val in sub_headers:
                sub_map.setdefault(name.lower(), val)
            _walk_part(sub_map, sub_body, parts, depth + 1)
        return
    data = decode_transfer(
        body, hmap.get("content-transfer-encoding", "7bit")
    )
    if ctype.startswith("text/"):
        charset = params.get("charset", "us-ascii").lower()
        try:
            text = data.decode(
                "ascii" if charset == "us-ascii" else charset
            )
        except (LookupError, UnicodeDecodeError) as exc:
            raise ValueError(f"bad text part charset {charset}") from exc
        parts.append(
            {"content_type": ctype, "charset": charset, "text": text}
        )
    else:
        parts.append(
            {"content_type": ctype, "charset": None, "data": data}
        )


# ---------------------------------------------------------------------------
# Build (the synth/oracle vehicle)
# ---------------------------------------------------------------------------


def _fold_header(name: str, value: str) -> bytes:
    return f"{name}: {value}".encode("latin-1") + b"\r\n"


def encode_word_b64(text: str, charset: str = "utf-8") -> str:
    payload = base64.b64encode(text.encode(charset)).decode("ascii")
    return f"=?{charset}?B?{payload}?="


def build_email(
    subject: str,
    from_addr: str,
    to_addr: str,
    text_body: str,
    html_body: str | None = None,
    attachment: bytes | None = None,
    text_cte: str = "7bit",
    subject_encoded_word: bool = False,
    date: str = "Mon, 05 Jan 2026 08:30:00 +0000",
) -> bytes:
    """Conformant RFC 5322 message: plain text, or multipart/alternative
    (text + html), optionally wrapped in multipart/mixed with a base64
    application/octet-stream attachment.  ``text_cte`` picks the text
    part's transfer encoding (7bit / quoted-printable / base64)."""

    def text_part(ctype: str, body: str) -> bytes:
        hdr = _fold_header("Content-Type", f"{ctype}; charset=utf-8")
        raw = body.encode("utf-8")
        if text_cte == "quoted-printable":
            hdr += _fold_header("Content-Transfer-Encoding",
                                "quoted-printable")
            payload = qp_encode(raw)
        elif text_cte == "base64":
            hdr += _fold_header("Content-Transfer-Encoding", "base64")
            b = base64.b64encode(raw)
            payload = b"\r\n".join(
                b[i : i + 76] for i in range(0, len(b), 76)
            )
        else:
            hdr += _fold_header("Content-Transfer-Encoding", "7bit")
            payload = raw
        return hdr + b"\r\n" + payload

    subj = (
        encode_word_b64(subject) if subject_encoded_word else subject
    )
    top = bytearray()
    top += _fold_header("From", from_addr)
    top += _fold_header("To", to_addr)
    top += _fold_header("Subject", subj)
    top += _fold_header("Date", date)
    top += _fold_header("MIME-Version", "1.0")

    if html_body is None and attachment is None:
        return bytes(top) + text_part("text/plain", text_body)

    if html_body is not None:
        alt_b = "alt-0123456789"
        alt = bytearray()
        alt += _fold_header(
            "Content-Type", f'multipart/alternative; boundary="{alt_b}"'
        )
        alt += b"\r\n"
        for part in (
            text_part("text/plain", text_body),
            text_part("text/html", html_body),
        ):
            alt += b"--" + alt_b.encode() + b"\r\n" + part + b"\r\n"
        alt += b"--" + alt_b.encode() + b"--\r\n"
        inner = bytes(alt)
    else:
        inner = text_part("text/plain", text_body) + b"\r\n"

    if attachment is None:
        # split the pre-built alternative block into its own headers+body
        return bytes(top) + inner

    mix_b = "mixed-9876543210"
    out = bytearray(top)
    out += _fold_header(
        "Content-Type", f'multipart/mixed; boundary="{mix_b}"'
    )
    out += b"\r\npreamble is ignored\r\n"
    out += b"--" + mix_b.encode() + b"\r\n" + inner.rstrip(b"\r\n") + b"\r\n"
    att = bytearray()
    att += _fold_header("Content-Type", "application/octet-stream")
    att += _fold_header("Content-Transfer-Encoding", "base64")
    b = base64.b64encode(bytes(attachment))
    att += b"\r\n" + b"\r\n".join(b[i : i + 76] for i in range(0, len(b), 76))
    out += b"--" + mix_b.encode() + b"\r\n" + bytes(att) + b"\r\n"
    out += b"--" + mix_b.encode() + b"--\r\nepilogue ignored\r\n"
    return bytes(out)
