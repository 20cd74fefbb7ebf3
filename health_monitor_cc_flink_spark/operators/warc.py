"""WARC (ISO 28500 Web ARChive) parsing + HTML text extraction.

THE ingestion surface for web-scale text corpora: Common-Crawl-style
data ships as WARC files (per-record gzip members), and the first
pipeline stage is response-record extraction + HTML-to-text.  Pure
stdlib (gzip/zlib, html.parser) from the PUBLIC ISO 28500 / WARC 1.0
format spec and the HTTP/1.1 message layout:

* ``parse_warc`` — concatenated WARC records, plain OR per-record gzip
  members (sniffed); header block (version line, colon fields,
  Content-Length), payload, CRLF CRLF separator.  For ``response``
  records the HTTP status line/headers are split from the body.
* ``build_warc`` — writes warcinfo + response records (optionally
  gzip-membered) — the synth/oracle vehicle.
* ``html_extract_text`` — deterministic text extraction: script /
  style / noscript / template subtrees dropped, character/entity
  references decoded (stdlib HTMLParser), and ALL whitespace-separated
  tokens joined by single spaces — a closed-form, SQL-replicable rule
  (not a heuristic readability model).

Malformed input raises ``ValueError`` — never ``IndexError``.
"""

from __future__ import annotations

from html.parser import HTMLParser

#: Caps against hostile payloads (decompression bombs, header floods).
MAX_RECORDS = 100_000
MAX_RECORD_BYTES = 64 << 20

_SKIP_TAGS = {"script", "style", "noscript", "template"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)


def html_extract_text(html: str) -> str:
    """HTML -> plain text: skip script/style/noscript/template
    subtrees, decode entities, join all whitespace-separated tokens
    with single spaces."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return " ".join(" ".join(p.chunks).split())


class _LinkExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.hrefs.append(href)


def html_extract_links(html: str) -> list[str]:
    """HTML -> anchor hrefs in document order (the outlink layer the
    WAT sidecar carries), same stdlib HTMLParser discipline as
    :func:`html_extract_text`."""
    p = _LinkExtractor()
    p.feed(html)
    p.close()
    return p.hrefs


class _MetadataExtractor(HTMLParser):
    """<title>, OpenGraph <meta property="og:*" content>, and raw
    <script type="application/ld+json"> bodies."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.og: dict[str, str] = {}
        self.jsonld: list[str] = []
        self._in_title = False
        self._in_ld = False
        self._ld_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "title":
            self._in_title = True
        elif tag == "meta":
            prop = a.get("property", "")
            if prop.startswith("og:") and "content" in a:
                self.og.setdefault(prop[3:], a["content"])
        elif tag == "script" and a.get("type") == "application/ld+json":
            self._in_ld = True
            self._ld_parts = []

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "script" and self._in_ld:
            self._in_ld = False
            self.jsonld.append("".join(self._ld_parts))

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif self._in_ld:
            self._ld_parts.append(data)


def html_extract_metadata(html: str) -> dict:
    """HTML -> {'title', 'og' {property-sans-prefix: content},
    'jsonld' [raw script bodies]} — the structured-metadata layer web
    corpora carry (page titles, OpenGraph cards, schema.org JSON-LD),
    extracted with the same stdlib HTMLParser discipline as
    :func:`html_extract_text`."""
    p = _MetadataExtractor()
    p.feed(html)
    p.close()
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "og": p.og,
        "jsonld": p.jsonld,
    }


def _split_gzip_members(payload: bytes) -> list[bytes]:
    import zlib

    out = []
    rest = payload
    while rest:
        if rest[:2] != b"\x1f\x8b":
            raise ValueError("trailing bytes after gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(rest, MAX_RECORD_BYTES + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("gzip member exceeds size cap or is truncated")
        if len(data) > MAX_RECORD_BYTES:
            raise ValueError("gzip member exceeds size cap")
        out.append(data)
        rest = d.unused_data
        if len(out) > MAX_RECORDS:
            raise ValueError("too many gzip members")
    return out


def _parse_plain(payload: bytes) -> list[dict]:
    records = []
    i = 0
    n = len(payload)
    while i < n:
        if len(records) >= MAX_RECORDS:
            raise ValueError("too many WARC records")
        end_hdr = payload.find(b"\r\n\r\n", i)
        if end_hdr < 0:
            raise ValueError("truncated WARC header block")
        lines = payload[i:end_hdr].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise ValueError("missing WARC version line")
        version = lines[0][5:].decode("ascii", "replace")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError("malformed WARC header field")
            fields[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        if clen < 0 or clen > MAX_RECORD_BYTES:
            raise ValueError("Content-Length out of range")
        body_start = end_hdr + 4
        body_end = body_start + clen
        if body_end > n:
            raise ValueError("truncated WARC record body")
        body = payload[body_start:body_end]
        sep = payload[body_end : body_end + 4]
        # the spec's two trailing CRLFs; tolerate exact-EOF truncation
        # of the final separator (some writers omit it)
        if sep != b"\r\n\r\n" and body_end != n:
            raise ValueError("missing WARC record separator")
        records.append({"version": version, "fields": fields, "body": body})
        i = body_end + len(sep)
    if not records:
        raise ValueError("no WARC records")
    return records


def split_http_response(body: bytes):
    """HTTP response bytes -> (status_code, headers dict, body bytes)."""
    end = body.find(b"\r\n\r\n")
    if end < 0:
        raise ValueError("truncated HTTP response header")
    lines = body[:end].split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("malformed HTTP status line")
    try:
        status = int(parts[1])
    except ValueError as exc:
        raise ValueError("malformed HTTP status code") from exc
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
    return status, headers, body[end + 4 :]


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 ``Transfer-Encoding: chunked`` body.  Chunk
    extensions after ``;`` are ignored, trailer headers after the final
    0-chunk are tolerated; malformed framing raises ``ValueError``."""
    out = []
    total = 0
    i = 0
    while True:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("truncated chunk-size line")
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as exc:
            raise ValueError("malformed chunk size") from exc
        i = eol + 2
        if size == 0:
            return b"".join(out)
        total += size
        if total > MAX_RECORD_BYTES:
            raise ValueError("chunked body exceeds size cap")
        if i + size + 2 > len(body):
            raise ValueError("truncated chunk data")
        out.append(body[i : i + size])
        if body[i + size : i + size + 2] != b"\r\n":
            raise ValueError("missing chunk terminator")
        i += size + 2


def decode_http_body(headers: dict, body: bytes) -> bytes:
    """Apply Transfer-Encoding (chunked) then Content-Encoding
    (gzip/deflate, capped) per the parsed headers — the step real
    Common-Crawl response records need before the body is HTML.
    Unsupported codings raise ``ValueError`` so the row is flagged
    rather than producing corrupt text."""
    import zlib

    te = headers.get("transfer-encoding", "").strip().lower()
    if te and te != "identity":
        if te != "chunked":
            raise ValueError(f"unsupported transfer-encoding: {te}")
        body = _dechunk(body)
    ce = headers.get("content-encoding", "").strip().lower()
    if ce and ce != "identity":
        if ce in ("gzip", "x-gzip"):
            wbits = 31
        elif ce == "deflate":
            wbits = 15
        else:
            raise ValueError(f"unsupported content-encoding: {ce}")
        d = zlib.decompressobj(wbits=wbits)
        try:
            body = d.decompress(body, MAX_RECORD_BYTES + 1)
        except zlib.error as exc:
            raise ValueError(f"corrupt {ce} body: {exc}") from exc
        if len(body) > MAX_RECORD_BYTES:
            raise ValueError("decoded body exceeds size cap")
    return body


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain or per-record gzip members) -> list of record
    dicts with keys ``version, fields, body`` plus, for response
    records, ``http_status, http_headers, http_body`` (the http_body is
    de-chunked / content-decoded per its own headers)."""
    payload = bytes(payload)
    if payload[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(payload)
        records = []
        for c in chunks:
            records.extend(_parse_plain(c))
    else:
        records = _parse_plain(payload)
    for r in records:
        if r["fields"].get("warc-type") == "response":
            status, headers, hbody = split_http_response(r["body"])
            r["http_status"] = status
            r["http_headers"] = headers
            r["http_body"] = decode_http_body(headers, hbody)
    return records


def build_warc(responses, gzip_members: bool = True,
               warcinfo: str = "software: health-monitor-spark") -> bytes:
    """[(uri, html_str), ...] or [(uri, html_str, charset), ...] ->
    WARC bytes with a warcinfo record then one HTTP response record
    per entry (deterministic record ids).  ``charset`` (default
    utf-8) encodes the body and is declared in Content-Type;
    utf-16-le/-be bodies get their BOM."""
    import gzip as gzip_mod

    def record(rtype: str, extra: dict, body: bytes, idx: int) -> bytes:
        hdr = [f"WARC/1.0"]
        hdr.append(f"WARC-Type: {rtype}")
        hdr.append(f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{idx:012d}>")
        hdr.append("WARC-Date: 2026-01-01T00:00:00Z")
        for k, v in extra.items():
            hdr.append(f"{k}: {v}")
        hdr.append(f"Content-Length: {len(body)}")
        return ("\r\n".join(hdr) + "\r\n\r\n").encode() + body + b"\r\n\r\n"

    out = []
    info = warcinfo.encode()
    out.append(
        record("warcinfo", {"Content-Type": "application/warc-fields"}, info, 0)
    )
    for i, entry in enumerate(responses, start=1):
        uri, html = entry[0], entry[1]
        charset = entry[2] if len(entry) > 2 else "utf-8"
        html_b = html.encode(charset)
        if charset == "utf-16-le":
            html_b = b"\xff\xfe" + html_b
        elif charset == "utf-16-be":
            html_b = b"\xfe\xff" + html_b
        http = (
            b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: text/html; charset={charset}\r\n".encode()
            + f"Content-Length: {len(html_b)}\r\n\r\n".encode()
            + html_b
        )
        out.append(
            record(
                "response",
                {
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
                i,
            )
        )
    if gzip_members:
        return b"".join(
            gzip_mod.compress(r, mtime=0) for r in out
        )
    return b"".join(out)


#: Charset labels this decoder supports (normalized); anything else
#: declared in Content-Type raises so the row is flagged, not
#: mis-transcoded.
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "ascii",
    "ascii": "ascii", "iso-8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1", "latin1": "iso-8859-1",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def decode_text_body(headers: dict, body: bytes):
    """Charset-aware body decode -> (charset_label, str).  Precedence
    (what real crawl pipelines do): BOM > Content-Type charset
    parameter > UTF-8 validity probe > Latin-1 fallback (never
    fails).  A declared-but-unsupported charset, or bytes invalid in
    the DECLARED charset, raise ``ValueError`` so the row is flagged
    rather than silently mojibake'd."""
    import re as _re

    if body[:2] == b"\xff\xfe":
        return "utf-16-le", body[2:].decode("utf-16-le")
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", body[2:].decode("utf-16-be")
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", body[3:].decode("utf-8")
    m = _re.search(r"charset=\"?([A-Za-z0-9_\-]+)",
                   headers.get("content-type", ""), _re.IGNORECASE)
    if m:
        declared = m.group(1).lower()
        if declared not in _CHARSET_ALIASES:
            raise ValueError(f"unsupported charset {declared}")
        cs = _CHARSET_ALIASES[declared]
        return cs, body.decode(cs)  # UnicodeDecodeError IS a ValueError
    try:
        return "utf-8", body.decode("utf-8")
    except UnicodeDecodeError:
        return "iso-8859-1", body.decode("iso-8859-1")
