"""Common Crawl derivative formats: WET, WAT, CDX-J, SURT keys.

A web-scale text pipeline rarely consumes raw WARC twice — it derives
the three standard sidecar artifacts once and serves those (this is
exactly what the Common Crawl publishes next to every crawl):

* **WET** — WARC ``conversion`` records carrying the extracted plain
  text of each response (ISO 28500 framing, ``Content-Type:
  text/plain``);
* **WAT** — WARC ``metadata`` records carrying a JSON envelope of
  per-response metadata (target URI, title, outlinks);
* **CDX-J** — the sorted lookup index: one line per capture,
  ``<SURT urlkey> <14-digit timestamp> <JSON block>`` with url, mime,
  status, digest, and payload length;
* **SURT** (Sort-friendly URI Reordering Transform) — the canonical
  key: scheme dropped, host lowercased with a leading ``www.``
  stripped and its labels REVERSED comma-joined, ``)`` separator,
  lowercased path, query parameters sorted by name.

Digest note: Common Crawl's CDX digest is ``sha1:`` base-32; this
engine emits ``md5:<hex>`` so the dual-engine oracle (DuckDB has md5
but no sha1) can re-derive it — the choice of hash is a parameter of
the convention, not of the format.

All builders are deterministic; parsers raise ``ValueError`` on
malformed input.  Builds on operators/warc.py for record framing
semantics (same CRLF + Content-Length rules).
"""

from __future__ import annotations

import json

from .warc import parse_warc


def surt(url: str) -> str:
    """SURT urlkey for a http(s) URL (documented subset: no port,
    userinfo, or fragment handling beyond dropping the fragment)."""
    u = url.strip()
    low = u.lower()
    for scheme in ("https://", "http://"):
        if low.startswith(scheme):
            u = u[len(scheme):]
            break
    else:
        raise ValueError(f"surt: unsupported scheme in {url!r}")
    u = u.split("#", 1)[0]
    hostpath = u.split("/", 1)
    host = hostpath[0].lower()
    rest = "/" + hostpath[1] if len(hostpath) > 1 else "/"
    if host.startswith("www."):
        host = host[4:]
    if not host:
        raise ValueError(f"surt: empty host in {url!r}")
    path, sep, query = rest.partition("?")
    key = ",".join(reversed(host.split("."))) + ")" + path.lower()
    if sep:
        params = sorted(p.lower() for p in query.split("&") if p)
        key += "?" + "&".join(params)
    return key


def _record(rtype: str, fields: dict, body: bytes) -> bytes:
    hdr = ["WARC/1.0", f"WARC-Type: {rtype}"]
    for k, v in fields.items():
        hdr.append(f"{k}: {v}")
    hdr.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(hdr) + "\r\n\r\n").encode() + body + b"\r\n\r\n"


_WARC_DATE = "2026-01-01T00:00:00Z"
_CDX_TS = "20260101000000"


def build_wet(captures: list[dict]) -> bytes:
    """[{uri, text}] -> WET bytes: a warcinfo record then one
    ``conversion`` record per capture with the plain text body."""
    out = [_record(
        "warcinfo",
        {"WARC-Date": _WARC_DATE,
         "Content-Type": "application/warc-fields"},
        b"software: health-monitor-spark wet-derive",
    )]
    for i, cap in enumerate(captures, start=1):
        body = cap["text"].encode("utf-8")
        out.append(_record(
            "conversion",
            {"WARC-Target-URI": cap["uri"],
             "WARC-Date": _WARC_DATE,
             "WARC-Record-ID":
                 f"<urn:uuid:00000000-0000-0000-0001-{i:012d}>",
             "Content-Type": "text/plain"},
            body,
        ))
    return b"".join(out)


def build_wat(captures: list[dict]) -> bytes:
    """[{uri, title, links, status, mime}] -> WAT bytes: ``metadata``
    records with the Common-Crawl-shaped JSON envelope."""
    out = [_record(
        "warcinfo",
        {"WARC-Date": _WARC_DATE,
         "Content-Type": "application/warc-fields"},
        b"software: health-monitor-spark wat-derive",
    )]
    for i, cap in enumerate(captures, start=1):
        envelope = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": cap["uri"],
                    "WARC-Type": "response",
                    "WARC-Date": _WARC_DATE,
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "Response-Message": {"Status": cap["status"]},
                        "Headers": {"Content-Type": cap["mime"]},
                        "HTML-Metadata": {
                            "Head": {"Title": cap["title"]},
                            "Links": [{"path": "A@/href", "url": u}
                                      for u in cap["links"]],
                        },
                    }
                },
            }
        }
        body = json.dumps(envelope, sort_keys=True,
                          separators=(",", ":")).encode("utf-8")
        out.append(_record(
            "metadata",
            {"WARC-Target-URI": cap["uri"],
             "WARC-Date": _WARC_DATE,
             "WARC-Record-ID":
                 f"<urn:uuid:00000000-0000-0000-0002-{i:012d}>",
             "Content-Type": "application/json"},
            body,
        ))
    return b"".join(out)


def build_cdxj(captures: list[dict]) -> str:
    """[{uri, mime, status, digest, length}] -> CDX-J text, one line
    per capture, sorted by (urlkey, timestamp) as the index contract
    requires."""
    lines = []
    for cap in captures:
        block = {
            "url": cap["uri"],
            "mime": cap["mime"],
            "status": str(cap["status"]),
            "digest": cap["digest"],
            "length": str(cap["length"]),
        }
        lines.append(f"{surt(cap['uri'])} {_CDX_TS} "
                     + json.dumps(block, sort_keys=True,
                                  separators=(",", ":")))
    return "\n".join(sorted(lines)) + "\n"


def parse_wet(payload: bytes) -> list[dict]:
    """WET bytes -> [{uri, text}] from the conversion records."""
    return [
        {"uri": r["fields"]["warc-target-uri"],
         "text": r["body"].decode("utf-8")}
        for r in parse_warc(payload)
        if r["fields"].get("warc-type") == "conversion"
    ]


def parse_wat(payload: bytes) -> list[dict]:
    """WAT bytes -> [{uri, title, links, status}] from the metadata
    records' JSON envelopes."""
    out = []
    for r in parse_warc(payload):
        if r["fields"].get("warc-type") != "metadata":
            continue
        env = json.loads(r["body"].decode("utf-8"))["Envelope"]
        http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
        out.append({
            "uri": env["WARC-Header-Metadata"]["WARC-Target-URI"],
            "title": http["HTML-Metadata"]["Head"]["Title"],
            "links": [x["url"] for x in
                      http["HTML-Metadata"].get("Links", [])],
            "status": int(http["Response-Message"]["Status"]),
        })
    return out


def parse_cdxj(text: str) -> list[dict]:
    """CDX-J text -> [{urlkey, timestamp, url, mime, status, digest,
    length}]; verifies the sort contract."""
    rows = []
    prev = None
    for line in text.splitlines():
        if not line.strip():
            continue
        try:
            urlkey, ts, blob = line.split(" ", 2)
            block = json.loads(blob)
        except (ValueError, json.JSONDecodeError) as exc:
            raise ValueError(f"malformed CDX-J line {line[:80]!r}") from exc
        if prev is not None and line < prev:
            raise ValueError("CDX-J lines out of sort order")
        prev = line
        rows.append({
            "urlkey": urlkey,
            "timestamp": ts,
            "url": block["url"],
            "mime": block["mime"],
            "status": int(block["status"]),
            "digest": block["digest"],
            "length": int(block["length"]),
        })
    return rows
