"""Server-log parsing: Apache combined log format + RFC 5424 syslog.

Web-server and syslog archives are classic large-scale corpora (and
the access-log side is the raw material of crawl analytics).  Both
grammars are PUBLIC (the Apache mod_log_config "combined" format;
RFC 5424) and parsed here with hand-rolled tokenizers — not regexes —
so quoting/escaping edge cases are explicit:

* combined log line: ``host ident authuser [timestamp] "request"
  status bytes "referer" "user-agent"`` — quoted fields support
  backslash escapes (``\\"``, ``\\\\``), ``-`` means absent (bytes,
  referer), and the request splits into method / target / protocol;
* RFC 5424: ``<PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID
  STRUCTURED-DATA MSG`` — PRI decomposes into facility*8+severity,
  NILVALUE ``-`` everywhere, and STRUCTURED-DATA is either ``-`` or
  ``[sd-id name="value" ...]+`` with ``\\" \\] \\\\`` escapes in
  param values.

Malformed lines raise ``ValueError`` so rows flag rather than
mis-parse.
"""

from __future__ import annotations

MAX_LINE = 1 << 16


def _quoted(line: str, pos: int) -> tuple[str, int]:
    """Parse a double-quoted field with backslash escapes starting at
    ``pos`` (which must point at the opening quote)."""
    if pos >= len(line) or line[pos] != '"':
        raise ValueError("expected opening quote")
    pos += 1
    out: list[str] = []
    while pos < len(line):
        c = line[pos]
        if c == "\\" and pos + 1 < len(line):
            out.append(line[pos + 1])
            pos += 2
            continue
        if c == '"':
            return "".join(out), pos + 1
        out.append(c)
        pos += 1
    raise ValueError("unterminated quoted field")


def parse_combined_log(line: str) -> dict:
    """One Apache combined-format line -> field dict."""
    if len(line) > MAX_LINE:
        raise ValueError("log line too long")
    parts = line.split(" ", 3)
    if len(parts) < 4:
        raise ValueError("short combined log line")
    host, ident, authuser, rest = parts
    if not rest.startswith("["):
        raise ValueError("missing timestamp bracket")
    tend = rest.find("]")
    if tend < 0:
        raise ValueError("unterminated timestamp")
    timestamp = rest[1:tend]
    pos = tend + 1
    if rest[pos:pos + 1] != " ":
        raise ValueError("missing separator after timestamp")
    request, pos = _quoted(rest, pos + 1)
    req_parts = request.split(" ")
    if len(req_parts) != 3:
        raise ValueError(f"malformed request line {request!r}")
    method, target, protocol = req_parts
    tail = rest[pos + 1:]
    status_s, _, tail = tail.partition(" ")
    bytes_s, _, tail = tail.partition(" ")
    referer, p2 = _quoted(tail, 0)
    if tail[p2:p2 + 1] != " ":
        raise ValueError("missing separator before user-agent")
    user_agent, p3 = _quoted(tail, p2 + 1)
    if tail[p3:].strip():
        raise ValueError("trailing bytes after user-agent")
    if not status_s.isdigit():
        raise ValueError(f"bad status {status_s!r}")
    return {
        "host": host,
        "ident": None if ident == "-" else ident,
        "authuser": None if authuser == "-" else authuser,
        "timestamp": timestamp,
        "method": method,
        "target": target,
        "protocol": protocol,
        "status": int(status_s),
        "n_bytes": None if bytes_s == "-" else int(bytes_s),
        "referer": None if referer == "-" else referer,
        "user_agent": user_agent,
    }


def format_combined_log(f: dict) -> str:
    """Deterministic writer (synth vehicle); escapes quoted fields."""
    def q(s) -> str:
        if s is None:
            return '"-"'
        return '"' + str(s).replace("\\", "\\\\").replace('"', '\\"') + '"'

    return (
        f"{f['host']} {f.get('ident') or '-'} "
        f"{f.get('authuser') or '-'} [{f['timestamp']}] "
        + q(f"{f['method']} {f['target']} {f['protocol']}")
        + f" {f['status']} "
        + ("-" if f.get("n_bytes") is None else str(f["n_bytes"]))
        + f" {q(f.get('referer'))} {q(f['user_agent'])}"
    )


def parse_syslog_5424(line: str) -> dict:
    """One RFC 5424 line -> field dict with facility/severity split
    and structured data as {sd_id: {name: value}}."""
    if len(line) > MAX_LINE:
        raise ValueError("syslog line too long")
    if not line.startswith("<"):
        raise ValueError("missing PRI")
    gt = line.find(">")
    if not 1 < gt <= 4:
        raise ValueError("malformed PRI")
    pri = int(line[1:gt])
    if pri > 191:
        raise ValueError("PRI out of range")
    rest = line[gt + 1:]
    head, _, rest = rest.partition(" ")
    if head != "1":
        raise ValueError(f"unsupported syslog version {head!r}")
    fields = []
    for _ in range(5):  # ts host app procid msgid
        tok, _, rest = rest.partition(" ")
        if not tok:
            raise ValueError("truncated syslog header")
        fields.append(None if tok == "-" else tok)
    ts, hostname, app, procid, msgid = fields
    sd: dict[str, dict[str, str]] = {}
    if rest.startswith("-"):
        msg = rest[1:].lstrip(" ")
    else:
        pos = 0
        while pos < len(rest) and rest[pos] == "[":
            end = pos + 1
            sd_id, _, _ = rest[end:].partition(" ")
            params: dict[str, str] = {}
            pos = end + len(sd_id)
            while pos < len(rest) and rest[pos] == " ":
                pos += 1
                eq = rest.find("=", pos)
                if eq < 0:
                    raise ValueError("malformed SD param")
                name = rest[pos:eq]
                val, pos = _sd_value(rest, eq + 1)
                params[name] = val
            if pos >= len(rest) or rest[pos] != "]":
                raise ValueError("unterminated SD element")
            pos += 1
            sd[sd_id] = params
        msg = rest[pos:].lstrip(" ")
    return {
        "facility": pri // 8,
        "severity": pri % 8,
        "timestamp": ts,
        "hostname": hostname,
        "app": app,
        "procid": procid,
        "msgid": msgid,
        "sd": sd,
        "msg": msg,
    }


def _sd_value(text: str, pos: int) -> tuple[str, int]:
    if text[pos:pos + 1] != '"':
        raise ValueError("SD value must be quoted")
    pos += 1
    out: list[str] = []
    while pos < len(text):
        c = text[pos]
        if c == "\\" and pos + 1 < len(text):
            out.append(text[pos + 1])
            pos += 2
            continue
        if c == '"':
            return "".join(out), pos + 1
        out.append(c)
        pos += 1
    raise ValueError("unterminated SD value")


def format_syslog_5424(f: dict) -> str:
    pri = f["facility"] * 8 + f["severity"]
    sd = f.get("sd") or {}
    if sd:
        sd_s = "".join(
            "[" + sd_id + "".join(
                f' {k}="' + v.replace("\\", "\\\\").replace('"', '\\"')
                + '"'
                for k, v in params.items()) + "]"
            for sd_id, params in sd.items())
    else:
        sd_s = "-"
    return (f"<{pri}>1 {f['timestamp']} {f['hostname']} {f['app']} "
            f"{f.get('procid') or '-'} {f.get('msgid') or '-'} "
            f"{sd_s} {f['msg']}")
