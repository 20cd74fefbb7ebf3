"""POSIX ustar tar archive walk + build in pure struct math.

Corpus shards ship as .tar / .tar.gz; this implements the PUBLIC
POSIX.1-1988 ustar layout from scratch (deliberately not the stdlib
``tarfile`` module, so the header rules under test are the documented
ones): 512-byte headers (name, octal size/mtime/mode, checksum with
the chksum field blanked to spaces, typeflag, ustar magic, prefix),
data rounded up to 512-byte blocks, two zero blocks at the end.

* ``parse_tar`` — member walk with checksum verification, regular
  files ('0' / NUL) and directories ('5'); prefix+name joining; GNU
  long-name members ('L' longname / 'K' longlink, the old-GNU
  "././@LongLink" convention) and PAX extended headers ('x' per-file
  / 'g' global, POSIX.1-2001 length-prefixed "LEN key=value\\n"
  records — path/size/mtime honored, file-level overriding global)
  applied to the following member.
* ``build_tar`` — deterministic conformant writer (fixed mtime unless
  given), the synth/oracle vehicle; ``longname=`` selects how names
  over 100 bytes are carried ('ustar' prefix split, 'gnu' 'L'
  member, 'pax' 'x' member), ``pax_all`` forces an 'x' header per
  member regardless of length.

Hostile input raises ``ValueError``; sizes are bounds-checked against
the payload and a member cap so crafted archives flag their row.
"""

from __future__ import annotations

MAX_MEMBERS = 1 << 14
MAX_MEMBER_BYTES = 1 << 26

_BLOCK = 512


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad tar octal field {field!r}") from exc


def _pax_records(data: bytes) -> dict[str, str]:
    """POSIX.1-2001 pax extended-header payload -> {key: value}.
    Each record is 'LEN key=value\\n' where LEN is the decimal byte
    length of the WHOLE record including the digits and newline."""
    recs: dict[str, str] = {}
    i = 0
    n = len(data)
    while i < n:
        sp = data.find(b" ", i, i + 20)
        if sp < 0:
            raise ValueError("malformed pax record length")
        try:
            ln = int(data[i:sp])
        except ValueError as exc:
            raise ValueError("malformed pax record length") from exc
        if ln < sp - i + 2 or i + ln > n or data[i + ln - 1 : i + ln] != b"\n":
            raise ValueError("pax record length out of bounds")
        kv = data[sp + 1 : i + ln - 1]
        k, eq, v = kv.partition(b"=")
        if not eq:
            raise ValueError("pax record missing '='")
        try:
            recs[k.decode("utf-8")] = v.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError("pax record not UTF-8") from exc
        i += ln
    return recs


def parse_tar(payload: bytes) -> list[dict]:
    """tar bytes -> [{'name', 'size', 'typeflag', 'mtime', 'data'}]
    for regular files and directories (data = b'' for dirs).  GNU
    'L'/'K' long-name members and pax 'x'/'g' extended headers are
    consumed and applied to the member that follows (path/size/mtime;
    file-level records override global ones, GNU longname overrides
    pax path per GNU tar precedence)."""
    p = bytes(payload)
    out: list[dict] = []
    i = 0
    n = len(p)
    glob: dict[str, str] = {}   # 'g' defaults for all following members
    pend: dict[str, str] = {}   # 'x' records for the next member only
    pend_name: str | None = None    # GNU 'L' for the next member
    meta_runs = 0               # consecutive meta members (hostile cap)
    while True:
        if i + _BLOCK > n:
            raise ValueError("tar truncated before end-of-archive marker")
        hdr = p[i : i + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            # end marker: two zero blocks
            if p[i + _BLOCK : i + 2 * _BLOCK] != b"\x00" * _BLOCK:
                raise ValueError("tar end marker missing second zero block")
            return out
        if len(out) >= MAX_MEMBERS:
            raise ValueError("tar member count exceeds cap")
        stored_ck = _octal(hdr[148:156])
        calc_ck = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored_ck != calc_ck:
            raise ValueError("tar header checksum mismatch")
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError("tar header missing ustar magic")
        typeflag = hdr[156:157]
        name = hdr[0:100].split(b"\x00")[0].decode("latin-1")
        prefix = hdr[345:500].split(b"\x00")[0].decode("latin-1")
        if prefix:
            name = prefix + "/" + name
        size = _octal(hdr[124:136])
        mtime = _octal(hdr[136:148])
        if size < 0 or size > MAX_MEMBER_BYTES:
            raise ValueError("tar member size exceeds cap")
        data_start = i + _BLOCK
        data_end = data_start + size
        if typeflag in (b"L", b"K", b"x", b"g"):
            meta_runs += 1
            if meta_runs > 8:
                raise ValueError("tar meta-member run exceeds cap")
            if data_end > n:
                raise ValueError("tar meta member overruns archive")
            meta = p[data_start:data_end]
            if typeflag == b"L":
                pend_name = meta.split(b"\x00")[0].decode("utf-8", "replace")
            elif typeflag == b"K":
                pass  # long linkname: no link types supported, consume
            elif typeflag == b"x":
                pend.update(_pax_records(meta))
            else:
                glob.update(_pax_records(meta))
            i = data_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
            continue
        if typeflag not in (b"0", b"\x00", b"5"):
            raise NotImplementedError(
                f"tar typeflag {typeflag!r} not supported"
            )
        meta_runs = 0
        eff = dict(glob)
        eff.update(pend)
        pend = {}
        if "size" in eff:
            try:
                size = int(eff["size"])
            except ValueError as exc:
                raise ValueError("bad pax size record") from exc
            if size < 0 or size > MAX_MEMBER_BYTES:
                raise ValueError("tar member size exceeds cap")
            data_end = data_start + size
        if "mtime" in eff:
            try:
                mtime = int(float(eff["mtime"]))
            except ValueError as exc:
                raise ValueError("bad pax mtime record") from exc
        if pend_name is not None:
            name = pend_name
            pend_name = None
        elif "path" in eff:
            name = eff["path"]
        if data_end > n:
            raise ValueError("tar member data overruns archive")
        data = p[data_start:data_end] if typeflag != b"5" else b""
        out.append(
            {
                "name": name,
                "size": size,
                "typeflag": typeflag.decode("latin-1") or "0",
                "mtime": mtime,
                "data": data,
            }
        )
        i = data_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK


def _header(name: str, size: int, typeflag: bytes,
            mtime: int, mode: int, split_prefix: bool = True) -> bytes:
    nb = name.encode("latin-1")
    if len(nb) > 100:
        if not split_prefix:
            nb = nb[:100]  # placeholder field; the meta member governs
            prefix = b""
        else:
            # split into prefix/name at a '/' (ustar rule)
            cut = nb[:155].rfind(b"/")
            if cut <= 0 or len(nb) - cut - 1 > 100:
                raise ValueError("tar name too long for ustar")
            prefix, nb = nb[:cut], nb[cut + 1 :]
    else:
        prefix = b""
    hdr = bytearray(_BLOCK)
    hdr[0:100] = nb.ljust(100, b"\x00")
    hdr[100:108] = b"%07o\x00" % mode
    hdr[108:116] = b"%07o\x00" % 0
    hdr[116:124] = b"%07o\x00" % 0
    hdr[124:136] = b"%011o\x00" % size
    hdr[136:148] = b"%011o\x00" % mtime
    hdr[148:156] = b" " * 8  # checksum placeholder
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[345 : 345 + len(prefix)] = prefix
    ck = sum(hdr)
    hdr[148:156] = b"%06o\x00 " % ck
    return bytes(hdr)


def _pax_payload(records: dict[str, str]) -> bytes:
    """{key: value} -> pax extended-header payload with the
    self-referential length prefix (LEN counts its own digits)."""
    out = bytearray()
    for k, v in records.items():
        body = f" {k}={v}\n".encode("utf-8")
        ln = len(body) + 1
        while len(str(ln)) + len(body) != ln:
            ln = len(str(ln)) + len(body)
        out += str(ln).encode() + body
    return bytes(out)


def _data_blocks(data: bytes) -> bytes:
    return data + b"\x00" * ((-len(data)) % _BLOCK)


def build_tar(members: list[tuple[str, bytes]],
              mtime: int = 1735689600, mode: int = 0o644,
              longname: str = "ustar", meta_all: bool = False) -> bytes:
    """[(name, data)] -> complete ustar archive; a name ending in '/'
    writes a directory entry.  Deterministic (fixed mtime/mode).
    ``longname`` picks the carrier for names over 100 bytes: 'ustar'
    (prefix split, raises when impossible), 'gnu' (an old-GNU 'L'
    "././@LongLink" member), or 'pax' (an 'x' extended header with a
    path record).  ``meta_all`` emits the meta member for EVERY
    entry regardless of length (what GNU tar --format=pax does with
    path+mtime records) — parsed output is identical either way,
    which keeps oracles independent of the header style."""
    if longname not in ("ustar", "gnu", "pax"):
        raise ValueError(f"unknown tar longname strategy {longname!r}")
    if meta_all and longname == "ustar":
        raise ValueError("meta_all requires longname 'gnu' or 'pax'")
    out = bytearray()
    for name, data in members:
        is_dir = name.endswith("/")
        tf, payload = (b"5", b"") if is_dir else (b"0", data)
        needs_meta = meta_all or len(name.encode("latin-1")) > 100
        if needs_meta and longname != "ustar":
            if longname == "gnu":
                meta_name, meta_tf = "././@LongLink", b"L"
                meta = name.encode("utf-8") + b"\x00"
            else:
                meta_name, meta_tf = f"./PaxHeaders.0/{name[:80]}", b"x"
                recs = {"path": name}
                if meta_all:
                    recs["mtime"] = str(mtime)
                meta = _pax_payload(recs)
            out += _header(meta_name, len(meta), meta_tf, mtime, 0o644,
                           split_prefix=False)
            out += _data_blocks(meta)
            out += _header(name, len(payload), tf, mtime,
                           0o755 if is_dir else mode, split_prefix=False)
        else:
            out += _header(name, len(payload), tf, mtime,
                           0o755 if is_dir else mode)
        out += _data_blocks(payload)
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


# ---------------------------------------------------------------------------
# mbox (RFC 4155): the classic mailing-list archive container
# ---------------------------------------------------------------------------


def mbox_split(payload: bytes, max_messages: int = 1 << 14) -> list[bytes]:
    """mbox bytes -> list of raw RFC 5322 messages.  Messages start at
    lines beginning 'From ' (the envelope line, which is NOT part of
    the message); body lines that originally began 'From ' arrive
    '>From '-quoted and are unquoted here (RFC 4155 mboxrd
    convention, any number of '>' reduced by one)."""
    p = bytes(payload)
    if not p.startswith(b"From "):
        raise ValueError("not an mbox: missing initial envelope line")
    lines = p.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()  # the file's own trailing newline, not a body line
    msgs: list[list[bytes]] = []
    for ln in lines:
        if ln.startswith(b"From "):
            if len(msgs) >= max_messages:
                raise ValueError("mbox message count exceeds cap")
            msgs.append([])  # envelope line dropped
            continue
        if not msgs:
            raise ValueError("mbox content before the first envelope")
        stripped = ln.lstrip(b">")
        if stripped.startswith(b"From ") and ln[:1] == b">":
            ln = ln[1:]  # unquote one level
        msgs[-1].append(ln)
    out = []
    for m in msgs:
        # drop the single blank separator line before the next envelope
        if m and m[-1] == b"":
            m = m[:-1]
        out.append(b"\n".join(m))
    return out


def mbox_join(messages: list[bytes],
              envelope: str = "sender@example.org") -> bytes:
    """Raw messages -> mbox: envelope lines + mboxrd 'From ' quoting +
    one blank separator line per message."""
    out = bytearray()
    for m in messages:
        out += f"From {envelope} Thu Jan  1 00:00:00 2026\n".encode()
        for ln in bytes(m).split(b"\n"):
            if ln.lstrip(b">").startswith(b"From "):
                out += b">" + ln + b"\n"
            else:
                out += ln + b"\n"
        out += b"\n"
    return bytes(out)
