"""POSIX ustar tar archive walk + build in pure struct math.

Corpus shards ship as .tar / .tar.gz; this implements the PUBLIC
POSIX.1-1988 ustar layout from scratch (deliberately not the stdlib
``tarfile`` module, so the header rules under test are the documented
ones): 512-byte headers (name, octal size/mtime/mode, checksum with
the chksum field blanked to spaces, typeflag, ustar magic, prefix),
data rounded up to 512-byte blocks, two zero blocks at the end.

* ``parse_tar`` — member walk with checksum verification, regular
  files ('0' / NUL) and directories ('5'); prefix+name joining; GNU
  long-name ('L'/'K') and PAX ('x'/'g') extensions raise
  ``NotImplementedError`` (explicit guard, never silent misparse).
* ``build_tar`` — deterministic conformant writer (fixed mtime unless
  given), the synth/oracle vehicle.

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


def parse_tar(payload: bytes) -> list[dict]:
    """tar bytes -> [{'name', 'size', 'typeflag', 'mtime', 'data'}]
    for regular files and directories (data = b'' for dirs)."""
    p = bytes(payload)
    out: list[dict] = []
    i = 0
    n = len(p)
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
        if typeflag in (b"L", b"K", b"x", b"g"):
            raise NotImplementedError(
                "tar GNU long-name / PAX extensions not supported"
            )
        if typeflag not in (b"0", b"\x00", b"5"):
            raise NotImplementedError(
                f"tar typeflag {typeflag!r} not supported"
            )
        if size < 0 or size > MAX_MEMBER_BYTES:
            raise ValueError("tar member size exceeds cap")
        data_start = i + _BLOCK
        data_end = data_start + size
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
            mtime: int, mode: int) -> bytes:
    nb = name.encode("latin-1")
    if len(nb) > 100:
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


def build_tar(members: list[tuple[str, bytes]],
              mtime: int = 1735689600, mode: int = 0o644) -> bytes:
    """[(name, data)] -> complete ustar archive; a name ending in '/'
    writes a directory entry.  Deterministic (fixed mtime/mode)."""
    out = bytearray()
    for name, data in members:
        if name.endswith("/"):
            out += _header(name, 0, b"5", mtime, 0o755)
            continue
        out += _header(name, len(data), b"0", mtime, mode)
        out += data
        pad = (-len(data)) % _BLOCK
        out += b"\x00" * pad
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
