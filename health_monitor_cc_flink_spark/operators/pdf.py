"""PDF structural parse + text extraction in pure stdlib (zlib only).

The single most common document format in crawled corpora.  Implemented
from the PUBLIC ISO 32000-1 (PDF 1.7) object model — structure only,
like TIFF/BMP: lexer for the object syntax (dicts, arrays, names,
strings with escapes, hex strings, numbers, indirect references),
cross-reference TABLE + trailer walk, page-tree traversal, content
streams (optionally /Filter /FlateDecode via stdlib zlib), and the
text-showing operators (Tj, TJ, ', ") of the content-stream language.

* ``parse_pdf`` — header check, startxref/trailer/xref walk,
  lazily-parsed indirect objects, reference resolution.
* ``pdf_extract_text`` — Catalog -> Pages tree (nested /Kids) -> per
  page /Contents (single stream or array), FlateDecode, text operator
  scan; every Tj/TJ/'/" emits one line, pages joined by newlines.
* ``encode_pdf`` — writes spec-conformant single-xref files (header,
  objects, xref table with exact byte offsets, trailer, startxref):
  the synth/oracle vehicle, with plain or Flate content streams and
  Tj or TJ-array text forms.

Out of scope (explicit ``NotImplementedError``, never wrong output):
cross-reference STREAMS (PDF 1.5 compressed xref), object streams,
encryption, filters beyond FlateDecode, and CID/composite-font text
(simple-font byte strings only).  Malformed input raises
``ValueError``; offsets and stream lengths are bounds-checked so a
crafted file flags its row instead of crashing the executor.
"""

from __future__ import annotations

import re
import zlib

MAX_OBJECTS = 1 << 16
MAX_STREAM = 1 << 26
MAX_PAGES = 1 << 12

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for the PDF object syntax (ISO 32000-1 §7.2-7.3)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos
        self.n = len(data)

    def _skip_ws(self):
        while self.i < self.n:
            c = self.d[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # '%' comment runs to EOL
                while self.i < self.n and self.d[self.i] not in b"\r\n":
                    self.i += 1
            else:
                return

    def next_token(self):
        """-> (kind, value): kind in {'name','str','num','kw','<<','>>',
        '[',']'} or (None, None) at end."""
        self._skip_ws()
        if self.i >= self.n:
            return None, None
        d, i = self.d, self.i
        c = d[i]
        if c == 0x3C:  # '<'
            if i + 1 < self.n and d[i + 1] == 0x3C:
                self.i += 2
                return "<<", None
            return "str", self._hex_string()
        if c == 0x3E:  # '>'
            if i + 1 < self.n and d[i + 1] == 0x3E:
                self.i += 2
                return ">>", None
            raise ValueError("stray '>' in PDF object")
        if c == 0x5B:
            self.i += 1
            return "[", None
        if c == 0x5D:
            self.i += 1
            return "]", None
        if c == 0x28:  # '('
            return "str", self._literal_string()
        if c == 0x2F:  # '/'
            self.i += 1
            start = self.i
            while self.i < self.n and d[self.i] not in _WS and d[self.i] not in _DELIM:
                self.i += 1
            return "name", d[start : self.i].decode("latin-1")
        if c in b"+-.0123456789":
            start = self.i
            self.i += 1
            while self.i < self.n and d[self.i] in b".0123456789+-":
                self.i += 1
            tok = d[start : self.i]
            try:
                return "num", float(tok) if b"." in tok else int(tok)
            except ValueError as exc:
                raise ValueError(f"bad PDF number {tok!r}") from exc
        start = self.i
        while self.i < self.n and d[self.i] not in _WS and d[self.i] not in _DELIM:
            self.i += 1
        if self.i == start:
            raise ValueError(f"unexpected PDF byte {c:#x}")
        return "kw", d[start : self.i].decode("latin-1")

    def _literal_string(self) -> bytes:
        """(...) with nesting and backslash escapes (§7.3.4.2)."""
        d = self.d
        i = self.i + 1
        depth = 1
        out = bytearray()
        while i < self.n:
            c = d[i]
            if c == 0x5C:  # backslash
                if i + 1 >= self.n:
                    raise ValueError("truncated PDF string escape")
                e = d[i + 1]
                i += 2
                mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                          0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
                if e in mapped:
                    out.append(mapped[e])
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    val = e - 0x30
                    for _ in range(2):
                        if i < self.n and 0x30 <= d[i] <= 0x37:
                            val = val * 8 + (d[i] - 0x30)
                            i += 1
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and i < self.n and d[i] == 0x0A:
                        i += 1
                else:
                    out.append(e)  # unknown escape: the char itself
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.i = i + 1
                    return bytes(out)
            out.append(c)
            i += 1
        raise ValueError("unterminated PDF literal string")

    def _hex_string(self) -> bytes:
        d = self.d
        i = self.i + 1
        digits = []
        while i < self.n and d[i] != 0x3E:
            if d[i] not in _WS:
                digits.append(chr(d[i]))
            i += 1
        if i >= self.n:
            raise ValueError("unterminated PDF hex string")
        self.i = i + 1
        h = "".join(digits)
        if len(h) % 2:
            h += "0"  # §7.3.4.3: odd count implies trailing zero
        try:
            return bytes.fromhex(h)
        except ValueError as exc:
            raise ValueError("bad PDF hex string") from exc


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"


def _parse_value(lx: _Lexer):
    """One PDF object value (recursive); resolves `N G R` lookahead."""
    kind, val = lx.next_token()
    if kind is None:
        raise ValueError("unexpected end of PDF object data")
    if kind == "<<":
        d = {}
        while True:
            k, v = lx.next_token()
            if k == ">>":
                return d
            if k != "name":
                raise ValueError("PDF dict key must be a name")
            d[v] = _parse_value(lx)
    if kind == "[":
        arr = []
        while True:
            save = lx.i
            k, _ = lx.next_token()
            if k == "]":
                return arr
            lx.i = save
            arr.append(_parse_value(lx))
    if kind == "num" and isinstance(val, int):
        # lookahead for an indirect reference `num gen R`
        save = lx.i
        k2, v2 = lx.next_token()
        if k2 == "num" and isinstance(v2, int):
            save2 = lx.i
            k3, v3 = lx.next_token()
            if k3 == "kw" and v3 == "R":
                return _Ref(val, v2)
            lx.i = save2
        lx.i = save
        return val
    if kind == "kw":
        if val == "true":
            return True
        if val == "false":
            return False
        if val == "null":
            return None
        raise ValueError(f"unexpected PDF keyword {val!r}")
    return val


class PdfDocument:
    """Parsed PDF: lazily materialized indirect objects + trailer."""

    def __init__(self, data: bytes, offsets: dict[int, int], trailer: dict):
        self._data = data
        self._offsets = offsets
        self._trailer = trailer
        self._cache: dict[int, object] = {}
        self._parsing: set[int] = set()  # cycle guard for nested derefs

    @property
    def trailer(self) -> dict:
        return self._trailer

    def resolve(self, v):
        """Follow indirect references to the actual value."""
        seen = 0
        while isinstance(v, _Ref):
            v = self.get_object(v.num)
            seen += 1
            if seen > 64:
                raise ValueError("PDF reference chain too deep")
        return v

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self._parsing:
            # e.g. two streams whose /Length entries reference each
            # other — without this guard the mutual deref recurses
            # past the interpreter limit (RecursionError, off-contract)
            raise ValueError(f"PDF object {num} reference cycle")
        off = self._offsets.get(num)
        if off is None or not 0 <= off < len(self._data):
            raise ValueError(f"PDF object {num} missing from xref")
        self._parsing.add(num)
        try:
            return self._parse_object(num, off)
        finally:
            self._parsing.discard(num)

    def _parse_object(self, num: int, off: int):
        lx = _Lexer(self._data, off)
        k1, n1 = lx.next_token()
        k2, _g = lx.next_token()
        k3, kw = lx.next_token()
        if k1 != "num" or n1 != num or k2 != "num" or (k3, kw) != ("kw", "obj"):
            raise ValueError(f"malformed PDF object header at {off}")
        val = _parse_value(lx)
        # a stream keyword after the dict attaches raw stream bytes
        save = lx.i
        k4, kw4 = lx.next_token()
        if k4 == "kw" and kw4 == "stream":
            if not isinstance(val, dict):
                raise ValueError("PDF stream without a dict")
            # EOL after 'stream': CRLF or LF (§7.3.8.1)
            i = lx.i
            if self._data[i : i + 2] == b"\r\n":
                i += 2
            elif self._data[i : i + 1] == b"\n":
                i += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int) or length < 0 or length > MAX_STREAM:
                raise ValueError("bad PDF stream /Length")
            if i + length > len(self._data):
                raise ValueError("PDF stream overruns file")
            val = dict(val)
            val["__stream__"] = self._data[i : i + length]
        else:
            lx.i = save
        self._cache[num] = val
        return val

    def stream_data(self, obj: dict) -> bytes:
        """Decoded stream payload (FlateDecode or none)."""
        raw = obj.get("__stream__")
        if raw is None:
            raise ValueError("not a PDF stream object")
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        filters = [filt] if not isinstance(filt, list) else filt
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    dec = zlib.decompressobj()
                    raw = dec.decompress(raw, MAX_STREAM)
                    if dec.unconsumed_tail:
                        raise ValueError("PDF Flate stream exceeds cap")
                except zlib.error as exc:
                    raise ValueError("bad PDF Flate stream") from exc
            else:
                raise NotImplementedError(f"PDF filter {f} not supported")
        return raw


def parse_pdf(payload: bytes) -> PdfDocument:
    """PDF bytes -> :class:`PdfDocument` via the LAST startxref and a
    classic cross-reference TABLE chain (/Prev honored; xref STREAMS
    raise NotImplementedError — the PDF 1.5 compressed form)."""
    p = bytes(payload)
    if not p.startswith(b"%PDF-"):
        raise ValueError("not a PDF: bad header")
    tail = p[-2048:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        raise ValueError("PDF has no startxref")
    xref_off = int(m.group(1))
    offsets: dict[int, int] = {}
    trailer: dict = {}
    seen_offsets = set()
    while True:
        if xref_off in seen_offsets:
            raise ValueError("PDF xref chain cycle")
        seen_offsets.add(xref_off)
        if not 0 <= xref_off < len(p):
            raise ValueError("PDF startxref out of bounds")
        lx = _Lexer(p, xref_off)
        k, kw = lx.next_token()
        if k == "num":
            raise NotImplementedError("PDF xref streams not supported")
        if (k, kw) != ("kw", "xref"):
            raise ValueError("PDF xref table not found at startxref")
        while True:
            save = lx.i
            k, v = lx.next_token()
            if (k, v) == ("kw", "trailer"):
                break
            if k != "num":
                raise ValueError("malformed PDF xref subsection")
            k2, count = lx.next_token()
            if k2 != "num":
                raise ValueError("malformed PDF xref subsection header")
            first = int(v)
            count = int(count)
            if count < 0 or first < 0 or first + count > MAX_OBJECTS:
                raise ValueError("PDF xref subsection exceeds caps")
            lx._skip_ws()
            for j in range(count):
                ent = p[lx.i : lx.i + 20]
                if len(ent) < 18:
                    raise ValueError("truncated PDF xref entry")
                off_s, _gen_s, typ = ent[0:10], ent[11:16], ent[17:18]
                num = first + j
                # earlier tables in the chain win (they are newer)
                if typ == b"n" and num not in offsets:
                    offsets[num] = int(off_s)
                lx.i += 20 if len(ent) >= 20 else len(ent)
            del save
        t = _parse_value(lx)
        if not isinstance(t, dict):
            raise ValueError("PDF trailer is not a dict")
        for key, val in t.items():
            trailer.setdefault(key, val)
        prev = t.get("Prev")
        if prev is None:
            break
        xref_off = int(prev)
    if "Root" not in trailer:
        raise ValueError("PDF trailer has no /Root")
    return PdfDocument(p, offsets, trailer)


def _page_objects(doc: PdfDocument) -> list[dict]:
    """Catalog -> Pages tree -> leaf /Page dicts, depth-first (the
    document's page order), nested /Kids handled, cycles capped."""
    root = doc.resolve(doc.trailer["Root"])
    pages_root = doc.resolve(root.get("Pages"))
    if not isinstance(pages_root, dict):
        raise ValueError("PDF catalog has no /Pages")
    out: list[dict] = []
    stack = [pages_root]
    visits = 0
    while stack:
        node = stack.pop()
        visits += 1
        if visits > 4 * MAX_PAGES:
            raise ValueError("PDF page tree too large or cyclic")
        t = doc.resolve(node.get("Type"))
        if t == "Page":
            out.append(node)
            if len(out) > MAX_PAGES:
                raise ValueError("PDF page count exceeds cap")
            continue
        kids = doc.resolve(node.get("Kids"))
        if not isinstance(kids, list):
            raise ValueError("PDF page-tree node without /Kids")
        for kid in reversed(kids):
            k = doc.resolve(kid)
            if not isinstance(k, dict):
                raise ValueError("PDF page-tree kid is not a dict")
            stack.append(k)
    return out


def _text_from_content(data: bytes) -> list[str]:
    """Content-stream scan for the text-showing operators (§9.4.3):
    Tj and ' and " show one string, TJ shows an array of strings with
    interleaved kern numbers.  Each show operation emits one line;
    strings decode as Latin-1 (simple fonts — CID text is out of
    scope)."""
    lx = _Lexer(data, 0)
    stack: list = []
    lines: list[str] = []

    def show(v):
        if isinstance(v, bytes):
            lines.append(v.decode("latin-1"))

    while True:
        try:
            kind, val = lx.next_token()
        except ValueError:
            # inline image data or exotic operands: skip a byte, resync
            lx.i += 1
            continue
        if kind is None:
            return lines
        if kind == "kw":
            if val == "Tj" or val == "'":
                if stack:
                    show(stack[-1])
            elif val == '"':
                if stack:
                    show(stack[-1])
            elif val == "TJ":
                if stack and isinstance(stack[-1], list):
                    parts = [
                        e.decode("latin-1")
                        for e in stack[-1]
                        if isinstance(e, bytes)
                    ]
                    lines.append("".join(parts))
            stack.clear()
            continue
        if kind == "<<":
            # operand dict (e.g. BDC property list): parse and discard
            depth = 1
            while depth:
                k2, _ = lx.next_token()
                if k2 is None:
                    return lines
                if k2 == "<<":
                    depth += 1
                elif k2 == ">>":
                    depth -= 1
            continue
        if kind == "[":
            arr = []
            while True:
                save = lx.i
                k2, v2 = lx.next_token()
                if k2 == "]" or k2 is None:
                    break
                lx.i = save
                try:
                    arr.append(_parse_value(lx))
                except ValueError:
                    lx.i += 1
            stack.append(arr)
            continue
        stack.append(val)


def pdf_extract_text(payload: bytes) -> list[str]:
    """PDF bytes -> per-page extracted text (one string per page;
    lines within a page joined by newlines, in content order)."""
    doc = parse_pdf(payload)
    pages = _page_objects(doc)
    out = []
    for pg in pages:
        contents = doc.resolve(pg.get("Contents"))
        if contents is None:
            out.append("")
            continue
        streams = contents if isinstance(contents, list) else [contents]
        lines: list[str] = []
        for s in streams:
            s = doc.resolve(s)
            if not isinstance(s, dict) or "__stream__" not in s:
                raise ValueError("PDF page /Contents is not a stream")
            lines.extend(_text_from_content(doc.stream_data(s)))
        out.append("\n".join(lines))
    return out


# ---------------------------------------------------------------------------
# Encode — minimal conformant writer (the synth/oracle vehicle)
# ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1"):
        if ch in b"()\\":
            out += b"\\" + bytes([ch])
        else:
            out.append(ch)
    return bytes(out)


def encode_pdf(pages: list[list[str]], compress: bool = False,
               use_tj_array: bool = False,
               producer: str = "health-monitor-spark") -> bytes:
    """List of pages (each a list of text lines) -> complete PDF 1.4
    file: Catalog, Pages tree, one Page + one Content stream per page,
    a shared Type1 /Helvetica font, single xref table with exact byte
    offsets, trailer + startxref.  ``compress`` wraps content streams
    in /FlateDecode; ``use_tj_array`` shows each line via the TJ
    array-with-kerning form instead of plain Tj."""
    if not pages:
        raise ValueError("PDF needs at least one page")
    n_pages = len(pages)
    # object numbering: 1 Catalog, 2 Pages, 3 Font,
    # then per page i: 4+2i Page, 5+2i Contents
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, lines in enumerate(pages):
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(lines):
            if j > 0:
                body += b"T*\n"
            if use_tj_array:
                # split the RAW line (never the escaped bytes — a cut
                # inside an escape sequence corrupts the string) around
                # the midpoint with a kern number between the halves
                mid = len(line) // 2
                body += (
                    b"[(" + _escape_pdf_string(line[:mid])
                    + b") -250 ("
                    + _escape_pdf_string(line[mid:]) + b")] TJ\n"
                )
            else:
                body += b"(" + _escape_pdf_string(line) + b") Tj\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data, 6)
            stream_dict = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
            )
        else:
            stream_dict = f"<< /Length {len(data)} >>".encode()
        objs[5 + 2 * i] = stream_dict + b"\nstream\n" + data + b"\nendstream"
        objs[4 + 2 * i] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode()
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    max_obj = 3 + 2 * n_pages
    for num in range(1, max_obj + 1):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {max_obj + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
