"""PDF structural parse + text extraction in pure stdlib (zlib only).

The single most common document format in crawled corpora.  Implemented
from the PUBLIC ISO 32000-1 (PDF 1.7) object model — structure only,
like TIFF/BMP: lexer for the object syntax (dicts, arrays, names,
strings with escapes, hex strings, numbers, indirect references),
cross-reference TABLE + trailer walk, page-tree traversal, content
streams (optionally /Filter /FlateDecode via stdlib zlib), and the
text-showing operators (Tj, TJ, ', ") of the content-stream language.

* ``parse_pdf`` — header check, startxref/trailer/xref walk over BOTH
  classic tables and PDF 1.5 cross-reference STREAMS (ISO 32000-1
  §7.5.8: /W-field binary entries, /Index subsections, optional PNG /
  TIFF predictors per §7.4.4.4), hybrid-reference files (/XRefStm,
  §7.5.8.4: the stream is consulted before its companion table),
  object streams (/Type /ObjStm, §7.5.7), free-entry tombstones so a
  newer revision's 'f' entry shadows an older offset, lazily-parsed
  indirect objects, reference resolution.
* ``pdf_extract_text`` — Catalog -> Pages tree (nested /Kids) -> per
  page /Contents (single stream or array), FlateDecode, text operator
  scan; every Tj/TJ/'/" emits one line, pages joined by newlines.
* ``encode_pdf`` — writes spec-conformant single-xref files (header,
  objects, xref table with exact byte offsets, trailer, startxref):
  the synth/oracle vehicle, with plain or Flate content streams and
  Tj or TJ-array text forms.

Out of scope (explicit ``NotImplementedError``, never wrong output):
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

    def __init__(self, data: bytes, offsets: dict[int, int], trailer: dict,
                 compressed: dict[int, tuple[int, int]] | None = None):
        self._data = data
        self._offsets = offsets
        # objnum -> (container ObjStm objnum, index within) for type-2
        # xref-stream entries (PDF 1.5 object streams, §7.5.7)
        self._compressed = compressed or {}
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
        if off is None:
            loc = self._compressed.get(num)
            if loc is None:
                raise ValueError(f"PDF object {num} missing from xref")
            self._parsing.add(num)
            try:
                self._load_objstm(loc[0])
            finally:
                self._parsing.discard(num)
            if num not in self._cache:
                raise ValueError(
                    f"PDF object {num} not found in object stream {loc[0]}"
                )
            return self._cache[num]
        if not 0 <= off < len(self._data):
            raise ValueError(f"PDF object {num} missing from xref")
        self._parsing.add(num)
        try:
            return self._parse_object(num, off)
        finally:
            self._parsing.discard(num)

    def _load_objstm(self, stm_num: int):
        """Decode an object stream (§7.5.7) and cache ALL its objects:
        N pairs of (objnum, relative offset) then the packed values at
        /First + offset.  Objects inside an ObjStm are direct values
        (no `obj` header, never streams)."""
        stm = self.get_object(stm_num)
        if not isinstance(stm, dict) or self.resolve(stm.get("Type")) != "ObjStm":
            raise ValueError(f"PDF object {stm_num} is not an ObjStm")
        data = self.stream_data(stm)
        n = self.resolve(stm.get("N"))
        first = self.resolve(stm.get("First"))
        if not isinstance(n, int) or not isinstance(first, int) \
                or n < 0 or n > MAX_OBJECTS or not 0 <= first <= len(data):
            raise ValueError("bad PDF ObjStm /N or /First")
        lx = _Lexer(data)
        pairs = []
        for _ in range(n):
            k1, onum = lx.next_token()
            k2, ooff = lx.next_token()
            if k1 != "num" or k2 != "num":
                raise ValueError("malformed PDF ObjStm pair table")
            pairs.append((int(onum), int(ooff)))
        for onum, ooff in pairs:
            if not 0 <= first + ooff <= len(data):
                raise ValueError("PDF ObjStm offset out of bounds")
            # an xref entry elsewhere (newer revision) wins over the
            # ObjStm copy; only fill objects still routed here
            if onum in self._cache or self._compressed.get(onum, (None,))[0] != stm_num:
                continue
            vlx = _Lexer(data, first + ooff)
            self._cache[onum] = _parse_value(vlx)

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
        """Decoded stream payload (FlateDecode or none), honoring
        /DecodeParms predictors (§7.4.4.4 — PNG row filters and the
        TIFF horizontal differencer)."""
        raw = obj.get("__stream__")
        if raw is None:
            raise ValueError("not a PDF stream object")
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        parms = self.resolve(
            obj.get("DecodeParms", obj.get("DP"))
        )
        filters = [filt] if not isinstance(filt, list) else filt
        parms_list = [parms] if not isinstance(parms, list) else parms
        for idx, f in enumerate(filters):
            f = self.resolve(f)
            if f == "FlateDecode":
                raw = _inflate_capped(raw)
                pm = self.resolve(
                    parms_list[idx] if idx < len(parms_list) else None
                )
                if isinstance(pm, dict):
                    raw = _apply_predictor(raw, {
                        k: self.resolve(v) for k, v in pm.items()
                    })
            else:
                raise NotImplementedError(f"PDF filter {f} not supported")
        return raw


def _inflate_capped(raw: bytes) -> bytes:
    try:
        dec = zlib.decompressobj()
        out = dec.decompress(raw, MAX_STREAM)
        if dec.unconsumed_tail:
            raise ValueError("PDF Flate stream exceeds cap")
        return out
    except zlib.error as exc:
        raise ValueError("bad PDF Flate stream") from exc


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    """§7.4.4.4 predictor functions over decoded Flate data.
    Predictor 1 = none, 2 = TIFF horizontal differencing, >= 10 = PNG
    row filters (each row leads with its filter-type byte; the stored
    Predictor value only signals 'PNG', the per-row byte governs)."""
    pred = parms.get("Predictor", 1)
    if pred == 1:
        return data
    columns = parms.get("Columns", 1)
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    if not (isinstance(pred, int) and isinstance(columns, int)
            and isinstance(colors, int) and isinstance(bpc, int)) \
            or columns < 1 or colors < 1 or bpc < 1:
        raise ValueError("bad PDF predictor parameters")
    bpp = max(1, (colors * bpc + 7) // 8)
    stride = (colors * bpc * columns + 7) // 8
    if pred == 2:
        if bpc != 8:
            raise NotImplementedError("TIFF predictor with bpc != 8")
        out = bytearray(data)
        for r in range(0, len(out) - stride + 1, stride):
            for i in range(bpp, stride):
                out[r + i] = (out[r + i] + out[r + i - bpp]) & 255
        return bytes(out)
    if pred < 10:
        raise ValueError(f"unknown PDF predictor {pred}")
    if len(data) % (stride + 1):
        raise ValueError("PDF PNG-predicted data not row-aligned")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(0, len(data), stride + 1):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + stride])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 255
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 255
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                row[i] = (row[i] + (a if pa <= pb and pa <= pc
                                    else b if pb <= pc else c)) & 255
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _read_stream_object_at(p: bytes, off: int):
    """Parse `N G obj << dict >> stream ... endstream` at a byte
    offset WITHOUT an xref map.  Used for cross-reference streams,
    whose /Length must be a direct integer (§7.5.8.2)."""
    lx = _Lexer(p, off)
    k1, num = lx.next_token()
    k2, _g = lx.next_token()
    k3, kw = lx.next_token()
    if k1 != "num" or k2 != "num" or (k3, kw) != ("kw", "obj"):
        raise ValueError(f"malformed PDF object header at {off}")
    val = _parse_value(lx)
    if not isinstance(val, dict):
        raise ValueError("PDF xref stream object is not a stream dict")
    k4, kw4 = lx.next_token()
    if (k4, kw4) != ("kw", "stream"):
        raise ValueError("PDF xref stream object has no stream body")
    i = lx.i
    if p[i : i + 2] == b"\r\n":
        i += 2
    elif p[i : i + 1] == b"\n":
        i += 1
    length = val.get("Length")
    if not isinstance(length, int) or length < 0 or length > MAX_STREAM \
            or i + length > len(p):
        raise ValueError("bad PDF xref stream /Length")
    val = dict(val)
    val["__stream__"] = p[i : i + length]
    return int(num), val


def _xref_stream_entries(p: bytes, off: int):
    """Decode a PDF 1.5 cross-reference stream (§7.5.8) at a byte
    offset -> (entries, stream_dict) where each entry is
    (objnum, type, field2, field3): type 0 free, 1 = byte offset,
    2 = (ObjStm objnum, index)."""
    _num, stm = _read_stream_object_at(p, off)
    if stm.get("Type") != "XRef":
        raise ValueError("PDF xref stream missing /Type /XRef")
    # self-decoding: /Length, /W, /Index, /Size must all be direct
    filt = stm.get("Filter")
    raw = stm["__stream__"]
    if filt == "FlateDecode" or filt == ["FlateDecode"]:
        raw = _inflate_capped(raw)
        pm = stm.get("DecodeParms", stm.get("DP"))
        if isinstance(pm, list):
            pm = pm[0] if pm else None
        if isinstance(pm, dict):
            raw = _apply_predictor(raw, pm)
    elif filt is not None:
        raise NotImplementedError(f"PDF xref stream filter {filt}")
    w = stm.get("W")
    size = stm.get("Size")
    if not (isinstance(w, list) and len(w) >= 3
            and all(isinstance(x, int) and 0 <= x <= 8 for x in w[:3])) \
            or not isinstance(size, int):
        raise ValueError("bad PDF xref stream /W or /Size")
    w0, w1, w2 = w[0], w[1], w[2]
    index = stm.get("Index", [0, size])
    if not (isinstance(index, list) and len(index) % 2 == 0
            and all(isinstance(x, int) and x >= 0 for x in index)):
        raise ValueError("bad PDF xref stream /Index")
    rowlen = w0 + w1 + w2
    if rowlen == 0:
        raise ValueError("PDF xref stream with zero-width rows")
    entries = []
    pos = 0
    for s in range(0, len(index), 2):
        first, count = index[s], index[s + 1]
        if first + count > MAX_OBJECTS:
            raise ValueError("PDF xref stream subsection exceeds caps")
        for j in range(count):
            row = raw[pos : pos + rowlen]
            if len(row) < rowlen:
                raise ValueError("truncated PDF xref stream data")
            pos += rowlen
            f1 = int.from_bytes(row[:w0], "big") if w0 else 1
            f2 = int.from_bytes(row[w0 : w0 + w1], "big")
            f3 = int.from_bytes(row[w0 + w1 :], "big")
            entries.append((first + j, f1, f2, f3))
    return entries, stm


def parse_pdf(payload: bytes) -> PdfDocument:
    """PDF bytes -> :class:`PdfDocument` via the LAST startxref and the
    cross-reference chain (/Prev honored), supporting classic TABLES,
    PDF 1.5 xref STREAMS, and hybrid files (/XRefStm — consulted
    before its companion table per §7.5.8.4).  Within the chain the
    newest entry for an object wins regardless of type: a free ('f' /
    type-0) entry in a newer revision tombstones the object so stale
    offsets from older revisions are never resurrected."""
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
    compressed: dict[int, tuple[int, int]] = {}
    seen_nums: set[int] = set()
    trailer: dict = {}
    seen_offsets = set()

    def apply(entries):
        # first-seen wins across the newest-first walk; free entries
        # tombstone (claim the objnum, record no location)
        for num, typ, f2, f3 in entries:
            if num in seen_nums:
                continue
            seen_nums.add(num)
            if typ == 1:
                offsets[num] = f2
            elif typ == 2:
                compressed[num] = (f2, f3)
            elif typ != 0:
                raise ValueError(f"unknown PDF xref entry type {typ}")

    while True:
        if xref_off in seen_offsets:
            raise ValueError("PDF xref chain cycle")
        seen_offsets.add(xref_off)
        if not 0 <= xref_off < len(p):
            raise ValueError("PDF startxref out of bounds")
        lx = _Lexer(p, xref_off)
        k, kw = lx.next_token()
        if k == "num":
            entries, t = _xref_stream_entries(p, xref_off)
            apply(entries)
        elif (k, kw) == ("kw", "xref"):
            table_entries = []
            while True:
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
                    if typ == b"n":
                        table_entries.append((first + j, 1, int(off_s), 0))
                    elif typ == b"f":
                        table_entries.append((first + j, 0, 0, 0))
                    else:
                        raise ValueError("malformed PDF xref entry type")
                    lx.i += 20 if len(ent) >= 20 else len(ent)
            t = _parse_value(lx)
            if not isinstance(t, dict):
                raise ValueError("PDF trailer is not a dict")
            xstm = t.get("XRefStm")
            if isinstance(xstm, int) and 0 <= xstm < len(p):
                # hybrid file: the companion stream's entries take
                # precedence over this table's (§7.5.8.4)
                s_entries, _ = _xref_stream_entries(p, xstm)
                apply(s_entries)
            apply(table_entries)
        else:
            raise ValueError("PDF xref not found at startxref")
        for key, val in t.items():
            trailer.setdefault(key, val)
        prev = t.get("Prev")
        if prev is None:
            break
        xref_off = int(prev)
    if "Root" not in trailer:
        raise ValueError("PDF trailer has no /Root")
    return PdfDocument(p, offsets, trailer, compressed)


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
               producer: str = "health-monitor-spark",
               xref_stream: bool = False, use_objstm: bool = False,
               predictor: bool = False) -> bytes:
    """List of pages (each a list of text lines) -> complete PDF file:
    Catalog, Pages tree, one Page + one Content stream per page, a
    shared Type1 /Helvetica font, exact byte offsets, trailer +
    startxref.  ``compress`` wraps content streams in /FlateDecode;
    ``use_tj_array`` shows each line via the TJ array-with-kerning
    form instead of plain Tj.  ``xref_stream`` writes a PDF 1.5
    cross-reference STREAM (/W [1 4 2] binary entries) instead of the
    classic table; ``use_objstm`` additionally packs every non-stream
    object (Catalog/Pages/Font/Page dicts) into a /Type /ObjStm with
    type-2 xref entries; ``predictor`` filters the xref stream rows
    with the PNG Up predictor (/DecodeParms /Predictor 12) — the form
    nearly every real-world 1.5+ writer emits."""
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
    max_obj = 3 + 2 * n_pages
    if not xref_stream:
        if use_objstm or predictor:
            raise ValueError("use_objstm/predictor require xref_stream")
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = {}
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

    # ---- PDF 1.5: binary xref stream, optionally ObjStm-packed ----
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    # entry per objnum: (type, f2, f3); 0 is always the free head
    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
    offsets = {}
    if use_objstm:
        # streams may not live inside an ObjStm (§7.5.7) — content
        # streams stay top-level, every dict-only object is packed
        packed = [n for n in range(1, max_obj + 1)
                  if not (n >= 5 and n % 2 == 1)]
        stream_objs = [n for n in range(1, max_obj + 1) if n not in packed]
        objstm_num = max_obj + 1
        xref_num = max_obj + 2
        header = []
        body = bytearray()
        for n in packed:
            header.append(f"{n} {len(body)}")
            body += objs[n] + b"\n"
        hdr = (" ".join(header) + "\n").encode()
        payload = zlib.compress(hdr + bytes(body), 6)
        objstm_dict = (
            f"<< /Type /ObjStm /N {len(packed)} /First {len(hdr)} "
            f"/Length {len(payload)} /Filter /FlateDecode >>"
        ).encode()
        for idx, n in enumerate(packed):
            entries[n] = (2, objstm_num, idx)
        for n in stream_objs:
            offsets[n] = len(out)
            out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
            entries[n] = (1, offsets[n], 0)
        objstm_off = len(out)
        out += (f"{objstm_num} 0 obj\n".encode() + objstm_dict
                + b"\nstream\n" + payload + b"\nendstream\nendobj\n")
        entries[objstm_num] = (1, objstm_off, 0)
    else:
        xref_num = max_obj + 1
        for n in range(1, max_obj + 1):
            offsets[n] = len(out)
            out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
            entries[n] = (1, offsets[n], 0)
    xref_off = len(out)
    entries[xref_num] = (1, xref_off, 0)
    size = xref_num + 1
    rows = bytearray()
    prev_row = bytes(7)
    for n in range(size):
        t, f2, f3 = entries[n]
        row = bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        if predictor:  # PNG Up filter per row
            rows += bytes([2]) + bytes(
                (row[i] - prev_row[i]) & 255 for i in range(7)
            )
            prev_row = row
        else:
            rows += row
    payload = zlib.compress(bytes(rows), 6)
    parms = " /DecodeParms << /Predictor 12 /Columns 7 >>" if predictor else ""
    xdict = (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R "
        f"/Length {len(payload)} /Filter /FlateDecode{parms} >>"
    ).encode()
    out += (f"{xref_num} 0 obj\n".encode() + xdict
            + b"\nstream\n" + payload + b"\nendstream\nendobj\n")
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)
