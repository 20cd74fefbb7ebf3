"""SQLite database file walk — the other ubiquitous foreign data file.

App exports, ML experiment trackers, browser histories, and countless
crawl byproducts arrive as ``.sqlite``/``.db`` files; a corpus engine
should read their tables without shelling out to a driver.  This
walks the PUBLIC SQLite file format (sqlite.org/fileformat2.html)
from scratch — the STDLIB ``sqlite3`` module is used ONLY to write
test fixtures, making every byte of this parser cross-validated
against the reference implementation's writer:

* the 100-byte header (magic, big-endian page size with the 1 ⇒
  65536 escape, usable-size reserve, page count, text encoding);
* table b-trees: leaf (0x0D) and interior (0x05) pages, big-endian
  cell pointer arrays, varint payload lengths and rowids, interior
  right-most pointers, depth-first in-rowid-order traversal;
* the record format: header-length varint then serial types — NULL,
  1/2/3/4/6/8-byte big-endian twos-complement ints, float64, the
  constant 0/1 types, and (N-13)/2 text / (N-12)/2 blob;
* overflow page chains with the spec's local-payload formula
  (X = U-35, M = ((U-12)*32//255)-23, K = M+(P-M)%(U-4));
* ``sqlite_master`` on page 1 (cells offset by the 100-byte header)
  resolved by table name to its root page;
* INTEGER PRIMARY KEY columns (rowid aliases) stored as NULL in the
  record and materialized from the cell rowid.

UTF-8 databases only (encoding 1) — others raise, as does any
structural violation.
"""

from __future__ import annotations

import struct

MAX_PAGES = 1 << 20
MAX_CELLS = 1 << 22
MAX_DEPTH = 32


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte
    contributes 8 bits."""
    v = 0
    for i in range(8):
        if pos >= len(data):
            raise ValueError("sqlite varint past end")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    if pos >= len(data):
        raise ValueError("sqlite varint past end")
    v = (v << 8) | data[pos]
    if v >= 1 << 63:
        v -= 1 << 64
    return v, pos + 1


class SQLiteFile:
    def __init__(self, data: bytes):
        if data[:16] != b"SQLite format 3\x00":
            raise ValueError("not a SQLite 3 database")
        (ps,) = struct.unpack_from(">H", data, 16)
        self.page_size = 65536 if ps == 1 else ps
        if not 512 <= self.page_size <= 65536:
            raise ValueError("sqlite page size out of range")
        reserve = data[20]
        self.usable = self.page_size - reserve
        (self.n_pages,) = struct.unpack_from(">I", data, 28)
        (enc,) = struct.unpack_from(">I", data, 56)
        if enc != 1:
            raise ValueError("only UTF-8 sqlite databases supported")
        if self.n_pages > MAX_PAGES or \
                self.n_pages * self.page_size > len(data):
            raise ValueError("sqlite page count overruns file")
        self.data = data

    def _page(self, pgno: int) -> tuple[bytes, int]:
        """1-based page -> (page bytes, header offset within page)."""
        if not 1 <= pgno <= self.n_pages:
            raise ValueError(f"sqlite page {pgno} out of range")
        off = (pgno - 1) * self.page_size
        page = self.data[off:off + self.page_size]
        return page, 100 if pgno == 1 else 0

    def _payload(self, page: bytes, pos: int, plen: int) -> bytes:
        """Assemble a cell payload, following overflow pages."""
        u = self.usable
        x = u - 35
        if plen <= x:
            return page[pos:pos + plen]
        m = ((u - 12) * 32 // 255) - 23
        k = m + (plen - m) % (u - 4)
        local = k if k <= x else m
        out = bytearray(page[pos:pos + local])
        (nxt,) = struct.unpack_from(">I", page, pos + local)
        seen = 0
        while nxt:
            opage, _ = self._page(nxt)
            (nxt,) = struct.unpack_from(">I", opage, 0)
            out += opage[4:u]
            seen += 1
            if seen > MAX_PAGES:
                raise ValueError("sqlite overflow chain loop")
        if len(out) < plen:
            raise ValueError("sqlite overflow chain short")
        return bytes(out[:plen])

    def _walk_table(self, pgno: int, out: list, depth: int = 0) -> None:
        if depth > MAX_DEPTH:
            raise ValueError("sqlite b-tree too deep")
        page, h = self._page(pgno)
        ptype = page[h]
        (n_cells,) = struct.unpack_from(">H", page, h + 3)
        if len(out) + n_cells > MAX_CELLS:
            raise ValueError("sqlite cell cap exceeded")
        if ptype == 0x0D:  # leaf table
            for i in range(n_cells):
                (cp,) = struct.unpack_from(">H", page, h + 8 + 2 * i)
                plen, pos = _varint(page, cp)
                rowid, pos = _varint(page, pos)
                out.append((rowid, self._payload(page, pos, plen)))
        elif ptype == 0x05:  # interior table
            (right,) = struct.unpack_from(">I", page, h + 8)
            for i in range(n_cells):
                (cp,) = struct.unpack_from(">H", page, h + 12 + 2 * i)
                (child,) = struct.unpack_from(">I", page, cp)
                self._walk_table(child, out, depth + 1)
            self._walk_table(right, out, depth + 1)
        else:
            raise ValueError(f"unexpected sqlite page type 0x{ptype:02x}")

    @staticmethod
    def _record(payload: bytes, rowid: int) -> list:
        hlen, pos = _varint(payload, 0)
        serials = []
        while pos < hlen:
            s, pos = _varint(payload, pos)
            serials.append(s)
        if pos != hlen:
            raise ValueError("sqlite record header length mismatch")
        vals = []
        for s in serials:
            if s == 0:
                vals.append(None)
            elif 1 <= s <= 6:
                n = (1, 2, 3, 4, 6, 8)[s - 1]
                v = int.from_bytes(payload[pos:pos + n], "big",
                                   signed=True)
                pos += n
                vals.append(v)
            elif s == 7:
                (v,) = struct.unpack_from(">d", payload, pos)
                pos += 8
                vals.append(v)
            elif s in (8, 9):
                vals.append(s - 8)
            elif s >= 12 and s % 2 == 0:
                n = (s - 12) // 2
                vals.append(payload[pos:pos + n])
                pos += n
            elif s >= 13:
                n = (s - 13) // 2
                vals.append(payload[pos:pos + n].decode("utf-8"))
                pos += n
            else:
                raise ValueError(f"sqlite serial type {s} unsupported")
        # an INTEGER PRIMARY KEY column is stored as NULL; the caller
        # substitutes the rowid (done here for column 0 convention)
        return vals

    def master_rows(self) -> list[dict]:
        """sqlite_master: [{type, name, tbl_name, rootpage, sql}]."""
        cells: list = []
        self._walk_table(1, cells)
        rows = []
        for rowid, payload in cells:
            v = self._record(payload, rowid)
            if len(v) < 5:
                raise ValueError("malformed sqlite_master row")
            rows.append({"type": v[0], "name": v[1], "tbl_name": v[2],
                         "rootpage": v[3], "sql": v[4]})
        return rows

    def read_table(self, name: str) -> list[tuple[int, list]]:
        """[(rowid, values)] for the named table, rowid order."""
        root = None
        for r in self.master_rows():
            if r["type"] == "table" and r["name"] == name:
                root = r["rootpage"]
                break
        if root is None:
            raise ValueError(f"sqlite table {name!r} not found")
        cells: list = []
        self._walk_table(root, cells)
        return [(rowid, self._record(payload, rowid))
                for rowid, payload in cells]


def read_sqlite_table(data: bytes, name: str) -> list[tuple[int, list]]:
    return SQLiteFile(data).read_table(name)
