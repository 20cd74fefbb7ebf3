"""EPUB (OCF/OPF, EPUB 3) text extraction by composition.

The dominant e-book corpus format.  The OCF container is plain ZIP —
stdlib ``zipfile`` under the same policy as the shard-archive walk —
while the package plumbing uses THIS repo's from-scratch XML parser
(``operators/xml.py``) and the chapter text the repo's own
stdlib-HTMLParser extractor (``operators/warc.py``
``html_extract_text``), so the rules under test are our own:

* ``parse_epub`` — ``META-INF/container.xml`` -> rootfile full-path
  -> OPF package (``dc:title`` metadata, manifest id->href map,
  spine itemref order) -> spine chapters resolved relative to the OPF
  directory, each XHTML body extracted to plain text.
* ``build_epub`` — minimal conformant writer (mimetype STORED first
  per OCF §3.3, container.xml, content.opf, chapter XHTML), the
  synth/oracle vehicle.

Hostile input raises ``ValueError``; parts are cap-bounded.
"""

from __future__ import annotations

import io
import posixpath
import zipfile

from .warc import html_extract_text
from .xml import parse_xml

MAX_PART_BYTES = 1 << 26
MAX_CHAPTERS = 1 << 12

_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
    'xmlns:container"><rootfiles>'
    '<rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)


def _esc(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_epub(chapters: list[tuple[str, list[str]]],
               title: str = "synth book") -> bytes:
    """[(chapter heading, [paragraph, ...])] -> complete .epub bytes:
    mimetype (STORED, first member), container.xml, content.opf with
    manifest+spine, one XHTML file per chapter.  Deterministic."""
    items = []
    refs = []
    files = []
    for k, (head, paras) in enumerate(chapters):
        name = f"chap{k}.xhtml"
        body = "".join(f"<p>{_esc(p)}</p>" for p in paras)
        # no <head><title>: html_extract_text keeps title text (it is
        # visible data), which would double the heading tokens
        xhtml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<body><h1>{_esc(head)}</h1>{body}</body></html>"
        )
        items.append(
            f'<item id="c{k}" href="{name}" '
            'media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="c{k}"/>')
        files.append((f"OEBPS/{name}", xhtml))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_esc(title)}</dc:title>"
        '<dc:identifier id="uid">urn:synth</dc:identifier>'
        "</metadata>"
        f'<manifest>{"".join(items)}</manifest>'
        f'<spine>{"".join(refs)}</spine>'
        "</package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        mt = zipfile.ZipInfo("mimetype")  # OCF: first, uncompressed
        mt.compress_type = zipfile.ZIP_STORED
        zf.writestr(mt, "application/epub+zip")
        for name, data in [
            ("META-INF/container.xml", _CONTAINER),
            ("OEBPS/content.opf", opf),
            *files,
        ]:
            info = zipfile.ZipInfo(name)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def parse_epub(payload: bytes) -> dict:
    """.epub bytes -> {'title', 'chapters': [{'href', 'text'}]} with
    chapters in SPINE order and text via html_extract_text (tokens
    space-joined, script/style subtrees dropped)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as exc:
        raise ValueError("not an EPUB: bad zip container") from exc
    with zf:
        names = set(zf.namelist())
        if "META-INF/container.xml" not in names:
            raise ValueError("not an EPUB: no META-INF/container.xml")

        def read(name: str) -> bytes:
            if zf.getinfo(name).file_size > MAX_PART_BYTES:
                raise ValueError("EPUB part exceeds cap")
            return zf.read(name)

        container = parse_xml(read("META-INF/container.xml"))
        rootfile = container.first("rootfile")
        if rootfile is None:
            raise ValueError("EPUB container.xml has no rootfile")
        opf_path = rootfile.attrs.get("full-path")
        if not opf_path or opf_path not in names:
            raise ValueError("EPUB rootfile path missing from archive")
        opf = parse_xml(read(opf_path))
        t = opf.first("title")
        title = t.text if t is not None else ""
        manifest = {}
        for item in opf.find_all("item"):
            iid, href = item.attrs.get("id"), item.attrs.get("href")
            if iid and href:
                manifest[iid] = href
        base = posixpath.dirname(opf_path)
        chapters = []
        for ref in opf.find_all("itemref"):
            if len(chapters) >= MAX_CHAPTERS:
                raise ValueError("EPUB chapter count exceeds cap")
            href = manifest.get(ref.attrs.get("idref", ""))
            if href is None:
                raise ValueError("EPUB spine idref missing from manifest")
            path = posixpath.normpath(posixpath.join(base, href))
            if path not in names:
                raise ValueError(f"EPUB chapter {path} missing")
            chapters.append(
                {
                    "href": href,
                    "text": html_extract_text(
                        read(path).decode("utf-8")
                    ),
                }
            )
    return {"title": title, "chapters": chapters}
