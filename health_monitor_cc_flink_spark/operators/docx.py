"""DOCX (ECMA-376 WordprocessingML) text extraction by composition.

A top-5 real-corpus document format.  The OOXML container is plain
ZIP — opened with stdlib ``zipfile`` under the same policy as the
shard-archive walk (the container is not the format under test) — and
the parts are parsed with THIS repo's from-scratch XML parser
(``operators/xml.py``), so the WordprocessingML rules under test are
our own:

* ``parse_docx`` — ``word/document.xml`` body walk: one entry per
  ``w:p`` paragraph in document order, text reassembled from its
  ``w:t`` runs (``w:tab`` -> TAB, ``w:br``/``w:cr`` -> newline, all in
  run order), paragraph style from ``w:pPr/w:pStyle@w:val``; document
  title/creator from ``docProps/core.xml`` Dublin Core fields when
  present.
* ``build_docx`` — minimal conformant writer ([Content_Types].xml,
  _rels, document.xml, core.xml), the synth/oracle vehicle; each
  paragraph's text is split across two ``w:r`` runs at the word
  midpoint so multi-run reassembly is always exercised.

Hostile input raises ``ValueError`` (bad zip, missing parts, malformed
XML, caps); sizes are bounded by the archive caps.
"""

from __future__ import annotations

import io
import zipfile

from .xml import XmlNode, parse_xml

MAX_PART_BYTES = 1 << 26
MAX_PARAGRAPHS = 1 << 16

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/'
    'vnd.openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'package/2006/relationships/metadata/core-properties" '
    'Target="docProps/core.xml"/>'
    "</Relationships>"
)

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _esc(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _attr_local(node: XmlNode, local: str) -> str | None:
    """Attribute lookup by LOCAL name (w:val and val both match)."""
    for k, v in node.attrs.items():
        if k.rsplit(":", 1)[-1] == local:
            return v
    return None


def build_docx(paragraphs: list[tuple[str, bool]],
               title: str = "", creator: str = "health-monitor-spark",
               compress: bool = True) -> bytes:
    """[(paragraph text, is_heading)] -> complete .docx bytes.
    Heading paragraphs get ``w:pStyle w:val="Heading1"``.  Each
    paragraph is emitted as TWO runs split at the word midpoint (the
    multi-run shape real writers produce).  Deterministic: fixed 1980
    zip timestamps, fixed member order."""
    body = []
    for text, heading in paragraphs:
        words = text.split(" ")
        mid = len(words) // 2
        if mid == 0:
            runs = [text]
        else:
            # text == join(words[:mid]) + " " + join(words[mid:])
            # whenever 0 < mid < len(words); the separator lives in run 1
            runs = [" ".join(words[:mid]) + " ", " ".join(words[mid:])]
        ppr = (
            '<w:pPr><w:pStyle w:val="Heading1"/></w:pPr>' if heading else ""
        )
        rs = "".join(
            f'<w:r><w:t xml:space="preserve">{_esc(r)}</w:t></w:r>'
            for r in runs
        )
        body.append(f"<w:p>{ppr}{rs}</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(body)
        + "<w:sectPr/></w:body></w:document>"
    )
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
        'package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_esc(title)}</dc:title>"
        f"<dc:creator>{_esc(creator)}</dc:creator>"
        "</cp:coreProperties>"
    )
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("[Content_Types].xml", _CT),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document),
            ("docProps/core.xml", core),
        ):
            info = zipfile.ZipInfo(name)  # fixed 1980 date
            info.compress_type = comp
            zf.writestr(info, data)
    return buf.getvalue()


def _para_text(p: XmlNode) -> str:
    """Reassemble one w:p's text from its runs in document order:
    w:t text, w:tab -> TAB, w:br / w:cr -> newline."""
    parts: list[str] = []
    stack = list(reversed(p.children))
    while stack:
        n = stack.pop()
        loc = n.local()
        if loc == "t":
            parts.append(n.text)
            continue  # w:t has no element children that carry text
        if loc == "tab":
            parts.append("\t")
        elif loc in ("br", "cr"):
            parts.append("\n")
        elif loc == "pPr":
            continue  # properties never carry body text
        stack.extend(reversed(n.children))
    return "".join(parts)


def parse_docx(payload: bytes) -> dict:
    """.docx bytes -> {'title', 'creator', 'paragraphs':
    [{'text', 'heading'}]} — paragraphs in document order, heading =
    pStyle value starting with 'Heading'."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except zipfile.BadZipFile as exc:
        raise ValueError("not a DOCX: bad zip container") from exc
    with zf:
        names = set(zf.namelist())
        if "word/document.xml" not in names:
            raise ValueError("not a DOCX: no word/document.xml")
        info = zf.getinfo("word/document.xml")
        if info.file_size > MAX_PART_BYTES:
            raise ValueError("DOCX document part exceeds cap")
        doc = parse_xml(zf.read("word/document.xml"))
        title = creator = ""
        if "docProps/core.xml" in names:
            core = parse_xml(zf.read("docProps/core.xml"))
            t = core.first("title")
            c = core.first("creator")
            title = t.text if t is not None else ""
            creator = c.text if c is not None else ""
    if doc.local() != "document":
        raise ValueError("DOCX root element is not w:document")
    body = doc.first("body")
    if body is None:
        raise ValueError("DOCX document.xml has no w:body")
    paras = []
    for p in body.find_all("p"):
        if len(paras) >= MAX_PARAGRAPHS:
            raise ValueError("DOCX paragraph count exceeds cap")
        style = None
        ppr = p.first("pPr")
        if ppr is not None:
            ps = ppr.first("pStyle")
            if ps is not None:
                style = _attr_local(ps, "val")
        paras.append(
            {
                "text": _para_text(p),
                "heading": bool(style and style.startswith("Heading")),
            }
        )
    return {"title": title, "creator": creator, "paragraphs": paras}
