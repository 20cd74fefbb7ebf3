"""Minimal well-formed-XML parser + sitemap/RSS extraction, pure
stdlib (no xml.etree — the parse rules under test are the ones
documented here).

Crawl pipelines live on XML artifacts: sitemaps feed the URL frontier
(composing with the repo's url_parse / robots / domain-quota ops) and
RSS/Atom feeds are a standing text-corpus source.  Implemented from
the PUBLIC XML 1.0 subset real sitemap/feed documents use:

* ``parse_xml`` — prolog/comments/processing instructions skipped,
  element tree with attributes (quoted values), text content with the
  five predefined entities (&amp; &lt; &gt; &quot; &apos;) plus
  decimal/hex character references, CDATA sections verbatim,
  self-closing tags, tag-balance enforcement.  Namespace prefixes are
  KEPT as written (``ns:tag``); callers match local names.
* ``sitemap_urls`` — <urlset><url><loc/lastmod/priority> rows (and
  <sitemapindex> nesting detection).
* ``rss_items`` — RSS 2.0 <channel><item> title/link/pubDate and Atom
  <feed><entry> title/link@href/updated, CDATA titles included.

Malformed input raises ``ValueError``; depth/node caps bound hostile
documents.
"""

from __future__ import annotations

import re

MAX_NODES = 1 << 17
MAX_DEPTH = 64

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _decode_entities(s: str) -> str:
    def one(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            return chr(int(body[2:], 16))
        if body.startswith("#"):
            return chr(int(body[1:]))
        if body in _ENTITIES:
            return _ENTITIES[body]
        raise ValueError(f"unknown XML entity &{body};")

    try:
        return re.sub(r"&([^;&]{1,10});", one, s)
    except (ValueError, OverflowError) as exc:
        raise ValueError(f"bad XML entity in {s[:40]!r}") from exc


class XmlNode:
    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list[XmlNode] = []
        self.text = ""

    def local(self) -> str:
        return self.tag.rsplit(":", 1)[-1]

    def find_all(self, local_name: str):
        """Depth-first descendants (self excluded) whose LOCAL name
        matches."""
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.local() == local_name:
                out.append(n)
            stack.extend(reversed(n.children))
        return out

    def first(self, local_name: str):
        hits = self.find_all(local_name)
        return hits[0] if hits else None


_TAG_RE = re.compile(
    r"<(/?)([A-Za-z_][\w.:-]*)((?:\s+[A-Za-z_][\w.:-]*\s*=\s*"
    r"(?:\"[^\"]*\"|'[^']*'))*)\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"([A-Za-z_][\w.:-]*)\s*=\s*(\"[^\"]*\"|'[^']*')"
)


def parse_xml(payload: bytes | str) -> XmlNode:
    """XML bytes/str -> root :class:`XmlNode`."""
    if isinstance(payload, (bytes, bytearray)):
        # UnicodeDecodeError is a ValueError subclass — stays on contract
        s = bytes(payload).decode("utf-8")
    else:
        s = payload
    # strip prolog, comments, processing instructions, DOCTYPE
    s = re.sub(r"<\?.*?\?>", "", s, flags=re.S)
    s = re.sub(r"<!--.*?-->", "", s, flags=re.S)
    s = re.sub(r"<!DOCTYPE[^>]*>", "", s)
    # protect CDATA: replace with placeholders, restore into text
    cdatas: list[str] = []

    def stash(m: re.Match) -> str:
        cdatas.append(m.group(1))
        return f"\x00{len(cdatas) - 1}\x00"

    s = re.sub(r"<!\[CDATA\[(.*?)\]\]>", stash, s, flags=re.S)

    def restore(text: str) -> str:
        return re.sub(
            r"\x00(\d+)\x00", lambda m: cdatas[int(m.group(1))], text
        )

    root: XmlNode | None = None
    stack: list[XmlNode] = []
    pos = 0
    n_nodes = 0
    for m in _TAG_RE.finditer(s):
        between = s[pos : m.start()]
        if stack:
            stack[-1].text += restore(_decode_entities(between))
        elif between.strip():
            raise ValueError("XML text content outside the root element")
        pos = m.end()
        closing, tag, attr_blob, selfclose = m.groups()
        if closing:
            if selfclose:
                raise ValueError("XML closing tag cannot self-close")
            if not stack or stack[-1].tag != tag:
                raise ValueError(f"XML tag mismatch at </{tag}>")
            done = stack.pop()
            if not stack:
                trailer = s[pos:]
                if trailer.strip():
                    raise ValueError("XML content after the root element")
                return done
            continue
        n_nodes += 1
        if n_nodes > MAX_NODES:
            raise ValueError("XML node count exceeds cap")
        if len(stack) >= MAX_DEPTH:
            raise ValueError("XML nesting exceeds depth cap")
        attrs = {
            k: _decode_entities(v[1:-1])
            for k, v in _ATTR_RE.findall(attr_blob or "")
        }
        node = XmlNode(tag, attrs)
        if stack:
            stack[-1].children.append(node)
        elif root is None:
            root = node
        else:
            raise ValueError("XML has more than one root element")
        if not selfclose:
            stack.append(node)
        elif not stack:
            trailer = s[pos:]
            if trailer.strip():
                raise ValueError("XML content after the root element")
            return node
    raise ValueError("XML ended with unclosed elements"
                     if stack or root is None else "XML has no elements")


def sitemap_urls(payload: bytes) -> list[dict]:
    """sitemap.xml -> [{'loc', 'lastmod', 'priority'}] for <urlset>
    documents; a <sitemapindex> returns its child sitemap locs with
    ``is_index=True`` rows."""
    root = parse_xml(payload)
    local = root.local()
    if local == "sitemapindex":
        out = []
        for sm in root.find_all("sitemap"):
            loc = sm.first("loc")
            if loc is None:
                raise ValueError("sitemapindex entry without <loc>")
            out.append({"loc": loc.text.strip(), "lastmod": None,
                        "priority": None, "is_index": True})
        return out
    if local != "urlset":
        raise ValueError(f"not a sitemap root: <{root.tag}>")
    out = []
    for u in root.find_all("url"):
        loc = u.first("loc")
        if loc is None:
            raise ValueError("sitemap <url> without <loc>")
        lastmod = u.first("lastmod")
        prio = u.first("priority")
        out.append(
            {
                "loc": loc.text.strip(),
                "lastmod": lastmod.text.strip() if lastmod else None,
                "priority": float(prio.text) if prio else None,
                "is_index": False,
            }
        )
    return out


def rss_items(payload: bytes) -> list[dict]:
    """RSS 2.0 / Atom feed -> [{'title', 'link', 'published'}]."""
    root = parse_xml(payload)
    local = root.local()
    out = []
    if local == "rss":
        for item in root.find_all("item"):
            title = item.first("title")
            link = item.first("link")
            pub = item.first("pubDate")
            out.append(
                {
                    "title": title.text.strip() if title else None,
                    "link": link.text.strip() if link else None,
                    "published": pub.text.strip() if pub else None,
                }
            )
        return out
    if local == "feed":  # Atom
        for entry in root.find_all("entry"):
            title = entry.first("title")
            link = entry.first("link")
            upd = entry.first("updated")
            out.append(
                {
                    "title": title.text.strip() if title else None,
                    "link": link.attrs.get("href") if link else None,
                    "published": upd.text.strip() if upd else None,
                }
            )
        return out
    raise ValueError(f"not an RSS/Atom root: <{root.tag}>")


def build_sitemap(urls: list[dict]) -> bytes:
    """[{'loc', 'lastmod'?, 'priority'?}] -> sitemap.xml bytes (with
    the standard namespace, entity-escaped locs)."""

    def esc(t: str) -> str:
        return (t.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    rows = []
    for u in urls:
        row = f"  <url>\n    <loc>{esc(u['loc'])}</loc>\n"
        if u.get("lastmod"):
            row += f"    <lastmod>{u['lastmod']}</lastmod>\n"
        if u.get("priority") is not None:
            row += f"    <priority>{u['priority']:.1f}</priority>\n"
        rows.append(row + "  </url>\n")
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "".join(rows) + "</urlset>\n"
    )
    return doc.encode("utf-8")


def build_rss(items: list[dict], title: str = "synth feed") -> bytes:
    """[{'title', 'link', 'pubDate'}] -> RSS 2.0 bytes; every other
    item's title ships as a CDATA section (both forms under test)."""

    def esc(t: str) -> str:
        return (t.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    rows = []
    for i, it in enumerate(items):
        # CDATA cannot contain ']]>' (XML 1.0 §2.7) — escape instead
        t = (f"<![CDATA[{it['title']}]]>"
             if i % 2 and "]]>" not in it["title"]
             else esc(it["title"]))
        rows.append(
            "    <item>\n"
            f"      <title>{t}</title>\n"
            f"      <link>{esc(it['link'])}</link>\n"
            f"      <pubDate>{it['pubDate']}</pubDate>\n"
            "    </item>\n"
        )
    doc = (
        '<?xml version="1.0"?>\n'
        "<rss version=\"2.0\">\n  <channel>\n"
        f"    <title>{esc(title)}</title>\n"
        + "".join(rows) + "  </channel>\n</rss>\n"
    )
    return doc.encode("utf-8")
