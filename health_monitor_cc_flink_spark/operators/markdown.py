"""Markdown (CommonMark subset) parsing + markup stripping, pure
stdlib.

Markdown is the dominant serialization of curated LLM training text;
the two corpus operations that matter at scale are STRUCTURE STATS
(heading outline, code-block density, link counts — quality/routing
signals) and MARKUP STRIPPING (plain text for dedup/tokenization).
Implemented line-based from the PUBLIC CommonMark spec's common core:

* ATX headings (``#`` .. ``######`` + space);
* fenced code blocks (three backticks, optional info string, content
  verbatim until the closing fence — markup inside is NOT parsed);
* unordered list items (``-``/``*``/``+`` + space);
* blockquotes (``>`` prefix, one level);
* inline: links ``[text](url)`` (images ``![alt](url)`` drop the
  ``!``), inline code spans, ``**bold**`` / ``*emphasis*`` marker
  stripping.

``markdown_to_text`` drops code blocks entirely (code is not natural
text), keeps link TEXT and discards URLs, strips inline markers, and
joins surviving block texts with newlines.

Parsers raise ``ValueError`` only for unterminated fences; arbitrary
text is by design valid Markdown.
"""

from __future__ import annotations

import re

_ATX = re.compile(r"^(#{1,6}) (.*)$")
_LIST = re.compile(r"^[-*+] (.*)$")
_FENCE = re.compile(r"^```(.*)$")
_LINK = re.compile(r"(!?)\[([^\]]*)\]\(([^)]*)\)")
_CODE_SPAN = re.compile(r"`([^`]*)`")
_BOLD = re.compile(r"\*\*([^*]+)\*\*")
_EMPH = re.compile(r"\*([^*]+)\*")


def _strip_inline(s: str) -> str:
    s = _LINK.sub(lambda m: m.group(2), s)
    s = _CODE_SPAN.sub(lambda m: m.group(1), s)
    s = _BOLD.sub(lambda m: m.group(1), s)
    s = _EMPH.sub(lambda m: m.group(1), s)
    return s


def parse_markdown(text: str) -> dict:
    """-> {'headings': [(level, text)], 'code_blocks': [(info, body)],
    'links': [(text, url)], 'list_items': [text], 'paragraphs':
    [text], 'blockquotes': [text]} — inline markup stripped from every
    text field except code bodies (verbatim)."""
    headings: list[tuple[int, str]] = []
    code_blocks: list[tuple[str, str]] = []
    links: list[tuple[str, str]] = []
    list_items: list[str] = []
    paragraphs: list[str] = []
    blockquotes: list[str] = []

    lines = text.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        m = _FENCE.match(line)
        if m:
            info = m.group(1).strip()
            body: list[str] = []
            i += 1
            while i < n and not lines[i].startswith("```"):
                body.append(lines[i])
                i += 1
            if i >= n:
                raise ValueError("unterminated Markdown code fence")
            code_blocks.append((info, "\n".join(body)))
            i += 1
            continue
        m = _ATX.match(line)
        if m:
            links.extend((t, u) for _b, t, u in _LINK.findall(m.group(2)))
            headings.append((len(m.group(1)), _strip_inline(m.group(2))))
            i += 1
            continue
        m = _LIST.match(line)
        if m:
            links.extend((t, u) for _b, t, u in _LINK.findall(m.group(1)))
            list_items.append(_strip_inline(m.group(1)))
            i += 1
            continue
        if line.startswith("> "):
            links.extend((t, u) for _b, t, u in _LINK.findall(line[2:]))
            blockquotes.append(_strip_inline(line[2:]))
            i += 1
            continue
        if line.strip():
            links.extend((t, u) for _b, t, u in _LINK.findall(line))
            paragraphs.append(_strip_inline(line))
        i += 1
    return {
        "headings": headings,
        "code_blocks": code_blocks,
        "links": links,
        "list_items": list_items,
        "paragraphs": paragraphs,
        "blockquotes": blockquotes,
    }


def markdown_to_text(text: str) -> str:
    """Markup-stripped plain text IN DOCUMENT ORDER: headings, list
    items, blockquotes and paragraphs keep their (inline-stripped)
    text on their own lines; code blocks are dropped entirely (code is
    not natural-language text); blank lines collapse."""
    out: list[str] = []
    lines = text.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if _FENCE.match(line):
            i += 1
            while i < n and not lines[i].startswith("```"):
                i += 1
            if i >= n:
                raise ValueError("unterminated Markdown code fence")
            i += 1
            continue
        m = _ATX.match(line)
        if m:
            out.append(_strip_inline(m.group(2)))
            i += 1
            continue
        m = _LIST.match(line)
        if m:
            out.append(_strip_inline(m.group(1)))
            i += 1
            continue
        if line.startswith("> "):
            out.append(_strip_inline(line[2:]))
            i += 1
            continue
        if line.strip():
            out.append(_strip_inline(line))
        i += 1
    return "\n".join(out)


def build_markdown(
    title_words: list[str],
    sections: list[tuple[str, str]],
    list_items: list[str],
    code_body: str,
    link: tuple[str, str] | None = None,
    quote: str | None = None,
) -> str:
    """Deterministic Markdown document: ``# title``, per section a
    ``## head`` + one paragraph (the first paragraph carries the
    optional ``[link text](url)`` appended), a ``- item`` list, one
    fenced ``py`` code block, an optional ``> quote`` — the
    synth/oracle vehicle."""
    parts = ["# " + " ".join(title_words), ""]
    for si, (head, para) in enumerate(sections):
        parts.append("## " + head)
        if si == 0 and link is not None:
            para = para + f" [{link[0]}]({link[1]})"
        parts.append(para)
        parts.append("")
    for it in list_items:
        parts.append("- " + it)
    parts.append("")
    parts.append("```py")
    parts.append(code_body)
    parts.append("```")
    if quote is not None:
        parts.append("> " + quote)
    return "\n".join(parts) + "\n"
