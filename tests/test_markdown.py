"""Markdown parse + strip pins (operators/markdown.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.markdown import (
    build_markdown,
    markdown_to_text,
    parse_markdown,
)


def test_structure_and_strip():
    md = build_markdown(
        ["alpha", "beta", "gamma"],
        [("intro one", "first paragraph words here"),
         ("details two", "second *emphasis* and **bold** text")],
        ["item aa", "item bb"],
        "x = 1\nprint(x)",
        link=("anchor text", "https://e.org/p"),
        quote="quoted line",
    )
    p = parse_markdown(md)
    assert p["headings"] == [(1, "alpha beta gamma"), (2, "intro one"),
                             (2, "details two")]
    assert p["code_blocks"] == [("py", "x = 1\nprint(x)")]
    assert p["links"] == [("anchor text", "https://e.org/p")]
    assert p["list_items"] == ["item aa", "item bb"]
    assert p["blockquotes"] == ["quoted line"]
    txt = markdown_to_text(md)
    assert "x = 1" not in txt and "```" not in txt   # code dropped
    assert "anchor text" in txt and "https://e.org/p" not in txt
    assert "emphasis" in txt and "bold" in txt and "*" not in txt


def test_inline_forms():
    p = parse_markdown("use `f(x)` and ![alt](img.png) now")
    assert p["paragraphs"] == ["use f(x) and alt now"]
    assert p["links"] == [("alt", "img.png")]  # image keeps alt text
    # links inside headings and list items are collected too
    p = parse_markdown("# see [a](u)\n- go [b](v)")
    assert p["links"] == [("a", "u"), ("b", "v")]
    assert p["headings"] == [(1, "see a")]
    assert p["list_items"] == ["go b"]
    # 7 hashes / missing space are NOT headings
    p = parse_markdown("####### nope\n#also nope")
    assert p["headings"] == [] and len(p["paragraphs"]) == 2


def test_code_fence_verbatim_and_unterminated():
    md = "```\n# not a heading\n- not a list\n```\ntail"
    p = parse_markdown(md)
    assert p["headings"] == [] and p["list_items"] == []
    assert p["code_blocks"] == [("", "# not a heading\n- not a list")]
    assert markdown_to_text(md) == "tail"
    with pytest.raises(ValueError, match="unterminated"):
        markdown_to_text("```py\nno close")
    with pytest.raises(ValueError, match="unterminated"):
        parse_markdown("```py\nno close")


@settings(max_examples=120, deadline=None)
@given(st.text(st.characters(min_codepoint=32, max_codepoint=500),
               max_size=400))
def test_fuzz_plain_text_never_crashes(text):
    # any backtick-fence-free text is valid Markdown
    if "```" in text:
        return
    parse_markdown(text)
    markdown_to_text(text)
