"""robots.txt evaluation pins (operators/robots.py, RFC 9309)."""

from health_monitor_cc_flink_spark.operators.robots import robots_allowed

ROBOTS = """User-agent: goodbot
Disallow: /private/
Allow: /private/ok

User-agent: *
Disallow: /tmp/*
Disallow: /exact$
Allow:
"""


def _verdicts(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, robots_txt string, agent string, path string"
    )
    return {r.doc_id: (r.allowed, r.matched_pattern)
            for r in robots_allowed(df).collect()}


def test_rfc9309_semantics(spark):
    got = _verdicts(spark, [
        (0, ROBOTS, "goodbot", "/private/secret"),
        (1, ROBOTS, "goodbot", "/private/ok/page"),   # longest wins
        (2, ROBOTS, "goodbot", "/public/x"),          # no rule
        (3, ROBOTS, "otherbot", "/tmp/a/b"),          # * wildcard
        (4, ROBOTS, "otherbot", "/exact"),            # $ anchor hits
        (5, ROBOTS, "otherbot", "/exactly"),          # $ must not hit
        (6, "just prose, no rules", "any", "/x"),
        (7, ROBOTS, "GOODBOT", "/private/secret"),    # agent case-insensitive
    ])
    assert got[0] == (False, "/private/")
    assert got[1] == (True, "/private/ok")
    assert got[2] == (True, None)
    assert got[3] == (False, "/tmp/*")
    assert got[4] == (False, "/exact$")
    assert got[5] == (True, "")  # the empty Allow matches everything
    assert got[6] == (True, None)
    assert got[7] == (False, "/private/")


def test_groups_comments_and_preamble_rules(spark):
    robots = (
        "Disallow: /ignored-no-group\n"        # rules before any UA: ignored
        "User-agent: a\n"
        "User-agent: b\n"                       # consecutive UAs share a group
        "Disallow: /both/\n"
        "User-agent: *\n"
        "Disallow: /star/ # trailing comment\n"
    )
    got = _verdicts(spark, [
        (0, robots, "b", "/both/x"),
        (1, robots, "b", "/star/x"),   # exact group wins, * ignored
        (2, robots, "c", "/star/x"),   # falls to * group
        (3, robots, "c", "/ignored-no-group"),
    ])
    assert got[0] == (False, "/both/")
    assert got[1] == (True, None)
    assert got[2] == (False, "/star/")
    assert got[3] == (True, None)


def test_allow_disallow_tie_and_regex_escapes(spark):
    robots = (
        "User-agent: *\n"
        "Disallow: /a/b\n"
        "Allow: /a/b\n"                 # equal length: Allow wins
        "Disallow: /q?x=1\n"            # regex specials must be literal
    )
    got = _verdicts(spark, [
        (0, robots, "x", "/a/b/c"),
        (1, robots, "x", "/q?x=1"),
        (2, robots, "x", "/qqx=1"),     # '?' must NOT act as regex
    ])
    assert got[0] == (True, "/a/b")
    assert got[1] == (False, "/q?x=1")
    assert got[2] == (True, None)


def test_colonless_line_is_ignored(spark):
    # a bare 'Disallow' (no colon) must not fabricate a rule with
    # pattern 'Disallow' — RFC 9309 parsers skip malformed lines
    robots = (
        "User-agent: *\n"
        "Disallow\n"            # malformed: no colon
        "Disallow: /real/\n"
    )
    got = _verdicts(spark, [
        (0, robots, "bot", "/Disallow"),   # would match the bogus rule
        (1, robots, "bot", "/real/x"),
    ])
    assert got[0] == (True, None)
    assert got[1] == (False, "/real/")


def test_sitemap_directive_extraction(spark):
    """Sitemap: is group-independent and case-insensitive; the URL's
    own colon survives the first-colon split; comments strip."""
    from health_monitor_cc_flink_spark.operators.robots import (
        robots_sitemaps,
    )

    robots = (
        "Sitemap: https://e/a.xml\n"       # before any group: still valid
        "User-agent: *\n"
        "Disallow: /x\n"
        "sitemap: https://e/b.xml # note\n"
        "SITEMAP:https://e/c.xml\n"
        "Sitemap\n"                         # colon-less: ignored
        "Sitemap:   \n"                     # empty value: ignored
    )
    df = spark.createDataFrame([(1, robots)],
                               "doc_id long, robots_txt string")
    got = [(r.sm_idx, r.sitemap_url) for r in
           robots_sitemaps(df).orderBy("sm_idx").collect()]
    assert got == [(0, "https://e/a.xml"), (1, "https://e/b.xml"),
                   (2, "https://e/c.xml")]
