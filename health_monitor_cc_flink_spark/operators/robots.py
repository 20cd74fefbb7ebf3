"""robots.txt evaluation (RFC 9309) as PURE DataFrame operators.

The crawl-politeness primitive: before a URL enters a crawl corpus,
its path must pass the site's robots.txt.  Everything here is
declarative column work — posexplode over lines, a gaps-and-islands
window to recover User-agent GROUPS, a scored join to pick the most
specific applicable group (exact agent beats ``*``), RFC 9309
wildcard translation (``*`` and trailing ``$``) into a regex matched
with ``rlike``, and the LONGEST-MATCH rule with allow-wins-ties —
no Python UDF anywhere.

Implemented from the PUBLIC RFC 9309 (Robots Exclusion Protocol):
* a group = one or more consecutive ``User-agent`` lines followed by
  rules; rules before any UA line are ignored;
* the crawler obeys the group for its own agent if present, else the
  ``*`` group, else everything is allowed;
* rule matching is by pattern octets: ``*`` matches any run, ``$``
  anchors the end; the rule with the LONGEST pattern wins, Allow
  winning length ties; an empty Disallow allows everything;
* no applicable matching rule -> allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _pattern_regex(pat):
    """Rule pattern -> anchored Java regex: escape specials, ``*`` ->
    ``.*``, trailing ``$`` -> end anchor."""
    esc = F.regexp_replace(pat, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    # the escape pass turned a trailing '$' into '\$' — restore anchor
    # (replacement '$' must itself be escaped: it denotes a group ref)
    anchored = F.regexp_replace(star, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), anchored)


def robots_allowed(
    df: DataFrame,
    id_col: str = "doc_id",
    robots_col: str = "robots_txt",
    agent_col: str = "agent",
    path_col: str = "path",
) -> DataFrame:
    """-> (id, agent, path, allowed boolean, matched_pattern string
    NULL when no rule matched, matched_is_allow).  One row per input
    row.  Scale shape: line explode is row-local narrow work; the two
    windows partition by the request row, so state is bounded by one
    robots file (RFC 9309 caps them at 500 KiB)."""
    base = df.select(
        F.col(id_col).alias("_rid"),
        F.col(robots_col).alias("_robots"),
        F.col(agent_col).alias("_agent"),
        F.col(path_col).alias("_path"),
    )
    lines = base.select(
        "_rid", "_agent", "_path",
        F.posexplode(F.split("_robots", "\n")).alias("_ln", "_raw"),
    ).select(
        "_rid", "_agent", "_path", "_ln",
        # strip comments, trim
        F.trim(F.regexp_replace("_raw", r"#.*$", "")).alias("_line"),
    )
    parsed = lines.select(
        "*",
        F.lower(F.trim(F.substring_index("_line", ":", 1))).alias("_key"),
        F.trim(
            F.expr("substring(_line, instr(_line, ':') + 1)")
        ).alias("_value"),
    ).filter(
        # a colon-less line (e.g. a bare 'Disallow') would otherwise
        # parse as key = value = the whole line and fabricate a rule
        F.expr("instr(_line, ':')") > 0
    )
    typed = parsed.select(
        "_rid", "_agent", "_path", "_ln", "_key", "_value",
        (F.col("_key") == "user-agent").alias("_is_ua"),
    ).filter(F.col("_key").isin("user-agent", "allow", "disallow"))
    # group id: a UA line NOT preceded by a UA line starts a new group
    w = Window.partitionBy("_rid").orderBy("_ln")
    grouped = typed.withColumn(
        "_starts",
        (F.col("_is_ua")
         & ~F.coalesce(F.lag("_is_ua").over(w), F.lit(False))).cast("int"),
    ).withColumn("_gid", F.sum("_starts").over(w))
    # score each group for this agent: 2 = exact agent, 1 = '*'
    ua_rows = grouped.filter(F.col("_is_ua")).select(
        "_rid", "_gid",
        F.when(F.lower("_value") == F.lower("_agent"), 2)
        .when(F.col("_value") == "*", 1)
        .otherwise(0)
        .alias("_s"),
    )
    group_scores = ua_rows.groupBy("_rid", "_gid").agg(
        F.max("_s").alias("_score")
    ).filter(F.col("_score") > 0)
    best = group_scores.groupBy("_rid").agg(
        F.max("_score").alias("_best")
    )
    chosen = group_scores.join(best, "_rid").filter(
        F.col("_score") == F.col("_best")
    ).select("_rid", "_gid")
    rules = (
        grouped.filter(~F.col("_is_ua"))
        .filter(F.col("_gid") > 0)  # rules before any UA line: ignored
        .join(chosen, ["_rid", "_gid"])
        .select(
            "_rid", "_path",
            (F.col("_key") == "allow").alias("_is_allow"),
            F.col("_value").alias("_pattern"),
        )
    )
    # empty Disallow = allow everything (pattern '' matches, length 0,
    # is_allow flipped per RFC practice)
    rules = rules.withColumn(
        "_is_allow",
        F.when(F.col("_pattern") == "", F.lit(True)).otherwise(
            F.col("_is_allow")
        ),
    )
    matched = (
        rules.withColumn("_regex", _pattern_regex(F.col("_pattern")))
        .filter((F.col("_pattern") == "") | F.expr("_path rlike _regex"))
    )
    rw = Window.partitionBy("_rid").orderBy(
        F.length("_pattern").desc(), F.col("_is_allow").desc()
    )
    verdict = (
        matched.withColumn("_rk", F.row_number().over(rw))
        .filter(F.col("_rk") == 1)
        .select(
            "_rid",
            F.col("_is_allow").alias("matched_is_allow"),
            F.col("_pattern").alias("matched_pattern"),
        )
    )
    return base.join(verdict, "_rid", "left").select(
        F.col("_rid").alias(id_col),
        F.col("_agent").alias(agent_col),
        F.col("_path").alias(path_col),
        F.coalesce(F.col("matched_is_allow"), F.lit(True)).alias("allowed"),
        "matched_pattern",
    )


def robots_sitemaps(df: DataFrame, id_col: str = "doc_id",
                    robots_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` directive extraction — the sitemaps.org extension
    every major crawler honors: the directive is GROUP-INDEPENDENT
    (valid anywhere in the file, unlike Allow/Disallow) and its key is
    case-insensitive; the value is an absolute sitemap URL.  Returns
    (id, sm_idx, sitemap_url) exploded in line order — the discovery
    hop that feeds the sitemap parser and the crawl frontier.  Pure
    codegen: line explode + filter + one per-file window."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(robots_col, "\n")).alias("_ln", "_raw"),
    ).select(
        "doc_id", "_ln",
        F.trim(F.regexp_replace("_raw", r"#.*$", "")).alias("_line"),
    ).filter(F.expr("instr(_line, ':')") > 0)
    sm = lines.filter(
        F.lower(F.trim(F.substring_index("_line", ":", 1))) == "sitemap"
    ).select(
        "doc_id", "_ln",
        F.trim(
            F.expr("substring(_line, instr(_line, ':') + 1)")
        ).alias("sitemap_url"),
    ).filter(F.col("sitemap_url") != "")
    w = Window.partitionBy("doc_id").orderBy("_ln")
    return sm.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("sm_idx"),
        "sitemap_url",
    )
