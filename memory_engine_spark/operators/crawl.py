"""Crawl-side operators: robots.txt evaluation (RFC 9309).

Beyond the reference's surface (its corpus arrives pre-fetched) — this
is the training-data-pipeline extension from the build brief: a crawl
frontier must evaluate every candidate URL against its host's
robots.txt BEFORE fetching, and at 100 TB that evaluation must be a
JOIN, not a per-URL library call. Everything here is relational:
line parsing is posexplode + regex, user-agent GROUP resolution is a
window over the tiny per-host line frame, wildcard rule matching is a
regex translated FROM the rule (escape, '*' → '.*', '$' anchor), and
longest-match precedence is one max_by. The same pipeline replays in
the DuckDB oracle (q172) because every regex stays in the Java∩RE2
common subset.

RFC 9309 semantics implemented: groups of user-agent lines share the
rules that follow; the evaluator picks the EXACT product-token groups
when any exist, else the '*' groups (all groups with the chosen token
merge); Allow/Disallow precedence is longest-rule-octets wins, ties
go to Allow; empty Disallow = allow-all; no matching rule = allowed.
'*' and '$' in rule paths are honored (the spec requires them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# regex metacharacters escaped before wildcard translation; backslash
# FIRST so later escapes aren't double-escaped. '$' is escaped too —
# a trailing '$' is stripped as the end anchor BEFORE this list runs,
# so any '$' still present is a literal path byte (RFC 3986 allows it)
# and must not become a mid-pattern end anchor.
_RE_META = ["\\", ".", "+", "?", "(", ")", "[", "]",
            "{", "}", "|", "^", "$"]


def _rule_regex(rule: Column) -> Column:
    """Translate a robots rule path into an anchored regex: strip an
    optional trailing '$' (remembered as an end anchor), escape regex
    metacharacters, turn '*' into '.*', prepend '^'."""
    anchored = rule.endswith("$")
    body = F.when(anchored,
                  rule.substr(F.lit(1), F.length(rule) - 1)) \
        .otherwise(rule)
    esc = body
    for ch in _RE_META:
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(F.lit("^"), esc,
                    F.when(anchored, "$").otherwise(F.lit("")))


def parse_robots(df: DataFrame, content_col: str = "robots_txt",
                 host_col: str = "host") -> DataFrame:
    """robots.txt → one row per rule with its group's user-agents:
    (host, group_id, agents array<string>, allow boolean, rule,
    rule_len, rule_re). Line walk: comments stripped, fields
    lower-cased; a user-agent line STARTS a new group iff the
    previous significant line was not itself a user-agent line
    (RFC 9309 group formation); empty-value Disallow lines are
    dropped (allow-all idiom). The window runs over the per-host
    line frame — robots files are small by construction (the spec
    caps parseable size at 500 KiB), so this never skews."""
    lines = (df.select(
        host_col,
        F.posexplode(F.split(F.col(content_col), "\n"))
        .alias("_ln", "_raw"))
        .select(
            host_col, "_ln",
            F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_line")))
    fields = (lines
              .withColumn("_field", F.lower(F.regexp_extract(
                  "_line", r"^([A-Za-z-]+)\s*:", 1)))
              .withColumn("_value", F.trim(F.regexp_extract(
                  "_line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)))
              .filter(F.col("_field").isin(
                  "user-agent", "allow", "disallow")))
    w = Window.partitionBy(host_col).orderBy("_ln")
    marked = (fields
              .withColumn("_is_ua", F.col("_field") == "user-agent")
              .withColumn("_prev_ua", F.lag("_is_ua", 1, False).over(w))
              .withColumn("_new_grp",
                          F.col("_is_ua") & ~F.col("_prev_ua"))
              .withColumn("_grp", F.sum(
                  F.col("_new_grp").cast("int")).over(w)))
    agents = (marked.filter("_is_ua")
              .groupBy(host_col, "_grp")
              .agg(F.array_sort(F.collect_set(F.lower("_value")))
                   .alias("agents")))
    rules = (marked.filter(~F.col("_is_ua") & (F.col("_value") != ""))
             .select(host_col, "_grp",
                     (F.col("_field") == "allow").alias("allow"),
                     F.col("_value").alias("_rule")))
    return (rules.join(agents, [host_col, "_grp"])
            .select(host_col, F.col("_grp").alias("group_id"),
                    "agents", "allow", F.col("_rule").alias("rule"),
                    F.length("_rule").alias("rule_len"),
                    _rule_regex(F.col("_rule")).alias("rule_re")))


def robots_allowed(urls: DataFrame, robots: DataFrame,
                   agent: str, host_col: str = "host",
                   path_col: str = "path") -> DataFrame:
    """Evaluate (host, path) pairs against parsed robots rules for
    ``agent``: exact product-token groups win over '*' groups (all
    groups of the winning token merge), longest-rule-octets wins per
    URL, ties go to Allow, no match (or no robots at all) = allowed.
    Returns urls + (allowed boolean, matched_rule string|null).

    Scale shape: rules per host is tiny → the rule side broadcasts;
    the URL side streams through one broadcast join + one groupBy on
    the URL key. No windows on the big side."""
    a = F.lit(agent.lower())
    scoped = (robots
              .withColumn("_exact", F.array_contains("agents", a))
              .withColumn("_star", F.array_contains("agents", "*"))
              .filter(F.col("_exact") | F.col("_star")))
    # exact groups win over '*' groups per host
    pick = (scoped.groupBy(host_col)
            .agg(F.max(F.col("_exact").cast("int")).alias("_has_exact")))
    rules = (scoped.join(pick, host_col)
             .filter((F.col("_exact") & (F.col("_has_exact") == 1))
                     | (~F.col("_exact") & (F.col("_has_exact") == 0)))
             .select(host_col, "allow", "rule", "rule_len", "rule_re"))
    urlkey = urls.select(host_col, path_col).distinct()
    hits = (urlkey.join(F.broadcast(rules), host_col)
            .filter(F.expr(f"{path_col} rlike rule_re"))
            .groupBy(host_col, path_col)
            .agg(F.max_by(
                F.struct(F.col("allow"), F.col("rule")),
                F.struct(F.col("rule_len"),
                         F.col("allow").cast("int"))).alias("_best")))
    return (urls.join(hits, [host_col, path_col], "left")
            .select(*urls.columns,
                    F.coalesce(F.col("_best.allow"), F.lit(True))
                    .alias("allowed"),
                    F.col("_best.rule").alias("matched_rule")))


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml",
                  host_col: str = "host") -> DataFrame:
    """Sitemap XML → URL inventory (sitemaps.org protocol): both
    document kinds (<urlset> of <url> entries; <sitemapindex> of
    child <sitemap> pointers) parsed with the same relational
    machinery as q169's HTML path — regexp_extract_all over entry
    blocks, posexplode, per-entry field extraction with whitespace
    trimming, spec default priority 0.5. Returns (host, kind,
    url_idx, loc, lastmod, priority). Regexes stay in the Java∩RE2
    subset so the oracle replays the parse verbatim.

    Scale shape: one scan-side explode per sitemap file (the spec
    caps a sitemap at 50k URLs / 50 MB — bounded fan-out), no
    shuffle until whatever joins the frontier does downstream."""
    kind = F.when(
        F.col(xml_col).rlike("<sitemapindex[^>]*>"), "sitemapindex") \
        .otherwise("urlset")
    blocks = (df.select(
        host_col, kind.alias("kind"),
        F.posexplode(F.expr(
            f"regexp_extract_all({xml_col}, "
            f"CASE WHEN {xml_col} rlike '<sitemapindex[^>]*>' "
            f"THEN '(?s)<sitemap>(.*?)</sitemap>' "
            f"ELSE '(?s)<url>(.*?)</url>' END, 1)"))
        .alias("url_idx", "_blk")))
    loc = F.trim(F.regexp_extract("_blk", r"(?s)<loc>(.*?)</loc>", 1))
    lastmod = F.trim(F.regexp_extract(
        "_blk", r"(?s)<lastmod>(.*?)</lastmod>", 1))
    prio = F.trim(F.regexp_extract(
        "_blk", r"(?s)<priority>(.*?)</priority>", 1))
    return blocks.select(
        host_col, "kind", "url_idx", loc.alias("loc"),
        F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
        F.coalesce(F.when(prio == "", None).otherwise(prio)
                   .cast("double"), F.lit(0.5)).alias("priority"))
