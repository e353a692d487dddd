"""robots.txt politeness — crawl-frontier filtering for the KG builder.

A 10^12-document crawl must be polite per host; this module parses
fetched robots.txt bodies into a typed RULES frame and filters a URL
frontier against them, both entirely JVM-side (split/explode + window
functions + a group-max election — no Python in either pass).

RFC 9309 semantics implemented (the profile):

* a GROUP is one-or-more consecutive ``User-agent`` lines followed by
  rules; rules bind to every agent named above them in their group.
* agent election per host: an exact product-token match wins over the
  ``*`` group; a host with neither yields no rules (allow-all).
* rule matching: ``Allow``/``Disallow`` values are path PREFIXES;
  longest-match wins; on a length tie ALLOW wins; an empty
  ``Disallow:`` matches nothing (the classic allow-all idiom); no
  matching rule = allowed.
* ``Sitemap:`` lines are surfaced as their own rows (they are
  host-level, group-independent); comments (#) and blank lines are
  stripped; unknown directives are surfaced as kind='other' rows, never
  silently dropped.
* OUT of profile, refused loudly: ``*`` wildcards and ``$`` anchors
  inside rule paths (full RFC 9309 matching is a regex translation this
  profile does not claim) — a crawl that needs them should not get
  silently-wrong politeness decisions.

The reference's analogue is its config-driven source gating
(SURVEY.md S1: which tables/rows a load may touch); here the gate is
mined from the crawl's own politeness documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def parse_robots(
    robots: DataFrame,
    body_col: str = "body",
    host_col: str = "host",
    strict: bool = True,
) -> DataFrame:
    """(host, body) -> one row per directive:
    (host, group_id, kind, agent, value, rule_len).

    kind ∈ user_agent | allow | disallow | sitemap | crawl_delay |
    other.  group_id numbers rule groups per host (consecutive
    User-agent lines share one group per RFC 9309).  ``strict`` raises
    on * / $ inside allow/disallow paths (see module docstring);
    strict=False quarantines those rules as kind='unsupported'."""
    lines = robots.select(
        F.col(host_col).cast("string").alias("host"),
        F.posexplode(
            F.split(F.col(body_col).cast("string"), "\r?\n")
        ).alias("line_no", "_raw"),
    )
    # strip comments + whitespace
    txt = F.trim(F.regexp_replace("_raw", r"#.*$", ""))
    directive = F.lower(F.trim(F.regexp_extract(txt, r"^([^:]+):", 1)))
    value = F.trim(F.regexp_extract(txt, r"^[^:]+:(.*)$", 1))
    kind = (
        F.when(txt == "", F.lit(None))
        .when(directive == "user-agent", F.lit("user_agent"))
        .when(directive == "allow", F.lit("allow"))
        .when(directive == "disallow", F.lit("disallow"))
        .when(directive == "sitemap", F.lit("sitemap"))
        .when(directive == "crawl-delay", F.lit("crawl_delay"))
        .otherwise(F.lit("other"))
    )
    parsed = (
        lines.select("host", "line_no", kind.alias("kind"),
                     value.alias("value"))
        .where(F.col("kind").isNotNull())
    )
    # group numbering: a user_agent line whose PREVIOUS directive is not
    # user_agent opens a new group; rules take the latest group id
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("kind") == "user_agent").cast("int")
    prev_ua = F.coalesce(F.lag(is_ua).over(w), F.lit(0))
    opens = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    grouped = parsed.withColumn(
        "group_id", F.sum(opens).over(w).cast("long")
    )
    path_rule = F.col("kind").isin("allow", "disallow")
    bad = path_rule & (
        F.col("value").contains("*") | F.col("value").contains("$")
    )
    if strict:
        guard = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("robots.txt wildcard/anchor rule out of "
                          "profile: "), F.col("value"),
                )
            ),
        ).otherwise(F.col("kind"))
    else:
        guard = F.when(bad, F.lit("unsupported")).otherwise(F.col("kind"))
    return grouped.select(
        "host",
        "group_id",
        guard.alias("kind"),
        F.when(F.col("kind") == "user_agent", F.lower("value"))
        .alias("agent"),
        F.col("value"),
        F.when(path_rule, F.length("value")).cast("long")
        .alias("rule_len"),
    )


def _elect_groups(rules: DataFrame, agent: str) -> DataFrame:
    """Per host: the group ids whose rules bind ``agent`` — exact token
    match if any group names it, else the ``*`` groups."""
    ua = rules.where(F.col("kind") == "user_agent").select(
        "host", "group_id", "agent"
    )
    a = F.lit(agent.lower())
    scored = ua.select(
        "host", "group_id",
        F.when(F.col("agent") == a, F.lit(2))
        .when(F.col("agent") == "*", F.lit(1))
        .alias("_score"),
    ).where(F.col("_score").isNotNull())
    best = scored.groupBy("host").agg(F.max("_score").alias("_best"))
    return (
        scored.join(best, "host")
        .where(F.col("_score") == F.col("_best"))
        .select("host", "group_id")
        .distinct()
    )


def check_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Filter a URL frontier against parsed robots rules for ``agent``:
    adds (host, path, allowed, matched_rule, matched_len).

    Scale shape: the rules frame is politeness-document-sized (bounded
    by hosts x directives — tiny next to the frontier) so the join
    broadcasts; matching + the longest-match election are one
    (url)-keyed aggregation with ALLOW winning length ties; no rule ->
    allowed (matched_rule NULL)."""
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1)
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^#]*)", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    fr = frontier.withColumn("host", host).withColumn("path", path)
    groups = _elect_groups(rules, agent)
    bound = rules.where(F.col("kind").isin("allow", "disallow")).join(
        groups, ["host", "group_id"], "inner"
    )
    # empty Disallow: matches nothing (allow-all idiom)
    bound = bound.where(
        ~((F.col("kind") == "disallow") & (F.col("value") == ""))
    )
    cand = fr.join(F.broadcast(bound), "host", "left_outer")
    # a rule row MATCHES when its prefix covers the path; unmatched rows
    # stay in the aggregation (they keep the url alive — a host whose
    # rules all miss must still come out allowed) but contribute an
    # all-NULL struct that loses every election
    matched = F.col("value").isNotNull() & F.col("path").startswith(
        F.col("value")
    )
    # longest-match election, allow beats disallow on ties:
    # pack (len*2 + is_allow) and take the max
    packed = F.when(
        matched,
        F.col("rule_len") * 2
        + (F.col("kind") == "allow").cast("long"),
    )
    elected = cand.groupBy(*frontier.columns, "host", "path").agg(
        F.max(
            F.struct(
                packed.alias("_p"),
                F.when(matched, F.col("kind")).alias("_k"),
                F.when(matched, F.col("value")).alias("_v"),
            )
        ).alias("_win")
    )
    win_kind = F.col("_win._k")
    return elected.select(
        *frontier.columns,
        "host",
        "path",
        F.coalesce(win_kind != "disallow", F.lit(True)).alias("allowed"),
        F.col("_win._v").alias("matched_rule"),
        (F.col("_win._p") / 2).cast("long").alias("matched_len"),
    )
