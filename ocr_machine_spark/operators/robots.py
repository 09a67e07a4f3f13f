"""robots.txt crawl-permission evaluation — the policy gate every crawl
pipeline runs before fetching (RFC 9309, the Robots Exclusion Protocol).

Documented subset (the twin SQL reproduces it exactly):
* groups: consecutive ``User-agent:`` lines open a group that owns the
  following Allow/Disallow rules; only groups naming ``*`` apply (no
  per-product-token matching); comments and blank lines are invisible to
  grouping (RFC 9309 §2.2.1) — two User-agent lines separated only by a
  comment still merge into one group;
* rules: literal path prefixes (no ``*``/``$`` wildcards); empty-value
  rules are no-ops per the RFC ("Disallow:" alone permits everything);
* decision: longest matching prefix wins; on a length tie Allow wins;
  no matching rule → allowed (the RFC default).

Everything is JVM expressions: the group structure is recovered
RELATIONALLY — a lag marks lines that open a new group, a running sum
numbers sections, and rules join the sections that contain ``*`` — so
parsing shuffles only (host, line) rows and never leaves codegen. The
decision is a per-url row_number over matching rules with the
group-limit shape (rank 1 filter → WindowGroupLimit partial top-1 below
the exchange).

Scale shape: robots files are per-host and tiny; rules tables are
O(hosts · rules). The check joins urls→rules on host — a broadcast when
the rule table fits (the common case: even 10^8 hosts × 10 rules is a
modest table next to 10^12 urls), else a shuffle equi-join on host.

Reference twin: the reference gates documents on upstream allow-lists
before OCR (SURVEY.md §2 P-tier predicate routing); this is the
crawl-side member of that policy family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_machine_spark.operators.urls import canon_host, host_of


def _parsed_sections(robots: DataFrame, host: str, body: str):
    """Shared robots parse: (host, robots_txt) → (sec, star_sections) —
    ``sec`` is one row per line with lowercased directive key, value, and
    the group-section number (lag marks group openers, running sum numbers
    them); ``star_sections`` is the (host, section) set naming ``*``.
    Both robots_rules and robots_crawl_delays consume this, so the group
    semantics can never diverge between permission and politeness."""
    # canonicalize the host key at the source: the check side derives its
    # key via host_of, and a robots table keyed by the literal fetched
    # hostname ('www.Example.COM') would otherwise never match — the gate
    # would silently fail OPEN (default allow) on that host
    lines = robots.select(
        canon_host(F.col(host)).alias("host"),
        F.posexplode(F.split(F.col(body), "\n")).alias("idx", "raw"),
    ).select(
        "host",
        "idx",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("clean"),
    )
    key = F.lower(F.trim(F.substring_index(F.col("clean"), ":", 1)))
    val = F.trim(F.expr("substring(clean, instr(clean, ':') + 1)"))
    has_colon = F.instr(F.col("clean"), ":") > 0
    parsed = lines.select(
        "host",
        "idx",
        F.when(has_colon, key).otherwise(F.lit("")).alias("key"),
        F.when(has_colon, val).otherwise(F.lit("")).alias("val"),
    )
    # RFC 9309 treats comments and blank lines as invisible: two
    # User-agent lines separated only by a comment still open ONE merged
    # group. Drop empty parsed rows BEFORE the lag window, or the ''-key
    # row between them would make the second UA look like a group opener
    # and the gate would fail open (allow) for '*'.
    parsed = parsed.filter(F.col("key") != "")
    w = Window.partitionBy("host").orderBy("idx")
    is_ua = (F.col("key") == "user-agent").cast("int")
    # a user-agent line whose predecessor is NOT one opens a new group
    opens = (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    sec = parsed.select(
        "host",
        "key",
        "val",
        F.sum(opens.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("section"),
    )
    star_sections = (
        sec.filter((F.col("key") == "user-agent") & (F.col("val") == "*"))
        .select("host", "section")
        .distinct()
    )
    return sec, star_sections


def robots_rules(
    robots: DataFrame, *, host: str = "host", body: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → one row per ``*``-group rule:
    (host, allow, prefix)."""
    sec, star_sections = _parsed_sections(robots, host, body)
    rules = sec.filter(
        F.col("key").isin("allow", "disallow") & (F.col("val") != "")
    ).select(
        "host", "section", (F.col("key") == "allow").alias("allow"), F.col("val").alias("prefix")
    )
    return rules.join(star_sections, ["host", "section"]).select(
        "host", "allow", "prefix"
    )


def robots_check(urls: DataFrame, rules: DataFrame, *, url: str = "url") -> DataFrame:
    """urls × rules → (url, allowed, rule_prefix): RFC 9309 decision per
    url — longest matching prefix wins, Allow wins length ties, default
    allow. ``rule_prefix`` is NULL for default-allowed urls (audit trail)."""
    u = urls.select(
        F.col(url).alias("url"),
        host_of(F.col(url)).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_replace(F.col(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", ""), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    # no broadcast hint: let Catalyst/AQE pick — the rules table is usually
    # tiny (auto-broadcast), but forcing the hint would OOM the driver at
    # the 10^8-hosts scale where only a shuffle equi-join is viable
    cand = u.join(rules, "host").filter(
        F.col("path").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("url").orderBy(
        F.length("prefix").desc(), F.col("allow").desc(), F.col("prefix")
    )
    best = (
        cand.select("url", "allow", "prefix", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("url", F.col("allow").alias("allowed"), F.col("prefix").alias("rule_prefix"))
    )
    return u.select("url").join(best, "url", "left").select(
        "url",
        F.coalesce(F.col("allowed"), F.lit(True)).alias("allowed"),
        "rule_prefix",
    )


def robots_crawl_delays(
    robots: DataFrame, *, host: str = "host", body: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, crawl_delay_ms): the politeness input a
    crawl scheduler consumes per host (the de-facto ``Crawl-delay``
    extension — not in RFC 9309 but honored by major crawlers). Only
    ``*``-group directives count (same group semantics as robots_rules —
    the parse is shared); non-numeric or negative values are ignored; when
    a file repeats the directive the MAXIMUM delay wins (the conservative
    reading). Seconds may be fractional ('0.5'); output is exact integer
    milliseconds via e3 fixed-point (floor(x*1000 + 0.5), engines agree).
    Hosts with no valid directive are absent — the scheduler's default
    applies."""
    sec, star_sections = _parsed_sections(robots, host, body)
    # try_cast, not cast: under ANSI mode (pyspark ≥ 4 default) a plain
    # cast THROWS on 'Crawl-delay: soon' — one malformed robots line must
    # degrade to "directive ignored", never kill the job
    secs = F.expr("try_cast(val AS DOUBLE)")
    delays = (
        sec.filter(F.col("key") == "crawl-delay")
        .join(star_sections, ["host", "section"])
        .select("host", secs.alias("secs"))
        .filter(F.col("secs").isNotNull() & (F.col("secs") >= 0))
        .select("host", F.floor(F.col("secs") * 1000.0 + 0.5).cast("long").alias("ms"))
    )
    return delays.groupBy("host").agg(F.max("ms").alias("crawl_delay_ms"))
