"""URL canonicalization — the crawl-side dedup key a webtext pipeline needs.

A crawl sees the same page under fragment suffixes, tracking query params
(utm_*, fbclid, gclid) and scheme/host case variants; exact text dedup
catches the bodies, but URL-level canonicalization is what collapses them
BEFORE fetching/storing duplicates. Everything here is pure JVM expressions
(regexp/split/filter/concat) with an exact DuckDB twin re-implementing the
same spec, so the gate proves both engines agree byte-for-byte.

Canonicalization spec (documented order — the twin must match exactly):
1. cut the fragment (``#…``);
2. lowercase the ``scheme://host`` prefix (the case-insensitive parts; the
   path stays case-sensitive per RFC 3986);
3. drop tracking params (``utm_*``, ``fbclid``, ``gclid``) and empty params
   from the query string, preserving the order of the rest;
4. drop the ``?`` if no params survive;
5. strip one trailing ``/`` when the result has no query string.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_machine_spark.functions import fixed_point, norm_text, token_count

_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonical_url(url: Column) -> Column:
    # [\s\S] instead of '.': Java's '.' excludes \n\r   while
    # RE2's excludes only \n — a (garbage) URL containing a line terminator
    # would canonicalize differently per engine and break the hash gate
    frag_cut = F.regexp_replace(url, r"#[\s\S]*", "")
    sh = F.regexp_extract(frag_cut, _SCHEME_HOST_RE, 1)
    rest = frag_cut.substr(F.length(sh) + 1, F.length(frag_cut))
    path = F.regexp_replace(rest, r"\?[\s\S]*", "")
    q = F.when(rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")).otherwise(F.lit(""))

    def keep(p: Column) -> Column:
        drop = p == ""
        for pre in TRACKING_PREFIXES:
            drop = drop | p.startswith(pre)
        return ~drop

    q2 = F.array_join(F.filter(F.split(q, "&"), keep), "&")
    canon = F.concat(
        F.lower(sh), path, F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit(""))
    )
    # \z (absolute end) not $: Java's $ also matches before a final line
    # terminator where RE2's does not — \z means end-of-text in both
    return F.when(q2 == "", F.regexp_replace(canon, r"/\z", "")).otherwise(canon)


def canonical_url_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants): the URL-level dedup rollup — one shuffle
    on the canonical key, scale-safe (the canonicalization itself is a
    stateless per-row projection pushed upstream of the shuffle)."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_variants"))
    )


def canon_host(host: Column) -> Column:
    """Canonicalize a BARE hostname to the crawl host key: lowercase, strip
    any ``:port`` suffix and one leading ``www.`` — the same spec
    ``host_of`` applies to a URL's authority, exposed for callers whose
    host column comes from elsewhere (robots tables, server logs) so both
    sides of a host join agree."""
    h = F.lower(host)
    # \z (absolute end), same cross-engine rationale as canonical_url
    return F.regexp_replace(F.regexp_replace(h, r":[0-9]+\z", ""), r"^www\.", "")


def host_of(url: Column) -> Column:
    """Registrable host key of a URL: the authority lowercased, with any
    ``:port`` suffix and one leading ``www.`` stripped (userinfo, rare in
    crawl data, is deliberately left in place and documented — a spec the
    DuckDB twin reproduces verbatim). Malformed URLs with no
    ``scheme://`` produce the empty string, which groups them into one
    visible junk bucket rather than dropping rows."""
    return canon_host(F.regexp_extract(url, _HOST_RE, 1))


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    *,
    dup_frac_max_e4: int = 3000,
    blocklist: Sequence[str] = (),
) -> DataFrame:
    """Per-host curation signals + spam flag — the domain-level quality gate
    a web corpus needs before document-level filtering (RefinedWeb §3.1 runs
    URL/domain filtering FIRST; the reference's per-document flow has no
    corpus-level stage, this is the Spark-native extension).

    → (host, n_docs, n_distinct_text, dup_frac_e4, mean_words_e4, spam):
    within-host exact-duplicate fraction (boilerplate farms repeat one body
    under thousands of URLs), mean document length, and a spam verdict =
    dup_frac ≥ threshold OR host ∈ blocklist. Thresholds compare e4 BIGINTs
    (engine-parity convention), the blocklist is an ``isin`` literal (tiny,
    stays an in-filter — no join).

    Scale shape: one shuffle keyed on host. The distinct-count expands to a
    partial aggregate on (host, fp) first, so a mega-host's rows combine
    map-side before the exchange; no driver-side collection anywhere."""
    per_doc = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.md5(norm_text(F.coalesce(F.col(text_col), F.lit("")))).alias("fp"),
        token_count(norm_text(F.coalesce(F.col(text_col), F.lit("")))).alias("nw"),
    )
    g = per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fp").alias("n_distinct_text"),
        F.sum("nw").alias("sum_words"),
    )
    dup = fixed_point((F.col("n_docs") - F.col("n_distinct_text")) / F.col("n_docs"))
    spam = dup >= F.lit(dup_frac_max_e4)
    if blocklist:
        spam = spam | F.col("host").isin(*blocklist)
    return g.select(
        "host",
        "n_docs",
        "n_distinct_text",
        dup.alias("dup_frac_e4"),
        fixed_point(F.col("sum_words") / F.col("n_docs")).alias("mean_words_e4"),
        spam.alias("spam"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str = "url",
    fp: str = "fp",
) -> DataFrame:
    """Recrawl freshness diff — the operator a crawl scheduler runs between
    two snapshots of the corpus: per key, is the page ``added`` (new crawl
    only), ``removed`` (old only), ``changed`` (both, fingerprint moved) or
    ``unchanged``. Downstream consumers: recrawl-priority scoring (changed
    hosts get budget), tombstoning removed urls, and incremental extraction
    (only added/changed pages re-enter the pipeline).

    Inputs are pre-fingerprinted (key, fp) projections — fingerprint choice
    (md5 of raw bytes, of canonical text, a simhash…) is the caller's
    policy, not this operator's. A NULL fingerprint means UNKNOWN content,
    not absence: presence is tracked by explicit markers (never by fp
    nullness, which Spark's md5(NULL) would silently fake), and a
    present-in-both row with any NULL fp classifies as ``changed`` — the
    conservative recrawl decision for content we cannot compare.

    → (url, change, old_fp, new_fp). Scale shape: ONE full-outer equi-join
    on the key — both sides shuffle once (or co-locate for free if the
    snapshot tables are bucketed by url, the layout the ingest job's
    xxhash64 bucketing already produces); the classification is a pure
    post-join projection, no second pass.
    """
    o = old.select(
        F.col(key).alias("url"), F.col(fp).alias("old_fp"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        F.col(key).alias("url"), F.col(fp).alias("new_fp"), F.lit(True).alias("_in_new")
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_fp").isNotNull()
            & F.col("new_fp").isNotNull()
            & (F.col("old_fp") == F.col("new_fp")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "url", "full_outer").select(
        "url", change.alias("change"), "old_fp", "new_fp"
    )


def sitemap_entries(
    sitemaps: DataFrame, *, key: str = "sitemap_url", body: str = "xml"
) -> DataFrame:
    """XML sitemap ingestion — the crawl-discovery feed (sitemaps.org
    protocol): ``<urlset>`` url entries and ``<sitemapindex>`` nested
    sitemap references from fetched sitemap bodies.

    → (sitemap_url, kind, loc, lastmod): kind ``url`` for page entries,
    ``sitemap`` for index entries (a frontier feeds those back into the
    fetch queue for the next discovery round); ``lastmod`` is the verbatim
    trimmed tag text, NULL when absent (recrawl scheduling joins it
    against crawl_snapshot_diff timestamps).

    Documented subset: well-formed ``<url>``/``<sitemap>`` blocks, loc
    text taken verbatim (no entity decoding — the canonical_url pass
    downstream owns normalization); blocks missing ``<loc>`` are dropped.
    Pure JVM regexp (``[\\s\\S]`` + non-greedy, the pinned cross-engine
    regex subset — RE2∩Java) over exploded blocks; one Generate per
    block kind, no shuffle — discovery is a pure map, like WARC ingest.
    """
    blocks = sitemaps.select(
        F.col(key).alias("sitemap_url"),
        F.explode(
            F.concat(
                F.transform(
                    # pattern must be a lit Column: a bare str here is read
                    # as a COLUMN NAME by regexp_extract_all
                    F.regexp_extract_all(F.col(body), F.lit(r"<url>([\s\S]*?)</url>"), F.lit(1)),
                    lambda b: F.struct(F.lit("url").alias("kind"), b.alias("blk")),
                ),
                F.transform(
                    F.regexp_extract_all(
                        F.col(body), F.lit(r"<sitemap>([\s\S]*?)</sitemap>"), F.lit(1)
                    ),
                    lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("blk")),
                ),
            )
        ).alias("e"),
    )
    loc = F.trim(F.regexp_extract(F.col("e.blk"), r"<loc>([\s\S]*?)</loc>", 1))
    lastmod = F.trim(
        F.regexp_extract(F.col("e.blk"), r"<lastmod>([\s\S]*?)</lastmod>", 1)
    )
    return (
        blocks.select(
            "sitemap_url",
            F.col("e.kind").alias("kind"),
            loc.alias("loc"),
            F.nullif(lastmod, F.lit("")).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )
