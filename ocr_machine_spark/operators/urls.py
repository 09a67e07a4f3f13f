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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"
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
