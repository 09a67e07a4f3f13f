"""Crawl-frontier composition (plans.frontier): robots gate + Crawl-delay
politeness + sitemap discovery + snapshot freshness + PageRank priority as
one scheduler-feed plan, plus the production CLI e2e."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from ocr_machine_spark.plans.frontier import build_frontier
from ocr_machine_spark.sources.pages import generate_pages


def _fixtures(spark, n=60):
    pages = generate_pages(spark, n, partitions=4)
    # previous snapshot: ~3/4 of urls, with some bodies mutated so the diff
    # yields changed/unchanged/added (dropped urls become removed)
    old = pages.where(F.xxhash64("url") % 4 != 0).withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 5 == 0, F.concat(F.col("html"), F.lit(b" rev"))
        ).otherwise(F.col("html")),
    )
    hosts = pages.select(
        F.regexp_replace(
            F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1),
            r"^www\.", "",
        ).alias("host")
    ).distinct()
    robots = hosts.select(
        "host",
        F.lit(
            "User-agent: *\nDisallow: /page/1\nCrawl-delay: 1.5\n"
        ).alias("robots_txt"),
    )
    sitemaps = hosts.limit(1).select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")).alias(
            "sitemap_url"
        ),
        F.concat(
            F.lit("<urlset><url><loc>https://"),
            F.col("host"),
            F.lit("/brand-new/1</loc></url></urlset>"),
        ).alias("xml"),
    )
    return pages, old, robots, sitemaps


def test_build_frontier_composes_all_signals(spark):
    pages, old, robots, sitemaps = _fixtures(spark)
    out = build_frontier(
        pages, robots=robots, sitemaps=sitemaps, old_pages=old, partitions=4
    ).collect()
    rows = {r["url"]: r for r in out}

    fresh = {r["freshness"] for r in out}
    assert {"added", "unchanged", "changed", "discovered"} <= fresh
    disc = [r for r in out if r["freshness"] == "discovered"]
    assert len(disc) == 1 and disc[0]["url"].endswith("/brand-new/1")

    # the robots gate: /page/1* urls blocked with the matched prefix,
    # everything else allowed; politeness rides the host join (1.5s → 1500ms)
    for r in out:
        path_blocked = "/page/1" in r["url"] and not r["url"].endswith("/brand-new/1")
        assert r["allowed"] == (not path_blocked), r["url"]
        if path_blocked:
            assert r["rule_prefix"] == "/page/1"
        assert r["crawl_delay_ms"] == 1500
    # priority: hosts that receive links carry their PageRank; every rank
    # present is positive
    ranked = [r for r in out if r["priority_e9"] is not None]
    assert ranked and all(r["priority_e9"] > 0 for r in ranked)
    assert len(rows) == len(out)  # url is a key


def test_build_frontier_without_optional_inputs(spark):
    pages, _, _, _ = _fixtures(spark, n=30)
    out = build_frontier(pages, partitions=4).collect()
    assert {r["freshness"] for r in out} == {"known"}
    assert all(r["allowed"] and r["crawl_delay_ms"] is None for r in out)


def test_frontier_cli_end_to_end(spark, tmp_path):
    """The production surface: jobs.py --job frontier in a subprocess
    (main() stops its session), stats line consistent with the table."""
    pages, old, robots, sitemaps = _fixtures(spark)
    p_pages, p_old = str(tmp_path / "pages"), str(tmp_path / "old")
    p_rob, p_sm = str(tmp_path / "robots"), str(tmp_path / "sitemaps")
    out = str(tmp_path / "out")
    pages.write.parquet(p_pages)
    old.write.parquet(p_old)
    robots.write.parquet(p_rob)
    sitemaps.write.parquet(p_sm)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "ocr_machine_spark/jobs.py", "--job", "frontier",
         "--input", p_pages, "--diff-against", p_old, "--robots", p_rob,
         "--sitemaps", p_sm, "--output", out, "--run-id", "f1",
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=repo_root, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["n_urls"] == stats["n_allowed"] + stats["n_blocked"]
    assert stats["n_blocked"] > 0 and stats["n_with_delay"] == stats["n_urls"]
    assert stats["fresh_discovered"] == 1 and stats["fresh_added"] > 0

    table = spark.read.parquet(f"{out}/frontier")
    assert table.count() == stats["n_urls"]
    assert set(table.columns) == {
        "url", "host", "allowed", "rule_prefix",
        "crawl_delay_ms", "priority_e9", "freshness",
    }
