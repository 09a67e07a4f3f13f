"""Link-graph plan: pages → outlinks → host edges → PageRank, as one job.

The webgraph build a crawl pipeline runs beside extraction (Common Crawl
ships exactly this pair of artifacts per crawl: a host-level edge list and
host-level ranks). Everything is a pure deterministic function of the
input pages — outlink extraction is per-row, the edge rollup and the rank
iterations are exact BIGINT arithmetic — so re-running produces
byte-identical tables on any partitioning or cluster size and the job is
idempotent via overwrite (no bucket lineage; contrast
``plans.lineage.run_extraction``).

Outputs under ``out_dir``:
* ``edges``  — (src_host, dst_host, n_links): distinct host pairs with the
  anchor multiplicity that produced them (self-host links excluded from
  the graph but counted in stats).
* ``ranks``  — (node, out_degree, rank_e9): operators.graphs.host_pagerank
  over the edge list.

Scale shape: one Arrow link stage over the slim (url, html) projection,
one shuffle keyed on (src_host, dst_host) for the rollup, then the
PageRank iteration joins (edge table materialized once). The stats line
collects only scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_machine_spark.operators.extraction import extract_outlinks
from ocr_machine_spark.operators.graphs import host_pagerank
from ocr_machine_spark.operators.urls import host_of


def host_edges(pages: DataFrame, *, partitions: int | None = None) -> DataFrame:
    """pages(url, html) → (src_host, dst_host, n_links) host-level edges.

    Hosts use the crawl dedup key (operators.urls.host_of: lowercased
    authority minus port/www). Links that stay on their own host are
    dropped here — intra-host navigation is boilerplate for ranking
    purposes and would otherwise dominate every host's out-degree."""
    links = extract_outlinks(pages, partitions=partitions)
    return (
        links.select(
            host_of(F.col("url")).alias("src_host"),
            host_of(F.col("href")).alias("dst_host"),
        )
        # both ends must be real hosts: an unparseable page url maps to
        # src_host '' (host_of's spec) and would otherwise enter the graph
        # as a phantom node donating rank mass
        .where(
            (F.col("src_host") != F.col("dst_host"))
            & (F.col("dst_host") != "")
            & (F.col("src_host") != "")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def run_linkgraph(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    n_iters: int = 5,
    partitions: int | None = None,
) -> dict:
    """Write edges + ranks under ``out_dir``; → run stats.

    Only the edge plan executes against the pages input; the rank pass and
    the stats both read the edges parquet back, so the two tables and the
    stats line can never disagree (same single-computation discipline as
    plans.curate.run_curation)."""
    host_edges(pages, partitions=partitions).write.mode("overwrite").parquet(
        f"{out_dir}/edges"
    )
    edges = spark.read.parquet(f"{out_dir}/edges")
    ranks = host_pagerank(
        edges.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst")),
        n_iters=n_iters,
    )
    ranks.write.mode("overwrite").parquet(f"{out_dir}/ranks")
    ranks = spark.read.parquet(f"{out_dir}/ranks")
    e = edges.agg(
        F.count("*").alias("n_edges"), F.sum("n_links").alias("n_links")
    ).first()
    r = ranks.agg(F.count("*").alias("n_hosts"), F.max("rank_e9").alias("max_rank_e9")).first()
    top = ranks.orderBy(F.desc("rank_e9"), "node").select("node").first()
    return {
        "run_id": run_id,
        "n_links": int(e["n_links"] or 0),
        "n_edges": int(e["n_edges"]),
        "n_hosts": int(r["n_hosts"]),
        "n_iters": n_iters,
        "top_host": top["node"] if top is not None else None,
        "max_rank_e9": int(r["max_rank_e9"] or 0),
    }
