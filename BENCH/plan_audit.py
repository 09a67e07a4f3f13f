"""Physical-plan audit: regenerate PLANS.md from the live query plans.

For each headline query this dumps the executed-plan skeleton (join
strategies, exchanges, aggregate modes, scan pruning) plus the plan
properties the engine promises — the human-readable companion to the CI
plan gates in tests/test_plans.py. Run after any query change:

    python BENCH/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDITED = [
    ("q3_shipping_priority", "filters before joins; small dims broadcast; single partial+final agg"),
    ("q5_region_revenue", "5-way join: two broadcasts (nation, region), shuffled joins on the fact keys"),
    ("broadcast_brand_agg", "BroadcastHashJoin asserted in CI"),
    ("window_top_orders", "single sort-based window per o_custkey, rank pushed as filter"),
    ("asof_purchase_before_click", "union + running-max window — NO join node (round-2 fix)"),
    ("minhash_lsh_pairs", "band-bucket equi-join (explicit bucket-key repartition pins parallelism AQE would coalesce away); candidate-only verify join on hashed shingle keys; no cross join"),
    ("jaccard_pairs_3gram", "exact verify tier (max_docs-guarded): hashed-shingle self-join, pair instances repartitioned by (a,b) BEFORE counting (both aggregate steps post-exchange, no spilling map-side tables), broadcast size joins"),
    ("embedding_dup_pairs", "banded SRP bucket equi-join (bucket-key repartition, r7) + Arrow verify; no cross join (round-2 fix)"),
    ("simhash_near_pairs", "pure JVM signatures (map-side partial bit-votes); r7: chunk-bucket equi-join over DISTINCT signatures (grid-salted, first-match dedup) + membership expansion — identical pairs, candidate volume no longer quadratic in cluster size"),
    ("ann_ivf_topk", "Arrow-batch numpy cell assignment (per-row compute); probed-cell equi-join"),
    ("ann_cosine_topk", "broadcast tiny query side; codegen'd unrolled dots; norms once per row"),
    ("ivf_train_centroids", "per-batch numpy pre-reduce -> one tiny (cell,pos) aggregation; no explode of the table"),
    ("doc_winnow_fingerprints", "per-row array expressions + Generate; no shuffle before the consumer"),
    ("doc_repetition_stats", "complete Gopher set in one plan: tagged-struct explode for n=2,3,4 counts; posexplode+join-back coverage for dup-5-grams; all shuffles keyed on doc_id[, gram] — nothing in-row O(words^2)"),
    ("doc_decontaminate", "benchmark shingles deduped + BROADCAST -> map-side hash join over exploded training shingles; zero shuffle of training text"),
    ("doc_decontaminate_bloom", "bench side folded to a bit_or bitmap (tiny agg); probe = h BROADCAST word-index joins + codegen'd bit tests; the per-doc count is the ONLY shuffle of training data"),
    ("doc_bm25_topk", "postings filtered to query terms BEFORE any shuffle; df collapses to <=|terms| rows and broadcasts back; corpus stats = 1-row BNLJ; global top-k is TakeOrderedAndProject"),
    ("doc_rarity_stats", "corpus model built in-plan: word-keyed partial-agg count, shuffle join back on word, per-doc agg — hot keys collapse map-side"),
    ("doc_passage_overlap", "winnow fps (per-row arrays) -> df-capped fp filter -> ONE fp-keyed collect_list groupBy + in-row pair generation (replaced the 4x-recompute self-join) -> pair-keyed count; df cap bounds the per-fp pair array"),
    ("doc_line_dedup", "explode lines -> partial-agg min keeper per hash (map-side combine kills boilerplate keys) -> hash equi-join -> per-doc reassembly; no window on the hot key"),
    ("doc_source_quota_sample", "WindowGroupLimit BELOW the exchange: partial per-partition top-cap before the shuffle"),
    ("doc_domain_stats", "host-keyed agg; count_distinct expands to a (host,fp) partial agg so mega-host rows combine map-side; spam verdict is a post-agg projection, no second pass"),
    ("doc_pack_plan", "one shuffle on the shard key; per-shard running-sum window (sort-based, bounded by shard size); bin ids are post-window integer arithmetic; r7: zero-span exclusion is a cheap pushable text predicate so the BPE counter never re-evaluates as a Filter"),
    ("host_pagerank", "edge list + degrees localCheckpoint'd once; per iteration ONE shuffle join on src + ONE dst-keyed agg; teleport term is a literal (single driver scalar N)"),
    ("extraction_outlinks", "one mapInArrow link stage over the slim (url, html) projection; zero shuffles after the fixture generator's distribution"),
    ("warc_ingest", "binaryFile scan -> ONE streaming mapInArrow parse stage (gzip members inflated one at a time) -> JVM projection (md5/length); zero shuffles — ingest is a pure map"),
    ("warc_cdx", "same pure-map shape as ingest but emits (file, offset, length, digest) index rows; the production job adds ONE range-partition sort exchange over index rows (url-sorted output)"),
    ("crawl_snapshot_diff", "ONE full-outer equi-join on url (SMJ; co-locates on bucketed snapshots) + pure post-join CASE projection — no second pass"),
    ("robots_crawl_gate", "relational robots parse (lag + running-sum sections, tiny per-host rows) -> size-driven rules join onto urls (auto-broadcast when tiny) -> rank-1 window (longest-prefix winner) -> default-allow left join"),
    ("robots_crawl_delays", "same shared section parse -> star-section join -> try_cast + per-host max agg; all shuffles keyed on host (tiny per-host rows)"),
    ("host_components", "large/small-star rounds on string hosts: per round one groupBy + one equi-join, edges localCheckpoint'd; plan shown is the final labels join (iterations materialize)"),
    ("sitemap_ingest", "pure-map discovery feed: regexp_extract_all blocks -> ONE Generate (explode) -> codegen'd loc/lastmod extraction; zero shuffles after the fixture generator's distinct (the production scan path has no pre-shuffle)"),
    ("ann_pq_topk", "Arrow numpy encode (8 codes/vec) -> posexplode + BROADCAST LUT join -> (qid,nid) agg -> ADC top-R window -> broadcast candidates back onto the scan for exact-cosine refine -> top-k"),
    ("anchor_text_index", "(target,term) partial-count agg (hot nav terms combine map-side) -> row_number rank<=j compiled to WindowGroupLimit: partial top-j BELOW the exchange, mega-targets ship <=j rows per upstream partition"),
    ("model_train_eval", "per-epoch Arrow gradient pass pre-reduced to <=dim+4 rows per batch (map-side numpy int64 combine) -> tiny (kind,pos) agg localCheckpoint'd; plan shown is the final metrics assembly: unions of 1-row epoch folds + a 1-row min-struct broadcast for the best-checkpoint flag"),
    ("doc_span_dedup", "md5(gram)-keyed partial agg (map-side combine collapses hot boilerplate grams BEFORE the shuffle) -> witness join-back -> position explode + distinct -> left join + per-doc ordered reassembly; three shuffles, no window on the hot key"),
    ("doc_bpe_tokens", "the ENTIRE tokenizer is a codegen'd chain of literal replace() string expressions over one projection — zero Python, zero shuffles, zero joins"),
    ("warc_fetch_by_url", "request urls BROADCAST-semi-join the CDX index (r7: explicit broadcast of the bounded list-typed request set — the index side is never exchanged); the fetch stage is a pure mapInArrow range-read per record — no shuffle anywhere"),
    ("corpus_curation_stats", "extract -> gates -> dedup semi-join -> split agg in ONE plan"),
    ("extraction_e2e", "one mapInArrow extract stage; the Exchange below it is the FIXTURE GENERATOR's salted distribution (the oracle corpus is generated, not scanned) — the production scan path has no pre-shuffle (bench.py extract_pages; ReadSchema pruning CI-gated)"),
]

INTERESTING = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|"
    r"CartesianProduct|HashAggregate|SortAggregate|ObjectHashAggregate|Exchange|"
    r"Window|Sort|MapInArrow|MapInPandas|ArrowEvalPython|BatchEvalPython|"
    r"FileScan|Generate|Union|GlobalLimit|TakeOrderedAndProject)\b"
)


def skeleton(plan: str, limit: int = 28) -> list[str]:
    out = []
    for line in plan.splitlines():
        if INTERESTING.search(line):
            line = line.strip()
            if len(line) > 110:
                line = line[:107] + "..."
            out.append(line)
        if len(out) >= limit:
            out.append("... (truncated)")
            break
    return out


def main() -> None:
    from ocr_machine_spark.session import get_spark

    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    parts = [
        "# PLANS — physical-plan audit of the headline queries\n",
        "Generated by `python BENCH/plan_audit.py` at sf0.001. Join-strategy\n"
        "SELECTION is size-dependent (tiny fact sides broadcast here; at 100 TB\n"
        "the fact-fact joins become sort-merge on the shuffled keys — that\n"
        "switch is Catalyst/AQE's job). What the engine PROMISES, and CI pins\n"
        "(tests/test_plans.py), are the scale-invariant properties: scans\n"
        "pruned to the used columns, filters pushed to the scan, dimension\n"
        "sides explicitly broadcast, partial aggregation before every\n"
        "exchange, no cross join anywhere in the 64-query contract, zero\n"
        "row-at-a-time Python.\n",
    ]
    for name, note in AUDITED:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        parts.append(f"\n## {name}\n\n_{note}_\n\n```")
        parts.extend(skeleton(plan))
        parts.append("```")

    # production frontier plan (jobs.py --job frontier): not a queries()
    # entry — audited from the composed DataFrame directly. The promise:
    # every per-host model table (robots rules, crawl delays, PageRank
    # ranks) BROADCASTS onto the url stream; url-keyed work (candidate
    # distinct, freshness diff, decision window, assembly joins) shuffles
    # on the one url key.
    from pyspark.sql import functions as F

    from ocr_machine_spark.plans.frontier import build_frontier
    from ocr_machine_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, partitions=4)
    old = pages.where(F.xxhash64("url") % 4 != 0)
    hosts = pages.select(
        F.regexp_replace(
            F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1),
            r"^www\.", "",
        ).alias("host")
    ).distinct()
    robots = hosts.select(
        "host", F.lit("User-agent: *\nDisallow: /page/1\nCrawl-delay: 2\n").alias("robots_txt")
    )
    sitemaps = hosts.limit(1).select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")).alias("sitemap_url"),
        F.concat(F.lit("<urlset><url><loc>https://"), F.col("host"),
                 F.lit("/new/1</loc></url></urlset>")).alias("xml"),
    )
    # checkpoint_candidates=False: show the full lazy plan (the production
    # barrier would hide the candidate branch behind a checkpoint scan)
    fr = build_frontier(
        pages, robots=robots, sitemaps=sitemaps, old_pages=old,
        checkpoint_candidates=False,
    )
    parts.append(
        "\n## frontier (jobs.py --job frontier)\n\n"
        "_scheduler feed: per-host model tables (rules/delays/ranks) are "
        "broadcast-sized and AQE broadcasts them at runtime (no forced hint — "
        "the 10^8-host extreme must be allowed to degrade to a host-keyed "
        "equi-join, the robots_check policy); url-keyed shuffles share the "
        "one url key; PageRank's own iterations shuffle host-keyed rows "
        "only_\n\n```"
    )
    parts.extend(skeleton(fr._jdf.queryExecution().executedPlan().toString(), limit=40))
    parts.append("```")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(parts) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
