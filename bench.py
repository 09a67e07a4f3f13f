"""Bench harness: headline queries + extraction throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "pages_per_sec": ...,
   "steal": {...provenance...}}

The headline metric mirrors BASELINE.json: pages/sec extraction throughput,
measured over a deterministic synthetic pages table (the generator is part of
the engine; pages are generated once, written to parquet, and timed reads go
through the same scan path a lake table would).

STEAL-GATING (round 5, VERDICT r4 #1): this is a shared host — noisy-neighbor
bursts contaminated the round-4 artifact (trivial unchanged-plan queries read
4× slower than round 3 while the same round's quiet-window scaling run hit
best-ever throughput). The harness now applies the same /proc/stat steal
accounting the scaling harness pioneered (BENCH/scaling.py:_steal_total):
it WAITS for a quiet window before starting, measures the steal fraction
around every rep, re-runs any steady rep whose window was contaminated (up to
BENCH_MAX_TRIES), and publishes full provenance — per-query steal fractions,
retry counts, and a clean/contaminated verdict — so a reader can tell
measurement from noise without re-deriving it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# 60k pages ≈ 0.5s of real work per task at 32 workers — enough to amortize
# python-worker/Arrow per-task setup; at 20k the job measured fixed overhead
# (the 400k-page scaling harness is the steady-state reference)
EXTRACT_PAGES = int(os.environ.get("BENCH_EXTRACT_PAGES", "60000"))

# a rep is "clean" if steal on the host during it stayed under this fraction
STEAL_GATE = float(os.environ.get("BENCH_STEAL_GATE", "0.01"))
# max timed attempts per query before publishing the best contaminated rep
MAX_TRIES = int(os.environ.get("BENCH_MAX_TRIES", "4"))
# pre-flight: wait up to this long for a quiet window before the timed pass
QUIET_WAIT_MAX = int(os.environ.get("BENCH_QUIET_WAIT_MAX", "600"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "broadcast_brand_agg",
    "window_top_orders",
    "sessionize_events",
    "hourly_event_rollup",
    "dedup_exact_docs",
    "jaccard_pairs_3gram",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ann_cosine_topk",
    "doc_lang_guess",
    "doc_quality",
    # round 2 additions
    "embedding_dup_pairs",
    "model_inference_scores",
    # round 3: the ANN scale paths (bucketed/IVF), timed next to the exact
    # baseline ann_cosine_topk they approximate
    "ann_lsh_topk",
    "ann_ivf_topk",
    # round 4: the depth queries (iterative k-means, trained-IVF search,
    # winnowing fingerprints) — oracled since r3, now timed so their scale
    # behavior is tracked like everything else. Promoting winnowing
    # immediately caught an O(words²) HOF re-evaluation (295s → 4.5s).
    "ivf_train_centroids",
    "ann_ivf_trained_topk",
    "ann_pq_topk",
    "doc_winnow_fingerprints",
    # round 4 additions: real media decode + the distributed exact ntile
    "media_features",
    "ntile_price_bands",
    # round 5: the r4 text-curation operators, promoted to the bench (bench
    # promotion is what catches per-row blowups — see winnowing above)
    "doc_pii_scrub",
    "doc_repetition_stats",
    "url_canonical_dedup",
    # round 5 late additions: the curation decision, train/test
    # decontamination, and corpus-relative rarity — timed from day one
    "doc_gopher_filter",
    "doc_decontaminate",
    "doc_decontaminate_bloom",
    "doc_bm25_topk",
    "doc_rarity_stats",
    "doc_passage_overlap",
    "doc_line_dedup",
    "doc_source_quota_sample",
    "doc_quality_tiers",
    "doc_domain_stats",
    "doc_pack_plan",
    "host_pagerank",
    "extraction_outlinks",
    "anchor_text_index",
    "warc_ingest",
    "warc_cdx",
    "crawl_snapshot_diff",
    "robots_crawl_gate",
    "robots_crawl_delays",
    "host_components",
    "sitemap_ingest",
    # round 6: the trained classifier (per-epoch scans — the heaviest new
    # surface), exact substring dedup, the BPE replace-chain tokenizer, and
    # the CDX fetch round trip — timed from day one (bench promotion is the
    # per-row-blowup detector)
    "model_train_eval",
    "doc_span_dedup",
    "doc_bpe_tokens",
    "warc_fetch_by_url",
]


def _steal_total() -> tuple[float, float]:
    """(steal_jiffies, total_jiffies) over ALL cpus — the bench runs
    local[N] unpinned on the whole box, so host-wide steal is the right
    contamination signal (the pinned-core variant lives in BENCH/scaling.py)."""
    steal = total = 0.0
    for line in open("/proc/stat"):
        parts = line.split()
        if parts and parts[0].startswith("cpu") and parts[0] != "cpu":
            vals = [float(x) for x in parts[1:]]
            steal += vals[7] if len(vals) > 7 else 0.0
            total += sum(vals)
    return steal, total


class _StealMeter:
    def __enter__(self):
        self.s0, self.t0 = _steal_total()
        return self

    def __exit__(self, *exc):
        s1, t1 = _steal_total()
        self.frac = round((s1 - self.s0) / max(t1 - self.t0, 1.0), 5)
        return False


def _wait_quiet(max_wait: int = QUIET_WAIT_MAX, probe: int = 10) -> tuple[float, float]:
    """Block until a probe window shows steal < STEAL_GATE, up to
    ``max_wait`` seconds; → (last observed frac, seconds waited)."""
    t0 = time.monotonic()
    frac = 1.0
    while True:
        with _StealMeter() as m:
            time.sleep(probe)
        frac = m.frac
        waited = time.monotonic() - t0
        if frac < STEAL_GATE:
            return frac, round(waited, 1)
        if waited > max_wait:
            print(f"  WARNING: no quiet window in {max_wait}s (steal {frac}); proceeding", file=sys.stderr)
            return frac, round(waited, 1)
        print(f"  waiting for quiet window (steal {frac})", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ocr_machine_spark.session import get_spark

    spark = get_spark(app="ocr-machine-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    # untimed warmup: JVM JIT, python-worker spin-up, AND whole-stage-codegen
    # compilation — each headline query runs once at sf0.001 first (the
    # generated code is cached by source text, so the sf0.1 timed run reuses
    # it). Timed numbers therefore measure steady-state data processing, the
    # quantity that scales to 100 TB — not one-time-per-JVM compile (~3-9s
    # for the widest aggregate plans, paid once per executor lifetime in
    # production).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    E.entry(spark).count()
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()

    preflight_frac, waited = _wait_quiet()

    # per query: one cold rep (pays residual plan-width-dependent codegen /
    # shuffle-service spin-up — published as queries_cold so one-time compile
    # never masquerades as per-row cost), then steady reps retried until the
    # steal meter says the window was clean (or MAX_TRIES, publishing the
    # best rep flagged contaminated).
    times: dict[str, float] = {}
    times_cold: dict[str, float] = {}
    prov: dict[str, dict] = {}
    for name in HEADLINE:
        with _StealMeter() as m:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()  # full materialization of the result
            cold = round(time.perf_counter() - t0, 3)
        cold_steal = m.frac
        best, best_steal, tries, clean = None, None, 0, False
        while tries < MAX_TRIES:
            tries += 1
            with _StealMeter() as m:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                sec = round(time.perf_counter() - t0, 3)
            rep_clean = m.frac < STEAL_GATE
            # a clean rep always replaces a contaminated best — a burst can
            # make a query LOOK faster (the work overlapped the meter
            # differently), and publishing a contaminated time under
            # clean=true would defeat the gate
            if best is None or (rep_clean and not clean) or (rep_clean == clean and sec < best):
                best, best_steal = sec, m.frac
            if rep_clean:
                clean = True
                break
            if tries < MAX_TRIES:
                # a noisy-neighbor burst is in progress — don't burn the
                # remaining tries inside it; wait for it to pass first
                _wait_quiet(max_wait=120, probe=5)
        times_cold[name], times[name] = cold, best
        prov[name] = {
            "cold_steal": cold_steal,
            "steady_steal": best_steal,
            "tries": tries,
            "clean": clean,
            "rows": n,
        }
        flag = "" if clean else " [CONTAMINATED]"
        print(
            f"  {name}: {best}s steady / {cold}s first ({n} rows, steal {best_steal}, {tries} tries){flag}",
            file=sys.stderr,
        )

    # extraction throughput: generate once (not timed), then timed extract,
    # steal-gated like the queries
    from ocr_machine_spark.operators.extraction import extract_pages
    from ocr_machine_spark.sources.pages import generate_pages

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        pages_path = os.path.join(tmp, "pages")
        generate_pages(spark, EXTRACT_PAGES, partitions=32).write.parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        best = None
        tries, clean = 0, False
        while tries < MAX_TRIES:
            tries += 1
            with _StealMeter() as m:
                t0 = time.perf_counter()
                # scan-aligned (no pre-shuffle): parquet scan splits are
                # byte-uniform, and per-row extraction has no key skew — the
                # salted repartition is for the KEYED stages (reassembly/host
                # aggs), not the map. Measured 2-3x faster than shuffling
                # first at this scale.
                out = extract_pages(pages)
                stats = out.groupBy().agg(
                    {"bytes_html": "sum", "chars_out": "sum", "url": "count"}
                ).collect()[0]
                sec = time.perf_counter() - t0
            rep_clean = m.frac < STEAL_GATE
            if best is None or (rep_clean and not clean) or (rep_clean == clean and sec < best[0]):
                best = (sec, m.frac)
            if rep_clean:
                clean = True
                break
            if tries < MAX_TRIES:
                _wait_quiet(max_wait=120, probe=5)
        ext_sec, ext_steal = best
        n_pages = stats["count(url)"]
        bytes_html = stats["sum(bytes_html)"]
        times["extract_pages"] = round(ext_sec, 3)
        prov["extract_pages"] = {"steady_steal": ext_steal, "tries": tries, "clean": clean}
        pages_per_sec = round(n_pages / ext_sec, 1)
        mb_per_sec = round(bytes_html / ext_sec / 1e6, 2)
        print(
            f"  extract_pages: {ext_sec:.1f}s ({n_pages} pages, {pages_per_sec} pages/s, "
            f"{mb_per_sec} MB/s, steal {ext_steal}, {tries} tries)",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "headline_queries_plus_extraction",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_cold": times_cold,
        "sf": sf,
        "pages_per_sec": pages_per_sec,
        "html_mb_per_sec": mb_per_sec,
        "extract_pages_n": n_pages,
        "steal": {
            "gate": STEAL_GATE,
            "preflight_frac": preflight_frac,
            "preflight_waited_sec": waited,
            "all_clean": all(p["clean"] for p in prov.values()),
            "per_query": prov,
        },
    }
    # Full provenance (per-query steal fractions, cold times, retry counts)
    # goes to the artifact FILE; stdout carries a compact headline line. The
    # driver captures only the last ~2000 chars of stdout — round 5's full
    # object (~8KB) overflowed that and BENCH_r05.json landed with
    # parsed: null, so the headline metrics were machine-unreadable.
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, "bench_full_local.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    compact = {k: full[k] for k in (
        "metric", "value", "unit", "queries", "sf",
        "pages_per_sec", "html_mb_per_sec", "extract_pages_n",
    )}
    compact["all_clean"] = full["steal"]["all_clean"]
    line = json.dumps(compact)
    if len(line) > 1900:  # keep headroom under the driver's tail capture
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:25])
        compact["queries"] = slowest
        compact["queries_truncated"] = len(times) - len(slowest)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
