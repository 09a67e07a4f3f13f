"""Bench harness: headline queries + extraction throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "pages_per_sec": ...}

The headline metric mirrors BASELINE.json: pages/sec extraction throughput,
measured over a deterministic synthetic pages table (the generator is part of
the engine; pages are generated once, written to parquet, and timed reads go
through the same scan path a lake table would).
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
    "doc_winnow_fingerprints",
    # round 4 additions: real media decode + the distributed exact ntile
    "media_features",
    "ntile_price_bands",
]


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

    # each query runs twice at sf: the FIRST rep still pays any residual
    # one-time cost the sf0.001 warmup didn't cover (plan-width-dependent
    # codegen, shuffle-service spin-up) plus whatever host noise hit it; the
    # SECOND rep is steady state — the quantity that scales to 100 TB, where
    # compile happens once per executor lifetime. Both are published
    # (queries = steady, queries_cold = first rep) so one-time compile can
    # never masquerade as per-row cost, or vice versa.
    times: dict[str, float] = {}
    times_cold: dict[str, float] = {}
    for name in HEADLINE:
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()  # full materialization of the result
            reps.append(round(time.perf_counter() - t0, 3))
        times_cold[name], times[name] = reps[0], reps[1]
        print(f"  {name}: {times[name]}s steady / {reps[0]}s first ({n} rows)", file=sys.stderr)

    # extraction throughput: generate once (not timed), then timed extract
    from ocr_machine_spark.operators.extraction import extract_pages
    from ocr_machine_spark.sources.pages import generate_pages

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        pages_path = os.path.join(tmp, "pages")
        generate_pages(spark, EXTRACT_PAGES, partitions=32).write.parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        t0 = time.perf_counter()
        # scan-aligned (no pre-shuffle): parquet scan splits are byte-uniform,
        # and per-row extraction has no key skew — the salted repartition is
        # for the KEYED stages (reassembly/host aggs), not the map. Measured
        # 2-3x faster than shuffling first at this scale.
        out = extract_pages(pages)
        stats = out.groupBy().agg(
            {"bytes_html": "sum", "chars_out": "sum", "url": "count"}
        ).collect()[0]
        ext_sec = time.perf_counter() - t0
        n_pages = stats["count(url)"]
        bytes_html = stats["sum(bytes_html)"]
        times["extract_pages"] = round(ext_sec, 3)
        pages_per_sec = round(n_pages / ext_sec, 1)
        mb_per_sec = round(bytes_html / ext_sec / 1e6, 2)
        print(f"  extract_pages: {ext_sec:.1f}s ({n_pages} pages, {pages_per_sec} pages/s, {mb_per_sec} MB/s)", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_extraction",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_cold": times_cold,
                "sf": sf,
                "pages_per_sec": pages_per_sec,
                "html_mb_per_sec": mb_per_sec,
                "extract_pages_n": n_pages,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
