"""Scaling-efficiency evidence (BASELINE.md protocol, north_rule gate).

No real cluster exists in this sandbox, so the N-vs-4N-executor criterion is
evidenced by running the IDENTICAL extraction job at two local parallelism
levels on the SAME pre-generated input, each in a fresh JVM:

    python BENCH/scaling.py            # orchestrates both runs, writes
                                       # BENCH/BASELINE.md + BENCH/scaling.json

Child mode (one measurement): python BENCH/scaling.py --cores N --input PATH
Efficiency = (throughput@32 / throughput@8) / (32 / 8); pass if ≥ 0.8.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SCALING_PAGES", "60000"))
LEVELS = (8, 32)


def _measure(cores: int, input_path: str) -> dict:
    from ocr_machine_spark.operators.extraction import extract_pages
    from ocr_machine_spark.session import get_spark

    spark = get_spark(app=f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(input_path)
    t0 = time.perf_counter()
    out = extract_pages(pages, partitions=cores * 2)
    stats = out.groupBy().agg({"bytes_html": "sum", "url": "count", "ok": "count"}).collect()[0]
    sec = time.perf_counter() - t0
    n = stats["count(url)"]
    res = {
        "cores": cores,
        "pages": n,
        "sec": round(sec, 2),
        "pages_per_sec": round(n / sec, 1),
        "html_mb_per_sec": round(stats["sum(bytes_html)"] / sec / 1e6, 2),
    }
    spark.stop()
    return res


def _orchestrate() -> None:
    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    try:
        input_path = os.path.join(tmp, "pages")
        # generate the shared input once (not timed)
        from ocr_machine_spark.session import get_spark
        from ocr_machine_spark.sources.pages import generate_pages

        gen = get_spark(app="scaling-gen", master="local[32]")
        gen.sparkContext.setLogLevel("ERROR")
        generate_pages(gen, N_PAGES, partitions=64).write.parquet(input_path)
        gen.stop()

        results = []
        for cores in LEVELS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores", str(cores), "--input", input_path],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            line = out.stdout.strip().splitlines()[-1]
            results.append(json.loads(line))
            print(f"local[{cores}]: {results[-1]}", file=sys.stderr)

        lo, hi = results[0], results[1]
        speedup = hi["pages_per_sec"] / lo["pages_per_sec"]
        efficiency = speedup / (LEVELS[1] / LEVELS[0])
        summary = {
            "pages": N_PAGES,
            "levels": results,
            "speedup": round(speedup, 3),
            "efficiency": round(efficiency, 3),
            "pass": efficiency >= 0.8,
        }
        bench_dir = os.path.join(REPO, "BENCH")
        with open(os.path.join(bench_dir, "scaling.json"), "w") as f:
            json.dump(summary, f, indent=2)
        with open(os.path.join(bench_dir, "BASELINE.md"), "w") as f:
            f.write(
                "# BENCH/BASELINE — measured scaling evidence\n\n"
                "Protocol per /root/repo/BASELINE.md: identical extraction job, same\n"
                f"pre-generated input ({N_PAGES} synthetic CC-style pages), fresh JVM per\n"
                "level, AQE on, shuffle partitions = 2×cores.\n\n"
                "| level | pages | sec | pages/sec | html MB/sec |\n|---|---|---|---|---|\n"
                + "".join(
                    f"| local[{r['cores']}] | {r['pages']} | {r['sec']} | {r['pages_per_sec']} | {r['html_mb_per_sec']} |\n"
                    for r in results
                )
                + f"\nspeedup {LEVELS[0]}→{LEVELS[1]} cores: **{speedup:.2f}×**  \n"
                f"scaling efficiency: **{efficiency:.3f}** (gate ≥ 0.8 → "
                + ("**PASS**" if efficiency >= 0.8 else "**FAIL**")
                + ")\n\nThroughput is auditable against the lineage table: "
                "`ocr_machine_spark.plans.lineage` records per-bucket rows/bytes.\n"
            )
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input")
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(_measure(args.cores, args.input)))
    else:
        _orchestrate()
