"""Skew-win demonstration (north_rule: explicit skew handling, demonstrated).

The salted path must not only cost nothing on uniform data — it must WIN on
skewed data. This harness constructs the adversarial layout the salt exists
for (one mega-host owning ~85% of pages — the real-web shape where a handful
of domains dominate a crawl slice), then runs the IDENTICAL extraction twice,
each paying one full shuffle of the html bytes; only the partitioning
expression differs:

* ``keyed_unsalted`` — ``repartition(P, host)``: the naive keyed layout; the
  mega-host's 85% lands on ONE task and the stage runs at single-core speed;
* ``salted``         — ``repartition_salted`` (content-derived salt): the
  same rows spread evenly over all P tasks.

Usage:
    python BENCH/skew_bench.py            # orchestrates, appends the table
                                          # to BENCH/BASELINE.md, writes
                                          # BENCH/skew_bench.json
Child:  python BENCH/skew_bench.py --variant salted --input PATH

Protocol matches BENCH/scaling.py: taskset-pinned children (fresh JVM per
measurement), steal fraction recorded per rep, best-of-reps reported.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SKEW_PAGES", "40000"))
MEGA_SHARE = 85  # % of pages forced onto one host
CORES = int(os.environ.get("SKEW_CORES", "8"))
REPS = int(os.environ.get("SKEW_REPS", "2"))
HOST_RE = r"^https?://([^/]+)"


def _steal_total(cores: int) -> tuple[float, float]:
    want = {f"cpu{i}" for i in range(cores)}
    steal = total = 0.0
    for line in open("/proc/stat"):
        parts = line.split()
        if parts and parts[0] in want:
            vals = [float(x) for x in parts[1:]]
            steal += vals[7] if len(vals) > 7 else 0.0
            total += sum(vals)
    return steal, total


def _skew_pages(spark, n: int):
    """Fixture pages with ~MEGA_SHARE% of urls rewritten onto one host —
    content untouched (the workload is identical; only the KEY distribution
    changes)."""
    from pyspark.sql import functions as F

    from ocr_machine_spark.sources.pages import generate_pages

    pages = generate_pages(spark, n, partitions=32)
    mega = F.pmod(F.xxhash64("url"), F.lit(100)) < MEGA_SHARE
    url2 = F.when(
        mega, F.regexp_replace("url", HOST_RE, "https://mega-host.example.com")
    ).otherwise(F.col("url"))
    return pages.withColumn("url", url2)


def _measure(variant: str, input_path: str) -> dict:
    from pyspark.sql import functions as F

    from ocr_machine_spark.operators.extraction import extract_pages
    from ocr_machine_spark.session import get_spark

    spark = get_spark(
        app=f"skew-{variant}", master=f"local[{CORES}]", shuffle_partitions=CORES * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(input_path).select("url", "html")
    extract_pages(pages.limit(2000)).groupBy().agg({"url": "count"}).collect()  # warmup
    best = None
    for _ in range(REPS):
        if variant == "keyed_unsalted":
            # naive keyed layout: every mega-host row shares one shuffle key
            ext = extract_pages(pages.repartition(CORES * 2, F.regexp_extract("url", HOST_RE, 1)))
        else:
            ext = extract_pages(pages, partitions=CORES * 2)  # repartition_salted
        st0, tt0 = _steal_total(CORES)
        t0 = time.perf_counter()
        stats = ext.groupBy().agg({"url": "count", "bytes_html": "sum"}).collect()[0]
        sec = time.perf_counter() - t0
        st1, tt1 = _steal_total(CORES)
        res = {
            "variant": variant,
            "cores": CORES,
            "pages": stats["count(url)"],
            "sec": round(sec, 2),
            "pages_per_sec": round(stats["count(url)"] / sec, 1),
            "steal_frac": round((st1 - st0) / max(tt1 - tt0, 1.0), 4),
        }
        print(f"    {variant}: {res['sec']}s steal={res['steal_frac']:.3%}", file=sys.stderr)
        if best is None or res["sec"] < best["sec"]:
            best = res
    spark.stop()
    return best


def _orchestrate() -> None:
    tmp = tempfile.mkdtemp(prefix="skew_pages_")
    try:
        input_path = os.path.join(tmp, "pages")
        from ocr_machine_spark.session import get_spark

        gen = get_spark(app="skew-gen", master="local[32]")
        gen.sparkContext.setLogLevel("ERROR")
        _skew_pages(gen, N_PAGES).write.parquet(input_path)
        gen.stop()

        results = {}
        for variant in ("keyed_unsalted", "salted"):
            cmd = [
                "taskset", "-c", f"0-{CORES - 1}",
                sys.executable, os.path.abspath(__file__),
                "--variant", variant, "--input", input_path,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO, check=True, timeout=900,
                env=dict(os.environ, SPARK_DRIVER_MEMORY="16g"),
            )
            print(out.stderr, file=sys.stderr)
            results[variant] = json.loads(out.stdout.strip().splitlines()[-1])

        speedup = round(results["keyed_unsalted"]["sec"] / results["salted"]["sec"], 2)
        summary = {
            "n_pages": N_PAGES,
            "mega_share_pct": MEGA_SHARE,
            "cores": CORES,
            "unsalted_sec": results["keyed_unsalted"]["sec"],
            "salted_sec": results["salted"]["sec"],
            "salted_speedup": speedup,
            "variants": results,
        }
        with open(os.path.join(REPO, "BENCH", "skew_bench.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary))

        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        lines = [
            "",
            "## Skew-win demonstration (round 4)",
            "",
            f"Input: {N_PAGES} pages, {MEGA_SHARE}% rewritten onto ONE host; both",
            f"variants pay one full html shuffle on local[{CORES}] (taskset-pinned);",
            "only the partitioning expression differs.",
            "",
            "| variant | sec | pages/s | steal |",
            "|---|---|---|---|",
        ]
        for v in ("keyed_unsalted", "salted"):
            r = results[v]
            lines.append(
                f"| {v} | {r['sec']} | {r['pages_per_sec']} | {r['steal_frac']:.2%} |"
            )
        lines.append("")
        lines.append(
            f"**Salted speedup: {speedup}×** — the mega-host stage bottoms out at"
            " single-task speed without the salt; with it the same rows spread"
            f" across all {CORES} cores."
        )
        with open(md, "a") as f:
            f.write("\n".join(lines) + "\n")
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--input", default=None)
    args = ap.parse_args()
    if args.variant:
        print(json.dumps(_measure(args.variant, args.input)))
    else:
        _orchestrate()


if __name__ == "__main__":
    main()
