"""Extra (non-frozen) benchmark surfaces — cited in OPTIMIZATION_r07.md.

`bench.py` is the frozen measurement contract; surfaces that would change
its query list live here instead (the VERDICT r6 #8 shape). Currently one
surface: the FULL production curation ladder (`--job curate` with every
dedup tier on), timed end-to-end including its sink writes — the
deliverable pipeline, not just its stages.

Usage: SPARK_GRAFT_SF_DIR=... python BENCH/bench_extra.py
Writes BENCH/bench_extra_r7.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ocr_machine_spark.plans.curate import run_curation
    from ocr_machine_spark.session import get_spark

    spark = get_spark(app="bench-extra-curate")
    spark.sparkContext.setLogLevel("ERROR")
    # the fixture table is one parquet row group (a fixture artifact — see
    # OPTIMIZATION_r07.md finding 1); restore the scan parallelism a real
    # many-file lake input has natively, the same knob jobs.py exposes as
    # --partitions
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    out = {"metric": "curate_full", "unit": "sec", "sf": sf}
    tmp = tempfile.mkdtemp(prefix="bench_curate_")
    try:
        reps = []
        for rep in range(2):
            dst = os.path.join(tmp, f"run{rep}")
            spark.sparkContext.setJobDescription(f"curate_full rep{rep}")
            t0 = time.perf_counter()
            stats = run_curation(
                spark, docs, dst, run_id=f"bench-{rep}",
                dedup_lines=True, dedup_spans=True, dedup_near=True,
            )
            reps.append(round(time.perf_counter() - t0, 3))
        out["value"] = min(reps)
        out["reps"] = reps
        out["stats"] = {k: v for k, v in stats.items() if isinstance(v, (int, float, str))}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    with open(os.path.join(REPO, "BENCH", "bench_extra_r7.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
