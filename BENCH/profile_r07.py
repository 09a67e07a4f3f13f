"""Round-7 optimization profiler (guide §1): per-query isolated timing at an
arbitrary SF plus .explain("formatted") capture into plans/r07/.

NOT the frozen bench — bench.py stays the measurement contract. This script
exists to (a) time queries with a warm JVM, (b) dump physical plans, and
(c) time hand-picked sub-stages of the expensive operators so optimization
targets the right stage.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python BENCH/profile_r07.py q1 q2 ...
  ... with no args: profiles the default hot list.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT = [
    "simhash_near_pairs",
    "jaccard_pairs_3gram",
    "doc_passage_overlap",
    "doc_winnow_fingerprints",
    "doc_quality_tiers",
    "doc_pack_plan",
    "embedding_dup_pairs",
    "minhash_lsh_pairs",
    "host_components",
    "ntile_price_bands",
    "doc_bm25_topk",
    "model_train_eval",
    "doc_span_dedup",
    "ann_lsh_topk",
    "ann_ivf_trained_topk",
    "ann_pq_topk",
    "doc_line_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    names = sys.argv[1:] or HOT
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    tag = os.environ.get("PROFILE_TAG", "before")

    from ocr_machine_spark.session import get_spark

    spark = get_spark(app="r07-profile")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup at tiny sf (codegen cache is keyed on generated source)
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").count()

    for name in names:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r07:{name}")
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            sec = time.perf_counter() - t0
            best = sec if best is None or sec < best else best
        print(f"{name}: {best:.3f}s  ({n} rows)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
