"""Spark-layer extraction tests: golden parity, determinism across
partitioning, blocks/regions, lineage-tracked resume."""

import pyspark.sql.functions as F
import pytest

from ocr_machine_spark.operators.extraction import detect_regions, extract_blocks, extract_pages
from ocr_machine_spark.plans.lineage import read_extractions, read_lineage, run_extraction
from ocr_machine_spark.sources.pages import generate_goldens, generate_pages

N = 200


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N, partitions=4).cache()


def test_extraction_matches_goldens(spark, pages):
    got = extract_pages(pages)
    want = generate_goldens(spark, N, partitions=4)
    g = got.select("url", F.col("extracted_text").alias("g_text"), F.col("spans").alias("g_spans"),
                   F.col("removed_spans").alias("g_removed"))
    w = want.select("url", F.col("extracted_text").alias("w_text"), F.col("spans").alias("w_spans"),
                    F.col("removed_spans").alias("w_removed"))
    j = g.join(w, "url")
    assert j.count() == N
    mism = j.filter(
        (F.col("g_text") != F.col("w_text"))
        | (F.to_json("g_spans") != F.to_json("w_spans"))
        | (F.to_json("g_removed") != F.to_json("w_removed"))
    ).count()
    assert mism == 0


def test_extraction_deterministic_across_partitioning(spark, pages):
    a = extract_pages(pages, partitions=2).select("url", "extracted_text")
    b = extract_pages(pages, partitions=7).select(
        "url", F.col("extracted_text").alias("text_b")
    )
    diff = a.join(b, "url").filter(F.col("extracted_text") != F.col("text_b")).count()
    assert diff == 0


def test_extraction_keeps_failed_rows(spark):
    rows = [("u://bad", None), ("u://empty", b"")]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_pages(df).collect()
    assert len(out) == 2
    assert all(not r["ok"] and r["error"] for r in out)


def test_extraction_total_on_degraded_pages(spark, pages):
    """G2 degrader contract: mid-markup truncation (unclosed tags, split
    entities, half UTF-8 sequences) never breaks totality — one output row
    per input, never an exception, and re-runs stay byte-identical."""
    from ocr_machine_spark.sources.pages import degrade_pages

    deg = degrade_pages(pages)
    out = extract_pages(deg, partitions=3).cache()
    assert out.count() == pages.count()
    # truncated pages still mostly parse; failures (if any) carry errors
    bad = out.filter(~F.col("ok"))
    assert bad.filter(F.col("error").isNull()).count() == 0
    # determinism under a different partitioning
    again = extract_pages(degrade_pages(pages), partitions=5).select(
        "url", F.col("extracted_text").alias("t2")
    )
    diff = out.join(again, "url").filter(
        F.coalesce(F.col("extracted_text"), F.lit("∅")) != F.coalesce(F.col("t2"), F.lit("∅"))
    ).count()
    assert diff == 0
    out.unpersist()


def test_extraction_handles_multi_megabyte_pages(spark):
    """Large-payload smoke: multi-MB pages flow through the Arrow stage
    (batches are row-capped, so oversized payloads are the memory risk at
    scale — jobs.py documents the byte-aware sizing rule)."""
    big_para = "<p>" + "word " * 200_000 + "</p>"  # ~1 MB of visible text
    rows = [(f"u://big/{i}", ("<html><body>" + big_para * 3 + "</body></html>").encode()) for i in range(4)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_pages(df).select("url", "ok", "chars_out").collect()
    assert len(out) == 4 and all(r["ok"] for r in out)
    assert all(r["chars_out"] > 2_000_000 for r in out)


def test_blocks_and_regions(spark, pages):
    blocks = extract_blocks(pages).cache()
    assert blocks.filter(F.col("block_id").isNull()).count() == 0
    # block ids unique and deterministic
    assert blocks.select("block_id").distinct().count() == blocks.count()
    regions = detect_regions(blocks)
    tbl_pages = regions.filter(F.col("region_type") == "table").select("url")
    got = extract_pages(pages).filter(F.col("has_table")).select("url")
    assert tbl_pages.exceptAll(got).count() == 0
    assert got.exceptAll(tbl_pages).count() == 0


def test_lineage_resume_exactly_once(spark, pages, tmp_path):
    out = str(tmp_path / "run")
    # simulate a crash: first run commits only 5 of 16 buckets
    s1 = run_extraction(spark, pages, out, run_id="r1", n_buckets=16, max_buckets_this_run=5)
    assert s1["buckets_committed"] == 5
    mid = read_extractions(spark, out)
    assert 0 < mid.count() < N
    # resume: processes only the remaining buckets
    s2 = run_extraction(spark, pages, out, run_id="r2", n_buckets=16)
    assert s2["buckets_committed"] == 16 - 5
    done = read_extractions(spark, out)
    assert done.count() == N
    assert done.select("url").distinct().count() == N  # no dupes
    # idempotent: a third run commits nothing
    s3 = run_extraction(spark, pages, out, run_id="r3", n_buckets=16)
    assert s3["buckets_committed"] == 0
    assert read_extractions(spark, out).count() == N
    lin = read_lineage(spark, out)
    assert lin.count() == 16
    assert lin.agg(F.sum("rows_in")).collect()[0][0] == N


def test_lineage_sparse_input_commits_empty_buckets(spark, tmp_path):
    """Review fix: selected-but-empty buckets must still commit (rows 0) or a
    sparse input livelocks — max_buckets_this_run would re-select the same
    empty buckets forever."""
    from ocr_machine_spark.sources.pages import generate_pages

    out = str(tmp_path / "sparse")
    few = generate_pages(spark, 6, partitions=2)  # 6 urls over 64 buckets
    s1 = run_extraction(spark, few, out, run_id="r1", n_buckets=64, max_buckets_this_run=10)
    assert s1["buckets_committed"] == 10  # progress regardless of bucket content
    s2 = run_extraction(spark, few, out, run_id="r2", n_buckets=64)
    assert s2["buckets_committed"] == 54
    lin = read_lineage(spark, out)
    assert lin.count() == 64
    assert lin.agg(F.sum("rows_out")).collect()[0][0] == 6
    # third run: nothing left
    s3 = run_extraction(spark, few, out, run_id="r3", n_buckets=64)
    assert s3["buckets_committed"] == 0


def test_lineage_refuses_bucket_count_mismatch(spark, pages, tmp_path):
    """Review fix: bucket ids only compose within one bucket space — resuming
    with a different --buckets must fail loudly, not mix spaces silently."""
    import pytest

    out = str(tmp_path / "guard")
    run_extraction(spark, pages, out, run_id="r1", n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        run_extraction(spark, pages, out, run_id="r2", n_buckets=256)


def test_lineage_empty_input_run(spark, tmp_path):
    """Review fix: a fresh run over empty input must return zero stats, not
    fail parquet schema inference on a data dir holding only _SUCCESS."""
    from ocr_machine_spark.sources.pages import generate_pages

    out = str(tmp_path / "empty")
    none = generate_pages(spark, 3, partitions=1).filter("url IS NULL")  # empty frame
    s = run_extraction(spark, none, out, run_id="r1", n_buckets=8)
    assert s["buckets_committed"] == 8 and s["rows"] == 0 and s["pages_ok"] == 0


def test_repartition_salted_spreads_duplicate_keys(spark):
    """Review fix: the salt must vary WITHIN a key — a key-derived salt is a
    no-op (it induces the key's own partition classes), so 1000 rows sharing
    one url would all land on a single task."""
    from ocr_machine_spark.operators.extraction import repartition_salted

    hot = spark.range(1000).select(
        F.lit("https://hot.example/dup").alias("url"), F.col("id")
    )
    parts = (
        repartition_salted(hot, 8)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1, "hot key must spread across partitions"


def test_curation_job_dedup_and_reasons(spark, tmp_path):
    """The curate job (round 5): quality gate + exact-dedup survivor in one
    plan. Injected duplicates of kept documents must collapse to the
    minimum doc_id; stats must reconcile with the written tables; a re-run
    is byte-idempotent (pure function + overwrite)."""
    import pyspark.sql.functions as F

    from ocr_machine_spark.plans.curate import run_curation

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    dups = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    out = str(tmp_path / "curated")
    s1 = run_curation(spark, docs.unionAll(dups), out, run_id="c1")
    assert s1["docs_in"] == docs.count() + dups.count()
    # every surviving duplicate pair collapsed: curated < quality-kept
    assert s1["docs_curated"] < s1["docs_quality_kept"]
    curated = spark.read.parquet(f"{out}/curated")
    dec = spark.read.parquet(f"{out}/decisions")
    assert curated.count() == s1["docs_curated"]
    # survivors are the min doc_id of their fingerprint — no +100000 copy
    # may survive when its original was kept
    shadow = curated.filter(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("orig")
    )
    originals_kept = dec.filter(F.col("keep") & (F.col("doc_id") < 100000)).select(
        F.col("doc_id").alias("orig")
    )
    assert shadow.join(originals_kept, "orig").count() == 0
    # reasons histogram reconciles with per-doc decisions
    assert sum(s1["drop_reasons"].values()) >= s1["docs_in"] - s1["docs_quality_kept"]
    s2 = run_curation(spark, docs.unionAll(dups), out, run_id="c2")
    assert {k: v for k, v in s2.items() if k != "run_id"} == {
        k: v for k, v in s1.items() if k != "run_id"
    }


def test_curation_job_line_dedup_stage(spark, tmp_path):
    """--dedup-lines (round 5 late): cross-corpus line dedup runs BEFORE the
    quality ladder (CCNet order). A boilerplate footer pasted onto every
    document must survive only in the first doc's curated text; the written
    curated table carries the CLEANED text; stats reconcile and a re-run is
    idempotent."""
    import pyspark.sql.functions as F

    from ocr_machine_spark.plans.curate import run_curation

    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    footer = "subscribe to our newsletter for updates"
    docs = base.select(
        "doc_id", F.concat_ws("\n", "text", F.lit(footer)).alias("text")
    )
    out = str(tmp_path / "curated_ld")
    s1 = run_curation(spark, docs, out, run_id="l1", dedup_lines=True)
    n = docs.count()
    assert s1["lines_in"] == 2 * n  # text line + footer line, none blank
    assert s1["lines_kept"] == n + 1  # footer survives exactly once
    curated = spark.read.parquet(f"{out}/curated")
    with_footer = curated.filter(F.col("text").contains(footer))
    assert with_footer.count() <= 1  # only the corpus-first doc may keep it
    # cleaned text is what was judged AND what was written
    assert curated.filter(F.col("text").endswith(footer)).count() <= 1
    s2 = run_curation(spark, docs, out, run_id="l2", dedup_lines=True)
    assert {k: v for k, v in s2.items() if k != "run_id"} == {
        k: v for k, v in s1.items() if k != "run_id"
    }


def test_curation_decontaminates(spark, tmp_path):
    """--decontaminate path of the curate plan: docs sharing a word 8-gram
    with the benchmark are dropped REGARDLESS of quality, audit rows carry
    'contaminated' appended to any quality reasons, and clean docs are
    untouched."""
    from ocr_machine_spark.plans.curate import run_curation

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    # 30 distinct 8-char words: inside the corpus-adapted Gopher bounds
    # (20-80 words, mean word len 3-10, no repetition)
    filler = " ".join(f"term{i:02d}xy"[0:8] for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, f"{filler} {leak}", "a"),   # good quality + leaked
            (2, f"{filler} more fine words", "a"),  # good quality, clean
            (3, f"tiny {leak}", "a"),       # bad quality AND leaked
        ],
        "doc_id long, text string, source string",
    )
    bench = spark.createDataFrame([(leak,)], "text string")
    out = str(tmp_path / "c")
    stats = run_curation(spark, docs, out, run_id="t", bench=bench)
    assert stats["docs_contaminated"] == 2
    dec = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/decisions").collect()}
    assert dec[1]["contaminated"] and not dec[1]["keep"]
    assert dec[1]["reasons"] == "contaminated"  # quality-clean, only reason
    assert dec[2]["keep"] and not dec[2]["contaminated"]
    assert dec[3]["contaminated"] and not dec[3]["keep"]
    assert dec[3]["reasons"].endswith(",contaminated")  # appended after quality
    curated = {r["doc_id"] for r in spark.read.parquet(f"{out}/curated").collect()}
    assert curated == {2}


def test_curation_dedups_spans(spark, tmp_path):
    """--dedup-spans path: a duplicated >=8-word run appended to every doc
    survives only at its first corpus site; the curated text keeps the
    ORIGINAL casing (match is case-insensitive); stats reconcile and a
    re-run is idempotent."""
    import pyspark.sql.functions as F

    from ocr_machine_spark.plans.curate import run_curation

    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text"
    )
    run = "Please Subscribe To Our Weekly Newsletter For More Updates"  # 9 words
    docs = base.select(
        "doc_id", F.concat_ws(" ", "text", F.lit(run)).alias("text")
    )
    out = str(tmp_path / "curated_sd")
    s1 = run_curation(spark, docs, out, run_id="s1", dedup_spans=True)
    assert s1["span_words_kept"] < s1["span_words_in"]
    curated = spark.read.parquet(f"{out}/curated")
    keepers = curated.filter(F.col("text").contains(run))
    assert keepers.count() <= 1  # case preserved at the surviving site
    assert curated.filter(F.lower("text").contains(run.lower())).count() <= 1
    s2 = run_curation(spark, docs, out, run_id="s2", dedup_spans=True)
    assert {k: v for k, v in s2.items() if k != "run_id"} == {
        k: v for k, v in s1.items() if k != "run_id"
    }


def test_span_dedup_preserve_case(spark):
    """preserve_case: witness identity is case-insensitive (UPPER copy of a
    run is excised against a lower first site) while surviving text keeps
    its original casing."""
    from ocr_machine_spark.operators.textstats import span_dedup

    run = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(0, f"Keep Me {run} Tail"), (1, f"x {run.upper()} y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_dedup"] for r in
           span_dedup(docs, min_len=8, preserve_case=True).collect()}
    assert got[0] == f"Keep Me {run} Tail"
    assert got[1] == "x y"


def test_curation_dedup_near(spark, tmp_path):
    """--dedup-near: MinHash-LSH + star clusters prune near-duplicate
    variants exact hashing cannot see; exact dupes still collapse first;
    the audit carries near_rep; stats reconcile and re-runs are
    idempotent."""
    from ocr_machine_spark.plans.curate import run_curation

    filler = " ".join(f"w{i:03d}token"[:8] for i in range(40))
    other = " ".join(f"z{i:03d}vocab"[:8] for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, f"{filler} endingone", "a"),
            (2, f"{filler} endingtwo", "a"),   # near-dup of 1 (1 word differs)
            (3, f"{other} standalone", "a"),   # own cluster
            (4, f"{filler} endingone", "a"),   # exact dup of 1
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "near")
    s1 = run_curation(spark, docs, out, run_id="n1", dedup_near=True)
    assert s1["docs_quality_kept"] == 4
    assert s1["docs_curated"] == 2  # doc 1 (cluster min) + doc 3
    assert s1["docs_near_dropped"] == 1  # doc 2 (doc 4 fell to the exact stage)
    import pyspark.sql.functions as F

    dec = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/decisions").collect()}
    assert dec[1]["survivor"] and dec[1]["near_rep"] == 1
    assert not dec[2]["survivor"] and dec[2]["near_rep"] == 1
    assert dec[3]["survivor"] and dec[3]["near_rep"] == 3
    assert not dec[4]["survivor"] and dec[4]["near_rep"] is None  # exact-pruned pre-near
    curated = {r["doc_id"] for r in spark.read.parquet(f"{out}/curated").collect()}
    assert curated == {1, 3}
    s2 = run_curation(spark, docs, out, run_id="n2", dedup_near=True)
    assert {k: v for k, v in s2.items() if k != "run_id"} == {
        k: v for k, v in s1.items() if k != "run_id"
    }
