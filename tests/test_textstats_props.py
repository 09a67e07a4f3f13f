"""Property pins for the round-3 text operators — each test asserts the
exact guarantee its operator's docstring claims, so the claims are CI-backed
rather than prose."""

import pyspark.sql.functions as F

from ocr_machine_spark.operators.textstats import (
    _ROLL_MOD,
    rolling_fingerprint,
    stratified_sample,
    winnow_fingerprints,
)


def test_winnowing_guarantee_shared_run(spark):
    """Docs sharing a run of ≥ w+k-1 words MUST share a fingerprint
    (Schleimer's detection guarantee; here k=3, w=4 → runs of 6 words)."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 words
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"nine eight seven {shared} six"),
            (3, "completely different words in this document entirely"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 6-word run must yield a common fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_winnowing_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, None), (4, "exactly three words")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc  # < k words
    assert len(by_doc[4]) == 1  # one shingle, one window


def _winnow_py(text, k=3, w=4):
    """Independent Python reference: same spec, different implementation."""
    import hashlib
    import re

    words = re.sub(r"[ \t\n\x0b\f\r]+", " ", (text or "").lower()).strip().split(" ")
    if words == [""]:
        words = [""]  # norm of empty stays one empty token (matches split behavior)
    if len(words) < k:
        return set()
    hs = [
        int(hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(words) - k + 1)
    ]
    n_win = max(len(hs) - (w - 1), 1)
    return {min(hs[i : i + w]) for i in range(n_win)}


def test_winnowing_matches_python_reference_randomized(spark):
    """120 random word documents (varying lengths incl. < k and < w+k-1) —
    Spark's array-expression winnowing equals the independent Python
    implementation doc-for-doc."""
    import random

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(120)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(sdf, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _winnow_py(text), (doc_id, text)


def test_rolling_fingerprint_is_prefix_incremental(spark):
    """The docstring's incremental claim: hash(doc) == Horner continuation of
    hash(prefix) with the suffix words — checkable without re-reading the
    prefix."""
    prefix = "the quick brown fox"
    suffix = ["jumps", "over"]
    docs = spark.createDataFrame(
        [(1, prefix), (2, prefix + " " + " ".join(suffix))],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["roll_fp"] for r in rolling_fingerprint(docs).collect()}
    # continue driver-side with the same word hash (md5 15-hex prefix)
    import hashlib

    acc = out[1]
    for w in suffix:
        wh = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        acc = (acc * 31 + wh) % _ROLL_MOD
    assert acc == out[2]


def test_stratified_sample_monotone_and_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo = {"en": 0.2, "de": 0.1, "fr": 0.1, "es": 0.1, "zh": 0.1}
    hi = {k: v * 2 for k, v in lo.items()}
    s_lo = {r["doc_id"] for r in stratified_sample(docs, lo).select("doc_id").collect()}
    s_hi = {r["doc_id"] for r in stratified_sample(docs, hi).select("doc_id").collect()}
    assert s_lo <= s_hi, "raising rates must only ADD documents"
    assert len(s_lo) < len(s_hi) < docs.count()
    # partitioning-independent
    s_lo2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), lo).select("doc_id").collect()
    }
    assert s_lo == s_lo2
    # strata not in the rate map fall to default_rate=0
    assert (
        stratified_sample(docs, {"en": 0.5}).filter(F.col("lang") != "en").count() == 0
    )


def test_empty_doc_token_stats_zero_not_phantom(spark):
    """Review fix: split('') yields [''] — empty/whitespace docs must report
    n_tokens=0 with NULL ratios, not a phantom token."""
    from ocr_machine_spark.operators.textstats import lang_guess, quality_score, token_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "three real words")], "doc_id long, text string"
    )
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[1]["n_tokens"] == 0 and ts[2]["n_tokens"] == 0 and ts[3]["n_tokens"] == 3
    assert ts[1]["avg_token_len_e4"] is None and ts[3]["avg_token_len_e4"] is not None
    qs = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert qs[1]["n_tokens"] == 0 and qs[1]["stop_ratio_e4"] is None
    lg = {r["doc_id"]: r for r in lang_guess(docs).collect()}
    assert lg[1]["lang_score_e4"] == 0  # all-tie zero scores, deterministic winner
    assert lg[1]["pred_lang"] == lg[2]["pred_lang"]


def test_inference_bad_rows_score_null(spark):
    """Review fix: a null or wrong-length embedding yields NULL outputs
    (never a task crash, never pred=true via Spark's NaN>0 ordering)."""
    from ocr_machine_spark.operators.inference import predict_linear

    rows = [(1, [0.5] * 4), (2, None), (3, [1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in predict_linear(emb, dim=4).collect()}
    assert out[1]["logit_e4"] is not None and out[1]["pred"] is not None
    assert out[2]["logit_e4"] is None and out[2]["pred"] is None
    assert out[3]["logit_e4"] is None and out[3]["pred"] is None


def test_repetition_stats_empty_doc_zero_words(spark):
    """Phantom-token convention: split('') is [''] — an empty/whitespace doc
    must report n_words=0, not 1 (review fix r4)."""
    from ocr_machine_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "a a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_words"] == 0 and out[1]["dup_word_frac_e4"] == 0
    assert out[2]["n_words"] == 0
    assert out[4]["n_words"] == 3 and out[4]["dup_word_frac_e4"] == 3333


def test_repetition_stats_gopher_rules_hand_computed(spark):
    """Complete Gopher §A1.1 rule set (round 5): every new column checked
    against hand-computed values on a document with known structure —
    duplicate lines, duplicate 5-grams with OVERLAPPING coverage (the
    char fraction must merge overlap, counting each covered word once)."""
    from ocr_machine_spark.operators.textstats import repetition_stats

    text = "one two three four five six\none two three four five six\nunique line here"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_stats(docs).collect()[0]
    assert r["n_words"] == 15  # 6 + 6 + 3 (norm collapses newlines)
    assert r["dup_word_frac_e4"] == 4000  # 1 - 9/15
    assert r["n_lines"] == 3
    assert r["dup_line_frac_e4"] == 3333  # (3 - 2) / 3
    assert r["top_bigram_n"] == 2
    assert r["top_bigram_share_e4"] == 1429  # 2/14
    assert r["top_3gram_share_e4"] == 1538  # 2/13
    assert r["top_4gram_share_e4"] == 1667  # 2/12
    # dup 5-grams: ("one..five", pos 1&7) and ("two..six", pos 2&8) —
    # covered word positions 1-6 ∪ 7-12, chars 44 of 58
    assert r["dup_5gram_char_frac_e4"] == 7586


def test_repetition_stats_no_false_positives(spark):
    """A doc with no repeated structure must report zero dup fractions and
    top-share = 1/total (every n-gram unique)."""
    from ocr_machine_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta")], "doc_id long, text string"
    )
    r = repetition_stats(docs).collect()[0]
    assert r["dup_word_frac_e4"] == 0
    assert r["dup_line_frac_e4"] == 0 and r["n_lines"] == 1
    assert r["dup_5gram_char_frac_e4"] == 0
    assert r["top_bigram_n"] == 1
    assert r["top_bigram_share_e4"] == 1667  # 1/6


def test_gopher_filter_rules_and_reasons(spark):
    """The curation decision: reasons list failed rules in fixed order,
    keep ⟺ no reasons; thresholds compare e4 integers (no float edges)."""
    from ocr_machine_spark.operators.textstats import gopher_filter

    good = "alpha beta gamma delta " * 10  # 40 words, all-distinct pairs
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "tiny doc"),  # too_few_words
            (3, "word " * 120),  # too_many_words + heavy repetition
            (4, "aa " * 40),  # dup_words + top_bigram + dup_5grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    # doc 1: repeated 4-word block → dup rules fire, but length rules pass
    assert "too_few_words" not in out[1]["reasons"]
    assert "too_many_words" not in out[1]["reasons"]
    # 2 words, 1 bigram: length rule AND the degenerate 1/1 top-bigram share
    assert out[2]["reasons"] == "too_few_words,top_bigram"
    assert not out[2]["keep"]
    assert out[3]["reasons"].startswith("too_many_words")
    r4 = out[4]["reasons"].split(",")
    assert r4[0] == "mean_word_len" or r4[0] == "dup_words"  # 'aa'=2 chars < 3
    assert "dup_words" in r4 and "dup_5grams" in r4
    # fixed rule order: reasons must be sorted by ladder position
    order = ["too_few_words", "too_many_words", "mean_word_len", "dup_words",
             "dup_lines", "top_bigram", "dup_5grams"]
    for r in out.values():
        got = [x for x in r["reasons"].split(",") if x]
        assert got == [o for o in order if o in got]
        assert r["keep"] == (r["reasons"] == "")


def test_benchmark_contamination_distinct_hits(spark):
    """Decontamination: n_hits counts a doc's DISTINCT shingles present in
    the benchmark (repetition of one leaked prompt doesn't inflate), clean
    docs report 0/false, and sub-k benchmark prompts contribute nothing."""
    from ocr_machine_spark.operators.textstats import benchmark_contamination

    leak = "one two three four five six seven eight"  # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            (1, f"intro {leak} outro"),
            (2, f"{leak} mid {leak}"),  # prompt twice → still 1 distinct hit
            (3, "totally unrelated text with many plain words here"),
            (4, f"x {leak} y nine extra"),  # contains leak + extension grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(leak,), ("short prompt",)], "text string")
    out = {r["doc_id"]: r for r in benchmark_contamination(docs, bench, k=8).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 1  # distinct shingles, not occurrences
    assert out[3]["n_hits"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_hits"] == 1


def test_rarity_stats_hand_computed(spark):
    """Corpus-relative rarity: mean corpus term frequency and rare-word
    fraction against a corpus with known word frequencies."""
    from ocr_machine_spark.operators.textstats import rarity_stats

    docs = spark.createDataFrame(
        [
            (1, "common common unique1"),  # common: cf=5, unique1: cf=1
            (2, "common common common rare rare"),  # rare: cf=2
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in rarity_stats(docs, rare_threshold=2).collect()}
    # doc1: cfs = [5, 5, 1] → mean 11/3 = 3.6667 → 36667; rare frac 1/3
    assert out[1]["n_words"] == 3
    assert out[1]["mean_corpus_tf_e4"] == 36667
    assert out[1]["rare_word_frac_e4"] == 3333
    # doc2: cfs = [5,5,5,2,2] → mean 19/5 = 3.8 → 38000; rare frac 2/5
    assert out[2]["mean_corpus_tf_e4"] == 38000
    assert out[2]["rare_word_frac_e4"] == 4000
    assert out[3]["n_words"] == 0 and out[3]["mean_corpus_tf_e4"] == 0


def test_passage_overlap_pairs_guarantee_and_df_cap(spark):
    """Passage-overlap pairs inherit the winnowing guarantee: two docs
    sharing a run of >= w+k-1 words share a fingerprint, and with
    min_shared=1 the pair must surface. The max_df cap must drop a
    boilerplate passage shared by every doc (fp document-frequency > cap)
    while keeping the rare shared passage."""
    from ocr_machine_spark.operators.textstats import passage_overlap_pairs

    boiler = "standard footer text appears on every page here"  # 8 words
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 words
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} {boiler}"),
            (2, f"nine eight seven {shared} {boiler}"),
            (3, f"totally unrelated content in this document {boiler}"),
            (4, f"more unrelated filler words go here now {boiler}"),
        ],
        "doc_id long, text string",
    )
    # No cap: boilerplate links everyone to everyone (6 pairs).
    pairs = {
        (r["a"], r["b"])
        for r in passage_overlap_pairs(docs, k=3, w=4, min_shared=1).collect()
    }
    assert (1, 2) in pairs and len(pairs) == 6
    # Cap at df<=2: boilerplate fps (df=4) drop; only the rare passage pairs.
    capped = {
        (r["a"], r["b"])
        for r in passage_overlap_pairs(
            docs, k=3, w=4, min_shared=1, max_df=2
        ).collect()
    }
    assert capped == {(1, 2)}


def test_source_quota_sample_cap_monotone_and_partition_invariant(spark):
    """The quota sample must (a) never keep more than cap per stratum,
    (b) be monotone in cap (raising the quota only ADDS docs — superset
    stability for incremental rebuilds), and (c) be a pure function of
    (stratum, key, cap) — identical under any input partitioning."""
    from ocr_machine_spark.operators.textstats import source_quota_sample

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def kept(df, cap):
        return {r["doc_id"] for r in source_quota_sample(df, cap).collect()}

    k5, k9 = kept(docs, 5), kept(docs, 9)
    assert len(k5) == 15 and len(k9) == 27  # 3 strata, cap binds (20 each)
    assert k5 < k9  # monotone: cap=5 selection is a strict subset
    assert kept(docs.repartition(13, "text"), 5) == k5  # layout-invariant


def test_line_dedup_keeper_and_reassembly(spark):
    """Cross-corpus line dedup: first occurrence (min doc_id, pos) wins,
    later copies drop (within AND across docs), blank lines vanish, and
    the surviving text reassembles in original line order."""
    from ocr_machine_spark.operators.textstats import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nalpha\nbeta"),  # alpha repeats in-doc
            (2, "gamma\n\nShared Footer\ndelta"),  # blank + case-insens copy
            (3, "shared footer"),  # only line is a later copy -> n_kept 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 3
    assert out[1]["text_dedup"] == "alpha\nshared footer\nbeta"
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2  # blank dropped
    assert out[2]["text_dedup"] == "gamma\ndelta"
    assert out[3]["n_kept"] == 0 and out[3]["text_dedup"] == ""


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom tier contract: ZERO false negatives vs the exact tier at any
    m_bits (every contaminated doc is bloom-flagged with at least as many
    hits), and at a deliberately tiny m_bits the fixture corpus exhibits
    REAL false positives — the filter is a Bloom filter, not a replay of
    the exact string join."""
    from ocr_machine_spark.operators.textstats import (
        benchmark_contamination,
        bloom_decontaminate,
    )

    leak = "one two three four five six seven eight"
    rows = [(1, f"intro {leak} outro"), (2, "clean text " * 20)] + [
        (i, f"filler doc {i} " + " ".join(f"w{i}x{j}" for j in range(40)))
        for i in range(3, 120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(leak,)], "text string")

    exact = {r["doc_id"]: r for r in benchmark_contamination(docs, bench, k=8).collect()}

    # tiny filter → false positives expected; no false negatives ever
    tiny = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench, k=8, m_bits=64, n_hashes=2).collect()
    }
    assert set(tiny) == set(exact)
    for did, r in tiny.items():
        assert r["n_bloom_hits"] >= exact[did]["n_hits"]
        if exact[did]["contaminated"]:
            assert r["bloom_flagged"]
    n_fp = sum(
        1 for did, r in tiny.items() if r["bloom_flagged"] and not exact[did]["contaminated"]
    )
    assert n_fp > 0  # 64 bits, ~4.6k probe shingles: FPs are certain

    # production-sized filter → exact agreement on this corpus
    big = {
        r["doc_id"]: r
        for r in bloom_decontaminate(docs, bench, k=8, m_bits=1 << 20).collect()
    }
    for did, r in big.items():
        assert r["n_bloom_hits"] == exact[did]["n_hits"]
        assert r["bloom_flagged"] == exact[did]["contaminated"]


def test_bm25_topk_hand_computed(spark):
    """BM25 against an independent pure-Python computation on a tiny corpus
    (idf surrogate, tf saturation, length penalty, e4 flooring, tiebreak)."""
    import math

    from ocr_machine_spark.operators.search import bm25_topk

    rows = [
        (1, "apple banana apple cherry"),
        (2, "apple apple apple apple apple apple"),
        (3, "banana cherry date elderberry fig grape"),
        (4, "unrelated words only here today friend"),
        (5, "apple banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, ["apple", "banana"], k=5).collect()

    toks = {d: t.split(" ") for d, t in rows}
    n, sum_dl = len(rows), sum(len(v) for v in toks.values())
    avgdl = sum_dl / n
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in ("apple", "banana")
    }
    exp = {}
    for d, v in toks.items():
        s, hit = 0, 0
        for t in ("apple", "banana"):
            tf = v.count(t)
            if not tf:
                continue
            hit += 1
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            w = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(v) / avgdl)))
            s += math.floor(10000.0 * idf * w)
        if hit:
            exp[d] = (s, hit)
    expected = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [(r["doc_id"], (r["score_e4"], r["n_terms_hit"])) for r in out] == expected
    # doc 2 (pure tf) saturates: more apples ≠ linear score growth
    assert exp[2][0] < 2 * exp[1][0]


def test_span_dedup_hand_computed(spark):
    """Exact substring dedup (Lee et al. 2022, word-granular): cross-doc
    first-occurrence keeper, overlap-merged excision, within-doc repeats,
    short-doc passthrough, empty-doc absence — all hand-checkable."""
    from ocr_machine_spark.operators.textstats import span_dedup

    run = "a b c d e f g h"  # exactly min_len=8 words
    rows = [
        (0, f"{run} tail0"),                    # first corpus occurrence: kept
        (1, f"x {run} tail1"),                  # later occurrence: excised
        (2, f"{run} i"),                        # later occurrence at pos 0
        (3, "p q r s t u v w p q r s t u v w"),  # within-doc repeat
        (4, "hello world"),                     # < min_len words: untouched
        (5, ""),                                # empty: no output row
        (6, None),                              # null: no output row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(docs, min_len=8).collect()}

    assert sorted(got) == [0, 1, 2, 3, 4]
    assert got[0]["text_dedup"] == f"{run} tail0" and got[0]["n_kept"] == 9
    assert got[1]["text_dedup"] == "x tail1" and got[1]["n_kept"] == 2
    assert got[2]["text_dedup"] == "i" and got[2]["n_words"] == 9
    assert got[3]["text_dedup"] == "p q r s t u v w" and got[3]["n_words"] == 16
    assert got[4]["text_dedup"] == "hello world" and got[4]["n_kept"] == 2


def test_span_dedup_long_run_fully_excised(spark):
    """The paper's coverage guarantee: a duplicated run LONGER than min_len
    is covered by its sliding grams, so the whole run is excised at the
    non-first site — not just one gram's worth."""
    from ocr_machine_spark.operators.textstats import span_dedup

    run = " ".join(chr(ord("a") + i) for i in range(12))  # 12-word run
    docs = spark.createDataFrame(
        [(0, f"{run} end0"), (1, f"pre {run} end1")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_dedup"] for r in span_dedup(docs, min_len=8).collect()}
    assert got[0] == f"{run} end0"
    assert got[1] == "pre end1"
