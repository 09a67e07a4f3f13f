"""Byte-level BPE tokenizer (operators.textstats): committed merge table,
chained-replace application equivalence vs the reference min-rank encoder,
JVM-only plan, and BPE-count packing."""

from __future__ import annotations

import re

from ocr_machine_spark.operators.textstats import (
    BPE_MERGES,
    BPE_SEP,
    bpe_token_count,
    bpe_tokens,
    train_bpe_merges,
)

SF = "/root/testdata/sf0.001"
RANK = {p: i for i, p in enumerate(BPE_MERGES)}


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", (t or "").lower()).strip()


def _reference_encode_word(w: str) -> list[str]:
    """GPT-2's algorithm verbatim: repeatedly merge the min-rank pair
    present, leftmost-first within a pass, until none remains."""
    toks = list(w)
    while True:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        cand = [p for p in pairs if p in RANK]
        if not cand:
            return toks
        a, b = min(cand, key=lambda p: RANK[p])
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def _reference_delimited(tx: str) -> str:
    if not tx:
        return ""
    return " ".join(
        BPE_SEP.join(_reference_encode_word(w)) + BPE_SEP for w in tx.split(" ")
    )


def test_committed_merge_table_is_by_construction(spark):
    """The committed BPE_MERGES constant IS train_bpe_merges(sf0.001 docs,
    24) — the vocab-file provenance gate."""
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    assert train_bpe_merges(texts, 24) == BPE_MERGES


def test_chained_replace_equals_reference_encoder(spark):
    """Rank-ordered chained replace ≡ GPT-2's repeat-min-rank loop — on the
    whole fixture corpus plus adversarial self-overlap/chain cases."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r["doc_id"]: r for r in bpe_tokens(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        exp = _reference_delimited(_norm(row["text"]))
        g = got[row["doc_id"]]
        assert g["bpe_text"] == exp
        assert g["n_bpe_tokens"] == exp.count(BPE_SEP)

    extra = spark.createDataFrame(
        [
            (0, "aaaa"),
            (1, "scan scans scanner window windows sort sorted resort"),
            (2, "ararar perter colucolumn"),
            (3, ""),
            (4, None),
            (5, "text with\x01stray separator"),
        ],
        "doc_id long, text string",
    )
    for r in bpe_tokens(extra).collect():
        src = dict(extra.collect())[r["doc_id"]]
        exp = _reference_delimited(_norm((src or "").replace(BPE_SEP, "")))
        assert r["bpe_text"] == exp, r["doc_id"]


def test_bpe_is_pure_jvm(spark):
    """The tokenizer must compile to JVM string expressions — no Python
    eval nodes anywhere in the plan (the replace-chain design point)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = bpe_tokens(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapinpandas" not in plan.lower()


def test_pack_plan_over_bpe_counts(spark):
    """pack_plan(counter=bpe_token_count) bins on subword counts: for every
    doc, n_tokens equals the tokenizer's count, and the whitespace default
    differs somewhere (BPE merges change the totals)."""
    from pyspark.sql import functions as F

    from ocr_machine_spark.operators.textstats import pack_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    packed = pack_plan(docs, budget=64, counter=bpe_token_count(F.col("text")))
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_tokens(docs).collect()}
    rows = packed.collect()
    assert rows and all(r["n_tokens"] == counts[r["doc_id"]] for r in rows)
    default_rows = {r["doc_id"]: r["n_tokens"] for r in pack_plan(docs, budget=64).collect()}
    assert any(default_rows[r["doc_id"]] != r["n_tokens"] for r in rows)


def test_pack_plan_occupies_span_predicate_is_equivalent(spark):
    """r7: the cheap pushable zero-span predicate (norm_text != '') must
    select and bin exactly the rows the counter>0 filter does — including
    with injected empty/whitespace/NULL documents."""
    from pyspark.sql import functions as F

    from ocr_machine_spark.functions import norm_text
    from ocr_machine_spark.operators.textstats import pack_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    extra = spark.createDataFrame(
        [(900001, "", "s0"), (900002, "   ", "s1"), (900003, None, "s2")],
        "doc_id long, text string, source string",
    )
    docs = docs.select("doc_id", "text", "source").unionByName(extra)
    cnt = bpe_token_count(F.col("text"))
    base = pack_plan(docs, budget=64, counter=cnt).orderBy("doc_id").collect()
    fast = pack_plan(
        docs,
        budget=64,
        counter=bpe_token_count(F.col("text")),
        occupies_span=norm_text(F.coalesce(F.col("text"), F.lit(""))) != "",
    ).orderBy("doc_id").collect()
    assert base == fast
    assert all(r["doc_id"] < 900000 for r in base)  # injected blanks excluded


def test_distributed_trainer_matches_local(spark):
    """train_bpe_merges_spark ≡ the local trainer on the fixture corpus
    (untruncated vocab), and reproduces the committed table — the scale
    path and the vocab file agree."""
    from ocr_machine_spark.operators.textstats import train_bpe_merges_spark

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = train_bpe_merges_spark(docs, 24)
    assert got == BPE_MERGES
    # truncation determinism: a vocab cap that still covers every word
    # changes nothing; a tiny cap still returns a deterministic table
    assert train_bpe_merges_spark(docs, 24, max_vocab=10**6) == BPE_MERGES
    tiny = train_bpe_merges_spark(docs, 5, max_vocab=20)
    assert tiny == train_bpe_merges_spark(docs, 5, max_vocab=20)
    assert len(tiny) == 5


def test_chained_replace_random_words_property(spark):
    """Review-round regression: the UNTERMINATED pattern a␁b merged across
    token boundaries (matched a next token merely starting with b —
    689/200k random words wrong, e.g. 'acor' → [a,cor] instead of
    [a,c,or]). The terminated chain must match the reference encoder on
    random words from the merge alphabet, including the counterexamples."""
    import random

    alpha = "erinowstlucampd"
    rng = random.Random(1)
    words = ["acor", "decorm", "columerge"] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        for _ in range(4000)
    ]
    docs = spark.createDataFrame(list(enumerate(words)), "doc_id long, text string")
    got = {r["doc_id"]: r["bpe_text"] for r in bpe_tokens(docs).collect()}
    for i, w in enumerate(words):
        assert got[i] == _reference_delimited(w), w


def test_merge_table_chain_safety_validator():
    """validate_merges_for_chain: the committed table is provably
    chain-safe (no earlier token ends with a later merge's left part);
    a violating hand-built table must be rejected, because the chain
    WOULD merge inside the supersuffix token."""
    import pytest

    from ocr_machine_spark.operators.textstats import validate_merges_for_chain

    validate_merges_for_chain(BPE_MERGES)  # must not raise
    # ('x','a') creates token 'xa' ending with 'a'; a later ('a','b') merge
    # pattern a␁b␁ would match inside 'xa␁b␁'
    with pytest.raises(ValueError, match="not replace-chain-safe"):
        validate_merges_for_chain([("x", "a"), ("a", "b")])


def test_bpe_token_ids_roundtrip_and_reference(spark):
    """bpe_token_ids: ids are the reference encoder's ids under the
    256+rank vocab, and decoding them through the inverse vocab recovers
    the normalized words exactly (lossless — what a loader needs)."""
    from ocr_machine_spark.operators.textstats import bpe_token_ids, bpe_vocab

    inv = {v: k for k, v in bpe_vocab().items()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    got = {r["doc_id"]: r for r in bpe_token_ids(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        tx = _norm(row["text"])
        exp_ids = [
            bpe_vocab().get(t, ord(t) if len(t) == 1 else None)
            for w in (tx.split(" ") if tx else [])
            for t in _reference_encode_word(w)
        ]
        g = got[row["doc_id"]]
        assert list(g["ids"]) == exp_ids
        assert g["n_bpe_tokens"] == len(exp_ids)
        decoded = "".join(inv.get(i, chr(i) if i < 256 else "?") for i in g["ids"])
        assert decoded == tx.replace(" ", "")
