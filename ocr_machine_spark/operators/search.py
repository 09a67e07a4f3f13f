"""Corpus keyword search — the inverted-index query tier.

A webtext engine's read side: rank documents against a keyword query with
BM25 (Robertson & Spärck Jones probabilistic relevance framework, the
Okapi formulation) expressed as pure relational algebra — the classic
inverted-index plan (postings → term stats → per-posting score → top-k)
with Catalyst choosing the physical strategy.

Scale shape (the part that matters at 100 TB): the corpus is filtered to
QUERY-TERM postings *before* any aggregation — the only rows that ever
shuffle are (doc, term) hits for the handful of query terms, never the
full token stream. Document frequencies collapse to ≤|terms| rows and
broadcast back; the doc-length side is semi-joined down to hit docs before
it ever joins (no full-corpus (doc_id, dl) shuffle); corpus-level stats
(N, Σdl) are a one-row aggregate cross-joined in-plan
(BroadcastNestedLoopJoin over a single row, not a driver collect). The
final top-k is a global TakeOrderedAndProject — no single-partition sort.

Cross-engine determinism (the oracle gate): BM25 needs real division, so
this operator confines ALL floating point to per-(doc,term) scalar
expressions built from parse-identical decimal literals (1.2, 0.75, 2.2,
0.25 — both engines round-to-nearest the same strings) and identical
parenthesization, then floors each term's contribution to an e4 BIGINT
*before* the per-doc sum — the one step whose evaluation order Spark
cannot pin. The standard log-idf is replaced by its monotone rational
core (N − df + 0.5)/(df + 0.5): `ln` is the only transcendental in BM25
and libm-vs-JVM last-ulp drift would flip e4 rounding (round-3 lesson),
while the surrogate preserves the idf ordering exactly.

Reference twin: the reference ranks page regions by keyword density in
its triage pass (SURVEY.md §2 C-tier); this is the corpus-scale general
form of that capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_machine_spark.functions import norm_text, token_count

# Okapi defaults as DECIMAL STRINGS: both engines parse these
# round-to-nearest to the same doubles; never derive them by float
# arithmetic (1.2 + 1.0 can differ from parse("2.2") in the last ulp).
BM25_K1 = "1.2"
BM25_K1_PLUS_1 = "2.2"
BM25_B = "0.75"
BM25_ONE_MINUS_B = "0.25"


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    text: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a keyword query.

    → (doc_id, score_e4, n_terms_hit), score descending with doc_id
    tiebreak (total order — deterministic under any partitioning). Only
    documents matching ≥1 query term appear; ``score_e4`` is the sum of
    floored per-term e4 contributions (exact BIGINT aggregation).
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    base = docs.select(
        "doc_id", norm_text(F.coalesce(F.col(text), F.lit(""))).alias("tx")
    )
    lengths = base.select("doc_id", token_count("tx").alias("dl"))
    # one-row corpus stats, joined in-plan (single-row broadcast, no collect)
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # postings restricted to the query terms BEFORE any shuffle
    hits = (
        base.select("doc_id", F.explode(F.split("tx", " ")).alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))

    # restrict the doc-length side to HIT docs before the equi-join: the
    # full-corpus (doc_id, dl) projection is 10^12 rows, the hit set is
    # bounded by the query terms' postings. A left-semi against the filtered
    # postings lets AQE broadcast the hit-id set and filter lengths map-side
    # — no full-corpus shuffle just to serve a handful of scored docs. (No
    # forced broadcast hint: a stopword query's hit set can be huge; AQE
    # downgrades to a shuffled semi-join then, which is the correct fallback.)
    hit_lengths = lengths.join(hits.select("doc_id"), "doc_id", "left_semi")
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(hit_lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # identical parenthesization to the SQL twin — every double op below
    # is correctly-rounded IEEE mul/div/add, so bit-identical cross-engine
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    # F.lit(float(...)) not F.expr: a bare `1.2` parses as DECIMAL in Spark
    # SQL — Python's float() is the same round-to-nearest parse as DuckDB's
    wterm = (F.col("tf").cast("double") * F.lit(float(BM25_K1_PLUS_1))) / (
        F.col("tf").cast("double")
        + F.lit(float(BM25_K1))
        * (
            F.lit(float(BM25_ONE_MINUS_B))
            + F.lit(float(BM25_B)) * (F.col("dl").cast("double") / avgdl)
        )
    )
    term_e4 = F.floor(F.lit(10000.0) * idf * wterm)

    return (
        scored.select("doc_id", term_e4.alias("term_e4"))
        .groupBy("doc_id")
        .agg(
            F.sum("term_e4").cast("long").alias("score_e4"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.col("score_e4").desc(), F.col("doc_id"))
        .limit(k)
    )
