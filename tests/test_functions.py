"""Bit-parity pins for the scalar-function surface.

The engine's determinism contract (SURVEY.md §7) rests on every dot product —
interpreted ``dot``, codegen'd ``dot_unrolled_sql``/``dot_literal_sql``, the
numpy cumsum verify path, and driver-side ``_py_l2`` — performing the SAME
left-to-right IEEE double sequence. These tests pin that equivalence at the
bit level so a refactor that silently changes summation order (and thereby
oracle value hashes) fails here, not in the driver gate.
"""

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_machine_spark.functions import _dlit, dot, dot_literal_sql, dot_unrolled_sql
from ocr_machine_spark.operators.similarity import _py_l2


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(123)
    a = [float(x) for x in rng.standard_normal(64)]
    b = [float(x) for x in rng.standard_normal(64)]
    return a, b


def test_sql_dots_bit_identical_to_aggregate_dot(spark, vecs):
    a, b = vecs
    df = spark.range(1).select(
        F.array(*[F.lit(x) for x in a]).alias("va"),
        F.array(*[F.lit(x) for x in b]).alias("vb"),
    )
    r = df.select(
        dot(F.col("va"), F.col("vb")).alias("d_agg"),
        F.expr(dot_unrolled_sql("va", "vb", 64)).alias("d_sql"),
        F.expr(dot_literal_sql("va", b)).alias("d_lit"),
    ).first()
    assert _bits(r["d_agg"]) == _bits(r["d_sql"])
    assert _bits(r["d_agg"]) == _bits(r["d_lit"])


def test_dlit_round_trips_exact_doubles(spark):
    vals = [1e-300, -2.5e300, 0.1, 1e-5, 123456789.123456789, -0.0, 7.0]
    row = spark.range(1).select(
        *[F.expr(_dlit(v)).alias(f"c{i}") for i, v in enumerate(vals)]
    ).first()
    for i, v in enumerate(vals):
        assert _bits(row[i]) == _bits(float(v)), v


def test_py_l2_matches_jvm_norm(spark, vecs):
    a, _ = vecs
    r = (
        spark.range(1)
        .select(F.array(*[F.lit(x) for x in a]).alias("va"))
        .select(F.sqrt(dot(F.col("va"), F.col("va"))).alias("n"))
        .first()
    )
    assert _bits(r["n"]) == _bits(_py_l2(a))


def test_ivf_train_partitioning_invariant(spark):
    """k-means statistics must be identical on any partitioning — exact
    fixed-point int64 sums make the distributed reduction order-free."""
    from ocr_machine_spark.operators.similarity import ivf_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, ivf_train(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, ivf_train(emb.repartition(13), k=4, iters=2).collect()))
    c = sorted(map(tuple, ivf_train(emb.coalesce(1), k=4, iters=2).collect()))
    assert a == b == c
    assert len(a) > 0
    # counts are consistent: every (cell) has one n across all pos, and the
    # member total equals the corpus size
    ns = {}
    for cell, pos, s, n in a:
        ns.setdefault(cell, set()).add(n)
    assert all(len(v) == 1 for v in ns.values())
    assert sum(next(iter(v)) for v in ns.values()) == emb.count()


def test_ivf_train_matches_numpy_golden(spark):
    """The Spark trainer and the independent numpy golden (the oracle twin's
    source) agree row-for-row."""
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_machine_spark.operators.similarity import ivf_train
    from ocr_machine_spark.sources.ivf_golden import kmeans_stats_py

    d = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    got = sorted(map(tuple, ivf_train(emb, k=8, iters=2).collect()))
    tbl = pq.read_table(f"{d}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    exp = sorted(kmeans_stats_py(ids[order], mat[order], k=8, iters=2, scale=1_000_000))
    assert got == exp


def test_numpy_cumsum_matches_sequential_dot(vecs):
    """The Arrow-batch verify/quantizer paths sum via np.cumsum along the
    vector axis — same order as the scalar fold."""
    a, b = vecs
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    d = np.cumsum(np.array(a) * np.array(b))[-1]
    assert _bits(float(d)) == _bits(acc)
    acc2 = 0.0
    for x in a:
        acc2 = acc2 + x * x
    assert _bits(_py_l2(a)) == _bits(math.sqrt(acc2))


def test_ntile_global_matches_sql_ntile(spark):
    """ranking.ntile_global must be byte-identical to ntile(n) OVER
    (ORDER BY ...) — including the uneven-remainder tile sizes — and
    invariant to input partitioning, without any SinglePartition window."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from ocr_machine_spark.operators.ranking import ntile_global

    rows = [(i, (i * 37) % 101, f"k{i}") for i in range(1003)]  # N % 4 == 3
    df = spark.createDataFrame(rows, "id long, v long, k string")
    want = df.withColumn(
        "band", F.ntile(4).over(Window.orderBy(F.col("v"), F.col("id"))).cast("long")
    )
    got = ntile_global(df, 4, ["v", "id"], buckets=8)
    mism = (
        got.alias("g")
        .join(want.alias("w"), "id")
        .filter(F.col("g.band") != F.col("w.band"))
        .count()
    )
    assert mism == 0
    got2 = ntile_global(df.repartition(13), 4, ["v", "id"], buckets=8)
    assert got2.groupBy("band").count().orderBy("band").collect() == (
        got.groupBy("band").count().orderBy("band").collect()
    )
    # fewer rows than tiles: first N tiles get one row each
    tiny = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    bands = {r["id"]: r["band"] for r in ntile_global(tiny, 4, ["v", "id"]).collect()}
    assert bands == {1: 1, 2: 2}
    # empty input
    assert ntile_global(tiny.filter("v > 99"), 4, ["v", "id"]).count() == 0


def test_canonical_url_spec(spark):
    """URL canonicalization spec cases: scheme/host case-folding (path case
    preserved), fragment cut, tracking-param removal with order-preserving
    survivors, trailing-slash rule."""
    import pyspark.sql.functions as F

    from ocr_machine_spark.operators.urls import canonical_url

    cases = [
        ("HTTPS://Example.COM/Path/Page", "https://example.com/Path/Page"),
        ("https://a.com/x?utm_source=1&id=2&gclid=z&b=3", "https://a.com/x?id=2&b=3"),
        ("https://a.com/x#frag?utm_source=1", "https://a.com/x"),
        ("https://a.com/", "https://a.com"),
        ("https://a.com/x/?fbclid=abc", "https://a.com/x"),
        ("https://a.com/x?utm_source=1&utm_medium=2", "https://a.com/x"),
        ("http://a.com:8080/x?a=1", "http://a.com:8080/x?a=1"),
        ("not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonical_url(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def test_host_of_and_domain_stats(spark):
    """host_of spec cases (case-fold, port strip, one www. strip, junk →
    empty bucket) and domain_stats semantics: within-host dup fraction in
    exact e4, spam via threshold and via blocklist."""
    import pyspark.sql.functions as F

    from ocr_machine_spark.operators.urls import domain_stats, host_of

    cases = [
        ("HTTPS://WWW.Example.COM:8080/Path", "example.com"),
        ("https://www.www.a.org/x", "www.a.org"),  # exactly ONE www. strip
        ("ftp://Host.Net", "host.net"),
        ("no scheme here", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(host_of(F.col("u"))).collect()]
    assert got == [want for _, want in cases]

    rows = [
        # farm.example: 4 docs, one distinct body -> dup_frac 0.75 >= 0.3
        *[(f"https://farm.example/{i}", "same body") for i in range(4)],
        # clean.example: 2 docs, distinct bodies -> dup_frac 0
        ("https://clean.example/a", "alpha text"),
        ("https://clean.example/b", "beta text"),
        # blocked.example: clean stats but blocklisted
        ("https://blocked.example/a", "gamma text"),
    ]
    d = spark.createDataFrame(rows, "url string, text string")
    out = {r["host"]: r.asDict() for r in domain_stats(
        d, blocklist=("blocked.example",)).collect()}
    assert out["farm.example"]["dup_frac_e4"] == 7500
    assert out["farm.example"]["spam"] is True
    assert out["clean.example"]["dup_frac_e4"] == 0
    assert out["clean.example"]["spam"] is False
    assert out["clean.example"]["n_distinct_text"] == 2
    assert out["blocked.example"]["spam"] is True
    assert out["blocked.example"]["dup_frac_e4"] == 0


def test_pack_plan_invariants(spark):
    """Concat-and-chop packing: per-shard offsets are gapless prefix sums,
    bin ids follow from offset arithmetic, and a doc straddles exactly the
    bins its span covers."""
    from collections import defaultdict

    from ocr_machine_spark.operators.textstats import pack_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_plan(docs, budget=64).collect()
    assert rows
    by_part = defaultdict(list)
    for r in rows:
        by_part[r["part"]].append(r)
    saw_straddle = False
    for part, rs in by_part.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["tok_offset"] == cum  # gapless layout
            assert r["bin_first"] == cum // 64
            assert r["bin_last"] == (cum + r["n_tokens"] - 1) // 64
            assert r["bin_last"] >= r["bin_first"]
            saw_straddle |= r["bin_last"] > r["bin_first"]
            cum += r["n_tokens"]
    assert saw_straddle  # budget 64 vs ~30-token docs must straddle somewhere


def test_snapshot_diff_four_classes(spark):
    """All four change classes, and the null-side logic of the full-outer
    join: fp columns are null exactly on the missing side."""
    from ocr_machine_spark.operators.urls import snapshot_diff

    old = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("a", "1"), ("b", "9"), ("d", "4")], "url string, fp string"
    )
    got = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    assert got["a"]["change"] == "unchanged"
    assert got["b"]["change"] == "changed" and got["b"]["old_fp"] == "2" and got["b"]["new_fp"] == "9"
    assert got["c"]["change"] == "removed" and got["c"]["new_fp"] is None
    assert got["d"]["change"] == "added" and got["d"]["old_fp"] is None
    assert len(got) == 4


def test_robots_rules_and_check(spark):
    """RFC 9309 subset: non-star groups ignored, multi-agent star group
    owned rules included, empty-value rules are no-ops, longest match
    wins, allow wins ties, default allow (incl. unknown hosts and bare
    authority urls)."""
    from ocr_machine_spark.operators.robots import robots_check, robots_rules

    body = (
        "# corp robots\nUser-agent: megabot\nDisallow: /\n\n"
        "User-agent: *\nUser-agent: other\n"
        "Disallow: /tmp\nAllow: /tmp/ok\nDisallow:\nAllow: /private/peek\n\n"
        "User-agent: evilbot\nDisallow: /secret\n"
    )
    robots = spark.createDataFrame([("h.example", body)], "host string, robots_txt string")
    rules = {(r["allow"], r["prefix"]) for r in robots_rules(robots).collect()}
    assert rules == {(False, "/tmp"), (True, "/tmp/ok"), (True, "/private/peek")}

    urls = spark.createDataFrame(
        [(u,) for u in (
            "https://h.example/tmp/x",
            "https://h.example/tmp/ok/y",
            "https://h.example/public",
            "https://h.example/private/peek",
            "https://h.example",
            "https://other.example/tmp/x",
        )],
        "url string",
    )
    got = {r["url"]: (r["allowed"], r["rule_prefix"]) for r in robots_check(urls, robots_rules(robots)).collect()}
    assert got["https://h.example/tmp/x"] == (False, "/tmp")
    assert got["https://h.example/tmp/ok/y"] == (True, "/tmp/ok")
    assert got["https://h.example/public"] == (True, None)
    assert got["https://h.example/private/peek"] == (True, "/private/peek")
    assert got["https://h.example"] == (True, None)
    assert got["https://other.example/tmp/x"] == (True, None)


def test_robots_comment_between_user_agents_merges_group(spark):
    """RFC 9309 §2.2.1: comments and blank lines are invisible to grouping.
    'User-agent: *\\n# note\\nUser-agent: b\\nDisallow: /x' is ONE merged
    group — /x must bind to '*' too, not only to b (the pre-fix behavior
    split the group at the comment and the gate failed open for '*')."""
    from ocr_machine_spark.operators.robots import robots_check, robots_rules

    body = "User-agent: *\n# note\n\nUser-agent: b\nDisallow: /x\n"
    robots = spark.createDataFrame([("h.example", body)], "host string, robots_txt string")
    rules = {(r["allow"], r["prefix"]) for r in robots_rules(robots).collect()}
    assert rules == {(False, "/x")}
    urls = spark.createDataFrame([("https://h.example/x/1",)], "url string")
    got = robots_check(urls, robots_rules(robots)).collect()
    assert got[0]["allowed"] is False and got[0]["rule_prefix"] == "/x"


def test_snapshot_diff_null_fp_is_unknown_not_absent(spark):
    """NULL fingerprints mean unknown content: present-in-both rows must
    never classify added/removed (presence is tracked by markers, not fp
    nullness), and any NULL fp on a present-both row is 'changed' — the
    conservative recrawl decision."""
    from ocr_machine_spark.operators.urls import snapshot_diff

    old = spark.createDataFrame(
        [("a", None), ("b", "1"), ("c", None)], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", None)], "url string, fp string"
    )
    got = {r["url"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {"a": "changed", "b": "changed", "c": "changed"}


def test_robots_host_canonicalization(spark):
    """A robots table keyed by the literal fetched hostname
    ('www.Example.COM:8080') must still gate urls whose key comes from
    host_of — otherwise the gate silently fails open."""
    from ocr_machine_spark.operators.robots import robots_check, robots_rules

    robots = spark.createDataFrame(
        [("www.Example.COM:8080", "User-agent: *\nDisallow: /tmp\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("https://example.com/tmp/x",), ("https://WWW.example.com/ok",)],
        "url string",
    )
    got = {r["url"]: r["allowed"] for r in robots_check(urls, robots_rules(robots)).collect()}
    assert got["https://example.com/tmp/x"] is False
    assert got["https://WWW.example.com/ok"] is True


def test_sitemap_entries(spark):
    """urlset + sitemapindex parsing: trims padded locs, NULLs missing
    lastmod, drops loc-less blocks, tags nested index refs kind='sitemap'."""
    from ocr_machine_spark.operators.urls import sitemap_entries

    xml = (
        "<urlset><url><loc> https://a/1 </loc><lastmod>2024-01-02</lastmod></url>"
        "<url><loc>https://a/2</loc></url>"
        "<url><lastmod>2024-03-01</lastmod></url></urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
        "<lastmod>2024-02-02</lastmod></sitemap>"
        "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://a/sitemap.xml", xml), ("https://a/index.xml", idx)],
        "sitemap_url string, xml string",
    )
    got = {(r["loc"]): (r["kind"], r["lastmod"]) for r in sitemap_entries(df).collect()}
    assert got == {
        "https://a/1": ("url", "2024-01-02"),
        "https://a/2": ("url", None),
        "https://a/s1.xml": ("sitemap", "2024-02-02"),
        "https://a/s2.xml": ("sitemap", None),
    }


def test_robots_crawl_delays(spark):
    """Crawl-delay politeness: star-group only, max-of-repeats, fractional
    seconds → exact ms, non-numeric/negative ignored, absent hosts absent."""
    from ocr_machine_spark.operators.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: megabot\nCrawl-delay: 99\n\n"
             "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 2\n"),
            ("b.example", "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -1\n"),
            ("c.example", "User-agent: *\nDisallow: /x\n"),
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay_ms"] for r in robots_crawl_delays(robots).collect()}
    assert got == {"a.example": 2000}  # max(500, 2000); megabot's 99 ignored
