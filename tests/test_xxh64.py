"""Pin the pure-Python/NumPy XXH64 twin (core/xxh64.py) bit-for-bit against
Spark's ``xxhash64`` expression — the dedup golden oracles
(sources/dedup_golden.py) are only as trustworthy as this equivalence."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ocr_machine_spark.core import xxh64 as X

STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "abcdefg",
    "abcdefgh",
    "0123456789abcdef0123456789abcde",   # 31 bytes (tail-only path)
    "0123456789abcdef0123456789abcdef",  # 32 bytes (stripe path)
    "hello world " * 10,                 # long, multi-stripe
    "naïve café ✓ ünïcödé",              # multibyte UTF-8
    "word1 word2 word3",                 # shingle-shaped
]
LONGS = [0, 1, -1, 42, 2**62, -(2**63), 2**63 - 1, 123456789012345, -987654321]


def test_xxh64_strings_match_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert X.xxh64_str(r["s"]) == r["h"], r["s"]


def test_xxh64_longs_ints_and_chains_match_spark(spark):
    schema = StructType([StructField("l", LongType())])
    df = spark.createDataFrame([(v,) for v in LONGS], schema=schema).select(
        "l",
        F.xxhash64("l").alias("h"),
        F.xxhash64("l", F.lit(7)).alias("h_chain_int"),
        F.xxhash64("l", F.lit(7).cast("long")).alias("h_chain_long"),
    )
    for r in df.collect():
        h = X.hash_long(r["l"])
        assert h == r["h"]
        # chained seeds: Spark folds left, next child hashed with prior hash
        assert X.hash_int(7, h) == r["h_chain_int"]
        assert X.hash_long(7, h) == r["h_chain_long"]


def test_vectorized_paths_match_scalar():
    arr = np.array(LONGS, dtype=np.int64)
    hv = X.to_signed(X.hash_long_vec(arr, 42))
    assert [int(x) for x in hv] == [X.hash_long(v) for v in LONGS]
    for perm in (0, 1, 31):
        pv = X.to_signed(X.hash_int_vec(perm, X.hash_long_vec(arr, 42)))
        assert [int(x) for x in pv] == [X.hash_int(perm, X.hash_long(v)) for v in LONGS]


def test_golden_signatures_match_spark_operators(spark):
    """End-to-end pin: the golden builder's SimHash + MinHash signatures
    (independent Python implementation) equal the Spark operators' output on
    the sf0.001 documents corpus."""
    from ocr_machine_spark.operators import dedup as D
    from ocr_machine_spark.sources.dedup_golden import minhash_sig_py, simhash_py

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    spark_sim = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    wcache: dict[str, int] = {}
    for did, t in texts.items():
        assert simhash_py(t, wcache) == spark_sim[did], f"simhash drift doc {did}"

    spark_min = {r["doc_id"]: list(r["sig"]) for r in D.minhash_signatures(docs).collect()}
    scache: dict[str, int] = {}
    for did, t in texts.items():
        py = minhash_sig_py(t, scache)
        if py is None:
            assert did not in spark_min  # <k words -> no signature either side
        else:
            assert py == spark_min[did], f"minhash drift doc {did}"
