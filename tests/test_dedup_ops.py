"""Unit tests for dedup cluster resolution (pairs → components → keep-list)."""

import pyspark.sql.functions as F

from ocr_machine_spark.operators.dedup import dedup_clusters


def test_dedup_clusters_chain_and_isolated(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # chain 1-2-3 (transitive: 3 never pairs with 1 directly), pair 4-5, isolated 6
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    out = {r["doc_id"]: (r["rep"], r["keep"]) for r in dedup_clusters(docs, pairs).collect()}
    assert out == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
        5: (4, False),
        6: (6, True),
    }


def test_dedup_clusters_partitioning_invariant(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)] + [(1, 3), (17, 19)], "a long, b long"
    )
    a = dedup_clusters(docs, pairs).orderBy("doc_id").collect()
    b = dedup_clusters(docs.repartition(7), pairs.repartition(3)).orderBy("doc_id").collect()
    assert a == b
