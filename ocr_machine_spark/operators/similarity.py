"""Similarity search over embedding columns (array<float>).

Two paths, per the task brief:
* brute-force cosine top-k — the exactness baseline; the query side is tiny
  and broadcast, so the scan side streams once with no shuffle until the
  final per-query top-k;
* LSH-bucketed ANN (signed random projections) — the scale path: candidates
  only meet inside an (plane-bucket) equi-join, same shape as MinHash-LSH.

Hyperplanes are derived deterministically from the plane index (seeded
Generator), never from runtime RNG — re-runs are byte-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_machine_spark.functions import cosine, fixed_point


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbours for each query id.

    Plan shape: tiny query side → broadcast hash join (no shuffle of the big
    side); per-query top-k via dense window on (score desc, id asc) — the
    deterministic tiebreak keeps results stable across partitionings.
    """
    from pyspark.sql.window import Window

    base = emb.select(F.col(key).alias("nid"), F.col(vec).cast("array<double>").alias("v"))
    q = (
        emb.filter(F.col(key).isin(query_ids))
        .select(F.col(key).alias("qid"), F.col(vec).cast("array<double>").alias("qv"))
    )
    scored = (
        base.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("sim_e4", fixed_point(cosine(F.col("qv"), F.col("v"))))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim_e4").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "sim_e4", "rk")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    *,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold) — the
    embedding tier of the dedup ladder (task brief). Exact self-join baseline;
    at 10^12 scale restrict the pair space with ``srp_buckets`` first (same
    candidates-only shape as MinHash-LSH)."""
    base = emb.select(F.col(key).alias("a"), F.col(vec).cast("array<double>").alias("va"))
    other = emb.select(F.col(key).alias("b"), F.col(vec).cast("array<double>").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        base.join(other, F.col("a") < F.col("b"))
        .withColumn("sim_e4", fixed_point(sim))
        .filter(sim >= F.lit(threshold))
        .select("a", "b", "sim_e4")
    )


def _planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(42)  # fixed seed — part of the operator spec
    return rng.standard_normal((n_planes, dim))


def srp_buckets(emb: DataFrame, *, dim: int, n_planes: int = 16, key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Signed-random-projection bucket id per vector (vectorized numpy over
    Arrow batches — one matmul per batch, no per-row Python)."""
    planes = _planes(dim, n_planes)

    def gen(batches):
        for pdf in batches:
            ids = pdf[key].to_numpy()
            mat = np.vstack(pdf[vec].to_numpy())
            signs = (mat @ planes.T) > 0
            bucket = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
            yield pd.DataFrame({"vec_id": ids, "bucket": bucket.astype(np.int64)})

    return emb.select(key, vec).mapInPandas(gen, schema="vec_id long, bucket long")


def ann_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    *,
    dim: int,
    n_planes: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN: only score candidates sharing the query's SRP bucket.
    Recall < 1 by design; the bench compares it against cosine_topk."""
    from pyspark.sql.window import Window

    buckets = srp_buckets(emb, dim=dim, n_planes=n_planes, key=key, vec=vec)
    base = emb.select(F.col(key).alias("nid"), F.col(vec).cast("array<double>").alias("v")).join(
        buckets.select(F.col("vec_id").alias("nid"), "bucket"), "nid"
    )
    q = (
        emb.filter(F.col(key).isin(query_ids))
        .select(F.col(key).alias("qid"), F.col(vec).cast("array<double>").alias("qv"))
        .join(buckets.select(F.col("vec_id").alias("qid"), F.col("bucket").alias("qbucket")), "qid")
    )
    scored = (
        base.join(F.broadcast(q), (F.col("bucket") == F.col("qbucket")) & (F.col("nid") != F.col("qid")))
        .withColumn("sim_e4", fixed_point(cosine(F.col("qv"), F.col("v"))))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim_e4").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "sim_e4", "rk")
    )
