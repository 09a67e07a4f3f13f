"""Trained-classifier lifecycle (operators.training): gradient descent in
exact fixed-point, per-epoch val folds, best-checkpoint selection, and the
trained-weights hand-off into batch inference — the EP3 graft
(model_training_pipeline.py:136-274 + model_inference_test.py:59-127)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def trained(spark):
    from ocr_machine_spark.operators.training import train_linear

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return train_linear(emb, dim=64, epochs=3, lr="0.25")


def test_metrics_shape_and_best_flag(spark, trained):
    rows = {r["epoch"]: r for r in trained.metrics.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    # exactly one best row, and it carries the min (val_sse, epoch)
    best_rows = [e for e, r in rows.items() if r["is_best"]]
    expect = min((r["val_sse_e4"], e) for e, r in rows.items())[1]
    assert best_rows == [expect] == [trained.best_epoch]
    # n_val constant across epochs; every fold is a plain BIGINT
    assert len({r["n_val"] for r in rows.values()}) == 1
    assert all(isinstance(r["val_sse_e4"], int) for r in rows.values())


def test_training_reduces_val_loss(trained):
    rows = {r["epoch"]: r for r in trained.metrics.collect()}
    assert rows[trained.best_epoch]["val_sse_e4"] < rows[0]["val_sse_e4"]
    assert rows[3]["train_sse_e4"] < rows[0]["train_sse_e4"]


def test_best_epoch_is_not_last_when_lr_overshoots(spark):
    """With an overshooting learning rate the val loss dips then diverges;
    the selector must keep the intermediate checkpoint, not the final one —
    the whole point of best-checkpoint selection
    (model_training_pipeline.py:158-274)."""
    from ocr_machine_spark.operators.training import train_linear

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    tl = train_linear(emb, dim=64, epochs=4, lr="16.0")
    rows = {r["epoch"]: r for r in tl.metrics.collect()}
    assert tl.best_epoch < 4
    assert rows[4]["val_sse_e4"] > rows[tl.best_epoch]["val_sse_e4"]


def test_result_is_partitioning_independent(spark, trained):
    """Exact fixed-point statistics: the identical trajectory on any
    partitioning — the property that makes the result cluster-size
    independent (the two-cluster-size determinism claim)."""
    from ocr_machine_spark.operators.training import train_linear

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(7)
    tl2 = train_linear(emb, dim=64, epochs=3, lr="0.25")
    a = sorted(map(tuple, trained.metrics.collect()))
    b = sorted(map(tuple, tl2.metrics.collect()))
    assert a == b
    np.testing.assert_array_equal(trained.best_weights[0], tl2.best_weights[0])
    assert trained.best_weights[1] == tl2.best_weights[1]


def test_trained_weights_feed_predict_linear(spark, trained):
    """Batch apply of the selected checkpoint: predict_linear(weights=...)
    scores with the TRAINED model (load-checkpoint-then-score,
    model_inference_test.py:59-127), and differs from the seed stand-in."""
    from ocr_machine_spark.operators.inference import predict_linear

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = predict_linear(emb, dim=64, weights=trained.best_weights).collect()
    assert all(r["pred"] == (r["logit_e4"] > 0) for r in got if r["logit_e4"] is not None)
    seeded = predict_linear(emb, dim=64).collect()
    assert {r["vec_id"]: r["logit_e4"] for r in got} != {
        r["vec_id"]: r["logit_e4"] for r in seeded
    }
    with pytest.raises(ValueError, match="weights dim"):
        predict_linear(emb, dim=64, weights=(np.zeros(3), 0.0))


def test_ragged_and_null_vectors_are_excluded(spark):
    """A NULL or wrong-length embedding must drop out of training (never
    crash the pass or poison the gradient)."""
    from pyspark.sql import functions as F

    from ocr_machine_spark.operators.training import train_linear

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    poisoned = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 17 == 0, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 19 == 0, F.slice("embedding", 1, 3))
        .otherwise(F.col("embedding")),
    )
    tl = train_linear(poisoned, dim=64, epochs=1, lr="0.25")
    rows = tl.metrics.collect()
    assert len(rows) == 2 and all(r["val_sse_e4"] > 0 for r in rows)


def test_train_cli_end_to_end(spark, tmp_path):
    """Production surface: jobs.py --job train in a subprocess — writes
    metrics/weights/scores, stats consistent with the tables, and the
    weights table round-trips into predict_linear."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "out")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "ocr_machine_spark/jobs.py", "--job", "train",
         "--input", f"{SF}/embeddings.parquet", "--output", out,
         "--run-id", "t1", "--epochs", "3", "--master", "local[4]"],
        capture_output=True, text=True, cwd=repo_root, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["dim"] == 64 and stats["epochs"] == 3
    assert stats["val_sse_e4_best"] < stats["val_sse_e4_init"]
    assert stats["test_invalid"] == 0

    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.count() == 4  # epochs 0..3
    best = [r["epoch"] for r in metrics.collect() if r["is_best"]]
    assert best == [stats["best_epoch"]]

    weights = {r["pos"]: r["w"] for r in spark.read.parquet(f"{out}/weights").collect()}
    assert sorted(weights) == list(range(-1, 64))
    scores = spark.read.parquet(f"{out}/scores")
    assert scores.count() == stats["test_scored"] > 0

    # the written checkpoint reproduces the job's own scores exactly
    from ocr_machine_spark.operators.inference import predict_linear
    from ocr_machine_spark.operators.training import md5_split
    from pyspark.sql import functions as F

    w = np.array([weights[i] for i in range(64)])
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        md5_split(F.col("vec_id")) == "test"
    )
    re_scored = predict_linear(emb, dim=64, weights=(w, weights[-1]))
    assert sorted(map(tuple, re_scored.collect())) == sorted(
        map(tuple, scores.collect())
    )


def test_train_empty_split_fails_loudly(spark):
    """A corpus too small to populate both hash splits must raise a clear
    ValueError, not a KeyError mid-loop."""
    emb = spark.createDataFrame(
        [(0, [0.1] * 64, 1)], "vec_id long, embedding array<float>, label int"
    )
    from ocr_machine_spark.operators.training import train_linear

    with pytest.raises(ValueError, match="split is empty"):
        train_linear(emb, dim=64, epochs=1)
