"""Training plan: the EP3 lifecycle as one production job — train on the
hash-assigned split, validate every epoch, select the best checkpoint, and
batch-apply it to the held-out test split.

The reference runs exactly this sequence per experiment
(``training_strikethrough/training_inference_scripts/model_training_pipeline.py:158-274``
train/val loop + best-checkpoint keep, then ``model_inference_test.py:59-127``
batch apply). Here it is a deterministic Spark job over an embeddings table:

Outputs under ``out_dir``:
* ``metrics``  — one row per epoch 0..E (exact-BIGINT loss folds, val
  accuracy, ``is_best`` flag) — the training curve table;
* ``weights``  — the SELECTED checkpoint as (pos, w) rows with the bias at
  pos = -1 (the portable "vocab file" form — any engine can reload it);
* ``scores``   — the best checkpoint batch-applied to the TEST split
  (vec_id, logit_e4, pred), the reference's inference artifact.

Everything inherits train_linear's guarantees: exact fixed-point
statistics (identical result on any partitioning / cluster size), O(dim)
driver traffic per epoch, zero per-row Python. Idempotent via overwrite —
the job is a pure function of (input, epochs, lr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_machine_spark.operators.inference import predict_linear
from ocr_machine_spark.operators.training import md5_split, train_linear


def run_training(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    epochs: int = 4,
    lr: str = "0.25",
    dim: int | None = None,
    key: str = "vec_id",
    vec: str = "embedding",
    label: str = "label",
) -> dict:
    """Train → select-best → batch-infer; write the three tables; → stats.

    ``dim`` defaults to the first valid row's vector length (a one-row
    metadata probe, not a scan)."""
    if dim is None:
        probe = (
            emb.filter(F.col(vec).isNotNull())
            .select(F.size(vec).alias("d"))
            .first()
        )
        if probe is None:
            raise ValueError("run_training: no non-null vectors in the input")
        dim = int(probe["d"])

    tl = train_linear(
        emb, dim=dim, epochs=epochs, lr=lr, key=key, vec=vec, label=label
    )
    tl.metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics")

    w, b = tl.best_weights
    weights_rows = [(int(p), float(x)) for p, x in enumerate(w)] + [(-1, float(b))]
    spark.createDataFrame(weights_rows, "pos int, w double").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/weights")

    test = emb.filter(md5_split(F.col(key)) == "test")
    predict_linear(test, dim=dim, key=key, vec=vec, weights=(w, b)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/scores")

    metrics = spark.read.parquet(f"{out_dir}/metrics")
    scores = spark.read.parquet(f"{out_dir}/scores")
    rows = {r["epoch"]: r for r in metrics.collect()}
    sc = scores.agg(
        F.count("*").alias("n"),
        F.sum(F.col("pred").cast("long")).alias("n_pos"),
        F.sum(F.col("logit_e4").isNull().cast("long")).alias("n_invalid"),
    ).first()
    return {
        "run_id": run_id,
        "dim": dim,
        "epochs": epochs,
        "lr": lr,
        "best_epoch": tl.best_epoch,
        "val_sse_e4_init": int(rows[0]["val_sse_e4"]),
        "val_sse_e4_best": int(rows[tl.best_epoch]["val_sse_e4"]),
        "val_acc_best": f"{rows[tl.best_epoch]['val_correct']}/{rows[tl.best_epoch]['n_val']}",
        "test_scored": int(sc["n"]),
        "test_pred_pos": int(sc["n_pos"] or 0),
        "test_invalid": int(sc["n_invalid"] or 0),
    }
