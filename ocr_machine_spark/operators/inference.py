"""Batch model inference over embedding columns — the C3 analogue.

The reference applies its trained strikethrough detector in batch
(``training_strikethrough/training_inference_scripts/model_inference_test.py:59-127``:
load weights once, score image batches). This is the torch-free Spark shape of
the same operator, in the ``predict_batch_udf`` style:

* the weight vector is materialized ONCE on the driver (deterministic seed —
  the stand-in for loading a checkpoint) and captured in the UDF closure, so
  each executor deserializes it exactly once per task set — never per row;
* scoring is a scalar Arrow-batched pandas UDF: one numpy matvec per batch,
  no per-row Python;
* the scorer is a linear logit + threshold, which keeps it SQL-expressible so
  the DuckDB twin hash-gates it (a real model swaps the closure for a
  ``predict_batch_udf`` model loader; the Spark plumbing is identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ocr_machine_spark.functions import fixed_point


def linear_weights(dim: int, seed: int = 7) -> tuple[np.ndarray, float]:
    """Deterministic 'checkpoint': weights derived from the seed alone."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim), float(rng.standard_normal())


def predict_linear(
    emb: DataFrame,
    *,
    dim: int,
    key: str = "vec_id",
    vec: str = "embedding",
    seed: int = 7,
    weights: tuple[np.ndarray, float] | None = None,
) -> DataFrame:
    """Per-row inference: logit = w·v + b (fixed-point) and pred = logit > 0.

    The dot runs in SEQUENTIAL summation order (cumsum trick — the engine's
    IEEE-parity convention, see functions.dot): a BLAS matvec's partial-sum/
    FMA accumulation can differ from the DuckDB twin's list_dot_product in
    the last ulps, flipping fixed_point/pred for logits ulps from a rounding
    boundary, and varies across BLAS builds. Null / wrong-length embeddings
    score NULL (never-raise per-row convention, like extract_pages).

    ``weights``: an explicit (w, b) checkpoint — pass
    ``operators.training.train_linear(...).best_weights`` to apply a
    TRAINED model (the reference's load-checkpoint-then-batch-score flow,
    model_inference_test.py:59-127); when None, the seed-derived stand-in
    checkpoint is used."""
    if weights is not None:
        w, b = np.asarray(weights[0], dtype=np.float64), float(weights[1])
        if w.shape != (dim,):
            raise ValueError(f"weights dim {w.shape} != ({dim},)")
    else:
        w, b = linear_weights(dim, seed)

    @pandas_udf("double")
    def logit(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        ok = np.array([x is not None and len(x) == dim for x in vals])
        out = np.full(len(vals), np.nan)
        if ok.any():
            mat = np.vstack(vals[ok])
            out[ok] = np.cumsum(mat * w[None, :], axis=1)[:, -1] + b
        return pd.Series(out)

    scored = emb.select(
        F.col(key), logit(F.col(vec).cast("array<double>")).alias("z")
    )
    # gate on NaN explicitly: Spark orders NaN ABOVE every double (NaN > 0
    # is true) and casts NaN to 0 on long casts — a bad row must surface as
    # NULL, not as pred=true / logit_e4=0
    good = ~F.isnan("z")
    return scored.select(
        key,
        F.when(good, fixed_point(F.col("z"))).alias("logit_e4"),
        F.when(good, F.col("z") > 0).alias("pred"),
    )
