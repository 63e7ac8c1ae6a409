"""Model lifecycle operators (SURVEY §2.11 M3/M6/M7, §2.1 S6).

M6 oversampling — the reference conditionally SMOTEs when imbalance > 5
(``xgboost_training_for_big_data.py:571-581``); distributed analog:
minority-class resampling with replacement (true SMOTE interpolation needs
KNN in feature space — the documented deviation).

M7 warm start — load-then-probe: the reference validates feature arity by
predicting on a probe row before reusing a model
(``xgboost_training_for_big_data.py:70-107,512-521``).

M3 multi-tower MLP — flat approximation via MultilayerPerceptronClassifier
(the exact tower architecture is out-of-MLlib-scope, SURVEY §2.11).

S6 perf-history JSON — append-only run-metrics record
(``xgboost_training_for_big_data.py:857-887``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oversample_minority(ds: DataFrame, label_col: str = "label", max_ratio: float = 5.0, seed: int = 42) -> DataFrame:
    """M6: when neg/pos exceeds ``max_ratio``, resample the minority class
    with replacement up to balance. One count + one sample-union; no-op when
    balanced enough."""
    counts = {r[label_col]: r["cnt"] for r in ds.groupBy(label_col).agg(F.count("*").alias("cnt")).collect()}
    n_pos, n_neg = counts.get(1, 0), counts.get(0, 0)
    if n_pos == 0 or n_neg / n_pos <= max_ratio:
        return ds
    extra_frac = (n_neg / max_ratio - n_pos) / n_pos
    minority = ds.filter(F.col(label_col) == 1)
    extra = minority.sample(withReplacement=True, fraction=float(extra_frac), seed=seed)
    return ds.unionByName(extra)


def compatibility_probe(model, assembler, probe_df: DataFrame) -> bool:
    """M7: True when the saved model transforms a 1-row probe without error
    (feature-arity compatibility check before warm-starting)."""
    try:
        model.transform(assembler.transform(probe_df.limit(1))).collect()
        return True
    except Exception:
        return False


def train_mlp(train: DataFrame, feature_cols: list[str], layers: list[int] | None = None, seed: int = 42, max_iter: int = 40):
    """M3 (flat approximation): MultilayerPerceptronClassifier over the same
    assembled features — [n_features, 16, 8, 2] by default, the MLlib
    stand-in for the reference's five-tower torch network."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="rawfeat", handleInvalid="keep")
    scaler = StandardScaler(inputCol="rawfeat", outputCol="features", withMean=False)  # M4 per-block analog
    assembled = assembler.transform(train)
    scaler_model = scaler.fit(assembled)
    data = scaler_model.transform(assembled)
    layers = layers or [len(feature_cols), 16, 8, 2]
    mlp = MultilayerPerceptronClassifier(
        labelCol="label", featuresCol="features", layers=layers, seed=seed, maxIter=max_iter
    )
    model = mlp.fit(data)
    return model, assembler, scaler_model


def append_perf_history(path: str, record: dict) -> list[dict]:
    """S6: append run metrics to a JSON history file; returns full history.
    Driver-side by design — this is run *metadata*, not row-scale data."""
    history: list[dict] = []
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            history = json.load(fh)
    history.append(record)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(history, fh, indent=2)
    return history
