"""Random-forest training/prediction on MLlib.

Reference chain: ``mlm_class_random_forest`` builds an untrained sklearn
RandomForestClassifier + a synthesized STAC-MLM Item (reference:
process_implementations/init_models.py:17-246); ``ml_fit`` flattens a
VectorCube to a row-table with compound "<time>_<band>" feature names,
1-based label encoding, 85/15 split, fit, and a validation report
(scikit_learn_model.py:156-236); ``ml_predict`` fans the model over
chunks (scikit_learn_model.py:71-132).

Spark: the estimator is MLlib's RandomForestClassifier —
``featureSubsetStrategy`` natively supports the reference's
max_variables values (sqrt/log2/all/onethird). Fit is a distributed
MLlib job; predict is ``model.transform`` — a narrow map stage, the
exact analog of the reference's apply_ufunc fast path.
"""

from __future__ import annotations

import copy
import json
import os
from dataclasses import dataclass, field

from pyspark.ml.classification import RandomForestClassificationModel, RandomForestClassifier
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.mlm.descriptor import (
    MLModelDescriptor,
    ModelInput,
    ModelOutput,
)

_MAX_VARIABLES = {"sqrt": "sqrt", "log2": "log2", "all": "all", "onethird": "onethird"}


def _synthesize_mlm_item(num_trees: int, max_variables: str, seed: int | None) -> dict:
    """The MLM metadata the reference generates in code
    (init_models.py:53-238), minus the raster-asset boilerplate."""
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": ["https://stac-extensions.github.io/mlm/v1.4.0/schema.json"],
        "id": "random-forest-classification",
        "properties": {
            "mlm:name": "random-forest-classification",
            "mlm:architecture": "RandomForest",
            "mlm:tasks": ["classification"],
            "mlm:framework": "spark-mllib",
            "mlm:pretrained": False,
            "mlm:batch_size_suggestion": 1,
            "mlm:hyperparameters": {
                "num_trees": num_trees,
                "max_variables": max_variables,
                "seed": seed,
            },
            "mlm:input": [
                {
                    "name": "features",
                    "bands": [],
                    "input": {
                        "shape": [-1, -1],
                        "dim_order": ["batch", "bands"],
                        "data_type": "float64",
                    },
                }
            ],
            "mlm:output": [
                {
                    "name": "classification",
                    "tasks": ["classification"],
                    "result": {
                        "shape": [-1, 1],
                        "dim_order": ["batch", "classification"],
                        "data_type": "int32",
                    },
                }
            ],
        },
        "assets": {},
    }


@dataclass
class RfClassModel:
    """Descriptor + (once fitted) the MLlib model and label table."""

    descriptor: MLModelDescriptor
    num_trees: int = 100
    max_variables: str = "sqrt"
    seed: int | None = None
    model: RandomForestClassificationModel | None = None
    labels: list = field(default_factory=list)  # index -> original label
    metrics: dict = field(default_factory=dict)

    @property
    def pretrained(self) -> bool:
        return self.descriptor.pretrained


def mlm_class_random_forest(
    max_variables: str = "sqrt",
    num_trees: int = 100,
    seed: int | None = None,
) -> RfClassModel:
    if max_variables not in _MAX_VARIABLES:
        raise ValueError(
            f"max_variables must be one of {sorted(_MAX_VARIABLES)}, got {max_variables!r}"
        )
    item = _synthesize_mlm_item(num_trees, max_variables, seed)
    descriptor = MLModelDescriptor(
        item=item,
        input=ModelInput.parse(item["properties"]["mlm:input"][0]),
        output=ModelOutput.parse(item["properties"]["mlm:output"][0]),
        framework="spark-mllib",
        pretrained=False,
        batch_size_suggestion=1,
    )
    return RfClassModel(
        descriptor=descriptor,
        num_trees=num_trees,
        max_variables=_MAX_VARIABLES[max_variables],
        seed=seed,
    )


def _metrics_from_confusion(
    pred: DataFrame, label_col: str, pred_col: str
) -> dict:
    """Full validation report from ONE groupBy confusion matrix — the
    distributed form of the reference's validation block
    (scikit_learn_model.py:193-207: accuracy_score, cohen_kappa_score
    AND the per-class classification_report). The matrix is
    class-count² rows, so a single collect is bounded; everything —
    n_valid, accuracy, kappa, per-class precision/recall/F1/support,
    macro + weighted averages — derives from it driver-side with no
    further job."""
    cm = pred.groupBy(label_col, pred_col).count().collect()
    total = sum(r["count"] for r in cm)
    if total == 0:
        return {"accuracy": 0.0, "kappa": 0.0, "n_valid": 0, "per_class": {}}
    agree = sum(r["count"] for r in cm if r[label_col] == r[pred_col])
    row_tot: dict = {}  # support (true count) per class
    col_tot: dict = {}  # predicted count per class
    diag: dict = {}
    for r in cm:
        row_tot[r[label_col]] = row_tot.get(r[label_col], 0) + r["count"]
        col_tot[r[pred_col]] = col_tot.get(r[pred_col], 0) + r["count"]
        if r[label_col] == r[pred_col]:
            diag[r[label_col]] = r["count"]
    po = agree / total
    pe = sum(row_tot.get(k, 0) * col_tot.get(k, 0) for k in row_tot) / (total * total)
    kappa = (po - pe) / (1 - pe) if pe < 1 else 0.0
    # sklearn classification_report conventions: classes = union of
    # true and predicted labels; 0.0 where a denominator is zero
    per_class: dict = {}
    for k in sorted(set(row_tot) | set(col_tot)):
        tp = diag.get(k, 0)
        prec = tp / col_tot[k] if col_tot.get(k) else 0.0
        rec = tp / row_tot[k] if row_tot.get(k) else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        per_class[k] = {
            "precision": prec,
            "recall": rec,
            "f1": f1,
            "support": row_tot.get(k, 0),
        }
    ncls = len(per_class)
    macro = {
        m: sum(c[m] for c in per_class.values()) / ncls
        for m in ("precision", "recall", "f1")
    }
    weighted = {
        m: sum(c[m] * c["support"] for c in per_class.values()) / total
        for m in ("precision", "recall", "f1")
    }
    return {
        "accuracy": po,
        "kappa": kappa,
        "n_valid": total,
        "per_class": per_class,
        "macro_avg": macro,
        "weighted_avg": weighted,
    }


def fit_on_features(
    rf: RfClassModel,
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
) -> RfClassModel:
    """Fit on a table with an array<numeric> feature column.

    Mirrors the reference's fit protocol: deterministic 1-based label
    encoding (scikit_learn_model.py:171-175), 85/15 train/validation
    split (:177-179), accuracy + kappa report (:193-207). Returns a
    trained copy (copy-on-train, :233-236).
    """
    labels = [
        r[0]
        for r in df.select(label_col).distinct().orderBy(label_col).collect()
    ]
    # 1-based encoding "for compatibility with R backends" (reference)
    label_to_idx = {lab: i + 1 for i, lab in enumerate(labels)}
    mapping = F.create_map(
        *[F.lit(x) for pair in label_to_idx.items() for x in pair]
    )
    prepared = df.select(
        array_to_vector(
            F.transform(F.col(feature_col), lambda x: x.cast("double"))
        ).alias("features"),
        mapping[F.col(label_col)].cast("double").alias("label_idx"),
    )
    seed = rf.seed if rf.seed is not None else 0
    train, valid = prepared.randomSplit([0.85, 0.15], seed=seed)
    est = RandomForestClassifier(
        featuresCol="features",
        labelCol="label_idx",
        numTrees=rf.num_trees,
        featureSubsetStrategy=rf.max_variables,
        seed=seed,
    )
    model = est.fit(train)
    pred = model.transform(valid)
    metrics = _metrics_from_confusion(pred, "label_idx", "prediction")
    # per-class keys back to the caller's label names (the reference's
    # classification_report is keyed by original class name)
    idx_to_label = {float(i): lab for lab, i in label_to_idx.items()}
    metrics["per_class"] = {
        idx_to_label.get(k, k): v for k, v in metrics["per_class"].items()
    }

    fitted = copy.copy(rf)
    fitted.model = model
    fitted.labels = labels
    fitted.metrics = metrics
    fitted.descriptor = copy.deepcopy(rf.descriptor)
    fitted.descriptor.pretrained = True
    fitted.descriptor.item["properties"]["mlm:pretrained"] = True
    return fitted


def ml_fit(
    rf: RfClassModel,
    training_cube: CubeFrame,
    target: str = "class_name",
    max_features: int = 100_000,
) -> RfClassModel:
    """openEO ml_fit on a vector cube: pivot (time, band) into compound
    "<time>_<band>" feature columns (the reference's stacked feature
    names, scikit_learn_model.py:221-226), then fit.

    Also backfills the MLM metadata from the training set the way
    ml_fit does (reference ml_fit.py:35-88): bands list, input shape,
    output dim renamed to the target.

    The pivot width — distinct (time, band) combinations — becomes
    BOTH a driver-side name list and the MLlib feature-vector length,
    so it is capped (``max_features``, default 1e5) with the same
    explicit-error-plus-guidance posture as the inference axis cap
    (VERDICT r14): the cap is enforced INSIDE the aggregation
    (sort_array + slice on the single agg row), so an oversized
    vocabulary never crosses to the driver before the check fires.
    """
    bcol = training_cube.dim_col("bands")
    tcol = training_cube.dims.get("time")
    geom = training_cube.dim_col("geometry")
    feat_name = (
        F.concat_ws("_", F.col(tcol).cast("string"), F.col(bcol))
        if tcol
        else F.col(bcol)
    )
    long = training_cube.df.select(
        F.col(geom).alias("geometry_id"),
        F.col(target).alias("target"),
        feat_name.alias("feature"),
        F.col(training_cube.value_col).alias("value"),
    )
    feature_names = list(
        long.agg(
            F.slice(
                F.sort_array(F.collect_set("feature")), 1, max_features + 1
            ).alias("f")
        ).collect()[0]["f"]
    )
    if len(feature_names) > max_features:
        raise ValueError(
            f"ml_fit pivot width exceeds max_features={max_features} "
            f"distinct (time, band) feature columns; reduce the cube "
            "(filter_bands / aggregate_temporal_period) or raise the "
            "cap explicitly"
        )
    wide = (
        long.groupBy("geometry_id", "target")
        .pivot("feature", feature_names)
        .agg(F.first("value"))
    )
    feats = F.array(*[F.coalesce(F.col(f"`{f}`"), F.lit(0.0)) for f in feature_names])
    table = wide.select(feats.alias("features_arr"), F.col("target"))
    fitted = fit_on_features(rf, table, "features_arr", "target")
    # metadata backfill (reference ml_fit.py:35-84)
    props = fitted.descriptor.item["properties"]
    props["mlm:input"][0]["bands"] = feature_names
    props["mlm:input"][0]["input"]["shape"] = [-1, len(feature_names)]
    props["mlm:output"][0]["name"] = target
    fitted.descriptor.input = ModelInput.parse(props["mlm:input"][0])
    return fitted


def ml_predict(
    rf: RfClassModel,
    df: DataFrame,
    feature_col: str = "embedding",
    out_col: str = "prediction",
) -> DataFrame:
    """Predict: guard pretrained (reference ml_predict.py:7-15), then a
    narrow transform; the numeric class index maps back to the original
    label through a broadcast-sized literal map."""
    if not rf.pretrained or rf.model is None:
        raise ValueError("ml_predict requires a trained model (pretrained=True)")
    prepared = df.withColumn(
        "features",
        array_to_vector(F.transform(F.col(feature_col), lambda x: x.cast("double"))),
    )
    pred = rf.model.transform(prepared)
    idx_to_label = F.create_map(
        *[
            F.lit(x)
            for i, lab in enumerate(rf.labels)
            for x in (float(i + 1), lab)
        ]
    )
    keep = [c for c in df.columns]
    return pred.select(*keep, idx_to_label[F.col("prediction")].alias(out_col))


def save_ml_model(rf: RfClassModel, path: str) -> str:
    """Persist weights + STAC-MLM sidecar (reference
    save_ml_model.py:6-13, data_model.py:1273-1302)."""
    if not rf.pretrained or rf.model is None:
        raise ValueError("save_ml_model requires a trained model")
    os.makedirs(path, exist_ok=True)
    rf.model.write().overwrite().save(os.path.join(path, "model"))
    sidecar = copy.deepcopy(rf.descriptor.item)
    sidecar["assets"]["model"] = {
        "href": os.path.join(path, "model"),
        "roles": ["mlm:model"],
        "mlm_artifact:labels": rf.labels,
    }
    with open(os.path.join(path, "mlm_item.json"), "w") as f:
        json.dump(sidecar, f, indent=2, default=str)
    return path


def load_ml_model(path: str) -> RfClassModel:
    with open(os.path.join(path, "mlm_item.json")) as f:
        item = json.load(f)
    props = item["properties"]
    hyper = props.get("mlm:hyperparameters", {})
    descriptor = MLModelDescriptor(
        item=item,
        input=ModelInput.parse(props["mlm:input"][0]),
        output=ModelOutput.parse(props["mlm:output"][0]),
        framework="spark-mllib",
        pretrained=props.get("mlm:pretrained", True),
        batch_size_suggestion=props.get("mlm:batch_size_suggestion"),
    )
    model = RandomForestClassificationModel.load(os.path.join(path, "model"))
    return RfClassModel(
        descriptor=descriptor,
        num_trees=hyper.get("num_trees", 100),
        max_variables=hyper.get("max_variables", "sqrt"),
        seed=hyper.get("seed"),
        model=model,
        labels=item["assets"]["model"].get("mlm_artifact:labels", []),
    )
