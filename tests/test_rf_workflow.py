"""End-to-end RF workflow parity (reference
tests/test_rf_class_workflow.py:92-251): init -> ml_fit -> ml_predict,
asserting the metadata rewrites (bands/shape backfill, pretrained
flip), 1-based labels, and prediction output shape; plus the
save/load round-trip (save_ml_model + load_stac_ml analog)."""

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.ml.random_forest import (
    fit_on_features,
    load_ml_model,
    ml_fit,
    ml_predict,
    mlm_class_random_forest,
    save_ml_model,
)


def test_init_builds_untrained_descriptor():
    rf = mlm_class_random_forest(max_variables="sqrt", num_trees=10, seed=1)
    assert not rf.pretrained
    props = rf.descriptor.item["properties"]
    assert props["mlm:framework"] == "spark-mllib"
    assert props["mlm:hyperparameters"]["num_trees"] == 10
    assert rf.descriptor.batch_size_suggestion == 1  # reference init_models.py:58


def test_init_rejects_bad_max_variables():
    with pytest.raises(ValueError, match="max_variables"):
        mlm_class_random_forest(max_variables="bogus")


@pytest.fixture(scope="module")
def training_cube(spark):
    """Vector cube (geometry, time, bands) = (60, 2, 3) with class_name
    in {a, b, c}; feature values separate the classes linearly."""
    from datetime import datetime

    rng = np.random.RandomState(42)
    rows = []
    for g in range(60):
        cls = "abc"[g % 3]
        offset = {"a": 0.0, "b": 5.0, "c": 10.0}[cls]
        for t in ["2024-01-01", "2024-02-01"]:
            for b in ["B0", "B1", "B2"]:
                rows.append(
                    (g, cls, datetime.strptime(t, "%Y-%m-%d"), b, float(offset + rng.rand()))
                )
    df = spark.createDataFrame(
        rows, ["geometry_id", "class_name", "time", "band", "value"]
    )
    return CubeFrame(
        df,
        {"geometry": "geometry_id", "time": "time", "bands": "band"},
        "value",
    )


def test_ml_fit_metadata_and_predict(spark, training_cube, tmp_path):
    rf = mlm_class_random_forest(max_variables="sqrt", num_trees=15, seed=7)
    fitted = ml_fit(rf, training_cube, target="class_name")

    # copy-on-train: original untouched, fitted flipped
    assert not rf.pretrained
    assert fitted.pretrained
    # metadata backfill (reference ml_fit.py:35-84): compound
    # "<time>_<band>" feature names and matching input shape
    bands = fitted.descriptor.item["properties"]["mlm:input"][0]["bands"]
    assert len(bands) == 6 and all("_B" in b for b in bands)
    assert fitted.descriptor.input.shape == [-1, 6]
    assert fitted.descriptor.item["properties"]["mlm:output"][0]["name"] == "class_name"
    # 1-based deterministic label table (scikit_learn_model.py:171-175)
    assert fitted.labels == ["a", "b", "c"]
    # validation metrics exist
    assert 0.0 <= fitted.metrics["accuracy"] <= 1.0
    assert "kappa" in fitted.metrics

    # predict on a features table and check labels round-trip
    feats = spark.createDataFrame(
        [(0, [0.1] * 6), (1, [5.1] * 6), (2, [10.2] * 6)], ["id", "f"]
    )
    pred = ml_predict(fitted, feats, feature_col="f", out_col="prediction")
    out = {r["id"]: r["prediction"] for r in pred.collect()}
    assert out == {0: "a", 1: "b", 2: "c"}

    # save / load round-trip with MLM sidecar
    path = str(tmp_path / "rf_model")
    save_ml_model(fitted, path)
    loaded = load_ml_model(path)
    assert loaded.pretrained
    assert loaded.labels == ["a", "b", "c"]
    pred2 = ml_predict(loaded, feats, feature_col="f", out_col="prediction")
    assert {r["id"]: r["prediction"] for r in pred2.collect()} == out


def test_predict_requires_pretrained(spark):
    rf = mlm_class_random_forest(num_trees=5)
    feats = spark.createDataFrame([(0, [0.0] * 3)], ["id", "f"])
    with pytest.raises(ValueError, match="pretrained"):
        ml_predict(rf, feats, feature_col="f")


def test_fit_on_features_is_seed_deterministic(spark):
    rng = np.random.RandomState(0)
    df = spark.createDataFrame(
        [
            (i, [float(v) for v in rng.rand(4) + (i % 2) * 3], i % 2)
            for i in range(80)
        ],
        ["vec_id", "embedding", "label"],
    )
    rf = mlm_class_random_forest(num_trees=10, seed=42)
    f1 = fit_on_features(rf, df, "embedding", "label")
    f2 = fit_on_features(rf, df, "embedding", "label")
    p1 = [r["p"] for r in ml_predict(f1, df, out_col="p").orderBy("vec_id").collect()]
    p2 = [r["p"] for r in ml_predict(f2, df, out_col="p").orderBy("vec_id").collect()]
    assert p1 == p2


def test_per_class_report_hand_computed(spark):
    """Per-class precision/recall/F1 parity with the reference's
    classification_report (scikit_learn_model.py:193-207), asserted
    against a hand-computed confusion fixture:
        true=1: pred 1 x3, pred 2 x1      true=2: pred 2 x2, pred 1 x1
        true=3: pred 3 x1, pred 1 x1
    """
    from openeo_processes_dask_ml_spark.ml.random_forest import (
        _metrics_from_confusion,
    )

    pairs = (
        [(1.0, 1.0)] * 3
        + [(1.0, 2.0)]
        + [(2.0, 2.0)] * 2
        + [(2.0, 1.0)]
        + [(3.0, 3.0), (3.0, 1.0)]
    )
    pred = spark.createDataFrame(pairs, "label_idx double, prediction double")
    m = _metrics_from_confusion(pred, "label_idx", "prediction")
    assert m["n_valid"] == 9
    assert m["accuracy"] == pytest.approx(6 / 9)
    assert m["kappa"] == pytest.approx(23 / 50)  # (6/9 - 31/81)/(1 - 31/81)
    pc = m["per_class"]
    assert pc[1.0]["precision"] == pytest.approx(3 / 5)
    assert pc[1.0]["recall"] == pytest.approx(3 / 4)
    assert pc[1.0]["f1"] == pytest.approx(2 / 3)
    assert pc[1.0]["support"] == 4
    assert pc[2.0] == {
        "precision": pytest.approx(2 / 3),
        "recall": pytest.approx(2 / 3),
        "f1": pytest.approx(2 / 3),
        "support": 3,
    }
    assert pc[3.0]["precision"] == 1.0
    assert pc[3.0]["recall"] == 0.5
    assert pc[3.0]["support"] == 2
    assert m["macro_avg"]["precision"] == pytest.approx((0.6 + 2 / 3 + 1) / 3)
    assert m["weighted_avg"]["precision"] == pytest.approx(6.4 / 9)
    # sklearn conventions when a class is only ever PREDICTED:
    # it appears with support 0 and recall 0
    pred2 = spark.createDataFrame(
        pairs + [(2.0, 4.0)], "label_idx double, prediction double"
    )
    m2 = _metrics_from_confusion(pred2, "label_idx", "prediction")
    assert m2["per_class"][4.0] == {
        "precision": 0.0,
        "recall": 0.0,
        "f1": 0.0,
        "support": 0,
    }
    # empty validation split degrades gracefully
    empty = spark.createDataFrame([], "label_idx double, prediction double")
    m3 = _metrics_from_confusion(empty, "label_idx", "prediction")
    assert m3 == {"accuracy": 0.0, "kappa": 0.0, "n_valid": 0, "per_class": {}}


def test_fit_metrics_include_per_class_by_label_name(spark, training_cube):
    rf = mlm_class_random_forest(max_variables="sqrt", num_trees=15, seed=7)
    from openeo_processes_dask_ml_spark.ml.random_forest import ml_fit as _fit

    fitted = _fit(rf, training_cube, target="class_name")
    pc = fitted.metrics["per_class"]
    assert set(pc) <= {"a", "b", "c"} and pc  # keyed by label NAME
    for v in pc.values():
        assert 0.0 <= v["precision"] <= 1.0 and 0.0 <= v["f1"] <= 1.0
    assert "macro_avg" in fitted.metrics and "weighted_avg" in fitted.metrics


def test_ml_fit_pivot_width_cap(spark, training_cube):
    """Over-cap pivot width raises with guidance (same posture as the
    inference axis cap); the gate path is unaffected at default cap."""
    rf = mlm_class_random_forest(max_variables="sqrt", num_trees=5, seed=1)
    with pytest.raises(ValueError, match="max_features=3"):
        ml_fit(rf, training_cube, target="class_name", max_features=3)
