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
