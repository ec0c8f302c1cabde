"""Executor-local model loading (§2.3) + EPSG discovery (§1.2)."""

import pickle

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.ml.executors import (
    _MODEL_CACHE,
    make_expression_predictor,
    make_pickle_predictor,
    make_torch_predictor,
)
from openeo_processes_dask_ml_spark.utils.epsg import discover_epsg, parse_epsg, write_epsg


class _ToyModel:
    """Stand-in estimator with a predict method (sklearn-shaped)."""

    def __init__(self, offset: float):
        self.offset = offset
        self.load_count = 0

    def predict(self, batch):
        return np.asarray(batch).sum(axis=-1) + self.offset


def test_pickle_predictor_loads_once(tmp_path):
    path = str(tmp_path / "model.pkl")
    with open(path, "wb") as f:
        pickle.dump(_ToyModel(10.0), f)
    _MODEL_CACHE.clear()
    predict = make_pickle_predictor(path)
    out1 = predict(np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert out1.tolist() == [13.0, 17.0]
    cached = _MODEL_CACHE[f"pickle:{path}"]
    predict(np.array([[0.0, 0.0]]))
    # same instance reused, not re-unpickled
    assert _MODEL_CACHE[f"pickle:{path}"] is cached


def test_pickle_predictor_in_map_in_pandas(spark, tmp_path):
    """The full Spark path: broadcastable closure, Arrow batches.

    The artifact must unpickle on python workers, so it references
    importable symbols only (functools.partial of a numpy function) —
    exactly how a real staged estimator behaves."""
    import functools

    from openeo_processes_dask_ml_spark.ml.inference import sklearn_fast_path

    path = str(tmp_path / "model.pkl")
    with open(path, "wb") as f:
        pickle.dump(functools.partial(np.sum, axis=1), f)
    df = spark.createDataFrame(
        [(i, [float(i), float(i)]) for i in range(20)], ["id", "f"]
    )
    out = sklearn_fast_path(df, "f", make_pickle_predictor(path, method=""), out_col="p")
    got = {r["id"]: r["p"] for r in out.collect()}
    assert got[3] == 6.0 and got[0] == 0.0


def test_torch_predictor_raises_without_torch(tmp_path):
    predict = make_torch_predictor(str(tmp_path / "m.pt"))
    with pytest.raises(ImportError):
        predict(np.zeros((1, 2)))


def test_expression_predictor():
    predict = make_expression_predictor("python", "numpy:abs")
    assert predict(np.array([-1.0, 2.0])).tolist() == [1.0, 2.0]


# --- EPSG ----------------------------------------------------------------


@pytest.mark.parametrize(
    "value,expected",
    [
        (25832, 25832),
        ("epsg:25832", 25832),
        ("EPSG:4326", 4326),
        ("4326", 4326),
        ("utm33", None),
        (None, None),
        ({"epsg": 3857}, 3857),
    ],
)
def test_parse_epsg(value, expected):
    assert parse_epsg(value) == expected


def test_discover_epsg_order_and_write():
    assert discover_epsg({"crs": "epsg:4326"}) == 4326
    assert discover_epsg({"epsg": 25832, "crs": "epsg:4326"}) == 25832
    assert discover_epsg({"spec": {"epsg": 3857}}) == 3857
    assert discover_epsg({}) is None
    out = write_epsg({"a": 1}, 4326)
    assert out == {"a": 1, "epsg": 4326}


def test_cube_attrs_carry_crs(spark):
    """CRS metadata survives cube transforms (reference re-attaches it
    at data_model.py:1252-1266; here it rides CubeFrame.attrs)."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["band", "value"])
    cube = CubeFrame(df, {"bands": "band"}, "value", attrs={"epsg": 25832})
    out = cube.apply(lambda c: c * 2).reduce_dimension("bands", "sum")
    assert discover_epsg(out.attrs) == 25832
