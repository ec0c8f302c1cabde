"""fit_curve / predict_curve — closed-form least squares on CubeFrame."""

import math

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.operators.curve import (
    fit_curve,
    harmonic_basis,
    polynomial_basis,
    predict_curve,
)


def _harmonic_rows(a0, a1, a2, band, n=24, period=24.0):
    w = 2.0 * math.pi / period
    return [
        (band, float(t), a0 + a1 * math.cos(w * t) + a2 * math.sin(w * t))
        for t in range(n)
    ]


def test_fit_curve_recovers_noiseless_harmonic(spark):
    rows = _harmonic_rows(2.0, 3.0, -1.0, "a") + _harmonic_rows(5.0, 0.5, 2.0, "b")
    df = spark.createDataFrame(rows, ["band", "t", "value"])
    cube = CubeFrame(df, {"bands": "band", "time": "t"}, "value")
    fitted = fit_curve(cube, "time", lambda c: c, harmonic_basis(24.0))
    got = {r["band"]: (r["a0"], r["a1"], r["a2"]) for r in fitted.df.collect()}
    for band, expect in {"a": (2.0, 3.0, -1.0), "b": (5.0, 0.5, 2.0)}.items():
        for g, e in zip(got[band], expect):
            assert abs(g - e) < 1e-9, (band, got[band])


def test_fit_curve_polynomial_and_validation(spark):
    # y = 1 + 2t exactly -> degree-1 fit recovers [1, 2]
    rows = [("p", float(t), 1.0 + 2.0 * t) for t in range(5)]
    df = spark.createDataFrame(rows, ["band", "t", "value"])
    cube = CubeFrame(df, {"bands": "band", "time": "t"}, "value")
    [r] = fit_curve(cube, "time", lambda c: c, polynomial_basis(1)).df.collect()
    assert abs(r["a0"] - 1.0) < 1e-9 and abs(r["a1"] - 2.0) < 1e-9
    with pytest.raises(ValueError, match="k in 1..3"):
        fit_curve(cube, "time", lambda c: c, [lambda t: F.lit(1.0)] * 4)
    with pytest.raises(ValueError, match="degree"):
        polynomial_basis(3)


def test_fit_curve_degenerate_series_yields_null(spark):
    # a single sample cannot determine 3 parameters: det == 0 -> NULLs
    df = spark.createDataFrame([("z", 0.0, 7.0)], ["band", "t", "value"])
    cube = CubeFrame(df, {"bands": "band", "time": "t"}, "value")
    [r] = fit_curve(cube, "time", lambda c: c, harmonic_basis(24.0)).df.collect()
    assert r["a0"] is None and r["a1"] is None and r["a2"] is None


def test_predict_curve_roundtrip(spark):
    rows = _harmonic_rows(2.0, 3.0, -1.0, "a")
    df = spark.createDataFrame(rows, ["band", "t", "value"])
    cube = CubeFrame(df, {"bands": "band", "time": "t"}, "value")
    basis = harmonic_basis(24.0)
    fitted = fit_curve(cube, "time", lambda c: c, basis)
    labels = spark.range(24).select(F.col("id").cast("double").alias("t"))
    pred = predict_curve(fitted, labels, "t", lambda c: c, basis)
    got = {r["t"]: r["value"] for r in pred.df.collect()}
    for band, t, expect in rows:
        assert abs(got[t] - expect) < 1e-9
