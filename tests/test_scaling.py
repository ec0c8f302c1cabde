"""Value-scaling parity with the reference's exact-value fixture
(tests/utils/test_model_scaling_utils.py:14-56): cube (t, bands) =
(2, 2), values [[2,4],[6,10]], all 7 scaling kinds + the
required-property validation matrix."""

import pytest

from openeo_processes_dask_ml_spark.utils.scaling import (
    SCALING_REQUIRED_PROPS,
    ValueScaling,
    apply_scaling,
)

try:
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


@pytest.fixture(scope="module")
def unit_cube(spark):
    return spark.createDataFrame(
        [("t1", "red", 2.0), ("t1", "green", 4.0), ("t2", "red", 6.0), ("t2", "green", 10.0)],
        ["t", "band", "value"],
    )


def _apply(df, scaling):
    rows = df.withColumn("out", scaling.expr(F.col("value"))).orderBy("t", "band").collect()
    return [r["out"] for r in rows]


def test_min_max(unit_cube):
    # (v - 2) / (10 - 2): ordered (t1,green)(t1,red)(t2,green)(t2,red)
    out = _apply(unit_cube, ValueScaling(kind="min-max", minimum=2, maximum=10))
    assert out == [0.25, 0.0, 1.0, 0.5]


def test_z_score(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="z-score", mean=5.5, stddev=3.0))
    assert out == pytest.approx([-0.5, -7 / 6, 1.5, 1 / 6])


def test_clip(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="clip", minimum=3, maximum=7))
    assert out == [4.0, 3.0, 7.0, 6.0]


def test_clip_min(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="clip-min", minimum=5))
    assert out == [5.0, 5.0, 10.0, 6.0]


def test_clip_max(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="clip-max", maximum=5))
    assert out == [4.0, 2.0, 5.0, 5.0]


def test_offset(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="offset", value=1))
    assert out == [3.0, 1.0, 9.0, 5.0]


def test_scale(unit_cube):
    out = _apply(unit_cube, ValueScaling(kind="scale", value=2))
    assert out == [2.0, 1.0, 5.0, 3.0]


def test_chain(unit_cube):
    chained = apply_scaling(
        F.col("value"),
        [ValueScaling(kind="offset", value=2), ValueScaling(kind="scale", value=2)],
    )
    rows = unit_cube.withColumn("out", chained).orderBy("t", "band").collect()
    assert [r["out"] for r in rows] == [1.0, 0.0, 4.0, 2.0]


@pytest.mark.parametrize("kind,required", sorted(SCALING_REQUIRED_PROPS.items()))
def test_required_props_matrix(kind, required):
    if kind == "processing":
        return  # not a Column transform
    missing = ValueScaling(kind=kind)
    with pytest.raises(ValueError, match="missing properties"):
        missing.validate()


def test_unknown_kind_rejected():
    with pytest.raises(ValueError, match="unknown scaling type"):
        ValueScaling(kind="nope").validate()


def test_processing_not_implemented(unit_cube):
    s = ValueScaling(kind="processing")
    object.__setattr__(s, "kind", "processing")
    with pytest.raises(ValueError):
        s.expr(F.col("value"))
