"""Derived-band expressions (ModelBand.expression): grammar, validation,
and end-to-end tiled inference with a computed band — the capability the
reference declares but leaves todo (data_model.py:362-367)."""

from datetime import datetime

import pytest

from openeo_processes_dask_ml_spark.mlm.band_expr import (
    BandExpressionError,
    parse_band_expression,
    referenced_bands,
)
from openeo_processes_dask_ml_spark.mlm.descriptor import (
    MLModelDescriptor,
    ModelInput,
    ModelOutput,
    check_bands_available,
)


def _descriptor(bands, n_bands):
    return MLModelDescriptor(
        item={"id": "t"},
        input=ModelInput.parse(
            {
                "bands": bands,
                "input": {
                    "shape": [-1, n_bands, 2, 2],
                    "dim_order": ["batch", "bands", "x", "y"],
                    "data_type": "float64",
                },
            }
        ),
        output=ModelOutput.parse(
            {"result": {"shape": [-1, 2, 2], "dim_order": ["batch", "x", "y"]}}
        ),
        framework="fake",
        batch_size_suggestion=4,
    )


def test_referenced_bands_order_and_dedup():
    assert referenced_bands("(B08 - B04) / (B08 + B04)") == ["B08", "B04"]
    assert referenced_bands("sqrt(abs(swir16)) * 2.5") == ["swir16"]


def test_parse_rejects_non_arithmetic():
    with pytest.raises(BandExpressionError):
        parse_band_expression("__import__('os').system('x')")
    with pytest.raises(BandExpressionError):
        parse_band_expression("b04[0]")
    with pytest.raises(BandExpressionError):
        parse_band_expression("lambda: 1")
    with pytest.raises(BandExpressionError):
        parse_band_expression("'red'")


def test_check_bands_one_of_format_expression_raises():
    desc = _descriptor(
        [{"name": "NDVI", "expression": "(B08-B04)/(B08+B04)"}, "red"], 2
    )
    with pytest.raises(ValueError, match="both required"):
        check_bands_available(desc, ["red", "nir"])


def test_check_bands_missing_reference_raises():
    desc = _descriptor(
        [
            {
                "name": "X",
                "format": "rio-calc",
                "expression": "(B08-B11)/(B08+B11)",
            },
            "red",
        ],
        2,
    )
    with pytest.raises(ValueError, match="references bands"):
        # cube has no swir16/B11
        check_bands_available(desc, ["red", "nir"])


def test_check_bands_direct_band_wins_over_expression():
    """Reference data_model.py:340-343: a band already in the cube is
    used directly even when it declares an expression."""
    desc = _descriptor(
        [
            {"name": "NDVI", "format": "rio-calc", "expression": "bogus ["},
            "red",
        ],
        2,
    )
    # NDVI present directly -> the (invalid) expression is never parsed
    mapping = check_bands_available(desc, ["red", "nir", "NDVI"])
    assert mapping["NDVI"] == "NDVI"


def test_run_model_tiled_with_derived_band(spark):
    """End-to-end: NDVI computed from alias-resolved refs (B08==nir,
    B04==red) feeds the model as a first-class band."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.ml.inference import run_model_tiled

    rows = []
    for b, fn in [("red", lambda v: v), ("nir", lambda v: 2 * v + 1)]:
        for xi in range(2):
            for yi in range(2):
                v = float(xi * 2 + yi)
                rows.append(
                    (datetime(2024, 1, 1), b, float(xi), float(yi), fn(v))
                )
    cube = CubeFrame(
        spark.createDataFrame(rows, ["time", "band", "x", "y", "value"]),
        {"time": "time", "bands": "band", "x": "x", "y": "y"},
        "value",
    )
    desc = _descriptor(
        [
            {
                "name": "NDVI",
                "format": "rio-calc",
                "expression": "(B08 - B04) / (B08 + B04)",
            },
            "red",
        ],
        2,
    )
    # model returns its first band (the derived NDVI) untouched
    out = run_model_tiled(cube, desc, lambda b: b[:, 0])
    got = {(r["x"], r["y"]): r["value"] for r in out.collect()}
    for xi in range(2):
        for yi in range(2):
            v = float(xi * 2 + yi)
            nir, red = 2 * v + 1, v
            assert got[(float(xi), float(yi))] == pytest.approx(
                (nir - red) / (nir + red)
            )
