"""Vendored STAC-MLM jsonschema validation (mlm/schema.py) — the
offline analog of the reference's hosted-schema validation
(load_model.py:36, init_models.py:240): invalid items raise with JSON
pointers, the engine's own synthesized RF item validates, and a
TerraMind-SHAPED fixture (12-band, [-1,12,224,224], per-band z-score
scaling — rebuilt from the public STAC-MLM spec, not copied from any
repository) passes load_stac_ml + validate_cube."""

import copy

import pytest

from openeo_processes_dask_ml_spark.mlm.descriptor import (
    load_stac_ml,
    validate_cube,
)
from openeo_processes_dask_ml_spark.mlm.schema import validate_mlm_item


def _valid_item():
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [
            "https://stac-extensions.github.io/mlm/v1.4.0/schema.json"
        ],
        "id": "m1",
        "properties": {
            "mlm:name": "m1",
            "mlm:architecture": "CNN",
            "mlm:tasks": ["classification"],
            "mlm:framework": "pytorch",
            "mlm:input": [
                {
                    "name": "in",
                    "bands": ["red", "nir"],
                    "input": {
                        "shape": [-1, 2, 8, 8],
                        "dim_order": ["batch", "bands", "x", "y"],
                        "data_type": "float32",
                    },
                }
            ],
            "mlm:output": [
                {
                    "name": "out",
                    "tasks": ["classification"],
                    "result": {
                        "shape": [-1, 1],
                        "dim_order": ["batch", "class"],
                        "data_type": "int32",
                    },
                }
            ],
        },
        "assets": {},
    }


def test_valid_item_passes():
    validate_mlm_item(_valid_item())  # no raise


def test_synthesized_rf_item_passes_schema():
    from openeo_processes_dask_ml_spark.ml.random_forest import (
        mlm_class_random_forest,
    )

    rf = mlm_class_random_forest(num_trees=5, seed=1)
    validate_mlm_item(rf.descriptor.item)  # no raise


def test_missing_required_property_raises_with_pointer():
    item = _valid_item()
    del item["properties"]["mlm:architecture"]
    with pytest.raises(ValueError, match=r"/properties.*mlm:architecture"):
        validate_mlm_item(item)


def test_bad_data_type_and_shape_report_all_violations_with_pointers():
    item = _valid_item()
    item["properties"]["mlm:input"][0]["input"]["data_type"] = "float99"
    item["properties"]["mlm:input"][0]["input"]["shape"] = [-2, 2]
    with pytest.raises(ValueError) as exc:
        validate_mlm_item(item)
    msg = str(exc.value)
    assert "2 violation(s)" in msg
    assert "/properties/mlm:input/0/input/data_type" in msg
    assert "/properties/mlm:input/0/input/shape/0" in msg


def test_processing_expression_requires_both_fields():
    item = _valid_item()
    item["properties"]["mlm:input"][0]["pre_processing_function"] = {
        "format": "python"  # no expression
    }
    with pytest.raises(ValueError, match="pre_processing_function"):
        validate_mlm_item(item)


def test_band_object_format_without_expression_rejected():
    item = _valid_item()
    item["properties"]["mlm:input"][0]["bands"] = [
        {"name": "ndvi", "format": "python"}  # expression missing
    ]
    with pytest.raises(ValueError, match="bands/0"):
        validate_mlm_item(item)


def test_empty_tasks_rejected():
    item = _valid_item()
    item["properties"]["mlm:tasks"] = []
    with pytest.raises(ValueError, match="mlm:tasks"):
        validate_mlm_item(item)


def test_load_stac_ml_runs_schema_validation_and_can_skip():
    item = _valid_item()
    bad = copy.deepcopy(item)
    del bad["properties"]["mlm:name"]
    with pytest.raises(ValueError, match="schema validation"):
        load_stac_ml(bad)
    # skip switch: the structural checks still run, schema pass doesn't
    d = load_stac_ml(bad, validate_schema=False)
    assert d.framework == "pytorch"


def _terramind_shaped_item():
    """A TerraMind-SHAPED fixture rebuilt from the public STAC-MLM
    spec + the public TerraMind model card facts (12 Sentinel-2 L2A
    bands, 224x224 input tiles, per-band standardization): 12-band
    input [-1, 12, 224, 224], per-band z-score value_scaling. Values
    are synthetic; nothing is copied from any repository fixture."""
    bands = [
        "B01", "B02", "B03", "B04", "B05", "B06",
        "B07", "B08", "B8A", "B09", "B11", "B12",
    ]
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [
            "https://stac-extensions.github.io/mlm/v1.4.0/schema.json"
        ],
        "id": "terramind-shaped",
        "properties": {
            "mlm:name": "terramind-shaped",
            "mlm:architecture": "ViT",
            "mlm:tasks": ["generative"],
            "mlm:framework": "pytorch",
            "mlm:pretrained": True,
            "mlm:input": [
                {
                    "name": "S2L2A",
                    "bands": bands,
                    "input": {
                        "shape": [-1, 12, 224, 224],
                        "dim_order": ["batch", "channel", "height", "width"],
                        "data_type": "float32",
                    },
                    "value_scaling": [
                        {
                            "type": "z-score",
                            "mean": 1000.0 + 10.0 * i,
                            "stddev": 500.0 + i,
                        }
                        for i in range(12)
                    ],
                }
            ],
            "mlm:output": [
                {
                    "name": "embedding",
                    "tasks": ["generative"],
                    "result": {
                        "shape": [-1, 768],
                        "dim_order": ["batch", "embedding"],
                        "data_type": "float32",
                    },
                }
            ],
        },
        "assets": {
            "model": {
                "href": "file:///weights.pt",
                "roles": ["mlm:model"],
            }
        },
    }


def test_terramind_shaped_item_loads_and_validates_cube():
    item = _terramind_shaped_item()
    validate_mlm_item(item)  # schema pass
    d = load_stac_ml(item)
    assert d.input.shape == [-1, 12, 224, 224]
    assert len(d.input.value_scaling) == 12
    assert d.input.value_scaling[3].kind == "z-score"
    # a cube that covers the model tile on every dim, with alias-
    # resolvable band labels (provider-style lowercase + resolution)
    cube_bands = [b.lower() + "_10m" for b in
                  ["B01", "B02", "B03", "B04", "B05", "B06",
                   "B07", "B08", "B8A", "B09", "B11", "B12"]]
    mapping = validate_cube(
        d,
        cube_dims=["x", "y", "bands"],
        cube_sizes={"x": 224, "y": 448, "bands": 12},
        cube_bands=cube_bands,
    )
    assert len(mapping) == 12 and mapping["B8A"] == "b8a_10m"
    # under-sized spatial extent fails check #2
    with pytest.raises(ValueError, match="< model input"):
        validate_cube(
            d,
            cube_dims=["x", "y", "bands"],
            cube_sizes={"x": 100, "y": 448, "bands": 12},
            cube_bands=cube_bands,
        )
