"""ViT-encoder output post-processors — numpy ports of the functions
the reference ships for MLM items (reference
ml_datacube_bridge/output_preprocessing_functions/torch_vit_encoder_tools.py:6-100),
referenced BY NAME from real MLM items (e.g.
examples/mlm_items/terramind_item.json `mlm:output[*].post_processing_function`).

Addressable from a ProcessingExpression as
``openeo_processes_dask_ml_spark.ml.vit_tools:<fn>`` — the package is on
the expression allowlist, and the callables run executor-side inside the
inference UDF on the raw model output (a list of per-layer
``(batch, patches, embedding_dim)`` arrays).

Shape contract (matches the reference): a ``(B, P², E)`` layer output
reorders to ``(B, √P², √P², E)``; multilevel variants stack the layer
axis second: ``(B, L, √P², √P², E)``.
"""

from __future__ import annotations

from math import sqrt

import numpy as np


def _derive_image_information(tensor: np.ndarray) -> tuple[int, int, int]:
    """(samples_per_batch, patches_per_side, embedding_dim) — raises if
    the patch count is not a perfect square (reference :6-24)."""
    samples_per_batch, num_patches, embedding_dim = tensor.shape
    patches_per_side = sqrt(num_patches)
    if patches_per_side % 1 != 0:
        raise ValueError(
            "Postprocessing Error: Cannot arrange the model output patches "
            "into an n*n raster. If the model output includes a CLS token, "
            "use the with-CLS variant instead."
        )
    return samples_per_batch, int(patches_per_side), embedding_dim


def _reorder_patch_embeddings(embedding_tensor: np.ndarray) -> np.ndarray:
    samples_per_batch, patches_per_side, embedding_dim = _derive_image_information(
        embedding_tensor
    )
    return np.reshape(
        embedding_tensor,
        (samples_per_batch, patches_per_side, patches_per_side, embedding_dim),
    )


def get_featuremap_without_cls(t: list) -> np.ndarray:
    """Last layer's featuremap as a (B, s, s, E) raster; the output
    carries no CLS token (reference :35-42)."""
    return _reorder_patch_embeddings(np.asarray(t[-1]))


def get_featuremap_with_cls(t: list) -> np.ndarray:
    """Last layer's featuremap with the leading CLS token stripped
    before the raster reshape (reference :45-52)."""
    return _reorder_patch_embeddings(np.asarray(t[-1])[:, 1:, :])


def get_featuremap_without_cls_multilevel(t: list) -> np.ndarray:
    """Every layer's featuremap stacked on axis 1:
    (B, L, s, s, E) (reference :55-74)."""
    layers = [np.asarray(x) for x in t]
    samples_per_batch, patches_per_side, embedding_dim = _derive_image_information(
        layers[0]
    )
    out_shape = (
        samples_per_batch,
        len(layers),
        patches_per_side,
        patches_per_side,
        embedding_dim,
    )
    return np.reshape(np.stack(layers, axis=1), out_shape)


def get_image_cls_embedding_prepended(t: list) -> np.ndarray:
    """CLS embedding per sample, CLS at index 0 -> (B, E)
    (reference :77-85)."""
    return np.asarray(t[-1])[:, 0, :]


def get_image_cls_embedding_appended(t: list) -> np.ndarray:
    """CLS embedding per sample, CLS at index -1 -> (B, E)
    (reference :88-96)."""
    return np.asarray(t[-1])[:, -1, :]


# torch-named aliases so MLM items written against the reference's
# function names resolve unchanged
get_image_cls_embedding_prepended_torch = get_image_cls_embedding_prepended
get_image_cls_embedding_appended_torch = get_image_cls_embedding_appended


def patch_embeddings_multilevel(t: list) -> np.ndarray:
    """All layer outputs stacked on axis 1 without reshaping:
    (B, L, P, E) (reference :99-100)."""
    return np.stack([np.asarray(x) for x in t], axis=1)
