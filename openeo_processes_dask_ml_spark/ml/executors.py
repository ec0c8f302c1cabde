"""Executor-side model loading for the inference harness.

The reference runs models out-of-process: weights re-loaded per
subprocess invocation, one OS process per GPU, files sharded
round-robin (reference: model_execution/run_pytorch_model.py:52-132,
run_sklearn_model.py:30-76). In Spark the equivalent is an
executor-local singleton: the predictor factory returns a picklable
closure that lazily loads the artifact ONCE per python worker (keyed by
path) and reuses it across Arrow batches. GPU placement is the cluster
manager's job (``spark.task.resource.gpu.amount``), not ours.

torch is optional — the factory raises a clear error if the runtime
lacks it (this container does), but the harness plumbing is identical
for any framework.
"""

from __future__ import annotations

import pickle
from collections.abc import Callable

import numpy as np

# process-wide model cache: one entry per artifact per python worker
_MODEL_CACHE: dict[str, object] = {}


def _load_once(key: str, loader: Callable[[], object]) -> object:
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = loader()
        _MODEL_CACHE[key] = model
    return model


def make_pickle_predictor(
    artifact_path: str, method: str = "predict"
) -> Callable[[np.ndarray], np.ndarray]:
    """Predictor for a pickled estimator (the reference's sklearn loop,
    run_sklearn_model.py:30-76): unpickle once per worker, call
    ``method`` per batch."""

    def predict(batch: np.ndarray) -> np.ndarray:
        def loader():
            with open(artifact_path, "rb") as f:
                return pickle.load(f)  # noqa: S301 — trusted staged artifact

        model = _load_once(f"pickle:{artifact_path}", loader)
        fn = getattr(model, method) if method else model
        return np.asarray(fn(batch))

    return predict


def make_torch_predictor(
    artifact_path: str, device: str = "cpu"
) -> Callable[[np.ndarray], np.ndarray]:
    """Predictor for a TorchScript artifact (the reference's torch loop,
    run_pytorch_model.py:52-75): jit.load once per worker, eval mode,
    no_grad per batch. Raises ImportError where torch is unavailable."""

    def predict(batch: np.ndarray) -> np.ndarray:
        import torch  # deferred: not present in every runtime

        def loader():
            model = torch.jit.load(artifact_path, map_location=device)
            model.eval()
            return model

        model = _load_once(f"torch:{artifact_path}:{device}", loader)
        with torch.no_grad():
            out = model(torch.from_numpy(batch).to(device))
        return out.cpu().numpy()

    return predict


def make_expression_predictor(
    fmt: str, expression: str
) -> Callable[[np.ndarray], np.ndarray]:
    """Predictor from an MLM ProcessingExpression (allowlisted python
    callable, SURVEY §2.4) — used for pre/post-processing stages."""

    def predict(batch: np.ndarray) -> np.ndarray:
        from openeo_processes_dask_ml_spark.utils.proc_expression import (
            run_process_expression,
        )

        return np.asarray(run_process_expression(fmt, expression, batch))

    return predict


def predictor_for(descriptor) -> Callable[[np.ndarray], np.ndarray]:
    """Resolve a batch predictor from an MLM descriptor's framework —
    the reference's dispatch-on-model-type (ml_predict.py:7-15), so a
    process graph's ml_predict node needs NO explicit predict_fn:
    sklearn artifacts unpickle per worker, pytorch artifacts jit.load
    per worker (both through the executor-local singleton cache). The
    artifact stages on first use; 'fake' (the test framework) echoes
    the first band — deterministic plumbing checks without a model."""
    fw = (descriptor.framework or "").lower()
    if fw == "fake":
        return lambda batch: np.asarray(batch)[:, 0]
    path = descriptor.artifact_path or descriptor.stage()
    if fw in ("sklearn", "scikit-learn"):
        return make_pickle_predictor(path)
    if fw == "pytorch":
        return make_torch_predictor(path)
    raise ValueError(
        f"no batch predictor for framework {descriptor.framework!r} "
        "(spark-mllib models go through ml_predict's MLlib transform)"
    )
