"""Executor-side model loading for the inference harness.

The reference runs models out-of-process: weights re-loaded per
subprocess invocation, one OS process per GPU, files sharded
round-robin (reference: model_execution/run_pytorch_model.py:52-132,
run_sklearn_model.py:30-76). In Spark the equivalent is an
executor-local singleton: the predictor factory returns a picklable
closure that lazily loads the artifact ONCE per python worker (keyed by
path) and reuses it across Arrow batches.

GPU fan-out (reference run_pytorch_model.py:78-132: one OS process per
GPU, files sharded round-robin) maps to Spark's task-resource
scheduling instead of manual process management: configure the session
with ``gpu_task_confs()`` (``spark.task.resource.gpu.amount`` et al.),
and Spark assigns each TASK its GPU slice — the scheduler does the
round-robin the reference hand-rolls. Inside the UDF,
``executor_device()`` reads the task's assigned GPU address from
``TaskContext.resources()`` and ``make_torch_predictor(device="auto")``
places the model there, so N concurrent tasks on an N-GPU executor
each own one device with no coordination. On CPU-only runtimes the
same code resolves to ``cpu`` — this sandbox exercises the resolution
logic, not real GPUs.

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


def _pick_device(resources) -> str:
    """Device string from a TaskContext resources() mapping: the first
    GPU address Spark assigned this task (``cuda:<addr>``), else
    ``cpu``. Pure so the no-GPU sandbox can pin the resolution."""
    gpus = resources.get("gpu") if resources else None
    addrs = list(getattr(gpus, "addresses", None) or []) if gpus else []
    return f"cuda:{addrs[0]}" if addrs else "cpu"


def executor_device() -> str:
    """The device THIS task should use — call only executor-side
    (inside a UDF). Driver-side (no TaskContext) resolves to cpu."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return _pick_device(ctx.resources() if ctx is not None else None)


def gpu_task_confs(
    gpus_per_task: float = 1.0, gpus_per_executor: int = 1
) -> dict[str, str]:
    """The session confs that make Spark schedule GPU slices per task
    (set them on the builder BEFORE the session starts; discovery
    script per your cluster's convention). With these set, Spark hands
    each task its GPU address in ``TaskContext.resources()`` — the
    scheduling analog of the reference's one-process-per-GPU loop
    (run_pytorch_model.py:78-132)."""
    return {
        "spark.task.resource.gpu.amount": str(gpus_per_task),
        "spark.executor.resource.gpu.amount": str(gpus_per_executor),
    }


def make_torch_predictor(
    artifact_path: str, device: str = "cpu"
) -> Callable[[np.ndarray], np.ndarray]:
    """Predictor for a TorchScript artifact (the reference's torch loop,
    run_pytorch_model.py:52-75): jit.load once per worker, eval mode,
    no_grad per batch. ``device="auto"`` resolves per task via
    ``executor_device()`` (the task's scheduler-assigned GPU, or cpu).
    Raises ImportError where torch is unavailable."""

    def predict(batch: np.ndarray) -> np.ndarray:
        import torch  # deferred: not present in every runtime

        dev = executor_device() if device == "auto" else device

        def loader():
            model = torch.jit.load(artifact_path, map_location=dev)
            model.eval()
            return model

        model = _load_once(f"torch:{artifact_path}:{dev}", loader)
        with torch.no_grad():
            out = model(torch.from_numpy(batch).to(dev))
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
        # auto: each task places the model on its scheduler-assigned
        # GPU (gpu_task_confs), or cpu when none is assigned
        return make_torch_predictor(path, device="auto")
    raise ValueError(
        f"no batch predictor for framework {descriptor.framework!r} "
        "(spark-mllib models go through ml_predict's MLlib transform)"
    )
