"""MLM pre/post-processing expression dispatch (SURVEY §2.4).

The reference resolves ``ProcessingExpression`` entries of format
``python`` — "pkg.module:func" or "pkg.module:Class.method" — through
importlib, gated by a global enable flag and a package allowlist
(reference: utils/proc_expression_utils.py:21-56, constants.py:76-87).
Other declared formats (uri, docker, rio-calc, openeo, gdal-calc) raise
NotImplementedError (:81-96). Same contract here; the resolved callable
runs inside the inference UDF on executor-side numpy batches.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Callable

DEFAULT_ALLOWED_PACKAGES = ("numpy", "math", "openeo_processes_dask_ml_spark")
ENABLE_ENV = "OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS"
ALLOWLIST_ENV = "OPENEO_SPARK_PROC_EXPRESSION_PACKAGES"

UNSUPPORTED_FORMATS = ("uri", "docker", "rio-calc", "openeo", "gdal-calc")


def _allowed_packages() -> tuple[str, ...]:
    env = os.environ.get(ALLOWLIST_ENV)
    if env:
        return tuple(p.strip() for p in env.split(";") if p.strip())
    return DEFAULT_ALLOWED_PACKAGES


def expressions_enabled() -> bool:
    return os.environ.get(ENABLE_ENV, "1") not in ("0", "false", "False")


def resolve_python_expression(expression: str) -> Callable:
    """Resolve 'pkg.module:func' / 'pkg.module:Class.method' with the
    package allowlist enforced on the root package."""
    if not expressions_enabled():
        raise PermissionError(
            f"processing expressions are disabled (set {ENABLE_ENV}=1 to enable)"
        )
    if ":" not in expression:
        raise ValueError(
            f"python expression must be 'pkg.module:func', got {expression!r}"
        )
    module_path, attr_path = expression.split(":", 1)
    root = module_path.split(".", 1)[0]
    allowed = _allowed_packages()
    if root not in allowed:
        raise PermissionError(
            f"package {root!r} not in the expression allowlist {allowed}"
        )
    module = importlib.import_module(module_path)
    obj = module
    for part in attr_path.split("."):
        obj = getattr(obj, part)
    if not callable(obj):
        raise TypeError(f"{expression!r} resolved to a non-callable")
    return obj


def run_process_expression(fmt: str, expression: str, data):
    """Dispatch on ProcessingExpression.format. Only 'python' is
    implemented, matching the reference."""
    fmt = (fmt or "").lower()
    if fmt == "python":
        return resolve_python_expression(expression)(data)
    if fmt in UNSUPPORTED_FORMATS:
        raise NotImplementedError(
            f"processing expression format {fmt!r} is not supported"
        )
    raise ValueError(f"unknown processing expression format {fmt!r}")
