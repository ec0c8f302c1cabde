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
import types
from collections.abc import Callable

DEFAULT_ALLOWED_PACKAGES = ("numpy", "math", "openeo_processes_dask_ml_spark")
# For EXTERNAL roots (numpy, math) only these exact named callables
# resolve (ADVICE r5: run_udf exposes this resolver to arbitrary graph
# JSON, so whole-package roots are too wide — e.g. numpy.lib.npyio
# loaders). The engine's own package stays prefix-allowed: its surface
# is this repo's code. Extend via OPENEO_SPARK_PROC_EXPRESSION_NAMES
# (';'-separated 'pkg.module:attr' entries).
DEFAULT_NAMED_CALLABLES = frozenset(
    {
        "numpy:abs", "numpy:absolute", "numpy:negative", "numpy:sqrt",
        "numpy:exp", "numpy:log", "numpy:log1p", "numpy:log2",
        "numpy:log10", "numpy:clip", "numpy:tanh", "numpy:sign",
        "numpy:square", "numpy:cbrt", "numpy:reciprocal",
        "numpy:rint", "numpy:floor", "numpy:ceil", "numpy:trunc",
        "numpy:ndarray.sum", "numpy:ndarray.mean",
        "math:sqrt", "math:exp", "math:log", "math:tanh",
        "math:floor", "math:ceil",
    }
)
ENABLE_ENV = "OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS"
ALLOWLIST_ENV = "OPENEO_SPARK_PROC_EXPRESSION_PACKAGES"
NAMES_ENV = "OPENEO_SPARK_PROC_EXPRESSION_NAMES"
# roots where any module:attr under the package resolves (trusted code)
PREFIX_ALLOWED_ROOTS = ("openeo_processes_dask_ml_spark",)

UNSUPPORTED_FORMATS = ("uri", "docker", "rio-calc", "openeo", "gdal-calc")


def _allowed_packages() -> tuple[str, ...]:
    env = os.environ.get(ALLOWLIST_ENV)
    if env:
        return tuple(p.strip() for p in env.split(";") if p.strip())
    return DEFAULT_ALLOWED_PACKAGES


def _named_callables() -> frozenset:
    env = os.environ.get(NAMES_ENV)
    if env:
        return DEFAULT_NAMED_CALLABLES | {
            n.strip() for n in env.split(";") if n.strip()
        }
    return DEFAULT_NAMED_CALLABLES


def expressions_enabled() -> bool:
    # DEFAULT OFF, matching the reference's opt-in posture
    # (constants.py:76-87 gates expressions behind an explicit enable;
    # VERDICT r6 item 5): arbitrary graph JSON reaches this resolver via
    # run_udf, so code execution must be a deliberate deployment choice.
    return os.environ.get(ENABLE_ENV, "0") in ("1", "true", "True")


def resolve_python_expression(
    expression: str, *, enabled: bool | None = None
) -> Callable:
    """Resolve 'pkg.module:func' / 'pkg.module:Class.method' with the
    package allowlist enforced on the root package.

    ``enabled`` overrides the process-global env flag for this single
    resolution (ADVICE r12: callers that need a one-off enable — tests,
    gate queries — must not mutate ``os.environ``, which leaks across
    threads). ``None`` defers to ``expressions_enabled()``; the
    allowlists below are enforced either way."""
    if not (expressions_enabled() if enabled is None else enabled):
        raise PermissionError(
            "processing expressions are disabled by default; set "
            f"{ENABLE_ENV}=1 in the driver environment (and in "
            "spark.executorEnv for cluster runs — the resolver executes "
            "inside inference UDFs) to enable them"
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
    if root not in PREFIX_ALLOWED_ROOTS and expression not in _named_callables():
        raise PermissionError(
            f"{expression!r} is not an allowlisted named callable; external "
            f"roots resolve only exact entries (extend via {NAMES_ENV})"
        )
    module = importlib.import_module(module_path)
    obj = module
    for part in attr_path.split("."):
        obj = getattr(obj, part)
        # traversal must never step INTO a module: an engine module that
        # imports os/pickle would otherwise expose the whole stdlib as
        # 'pkg.module:os.system' under the prefix-allowed root
        if isinstance(obj, types.ModuleType):
            raise PermissionError(
                f"{expression!r} traverses into module {part!r}; address "
                "the target module directly in the module path"
            )
    if not callable(obj):
        raise TypeError(f"{expression!r} resolved to a non-callable")
    if root in PREFIX_ALLOWED_ROOTS:
        # the resolved callable must actually BE engine code, not a
        # stdlib/third-party object re-exported by an engine module
        # (e.g. 'pkg.utils:partial' or a bound alias) — otherwise the
        # prefix allowance is a laundering hole for arbitrary callables
        owner = getattr(obj, "__module__", None) or ""
        if not owner.startswith(root):
            raise PermissionError(
                f"{expression!r} resolves to a callable defined in "
                f"{owner or 'an unknown module'!r}, outside the "
                f"prefix-allowed package {root!r}"
            )
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
