"""openEO ``fit_curve`` / ``predict_curve`` — distributed least squares
via normal equations, Spark-first.

The reference ecosystem fits per-pixel curves with
``xarray.curvefit``/scipy (iterative Levenberg-Marquardt per series).
For the linear-in-parameters model families that dominate real use
(harmonic seasonality ``a0 + a1*cos(wt) + a2*sin(wt)``, polynomial
trends), the least-squares optimum has a CLOSED FORM: per series,
accumulate the k x k normal matrix ``sum(b_i * b_j)`` and moment vector
``sum(b_i * y)`` with ONE hash aggregation (map-side combined — the
shuffle carries k*(k+3)/2 doubles per series, not the data), then solve
the tiny system with Cramer's rule as plain Catalyst expressions. No
Python boundary, no iteration, no per-series solver: a 100 TB cube fits
in exactly one shuffle.

``predict_curve`` evaluates the fitted parameters at arbitrary labels:
the parameter table (one row per series) broadcasts; the label grid
never shuffles.

openEO process parity: fit_curve/predict_curve with the harmonic model
the openEO docs use as their canonical example. Arbitrary non-linear
``function`` sub-graphs are out of scope (they need an iterative
optimizer); unsupported basis sizes raise.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame

TWO_PI = 2.0 * math.pi


def harmonic_basis(period: float) -> list[Callable[[Column], Column]]:
    """``[1, cos(2*pi*t/period), sin(2*pi*t/period)]`` — the openEO
    fit_curve documentation's canonical seasonal model."""
    w = TWO_PI / float(period)
    return [
        lambda t: F.lit(1.0),
        lambda t: F.cos(t * w),
        lambda t: F.sin(t * w),
    ]


def polynomial_basis(degree: int) -> list[Callable[[Column], Column]]:
    """``[1, t, t^2, ...]`` up to ``degree`` (max 2: the closed-form
    solver is specialized to k <= 3)."""
    if degree > 2:
        raise ValueError("polynomial_basis supports degree <= 2 (k <= 3)")
    return [
        (lambda p: lambda t: t**p if p else F.lit(1.0))(p)
        for p in range(degree + 1)
    ]


def _det3(m: list[list[Column]]) -> Column:
    """3x3 determinant, cofactor expansion along the first row — written
    the same way in the DuckDB oracle so FP rounding agrees."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _det2(m: list[list[Column]]) -> Column:
    return m[0][0] * m[1][1] - m[0][1] * m[1][0]


def fit_curve(
    cube: CubeFrame,
    dimension: str,
    t_fn: Callable[[Column], Column],
    basis: Sequence[Callable[[Column], Column]],
    param_prefix: str = "a",
) -> CubeFrame:
    """Fit ``y ~ sum_i a_i * basis_i(t)`` per series along ``dimension``.

    ``t_fn`` maps the dim column to a numeric t (e.g. fractional hours);
    ``basis`` is a list of k <= 3 column functions of t. Returns a cube
    whose dims are the remaining (series) dims and whose rows carry
    ``a0..a{k-1}`` parameter columns; ``value_col`` points at ``a0``.
    """
    k = len(basis)
    if k < 1 or k > 3:
        raise ValueError(f"fit_curve solves k in 1..3 parameters, got {k}")
    dcol = cube.dim_col(dimension)
    series = {n: c for n, c in cube.dims.items() if c != dcol}

    t = t_fn(F.col(dcol))
    b = [fn(t) for fn in basis]
    y = F.col(cube.value_col)

    # Normal-equation sums: A[i][j] = sum(b_i*b_j), rhs[i] = sum(b_i*y).
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(b[i] * b[j]).alias(f"s_{i}{j}"))
        aggs.append(F.sum(b[i] * y).alias(f"r_{i}"))
    sums = cube.df.groupBy(*series.values()).agg(*aggs)

    def A(i: int, j: int) -> Column:
        lo, hi = min(i, j), max(i, j)
        return F.col(f"s_{lo}{hi}")

    rhs = [F.col(f"r_{i}") for i in range(k)]
    mat = [[A(i, j) for j in range(k)] for i in range(k)]
    if k == 1:
        det = mat[0][0]
        params = [rhs[0] / det]
    elif k == 2:
        det = _det2(mat)
        params = [
            _det2([[rhs[0], mat[0][1]], [rhs[1], mat[1][1]]]) / det,
            _det2([[mat[0][0], rhs[0]], [mat[1][0], rhs[1]]]) / det,
        ]
    else:
        det = _det3(mat)
        params = [
            _det3([[rhs[r] if c == ci else mat[r][c] for c in range(3)]
                   for r in range(3)])
            / det
            for ci in range(3)
        ]
    # Degenerate series (det == 0, e.g. a single sample) yield NULL
    # params rather than +-Inf.
    det_ok = det != 0.0
    out = sums.select(
        *series.values(),
        *[
            F.when(det_ok, p).alias(f"{param_prefix}{i}")
            for i, p in enumerate(params)
        ],
    )
    return CubeFrame(out, series, f"{param_prefix}0", cube._carry_attrs())


def predict_curve(
    params: CubeFrame,
    labels: DataFrame,
    dimension_col: str,
    t_fn: Callable[[Column], Column],
    basis: Sequence[Callable[[Column], Column]],
    param_prefix: str = "a",
    out_col: str = "value",
) -> CubeFrame:
    """Evaluate fitted parameters on a label grid: cross-join the
    parameter table with the (broadcast) label grid and compute
    ``sum_i a_i * basis_i(t)`` as one projection.

    The LABELS side is broadcast, not the params side: openEO
    ``predict_curve`` is per-pixel, so params has one row per series
    (billions at raster scale) while the label grid is a handful of
    timestamps. Broadcasting params would OOM executors at scale.
    """
    k = len(basis)
    t = t_fn(F.col(dimension_col))
    pred = None
    for i, fn in enumerate(basis):
        term = F.col(f"{param_prefix}{i}") * fn(t)
        pred = term if pred is None else pred + term
    joined = params.df.crossJoin(F.broadcast(labels))
    dims = dict(params.dims)
    dims["time"] = dimension_col
    return CubeFrame(
        joined.withColumn(out_col, pred), dims, out_col, params._carry_attrs()
    )
