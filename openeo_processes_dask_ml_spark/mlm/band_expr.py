"""Derived-band expressions (``ModelBand.expression``) compiled to
Spark Columns.

The reference declares the contract — a model band may carry
``{"name": "NDVI", "format": ..., "expression": "(B08-B04)/(B08+B04)"}``
— but leaves the computation ``todo`` (reference
process_implementations/data_model/data_model.py:362-367) and accepts
the item anyway. Here the expression COMPILES: a small arithmetic
grammar (parsed with :mod:`ast`, allow-listed node types, no eval)
lowers to a pyspark Column over per-band conditional aggregates, so a
derived band materializes as ordinary band rows in ONE groupBy pass —
the same plan shape as ``ndvi(target_band=...)`` in
operators/indices.py.

Grammar: ``+ - * / ** %``, unary ``-``, parentheses, numeric literals,
band identifiers (alias-resolved against the cube's band labels, e.g.
``B04`` == ``red``), and the functions ``sqrt abs log exp min max``.
Anything else (e.g. ``format: "python"`` dotted callables) raises
NotImplementedError at validation time, not mid-plan.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

_FUNCS = {
    "sqrt": F.sqrt,
    "abs": F.abs,
    "log": F.log,
    "exp": F.exp,
    "min": F.least,
    "max": F.greatest,
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: a**b,
    ast.Mod: lambda a, b: a % b,
}


class BandExpressionError(NotImplementedError):
    """Expression uses syntax outside the supported band-math grammar."""


def parse_band_expression(expression: str) -> ast.expression:
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise BandExpressionError(
            f"band expression {expression!r} is not valid arithmetic: {exc}"
        ) from None
    for node in ast.walk(tree):
        if isinstance(node, (ast.Expression, ast.Constant, ast.Name, ast.Load)):
            if isinstance(node, ast.Constant) and not isinstance(
                node.value, (int, float)
            ):
                raise BandExpressionError(
                    f"non-numeric literal {node.value!r} in band expression"
                )
            continue
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            continue
        if isinstance(node, (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod)):
            continue
        if isinstance(node, ast.UnaryOp) and isinstance(
            node.op, (ast.USub, ast.UAdd)
        ):
            continue
        if isinstance(node, (ast.USub, ast.UAdd)):
            continue
        if isinstance(node, ast.Call):
            if (
                isinstance(node.func, ast.Name)
                and node.func.id in _FUNCS
                and not node.keywords
            ):
                continue
            raise BandExpressionError(
                f"unsupported function call in band expression "
                f"{ast.dump(node.func)}; supported: {sorted(_FUNCS)}"
            )
        raise BandExpressionError(
            f"unsupported syntax {type(node).__name__!r} in band expression "
            f"{expression!r} — supported: + - * / ** %, unary -, numbers, "
            f"band names, {sorted(_FUNCS)}"
        )
    return tree


def referenced_bands(expression: str) -> list[str]:
    """Band identifiers the expression reads (functions excluded),
    in first-appearance order."""
    tree = parse_band_expression(expression)
    seen: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id not in _FUNCS:
            if node.id not in seen:
                seen.append(node.id)
    return seen


def append_derived_bands(
    df,
    band_col: str,
    other_dim_cols: list[str],
    value_col: str,
    bands,
    cube_bands: list[str],
):
    """Materialize derived bands as ordinary band rows.

    ONE groupBy over the non-band dims computes ALL derived bands as
    conditional aggregates (``first(when(band == label, value))`` per
    referenced band — the ndvi plan shape, operators/indices.py), then
    the derived columns explode back to long band rows and union onto
    the cube. One shuffle total, regardless of how many derived bands.
    """
    from openeo_processes_dask_ml_spark.utils.dim_utils import resolve_bands

    val = F.col(value_col)
    aggs = []
    for i, b in enumerate(bands):
        refs = referenced_bands(b.expression)
        rmap = resolve_bands(refs, cube_bands)
        cols = {
            r: F.first(
                F.when(F.col(band_col) == rmap[r], val), ignorenulls=True
            )
            for r in refs
        }
        aggs.append(
            compile_band_expression(b.expression, cols).alias(f"__derived_{i}")
        )
    wide = df.groupBy(*other_dim_cols).agg(*aggs)
    vtype = df.schema[value_col].dataType
    entries = F.array(
        *[
            F.struct(
                F.lit(b.name).alias(band_col),
                F.col(f"__derived_{i}").cast(vtype).alias(value_col),
            )
            for i, b in enumerate(bands)
        ]
    )
    long = wide.select(*other_dim_cols, F.explode(entries).alias("__e")).select(
        *other_dim_cols,
        F.col(f"__e.{band_col}").alias(band_col),
        F.col(f"__e.{value_col}").alias(value_col),
    )
    return df.unionByName(long.select(*df.columns))


def compile_band_expression(
    expression: str, band_columns: dict[str, Column]
) -> Column:
    """Lower the parsed expression to a Column; ``band_columns`` maps
    each referenced band identifier to its value Column."""
    tree = parse_band_expression(expression)

    def lower(node: ast.AST) -> Column:
        if isinstance(node, ast.Expression):
            return lower(node.body)
        if isinstance(node, ast.Constant):
            return F.lit(float(node.value))
        if isinstance(node, ast.Name):
            if node.id not in band_columns:
                raise BandExpressionError(
                    f"band {node.id!r} not resolvable; have "
                    f"{sorted(band_columns)}"
                )
            return band_columns[node.id]
        if isinstance(node, ast.BinOp):
            return _BINOPS[type(node.op)](lower(node.left), lower(node.right))
        if isinstance(node, ast.UnaryOp):
            operand = lower(node.operand)
            return -operand if isinstance(node.op, ast.USub) else operand
        if isinstance(node, ast.Call):
            return _FUNCS[node.func.id](*[lower(a) for a in node.args])
        raise BandExpressionError(f"unsupported node {type(node).__name__}")

    return lower(tree)
