"""ANALYZE-style table profiling: per-column statistics in ONE pass.

The stats a cost-based planner (and a data engineer) wants before
touching a 100 TB table: row count, null fraction, distinct count,
min/max. Everything is computed in a single aggregation over one scan
— Spark evaluates all the aggregate expressions together, so the cost
is one read of the projected columns regardless of how many columns
are profiled (vs one pass per column in naive ANALYZE loops).

``exact_ndv`` toggles exact ``count(DISTINCT)`` (cross-engine
deterministic — the oracle gate opts in explicitly) vs HyperLogLog++
``approx_count_distinct`` (the DEFAULT, because it is the only shape
that survives 100 TB). The difference is not
cosmetic: k exact DISTINCTs in one aggregation compile to Catalyst's
Expand operator — every input row is REPLICATED k times into the
shuffle — measured 232.8 s exact vs 17.2 s HLL++ on 30M rows x 4
columns (13.5x; the sketch merges map-side, no Expand). At 100 TB,
exact NDV over many columns is the classic accidental-quadratic; use
the sketch unless a gate needs determinism. The output is LONG form —
one row per column — so profiling 900 columns doesn't produce a
4500-column row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(col: Column, dtype: str, mode: str) -> Column:
    """Stringify a min/max value for the profile row.

    ``native`` is the engine's own cast-to-string.  ``portable`` removes
    every rendering freedom an engine has, so two engines that agree on
    the VALUE also agree on the STRING (the correctness-gate mode —
    float-to-shortest-round-trip and timestamp formatting are the two
    places engine versions legitimately diverge while being equally
    right):
    - float/double -> fixed-scale DECIMAL(38,6) (no shortest-round-trip
      freedom, no scientific notation threshold);
    - timestamp    -> explicit 'yyyy-MM-dd HH:mm:ss' (no fractional-
      second elision rules);
    - date         -> explicit 'yyyy-MM-dd';
    - int/string   -> plain cast (already unambiguous).
    """
    if mode == "native":
        return col.cast("string")
    if dtype in ("double", "float"):
        return col.cast("decimal(38,6)").cast("string")
    if dtype.startswith("timestamp"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if dtype == "date":
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
    render: str = "native",
) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so numeric,
    string, and timestamp columns share one schema.  ``render=
    'portable'`` pins the min/max string form to an engine-proof
    contract (see ``_render``)."""
    if render not in ("native", "portable"):
        raise ValueError(f"render must be 'native' or 'portable', got {render!r}")
    cols = columns if columns is not None else df.columns
    dtypes = dict(df.dtypes)
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            ndv(F.col(c)).alias(f"__ndv_{c}"),
            _render(F.min(F.col(c)), dtypes[c], render).alias(f"__min_{c}"),
            _render(F.max(F.col(c)), dtypes[c], render).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # pivot the single wide row to long form with a stack expression —
    # still one job, the per-column structs are built from the agg row
    pairs = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, __ndv_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    stacked = wide.selectExpr(
        f"stack({len(cols)}, {pairs}) as "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
    return stacked
