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

from openeo_processes_dask_ml_spark.scale.tuning import fan_out


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


_LONG_TYPES = ("tinyint", "smallint", "int", "bigint", "boolean")


def _typed_minmax(col: Column, dtype: str) -> tuple[Column, Column, Column]:
    """Route a min/max value into exactly one of three TYPED slots
    (long, double, string) — the other two are typed NULLs.

    Rationale (correctness-gate hardening): any string rendering — even
    a pinned fixed-scale DECIMAL contract — leaves the engine ONE
    freedom: how it converts the binary value to the contract type.
    Spark casts double->decimal via BigDecimal.valueOf (shortest
    round-trip string, then HALF_UP); DuckDB scales the exact binary
    double and rounds. For a double within half an ulp of a ``...5``
    boundary at the target scale the two legitimately produce different
    decimals from identical bits. Emitting the RAW typed value removes
    the whole class: identical binaries stringify identically
    driver-side, whatever the engine.

    - integral/boolean -> ``long`` slot (BIGINT)
    - timestamp        -> ``long`` slot as microseconds since epoch
      (``unix_micros`` — an instant, independent of session timezone)
    - date             -> ``long`` slot as days since 1970-01-01
    - float/double     -> ``double`` slot, RAW (no decimal cast)
    - everything else  -> ``string`` slot (plain cast)
    """
    null_l = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    if dtype in _LONG_TYPES:
        return col.cast("bigint"), null_d, null_s
    if dtype.startswith("timestamp"):
        return F.unix_micros(col), null_d, null_s
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date")), null_d, null_s
    if dtype in ("double", "float"):
        return null_l, col.cast("double"), null_s
    return null_l, null_d, col.cast("string")


def profile_table_typed(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = True,
    per_stat: bool = False,
) -> DataFrame:
    """One-pass column profile with TYPED min/max output — the
    engine-proof gate contract (see ``_typed_minmax``).

    Default long form (``per_stat=False``): one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_long, max_long,
    min_double, max_double, min_string, max_string)`` — exactly one
    min/max slot pair non-NULL per row, chosen by the column's dtype.

    ``per_stat=True`` explodes further to one row per (column, stat)
    pair — ``(column, stat, val_long, val_double, val_string)`` with
    stats ``n_rows | n_nulls | n_distinct | min | max`` — so a
    correctness-gate mismatch localizes to a single cell.

    Same single-scan execution shape as :func:`profile_table`: all
    aggregates evaluate in one aggregation, then a stack() pivot.
    """
    cols = columns if columns is not None else df.columns
    dtypes = dict(df.dtypes)
    ndv = F.count_distinct if exact_ndv else F.approx_count_distinct
    aggs = []
    for c in cols:
        mn_l, mn_d, mn_s = _typed_minmax(F.min(F.col(c)), dtypes[c])
        mx_l, mx_d, mx_s = _typed_minmax(F.max(F.col(c)), dtypes[c])
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            ndv(F.col(c)).alias(f"__ndv_{c}"),
            mn_l.alias(f"__minl_{c}"),
            mx_l.alias(f"__maxl_{c}"),
            mn_d.alias(f"__mind_{c}"),
            mx_d.alias(f"__maxd_{c}"),
            mn_s.alias(f"__mins_{c}"),
            mx_s.alias(f"__maxs_{c}"),
        ]
    # fan the Expand + partial aggregation past a single-split scan
    # (r16): exact NDV replicates every row k-fold BEFORE the partial
    # agg, and on a one-file input all of it ran in the scan's single
    # task. Project to the profiled columns first so the round-robin
    # exchange moves only what the profile reads; every aggregate here
    # is layout-independent. No-op when the scan already carries
    # >= parallelism splits.
    wide = fan_out(df.select(*[F.col(c) for c in cols])).agg(*aggs)
    if not per_stat:
        pairs = ", ".join(
            f"'{c}', __n_{c}, __null_{c}, __ndv_{c}, "
            f"__minl_{c}, __maxl_{c}, __mind_{c}, __maxd_{c}, "
            f"__mins_{c}, __maxs_{c}"
            for c in cols
        )
        return wide.selectExpr(
            f"stack({len(cols)}, {pairs}) as "
            "(column, n_rows, n_nulls, n_distinct, min_long, max_long, "
            "min_double, max_double, min_string, max_string)"
        )
    # per-(column, stat) bisect form: every value lives alone in a row,
    # still typed (counts in the long slot; min/max routed by dtype)
    tuples = []
    for c in cols:
        tuples += [
            f"'{c}', 'n_rows', __n_{c}, CAST(NULL AS DOUBLE), CAST(NULL AS STRING)",
            f"'{c}', 'n_nulls', __null_{c}, CAST(NULL AS DOUBLE), CAST(NULL AS STRING)",
            f"'{c}', 'n_distinct', __ndv_{c}, CAST(NULL AS DOUBLE), CAST(NULL AS STRING)",
            f"'{c}', 'min', __minl_{c}, __mind_{c}, __mins_{c}",
            f"'{c}', 'max', __maxl_{c}, __maxd_{c}, __maxs_{c}",
        ]
    return wide.selectExpr(
        f"stack({len(tuples)}, {', '.join(tuples)}) as "
        "(column, stat, val_long, val_double, val_string)"
    )


def pivot_per_stat(per_stat: DataFrame) -> DataFrame:
    """Rebuild the wide typed profile (one row per column, 10 columns)
    from the per-(column, stat) form of ``profile_table_typed(...,
    per_stat=True)``.

    Exists for the unit pin that the wide library shape equals the
    pivot of the per-stat shape (they are the same aggregates routed
    through two stack() layouts).

    EXPERIMENT CONCLUDED (r10, VERDICT r10 #2): the r10 gate probe
    ``profile_table_wide_probe`` ran exactly this pivot over the
    driver-proven per-stat cells (``profile_table_cols`` hash-green
    r9 AND r10) against the r7-r9 wide oracle — and hash-RED at the
    real driver (CORRECTNESS_r10) while strict-green in every local
    sim. Since every cell value matches cross-engine, the 4-row x
    10-column wide layout ITSELF is unhashable at the driver
    (mixed-type nullable slot columns in a wide row). The probe was
    retired from the gate in r11; the per-stat long form is the gate
    contract permanently, and the wide form remains library-API-only,
    pinned here. Details: SCALE_NOTES.md "wide-shape probe".

    One hash-aggregate over the (tiny: 5 rows per profiled column)
    per-stat frame — no extra scan of the profiled table.
    """

    def slot(stat: str, val: str) -> Column:
        return F.max(F.when(F.col("stat") == stat, F.col(val)))

    return per_stat.groupBy("column").agg(
        slot("n_rows", "val_long").alias("n_rows"),
        slot("n_nulls", "val_long").alias("n_nulls"),
        slot("n_distinct", "val_long").alias("n_distinct"),
        slot("min", "val_long").alias("min_long"),
        slot("max", "val_long").alias("max_long"),
        slot("min", "val_double").alias("min_double"),
        slot("max", "val_double").alias("max_double"),
        slot("min", "val_string").alias("min_string"),
        slot("max", "val_string").alias("max_string"),
    )


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
    # same single-split fan-out as profile_table_typed (r16)
    wide = fan_out(df.select(*[F.col(c) for c in cols])).agg(*aggs)
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
