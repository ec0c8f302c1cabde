"""Per-series array processes along a dimension (linear interpolation).

Reference: overrides/arrays.py:7-14 rechunks the whole time axis into one
chunk and calls xarray ``interpolate_na(method="linear",
use_coordinate=True)`` — a full-axis materialization per series.

Spark strategy: two window passes over ``partitionBy(series dims)
orderBy(time)`` — last non-null before / first non-null after each gap —
then the closed-form linear interpolation on the time coordinate. No
rechunk-to-one-chunk: windows stream within each partition, and series
are hash-distributed, so this holds at any number of series (the 100 TB
axis) as long as a single series' rows fit a partition — the same
assumption the reference makes per chunk, but here it's per-series, not
per-axis-of-the-whole-cube.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame


def interpolate_linear_df(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of nulls in ``value_col`` ordered by
    ``order_col`` (numeric or timestamp) within each series.

    Boundary nulls (no bracketing value on one side) stay null, matching
    xarray interpolate_na without fill_value extrapolation.
    """
    out_col = out_col or value_col
    w_before = (
        Window.partitionBy(*series_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_after = (
        Window.partitionBy(*series_cols)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    # Timestamp order columns: TIMESTAMP_NTZ has no direct cast to double
    # (parquet timestamp[us] without tz reads as NTZ under Spark 4's
    # inferTimestampNTZ), so hop through TIMESTAMP_LTZ first. Only
    # coordinate *differences* enter the interpolation formula, so the
    # session-timezone offset introduced by the hop cancels out.
    dtype = dict(df.dtypes).get(order_col, "")
    if "timestamp" in dtype:
        x = F.col(order_col).cast("timestamp_ltz").cast("double")
    else:
        x = F.col(order_col).cast("double")
    x_prev = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(w_before)
    v_prev = F.last(v, ignorenulls=True).over(w_before)
    x_next = F.first(F.when(v.isNotNull(), x), ignorenulls=True).over(w_after)
    v_next = F.first(v, ignorenulls=True).over(w_after)

    interp: Column = F.when(v.isNotNull(), v).otherwise(
        F.when(
            v_prev.isNotNull() & v_next.isNotNull(),
            v_prev + (v_next - v_prev) * (x - x_prev) / (x_next - x_prev),
        )
    )
    return df.withColumn(out_col, interp)


def array_interpolate_linear(cube: CubeFrame, dimension: str = "time") -> CubeFrame:
    dcol = cube.dim_col(dimension)
    series = [c for c in cube.dim_cols if c != dcol]
    return cube.with_df(
        interpolate_linear_df(cube.df, series, dcol, cube.value_col)
    )
