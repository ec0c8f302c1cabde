"""As-of join and sessionization — time-series operators Spark lacks
as builtins, composed from exact DataFrame primitives (SURVEY §2
"custom operators": composition of existing ops before UDFs).

as-of join (backward): for each left row, the most recent right row
with right_ts <= left_ts within the same key. Implemented with the
union + window trick: tag both sides, sort-merge them once per key, and
carry the last-seen right values forward with
``last(..., ignorenulls=True)``. One shuffle on the key — the same cost
as a regular join — instead of a per-row range probe; no skew beyond
the key distribution, so it survives arbitrary scale.

sessionization: gap > threshold starts a new session; session id =
running count of gap-breaks per key (cumulative-sum window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join. Left rows with no earlier right row keep
    NULLs. Tie (equal timestamps) matches, like DuckDB ASOF JOIN's
    ``>=``. ``on`` may be a single key or a composite key list — the
    series is defined by ALL keys together (an empty list means one
    global series; that collapses to a single partition, so only use
    it for small frames)."""
    on_keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in (*on_keys, right_ts)
    ]
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            *[F.col(k) for k in on_keys],
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal __ts (side 0 < 1), so a
    # same-instant right row is visible to the left row — ASOF >= ties
    w = (
        Window.partitionBy(*on_keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias(f"{right_ts}{suffix}"),
        *[
            F.last(
                F.when(F.col("__side") == 0, F.col(f"__r_{c}")), ignorenulls=True
            )
            .over(w)
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop(
        "__side", "__ts", *[f"__r_{c}" for c in right_cols]
    )


def resample_cube_temporal(cube, target, method: str = "backward"):
    """openEO resample_cube_temporal: align this cube's time labels to
    the target cube's time labels (nearest-earlier match per series) —
    an as-of join of the target's time grid against the source cube."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    tcol = cube.dim_col("time")
    target_tcol = target.dim_col("time")
    keys = [v for k, v in cube.dims.items() if k != "time"]
    grid = target.df.select(
        *[target.dims[k] for k in target.dims if k != "time"],
        F.col(target_tcol).alias("__target_ts"),
    ).distinct()
    joined = asof_join(
        grid,
        cube.df,
        on=keys,
        left_ts="__target_ts",
        right_ts=tcol,
        right_cols=[cube.value_col],
        suffix="_src",
    )
    out = joined.select(
        *keys,
        F.col("__target_ts").alias(tcol),
        F.col(f"{cube.value_col}_src").alias(cube.value_col),
    )
    return CubeFrame(out, dict(cube.dims), cube.value_col, cube._carry_attrs())


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (1-based per key) — two window passes, one shuffle."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    ) / 1000000.0
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = (
        Window.partitionBy(key)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_id", F.sum(is_new).over(wsum))
