"""openEO ``apply_kernel`` — focal (neighborhood) convolution over the
spatial dims, Spark-first.

The reference ecosystem computes this as an xarray/scipy stencil; a
long-form cube gets the same result as a SCATTER: every input cell
explodes into its kernel contributions (a literal offsets array, size
|kernel|), each contribution re-targets the neighbor cell it affects,
and one hash aggregation sums them. That is ONE explode + ONE shuffle
with map-side combine — no self-join per offset, no window over the
raster — and it survives any scale-up because the shuffle key is the
output cell.

Coordinates map to dense axis indices through broadcast index tables
(axis-sized, like the tiling path in ml/inference.py) rather than a
global window rank, so the raster never funnels through one partition.

Border semantics: contributions that would land outside the grid are
dropped, which IS zero-padding (missing neighbors contribute 0) — the
openEO ``border=0`` default.

Definition (TRUE convolution, matching upstream openeo-processes-dask
which applies ``scipy.ndimage.convolve`` — the kernel is flipped):
``out[ix, iy] = sum_{di, dj} kernel[ky-1-(di+ry)][kx-1-(dj+rx)] *
in[ix + di, iy + dj]``. For symmetric kernels this equals
cross-correlation; for asymmetric kernels (Sobel etc.) the flip
matters and upstream's convolve semantics win.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.scale.tuning import local_rows_df


def _axis_indices(df, cols, spark):
    """coord -> dense index tables for several axes from ONE job over
    the input (one ``collect_set`` per axis in a single aggregation)
    instead of a distinct+collect scan per axis: at cube scale the
    input scan is the cost, the axis domains are tiny. Null coords are
    excluded — the downstream equi-join never matched them anyway."""
    row = df.agg(*[F.collect_set(c).alias(c) for c in cols]).head()
    dtypes = dict(df.dtypes)
    out = {}
    for col in cols:
        coords = sorted(row[col])
        idx_df = local_rows_df(
            spark,
            [(v, i) for i, v in enumerate(coords)],
            f"`{col}` {dtypes[col]}, `__i_{col}` long",
        )
        out[col] = (F.broadcast(idx_df), len(coords))
    return out


def apply_neighborhood(
    cube: CubeFrame,
    size_x: int,
    size_y: int,
    reducer,
    dim_x: str = "x",
    dim_y: str = "y",
) -> CubeFrame:
    """openEO ``apply_neighborhood`` for reducing neighborhoods: every
    output cell gets ``reducer`` applied over its (2*rx+1) x (2*ry+1)
    spatial neighborhood (``size_x = 2*rx+1`` etc., odd).

    Same SCATTER shape as :func:`apply_kernel` — each input cell
    explodes to the |window| output cells it participates in, then ONE
    hash aggregation keyed on the output cell applies the reducer.
    Unlike a convolution, the reducer is arbitrary (median, min, max,
    sd, ...), which a weighted sum can't express. Border cells reduce
    over their in-grid neighbors only (shrinking window — the openEO
    border default of ignoring missing neighbors).
    """
    from openeo_processes_dask_ml_spark.cube import resolve_reducer

    if size_x % 2 == 0 or size_y % 2 == 0:
        raise ValueError(
            f"neighborhood must have odd extents, got {size_x}x{size_y}"
        )
    rx, ry = size_x // 2, size_y // 2
    xcol, ycol = cube.dim_col(dim_x), cube.dim_col(dim_y)
    others = [v for v in cube.dims.values() if v not in (xcol, ycol)]
    spark = cube.df.sparkSession

    axis = _axis_indices(cube.df, [xcol, ycol], spark)
    xi_df, nx = axis[xcol]
    yi_df, ny = axis[ycol]

    offsets = [
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in range(-rx, rx + 1)
        for dj in range(-ry, ry + 1)
    ]
    indexed = cube.df.join(xi_df, xcol).join(yi_df, ycol)
    contrib = indexed.select(
        *others,
        F.explode(F.array(*offsets)).alias("o"),
        F.col(f"__i_{xcol}").alias("ix"),
        F.col(f"__i_{ycol}").alias("iy"),
        F.col(cube.value_col).alias("v"),
    ).select(
        *others,
        (F.col("ix") - F.col("o.di")).alias("tx"),
        (F.col("iy") - F.col("o.dj")).alias("ty"),
        "v",
    ).filter(
        (F.col("tx") >= 0) & (F.col("tx") < nx)
        & (F.col("ty") >= 0) & (F.col("ty") < ny)
    )
    agg = resolve_reducer(reducer)(F.col("v"))
    summed = contrib.groupBy(*others, "tx", "ty").agg(agg.alias(cube.value_col))
    out = (
        summed.join(xi_df.withColumnRenamed(f"__i_{xcol}", "tx"), "tx")
        .join(yi_df.withColumnRenamed(f"__i_{ycol}", "ty"), "ty")
        .select(*others, xcol, ycol, cube.value_col)
    )
    return CubeFrame(out, dict(cube.dims), cube.value_col, cube._carry_attrs())


def apply_kernel(
    cube: CubeFrame,
    kernel: list[list[float]],
    dim_x: str = "x",
    dim_y: str = "y",
    factor: float = 1.0,
) -> CubeFrame:
    """Convolve the value over (dim_x, dim_y) per every other dim.

    ``kernel`` is a (2*ry+1) x (2*rx+1) row-major weight grid (rows
    step dim_x, columns step dim_y). Zero-weight taps are skipped at
    plan build — a sparse kernel costs only its non-zero taps.
    """
    ky, kx = len(kernel), len(kernel[0])
    if ky % 2 == 0 or kx % 2 == 0:
        raise ValueError(f"kernel must have odd dimensions, got {ky}x{kx}")
    ry, rx = ky // 2, kx // 2

    xcol, ycol = cube.dim_col(dim_x), cube.dim_col(dim_y)
    others = [v for v in cube.dims.values() if v not in (xcol, ycol)]
    spark = cube.df.sparkSession

    axis = _axis_indices(cube.df, [xcol, ycol], spark)
    xi_df, nx = axis[xcol]
    yi_df, ny = axis[ycol]

    # Convolution flips the kernel (scipy.ndimage.convolve semantics,
    # as used by upstream apply_kernel): the tap at offset (di-ry,
    # dj-rx) carries the weight from the MIRRORED kernel cell.
    taps = [
        F.struct(
            F.lit(di - ry).alias("di"),
            F.lit(dj - rx).alias("dj"),
            F.lit(float(kernel[ky - 1 - di][kx - 1 - dj])).alias("w"),
        )
        for di in range(ky)
        for dj in range(kx)
        if kernel[ky - 1 - di][kx - 1 - dj] != 0.0
    ]
    indexed = cube.df.join(xi_df, xcol).join(yi_df, ycol)
    contrib = indexed.select(
        *others,
        F.explode(F.array(*taps)).alias("o"),
        F.col(f"__i_{xcol}").alias("ix"),
        F.col(f"__i_{ycol}").alias("iy"),
        F.col(cube.value_col).alias("v"),
    ).select(
        *others,
        (F.col("ix") - F.col("o.di")).alias("tx"),
        (F.col("iy") - F.col("o.dj")).alias("ty"),
        (F.col("v") * F.col("o.w")).alias("wv"),
    ).filter(
        (F.col("tx") >= 0) & (F.col("tx") < nx)
        & (F.col("ty") >= 0) & (F.col("ty") < ny)
    )
    summed = contrib.groupBy(*others, "tx", "ty").agg(
        (F.sum("wv") * F.lit(factor)).alias(cube.value_col)
    )
    out = (
        summed.join(xi_df.withColumnRenamed(f"__i_{xcol}", "tx"), "tx")
        .join(yi_df.withColumnRenamed(f"__i_{ycol}", "ty"), "ty")
        .select(*others, xcol, ycol, cube.value_col)
    )
    return CubeFrame(out, dict(cube.dims), cube.value_col, cube._carry_attrs())
