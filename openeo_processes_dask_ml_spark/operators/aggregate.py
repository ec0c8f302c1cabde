"""aggregate_spatial — zonal statistics as a join + groupBy.

Reference: overrides/aggregate.py:178-260 rasterizes polygon geometries
onto the cube grid (one label image), then groupby(label)+reducer, then
re-attaches feature properties. Rasterization is exactly a precomputed
cell->zone assignment; in Spark the idiomatic form is:

    cells JOIN zone_assignment ON cell-key  -> groupBy(zone).agg(reducer)
    -> JOIN zone properties back

The assignment table (one row per cell or per cell-key) is tiny relative
to the data cube, so Spark broadcasts it — the 100 TB cube never
shuffles for the join; only the per-zone partial aggregates move.

For true polygon geometries the assignment is produced by
``assign_cells_to_zones`` (point-in-polygon on the distinct cell grid —
a driver-scale problem since the grid is #cells, not #rows).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame, resolve_reducer


def aggregate_spatial(
    cube: CubeFrame,
    zones: DataFrame,
    zone_key: str,
    cell_keys: Sequence[str],
    reducer: str | Callable[[Column], Column],
    properties: Sequence[str] = (),
    keep_dims: Sequence[str] = ("time", "bands"),
) -> CubeFrame:
    """Reduce the spatial footprint of each zone to one value per
    (zone, kept dims).

    zones: DataFrame with ``zone_key``, the ``cell_keys`` columns that
    locate cube cells inside the zone (the rasterized label image of the
    reference), and optional property columns to carry through
    (reference overrides/aggregate.py:256-260).
    """
    kept = [cube.dim_col(d) for d in keep_dims if d in cube.dims]
    assignment = zones.select(zone_key, *cell_keys, *properties).dropDuplicates(
        [*cell_keys]
    )
    joined = cube.df.join(F.broadcast(assignment), on=list(cell_keys), how="inner")
    agg = resolve_reducer(reducer)(F.col(cube.value_col))
    out = joined.groupBy(zone_key, *kept, *properties).agg(
        agg.alias(cube.value_col)
    )
    dims = {"geometry": zone_key}
    for d in keep_dims:
        if d in cube.dims:
            dims[d] = cube.dims[d]
    return CubeFrame(out, dims, cube.value_col, cube._carry_attrs())


def mask_polygon(
    cube: CubeFrame,
    zones_wkt: list[tuple[int, str]],
    replacement=None,
    inside: bool = False,
    x_dim: str = "x",
    y_dim: str = "y",
) -> CubeFrame:
    """openEO mask_polygon: cells whose center does NOT fall inside any
    polygon are replaced with ``replacement`` (NULL by default);
    ``inside=True`` inverts (replace covered cells instead).

    The polygon test runs once per DISTINCT grid cell
    (``assign_cells_to_zones``) and the resulting cell list broadcasts
    back — the data cube itself never shuffles, matching the
    reference's rasterize-then-mask shape (overrides/aggregate.py)."""
    xcol, ycol = cube.dim_col(x_dim), cube.dim_col(y_dim)
    covered = (
        assign_cells_to_zones(cube.df, xcol, ycol, zones_wkt)
        .select(xcol, ycol)
        .withColumn("__in_poly", F.lit(True))
    )
    joined = cube.df.join(F.broadcast(covered), [xcol, ycol], "left")
    keep = F.col("__in_poly").isNull() if inside else F.col("__in_poly").isNotNull()
    value = F.when(keep, F.col(cube.value_col)).otherwise(F.lit(replacement))
    out = joined.select(
        *[cube.df[c] for c in cube.df.columns if c != cube.value_col],
        value.alias(cube.value_col),
    )
    return cube.with_df(out)


def filter_spatial(
    cube: CubeFrame,
    zones_wkt: list[tuple[int, str]],
    x_dim: str = "x",
    y_dim: str = "y",
) -> CubeFrame:
    """openEO filter_spatial: keep only cells covered by the given
    polygons — a broadcast inner join against the labeled distinct
    grid (predicate side is #cells, not #rows)."""
    xcol, ycol = cube.dim_col(x_dim), cube.dim_col(y_dim)
    covered = assign_cells_to_zones(cube.df, xcol, ycol, zones_wkt).select(
        xcol, ycol
    )
    return cube.with_df(cube.df.join(F.broadcast(covered), [xcol, ycol], "inner"))


def _parse_wkt_polygon(wkt: str) -> list[tuple[float, float]]:
    inner = wkt[wkt.index("((") + 2 : wkt.index("))")]
    return [
        (float(p.split()[0]), float(p.split()[1])) for p in inner.split(",")
    ]


def _contains(px: float, py: float, ring: list[tuple[float, float]]) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xin:
                inside = not inside
    return inside


def assign_cells_to_zones(
    spark_cells: DataFrame,
    x_col: str,
    y_col: str,
    zones_wkt: list[tuple[int, str]],
) -> DataFrame:
    """Point-in-polygon labeling of a distinct cell grid.

    Pure-Python ray casting over WKT polygons, applied to the *distinct*
    (x, y) grid — the analog of rasterio.features.rasterize at reference
    overrides/aggregate.py:129-139. The grid is small (it is the raster
    resolution, not the row count), so a pandas UDF over the distinct
    grid is cheap; the result joins back broadcast.
    """
    import pandas as pd  # noqa: F401 (annotation resolution for pandas_udf)
    from pyspark.sql import types as T

    polys = [(zid, _parse_wkt_polygon(w)) for zid, w in zones_wkt]

    def _zone_of(xs, ys):
        out = []
        for px, py in zip(xs, ys):
            hit = -1
            for zid, ring in polys:
                if _contains(px, py, ring):
                    hit = zid
                    break
            out.append(hit)
        return pd.Series(out, dtype="int64")

    _zone_of.__annotations__ = {
        "xs": pd.Series, "ys": pd.Series, "return": pd.Series
    }
    zone_of = F.pandas_udf(_zone_of, T.LongType())

    grid = spark_cells.select(x_col, y_col).distinct()
    return grid.withColumn("zone_id", zone_of(F.col(x_col), F.col(y_col))).filter(
        F.col("zone_id") >= 0
    )


def apply_polygon(
    cube: "CubeFrame",
    zones_wkt: list[tuple[int, str]],
    process,
    mask_value=None,
    x_dim: str = "x",
    y_dim: str = "y",
) -> "CubeFrame":
    """openEO apply_polygon: apply ``process`` (Column -> Column) to all
    cells whose center falls inside a polygon; cells outside every
    polygon are set to ``mask_value`` (null by default, per spec).
    Overlapping polygons raise, matching the spec's GeometriesOverlap
    exception (reference delegates to openeo-processes-dask's
    apply_polygon with the same contract).

    Scale shape: the polygon test and the overlap check both run on the
    DISTINCT grid (raster-resolution-sized, not row-count-sized); the
    labeled grid broadcasts back onto the cube, which never shuffles.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    xcol, ycol = cube.dim_col(x_dim), cube.dim_col(y_dim)
    polys = [(zid, _parse_wkt_polygon(w)) for zid, w in zones_wkt]

    def _hits_of(xs, ys):
        out = []
        for px, py in zip(xs, ys):
            out.append(sum(1 for _, ring in polys if _contains(px, py, ring)))
        return pd.Series(out, dtype="int64")

    _hits_of.__annotations__ = {
        "xs": pd.Series, "ys": pd.Series, "return": pd.Series
    }
    hits_of = F.pandas_udf(_hits_of, T.LongType())

    grid = cube.df.select(xcol, ycol).distinct()
    labeled = grid.withColumn("__hits", hits_of(F.col(xcol), F.col(ycol)))
    overlaps = labeled.filter(F.col("__hits") > 1).limit(1).count()
    if overlaps:
        raise ValueError(
            "apply_polygon: polygons overlap (GeometriesOverlap)"
        )
    covered = labeled.filter(F.col("__hits") == 1).select(xcol, ycol)
    joined = cube.df.join(
        F.broadcast(covered.withColumn("__in_poly", F.lit(True))),
        [xcol, ycol],
        "left",
    )
    value = F.when(
        F.col("__in_poly").isNotNull(), process(F.col(cube.value_col))
    ).otherwise(F.lit(mask_value))
    out = joined.select(
        *[cube.df[c] for c in cube.df.columns if c != cube.value_col],
        value.alias(cube.value_col),
    )
    return cube.with_df(out)
