"""Spectral indices (ndvi) as band math over the long-form cube.

Reference: overrides/indices.py:9-31 — computes (nir-red)/(nir+red) and,
when ``target_band`` is set, appends it as a new band label instead of
collapsing the band dimension.

Spark strategy: a conditional aggregation (no pivot shuffle beyond the
one groupBy) computes nir/red per remaining-dim group; the append case
unions the derived rows back with the original cube (unionByName — a
no-shuffle narrow op).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.utils.dim_utils import resolve_bands


def ndvi(
    cube: CubeFrame,
    nir: str = "nir",
    red: str = "red",
    target_band: str | None = None,
) -> CubeFrame:
    bcol = cube.dim_col("bands")
    # band_labels() consults the metadata hint when present — on a
    # decoded raster cube a distinct() over pixels would re-run the
    # whole decode fan-out just to list two labels
    available = cube.band_labels()
    mapping = resolve_bands([nir, red], available)
    if len(mapping) < 2:
        raise ValueError(f"nir/red bands not found; have {available}")
    nir_label, red_label = mapping[nir], mapping[red]

    others = [v for v in cube.dim_cols if v != bcol]
    val = F.col(cube.value_col)
    nir_v = F.first(F.when(F.col(bcol) == nir_label, val), ignorenulls=True)
    red_v = F.first(F.when(F.col(bcol) == red_label, val), ignorenulls=True)
    nd = (
        cube.df.filter(F.col(bcol).isin([nir_label, red_label]))
        .groupBy(*others)
        .agg(((nir_v - red_v) / (nir_v + red_v)).alias(cube.value_col))
    )
    if target_band is None:
        keep = {k: v for k, v in cube.dims.items() if v != bcol}
        return CubeFrame(nd, keep, cube.value_col, cube._carry_attrs())
    appended = nd.withColumn(bcol, F.lit(target_band))
    # non-dim passthrough columns (e.g. the decoder's item_id) are not
    # well-defined for a derived band computed across bands — NULL-fill
    # them so the append works on any cube (the former bare select
    # raised UNRESOLVED_COLUMN on decoded cubes)
    for c in cube.df.columns:
        if c not in appended.columns:
            appended = appended.withColumn(
                c, F.lit(None).cast(cube.df.schema[c].dataType)
            )
    appended = appended.select(*cube.df.columns)
    out = cube.with_df(cube.df.unionByName(appended))
    if cube.attrs.get("band_labels") is not None:
        # append path's universe is known exactly: old labels + target
        out.attrs["band_labels"] = list(cube.attrs["band_labels"]) + [target_band]
    return out
