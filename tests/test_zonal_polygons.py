"""aggregate_spatial with real polygon geometries: the
point-in-polygon cell labeling path (the Spark analog of the
reference's rasterize at overrides/aggregate.py:129-139)."""

from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.operators.aggregate import (
    aggregate_spatial,
    assign_cells_to_zones,
)


def test_assign_cells_to_zones_and_aggregate(spark):
    # 6x6 grid of cell centers
    cells = spark.createDataFrame(
        [(float(x) + 0.5, float(y) + 0.5, float(x + y)) for x in range(6) for y in range(6)],
        ["x", "y", "value"],
    )
    zones_wkt = [
        (1, "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),      # lower-left 3x3
        (2, "POLYGON ((3 3, 6 3, 6 6, 3 6, 3 3))"),      # upper-right 3x3
    ]
    assignment = assign_cells_to_zones(cells, "x", "y", zones_wkt)
    rows = {(r["x"], r["y"]): r["zone_id"] for r in assignment.collect()}
    assert rows[(0.5, 0.5)] == 1
    assert rows[(2.5, 2.5)] == 1
    assert rows[(3.5, 3.5)] == 2
    assert rows[(5.5, 5.5)] == 2
    # cells outside both polygons are dropped
    assert (0.5, 5.5) not in rows
    assert len(rows) == 18

    cube = CubeFrame(cells, {"x": "x", "y": "y"}, "value")
    out = aggregate_spatial(
        cube,
        assignment,
        zone_key="zone_id",
        cell_keys=["x", "y"],
        reducer="mean",
        keep_dims=(),
    )
    got = {r["zone_id"]: r["value"] for r in out.df.collect()}
    # zone 1: x,y in {0,1,2} -> mean(x+y) = 2; zone 2: {3,4,5} -> 8
    assert got == {1: 2.0, 2: 8.0}


def test_aggregate_spatial_carries_properties(spark):
    cells = spark.createDataFrame(
        [(0.5, 0.5, 1.0), (1.5, 0.5, 3.0)], ["x", "y", "value"]
    )
    zones = spark.createDataFrame(
        [(1, 0.5, 0.5, "wheat"), (1, 1.5, 0.5, "wheat")],
        ["zone_id", "x", "y", "crop"],
    )
    cube = CubeFrame(cells, {"x": "x", "y": "y"}, "value")
    out = aggregate_spatial(
        cube, zones, "zone_id", ["x", "y"], "sum", properties=["crop"], keep_dims=()
    )
    r = out.df.collect()[0]
    assert r["crop"] == "wheat" and r["value"] == 4.0
