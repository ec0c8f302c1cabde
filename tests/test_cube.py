

def test_flatten_unflatten_roundtrip(spark):
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [(1, "red", 10.0), (1, "nir", 20.0), (2, "red", 30.0)],
        ["t", "band", "value"],
    )
    cube = CubeFrame(df, {"time": "t", "bands": "band"}, "value")
    flat = cube.flatten_dimensions(["time", "bands"], "slice")
    labels = {r[0] for r in flat.df.select(flat.dim_col("slice")).collect()}
    assert labels == {"1~red", "1~nir", "2~red"}
    unf = flat.unflatten_dimension("slice", ["time", "bands"])
    rows = {
        (r[unf.dim_col("time")], r[unf.dim_col("bands")], r["value"])
        for r in unf.df.collect()
    }
    assert rows == {("1", "red", 10.0), ("1", "nir", 20.0), ("2", "red", 30.0)}
    import pytest

    with pytest.raises(ValueError):
        cube.flatten_dimensions(["time"], "bands")


def test_aggregate_spatial_window_trim_and_pad(spark):
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    # 3x2 raster, 2x2 windows: window (0,0) full, window (1,0) has
    # only x=2 column (2 cells) -> trimmed
    rows = [(float(x), float(y), float(10 * x + y)) for x in range(3) for y in range(2)]
    cube = CubeFrame(
        spark.createDataFrame(rows, ["x", "y", "value"]),
        {"x": "x", "y": "y"},
        "value",
    )
    pad = {
        (r["x"], r["y"]): r["value"]
        for r in cube.aggregate_spatial_window("mean", [2, 2], "pad").df.collect()
    }
    assert pad[(0.0, 0.0)] == (0.0 + 1.0 + 10.0 + 11.0) / 4
    assert pad[(1.0, 0.0)] == (20.0 + 21.0) / 2
    trim = cube.aggregate_spatial_window("mean", [2, 2], "trim").df.collect()
    assert {(r["x"], r["y"]) for r in trim} == {(0.0, 0.0)}


def test_merge_cubes_overlap_resolver(spark):
    """Overlapping cells combine through the resolver; one-sided cells
    pass through; no resolver keeps the disjoint union behavior."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    a = CubeFrame(
        spark.createDataFrame(
            [(1, "b1", 10.0), (2, "b1", 20.0)], ["t", "band", "value"]
        ),
        {"time": "t", "bands": "band"},
        "value",
    )
    b = CubeFrame(
        spark.createDataFrame(
            [(2, "b1", 5.0), (3, "b1", 7.0)], ["t", "band", "value"]
        ),
        {"time": "t", "bands": "band"},
        "value",
    )
    merged = a.merge_cubes(b, overlap_resolver=F.greatest)
    got = {r["t"]: r["value"] for r in merged.df.collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 7.0}
    # disjoint union path unchanged
    assert a.merge_cubes(b).df.count() == 4


def test_merge_cubes_overlap_resolver_via_graph(spark):
    """The graph adapter binds the overlap_resolver sub-graph's x/y."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    a = CubeFrame(
        spark.createDataFrame([(1, 2.0), (2, 4.0)], ["t", "value"]),
        {"time": "t"},
        "value",
    )
    b = CubeFrame(
        spark.createDataFrame([(2, 10.0)], ["t", "value"]),
        {"time": "t"},
        "value",
    )

    def resolver(x=None, y=None):
        return x + y

    out = reg.get("merge_cubes")(
        {"cube1": a, "cube2": b, "overlap_resolver": resolver}, {}
    )
    got = {r["t"]: r["value"] for r in out.df.collect()}
    assert got == {1: 2.0, 2: 14.0}


def test_merge_cubes_overlap_resolver_dim_mismatch_raises(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    a = CubeFrame(
        spark.createDataFrame([(1, 2.0)], ["t", "value"]), {"time": "t"}, "value"
    )
    b = CubeFrame(
        spark.createDataFrame([(1, "x", 2.0)], ["t", "band", "value"]),
        {"time": "t", "bands": "band"},
        "value",
    )
    with _pytest.raises(ValueError, match="dimension mismatch"):
        a.merge_cubes(b, overlap_resolver=F.greatest)


def test_merge_cubes_resolver_sees_null_at_overlap(spark):
    """When both cubes have a ROW at a cell but one value is null, the
    resolver sub-graph (not coalesce) decides the null semantics: a
    null-propagating resolver like subtract yields null, it must not
    silently pass the non-null side through (ADVICE r5)."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    a = CubeFrame(
        spark.createDataFrame(
            [(1, "b1", 10.0), (2, "b1", None), (4, "b1", 4.0)],
            "t int, band string, value double",
        ),
        {"time": "t", "bands": "band"},
        "value",
    )
    b = CubeFrame(
        spark.createDataFrame(
            [(1, "b1", None), (2, "b1", 5.0), (3, "b1", 7.0)],
            "t int, band string, value double",
        ),
        {"time": "t", "bands": "band"},
        "value",
    )
    merged = a.merge_cubes(b, overlap_resolver=lambda x, y: x - y)
    got = {r["t"]: r["value"] for r in merged.df.collect()}
    # t=1,2: both rows exist, one value null -> subtract propagates null
    # t=3,4: one-sided -> pass through
    assert got == {1: None, 2: None, 3: 7.0, 4: 4.0}
