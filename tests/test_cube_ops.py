"""CubeFrame operator units: filter_bbox, apply_dimension, mask
broadcast semantics, merge_cubes, reducers, time-tiled inference."""

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame, resolve_reducer


@pytest.fixture(scope="module")
def grid_cube(spark):
    rows = [
        (float(x), float(y), "b1", float(x * 10 + y))
        for x in range(4)
        for y in range(4)
    ]
    df = spark.createDataFrame(rows, ["x", "y", "band", "value"])
    return CubeFrame(df, {"x": "x", "y": "y", "bands": "band"}, "value")


def test_filter_bbox(grid_cube):
    out = grid_cube.filter_bbox(west=1, east=3, south=0, north=2)
    rows = out.df.collect()
    assert {(r["x"], r["y"]) for r in rows} == {(1.0, 0.0), (1.0, 1.0), (2.0, 0.0), (2.0, 1.0)}


def test_filter_bbox_alias_dims(spark):
    df = spark.createDataFrame([(1.0, 2.0, 5.0)], ["lon", "lat", "value"])
    cube = CubeFrame(df, {"x": "lon", "y": "lat"}, "value")
    assert cube.filter_bbox(west=0, east=2).df.count() == 1
    assert cube.filter_bbox(west=1.5).df.count() == 0


def test_apply_dimension_cumsum(spark):
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(5)] + [(2, i, 1.0) for i in range(3)],
        ["g", "t", "value"],
    )
    cube = CubeFrame(df, {"geometry": "g", "time": "t"}, "value")
    out = cube.apply_dimension("time", "cumsum")
    got = {(r["g"], r["t"]): r["value"] for r in out.df.collect()}
    assert got[(1, 4)] == 10.0
    assert got[(2, 2)] == 3.0


def test_apply_dimension_rank_and_unknown(spark):
    df = spark.createDataFrame([(1, 10, 1.0), (1, 20, 2.0)], ["g", "t", "value"])
    cube = CubeFrame(df, {"geometry": "g", "time": "t"}, "value")
    ranked = cube.apply_dimension("time", "rank", alias="rk")
    assert {r["rk"] for r in ranked.df.collect()} == {1, 2}
    with pytest.raises(ValueError, match="not supported"):
        cube.apply_dimension("time", "fft")


def test_mask_broadcasts_along_missing_dims(spark):
    data = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0), (2, "b", 4.0)],
        ["t", "band", "value"],
    )
    mask = spark.createDataFrame([(1, True), (2, False)], ["t", "m"])
    cube = CubeFrame(data, {"time": "t", "bands": "band"}, "value")
    mcube = CubeFrame(mask, {"time": "t"}, "m")
    out = cube.mask(mcube)
    got = {(r["t"], r["band"]): r["value"] for r in out.df.collect()}
    # t=1 masked across BOTH bands (broadcast along the missing band dim)
    assert got[(1, "a")] is None and got[(1, "b")] is None
    assert got[(2, "a")] == 3.0 and got[(2, "b")] == 4.0


def test_mask_replacement_value(spark):
    data = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["t", "value"])
    mask = spark.createDataFrame([(1, True)], ["t", "m"])
    cube = CubeFrame(data, {"time": "t"}, "value")
    out = cube.mask(CubeFrame(mask, {"time": "t"}, "m"), replacement=-1.0)
    got = {r["t"]: r["value"] for r in out.df.collect()}
    assert got == {1: -1.0, 2: 2.0}


def test_merge_cubes_union(grid_cube):
    extra = grid_cube.with_df(
        grid_cube.df.withColumn("band", F.lit("b2"))
    )
    merged = grid_cube.merge_cubes(extra)
    assert merged.df.count() == 32
    assert merged.df.select("band").distinct().count() == 2


def test_unknown_reducer_rejected():
    with pytest.raises(ValueError, match="unknown reducer"):
        resolve_reducer("mode7")


def test_product_reducer(spark):
    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, 4.0), ("b", 1, -2.0), ("b", 2, 3.0), ("c", 1, 0.0), ("c", 2, 9.0)],
        ["g", "t", "value"],
    )
    cube = CubeFrame(df, {"geometry": "g", "time": "t"}, "value")
    out = cube.reduce_dimension("time", "product")
    got = {r["g"]: r["value"] for r in out.df.collect()}
    assert got["a"] == pytest.approx(24.0)
    assert got["b"] == pytest.approx(-6.0)  # negatives survive
    assert got["c"] == 0.0                  # zeros survive


def test_time_tiled_inference(spark):
    """Model consumes the time dim (tile of 2 along time): datetime
    coordinates resolve, tile, and collapse correctly."""
    from openeo_processes_dask_ml_spark.ml.inference import run_model_tiled
    from openeo_processes_dask_ml_spark.mlm.descriptor import (
        MLModelDescriptor,
        ModelInput,
        ModelOutput,
    )

    rows = []
    for d in range(1, 5):  # 4 daily steps -> 2 time tiles
        for x in range(2):
            rows.append((datetime(2024, 1, d), float(x), float(d * 10 + x)))
    df = spark.createDataFrame(rows, ["time", "x", "value"])
    cube = CubeFrame(df, {"time": "time", "x": "x"}, "value")
    descriptor = MLModelDescriptor(
        item={"id": "t"},
        input=ModelInput.parse(
            {"input": {"shape": [-1, 2, 2], "dim_order": ["batch", "time", "x"]}}
        ),
        output=ModelOutput.parse(
            {"result": {"shape": [-1, 2], "dim_order": ["batch", "x"]}}
        ),
        framework="fake",
    )

    def collapse_time(batch: np.ndarray) -> np.ndarray:
        return batch.sum(axis=1)  # consume the time axis

    out = run_model_tiled(cube, descriptor, collapse_time)
    rows = out.collect()
    # 2 time tiles x 2 x-cells
    assert len(rows) == 4
    # consumed time dim collapses to a single coordinate column
    assert "time" in out.columns
    got = {(str(r["time"]), r["x"]): r["value"] for r in rows}
    # tile 1 = days 1,2: sum over time of (d*10 + x)
    assert got[[k for k in got if k[1] == 0.0][0]] in (30.0, 70.0)


def test_filter_temporal_half_open(spark):
    from datetime import datetime

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [(datetime(2024, 1, d), float(d)) for d in range(1, 6)], ["t", "value"]
    )
    cube = CubeFrame(df, {"time": "t"}, "value")
    out = cube.filter_temporal("2024-01-02", "2024-01-04")
    days = sorted(r["value"] for r in out.df.collect())
    assert days == [2.0, 3.0]  # [start, end): end day excluded


def test_save_ml_model_requires_trained(tmp_path):
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.ml.random_forest import (
        mlm_class_random_forest,
        save_ml_model,
    )

    rf = mlm_class_random_forest(num_trees=3)
    with _pytest.raises(ValueError, match="trained"):
        save_ml_model(rf, str(tmp_path / "m"))


def test_multimodal_frame_sample(spark):
    from openeo_processes_dask_ml_spark.scale.multimodal import frame_sample

    media = spark.createDataFrame(
        [
            (1, bytearray(b"v"), ("video", "raw", 0, 0, 25)),
            (2, bytearray(b"i"), ("image", "raw", 4, 4, 0)),
        ],
        "media_id long, payload binary, meta struct<kind:string,format:string,width:int,height:int,n_frames:int>",
    )
    out = frame_sample(media, every_n=10)
    rows = out.collect()
    # video only; frames 0, 10, 20
    assert {(r["media_id"], r["frame_idx"]) for r in rows} == {(1, 0), (1, 10), (1, 20)}


def test_aggregate_temporal_decade_and_season(spark):
    """'decade' must produce real decade starts (Spark date_trunc has no
    decade unit and silently NULLs), and 'season' must follow openEO
    DJF boundaries: December opens the NEXT winter."""
    rows = [
        (datetime(1999, 6, 1), 1.0),
        (datetime(2003, 2, 1), 2.0),
        (datetime(2007, 8, 1), 4.0),
    ]
    df = spark.createDataFrame(rows, ["t", "value"])
    cube = CubeFrame(df, {"time": "t"}, "value")
    out = {str(r["t"]): r["value"] for r in
           cube.aggregate_temporal_period("decade", "sum").df.collect()}
    assert out == {
        "1990-01-01 00:00:00": 1.0,
        "2000-01-01 00:00:00": 6.0,
    }

    srows = [
        (datetime(2023, 12, 15), 1.0),   # DJF starting 2023-12-01
        (datetime(2024, 1, 15), 2.0),    # same winter
        (datetime(2024, 3, 15), 8.0),    # MAM starting 2024-03-01
        (datetime(2024, 11, 15), 16.0),  # SON starting 2024-09-01
    ]
    sdf = spark.createDataFrame(srows, ["t", "value"])
    scube = CubeFrame(sdf, {"time": "t"}, "value")
    sout = {str(r["t"]): r["value"] for r in
            scube.aggregate_temporal_period("season", "sum").df.collect()}
    assert sout == {
        "2023-12-01 00:00:00": 3.0,
        "2024-03-01 00:00:00": 8.0,
        "2024-09-01 00:00:00": 16.0,
    }


def test_aggregate_temporal_unknown_period_raises(spark):
    df = spark.createDataFrame([(datetime(2024, 1, 1), 1.0)], ["t", "value"])
    cube = CubeFrame(df, {"time": "t"}, "value")
    with pytest.raises(ValueError, match="unsupported period"):
        cube.aggregate_temporal_period("fortnight", "sum")


def test_apply_kernel_laplacian_golden(spark):
    """3x3 Laplacian over a 3x3 ramp, zero-padded borders — center cell
    golden: 1*v(0,1)+1*v(1,0)-4*v(1,1)+1*v(1,2)+1*v(2,1)."""
    from openeo_processes_dask_ml_spark.operators.kernel import apply_kernel

    rows = [
        (float(x), float(y), float(x * 3 + y))
        for x in range(3)
        for y in range(3)
    ]
    df = spark.createDataFrame(rows, ["x", "y", "value"])
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    lap = [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]
    out = {(r["x"], r["y"]): r["value"] for r in apply_kernel(cube, lap).df.collect()}
    # center (1,1): v=4; neighbors 1,3,5,7 -> 1+3+5+7-16 = 0
    assert out[(1.0, 1.0)] == 0.0
    # corner (0,0): v=0; in-grid neighbors v(0,1)=1, v(1,0)=3 -> 4 - 0 = 4
    assert out[(0.0, 0.0)] == 4.0
    assert len(out) == 9


def test_apply_kernel_asymmetric_matches_convolution(spark):
    """An asymmetric (Sobel-ish) kernel must follow scipy.ndimage.convolve
    semantics (kernel FLIPPED), like upstream openeo-processes-dask —
    cross-correlation would mirror the result. Expected values computed
    with an explicit numpy convolution loop (zero padding)."""
    import numpy as np

    from openeo_processes_dask_ml_spark.operators.kernel import apply_kernel

    rng = np.arange(16, dtype=float).reshape(4, 4)  # in[x, y] = 4x + y
    kern = np.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
    ry, rx = 1, 1
    expected = np.zeros_like(rng)
    for i in range(4):
        for j in range(4):
            acc = 0.0
            for a in range(3):
                for b in range(3):
                    ii, jj = i - a + ry, j - b + rx
                    if 0 <= ii < 4 and 0 <= jj < 4:
                        acc += rng[ii, jj] * kern[a, b]
            expected[i, j] = acc

    rows = [
        (float(x), float(y), float(rng[x, y])) for x in range(4) for y in range(4)
    ]
    df = spark.createDataFrame(rows, ["x", "y", "value"])
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    out = {
        (r["x"], r["y"]): r["value"]
        for r in apply_kernel(cube, kern.tolist()).df.collect()
    }
    for i in range(4):
        for j in range(4):
            assert out[(float(i), float(j))] == pytest.approx(expected[i, j]), (
                i, j, out[(float(i), float(j))], expected[i, j],
            )


def test_apply_neighborhood_focal_median(spark):
    """3x3 focal median over a 3x3 ramp; border windows shrink to the
    in-grid cells (corner = 4 cells, median of even count = midpoint)."""
    from openeo_processes_dask_ml_spark.operators.kernel import apply_neighborhood

    rows = [
        (float(x), float(y), float(x * 3 + y)) for x in range(3) for y in range(3)
    ]
    cube = CubeFrame(
        spark.createDataFrame(rows, ["x", "y", "value"]),
        {"x": "x", "y": "y"}, "value",
    )
    out = {
        (r["x"], r["y"]): r["value"]
        for r in apply_neighborhood(cube, 3, 3, "median").df.collect()
    }
    assert out[(1.0, 1.0)] == 4.0  # full window: median of 0..8
    # corner (0,0): cells {0,1,3,4} -> (1+3)/2
    assert out[(0.0, 0.0)] == 2.0
    assert len(out) == 9
    with pytest.raises(ValueError, match="odd"):
        apply_neighborhood(cube, 2, 3, "median")


def test_aggregate_temporal_explicit_intervals(spark):
    df = spark.createDataFrame(
        [
            (datetime(2024, 1, 2), 1.0),
            (datetime(2024, 1, 12), 3.0),
            (datetime(2024, 1, 12, 5), 5.0),
            (datetime(2024, 2, 1), 100.0),  # outside every interval
        ],
        ["t", "value"],
    )
    cube = CubeFrame(df, {"time": "t"}, "value")
    out = {
        r["t"]: r["value"]
        for r in cube.aggregate_temporal(
            [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21")],
            "sum",
            labels=["a", "b"],
        ).df.collect()
    }
    assert out == {"a": 1.0, "b": 8.0}
    # default labels = interval starts; overlapping intervals allowed
    out2 = {
        r["t"]: r["value"]
        for r in cube.aggregate_temporal(
            [("2024-01-01", "2024-01-31"), ("2024-01-10", "2024-01-13")],
            "sum",
        ).df.collect()
    }
    assert out2["2024-01-01"] == 9.0
    assert out2["2024-01-10"] == 8.0
    with pytest.raises(ValueError, match="labels"):
        cube.aggregate_temporal([("2024-01-01", "2024-01-02")], "sum", ["x", "y"])


def test_resample_cube_spatial_snaps_to_target_grid(spark):
    src = spark.createDataFrame(
        [(float(x), float(y), float(x)) for x in range(8) for y in range(8)],
        ["x", "y", "value"],
    )
    tgt = spark.createDataFrame(
        [(float(x * 4), float(y * 4), 0.0) for x in range(2) for y in range(2)],
        ["x", "y", "value"],
    )
    source = CubeFrame(src, {"x": "x", "y": "y"}, "value")
    target = CubeFrame(tgt, {"x": "x", "y": "y"}, "value")
    out = source.resample_cube_spatial(target, "count")
    got = {(r["x"], r["y"]): r["value"] for r in out.df.collect()}
    # snap grid {0,4}: x in [0,2) -> 0 ... wait, floor(x/4+0.5): x<2 -> 0,
    # 2<=x<6 -> 4, 6<=x -> 8 (extends beyond target extent by snapping)
    assert got[(0.0, 0.0)] == 4.0  # 2 xs x 2 ys
    assert got[(4.0, 4.0)] == 16.0  # 4 xs x 4 ys
    # irregular target grid rejected
    bad = CubeFrame(
        spark.createDataFrame(
            [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (5.0, 0.0, 0.0)],
            ["x", "y", "value"],
        ),
        {"x": "x", "y": "y"}, "value",
    )
    with pytest.raises(ValueError, match="irregular"):
        source.resample_cube_spatial(bad, "mean")


def test_apply_kernel_rejects_even_kernel(spark):
    from openeo_processes_dask_ml_spark.operators.kernel import apply_kernel

    df = spark.createDataFrame([(0.0, 0.0, 1.0)], ["x", "y", "value"])
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    with pytest.raises(ValueError, match="odd"):
        apply_kernel(cube, [[1.0, 1.0]])


def test_climatological_normal_and_anomaly(spark):
    """Normals = mean per recurring label across years; anomaly
    subtracts them per cell."""
    rows = [
        (datetime(2023, 1, 15), "a", 10.0),
        (datetime(2024, 1, 20), "a", 20.0),   # month 1 normal = 15
        (datetime(2023, 6, 1), "a", 40.0),    # month 6 normal = 40
        (datetime(2024, 1, 1), "b", 100.0),   # month 1 / band b = 100
    ]
    df = spark.createDataFrame(rows, ["t", "band", "value"])
    cube = CubeFrame(df, {"time": "t", "bands": "band"}, "value")
    normals = cube.climatological_normal("month")
    got_norm = {
        (r["period_label"], r["band"]): r["value"]
        for r in normals.df.collect()
    }
    assert got_norm == {(1, "a"): 15.0, (6, "a"): 40.0, (1, "b"): 100.0}
    anom = cube.anomaly(normals, "month")
    got = {
        (str(r["t"])[:10], r["band"]): r["value"] for r in anom.df.collect()
    }
    assert got[("2023-01-15", "a")] == -5.0
    assert got[("2024-01-20", "a")] == 5.0
    assert got[("2023-06-01", "a")] == 0.0
    assert got[("2024-01-01", "b")] == 0.0


def test_chunk_dedup_first_occurrence(spark):
    """A chunk repeated across docs is kept only in the earliest doc."""
    from openeo_processes_dask_ml_spark.scale.text import chunk_dedup

    rows = [
        (1, "a b c d"),        # chunks (size 2): "a b", "c d"
        (2, "a b x y"),        # "a b" already seen in doc 1
        (3, "c d"),            # seen in doc 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_ratio"])
        for r in chunk_dedup(df, chunk_words=2).collect()
    }
    assert got == {1: (2, 2, 1.0), 2: (2, 1, 0.5), 3: (1, 0, 0.0)}


def test_resample_spatial_mean_golden(spark):
    """4x4 grid at res 1 -> res 2 mean: each output pixel averages its
    2x2 block; center-aligned labels land at (1.0, 3.0)."""
    rows = [
        (float(x), float(y), float(x * 4 + y))
        for x in range(4)
        for y in range(4)
    ]
    df = spark.createDataFrame(rows, ["x", "y", "value"])
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    out = {
        (r["x"], r["y"]): r["value"]
        for r in cube.resample_spatial(2.0, "mean").df.collect()
    }
    # block x in {0,1}, y in {0,1}: values 0,1,4,5 -> mean 2.5; label (1.0, 1.0)
    assert out[(1.0, 1.0)] == 2.5
    # block x in {2,3}, y in {2,3}: values 10,11,14,15 -> 12.5
    assert out[(3.0, 3.0)] == 12.5
    assert len(out) == 4


def test_resample_spatial_corner_align_and_validation(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.0), (1.0, 1.0, 3.0)], ["x", "y", "value"])
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    out = {(r["x"], r["y"]): r["value"]
           for r in cube.resample_spatial(2.0, "mean", align="corner").df.collect()}
    assert out == {(0.0, 0.0): 2.0}
    with pytest.raises(ValueError, match="positive"):
        cube.resample_spatial(0)
    with pytest.raises(ValueError, match="align"):
        cube.resample_spatial(2.0, align="middle")


def test_quantiles_and_extrema(spark):
    """Exact quartiles of 1..5 are 2, 3, 4; extrema [1, 5]."""
    rows = [("a", i, float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["band", "i", "value"])
    cube = CubeFrame(df, {"bands": "band", "other": "i"}, "value")
    [q] = cube.quantiles("other", [0.25, 0.5, 0.75]).df.collect()
    assert list(q["value"]) == [2.0, 3.0, 4.0]
    [e] = cube.reduce_dimension("other", "extrema").df.collect()
    assert list(e["value"]) == [1.0, 5.0]
    with pytest.raises(ValueError, match="probabilities"):
        cube.quantiles("other", [1.5])


def test_apply_dimension_cumproduct(spark):
    rows = [(1, 1, 2.0), (1, 2, 3.0), (1, 3, 0.5)]
    df = spark.createDataFrame(rows, ["g", "t", "value"])
    cube = CubeFrame(df, {"geometry": "g", "time": "t"}, "value")
    out = cube.apply_dimension("time", "cumproduct", alias="cp")
    got = {r["t"]: r["cp"] for r in out.df.collect()}
    assert got == {1: 2.0, 2: 6.0, 3: 3.0}


def test_add_drop_rename_dimension(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["t", "value"])
    cube = CubeFrame(df, {"time": "t"}, "value")
    c2 = cube.add_dimension("bands", "B04")
    assert set(c2.dims) == {"time", "bands"}
    assert c2.df.select(c2.dim_col("bands")).distinct().collect()[0][0] == "B04"
    with pytest.raises(ValueError, match="already exists"):
        c2.add_dimension("bands", "B08")
    # size-1 dim drops; multi-label dim refuses
    c3 = c2.drop_dimension("bands")
    assert set(c3.dims) == {"time"}
    with pytest.raises(ValueError, match="more than one"):
        c2.drop_dimension("time")
    c4 = cube.rename_dimension("time", "t_idx")
    assert c4.dims == {"t_idx": "t"}
    with pytest.raises(ValueError, match="already exists"):
        c4.rename_dimension("t_idx", "t_idx")


def test_rename_labels_and_dimension_labels(spark):
    rows = [("B4", 1.0), ("B8", 2.0), ("B4", 3.0)]
    df = spark.createDataFrame(rows, ["band", "value"])
    cube = CubeFrame(df, {"bands": "band"}, "value")
    renamed = cube.rename_labels("bands", ["red", "nir"], ["B4", "B8"])
    labels = [r[0] for r in renamed.dimension_labels("bands").collect()]
    assert labels == ["nir", "red"]
    with pytest.raises(ValueError, match="length mismatch"):
        cube.rename_labels("bands", ["only_target"], [])


def test_trim_cube_drops_all_null_edges(spark):
    """Labels 0 and 3 hold only nulls -> trimmed; interior null kept."""
    rows = [
        (0, None), (1, 1.0), (2, None), (3, None),
    ]
    df = spark.createDataFrame(rows, "t int, value double")
    # add a real second row at t=2 so the interior label survives
    df = df.union(spark.createDataFrame([(2, 5.0)], "t int, value double"))
    cube = CubeFrame(df, {"time": "t"}, "value")
    got = sorted(r["t"] for r in cube.trim_cube().df.collect())
    assert got == [1, 2, 2]


def _ppm_bytes(w, h, pixels):
    """Binary P6 payload; pixels = flat list of (r, g, b)."""
    body = bytes(v for px in pixels for v in px)
    return f"P6\n# test\n{w} {h}\n255\n".encode() + body


def _bmp_bytes(w, h, pixels):
    """24-bit bottom-up BI_RGB BMP; pixels = row-major top-down (r,g,b)."""
    import struct as st

    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = pixels[y * w + x]
            row += bytes([b, g, r])
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    info = st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = st.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def test_decode_image_ppm_bmp_and_resize():
    import numpy as np

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        decode_image,
        image_features,
        resize_nearest,
    )

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    for payload, fmt in [(_ppm_bytes(2, 2, px), "ppm"), (_bmp_bytes(2, 2, px), "bmp")]:
        arr = decode_image(payload, fmt)
        assert arr.shape == (2, 2, 3), fmt
        assert arr[0, 0].tolist() == [255, 0, 0], fmt
        assert arr[1, 1].tolist() == [10, 20, 30], fmt
    # identical pixels -> identical features across formats
    f_ppm = image_features(decode_image(_ppm_bytes(2, 2, px), "ppm"), 8)
    f_bmp = image_features(decode_image(_bmp_bytes(2, 2, px), "bmp"), 8)
    assert f_ppm == f_bmp and len(f_ppm) == 8
    big = resize_nearest(decode_image(_ppm_bytes(2, 2, px), "ppm"), 4, 4)
    assert big.shape == (4, 4, 3)
    assert big[0, 0].tolist() == [255, 0, 0] and big[3, 3].tolist() == [10, 20, 30]
    # unsupported profile without PIL -> clear gate (png/jpg/gif are
    # pure-numpy since r10 and lossless webp since r11, so LOSSY webp
    # — a VP8 chunk — is the remaining PIL-gated example)
    try:
        import PIL  # noqa: F401
    except ImportError:
        import pytest
        import struct as _s

        lossy = (
            b"RIFF" + _s.pack("<I", 12) + b"WEBP"
            + b"VP8 " + _s.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError):
            decode_image(lossy, "webp")


def test_extract_features_real_decode_path(spark):
    from openeo_processes_dask_ml_spark.scale.multimodal import (
        extract_features,
        fake_decode_features,
        image_features,
        decode_image,
    )

    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    ppm = _ppm_bytes(2, 2, px)
    rows = [
        (1, bytearray(ppm), ("image", "ppm", 2, 2, 1)),
        (2, bytearray(b"opaque-bytes"), ("image", "raw", 12, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,width:int,height:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in extract_features(df, feature_dim=6).collect()}
    assert out[1]["feature"] == image_features(decode_image(ppm, "ppm"), 6)
    assert out[2]["feature"] == fake_decode_features(b"opaque-bytes", 6)
    assert out[1]["payload_bytes"] == len(ppm)


def _wav_bytes(samples, sample_rate=8000, channels=1):
    """16-bit PCM RIFF/WAVE payload from float samples in [-1, 1]."""
    import struct as st

    import numpy as np

    pcm = (np.asarray(samples) * 32767.0).astype("<i2").tobytes()
    fmt = st.pack("<HHIIHH", 1, channels, sample_rate,
                  sample_rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + st.pack("<I", len(fmt)) + fmt
    chunks += b"data" + st.pack("<I", len(pcm)) + pcm
    return b"RIFF" + st.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_wav_and_features():
    import numpy as np

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        audio_features,
        decode_audio,
    )

    t = np.arange(800) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t)
    arr, rate = decode_audio(_wav_bytes(sine))
    assert rate == 8000 and arr.shape == (800, 1)
    assert abs(arr[:, 0] - sine).max() < 1e-3  # 16-bit quantization
    f = audio_features(arr, rate, 8)
    assert len(f) == 8
    assert abs(f[0] - 0.1) < 1e-9            # duration 800/8000 s
    assert abs(f[1] - np.sqrt(0.5)) < 0.01   # sine RMS
    assert 0.99 < f[2] <= 1.0                # peak
    import pytest

    with pytest.raises(ValueError):
        decode_audio(b"nonsense")


def test_extract_features_audio_path(spark):
    import numpy as np

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        audio_features,
        decode_audio,
        extract_features,
    )

    wav = _wav_bytes(np.sin(np.arange(400) / 10.0))
    rows = [(7, bytearray(wav), ("audio", "wav", 0, 0, 1))]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,width:int,height:int,n_frames:int>",
    )
    out = extract_features(df, feature_dim=6).collect()[0]
    assert out["feature"] == audio_features(*decode_audio(wav), n=6)


def test_image_neardup_pairs_finds_copies_not_strangers(spark):
    """Perceptual-hash image dedup: an exact copy and a one-pixel-noised
    copy of the same image pair up (aHash robust to tiny noise); a
    structurally different image pairs with nobody. Real PPM decode in
    the executors, banded Hamming join on 48-bit fingerprints."""
    import hashlib

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        ahash48,
        decode_image,
        image_neardup_pairs,
    )

    def pixels(seed, w=16, h=16, flip=0):
        px = []
        for i in range(w * h):
            d = hashlib.md5(f"{seed}:{i}".encode()).digest()
            px.append((d[0], d[1], d[2]))
        if flip:
            r, g, b = px[0]
            px[0] = ((r + 2) % 256, g, b)
        return px

    rows = [
        (0, bytearray(_ppm_bytes(16, 16, pixels("a"))), ("image", "ppm", 16, 16, 1)),
        (1, bytearray(_ppm_bytes(16, 16, pixels("a"))), ("image", "ppm", 16, 16, 1)),
        (2, bytearray(_ppm_bytes(16, 16, pixels("a", flip=1))), ("image", "ppm", 16, 16, 1)),
        (3, bytearray(_ppm_bytes(16, 16, pixels("zzz"))), ("image", "ppm", 16, 16, 1)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<kind:string,format:string,width:int,height:int,n_frames:int>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(media).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == 0  # exact copy
    assert (0, 2) in got and got[(0, 2)] <= 3  # one-pixel noise
    assert not any(3 in k for k in got)  # stranger stays unmatched
    # executor hash equals the local reference computation
    local = ahash48(decode_image(bytes(rows[0][1]), "ppm"))
    assert isinstance(local, int) and 0 <= local < (1 << 48)


def _wav_bytes(samples, rate=8000):
    """Minimal PCM16 mono RIFF/WAVE payload."""
    import struct

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def test_audio_neardup_pairs_gain_and_noise_robust(spark):
    """Audio fingerprint dedup: a half-gain copy and a lightly-noised
    copy of the same clip pair with the original (sign-of-energy-diff
    bits are gain-invariant); a different melody pairs with nobody."""
    import numpy as np

    from openeo_processes_dask_ml_spark.scale.multimodal import (
        audio_neardup_pairs,
    )

    rng = np.random.RandomState(3)
    t = np.arange(8000) / 8000.0
    # amplitude-modulated tone: strong frame-to-frame energy structure
    base = np.sin(2 * np.pi * 440 * t) * (0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 3 * t)))
    other = np.sin(2 * np.pi * 523 * t) * (0.2 + 0.8 * np.abs(np.cos(2 * np.pi * 5 * t)))
    rows = [
        (0, bytearray(_wav_bytes(base))),
        (1, bytearray(_wav_bytes(base * 0.5))),              # gain change
        (2, bytearray(_wav_bytes(base + rng.randn(8000) * 0.01))),  # noise
        (3, bytearray(_wav_bytes(other))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_neardup_pairs(media).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == 0
    assert (0, 2) in got and got[(0, 2)] <= 3
    assert not any(3 in k for k in got)


def test_cdc_chunks_insert_robust(spark):
    """The CDC property that motivates the operator: inserting one word
    into a document perturbs only the chunk containing it — chunks
    after the next content boundary are IDENTICAL, where fixed-width
    chunking would shift every downstream chunk."""
    from openeo_processes_dask_ml_spark.scale.text import (
        cdc_duplicate_chunks,
    )

    # at boundary_bits=1, 'delta'/'epsilon'/'theta' are boundary words
    # (hash60 % 2 == 0), so the repeated phrase splits into stable
    # content-defined chunks
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    mutated = base.replace("gamma", "gamma inserted", 1)
    df = spark.createDataFrame(
        [(1, base), (2, mutated)], "doc_id long, text string"
    )
    dup = cdc_duplicate_chunks(df, boundary_bits=1, min_docs=2).collect()
    # the repeated 8-word phrase guarantees shared chunks; the insert
    # must not destroy all of them
    assert len(dup) >= 1
    assert all(r["n_docs"] == 2 for r in dup)


def test_domain_pagerank_mass_and_dangling(spark):
    from openeo_processes_dask_ml_spark.scale.web import domain_pagerank

    # 3 docs -> at most 3 src domains out of 11: dangling domains exist
    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x")], "doc_id long, text string"
    )
    rows = domain_pagerank(df, n_domains=11, iters=4).collect()
    assert len(rows) == 11
    assert sorted(r["pos"] for r in rows) == list(range(1, 12))
    mass = sum(r["rank"] for r in rows)
    # quantized ranks: mass conserves to ~1 within quantization error
    assert abs(mass - 1.0) < 1e-4
    assert all(r["rank"] > 0 for r in rows)


def test_domain_pagerank_driver_tier_matches_distributed(spark):
    """The r15 two-tier shape: the driver-side power iteration (edge
    table under the bound) must be BIT-identical to the distributed
    broadcast-join loop — same fold orders, same IEEE op order."""
    from openeo_processes_dask_ml_spark.scale.web import domain_pagerank

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    fast = domain_pagerank(df, n_domains=23, iters=6).collect()
    slow = domain_pagerank(
        df, n_domains=23, iters=6, max_driver_edges=0
    ).collect()
    key = lambda r: (r["domain"], r["rank"], r["pos"])  # noqa: E731
    assert sorted(map(key, fast)) == sorted(map(key, slow))
    assert fast and len(fast) == 23
