"""Process-graph executor + registry smoke (reference
tests/test_minibackend.py:6-20) and sub-graph compilation; plus MLM
descriptor validation and the expression-dispatch allowlist
(tests/utils/test_proc_expression_utils.py)."""

import pytest

from openeo_processes_dask_ml_spark.graph import default_registry, execute_graph
from openeo_processes_dask_ml_spark.mlm.descriptor import (
    MLModelDescriptor,
    ModelInput,
    ModelOutput,
    check_bands_available,
    check_dimension_sizes,
    check_dimensions_present,
    load_stac_ml,
)
from openeo_processes_dask_ml_spark.utils.proc_expression import (
    resolve_python_expression,
    run_process_expression,
)

SF_DIR = "/root/testdata/sf0.001"


def test_registry_families_registered():
    reg = default_registry()
    ids = reg.process_ids()
    for pid in [
        "load_collection", "save_result", "load_stac", "load_stac_ml",
        "ml_predict", "ml_fit", "mlm_class_random_forest",
        "filter_bands", "reduce_dimension", "aggregate_temporal_period",
        "mask", "ndvi", "array_interpolate_linear", "eq", "lte", "or",
        "array_element", "median",
    ]:
        assert pid in ids, pid


def test_array_sort_order_rearrange_processes(spark):
    """openEO sort / order / rearrange: order is the 0-based stable
    argsort, rearrange applies a permutation, and
    rearrange(data, order(data)) == sort(data)."""
    import pyspark.sql.functions as F

    reg = default_registry()
    df = spark.createDataFrame([([3.0, 1.0, 2.0, 1.0],)], ["vals"])
    vals = F.col("vals")
    row = df.select(
        reg.get("sort")({"data": vals}, {}).alias("asc"),
        reg.get("sort")({"data": vals, "asc": False}, {}).alias("desc"),
        reg.get("order")({"data": vals}, {}).alias("ord"),
        reg.get("rearrange")(
            {"data": vals, "order": reg.get("order")({"data": vals}, {})}, {}
        ).alias("roundtrip"),
        reg.get("rearrange")({"data": vals, "order": F.array(
            F.lit(2), F.lit(0), F.lit(1), F.lit(3))}, {}).alias("perm"),
    ).collect()[0]
    assert row["asc"] == [1.0, 1.0, 2.0, 3.0]
    assert row["desc"] == [3.0, 2.0, 1.0, 1.0]
    assert row["ord"] == [1, 3, 2, 0]  # stable: the two 1.0s keep order
    assert row["roundtrip"] == [1.0, 1.0, 2.0, 3.0]
    assert row["perm"] == [2.0, 3.0, 1.0, 1.0]


def test_scalar_array_date_process_additions(spark):
    from datetime import datetime

    import pyspark.sql.functions as F

    reg = default_registry()
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], datetime(2024, 1, 31, 12, 0, 0))], ["arr", "t"]
    )
    arr, t = F.col("arr"), F.col("t")
    row = df.select(
        reg.get("array_contains")({"data": arr, "value": 2.0}, {}).alias("c"),
        reg.get("array_find")({"data": arr, "value": 3.0}, {}).alias("f"),
        reg.get("array_find")({"data": arr, "value": 9.0}, {}).alias("fm"),
        reg.get("array_append")({"data": arr, "value": 4.0}, {}).alias("ap"),
        reg.get("array_concat")({"array1": arr, "array2": arr}, {}).alias("cc"),
        reg.get("all")({"data": F.array(F.lit(True), F.lit(False))}, {}).alias("al"),
        reg.get("any")({"data": F.array(F.lit(True), F.lit(False))}, {}).alias("an"),
        reg.get("date_shift")({"date": t, "value": 1, "unit": "month"}, {}).alias("dm"),
        reg.get("date_shift")({"date": t, "value": -2, "unit": "hour"}, {}).alias("dh"),
        reg.get("date_difference")(
            {"date1": t, "date2": F.lit("2024-01-31 13:00:00")}, {}
        ).alias("dd"),
    ).collect()[0]
    assert row["c"] is True
    assert row["f"] == 2 and row["fm"] is None
    assert row["ap"] == [1.0, 2.0, 3.0, 4.0]
    assert row["cc"] == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
    assert row["al"] is False and row["an"] is True
    # month-end clamp AND time of day preserved
    assert str(row["dm"]) == "2024-02-29 12:00:00"
    assert str(row["dh"]) == "2024-01-31 10:00:00"
    assert row["dd"] == 3600.0


def test_array_apply_filter_with_subgraph_callback(spark):
    """array_apply / array_filter run their callback sub-graph as a
    Catalyst lambda — verified through a full process graph, including
    the `index` parameter."""
    import pyspark.sql.functions as F

    graph = {
        "arr": {
            "process_id": "array_create",
            "arguments": {"data": [1.0, 2.0, 3.0, 4.0]},
        },
        "doubled": {
            "process_id": "array_apply",
            "arguments": {
                "data": {"from_node": "arr"},
                "process": {
                    "process_graph": {
                        "m": {
                            "process_id": "multiply",
                            "arguments": {"x": {"from_parameter": "x"}, "y": 2.0},
                            "result": True,
                        }
                    }
                },
            },
        },
        "big": {
            "process_id": "array_filter",
            "arguments": {
                "data": {"from_node": "doubled"},
                "process": {
                    "process_graph": {
                        "g": {
                            "process_id": "gt",
                            "arguments": {"x": {"from_parameter": "x"}, "y": 4.0},
                            "result": True,
                        }
                    }
                },
            },
            "result": True,
        },
    }
    col = execute_graph(graph, spark, SF_DIR)
    row = spark.range(1).select(col.alias("out")).collect()[0]
    assert row["out"] == [6.0, 8.0]


def test_registry_later_registration_wins():
    reg = default_registry()
    reg.register("eq", lambda a, c: "overridden")
    assert reg.get("eq")({}, {}) == "overridden"


def test_unknown_process_raises():
    reg = default_registry()
    with pytest.raises(KeyError, match="not registered"):
        reg.get("definitely_not_a_process")


def test_graph_executes_composed_plan(spark):
    graph = {
        "load": {"process_id": "load_collection", "arguments": {"id": "events"}},
        "f": {
            "process_id": "filter_bands",
            "arguments": {"data": {"from_node": "load"}, "bands": ["click"]},
        },
        "r": {
            "process_id": "reduce_dimension",
            "arguments": {
                "data": {"from_node": "f"},
                "dimension": "time",
                "reducer": "count",
            },
            "result": True,
        },
    }
    cube = execute_graph(graph, spark, SF_DIR)
    rows = cube.df.collect()
    assert len(rows) > 0
    assert set(cube.dims.keys()) == {"bands", "geometry"}


def test_graph_subgraph_reducer_compiles_to_column(spark):
    graph = {
        "load": {"process_id": "load_collection", "arguments": {"id": "events"}},
        "r": {
            "process_id": "reduce_dimension",
            "arguments": {
                "data": {"from_node": "load"},
                "dimension": "time",
                "reducer": {
                    "process_graph": {
                        "m": {
                            "process_id": "mean",
                            "arguments": {"data": {"from_parameter": "data"}},
                            "result": True,
                        }
                    }
                },
            },
            "result": True,
        },
    }
    cube = execute_graph(graph, spark, SF_DIR)
    assert cube.df.count() > 0


def test_graph_requires_single_result():
    with pytest.raises(ValueError, match="exactly one result"):
        execute_graph({"a": {"process_id": "eq", "arguments": {}}}, None, "")


def test_graph_unbound_parameter():
    graph = {
        "r": {
            "process_id": "not",
            "arguments": {"x": {"from_parameter": "ghost"}},
            "result": True,
        }
    }
    with pytest.raises(KeyError, match="unbound parameter"):
        execute_graph(graph, None, "")


# --- MLM descriptor -------------------------------------------------------


def _item(framework="pytorch", exts=None):
    return {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": exts
        if exts is not None
        else ["https://stac-extensions.github.io/mlm/v1.4.0/schema.json"],
        "id": "m",
        "properties": {
            "mlm:name": "m",
            "mlm:architecture": "CNN",
            "mlm:tasks": ["classification"],
            "mlm:framework": framework,
            "mlm:input": [
                {
                    "name": "bands",
                    "bands": ["red", "nir"],
                    "input": {
                        "shape": [-1, 2, 4, 4],
                        "dim_order": ["batch", "bands", "x", "y"],
                        "data_type": "float32",
                    },
                }
            ],
            "mlm:output": [
                {
                    "name": "out",
                    "tasks": ["classification"],
                    "result": {
                        "shape": [-1, 1],
                        "dim_order": ["batch", "out"],
                        "data_type": "float32",
                    },
                }
            ],
        },
        "assets": {
            "weights": {"href": "file:///w.pt", "roles": ["mlm:model"]},
        },
    }


def test_load_stac_ml_parses_and_selects_asset():
    d = load_stac_ml(_item())
    assert d.framework == "pytorch"
    assert d.model_asset_href == "file:///w.pt"
    assert d.input.shape == [-1, 2, 4, 4]
    assert [b.name for b in d.input.bands] == ["red", "nir"]


def test_load_stac_ml_rejects_missing_extension():
    with pytest.raises(ValueError, match="STAC-MLM"):
        load_stac_ml(_item(exts=[]))


def test_load_stac_ml_rejects_unknown_framework():
    with pytest.raises(ValueError, match="unsupported framework"):
        load_stac_ml(_item(framework="tensorflow-quantum"))


def test_load_stac_ml_index_bounds():
    with pytest.raises(IndexError):
        load_stac_ml(_item(), input_index=3)


def _descriptor():
    item = _item()
    return MLModelDescriptor(
        item=item,
        input=ModelInput.parse(item["properties"]["mlm:input"][0]),
        output=ModelOutput.parse(item["properties"]["mlm:output"][0]),
        framework="pytorch",
    )


def test_validation_dims_present():
    check_dimensions_present(_descriptor(), ["time", "bands", "x", "y"])
    with pytest.raises(ValueError, match="lacks model dims"):
        check_dimensions_present(_descriptor(), ["time", "bands", "x"])


def test_validation_dim_sizes():
    check_dimension_sizes(_descriptor(), {"x": 8, "y": 4})
    with pytest.raises(ValueError, match="size 3 < model input 4"):
        check_dimension_sizes(_descriptor(), {"x": 8, "y": 3})


def test_validation_bands_alias_resolved():
    m = check_bands_available(_descriptor(), ["B04", "B08", "SCL"])
    assert m == {"red": "B04", "nir": "B08"}
    with pytest.raises(ValueError, match="lacks model bands"):
        check_bands_available(_descriptor(), ["B02"])


# --- processing expressions ----------------------------------------------


def test_python_expression_resolves_function():
    fn = resolve_python_expression("numpy:sqrt")
    assert fn(4.0) == 2.0


def test_python_expression_resolves_method_path():
    fn = resolve_python_expression("numpy:ndarray.sum")
    import numpy as np

    assert fn(np.array([1, 2, 3])) == 6


def test_expression_allowlist_enforced():
    with pytest.raises(PermissionError, match="allowlist"):
        resolve_python_expression("os:system")


def test_expression_bad_format():
    with pytest.raises(ValueError, match="pkg.module:func"):
        resolve_python_expression("numpy.sqrt")


@pytest.mark.parametrize("fmt", ["uri", "docker", "rio-calc", "openeo", "gdal-calc"])
def test_unsupported_formats(fmt):
    with pytest.raises(NotImplementedError):
        run_process_expression(fmt, "x", None)


def test_python_format_runs():
    assert run_process_expression("python", "numpy:abs", -3) == 3


def test_expressions_disabled_by_default(monkeypatch):
    """Without the env opt-in (conftest sets it for the suite) the
    resolver refuses ALL expressions — matching the reference's gated
    posture — and the error tells the operator exactly how to enable,
    including the executor-side requirement."""
    monkeypatch.delenv("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", raising=False)
    from openeo_processes_dask_ml_spark.utils.proc_expression import (
        expressions_enabled,
    )

    assert not expressions_enabled()
    with pytest.raises(PermissionError) as exc:
        resolve_python_expression("numpy:sqrt")
    msg = str(exc.value)
    assert "OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS=1" in msg
    assert "spark.executorEnv" in msg
    # junk values don't enable either
    monkeypatch.setenv("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", "yes")
    assert not expressions_enabled()
    monkeypatch.setenv("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", "1")
    assert expressions_enabled()


def test_expression_per_call_enabled_override(monkeypatch):
    """ADVICE r12: enabled=True is a per-call override that never
    touches os.environ (thread-safe for gate queries); enabled=False
    force-disables even when the env flag is on; the allowlist is
    enforced regardless of the override."""
    import os

    monkeypatch.delenv("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", raising=False)
    fn = resolve_python_expression("numpy:sqrt", enabled=True)
    assert fn(9.0) == 3.0
    assert "OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS" not in os.environ
    monkeypatch.setenv("OPENEO_SPARK_ENABLE_PROC_EXPRESSIONS", "1")
    with pytest.raises(PermissionError, match="disabled"):
        resolve_python_expression("numpy:sqrt", enabled=False)
    with pytest.raises(PermissionError, match="allowlist"):
        resolve_python_expression("os:system", enabled=True)


def test_graph_dimension_manipulation_pipeline(spark):
    """add_dimension -> rename_dimension -> rename_labels -> trim_cube
    compose through the executor."""
    graph = {
        "load": {"process_id": "load_collection", "arguments": {"id": "events"}},
        "add": {
            "process_id": "add_dimension",
            "arguments": {"data": {"from_node": "load"}, "name": "source",
                          "label": "sensor_a"},
        },
        "ren": {
            "process_id": "rename_dimension",
            "arguments": {"data": {"from_node": "add"}, "source": "source",
                          "target": "origin"},
        },
        "lab": {
            "process_id": "rename_labels",
            "arguments": {"data": {"from_node": "ren"}, "dimension": "origin",
                          "target": ["sensor_b"], "source": ["sensor_a"]},
        },
        "trim": {
            "process_id": "trim_cube",
            "arguments": {"data": {"from_node": "lab"}},
            "result": True,
        },
    }
    cube = execute_graph(graph, spark, SF_DIR)
    assert "origin" in cube.dims
    row = cube.df.select(cube.dim_col("origin")).distinct().collect()
    assert [r[0] for r in row] == ["sensor_b"]


def test_graph_new_round3_processes(spark):
    """aggregate_temporal (explicit intervals), apply_neighborhood and
    resample_cube_spatial execute through the graph registry."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    reg = default_registry()
    graph = {
        "load": {"process_id": "load_collection", "arguments": {"id": "events"}},
        "agg": {
            "process_id": "aggregate_temporal",
            "arguments": {
                "data": {"from_node": "load"},
                "intervals": [
                    ("2024-01-01", "2024-01-16"),
                    ("2024-01-16", "2024-01-31"),
                ],
                "labels": ["h1", "h2"],
                "reducer": "median",
            },
            "result": True,
        },
    }
    cube = execute_graph(graph, spark, SF_DIR)
    labels = {r[0] for r in cube.df.select(cube.dim_col("time")).distinct().collect()}
    assert labels == {"h1", "h2"}

    raster = CubeFrame(
        spark.createDataFrame(
            [(float(x), float(y), float(x)) for x in range(4) for y in range(4)],
            ["x", "y", "value"],
        ),
        {"x": "x", "y": "y"}, "value",
    )
    focal = reg.get("apply_neighborhood")(
        {"data": raster, "size": [{"value": 3}, {"value": 3}], "reducer": "max"},
        {},
    )
    got = {(r["x"], r["y"]): r["value"] for r in focal.df.collect()}
    assert got[(0.0, 0.0)] == 1.0 and got[(3.0, 3.0)] == 3.0

    target = CubeFrame(
        spark.createDataFrame(
            [(0.0, 0.0, 0.0), (2.0, 2.0, 0.0)], ["x", "y", "value"]
        ),
        {"x": "x", "y": "y"}, "value",
    )
    coarse = reg.get("resample_cube_spatial")(
        {"data": raster, "target": target, "method": "count"}, {}
    )
    assert coarse.df.count() <= 9


def test_graph_resample_and_kernel_registered(spark):
    """resample_spatial and apply_kernel execute from a process graph
    over a small synthetic raster cube."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [(float(x), float(y), 1.0) for x in range(4) for y in range(4)],
        ["x", "y", "value"],
    )
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    reg = default_registry()
    out = reg.get("resample_spatial")(
        {"data": cube, "resolution": 2.0}, {}
    )
    assert out.df.count() == 4
    k = reg.get("apply_kernel")(
        {"data": cube, "kernel": [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]},
        {},
    )
    # interior cells of a constant raster convolve to 0 under laplacian
    interior = {r["value"] for r in k.df.filter(
        (k.df.x > 0) & (k.df.x < 3) & (k.df.y > 0) & (k.df.y < 3)).collect()}
    assert interior == {0.0}


def test_new_scalar_processes(spark):
    """arctan2/hyperbolics/is_infinite/date_between compile to the
    expected Column results."""
    import math

    from pyspark.sql import functions as F

    reg = default_registry()
    df = spark.range(1).select(
        F.lit(1.0).alias("one"), F.lit(0.5).alias("half")
    )
    row = df.select(
        reg.get("arctan2")({"y": F.col("one"), "x": F.col("one")}, {}).alias("a2"),
        reg.get("sinh")({"x": F.col("one")}, {}).alias("sh"),
        reg.get("cosh")({"x": F.col("one")}, {}).alias("ch"),
        reg.get("tanh")({"x": F.col("one")}, {}).alias("th"),
        reg.get("arsinh")({"x": F.col("one")}, {}).alias("ash"),
        reg.get("arcosh")({"x": F.col("one")}, {}).alias("ach"),
        reg.get("artanh")({"x": F.col("half")}, {}).alias("ath"),
        reg.get("is_infinite")({"x": F.lit(float("inf"))}, {}).alias("inf1"),
        reg.get("is_infinite")({"x": F.col("one")}, {}).alias("inf0"),
    ).collect()[0]
    assert abs(row["a2"] - math.pi / 4) < 1e-12
    assert abs(row["sh"] - math.sinh(1)) < 1e-12
    assert abs(row["ch"] - math.cosh(1)) < 1e-12
    assert abs(row["th"] - math.tanh(1)) < 1e-12
    assert abs(row["ash"] - math.asinh(1)) < 1e-12
    assert abs(row["ach"] - math.acosh(1)) < 1e-12
    assert abs(row["ath"] - math.atanh(0.5)) < 1e-12
    assert row["inf1"] is True and row["inf0"] is False

    db = reg.get("date_between")
    r = spark.range(1).select(
        db({"x": F.lit("2024-01-15"), "min": F.lit("2024-01-01"),
            "max": F.lit("2024-01-15")}, {}).alias("incl"),
        db({"x": F.lit("2024-01-15"), "min": F.lit("2024-01-01"),
            "max": F.lit("2024-01-15"), "exclude_max": True}, {}).alias("excl"),
    ).collect()[0]
    assert r["incl"] is True and r["excl"] is False


def test_array_modify_and_labels(spark):
    from pyspark.sql import functions as F

    reg = default_registry()
    arr = F.array(*[F.lit(v) for v in [10, 20, 30, 40]])
    row = spark.range(1).select(
        reg.get("array_modify")(
            {"data": arr, "values": [99], "index": 1, "length": 2}, {}
        ).alias("replaced"),
        reg.get("array_modify")(
            {"data": arr, "values": [1, 2], "index": 0, "length": 0}, {}
        ).alias("inserted"),
        reg.get("array_modify")(
            {"data": arr, "index": 3, "length": 1}, {}
        ).alias("removed"),
        reg.get("array_labels")({"data": arr}, {}).alias("labels"),
    ).collect()[0]
    assert row["replaced"] == [10, 99, 40]
    assert row["inserted"] == [1, 2, 10, 20, 30, 40]
    assert row["removed"] == [10, 20, 30]
    assert row["labels"] == [0, 1, 2, 3]


def test_first_last_extrema_reducers(spark):
    """first/last/extrema work as reduce_dimension reducers through the
    registry (first/last follow label order via the cube's own sort)."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 2.0, 30.0), ("a", 3.0, 20.0)],
        ["band", "t", "value"],
    )
    cube = CubeFrame(df, {"bands": "band", "time": "t"}, "value")
    ext = cube.reduce_dimension("time", "extrema")
    assert ext.df.collect()[0]["value"] == [10.0, 30.0]


def test_polygon_processes_registered(spark):
    """mask_polygon / filter_spatial / apply_polygon execute through the
    registry; apply_polygon raises on overlapping polygons."""
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [(float(x), float(y), float(x + y)) for x in range(4) for y in range(4)],
        ["x", "y", "value"],
    )
    cube = CubeFrame(df, {"x": "x", "y": "y"}, "value")
    reg = default_registry()
    square = [(1, "POLYGON ((-0.5 -0.5, 1.5 -0.5, 1.5 1.5, -0.5 1.5, -0.5 -0.5))")]

    kept = reg.get("filter_spatial")({"data": cube, "geometries": square}, {})
    assert kept.df.count() == 4  # the 2x2 corner

    masked = reg.get("mask_polygon")({"data": cube, "mask": square}, {})
    assert masked.df.filter(masked.df.value.isNotNull()).count() == 4

    doubled = reg.get("apply_polygon")(
        {
            "data": cube,
            "polygons": square,
            "process": lambda x: x * 2,
            "mask_value": -1.0,
        },
        {},
    )
    got = {(r["x"], r["y"]): r["value"] for r in doubled.df.collect()}
    assert got[(1.0, 1.0)] == 4.0  # inside: doubled
    assert got[(3.0, 3.0)] == -1.0  # outside: mask_value

    overlapping = square + [
        (2, "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))")
    ]
    with _pytest.raises(ValueError, match="GeometriesOverlap"):
        reg.get("apply_polygon")(
            {"data": cube, "polygons": overlapping,
             "process": lambda x: x}, {},
        )


def test_registry_openeo_spec_parity():
    """The registry covers the openEO process surface the reference
    backend exposes (minibackend/openeo_minibackend.py:50-63 registers
    all of openeo-processes-dask): every spec process a graph from the
    reference ecosystem can name must resolve. Labeled-array, vector,
    UDF and SLURM processes are documented non-goals (SURVEY §7)."""
    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    required = {
        # cubes
        "load_collection", "load_stac", "save_result", "merge_cubes",
        "reduce_dimension", "apply", "apply_dimension", "apply_kernel",
        "apply_neighborhood", "apply_polygon", "add_dimension",
        "drop_dimension", "rename_dimension", "rename_labels",
        "dimension_labels", "trim_cube", "flatten_dimensions",
        "unflatten_dimension", "filter_bands", "filter_bbox",
        "filter_labels", "filter_spatial", "filter_temporal",
        "aggregate_spatial", "aggregate_spatial_window",
        "aggregate_temporal", "aggregate_temporal_period",
        "resample_cube_spatial", "resample_cube_temporal",
        "resample_spatial", "mask", "mask_polygon", "ndvi",
        "climatological_normal", "anomaly", "fit_curve", "predict_curve",
        "inspect",
        # ML (reference's own additions)
        "load_stac_ml", "ml_fit", "ml_predict", "mlm_class_random_forest",
        "save_ml_model",
        # math / comparison / logic
        "absolute", "add", "subtract", "multiply", "divide", "mod",
        "power", "sqrt", "exp", "ln", "log", "floor", "ceil", "int",
        "round", "clip", "sgn", "min", "max", "mean", "median", "sum",
        "product", "sd", "variance", "quantiles", "extrema", "e", "pi",
        "constant", "linear_scale_range", "normalized_difference",
        "eq", "neq", "gt", "gte", "lt", "lte", "between", "if", "and",
        "or", "xor", "not", "all", "any", "is_nan", "is_nodata",
        "is_valid", "is_infinite",
        # trig
        "cos", "sin", "tan", "arccos", "arcsin", "arctan", "arctan2",
        "cosh", "sinh", "tanh", "arcosh", "arsinh", "artanh",
        # arrays
        "array_element", "array_create", "array_concat", "array_append",
        "array_contains", "array_find", "array_labels", "array_apply",
        "array_filter", "array_modify", "array_length", "count",
        "first", "last", "order", "rearrange", "sort",
        "cumsum", "cumproduct", "cummax", "cummin",
        # text / date
        "text_begins", "text_contains", "text_ends", "text_concat",
        "date_shift", "date_between", "date_difference",
        # interpolation / UDF
        "array_interpolate_linear", "run_udf",
    }
    have = set(default_registry().process_ids())
    missing = sorted(required - have)
    assert not missing, f"registry missing openEO processes: {missing}"


def test_cumulative_array_processes(spark):
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    df = spark.createDataFrame(
        [([1.0, 3.0, None, 3.0],)], "data array<double>"
    )
    out = df.select(
        reg.get("cumsum")({"data": F.col("data")}, {}).alias("s"),
        reg.get("cumsum")({"data": F.col("data"), "ignore_nodata": False}, {}).alias("s_strict"),
        reg.get("cumproduct")({"data": F.col("data")}, {}).alias("p"),
        reg.get("cummax")({"data": F.col("data")}, {}).alias("mx"),
        reg.get("cummin")({"data": F.col("data")}, {}).alias("mn"),
        reg.get("array_length")({"data": F.col("data")}, {}).alias("n"),
    ).collect()[0]
    assert out["s"] == [1.0, 4.0, None, 7.0]          # spec example
    assert out["s_strict"] == [1.0, 4.0, None, None]  # nodata poisons
    assert out["p"] == [1.0, 3.0, None, 9.0]
    assert out["mx"] == [1.0, 3.0, None, 3.0]
    assert out["mn"] == [1.0, 1.0, None, 1.0]
    assert out["n"] == 4


def test_run_udf_numpy_callable(spark):
    """run_udf resolves an allowlisted pkg.module:func and applies it
    per Arrow batch over the cube values."""
    import math

    import pytest as _pytest

    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    cube = CubeFrame(
        spark.createDataFrame([(1, 4.0), (2, 9.0), (3, 16.0)], ["t", "value"]),
        {"time": "t"},
        "value",
    )
    out = reg.get("run_udf")(
        {"data": cube, "udf": "numpy:sqrt", "runtime": "Python"}, {}
    )
    got = {r["t"]: r["value"] for r in out.df.collect()}
    assert got == {1: 2.0, 2: 3.0, 3: 4.0}
    assert math.isclose(sum(got.values()), 9.0)
    # non-allowlisted package refused
    with _pytest.raises(PermissionError):
        reg.get("run_udf")({"data": cube, "udf": "os:system"}, {})
    # non-python runtime gated
    with _pytest.raises(NotImplementedError):
        reg.get("run_udf")({"data": cube, "udf": "numpy:sqrt", "runtime": "R"}, {})


def test_graph_cycle_and_unknown_node_errors(spark):
    cyclic = {
        "a": {"process_id": "add",
              "arguments": {"x": {"from_node": "b"}, "y": 1}},
        "b": {"process_id": "add",
              "arguments": {"x": {"from_node": "a"}, "y": 1}, "result": True},
    }
    with pytest.raises(ValueError, match="cycle"):
        execute_graph(cyclic, spark, SF_DIR)
    dangling = {
        "a": {"process_id": "add",
              "arguments": {"x": {"from_node": "nope"}, "y": 1}, "result": True},
    }
    with pytest.raises(KeyError, match="unknown node"):
        execute_graph(dangling, spark, SF_DIR)


def test_cumulative_processes_empty_and_all_null(spark):
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    df = spark.createDataFrame(
        [(1, []), (2, [None, None])], "i long, data array<double>"
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            reg.get("cumsum")({"data": F.col("data")}, {}).alias("s"),
            reg.get("cummin")({"data": F.col("data")}, {}).alias("mn"),
            reg.get("array_length")({"data": F.col("data")}, {}).alias("n"),
        ).collect()
    }
    assert out[1]["s"] == [] and out[1]["n"] == 0
    assert out[2]["s"] == [None, None] and out[2]["mn"] == [None, None]


def test_expression_named_callable_narrowing():
    """External roots (numpy/math) resolve only exact named callables
    (ADVICE r5): an unlisted-but-importable numpy attr is refused even
    though the package root is allowlisted."""
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.utils.proc_expression import (
        resolve_python_expression as _resolve,
    )

    with _pytest.raises(PermissionError, match="named callable"):
        _resolve("numpy:load")  # file loader: importable, not allowlisted
    with _pytest.raises(PermissionError, match="named callable"):
        _resolve("numpy.lib.npyio:load")
    # own-package callables stay prefix-allowed
    fn = _resolve(
        "openeo_processes_dask_ml_spark.utils.proc_expression:expressions_enabled"
    )
    assert callable(fn)


def test_execute_graph_file_both_wrappers(spark, tmp_path):
    """File execution (reference minibackend execute_graph_file): the
    bare node dict and the openEO job wrapper {"process_graph": ...}
    both load and run."""
    import json

    from openeo_processes_dask_ml_spark.graph.executor import (
        execute_graph_file,
    )

    graph = {
        "add1": {
            "process_id": "add",
            "arguments": {"x": 2, "y": 3},
            "result": True,
        }
    }
    bare = tmp_path / "bare.json"
    bare.write_text(json.dumps(graph))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"process_graph": graph}))
    for p in (bare, wrapped):
        col = execute_graph_file(str(p), spark, SF_DIR)
        assert spark.range(1).select(col.alias("v")).collect()[0]["v"] == 5


def test_expression_prefix_root_cannot_launder_stdlib():
    """The prefix-allowed engine root must not expose re-exported
    stdlib callables (review finding): attribute traversal may not step
    into modules, and the resolved callable must be DEFINED in the
    engine package — 'pkg.module:os.system' and re-exported outside
    callables are both refused."""
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.utils.proc_expression import (
        resolve_python_expression as _resolve,
    )

    # os is importable inside engine modules — traversal must refuse it
    with _pytest.raises(PermissionError, match="traverses into module"):
        _resolve(
            "openeo_processes_dask_ml_spark.utils.proc_expression:os.system"
        )
    # a submodule alias also trips the traversal guard
    with _pytest.raises(PermissionError, match="traverses into module"):
        _resolve(
            "openeo_processes_dask_ml_spark.utils.proc_expression:"
            "importlib.import_module"
        )
    # a foreign callable bound directly into an engine module namespace
    # is refused by the definition-owner check
    import os as _os

    from openeo_processes_dask_ml_spark.utils import proc_expression as _pe

    _pe._test_foreign = _os.path.join
    try:
        with _pytest.raises(PermissionError, match="outside the"):
            _resolve(
                "openeo_processes_dask_ml_spark.utils.proc_expression:"
                "_test_foreign"
            )
    finally:
        del _pe._test_foreign
    # genuine engine callables still resolve
    assert callable(
        _resolve(
            "openeo_processes_dask_ml_spark.utils.proc_expression:"
            "expressions_enabled"
        )
    )


def test_load_stac_open_ended_temporal_extent(spark, monkeypatch):
    """ADVICE r8: openEO open-ended temporal extents (null ends) must
    render as the STAC API '..' spelling, and a fully open extent must
    omit the datetime filter entirely — never the literal 'None'."""
    from openeo_processes_dask_ml_spark.io import raster as raster_mod

    seen = []

    def fake_load_stac_cube(spark_, route, fetcher=None, **kw):
        seen.append(kw.get("datetime_range"))
        return "cube"

    monkeypatch.setattr(raster_mod, "load_stac_cube", fake_load_stac_cube)
    reg = default_registry()
    ctx = {"spark": spark, "stac_fetcher": lambda href: b""}
    base = {
        "url": (
            "https://earth-search.aws.element84.com/v1/collections/"
            "sentinel-2-l2a"
        ),
    }
    for te, want in [
        (["2020-01-01", None], "2020-01-01/.."),
        ([None, "2021-06-30"], "../2021-06-30"),
        ([None, None], None),
        (["2020-01-01", "2020-02-01"], "2020-01-01/2020-02-01"),
        (None, None),
    ]:
        reg.get("load_stac")(dict(base, temporal_extent=te), ctx)
    assert seen == [
        "2020-01-01/..", "../2021-06-30", None,
        "2020-01-01/2020-02-01", None,
    ]
