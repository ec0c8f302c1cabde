"""Process registry: process_id -> DataFrame-transform builder.

Mirrors the reference's ProcessRegistry (later registration wins,
minibackend/openeo_minibackend.py:22-71) with two process classes:

- cube processes take/return CubeFrame and compose the logical plan;
- scalar processes operate on Spark Columns/literals, so reducer and
  mask sub-graphs compile to Column *expressions* that fuse into
  whole-stage codegen — never per-row interpreted Python.

Reducer callbacks receive their array parameter in two shapes:
aggregation context binds ``data`` to a Column plus an ``_agg`` marker
(median/mean/... become aggregate functions); array-indexing context
(array_element) binds ``data`` to a collected sorted array Column.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.cube import CubeFrame, REDUCERS
from openeo_processes_dask_ml_spark.io.load import load_collection, save_result
from openeo_processes_dask_ml_spark.operators.arrays import array_interpolate_linear
from openeo_processes_dask_ml_spark.operators.indices import ndvi


class ProcessRegistry:
    def __init__(self):
        self._impls: dict[str, Callable[[dict, dict], Any]] = {}

    def register(self, process_id: str, impl: Callable[[dict, dict], Any]) -> None:
        # later registration wins (reference openeo_minibackend.py:50-63)
        self._impls[process_id] = impl

    def get(self, process_id: str) -> Callable[[dict, dict], Any]:
        if process_id not in self._impls:
            raise KeyError(
                f"process {process_id!r} not registered; known: {sorted(self._impls)}"
            )
        return self._impls[process_id]

    def process_ids(self) -> list[str]:
        return sorted(self._impls)


# -- scalar processes (Column algebra) --------------------------------------


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def _curve_t_fn(df, colname: str) -> Callable[[Column], Column]:
    """t mapping for fit_curve/predict_curve: timestamp dims become
    fractional days since epoch, numeric dims pass through as double."""
    dtype = dict(df.dtypes).get(colname, "")
    if "timestamp" in dtype or "date" in dtype:
        return lambda c: F.unix_timestamp(c) / F.lit(86400.0)
    return lambda c: c.cast("double")


_SCALAR_BINARY = {
    "eq": lambda x, y: _c(x) == _c(y),
    "neq": lambda x, y: _c(x) != _c(y),
    "gt": lambda x, y: _c(x) > _c(y),
    "gte": lambda x, y: _c(x) >= _c(y),
    "lt": lambda x, y: _c(x) < _c(y),
    "lte": lambda x, y: _c(x) <= _c(y),
    "add": lambda x, y: _c(x) + _c(y),
    "subtract": lambda x, y: _c(x) - _c(y),
    "multiply": lambda x, y: _c(x) * _c(y),
    "divide": lambda x, y: _c(x) / _c(y),
    "mod": lambda x, y: _c(x) % _c(y),
    "power": lambda x, y: F.pow(_c(x), _c(y)),
}


def _register_scalars(reg: ProcessRegistry) -> None:
    for pid, fn in _SCALAR_BINARY.items():
        def impl(args, ctx, fn=fn):
            return fn(args["x"], args["y"])

        reg.register(pid, impl)

    reg.register("and", lambda a, c: _c(a["x"]) & _c(a["y"]))
    reg.register("or", lambda a, c: _c(a["x"]) | _c(a["y"]))
    reg.register("xor", lambda a, c: _c(a["x"]) != _c(a["y"]))
    reg.register("not", lambda a, c: ~_c(a["x"]))
    reg.register("absolute", lambda a, c: F.abs(_c(a["x"])))
    reg.register("sqrt", lambda a, c: F.sqrt(_c(a["x"])))
    reg.register("ln", lambda a, c: F.log(_c(a["x"])))
    reg.register("log", lambda a, c: F.log(float(a.get("base", 10)), _c(a["x"])))
    reg.register("exp", lambda a, c: F.exp(_c(a["p"] if "p" in a else a["x"])))
    reg.register("floor", lambda a, c: F.floor(_c(a["x"])))
    reg.register("ceil", lambda a, c: F.ceil(_c(a["x"])))
    reg.register("int", lambda a, c: _c(a["x"]).cast("long"))
    # openEO 'round' is specified as round-half-to-even — bround, not
    # F.round (which is HALF_UP on the decimal repr and diverges from
    # spec-compliant backends at half boundaries)
    reg.register(
        "round",
        lambda a, c: F.bround(_c(a["x"]), int(a.get("p", 0))),
    )
    reg.register("sgn", lambda a, c: F.signum(_c(a["x"])))
    reg.register("sin", lambda a, c: F.sin(_c(a["x"])))
    reg.register("cos", lambda a, c: F.cos(_c(a["x"])))
    reg.register("tan", lambda a, c: F.tan(_c(a["x"])))
    reg.register("arcsin", lambda a, c: F.asin(_c(a["x"])))
    reg.register("arccos", lambda a, c: F.acos(_c(a["x"])))
    reg.register("arctan", lambda a, c: F.atan(_c(a["x"])))
    reg.register("pi", lambda a, c: F.lit(3.141592653589793))
    reg.register("e", lambda a, c: F.lit(2.718281828459045))
    # openEO arctan2(y, x): angle of the vector (x, y)
    reg.register("arctan2", lambda a, c: F.atan2(_c(a["y"]), _c(a["x"])))
    reg.register("sinh", lambda a, c: F.sinh(_c(a["x"])))
    reg.register("cosh", lambda a, c: F.cosh(_c(a["x"])))
    reg.register("tanh", lambda a, c: F.tanh(_c(a["x"])))
    reg.register("arsinh", lambda a, c: F.asinh(_c(a["x"])))
    reg.register("arcosh", lambda a, c: F.acosh(_c(a["x"])))
    reg.register("artanh", lambda a, c: F.atanh(_c(a["x"])))
    reg.register(
        "is_infinite",
        lambda a, c: F.abs(_c(a["x"]).cast("double")) == F.lit(float("inf")),
    )
    reg.register("is_nan", lambda a, c: F.isnan(_c(a["x"])))
    reg.register("is_nodata", lambda a, c: _c(a["x"]).isNull())
    reg.register("is_valid", lambda a, c: _c(a["x"]).isNotNull() & ~F.isnan(_c(a["x"])))
    reg.register(
        "between",
        lambda a, c: (_c(a["x"]) >= _c(a["min"])) & (_c(a["x"]) <= _c(a["max"])),
    )
    reg.register(
        "clip",
        lambda a, c: F.least(F.greatest(_c(a["x"]), _c(a["min"])), _c(a["max"])),
    )
    reg.register(
        "linear_scale_range",
        lambda a, c: (
            (_c(a["x"]) - _c(a["inputMin"]))
            / (_c(a["inputMax"]) - _c(a["inputMin"]))
            * (_c(a.get("outputMax", 1)) - _c(a.get("outputMin", 0)))
            + _c(a.get("outputMin", 0))
        ),
    )
    reg.register(
        "normalized_difference",
        lambda a, c: (_c(a["x"]) - _c(a["y"])) / (_c(a["x"]) + _c(a["y"])),
    )
    reg.register(
        "if",
        lambda a, c: F.when(_c(a["value"]), _c(a["accept"])).otherwise(
            _c(a.get("reject"))
        ),
    )
    reg.register("constant", lambda a, c: F.lit(a["x"]))
    reg.register("text_concat", lambda a, c: F.concat_ws(str(a.get("separator", "")), *[_c(x) for x in a["data"]]))
    reg.register("text_contains", lambda a, c: _c(a["data"]).contains(a["pattern"]))
    reg.register("text_begins", lambda a, c: _c(a["data"]).startswith(a["pattern"]))
    reg.register("text_ends", lambda a, c: _c(a["data"]).endswith(a["pattern"]))
    reg.register(
        "array_element",
        lambda a, c: F.element_at(
            a["data"], int(a.get("index", 0)) + 1  # openEO is 0-based
        ),
    )
    reg.register("array_create", lambda a, c: F.array(*[_c(x) for x in a["data"]]))
    reg.register("count_in_array", lambda a, c: F.size(a["data"]))
    reg.register(
        "array_contains", lambda a, c: F.array_contains(a["data"], _c(a["value"]))
    )
    # openEO array_find: 0-based index of the FIRST match, null if absent
    reg.register(
        "array_find",
        lambda a, c: F.when(
            F.array_position(a["data"], _c(a["value"])) > 0,
            F.array_position(a["data"], _c(a["value"])) - 1,
        ),
    )
    reg.register(
        "array_concat", lambda a, c: F.concat(a["array1"], a["array2"])
    )
    reg.register(
        "array_append",
        lambda a, c: F.concat(a["data"], F.array(_c(a["value"]))),
    )
    # openEO array_labels: label list of the array — 0-based indices for
    # unlabeled arrays (the only array representation here)
    reg.register(
        "array_labels",
        lambda a, c: F.sequence(F.lit(0), F.size(a["data"]) - 1),
    )

    # openEO array_modify: replace/insert/remove a segment —
    # data[0:index] ++ values ++ data[index+length:]
    def p_array_modify(args, ctx):
        data = args["data"]
        values = args.get("values")
        index = int(args["index"])
        length = int(args.get("length", 1))
        head = F.slice(data, 1, index)
        tail = F.slice(
            data,
            index + length + 1,
            F.greatest(F.size(data) - (index + length), F.lit(0)),
        )
        parts = [head]
        if values is not None:
            vals = (
                values
                if isinstance(values, Column)
                else F.array(*[_c(v) for v in values])
            )
            parts.append(vals)
        parts.append(tail)
        return F.concat(*parts)

    reg.register("array_modify", p_array_modify)
    reg.register(
        "all",
        lambda a, c: F.aggregate(
            a["data"], F.lit(True), lambda acc, x: acc & x.cast("boolean")
        ),
    )
    reg.register(
        "any",
        lambda a, c: F.aggregate(
            a["data"], F.lit(False), lambda acc, x: acc | x.cast("boolean")
        ),
    )
    # openEO date_shift: move a timestamp by an integer amount of a
    # unit, PRESERVING the time of day (date_add/add_months alone
    # return DATEs); month/year shifts clamp at month ends per spec.
    def p_date_shift(args, ctx):
        unit, n = args.get("unit", "day"), int(args["value"])
        t = _c(args["date"]).cast("timestamp")
        if unit in ("hour", "minute", "second"):
            secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
            return F.timestamp_seconds(F.unix_timestamp(t) + n * secs)
        if unit in ("day", "week"):
            days = n * (7 if unit == "week" else 1)
            return F.timestamp_seconds(F.unix_timestamp(t) + days * 86400)
        if unit in ("month", "year"):
            months = n * (12 if unit == "year" else 1)
            time_of_day = F.unix_timestamp(t) % 86400
            return F.timestamp_seconds(
                F.unix_timestamp(F.add_months(t, months).cast("timestamp"))
                + time_of_day
            )
        raise ValueError(f"unsupported date_shift unit {unit!r}")

    reg.register("date_shift", p_date_shift)
    # openEO date_between: x in [min, max], exclude_max makes the upper
    # bound exclusive
    def p_date_between(args, ctx):
        t = _c(args["x"]).cast("timestamp")
        lo = _c(args["min"]).cast("timestamp")
        hi = _c(args["max"]).cast("timestamp")
        upper = (t < hi) if args.get("exclude_max", False) else (t <= hi)
        return (t >= lo) & upper

    reg.register("date_between", p_date_between)
    reg.register(
        "date_difference",
        lambda a, c: (
            F.unix_timestamp(_c(a["date2"]).cast("timestamp"))
            - F.unix_timestamp(_c(a["date1"]).cast("timestamp"))
        ).cast("double"),
    )
    # openEO array_apply / array_filter: the callback sub-graph compiles
    # to a Column expression over the lambda variable, so these lower to
    # Catalyst transform()/filter() higher-order functions — per-element
    # logic without leaving the JVM.
    def _element_callback(a):
        cb = a["process"]
        if callable(cb):
            return cb
        raise ValueError("array_apply/array_filter need a callback process")

    def p_array_apply(args, ctx):
        cb = _element_callback(args)
        return F.transform(
            args["data"], lambda x, i: _c(cb(x=x, index=i))
        )

    def p_array_filter(args, ctx):
        cb = _element_callback(args)
        return F.filter(
            args["data"],
            lambda x, i: _c(cb(x=x, index=i)).cast("boolean"),
        )

    reg.register("array_apply", p_array_apply)
    reg.register("array_filter", p_array_filter)
    reg.register("array_length", lambda a, c: F.size(a["data"]))

    # openEO cumulative processes (cumsum/cumproduct/cummax/cummin):
    # result[i] aggregates data[0..i]; nulls stay null in place and are
    # skipped (ignore_nodata=True, the default) or poison the rest of
    # the series (False), per the spec's examples. Lowered to Catalyst
    # transform + slice + aggregate — O(k^2) in the ARRAY length, which
    # is a band/time axis (tens), never the row count.
    def _cumulative_impl(kind):
        def impl(args, ctx):
            data = args["data"]
            ignore = bool(args.get("ignore_nodata", True))

            def agg_prefix(i):
                prefix = F.slice(data, 1, i + 1)
                clean = F.filter(prefix, lambda v: v.isNotNull())
                if kind == "cumsum":
                    r = F.aggregate(
                        clean, F.lit(0.0), lambda acc, v: acc + v.cast("double")
                    )
                elif kind == "cumproduct":
                    r = F.aggregate(
                        clean, F.lit(1.0), lambda acc, v: acc * v.cast("double")
                    )
                elif kind == "cummax":
                    r = F.array_max(clean)
                else:
                    r = F.array_min(clean)
                if not ignore:
                    r = F.when(~F.exists(prefix, lambda v: v.isNull()), r)
                return r

            return F.transform(
                data, lambda x, i: F.when(x.isNotNull(), agg_prefix(i))
            )

        return impl

    for _kind in ("cumsum", "cumproduct", "cummax", "cummin"):
        reg.register(_kind, _cumulative_impl(_kind))
    # openEO array ordering processes. `sort` orders values; `order`
    # returns the permutation (0-based indices that would sort the
    # array); `rearrange` applies an index permutation. All pure
    # Catalyst: sort via array_sort, order via sorting (value, idx)
    # structs, rearrange via transform + element_at.
    reg.register(
        "sort",
        lambda a, c: F.array_sort(a["data"])
        if a.get("asc", True)
        else F.reverse(F.array_sort(a["data"])),
    )
    reg.register(
        "order",
        lambda a, c: F.transform(
            F.array_sort(
                F.zip_with(
                    a["data"],
                    F.sequence(F.lit(0), F.size(a["data"]) - 1),
                    lambda v, i: F.struct(v.alias("v"), i.alias("i")),
                )
            ),
            lambda s: s["i"],
        )
        if a.get("asc", True)
        else F.reverse(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        a["data"],
                        F.sequence(F.lit(0), F.size(a["data"]) - 1),
                        lambda v, i: F.struct(v.alias("v"), i.alias("i")),
                    )
                ),
                lambda s: s["i"],
            )
        ),
    )
    reg.register(
        "rearrange",
        lambda a, c: F.transform(
            a["order"], lambda i: F.element_at(a["data"], i.cast("int") + 1)
        ),
    )
    # reducers inside sub-graphs: data is bound to the value Column
    for name in ("median", "mean", "sum", "min", "max", "sd", "variance",
                 "count", "product", "first", "last", "extrema"):
        def impl(args, ctx, name=name):
            return REDUCERS[name](_c(args["data"]))

        reg.register(name, impl)


# -- cube processes ---------------------------------------------------------


def _as_reducer(callback_or_name) -> Callable[[Column], Column] | str:
    """A sub-graph callback compiles to Column -> Column; the executor
    hands us a python callable taking the bound parameter."""
    if callable(callback_or_name):
        return lambda col: callback_or_name(data=col)
    return callback_or_name


def _uses_array_ops(process_graph: dict | None) -> bool:
    """True if any node of the sub-graph indexes into the reduced
    array (positional semantics) rather than aggregating it."""
    if not process_graph:
        return False
    for node in process_graph.values():
        if node.get("process_id") in ("array_element", "count_in_array"):
            return True
        for v in node.get("arguments", {}).values():
            if isinstance(v, dict) and _uses_array_ops(v.get("process_graph")):
                return True
    return False


def _register_cubes(reg: ProcessRegistry) -> None:
    def p_load_collection(args, ctx):
        return load_collection(
            ctx["spark"],
            args.get("id") or args.get("collection_id"),
            ctx["sf_dir"],
            spatial_extent=args.get("spatial_extent"),
            temporal_extent=args.get("temporal_extent"),
            bands=args.get("bands"),
            properties=args.get("properties"),
        )

    def p_load_stac(args, ctx):
        """Graph-level ``load_stac`` (reference graph.json shape: full
        catalog URL + west/east/south/north spatial_extent). When the
        executor context carries a ``stac_fetcher`` and the URL routes
        to a known catalog, the REAL raster chain runs — catalog
        search -> distributed decode (io/raster.py::load_stac_cube),
        with ``stac_transport``/``stac_cache_dir`` also injectable —
        so the reference's own job files execute end-to-end offline
        under canned transports. Without a fetcher (the sandbox gate
        path) it falls back to the parquet-backed collection route."""
        from openeo_processes_dask_ml_spark.io.load import DATA_BACKENDS

        fetcher = ctx.get("stac_fetcher")
        url = args.get("url") or args.get("id") or args.get("collection_id")
        route = None
        if fetcher and isinstance(url, str):
            for backend, root in DATA_BACKENDS.items():
                prefix = root.rstrip("/") + "/collections/"
                if url.startswith(prefix):
                    coll = url[len(prefix) :].strip("/")
                    if coll and "/" not in coll:
                        route = f"{backend}/{coll}"
                    break
        if route is None:
            return p_load_collection(args, ctx)

        from openeo_processes_dask_ml_spark.io.raster import load_stac_cube

        se = args.get("spatial_extent") or {}
        bbox = None
        if {"west", "south", "east", "north"} <= set(se):
            bbox = [se["west"], se["south"], se["east"], se["north"]]
        # open-ended extents are standard openEO (['2020-01-01', null]);
        # the STAC API spelling for an open end is '..', and a fully
        # open extent means no datetime filter at all (ADVICE r8)
        te = args.get("temporal_extent")
        dtr = None
        if te and any(v is not None for v in te):
            dtr = "/".join(".." if v is None else str(v) for v in te)
        return load_stac_cube(
            ctx["spark"],
            route,
            fetcher,
            bbox=bbox,
            datetime_range=dtr,
            bands=args.get("bands"),
            properties=args.get("properties"),
            resolution=args.get("resolution"),
            projection=args.get("projection"),
            cache_dir=ctx.get("stac_cache_dir"),
            transport=ctx.get("stac_transport"),
        )

    def p_filter_bands(args, ctx):
        return args["data"].filter_bands(args["bands"])

    def p_filter_temporal(args, ctx):
        extent = args.get("extent") or [args.get("start"), args.get("end")]
        return args["data"].filter_temporal(extent[0], extent[1])

    def p_filter_labels(args, ctx):
        return args["data"].filter_labels(args["dimension"], args["labels"])

    def p_reduce_dimension(args, ctx):
        reducer = args["reducer"]
        # positional sub-graphs (array_element over the reduced dim,
        # reference examples/train_rf.py:62-103) get the whole-array
        # reducer; aggregation sub-graphs bind data to the value Column
        if callable(reducer) and _uses_array_ops(
            getattr(reducer, "process_graph", None)
        ):
            return args["data"].reduce_dimension_array(
                args["dimension"], lambda arr: reducer(data=arr)
            )
        return args["data"].reduce_dimension(
            args["dimension"], _as_reducer(reducer)
        )

    def p_aggregate_temporal_period(args, ctx):
        return args["data"].aggregate_temporal_period(
            args["period"], _as_reducer(args["reducer"])
        )

    def p_mask(args, ctx):
        return args["data"].mask(args["mask"], args.get("replacement"))

    def p_apply(args, ctx):
        cb = args["process"]
        return args["data"].apply(lambda col: cb(x=col))

    def p_ndvi(args, ctx):
        return ndvi(
            args["data"],
            nir=args.get("nir", "nir"),
            red=args.get("red", "red"),
            target_band=args.get("target_band"),
        )

    def p_interp(args, ctx):
        return array_interpolate_linear(args["data"], args.get("dimension", "time"))

    def p_merge_cubes(args, ctx):
        resolver = args.get("overlap_resolver")
        fn = (
            (lambda x, y: resolver(x=x, y=y)) if callable(resolver) else None
        )
        return args["cube1"].merge_cubes(args["cube2"], overlap_resolver=fn)

    def p_save_result(args, ctx):
        cube = args["data"]
        if isinstance(cube, CubeFrame):
            df = cube.df
            # the cube knows its value/dim columns — pass them so the
            # raster exporter never infers them from column position
            vcol, dcols = cube.value_col, list(cube.dims.values())
        else:
            df, vcol, dcols = cube, None, None
        if "path" in ctx:
            return save_result(
                df, ctx["path"], args.get("format", "parquet"),
                value_col=vcol, dim_cols=dcols,
            )
        return df

    def p_filter_bbox(args, ctx):
        extent = args.get("extent", {})
        return args["data"].filter_bbox(
            west=extent.get("west"), east=extent.get("east"),
            south=extent.get("south"), north=extent.get("north"),
        )

    def p_apply_dimension(args, ctx):
        return args["data"].apply_dimension(
            args["dimension"], args["process"]
        )

    def p_resample_cube_temporal(args, ctx):
        from openeo_processes_dask_ml_spark.operators.asof import (
            resample_cube_temporal,
        )

        return resample_cube_temporal(args["data"], args["target"])

    def p_add_dimension(args, ctx):
        return args["data"].add_dimension(
            args["name"], args["label"], args.get("type", "other")
        )

    def p_drop_dimension(args, ctx):
        return args["data"].drop_dimension(args["name"])

    def p_rename_dimension(args, ctx):
        return args["data"].rename_dimension(args["source"], args["target"])

    def p_rename_labels(args, ctx):
        return args["data"].rename_labels(
            args["dimension"], args["target"], args.get("source") or []
        )

    def p_dimension_labels(args, ctx):
        return args["data"].dimension_labels(args["dimension"])

    def p_trim_cube(args, ctx):
        return args["data"].trim_cube()

    def p_flatten_dimensions(args, ctx):
        return args["data"].flatten_dimensions(
            args["dimensions"],
            args["target_dimension"],
            args.get("label_separator") or "~",
        )

    def p_unflatten_dimension(args, ctx):
        return args["data"].unflatten_dimension(
            args["dimension"],
            args["target_dimensions"],
            args.get("label_separator") or "~",
        )

    def p_aggregate_spatial_window(args, ctx):
        return args["data"].aggregate_spatial_window(
            _as_reducer(args["reducer"]),
            args["size"],
            boundary=args.get("boundary", "pad"),
        )

    def p_apply_kernel(args, ctx):
        from openeo_processes_dask_ml_spark.operators.kernel import apply_kernel

        return apply_kernel(
            args["data"], args["kernel"], factor=args.get("factor", 1.0)
        )

    def p_apply_neighborhood(args, ctx):
        from openeo_processes_dask_ml_spark.operators.kernel import (
            apply_neighborhood,
        )

        size = args.get("size", [{"value": 3}, {"value": 3}])
        sx = size[0]["value"] if isinstance(size[0], dict) else int(size[0])
        sy = size[1]["value"] if isinstance(size[1], dict) else int(size[1])
        return apply_neighborhood(
            args["data"], sx, sy, args.get("reducer", args.get("process", "mean"))
        )

    def p_aggregate_temporal(args, ctx):
        return args["data"].aggregate_temporal(
            args["intervals"], args.get("reducer", "mean"), args.get("labels")
        )

    def p_resample_cube_spatial(args, ctx):
        return args["data"].resample_cube_spatial(
            args["target"], args.get("method", "mean")
        )

    def p_climatological_normal(args, ctx):
        return args["data"].climatological_normal(
            args.get("frequency", args.get("period", "month"))
        )

    def p_anomaly(args, ctx):
        return args["data"].anomaly(
            args["normals"], args.get("frequency", args.get("period", "month"))
        )

    def p_resample_spatial(args, ctx):
        return args["data"].resample_spatial(
            args["resolution"],
            method=args.get("method", "mean"),
            align=args.get("align", "center"),
        )

    def p_quantiles_cube(args, ctx):
        return args["data"].quantiles(
            args["dimension"], args["probabilities"]
        )

    def p_mask_polygon(args, ctx):
        from openeo_processes_dask_ml_spark.operators.aggregate import (
            mask_polygon,
        )

        return mask_polygon(
            args["data"],
            args["mask"],
            replacement=args.get("replacement"),
            inside=args.get("inside", False),
        )

    def p_filter_spatial(args, ctx):
        from openeo_processes_dask_ml_spark.operators.aggregate import (
            filter_spatial,
        )

        return filter_spatial(args["data"], args["geometries"])

    def p_apply_polygon(args, ctx):
        from openeo_processes_dask_ml_spark.operators.aggregate import (
            apply_polygon,
        )

        cb = args["process"]
        return apply_polygon(
            args["data"],
            args["polygons"],
            lambda col: _c(cb(x=col)),
            mask_value=args.get("mask_value"),
        )

    def p_fit_curve(args, ctx):
        # openEO fit_curve(data, parameters, function, dimension): the
        # function sub-graph is restricted to the bases the closed-form
        # Cramer solver supports (reference leaves fit_curve to openeo-
        # processes-dask). Named-basis adapter: "harmonic" (period) or
        # "polynomial" (degree), t = fractional days since epoch for
        # timestamp dims, raw value otherwise.
        from openeo_processes_dask_ml_spark.operators.curve import (
            fit_curve,
            harmonic_basis,
            polynomial_basis,
        )

        cube = args["data"]
        dim = args.get("dimension", "time")
        basis_kind = str(args.get("basis", "polynomial")).lower()
        if basis_kind == "harmonic":
            basis = harmonic_basis(float(args.get("period", 1.0)))
        else:
            basis = polynomial_basis(int(args.get("degree", 1)))
        t_fn = _curve_t_fn(cube.df, cube.dim_col(dim))
        return fit_curve(cube, dim, t_fn, basis)

    def p_predict_curve(args, ctx):
        from openeo_processes_dask_ml_spark.operators.curve import (
            harmonic_basis,
            polynomial_basis,
            predict_curve,
        )

        params = args["parameters"]
        labels = args["labels"]  # DataFrame with the label column
        dim_col = args.get("dimension", "time")
        basis_kind = str(args.get("basis", "polynomial")).lower()
        if basis_kind == "harmonic":
            basis = harmonic_basis(float(args.get("period", 1.0)))
        else:
            basis = polynomial_basis(int(args.get("degree", 1)))
        t_fn = _curve_t_fn(labels, dim_col)
        return predict_curve(params, labels, dim_col, t_fn, basis)

    def p_aggregate_spatial(args, ctx):
        # openEO aggregate_spatial(data, geometries, reducer): label the
        # distinct (x, y) grid by point-in-polygon against the WKT zones
        # (same ray-cast used by mask_polygon), then one zonal hash agg.
        from openeo_processes_dask_ml_spark.operators.aggregate import (
            aggregate_spatial,
            assign_cells_to_zones,
        )

        cube = args["data"]
        zones_wkt = args["geometries"]  # list of (zone_id, wkt)
        xcol, ycol = cube.dim_col("x"), cube.dim_col("y")
        assignment = assign_cells_to_zones(cube.df, xcol, ycol, zones_wkt)
        return aggregate_spatial(
            cube,
            assignment,
            "zone_id",
            [xcol, ycol],
            _as_reducer(args["reducer"]),
        )

    def p_inspect(args, ctx):
        # openEO inspect: pass data through unchanged; the message goes
        # to the driver log (no logging backend in the graph context).
        import logging

        logging.getLogger("openeo_processes_dask_ml_spark.graph").log(
            logging.getLevelName(str(args.get("level", "info")).upper())
            if str(args.get("level", "info")).upper() in ("DEBUG", "INFO", "WARNING", "ERROR")
            else logging.INFO,
            "inspect: %s",
            args.get("message", ""),
        )
        return args["data"]

    def p_run_udf(args, ctx):
        # openEO run_udf: user code over the datacube. The udf is a
        # "pkg.module:func" reference resolved through the SAME
        # allowlist as MLM processing expressions (no arbitrary source
        # exec — the reference gates its expression surface the same
        # way, utils/proc_expression_utils.py). The callable receives
        # each Arrow batch's value vector as a numpy array and returns
        # a same-length array; execution is mapInPandas, so user code
        # never runs row-at-a-time.
        from openeo_processes_dask_ml_spark.utils.proc_expression import (
            resolve_python_expression,
        )

        data = args["data"]
        runtime = str(args.get("runtime", "Python")).lower()
        if runtime not in ("python", "python3"):
            raise NotImplementedError(f"run_udf runtime {runtime!r} not supported")
        if not isinstance(data, CubeFrame):
            raise ValueError("run_udf expects a datacube 'data'")
        fn = resolve_python_expression(args["udf"])
        vcol = data.value_col
        cube = data.with_df(
            data.df.withColumn(vcol, F.col(vcol).cast("double"))
        )
        schema = cube.df.schema

        def run(batches):
            import numpy as np

            for pdf in batches:
                vals = pdf[vcol].to_numpy(dtype=float)
                out = np.asarray(fn(vals), dtype=float)
                if out.shape != vals.shape:
                    raise ValueError(
                        f"run_udf callable changed the batch shape "
                        f"{vals.shape} -> {out.shape}"
                    )
                pdf = pdf.copy()
                pdf[vcol] = out
                yield pdf

        return cube.with_df(cube.df.mapInPandas(run, schema=schema))

    reg.register("run_udf", p_run_udf)
    reg.register("fit_curve", p_fit_curve)
    reg.register("predict_curve", p_predict_curve)
    reg.register("aggregate_spatial", p_aggregate_spatial)
    reg.register("inspect", p_inspect)
    reg.register("add_dimension", p_add_dimension)
    reg.register("drop_dimension", p_drop_dimension)
    reg.register("rename_dimension", p_rename_dimension)
    reg.register("rename_labels", p_rename_labels)
    reg.register("dimension_labels", p_dimension_labels)
    reg.register("trim_cube", p_trim_cube)
    reg.register("flatten_dimensions", p_flatten_dimensions)
    reg.register("unflatten_dimension", p_unflatten_dimension)
    reg.register("aggregate_spatial_window", p_aggregate_spatial_window)
    reg.register("apply_kernel", p_apply_kernel)
    reg.register("apply_neighborhood", p_apply_neighborhood)
    reg.register("aggregate_temporal", p_aggregate_temporal)
    reg.register("resample_cube_spatial", p_resample_cube_spatial)
    reg.register("climatological_normal", p_climatological_normal)
    reg.register("anomaly", p_anomaly)
    reg.register("resample_spatial", p_resample_spatial)
    reg.register("quantiles", p_quantiles_cube)
    reg.register("mask_polygon", p_mask_polygon)
    reg.register("filter_spatial", p_filter_spatial)
    reg.register("apply_polygon", p_apply_polygon)
    reg.register("filter_bbox", p_filter_bbox)
    reg.register("apply_dimension", p_apply_dimension)
    reg.register("resample_cube_temporal", p_resample_cube_temporal)
    reg.register("load_collection", p_load_collection)
    reg.register("load_stac", p_load_stac)
    reg.register("filter_bands", p_filter_bands)
    reg.register("filter_temporal", p_filter_temporal)
    reg.register("filter_labels", p_filter_labels)
    reg.register("reduce_dimension", p_reduce_dimension)
    reg.register("aggregate_temporal_period", p_aggregate_temporal_period)
    reg.register("mask", p_mask)
    reg.register("apply", p_apply)
    reg.register("ndvi", p_ndvi)
    reg.register("array_interpolate_linear", p_interp)
    reg.register("merge_cubes", p_merge_cubes)
    reg.register("save_result", p_save_result)


def _register_ml(reg: ProcessRegistry) -> None:
    from openeo_processes_dask_ml_spark.ml.random_forest import (
        fit_on_features,
        ml_fit,
        ml_predict,
        mlm_class_random_forest,
        save_ml_model,
    )
    from openeo_processes_dask_ml_spark.mlm.descriptor import load_stac_ml

    reg.register(
        "mlm_class_random_forest",
        lambda a, c: mlm_class_random_forest(
            max_variables=a.get("max_variables", "sqrt"),
            num_trees=a.get("num_trees", 100),
            seed=a.get("seed"),
        ),
    )
    reg.register(
        "ml_fit",
        lambda a, c: ml_fit(a["model"], a["training_set"], a.get("target", "class_name")),
    )
    reg.register(
        "ml_fit_features",
        lambda a, c: fit_on_features(
            a["model"], a["data"], a.get("feature_col", "embedding"), a.get("label_col", "label")
        ),
    )
    def p_ml_predict(a, c):
        data = a["data"]
        model = a["model"]
        # raster-cube inference goes through the tiled harness; flat
        # feature tables through the MLlib transform (reference
        # dispatches on model type at ml_predict.py:7-15)
        if isinstance(data, CubeFrame) and not hasattr(model, "model"):
            from openeo_processes_dask_ml_spark.ml.inference import run_model_tiled

            fn = a.get("predict_fn")
            if fn is None:
                # reference graphs pass no predict_fn — resolve one from
                # the descriptor's framework (ml_predict.py:7-15)
                from openeo_processes_dask_ml_spark.ml.executors import (
                    predictor_for,
                )

                fn = predictor_for(model)
            return run_model_tiled(data, model, fn)
        df = data.df if isinstance(data, CubeFrame) else data
        return ml_predict(model, df, a.get("feature_col", "embedding"))

    reg.register("ml_predict", p_ml_predict)
    reg.register(
        "load_stac_ml",
        lambda a, c: load_stac_ml(
            a.get("uri") or a.get("url"),
            model_asset=a.get("model_asset"),
            input_index=a.get("input_index", 0),
            output_index=a.get("output_index", 0),
        ),
    )
    reg.register("save_ml_model", lambda a, c: save_ml_model(a["data"], a["name"]))


def default_registry() -> ProcessRegistry:
    reg = ProcessRegistry()
    _register_scalars(reg)
    _register_cubes(reg)
    _register_ml(reg)
    return reg
