"""CubeFrame — a labeled datacube as a long/tidy Spark DataFrame.

The reference's RasterCube is an xarray.DataArray with dims like
(time, bands, y, x) (reference: opd_ml_dev_utils/get_datacube.py:39-47).
Here a cube is one row per cell: dimension coordinates are ordinary
columns and the cell value is a value column. Spark columns are
unordered, so the reference's transpose/reorder machinery
(data_model.py:426-436, 1169-1187) disappears entirely; dimension
*identity* (which column plays time/bands/x/y) is tracked in ``dims``
and resolved through the alias tables in utils/dim_utils.py.

Every operator below is a pure DataFrame transformation — the whole
pipeline stays one Catalyst logical plan until an action, mirroring the
reference's dask laziness but with an actual optimizer underneath.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.tuning import local_rows_df
from openeo_processes_dask_ml_spark.utils.dim_utils import resolve_bands, resolve_dim

# Reducer name -> aggregate builder. `sd`/`variance` use the sample
# flavors to match openEO process definitions.
REDUCERS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "mean": F.mean,
    "avg": F.mean,
    "median": lambda c: F.median(c),
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "sd": F.stddev_samp,
    "variance": F.var_samp,
    "product": F.product,  # native — exp(sum(log)) breaks on zeros/negatives
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "any": lambda c: F.max(c.cast("boolean")),
    "all": lambda c: F.min(c.cast("boolean")),
    # openEO extrema: [min, max] in one aggregation pass.
    "extrema": lambda c: F.array(F.min(c), F.max(c)),
}


def quantiles_reducer(probabilities: Sequence[float]) -> Callable[[Column], Column]:
    """openEO ``quantiles`` as a reducer factory: exact linear-interpolated
    quantiles (Spark ``percentile``, NOT percentile_approx — the openEO
    process is defined on the exact distribution). Returns an
    array<double> of len(probabilities).

    Exact percentile aggregates the full group; for 100 TB cubes prefer
    ``F.percentile_approx`` (t-digest, mergeable sketches) — exposed via
    the ``approx`` flag on :meth:`CubeFrame.quantiles`.
    """
    probs = [float(p) for p in probabilities]
    if not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probabilities must be in [0, 1], got {probs}")
    return lambda c: F.percentile(c, F.array(*[F.lit(p) for p in probs]))


def resolve_reducer(reducer: str | Callable[[Column], Column]) -> Callable[[Column], Column]:
    if callable(reducer):
        return reducer
    try:
        return REDUCERS[reducer.lower()]
    except KeyError:
        raise ValueError(f"unknown reducer {reducer!r}; known: {sorted(REDUCERS)}") from None


@dataclass(frozen=True)
class CubeFrame:
    """A long-form datacube: ``df`` + which columns are dimensions.

    dims: logical dim name -> column name (e.g. {"time": "ts",
    "bands": "event_type", "geometry": "user_id"}).
    value_col: the measure column.
    attrs: free-form metadata (CRS epsg, provenance), the analog of
    xarray ``attrs`` (reference utils/epsg_utils.py:10-64).
    """

    df: DataFrame
    dims: dict[str, str]
    value_col: str = "value"
    attrs: dict = field(default_factory=dict)

    # -- dim resolution -------------------------------------------------
    def dim_col(self, name: str) -> str:
        """Resolve a (possibly aliased) dim name to its column."""
        if name in self.dims:
            return self.dims[name]
        hit = resolve_dim(name, self.dims.keys())
        if hit is not None:
            return self.dims[hit]
        raise KeyError(f"cube has no dimension {name!r}; dims: {self.dims}")

    def dim_name(self, name: str) -> str:
        if name in self.dims:
            return name
        hit = resolve_dim(name, self.dims.keys())
        if hit is None:
            raise KeyError(f"cube has no dimension {name!r}; dims: {self.dims}")
        return hit

    @property
    def dim_cols(self) -> list[str]:
        return list(self.dims.values())

    def _carry_attrs(self) -> dict:
        """Attrs to propagate through a transformation. The
        ``band_labels`` hint is deliberately DROPPED: it is only
        trustworthy on the exact frame it was computed for (a derived
        frame may have changed the band universe), and a stale hint is
        a correctness bug — operations that provably know the new
        universe re-set it explicitly (``filter_bands``, the decode
        boundary in ``io/raster.py``)."""
        return {k: v for k, v in self.attrs.items() if k != "band_labels"}

    def band_labels(self) -> list:
        """The band universe. Uses the metadata-derived ``band_labels``
        attrs hint when present — set by ``decode_assets_to_cube`` from
        the ASSET table — so listing bands never evaluates the pixel
        frame (on a decoded raster cube a ``distinct()`` over pixels
        would re-run the whole decode fan-out); otherwise one distinct
        over the band column."""
        hint = self.attrs.get("band_labels")
        if hint is not None:
            return list(hint)
        col = self.dim_col("bands")
        return [r[0] for r in self.df.select(col).distinct().collect()]

    def with_df(
        self, df: DataFrame, keep_band_labels: bool = False
    ) -> "CubeFrame":
        """``keep_band_labels=True`` is reserved for transformations
        that provably cannot change the band universe (row filters on
        OTHER dims, per-cell value maps) — mirroring xarray, where band
        coords survive a temporal/spatial selection."""
        attrs = dict(self.attrs) if keep_band_labels else self._carry_attrs()
        return replace(self, df=df, attrs=attrs)

    # -- openEO core processes -----------------------------------------
    def filter_bands(self, bands: Sequence[str]) -> "CubeFrame":
        """Subset the band dimension, names resolved through the synonym
        table (reference data_model.py:1189-1205)."""
        col = self.dim_col("bands")
        available = self.band_labels()
        mapping = resolve_bands(bands, available)
        missing = [b for b in bands if b not in mapping]
        if missing:
            raise ValueError(f"bands not found in cube: {missing}")
        kept = list(mapping.values())
        attrs = self._carry_attrs()
        # post-filter universe is known exactly — safe to re-hint
        attrs["band_labels"] = kept
        return replace(
            self, df=self.df.filter(F.col(col).isin(kept)), attrs=attrs
        )

    def filter_labels(self, dim: str, labels: Sequence) -> "CubeFrame":
        col = self.dim_col(dim)
        return self.with_df(
            self.df.filter(F.col(col).isin(list(labels))),
            # filtering a NON-band dim cannot change the band universe
            keep_band_labels=col != self.dims.get("bands"),
        )

    def filter_temporal(self, start, end) -> "CubeFrame":
        """Half-open [start, end) interval, per the openEO spec."""
        t = F.col(self.dim_col("time"))
        df = self.df
        if start is not None:
            df = df.filter(t >= F.lit(start).cast("timestamp"))
        if end is not None:
            df = df.filter(t < F.lit(end).cast("timestamp"))
        return self.with_df(df, keep_band_labels=True)

    def apply(self, fn: Callable[[Column], Column]) -> "CubeFrame":
        """Unary per-cell function — a single projection, fused by codegen."""
        return self.with_df(
            self.df.withColumn(self.value_col, fn(F.col(self.value_col))),
            keep_band_labels=True,
        )

    def filter_bbox(
        self,
        west: float | None = None,
        east: float | None = None,
        south: float | None = None,
        north: float | None = None,
    ) -> "CubeFrame":
        """Spatial bounding-box filter over the x/y dims ([west, east) x
        [south, north)); predicates push to the scan."""
        df = self.df
        if west is not None or east is not None:
            x = F.col(self.dim_col("x"))
            if west is not None:
                df = df.filter(x >= west)
            if east is not None:
                df = df.filter(x < east)
        if south is not None or north is not None:
            y = F.col(self.dim_col("y"))
            if south is not None:
                df = df.filter(y >= south)
            if north is not None:
                df = df.filter(y < north)
        return self.with_df(df, keep_band_labels=True)

    _CUMULATIVE = {
        "cumsum": F.sum,
        "cummax": F.max,
        "cummin": F.min,
        "cumproduct": F.product,
        "cumcount": lambda c: F.count(F.lit(1)),
    }

    def apply_dimension(
        self, dimension: str, process: str, alias: str | None = None
    ) -> "CubeFrame":
        """Apply a per-series process along one dim (openEO
        apply_dimension for the length-preserving case): cumulative
        processes run as window frames ordered by the dim — streaming
        within partitions, series hash-distributed."""
        from pyspark.sql import Window

        dcol = self.dim_col(dimension)
        series = [v for v in self.dim_cols if v != dcol]
        w = (
            Window.partitionBy(*series)
            .orderBy(dcol)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out_col = alias or self.value_col
        if process in self._CUMULATIVE:
            expr = self._CUMULATIVE[process](F.col(self.value_col)).over(w)
        elif process == "rank":
            expr = F.row_number().over(Window.partitionBy(*series).orderBy(dcol))
        else:
            raise ValueError(
                f"apply_dimension process {process!r} not supported; "
                f"known: {sorted(self._CUMULATIVE) + ['rank']}"
            )
        return self.with_df(self.df.withColumn(out_col, expr))

    def reduce_dimension(
        self, dimension: str, reducer: str | Callable[[Column], Column],
        alias: str | None = None,
    ) -> "CubeFrame":
        """Collapse one dimension with a reducer: groupBy every remaining
        dim. Spark runs this partial+final (map-side combine) — the
        shuffle moves one row per output group, not per input cell."""
        dname = self.dim_name(dimension)
        keep = {k: v for k, v in self.dims.items() if k != dname}
        agg = resolve_reducer(reducer)(F.col(self.value_col))
        out_col = alias or self.value_col
        df = self.df.groupBy(*keep.values()).agg(agg.alias(out_col))
        return CubeFrame(df, keep, out_col, self._carry_attrs())

    def reduce_dimension_array(
        self,
        dimension: str,
        fn: Callable[[Column], Column],
        alias: str | None = None,
    ) -> "CubeFrame":
        """Collapse one dimension with a whole-array callback: the
        reducer receives the dim's values as an array ordered by the
        dim's labels (the reference's positional sub-graph reducers,
        e.g. array_element over the band axis at
        examples/train_rf.py:62-103).

        Built as sort_array(collect_list(struct(label, value))) so the
        positional order is deterministic; one shuffle, same as any
        groupBy."""
        dname = self.dim_name(dimension)
        dcol = self.dims[dname]
        keep = {k: v for k, v in self.dims.items() if k != dname}
        arr = F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(dcol).alias("k"), F.col(self.value_col).alias("v")))
            ),
            lambda s: s["v"],
        )
        out_col = alias or self.value_col
        df = self.df.groupBy(*keep.values()).agg(fn(arr).alias(out_col))
        return CubeFrame(df, keep, out_col, self._carry_attrs())

    def aggregate_temporal_period(
        self, period: str, reducer: str | Callable[[Column], Column]
    ) -> "CubeFrame":
        """Calendar-period regrouping of the time dim (reference call site
        examples/train_rf.py:131-146): date_trunc + groupBy over all dims
        with time replaced by the truncated period start."""
        tcol = self.dim_col("time")
        t = F.col(tcol)
        if period == "decade":
            # Spark's date_trunc has no 'decade' unit (returns NULL);
            # build the decade start explicitly.
            bucket = F.make_timestamp(
                (F.floor(F.year(t) / 10) * 10).cast("int"),
                F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0),
            )
        elif period == "season":
            # openEO seasons are DJF/MAM/JJA/SON: December opens the
            # NEXT winter, so quarter-truncate a one-month-shifted
            # timestamp and shift back to the true season start.
            bucket = F.add_months(
                F.date_trunc("quarter", F.add_months(t, 1).cast("timestamp")),
                -1,
            ).cast("timestamp")
        else:
            period_map = {
                "hour": "hour", "day": "day", "week": "week",
                "month": "month", "year": "year",
            }
            unit = period_map.get(period)
            if unit is None:
                raise ValueError(f"unsupported period {period!r}")
            bucket = F.date_trunc(unit, t)
        others = [v for k, v in self.dims.items() if v != tcol]
        agg = resolve_reducer(reducer)(F.col(self.value_col))
        df = (
            self.df.groupBy(bucket.alias(tcol), *others)
            .agg(agg.alias(self.value_col))
        )
        return self.with_df(df)

    def aggregate_temporal(
        self,
        intervals: Sequence[tuple],
        reducer: str | Callable[[Column], Column],
        labels: Sequence[str] | None = None,
    ) -> "CubeFrame":
        """openEO ``aggregate_temporal``: reduce over EXPLICIT
        half-open ``[start, end)`` intervals (the calendar-period
        variant is :meth:`aggregate_temporal_period`).

        The interval table is tiny (a handful of rows) — it broadcasts
        into a range join (start <= t < end), so the data cube never
        shuffles for the assignment; only the per-label partial
        aggregates move. Overlapping intervals are allowed per the
        openEO spec (a row lands in every interval that covers it).
        The time dim becomes a string label dim (openEO: labels
        default to the interval starts).
        """
        if labels is None:
            labels = [str(s) for s, _ in intervals]
        if len(labels) != len(intervals):
            raise ValueError(
                f"{len(intervals)} intervals but {len(labels)} labels"
            )
        tcol = self.dim_col("time")
        spark = self.df.sparkSession
        ivals = local_rows_df(
            spark,
            [
                (str(lab), str(s), str(e))
                for lab, (s, e) in zip(labels, intervals)
            ],
            "__label string, __start string, __end string",
        ).select(
            F.col("__label"),
            F.col("__start").cast("timestamp").alias("__start"),
            F.col("__end").cast("timestamp").alias("__end"),
        )
        t = F.col(tcol)
        joined = self.df.join(
            F.broadcast(ivals), (t >= F.col("__start")) & (t < F.col("__end"))
        )
        others = [v for k, v in self.dims.items() if v != tcol]
        agg = resolve_reducer(reducer)(F.col(self.value_col))
        df = (
            joined.groupBy(F.col("__label").alias(tcol), *others)
            .agg(agg.alias(self.value_col))
        )
        return self.with_df(df)

    # no annotation: plain class attribute, NOT a dataclass field
    _CLIMATOLOGY_LABELS = {
        "hour": F.hour,
        "day": F.dayofyear,
        "week": F.weekofyear,
        "month": F.month,
        # season label = month of the season start (12, 3, 6, 9)
        "season": lambda c: F.month(
            F.add_months(F.date_trunc("quarter", F.add_months(c, 1).cast("timestamp")), -1)
        ),
    }

    def climatological_normal(self, period: str = "month") -> "CubeFrame":
        """openEO climatological_normal: mean per recurring calendar
        label (month-of-year, day-of-year, ...) across all years — the
        time dim collapses to an integer period label. One hash
        aggregation (map-side combined)."""
        label_fn = self._CLIMATOLOGY_LABELS.get(period)
        if label_fn is None:
            raise ValueError(
                f"unsupported climatology period {period!r}; "
                f"known: {sorted(self._CLIMATOLOGY_LABELS)}"
            )
        tcol = self.dim_col("time")
        others = {k: v for k, v in self.dims.items() if v != tcol}
        df = (
            self.df.groupBy(
                label_fn(F.col(tcol)).cast("int").alias("period_label"),
                *others.values(),
            )
            .agg(F.mean(self.value_col).alias(self.value_col))
        )
        dims = dict(others)
        dims["time"] = "period_label"
        return CubeFrame(df, dims, self.value_col, self._carry_attrs())

    def anomaly(self, normals: "CubeFrame", period: str = "month") -> "CubeFrame":
        """openEO anomaly: value minus the climatological normal of its
        period label. The normals cube has one row per label x series;
        for per-pixel series that side is itself raster-sized, so we do
        NOT force a broadcast — a plain equi-join lets AQE pick
        broadcast when the normals side is small and falls back to a
        shuffled hash join when it is not."""
        label_fn = self._CLIMATOLOGY_LABELS.get(period)
        if label_fn is None:
            raise ValueError(f"unsupported climatology period {period!r}")
        tcol = self.dim_col("time")
        shared = [
            v for k, v in self.dims.items()
            if v != tcol and k in normals.dims
        ]
        norm_df = normals.df.select(
            F.col(normals.dim_col("time")).alias("period_label"),
            *shared,
            F.col(normals.value_col).alias("__normal"),
        )
        labeled = self.df.withColumn(
            "period_label", label_fn(F.col(tcol)).cast("int")
        )
        joined = labeled.join(norm_df, ["period_label", *shared], "left")
        out = joined.withColumn(
            self.value_col, F.col(self.value_col) - F.col("__normal")
        ).drop("__normal", "period_label")
        return self.with_df(out)

    def resample_spatial(
        self,
        resolution: float,
        method: str | Callable[[Column], Column] = "mean",
        align: str = "center",
    ) -> "CubeFrame":
        """openEO ``resample_spatial`` for the aggregate (down-sampling)
        case: snap every (x, y) coordinate to a grid of the target
        ``resolution`` and reduce the cells that land in the same target
        pixel. ``align='center'`` labels output pixels at cell centers,
        ``'corner'`` at the lower-left corner.

        One hash aggregation over (bucketed x, bucketed y, other dims)
        with map-side combine — the canonical raster pyramid step; the
        shuffle moves one row per OUTPUT pixel. Reprojection between
        CRSs is out of scope (no geo libs in this environment) — only
        same-CRS grid coarsening, the reference's common case.
        """
        if resolution <= 0:
            raise ValueError(f"resolution must be positive, got {resolution}")
        offset = 0.5 if align == "center" else 0.0
        if align not in ("center", "corner"):
            raise ValueError(f"align must be 'center' or 'corner', got {align!r}")
        res = float(resolution)

        def bucket(col: str) -> Column:
            return (F.floor(F.col(col) / res) + offset) * res

        xcol, ycol = self.dim_col("x"), self.dim_col("y")
        others = [v for v in self.dim_cols if v not in (xcol, ycol)]
        agg = resolve_reducer(method)(F.col(self.value_col))
        df = (
            self.df.groupBy(
                bucket(xcol).alias(xcol), bucket(ycol).alias(ycol), *others
            )
            .agg(agg.alias(self.value_col))
        )
        return self.with_df(df)

    def resample_cube_spatial(
        self,
        target: "CubeFrame",
        method: str | Callable[[Column], Column] = "mean",
    ) -> "CubeFrame":
        """openEO ``resample_cube_spatial``: resample THIS cube onto the
        spatial grid of ``target``. The target grid parameters (origin +
        step per axis) come from the target's distinct axis coordinates
        — an axis-sized driver computation, like the tiling path in
        ml/inference.py — then every source cell snaps to the NEAREST
        target grid line and the collisions reduce with ``method``.

        Same plan as :meth:`resample_spatial`: one hash aggregation with
        map-side combine; the data cube shuffles one row per OUTPUT
        pixel. Requires a regular target grid (uniform spacing).
        """
        agg = resolve_reducer(method)(F.col(self.value_col))
        xcol, ycol = self.dim_col("x"), self.dim_col("y")

        # BOTH target axes in one aggregation pass (formerly one
        # distinct().collect() per axis = two evaluations of the target
        # cube — costly when the target is itself a decoded/derived
        # frame); axes are bounded, ordering happens driver-side
        tx, ty = target.dim_col_of(xcol, self), target.dim_col_of(ycol, self)
        axes = target.df.agg(
            F.collect_set(tx).alias("x"), F.collect_set(ty).alias("y")
        ).collect()[0]

        def grid_params(coords: list) -> tuple[float, float]:
            coords = sorted(coords)
            if len(coords) < 2:
                return float(coords[0]) if coords else 0.0, 1.0
            import numpy as np

            arr = np.asarray(coords, dtype=float)
            steps = np.diff(arr)
            if not np.allclose(steps, steps[0]):
                raise ValueError(
                    "target grid is irregular; "
                    "resample_cube_spatial needs a uniform target grid"
                )
            return float(arr[0]), float(steps[0])

        x0, xs = grid_params(axes["x"])
        y0, ys = grid_params(axes["y"])

        def snap(col: str, origin: float, step: float) -> Column:
            # floor(v + 0.5), not round(): identical half-way behavior
            # in Spark and DuckDB (see utils/rounding.dround rationale)
            return (
                F.floor((F.col(col) - origin) / step + 0.5) * step + origin
            )

        others = [v for v in self.dim_cols if v not in (xcol, ycol)]
        df = (
            self.df.groupBy(
                snap(xcol, x0, xs).alias(xcol),
                snap(ycol, y0, ys).alias(ycol),
                *others,
            )
            .agg(agg.alias(self.value_col))
        )
        return self.with_df(df)

    def dim_col_of(self, col: str, source: "CubeFrame") -> str:
        """The column in THIS cube playing the same dim role as ``col``
        does in ``source`` (e.g. source 'x' -> this cube's x column)."""
        for role, c in source.dims.items():
            if c == col:
                return self.dim_col(role)
        raise ValueError(f"column {col!r} is not a dim of the source cube")

    def quantiles(
        self,
        dimension: str,
        probabilities: Sequence[float],
        approx: bool = False,
    ) -> "CubeFrame":
        """openEO ``quantiles`` as a dimension reducer. ``approx=True``
        switches to ``percentile_approx`` (t-digest sketch, mergeable —
        the 100 TB path); exact mode collects per-group sorted state and
        is for modest group sizes."""
        if approx:
            reducer = lambda c: F.percentile_approx(  # noqa: E731
                c, F.array(*[F.lit(float(p)) for p in probabilities]), F.lit(10000)
            )
        else:
            reducer = quantiles_reducer(probabilities)
        return self.reduce_dimension(dimension, reducer)

    def mask(self, mask_cube: "CubeFrame", replacement=None) -> "CubeFrame":
        """Null out (or replace) cells where the mask cube is truthy.

        The mask broadcasts along dims it lacks (reference mask semantics,
        call site examples/train_rf.py:124-130): join on the shared dims
        only. If the mask is small (e.g. a per-time cloud flag) Spark
        picks a broadcast join via AQE; the data cube never shuffles."""
        shared = [d for d in self.dims if d in mask_cube.dims]
        if not shared:
            raise ValueError("mask shares no dimensions with the cube")
        extra = [d for d in mask_cube.dims if d not in self.dims]
        if extra:
            # a mask with dims the data lacks would multiply rows in
            # the join — reject, as openEO requires mask dims to be a
            # subset of the data cube's
            raise ValueError(
                f"mask has dimensions {extra} not present in the data cube; "
                "reduce them first"
            )
        join_cond = [
            self.df[self.dims[d]] == mask_cube.df[mask_cube.dims[d]] for d in shared
        ]
        mcol = F.col("__mask__")
        mdf = mask_cube.df.select(
            *[mask_cube.df[mask_cube.dims[d]] for d in shared],
            F.col(mask_cube.value_col).cast("boolean").alias("__mask__"),
        )
        joined = self.df.join(mdf, join_cond, "left")
        value = F.when(
            F.coalesce(mcol, F.lit(False)), F.lit(replacement)
        ).otherwise(F.col(self.value_col))
        out = joined.select(
            *[self.df[c] for c in self.df.columns if c != self.value_col],
            value.alias(self.value_col),
        )
        return self.with_df(out)

    def merge_cubes(
        self,
        other: "CubeFrame",
        overlap_resolver=None,
    ) -> "CubeFrame":
        """openEO merge_cubes. Label-disjoint case (the reference's
        band-append xr.concat at overrides/indices.py:29): one
        unionByName, no shuffle. With ``overlap_resolver`` (a
        Column x Column -> Column callable, the compiled sub-graph):
        full outer join on the dimension columns; cells present in both
        cubes combine through the resolver, one-sided cells pass
        through — the openEO overlapping-cube semantics. The join keys
        are the dim columns, so Spark plans an ordinary shuffle (or
        broadcast) equi-join; no driver-side alignment."""
        if overlap_resolver is None:
            return self.with_df(
                self.df.unionByName(other.df, allowMissingColumns=True)
            )
        if set(self.dims) != set(other.dims):
            raise ValueError(
                f"merge_cubes: dimension mismatch {sorted(self.dims)} vs "
                f"{sorted(other.dims)}"
            )
        dcols = list(self.dims.values())
        # presence flags, NOT value-null checks: openEO delegates null
        # handling at overlapping cells to the resolver sub-graph (e.g.
        # sum with ignore_nodata=false must propagate null), so the
        # resolver runs whenever both ROWS exist even if a value is
        # null; coalesce-style pass-through is only for cells present
        # in exactly one cube (ADVICE r5, cube.py:601)
        a = self.df.select(
            *dcols,
            F.col(self.value_col).alias("__va"),
            F.lit(True).alias("__pa"),
        )
        b = other.df.select(
            *[
                F.col(other.dims[d]).alias(self.dims[d])
                for d in self.dims
            ],
            F.col(other.value_col).alias("__vb"),
            F.lit(True).alias("__pb"),
        )
        joined = a.join(b, on=dcols, how="full_outer")
        va, vb = F.col("__va"), F.col("__vb")
        pa, pb = F.col("__pa"), F.col("__pb")
        value = (
            F.when(pa.isNotNull() & pb.isNotNull(), overlap_resolver(va, vb))
            .when(pa.isNotNull(), va)
            .otherwise(vb)
        )
        out = joined.select(*dcols, value.alias(self.value_col))
        return CubeFrame(out, dict(self.dims), self.value_col, self._carry_attrs())

    # -- dimension manipulation ----------------------------------------
    def add_dimension(self, name: str, label, type: str = "other") -> "CubeFrame":
        """openEO add_dimension: a new size-1 dim holding ``label`` for
        every cell — one literal column, no data movement."""
        if name in self.dims:
            raise ValueError(f"dimension {name!r} already exists")
        col = f"__dim_{name}"
        dims = dict(self.dims)
        dims[name] = col
        return CubeFrame(
            self.df.withColumn(col, F.lit(label)), dims, self.value_col,
            self._carry_attrs(),
        )

    def drop_dimension(self, name: str) -> "CubeFrame":
        """openEO drop_dimension: remove a dim that has exactly one
        label (DimensionLabelCountMismatch otherwise — checked with one
        tiny 2-row-limit aggregation, not a full distinct)."""
        dname = self.dim_name(name)
        dcol = self.dims[dname]
        n = self.df.select(dcol).distinct().limit(2).count()
        if n > 1:
            raise ValueError(
                f"drop_dimension: dimension {dname!r} has more than one "
                "label (DimensionLabelCountMismatch)"
            )
        dims = {k: v for k, v in self.dims.items() if k != dname}
        return CubeFrame(
            self.df.drop(dcol), dims, self.value_col, self._carry_attrs()
        )

    def rename_dimension(self, source: str, target: str) -> "CubeFrame":
        """openEO rename_dimension: relabel the logical dim name; the
        backing column is untouched (zero-cost metadata operation)."""
        sname = self.dim_name(source)
        if target in self.dims:
            raise ValueError(f"dimension {target!r} already exists")
        dims = {(target if k == sname else k): v for k, v in self.dims.items()}
        return CubeFrame(self.df, dims, self.value_col, self._carry_attrs())

    def rename_labels(
        self, dimension: str, target: Sequence, source: Sequence
    ) -> "CubeFrame":
        """openEO rename_labels: map ``source[i] -> target[i]`` on one
        dim. A small when-chain projection — label renames are O(10)
        entries, so no join is warranted."""
        if len(target) != len(source):
            raise ValueError("rename_labels: target/source length mismatch")
        dcol = self.dim_col(dimension)
        expr = F.col(dcol)
        out = expr
        for s, t in zip(source, target):
            out = F.when(expr == F.lit(s), F.lit(t)).otherwise(out)
        return self.with_df(self.df.withColumn(dcol, out))

    def flatten_dimensions(
        self,
        dimensions: Sequence[str],
        target_dimension: str,
        label_separator: str = "~",
    ) -> "CubeFrame":
        """openEO flatten_dimensions: combine several dims into one
        whose labels are the separator-joined component labels. Pure
        projection (concat_ws) — no shuffle, no data movement; the
        flattened cube keeps the same row count."""
        if target_dimension in self.dims:
            raise ValueError(
                f"flatten_dimensions: target {target_dimension!r} exists "
                "(TargetDimensionExists)"
            )
        names = [self.dim_name(d) for d in dimensions]
        cols = [self.dims[n] for n in names]
        new_col = f"__dim_{target_dimension}"
        expr = F.concat_ws(
            label_separator, *[F.col(c).cast("string") for c in cols]
        )
        dims = {k: v for k, v in self.dims.items() if k not in names}
        dims[target_dimension] = new_col
        return CubeFrame(
            self.df.withColumn(new_col, expr).drop(*cols),
            dims,
            self.value_col,
            self._carry_attrs(),
        )

    def unflatten_dimension(
        self,
        dimension: str,
        target_dimensions: Sequence[str],
        label_separator: str = "~",
    ) -> "CubeFrame":
        """openEO unflatten_dimension: split a flattened dim back into
        components (string labels — the flatten/unflatten pair is
        label-preserving, not dtype-preserving, matching the spec's
        string label_separator join). Pure projection."""
        import re as _re

        dname = self.dim_name(dimension)
        dcol = self.dims[dname]
        for t in target_dimensions:
            if t in self.dims and t != dname:
                raise ValueError(
                    f"unflatten_dimension: target {t!r} exists"
                )
        parts = F.split(F.col(dcol), _re.escape(label_separator))
        df = self.df
        dims = {k: v for k, v in self.dims.items() if k != dname}
        for i, t in enumerate(target_dimensions):
            col = f"__dim_{t}"
            df = df.withColumn(col, parts[i])
            dims[t] = col
        return CubeFrame(df.drop(dcol), dims, self.value_col, self._carry_attrs())

    def aggregate_spatial_window(
        self,
        reducer: str | Callable[[Column], Column],
        size: Sequence[float],
        boundary: str = "pad",
    ) -> "CubeFrame":
        """openEO aggregate_spatial_window: reduce non-overlapping
        ``size = [sx, sy]`` pixel windows; output labels are the window
        indices. One hash aggregation keyed on (other dims, wx, wy) —
        map-side partial aggregation makes it a single balanced shuffle
        of one row per output window at any scale. ``boundary='trim'``
        keeps only full windows (cell count == sx*sy), computed in the
        same aggregation — no second pass."""
        sx, sy = float(size[0]), float(size[1])
        xcol, ycol = self.dim_col("x"), self.dim_col("y")
        red = resolve_reducer(reducer)
        others = [c for c in self.dim_cols if c not in (xcol, ycol)]
        wx = F.floor(F.col(xcol) / sx).cast("double")
        wy = F.floor(F.col(ycol) / sy).cast("double")
        agg = (
            self.df.groupBy(*others, wx.alias(xcol), wy.alias(ycol))
            .agg(
                red(F.col(self.value_col)).alias(self.value_col),
                F.count(F.lit(1)).alias("__cells"),
            )
        )
        if boundary == "trim":
            agg = agg.filter(F.col("__cells") == int(sx * sy))
        elif boundary != "pad":
            raise ValueError(f"aggregate_spatial_window: boundary {boundary!r}")
        return self.with_df(agg.drop("__cells"))

    def dimension_labels(self, dimension: str) -> DataFrame:
        """openEO dimension_labels: the distinct labels of one dim,
        sorted — returned as a DataFrame (stays distributed; collect at
        the edge if you need a list)."""
        dcol = self.dim_col(dimension)
        return self.df.select(dcol).distinct().orderBy(dcol)

    def trim_cube(self) -> "CubeFrame":
        """openEO trim_cube: drop outer slices that contain only
        nodata. Long form: ONE aggregation computes, per dim, the
        min/max label carrying any non-null value; the 1-row bounds
        table broadcasts back as a cross join and every dim filters to
        its bounds. Two passes over the data, no collect."""
        val = F.col(self.value_col)
        aggs = []
        for col in self.dim_cols:
            keep = F.when(val.isNotNull(), F.col(col))
            aggs.append(F.min(keep).alias(f"__lo_{col}"))
            aggs.append(F.max(keep).alias(f"__hi_{col}"))
        bounds = self.df.agg(*aggs)
        df = self.df.crossJoin(F.broadcast(bounds))
        for col in self.dim_cols:
            df = df.filter(
                F.col(col).between(F.col(f"__lo_{col}"), F.col(f"__hi_{col}"))
            )
        drop = [c for col in self.dim_cols for c in (f"__lo_{col}", f"__hi_{col}")]
        return self.with_df(df.drop(*drop))

    # -- wide/long pivots ----------------------------------------------
    def to_wide(self, bands: Sequence[str] | None = None) -> DataFrame:
        """Pivot bands into columns for band math. Explicit band list
        keeps Catalyst from an extra distinct-collection job."""
        bcol = self.dim_col("bands")
        others = [v for v in self.dim_cols if v != bcol]
        piv = self.df.groupBy(*others).pivot(bcol, list(bands) if bands else None)
        return piv.agg(F.first(self.value_col))
