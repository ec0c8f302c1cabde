"""Batched model inference over a long-form cube — the engine core.

The reference's ``run_model`` is a 12-stage plan: validate, select
bands, scale, cast, transpose, tile, pick batch size, rechunk so one
chunk = one batch, spill every batch to ``.npy``, run the model in a
subprocess barrier, reload, reassemble coordinates (reference:
data_model/data_model.py:1024-1167). The Spark re-expression deletes
the spill/barrier entirely:

  select/scale/cast  ->  Catalyst projections (codegen-fused)
  tiling             ->  tile-key columns = floor(coord_index / T),
                         remainder rows dropped by a WHERE
                         (data_model.py:393-424 semantics)
  1 chunk = 1 batch  ->  groupBy(tile/batch keys) + applyInPandas
  .npy + subprocess  ->  executor-local model singleton, Arrow batches
  reassembly         ->  the UDF emits output rows with regenerated
                         coordinates; union of rows IS the cube
                         (no combine_by_coords step)

All-NaN batches skip prediction and emit missing values, matching
data_model.py:899-901, 997-1006 (the reference's NaN sentinel surfaces
as SQL NULL through the Arrow boundary — Spark's missing marker).

Scale shape: the only shuffle is the groupBy on tile keys — one row per
cell moves once; the model runs streamwise per partition; grid
coordinate arrays (driver-held) are raster-resolution-sized, not
data-sized.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openeo_processes_dask_ml_spark.cube import CubeFrame
from openeo_processes_dask_ml_spark.scale.tuning import local_rows_df
from openeo_processes_dask_ml_spark.mlm.descriptor import MLModelDescriptor, validate_cube
from openeo_processes_dask_ml_spark.utils.scaling import apply_scaling

BATCH_DIM_NAMES = ("batch", "batches")
FALLBACK_BATCH_SIZE = 12  # reference data_model.py:505


def get_batch_size(descriptor: MLModelDescriptor) -> int:
    """The reference's decision table (data_model.py:493-536):
    no batch dim -> 1 (or the suggestion); batch shape -1 -> suggestion
    or fallback 12; fixed batch shape -> that shape."""
    dims = [d.lower() for d in descriptor.input.dim_order]
    suggestion = descriptor.batch_size_suggestion
    batch_idx = next((i for i, d in enumerate(dims) if d in BATCH_DIM_NAMES), None)
    if batch_idx is None:
        return suggestion if suggestion else 1
    shape = (
        descriptor.input.shape[batch_idx]
        if batch_idx < len(descriptor.input.shape)
        else -1
    )
    if shape == -1:
        return suggestion if suggestion else FALLBACK_BATCH_SIZE
    return shape


def tile_count(n_cells: int, tile: int) -> int:
    """Full tiles only — the remainder is dropped
    (data_model.py:418-422)."""
    return n_cells // tile


def _axis_kind(df: DataFrame, col: str) -> str | None:
    """'ts' / 'date' for temporal axis columns, None otherwise —
    derived from the schema, not the values, so chunked sub-requests
    agree with the outer request."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    return None


def _axis_array(vals, kind: str | None) -> np.ndarray:
    """Coordinate array for one collected axis. Spark collects
    timestamp/date values as python datetime/date objects, which
    numpy keeps as dtype=object — but regenerate_coords' datetime
    branch (and every timedelta computation) needs real datetime64
    arrays, so temporal axes are normalized here. Without this, a
    model that RESIZES a temporal dim fell through to the string
    fallback and emitted strings into a timestamp column (r16 fix)."""
    if kind is not None:
        try:
            return np.array(vals, dtype="datetime64[ns]")
        except (ValueError, TypeError):  # tz-aware edge: keep objects
            return np.array(vals)
    return np.array(vals)


def _py_scalar(v, kind: str | None):
    """A numpy coordinate back to the python scalar Spark literals
    expect. datetime64[ns].item() is an INTEGER (nanoseconds) — it
    must go through [us]/[D] first to round-trip as datetime/date."""
    if isinstance(v, np.datetime64):
        unit = "D" if kind == "date" else "us"
        return v.astype(f"datetime64[{unit}]").item()
    return v.item() if hasattr(v, "item") else v


def regenerate_coords(
    in_coords: np.ndarray,
    out_len: int,
    next_coord=None,
    coord_width=None,
    full_axis=None,
):
    """Output coordinates for one dim of one tile (reference
    resolve_batch, data_model.py:779-855):

    same length      -> copy input coords                  (:799-802)
    numeric          -> cell-center linspace: the tile's pixel extent
                        runs from first-width/2 to last+width/2, the
                        out_len new cells split it evenly, and coords
                        sit at the new cell centers            (:812-820)
    datetime64       -> epoch-int linspace from the tile start up to
                        (exclusive) the NEXT coordinate after the tile
                        (endpoint=False); without a next coordinate the
                        extent extrapolates by the mean spacing  (:822-844)
    string/other     -> 'l1.l2.l3-i' join + counter        (:846-853)
    empty input      -> 0..n-1                  (reference missing-coords)

    ``coord_width`` is the input cell width (defaults to the tile's
    first spacing); ``next_coord`` is the first coordinate after the
    tile on the full axis, when one exists. ``full_axis`` is the whole
    dimension's coordinate array: the datetime mean-spacing fallback
    uses it (reference data_model.py:834 computes the mean over
    coords_for_dim, i.e. the FULL axis) so irregular axes and size-1
    last tiles match the reference goldens.
    """
    in_coords = np.asarray(in_coords)
    if in_coords.size == out_len:
        return in_coords
    if in_coords.size == 0:
        return np.arange(out_len)
    if np.issubdtype(in_coords.dtype, np.datetime64):
        start = in_coords[0].astype("datetime64[ns]").astype(np.int64)
        axis = np.asarray(full_axis) if full_axis is not None else in_coords
        if next_coord is not None:
            end = np.datetime64(next_coord, "ns").astype(np.int64)
        elif coord_width is not None:
            # chunked sub-requests pass the GLOBAL mean spacing —
            # their full_axis is chunk-local, whose mean differs on
            # irregular axes (ADVICE r15: 'only batch composition
            # differs, never values')
            end = (
                (in_coords[-1] + np.timedelta64(coord_width))
                .astype("datetime64[ns]")
                .astype(np.int64)
            )
        elif axis.size > 1:
            mean_diff = np.mean(axis[1:] - axis[:-1])
            end = (in_coords[-1] + mean_diff).astype("datetime64[ns]").astype(np.int64)
        else:
            end = start + 1
        out = np.linspace(start, end, out_len, endpoint=False, dtype=np.int64)
        return out.astype("datetime64[ns]")
    if np.issubdtype(in_coords.dtype, np.number):
        if coord_width is None:
            coord_width = (
                in_coords[1] - in_coords[0] if in_coords.size > 1 else 1.0
            )
        image_start = in_coords[0] - coord_width / 2
        image_end = in_coords[-1] + coord_width / 2
        new_width = (image_end - image_start) / out_len
        return np.linspace(
            image_start + new_width / 2, image_end - new_width / 2, out_len
        )
    joined = ".".join(str(c) for c in in_coords)
    return np.array([f"{joined}-{i}" for i in range(out_len)])


def collapse_coords(in_coords: np.ndarray):
    """Coordinate for a dim fully consumed by the model: spatial/numeric
    -> tile center (mean, data_model.py:872-878); other -> first
    (:879-882)."""
    in_coords = np.asarray(in_coords)
    if in_coords.size and np.issubdtype(in_coords.dtype, np.number):
        return float(in_coords.mean())
    return in_coords[0] if in_coords.size else None


@dataclass
class _TiledDim:
    """One non-band model dim resolved against the cube."""

    model_dim: str
    cube_col: str
    tile: int  # model input size on this dim (-1 -> full extent)
    coords: np.ndarray  # global sorted coordinates (raster-resolution-sized)
    next_after: object | None = None  # first coord AFTER this axis slice
    # (set on chunked sub-requests so the last tile of a chunk still
    # sees its true successor for datetime coordinate regeneration)
    width: object | None = None  # GLOBAL cell width override — chunked
    # sub-requests must not derive the width from their chunk-local
    # first spacing on irregular axes (r15 review)


def _collect_axis_chunks(
    df, col: str, chunk_len: int, kind: str | None = None
) -> list[tuple]:
    """Collect an oversized coordinate axis in sorted, bounded chunks
    of ``chunk_len`` values — plus ONE lookahead value per chunk (the
    next chunk's first coordinate), which chunked tiling needs for
    exact datetime coordinate regeneration at chunk boundaries. Each
    round is one capped aggregation (slice-inside-agg, the axis-cap
    discipline: at most chunk_len+1 values ever reach the driver) over
    rows strictly above the previous boundary, so driver memory stays
    O(chunk_len) no matter how long the axis is. K = ceil(axis/chunk)
    scans — the price of not holding the axis; each sub-request scans
    its slice again anyway."""
    chunks: list[tuple] = []
    last = None
    while True:
        src = df if last is None else df.filter(F.col(col) > F.lit(last))
        vals = src.agg(
            F.slice(
                F.sort_array(F.collect_set(col)), 1, chunk_len + 1
            ).alias("a")
        ).collect()[0]["a"]
        if not vals:
            return chunks
        if len(vals) > chunk_len:
            chunks.append((_axis_array(vals[:chunk_len], kind), vals[chunk_len]))
            last = vals[chunk_len - 1]
        else:
            chunks.append((_axis_array(vals, kind), None))
            return chunks


def run_model_tiled(
    cube: CubeFrame,
    descriptor: MLModelDescriptor,
    predict_fn: Callable[[np.ndarray], np.ndarray],
    out_value_col: str = "value",
    max_axis_elements: int = 10_000_000,
    auto_chunk: bool = True,
    _axis_override: dict | None = None,
) -> DataFrame:
    """Apply ``predict_fn`` (batch tensor in model dim_order ->
    output tensor in output dim_order) over the cube, tiled to the
    model's input shape.

    ``predict_fn`` must be picklable; heavyweight models should lazily
    load an executor-local singleton inside it (the Spark analog of the
    reference's per-subprocess torch.jit.load).

    MLM pre/post-processing expressions (reference
    run_pytorch_model.py:18-37: pre-expr -> no_grad forward ->
    post-expr) wrap ``predict_fn`` inside the UDF, resolved through the
    allowlisted importlib dispatch.

    An axis longer than ``max_axis_elements`` no longer raises: with
    ``auto_chunk`` (default) the request self-partitions into
    sub-grid requests along the oversized axes — the Spark analog of
    the reference's ``get_index_subsets`` chunk walk
    (data_model.py:393-424). Chunk boundaries are MULTIPLES OF THE
    TILE SIZE in global index space, so every sub-request's tiles are
    exactly the global tiling's tiles and only the global trailing
    remainder is dropped; each chunk carries one lookahead coordinate
    so datetime regeneration at chunk boundaries sees its true
    successor. The only observable difference vs one giant request is
    batch COMPOSITION (tiles are batched within a chunk), which
    affects model-call grouping, never values. Axes the model
    consumes whole (shape -1) and the band universe cannot chunk and
    still raise with guidance. ``_axis_override`` is the internal
    recursion channel carrying pre-collected ``{col: (coords,
    next_after)}`` axes so sub-requests never rescan."""
    from openeo_processes_dask_ml_spark.utils.dim_utils import resolve_dim

    orig_predict_fn = predict_fn  # recursion must not double-wrap pre/post
    pre = descriptor.input.pre_processing_function
    post = descriptor.output.post_processing_function
    if pre or post:
        inner = predict_fn
        pre_fmt, pre_expr = (pre.format, pre.expression) if pre else (None, None)
        post_fmt, post_expr = (post.format, post.expression) if post else (None, None)

        def predict_fn(batch: np.ndarray) -> np.ndarray:  # noqa: F811
            from openeo_processes_dask_ml_spark.utils.proc_expression import (
                run_process_expression,
            )

            if pre_expr:
                batch = np.asarray(run_process_expression(pre_fmt, pre_expr, batch))
            out = inner(batch)
            if post_expr:
                out = np.asarray(run_process_expression(post_fmt, post_expr, out))
            return out

    inp, outp = descriptor.input, descriptor.output
    band_col = cube.dims.get("bands")
    model_bands = [b.name for b in inp.bands]

    # --- resolve model dims against the cube --------------------------
    in_dims: list[tuple[str, int]] = [
        (d, s)
        for d, s in zip(inp.dim_order, inp.shape)
        if d.lower() not in BATCH_DIM_NAMES
    ]
    cube_sizes: dict[str, int] = {}
    coords_by_col: dict[str, np.ndarray] = {}
    tiled: list[_TiledDim] = []
    band_axis_dim: str | None = None
    resolved: list[tuple[str, int, str, str]] = []  # (dim, size, role, col)
    for d, s in in_dims:
        role = resolve_dim(d, cube.dims.keys())
        if role == "bands" or (role is None and d.lower() in ("band", "bands", "channel")):
            band_axis_dim = d
            continue
        if role is None:
            raise ValueError(f"model dim {d!r} not found in cube dims {cube.dims}")
        resolved.append((d, s, role, cube.dims[role]))

    # ONE aggregation pass collects every tiled dim's coordinate axis
    # (and the band universe when no metadata hint exists) — the former
    # per-dim distinct().collect() evaluated the cube once PER dim,
    # which on a decoded raster cube meant one full decode fan-out per
    # axis. Axes are bounded (they become driver-side tile grids either
    # way); ordering happens driver-side.
    band_hint = cube.attrs.get("band_labels") if band_col else None
    override = dict(_axis_override or {})
    scan_cols = list(
        dict.fromkeys(
            c for _, _, _, c in resolved if c not in override
        )
    )
    want_bands_scan = bool(model_bands and band_col) and band_hint is None
    if want_bands_scan and band_col not in scan_cols:
        scan_cols.append(band_col)
    if scan_cols:
        # capped INSIDE the aggregation (VERDICT r8 #7): sort_array +
        # slice run executor-side on the single final agg row, so an
        # oversized axis never crosses to the driver — the driver sees
        # at most max_axis_elements + 1 values per dim and raises with
        # guidance instead of silently ballooning. Axes are bounded by
        # axis length, not data volume, but a planetary 10 m grid axis
        # is millions of doubles; the default cap (1e7 ~ 80 MB/axis)
        # marks the point where per-tile requests should be issued
        # instead.
        axes_row = cube.df.agg(
            *[
                F.slice(
                    F.sort_array(F.collect_set(c)),
                    1,
                    max_axis_elements + 1,
                ).alias(c)
                for c in scan_cols
            ]
        ).collect()[0]
        over = [c for c in scan_cols if len(axes_row[c]) > max_axis_elements]
        if over:
            tile_of = {col: s for _, s, _, col in resolved}
            unchunkable = [
                c
                for c in over
                if c not in tile_of or tile_of[c] == -1 or not auto_chunk
            ]
            if unchunkable:
                raise ValueError(
                    f"cube axis {unchunkable[0]!r} exceeds "
                    f"max_axis_elements={max_axis_elements} and cannot "
                    "auto-chunk (band universe / full-extent model dim "
                    "/ auto_chunk=False); tile the request yourself or "
                    "raise the cap explicitly"
                )
            # self-partition into sub-grid requests along the
            # oversized axes; under-cap axes (and the band universe,
            # via the attrs hint below) pass through pre-collected so
            # sub-requests run zero axis scans
            passdown = dict(override)
            for c in scan_cols:
                if c not in over and c != band_col:
                    passdown[c] = (
                        _axis_array(axes_row[c], _axis_kind(cube.df, c)),
                        None,
                        None,
                    )
            sub_attrs = dict(cube.attrs)
            if want_bands_scan and band_col in scan_cols:
                sub_attrs["band_labels"] = [
                    v.item() if hasattr(v, "item") else v
                    for v in axes_row[band_col]
                ]
            chunk_lists: dict[str, list[tuple]] = {}
            axis_width: dict[str, object] = {}
            axis_kinds: dict[str, str | None] = {}
            for c in over:
                tile = tile_of[c]
                axis_kinds[c] = _axis_kind(cube.df, c)
                chunk_len = max(tile, (max_axis_elements // tile) * tile)
                all_chunks = _collect_axis_chunks(
                    cube.df, c, chunk_len, axis_kinds[c]
                )
                # the GLOBAL cell width (numeric: the axis' first
                # spacing; datetime: the full-axis MEAN spacing, which
                # telescopes to (last-first)/(n-1) so it never needs
                # the whole axis in driver memory). Chunk-local
                # spacings differ on irregular axes and would shift
                # regenerated coordinates vs the unchunked run
                # (r15 review; ADVICE r15 for the datetime analog).
                g0 = all_chunks[0][0]
                width = None
                if np.issubdtype(g0.dtype, np.number):
                    if g0.size > 1:
                        width = g0[1] - g0[0]
                elif np.issubdtype(g0.dtype, np.datetime64):
                    n_total = sum(len(ch[0]) for ch in all_chunks)
                    if n_total > 1:
                        span = (
                            all_chunks[-1][0][-1] - all_chunks[0][0][0]
                        ).astype("timedelta64[ns]")
                        # positive-span floor division == np.mean's
                        # float-then-truncate over the diffs
                        width = span // (n_total - 1)
                axis_width[c] = width
                kept = [
                    ch
                    for ch in all_chunks
                    # a trailing chunk shorter than one tile holds only
                    # the global remainder — dropped, as global tiling
                    # would drop it
                    if len(ch[0]) >= tile
                ]
                # every chunk under one tile (tile > cap with a short
                # axis): keep one sub-request so the recursion
                # reproduces the GLOBAL semantics for an axis shorter
                # than the model tile (validate_cube's size check
                # raises), instead of silently returning nothing
                chunk_lists[c] = kept or all_chunks[:1]
            import itertools

            parts: list[DataFrame] = []
            combos = itertools.product(*(chunk_lists[c] for c in over))
            for combo in combos:
                sub_df = cube.df
                sub_over = {}
                for c, (coords, nxt) in zip(over, combo):
                    lo, hi = (
                        _py_scalar(v, axis_kinds[c])
                        for v in (coords.flat[0], coords.flat[-1])
                    )
                    sub_df = sub_df.filter(
                        (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
                    )
                    sub_over[c] = (coords, nxt, axis_width[c])
                sub_cube = CubeFrame(
                    sub_df, dict(cube.dims), cube.value_col, sub_attrs
                )
                parts.append(
                    run_model_tiled(
                        sub_cube,
                        descriptor,
                        orig_predict_fn,
                        out_value_col=out_value_col,
                        max_axis_elements=max_axis_elements,
                        auto_chunk=False,  # chunks are cap-sized by construction
                        _axis_override={**passdown, **sub_over},
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        axis_by_col = {
            c: _axis_array(axes_row[c], _axis_kind(cube.df, c))
            for c in scan_cols
        }
    else:
        axis_by_col = {}
    next_after_by_col: dict[str, object] = {}
    width_by_col: dict[str, object] = {}
    for c, ov in override.items():
        coords, nxt = ov[0], ov[1]
        axis_by_col[c] = coords
        next_after_by_col[c] = nxt
        width_by_col[c] = ov[2] if len(ov) > 2 else None
    for d, s, role, col in resolved:
        coords = axis_by_col[col]
        cube_sizes[role] = coords.size
        coords_by_col[col] = coords
        tiled.append(
            _TiledDim(
                d,
                col,
                s if s != -1 else coords.size,
                coords,
                next_after_by_col.get(col),
                width_by_col.get(col),
            )
        )

    if model_bands and band_col:
        cube_bands = (
            list(band_hint)
            if band_hint is not None
            else [v.item() if hasattr(v, "item") else v for v in axis_by_col[band_col]]
        )
        band_map = validate_cube(
            descriptor, list(cube.dims.keys()), cube_sizes, cube_bands
        )
        ordered_band_labels = [band_map[b] for b in model_bands]
    else:
        ordered_band_labels = []

    # --- derived bands (ModelBand.expression) materialize first ------
    df = cube.df
    if model_bands and band_col:
        from openeo_processes_dask_ml_spark.mlm.band_expr import (
            append_derived_bands,
        )
        from openeo_processes_dask_ml_spark.mlm.descriptor import (
            derived_bands_to_compute,
        )

        to_compute = derived_bands_to_compute(inp.bands, cube_bands)
        if to_compute:
            others = [v for v in cube.dims.values() if v != band_col]
            df = append_derived_bands(
                df, band_col, others, cube.value_col, to_compute, cube_bands
            )

    # --- stages 3-5: select bands, scale, cast (pure projections) -----
    if ordered_band_labels:
        df = df.filter(F.col(band_col).isin(ordered_band_labels))
    if inp.value_scaling:
        df = df.withColumn(
            cube.value_col, apply_scaling(F.col(cube.value_col), inp.value_scaling)
        )
    df = df.withColumn(cube.value_col, F.col(cube.value_col).cast("double"))

    # --- stage 7: tile keys; remainder dropped ------------------------
    # coord -> index via a broadcast join against a tiny index table
    # (raster-resolution-sized). A create_map literal would inline the
    # whole coordinate axis into the serialized plan — fatal for a
    # 100k-coordinate dim; the broadcast table costs the same one
    # driver round-trip but keeps the plan O(1).
    batch_size = get_batch_size(descriptor)
    group_keys: list[str] = []
    n_tiles: dict[str, int] = {}
    spark = df.sparkSession
    for td in tiled:
        full = tile_count(td.coords.size, td.tile)
        n_tiles[td.cube_col] = full
        # datetime64[ns].tolist() yields raw int nanoseconds — convert
        # temporal axes back to the python objects Spark rows accept
        # (µs for timestamps — Spark's native precision — days for dates)
        coord_vals = td.coords
        if np.issubdtype(coord_vals.dtype, np.datetime64):
            unit = "D" if _axis_kind(cube.df, td.cube_col) == "date" else "us"
            coord_vals = coord_vals.astype(f"datetime64[{unit}]")
        idx_rows = [(v, i) for i, v in enumerate(coord_vals.tolist())]
        idx_df = local_rows_df(
            spark,
            idx_rows,
            f"`{td.cube_col}` {df.schema[td.cube_col].dataType.simpleString()}, `__idx_{td.cube_col}` long",
        )
        df = df.join(F.broadcast(idx_df), td.cube_col, "inner").filter(
            F.col(f"__idx_{td.cube_col}") < full * td.tile
        )
        df = df.withColumn(
            f"__tile_{td.cube_col}", (F.col(f"__idx_{td.cube_col}") / td.tile).cast("long")
        )
        group_keys.append(f"__tile_{td.cube_col}")

    # linear tile id -> batch id groups `batch_size` tiles per model call
    linear = F.lit(0)
    for td in tiled:
        linear = linear * n_tiles[td.cube_col] + F.col(f"__tile_{td.cube_col}")
    df = df.withColumn("__batch_id", (linear / batch_size).cast("long"))

    passthrough = [
        v
        for k, v in cube.dims.items()
        if v not in [t.cube_col for t in tiled] and v != band_col
    ]
    keys = passthrough + ["__batch_id"]

    # --- output schema ------------------------------------------------
    out_dims = [d for d in outp.dim_order if d.lower() not in BATCH_DIM_NAMES]
    out_shape = [
        s
        for d, s in zip(outp.dim_order, outp.shape)
        if d.lower() not in BATCH_DIM_NAMES
    ]
    in_dim_names = {td.model_dim: td for td in tiled}

    fields = [df.schema[c] for c in passthrough]
    out_cols: list[str] = []
    for d in out_dims:
        if d == band_axis_dim or d.lower() in ("band", "bands", "channel", "channels"):
            col_name = band_col or "band"
            fields.append(T.StructField(col_name, T.StringType()))
        elif d in in_dim_names:
            col_name = in_dim_names[d].cube_col
            fields.append(df.schema[col_name])
        else:
            col_name = d
            fields.append(T.StructField(col_name, T.DoubleType()))
        out_cols.append(col_name)
    # dims consumed by the model but absent from the output collapse to
    # a single coordinate column: numeric -> tile-center mean (double);
    # datetime/string -> first coord (keep the input column's type)
    collapsed = [
        td for td in tiled if td.model_dim not in out_dims
    ]
    for td in collapsed:
        if td.coords.size and np.issubdtype(np.asarray(td.coords).dtype, np.number):
            fields.append(T.StructField(td.cube_col, T.DoubleType()))
        else:
            fields.append(df.schema[td.cube_col])
    fields.append(T.StructField(out_value_col, T.DoubleType()))
    out_schema = T.StructType(fields)

    tile_sizes = {td.cube_col: td.tile for td in tiled}
    tile_coords = {td.cube_col: td.coords for td in tiled}
    next_after_of = {td.cube_col: td.next_after for td in tiled}
    width_of = {td.cube_col: td.width for td in tiled}
    kind_of = {td.cube_col: _axis_kind(cube.df, td.cube_col) for td in tiled}
    model_dtype = inp.data_type
    dim_order = [d for d in inp.dim_order if d.lower() not in BATCH_DIM_NAMES]
    value_col = cube.value_col
    n_bands = len(ordered_band_labels)
    band_pos = {b: i for i, b in enumerate(ordered_band_labels)}
    tiled_cols = [td.cube_col for td in tiled]
    model_dim_of = {td.cube_col: td.model_dim for td in tiled}

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        # assemble (n_tiles_in_batch, *tile_shape) in model dim order
        tids = sorted(
            pdf[[f"__tile_{c}" for c in tiled_cols]]
            .drop_duplicates()
            .itertuples(index=False, name=None)
        )
        axis_len: dict[str, int] = {}
        for d in dim_order:
            if d == band_axis_dim:
                axis_len[d] = n_bands
            else:
                col = next(c for c in tiled_cols if model_dim_of[c] == d)
                axis_len[d] = tile_sizes[col]
        tensors, tile_meta = [], []
        for tid in tids:
            sel = pdf
            for c, t in zip(tiled_cols, tid):
                sel = sel[sel[f"__tile_{c}"] == t]
            shape = tuple(axis_len[d] for d in dim_order)
            arr = np.full(shape, np.nan)
            index_arrays = []
            for d in dim_order:
                if d == band_axis_dim:
                    index_arrays.append(
                        sel[band_col].map(band_pos).to_numpy(dtype=np.int64)
                    )
                else:
                    col = next(c for c in tiled_cols if model_dim_of[c] == d)
                    t = tid[tiled_cols.index(col)]
                    index_arrays.append(
                        sel[f"__idx_{col}"].to_numpy(dtype=np.int64)
                        - t * tile_sizes[col]
                    )
            arr[tuple(index_arrays)] = sel[value_col].to_numpy(dtype=np.float64)
            tensors.append(arr)
            tile_meta.append(tid)
        batch = np.stack(tensors)

        all_nan = np.isnan(batch).all()
        if all_nan:
            # sparsity skip: no model call (data_model.py:899-901)
            out_tile_shape = [
                s if s != -1 else axis_len.get(d, 1)
                for d, s in zip(out_dims, out_shape)
            ]
            out = np.full((batch.shape[0], *out_tile_shape), np.nan)
        else:
            # stage 5: the model sees its declared input dtype
            # (reference preprocess_datacube, data_model.py:1248) —
            # int8/uint8/float16 models must not get float64 tensors.
            # Applied after the NaN sparsity check (integer casts
            # destroy NaN markers).
            if model_dtype not in (None, "float64", "double"):
                batch = batch.astype(model_dtype)
            out = np.asarray(predict_fn(batch), dtype=np.float64)
            if out.ndim == len(out_dims):  # model dropped the batch axis
                out = out[None, ...]

        # vectorized emission: one DataFrame per tile built from flat
        # numpy arrays (meshgrid ravel), never per-cell Python dicts —
        # a 224x224x24 output tile is ~1.2M cells per batch.
        frames = []
        pass_vals = {c: pdf[c].iloc[0] for c in passthrough}
        cols = list(out_schema.fieldNames())
        for bi, tid in enumerate(tile_meta):
            coords_per_axis = []
            for ax, d in enumerate(out_dims):
                n_out = out.shape[1 + ax]
                if d == band_axis_dim or d.lower() in (
                    "band", "bands", "channel", "channels",
                ):
                    in_c = np.array(ordered_band_labels)
                    nxt, width = None, None
                elif d in in_dim_names:
                    col = in_dim_names[d].cube_col
                    t = tid[tiled_cols.index(col)]
                    full_axis = tile_coords[col]
                    in_c = full_axis[
                        t * tile_sizes[col] : (t + 1) * tile_sizes[col]
                    ]
                    end = (t + 1) * tile_sizes[col]
                    nxt = (
                        full_axis[end]
                        if end < full_axis.size
                        else next_after_of[col]  # chunk lookahead
                    )
                    # numeric default: the axis' first spacing. Datetime
                    # axes get NO default — their branch uses the
                    # full-axis MEAN spacing (reference data_model.py:834)
                    # unless a chunked sub-request passed the global
                    # mean down as the override.
                    width = width_of[col]
                    if (
                        width is None
                        and full_axis.size > 1
                        and np.issubdtype(full_axis.dtype, np.number)
                    ):
                        width = full_axis[1] - full_axis[0]
                else:
                    in_c = np.array([])
                    nxt, width = None, None
                axis = (
                    tile_coords[in_dim_names[d].cube_col]
                    if d in in_dim_names
                    else None
                )
                regen = regenerate_coords(
                    in_c, n_out, next_coord=nxt, coord_width=width,
                    full_axis=axis,
                )
                # Temporal columns: regeneration works in datetime64[ns]
                # but the engine types are coarser — truncate to µs
                # (TimestampType's native precision; the safe Arrow cast
                # rejects sub-µs remainders) or to days for DateType
                # (as date objects — a date column holds nothing finer).
                if d in in_dim_names and np.issubdtype(
                    np.asarray(regen).dtype, np.datetime64
                ):
                    kind = kind_of.get(in_dim_names[d].cube_col)
                    if kind == "date":
                        regen = regen.astype("datetime64[D]").astype(object)
                    elif kind == "ts":
                        regen = regen.astype("datetime64[us]")
                coords_per_axis.append(regen)
            collapsed_vals = {}
            for td in collapsed:
                t = tid[tiled_cols.index(td.cube_col)]
                cval = collapse_coords(
                    tile_coords[td.cube_col][t * td.tile : (t + 1) * td.tile]
                )
                if isinstance(cval, np.datetime64):
                    cval = _py_scalar(cval, kind_of.get(td.cube_col))
                collapsed_vals[td.cube_col] = cval
            flat_val = out[bi].ravel()
            data: dict = {}
            if coords_per_axis:
                mesh = np.meshgrid(*coords_per_axis, indexing="ij")
                for ax, col_name in enumerate(out_cols):
                    data[col_name] = mesh[ax].ravel()
            else:
                for col_name in out_cols:
                    data[col_name] = np.full(flat_val.size, None, dtype=object)
            data[out_value_col] = flat_val
            frame = pd.DataFrame(data)
            for c, v in {**pass_vals, **collapsed_vals}.items():
                frame[c] = v
            frames.append(frame)
        if not frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(frames, ignore_index=True).reindex(columns=cols)

    return df.groupBy(*keys).applyInPandas(
        lambda key, pdf: infer(pdf), schema=out_schema
    )


def sklearn_fast_path(
    df: DataFrame,
    feature_col: str,
    predict_fn: Callable[[np.ndarray], np.ndarray],
    out_col: str = "prediction",
) -> DataFrame:
    """The reference's 1-value-out fast path
    (scikit_learn_model.py:71-132): reshape each Arrow batch to
    (n_samples, n_features) and call predict — here a single
    ``mapInPandas`` stage, no tiling machinery."""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def run(batches):
        for pdf in batches:
            feats = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[feature_col]]
            )
            out = np.asarray(predict_fn(feats), dtype=np.float64).reshape(-1)
            res = pdf.copy()
            res[out_col] = out
            yield res

    return df.mapInPandas(run, schema=schema)
