"""Distributed zarr v2 sink + source for long-form cubes — pure
stdlib (json/zlib) + numpy, no zarr/xarray dependency.

The reference writes zarr through xarray on a single machine
(minibackend/custom_processes.py:115-118,187-188 ``save_result``
zarr branch). Here the store is produced DISTRIBUTED, the same shape
as the gtiff tile sink (io/gtiff.py write_gtiff_tiles): every
executor task encodes and writes its own chunk files, the driver only
materializes the axis coordinates and the (chunk-count-sized)
manifest, then writes the JSON metadata. No ``toPandas`` of pixels
anywhere, so the sink scales with executors instead of driver RAM.

Store layout (zarr v2 spec, xarray-compatible):

    out_dir/.zgroup                 {"zarr_format": 2}
    out_dir/.zmetadata              consolidated metadata
    out_dir/<value>/.zarray         shape/chunks/dtype/zlib compressor
    out_dir/<value>/.zattrs         {"_ARRAY_DIMENSIONS": [dims...]}
    out_dir/<value>/0.0.0.0         zlib(raw C-order cells)
    out_dir/<dim>/.zarray + 0       1-D coordinate arrays (axis-sized,
                                    driver-written — they ARE the
                                    driver-side state, like xarray
                                    coords)

Scale notes (100 TB posture):
- Axis coordinates are collected on the driver: bounded by the AXIS
  lengths (a 100k x 100k grid is 200k floats), never by pixel count.
- Cell placement is ordinal arithmetic after per-dim BROADCAST joins
  against the tiny coordinate tables — the big side never shuffles
  for coordinate resolution.
- The single shuffle is the groupBy(chunk id), which IS the output
  layout — every distributed writer pays exactly this one.
- ``out_dir`` must be shared storage in a real cluster, same contract
  as the gtiff tile sink.

Missing cells inside a chunk hold ``fill_value`` (NaN); the reader
drops them on the way back to long form, so sparse cubes round-trip
to their own row set.
"""

from __future__ import annotations

import json
import math
import os
import zlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

from . import fs
from ..scale.tuning import local_rows_df

_ZARR_FORMAT = 2
_COMPRESSOR = {"id": "zlib", "level": 1}


def _chunk_decoder(zarray: dict, name: str):
    """bytes -> raw C-order cell bytes for one array's chunks.

    Two codecs read here: ``compressor: null`` (stock xarray's
    ``encoding={"compressor": None}`` — raw chunk bytes, no codec
    needed) and the zlib codec this sink writes. Blosc — stock
    zarr-python's *default* — is a declared offline boundary
    (COVERAGE.md: c-blosc framing + codecs unavailable in-sandbox);
    the error names the two readable encodings."""
    comp = zarray.get("compressor")
    if comp is None:
        return lambda b: b
    if isinstance(comp, dict) and comp.get("id") == "zlib":
        return zlib.decompress
    raise NotImplementedError(
        f"zarr array {name!r} compressor {comp}: only raw "
        "(compressor: null) and zlib chunks are readable here — "
        "re-write the store with encoding={'compressor': None} or a "
        "zlib codec (blosc is a declared offline boundary)"
    )

# manifest returned to the driver: one row per written chunk
ZARR_MANIFEST_SCHEMA = "chunk string, path string, cells bigint, bytes bigint"


def _axis_dtype(values: np.ndarray) -> tuple[str, np.ndarray]:
    """zarr v2 dtype string + a write-ready array for one coordinate
    axis (little-endian on-disk, the zarr default)."""
    if values.dtype.kind == "M":
        arr = values.astype("datetime64[ns]")
        return "<M8[ns]", arr
    if values.dtype.kind == "i":
        return "<i8", values.astype("<i8")
    if values.dtype.kind == "f":
        return "<f8", values.astype("<f8")
    if values.dtype.kind == "b":
        return "|b1", values.astype("|b1")
    as_str = values.astype("U")
    width = max(1, max((len(s) for s in as_str.tolist()), default=1))
    return f"<U{width}", as_str.astype(f"<U{width}")


def _write_json(path: str, doc: dict) -> dict:
    # io.fs-routed (r14): metadata docs land on whatever scheme
    # out_dir carries (local/file/s3/gs/hdfs), same as the chunks
    sp = fs.resolve(path)
    with sp.open_write(sp.path) as f:
        f.write(
            json.dumps(doc, indent=1, sort_keys=True).encode()
        )
    return doc


def _zarray_doc(shape, chunks, dtype: str, fill_value) -> dict:
    return {
        "zarr_format": _ZARR_FORMAT,
        "shape": list(int(s) for s in shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": dtype,
        "compressor": dict(_COMPRESSOR),
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
        "dimension_separator": ".",
    }


def _write_axis(
    out_dir: str, name: str, values: np.ndarray, spark_type: str | None = None
) -> dict:
    """One driver-written 1-D coordinate array (axis-sized).
    ``spark_type`` is recorded in .zattrs so the reader can hand the
    column back with its original Spark type (date vs timestamp)."""
    dtype, arr = _axis_dtype(values)
    adir = os.path.join(out_dir, name)
    fs.makedirs(adir)
    zarray = _zarray_doc([len(arr)], [max(1, len(arr))], dtype, None)
    _write_json(os.path.join(adir, ".zarray"), zarray)
    zattrs = {"_ARRAY_DIMENSIONS": [name]}
    if spark_type:
        zattrs["_SPARK_TYPE"] = spark_type
    _write_json(os.path.join(adir, ".zattrs"), zattrs)
    apath = fs.resolve(os.path.join(adir, "0"))
    with apath.open_write(apath.path) as f:
        f.write(zlib.compress(np.ascontiguousarray(arr).tobytes(), 1))
    return {f"{name}/.zarray": zarray, f"{name}/.zattrs": zattrs}


def default_chunks(shape: list[int], target_cells: int = 1 << 21) -> list[int]:
    """Chunk lengths per dim: trailing (spatial) dims keep runs, leading
    dims split first — the long-form cube convention puts y/x last.
    Greedy from the LAST dim: give each dim as much length as fits in
    the remaining cell budget (so a 4096x4096 grid chunks as 512x4096,
    keeping whole rows contiguous for C-order reads)."""
    chunks = [1] * len(shape)
    budget = target_cells
    for i in range(len(shape) - 1, -1, -1):
        take = min(shape[i], max(1, budget))
        chunks[i] = take
        budget //= take
        if budget < 1:
            budget = 0
    return chunks


def write_zarr_cube(
    df: DataFrame,
    out_dir: str,
    value_col: str = "value",
    dim_cols: list[str] | None = None,
    chunks: list[int] | None = None,
    dtype: str = "float64",
    attrs: dict | None = None,
) -> DataFrame:
    """Distributed zarr v2 sink for a long-form cube: ``dim_cols``
    index the cells, ``value_col`` fills an N-D array. Returns the
    chunk manifest DataFrame (chunk id, path, cell count, bytes) —
    the only thing the driver materializes besides axis coordinates.

    Duplicate cells raise (a sink must never average data away — the
    same contract as the gtiff tile sink); integer dtypes raise on
    incomplete coverage because they cannot carry NaN holes.
    """
    spark = df.sparkSession
    if dim_cols is None:
        dim_cols = [c for c in df.columns if c != value_col]
    if not dim_cols:
        raise ValueError("write_zarr_cube: at least one dim column required")
    np_dtype = np.dtype(dtype)
    fs.makedirs(out_dir)  # fail fast driver-side on bad scheme/creds

    # 1. axis coordinates: ALL dims in ONE aggregation job
    # (sort_array(collect_set(d)) == the old per-dim
    # distinct().orderBy() for the never-null axis values; the r11
    # shape ran one driver round-trip PER DIM, which dominated
    # micro-batch latency in the streaming sink — r13). Bounded by
    # axis lengths, never pixels. Spark hands temporal values back
    # as Python datetime/date objects — np.asarray would type those
    # axes as OBJECT and the store would silently stringify them, so
    # temporal axes are forced to datetime64[ns] explicitly.
    spark_types = dict(df.dtypes)
    axes: dict[str, np.ndarray] = {}
    axis_vals: dict[str, list] = {}
    axis_row = df.agg(
        *[
            F.sort_array(F.collect_set(d)).alias(d) for d in dim_cols
        ]
    ).first()
    for d in dim_cols:
        vals = list(axis_row[d])
        axis_vals[d] = vals
        if spark_types[d].startswith("timestamp") or spark_types[d] == "date":
            axes[d] = np.array(vals, dtype="datetime64[ns]")
        else:
            axes[d] = np.asarray(vals)
    shape = [len(axes[d]) for d in dim_cols]
    if chunks is None:
        chunks = default_chunks(shape)
    if len(chunks) != len(shape) or any(
        c < 1 or c > s for c, s in zip(chunks, shape)
    ):
        raise ValueError(
            f"write_zarr_cube: chunks {chunks} invalid for shape {shape}"
        )

    fs.makedirs(os.path.join(out_dir, value_col))
    ords = {d: list(enumerate(axis_vals[d])) for d in dim_cols}

    # 3. driver-side metadata FIRST (tiny), so a concurrently-started
    # reader sees a valid store skeleton
    zdtype = {"f": "<f8" if np_dtype.itemsize == 8 else "<f4"}.get(
        np_dtype.kind
    ) or {"i": "<i8", "u": "<u8", "b": "|b1"}.get(np_dtype.kind)
    if zdtype is None:
        raise ValueError(f"write_zarr_cube: unsupported dtype {dtype}")
    if np_dtype.kind in ("i", "u") and np_dtype.itemsize != 8:
        zdtype = f"<{np_dtype.kind}{np_dtype.itemsize}"
    # the chunk encoder must use EXACTLY the declared wire dtype —
    # e.g. dtype='float16' resolves to '<f4' above, and encoding the
    # chunks as float16 bytes would produce a self-inconsistent store
    np_dtype = np.dtype(zdtype)
    consolidated: dict[str, dict] = {}
    zgroup = _write_json(
        os.path.join(out_dir, ".zgroup"), {"zarr_format": _ZARR_FORMAT}
    )
    consolidated[".zgroup"] = zgroup
    for d in dim_cols:
        consolidated.update(_write_axis(out_dir, d, axes[d], spark_types[d]))
    fill_json = "NaN" if np_dtype.kind == "f" else 0
    zarray = _zarray_doc(shape, chunks, zdtype, fill_json)
    _write_json(os.path.join(out_dir, value_col, ".zarray"), zarray)
    zattrs = {"_ARRAY_DIMENSIONS": list(dim_cols)}
    if attrs:
        zattrs.update(attrs)
    _write_json(os.path.join(out_dir, value_col, ".zattrs"), zattrs)
    consolidated[f"{value_col}/.zarray"] = zarray
    consolidated[f"{value_col}/.zattrs"] = zattrs
    _write_json(
        os.path.join(out_dir, ".zmetadata"),
        {"zarr_consolidated_format": 1, "metadata": consolidated},
    )

    # 4. the one shuffle: group rows into their output chunks and
    # write on the executors
    manifest = _write_chunks(
        df, out_dir, value_col, dim_cols, spark_types, ords, chunks,
        shape, np_dtype,
    )
    grid = [math.ceil(s / c) for s, c in zip(shape, chunks)]
    n_expected = 1
    for g in grid:
        n_expected *= g
    n_written = manifest.count()
    if n_written > n_expected:
        raise RuntimeError(
            f"zarr sink wrote {n_written} chunks for a {grid} grid"
        )
    return manifest


def _write_chunks(
    df: DataFrame,
    out_dir: str,
    value_col: str,
    dim_cols: list[str],
    spark_types: dict[str, str],
    ords: dict[str, list],
    chunks: list[int],
    shape: list[int],
    np_dtype: np.dtype,
) -> DataFrame:
    """The distributed half of the sink, shared by the batch writer
    and the streaming appender: ordinal resolution via per-dim
    BROADCAST joins against the tiny (value, ordinal) tables (``ords``
    — the appender passes offset ordinals for the leading axis), then
    ONE shuffle into the output chunk layout, chunk files written on
    the executors. Returns the eager chunk manifest; the un-executed
    plan rides on it as ``_zarr_plan`` so tests can pin its shape
    (the checkpointed manifest itself reads back as a plain scan)."""
    spark = df.sparkSession
    keyed = df.select(value_col, *dim_cols)
    chunk_cols, local_cols = [], []
    for d, cl in zip(dim_cols, chunks):
        # axis-sized local table: sliced by size, NOT one slice per
        # core — the default 32-slice parallelize made every broadcast
        # ordinal build a 32-Python-task job (r17 profile: 3 such jobs
        # per streaming micro-batch dominated the sink wall)
        axis_df = local_rows_df(
            spark,
            [(v, i) for i, v in ords[d]],
            f"`{d}` {spark_types[d]}, `__ord_{d}` bigint",
        )
        keyed = keyed.join(F.broadcast(axis_df), on=d, how="inner")
        keyed = keyed.withColumn(
            f"__chunk_{d}", (F.col(f"__ord_{d}") / F.lit(cl)).cast("bigint")
        ).withColumn(f"__local_{d}", F.col(f"__ord_{d}") % F.lit(cl))
        chunk_cols.append(f"__chunk_{d}")
        local_cols.append(f"__local_{d}")

    chunk_shape = list(chunks)
    fill = np.nan if np_dtype.kind == "f" else 0

    import pandas as pd

    def write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        cidx = [int(pdf[c].iloc[0]) for c in chunk_cols]
        # edge chunks keep the FULL chunk shape (zarr v2 stores edge
        # chunks padded to the chunk size; readers slice them)
        arr = np.full(chunk_shape, fill, dtype=np_dtype)
        locs = tuple(pdf[c].to_numpy(dtype=np.int64) for c in local_cols)
        flat = np.ravel_multi_index(locs, chunk_shape)
        if len(np.unique(flat)) != len(flat):
            raise ValueError(
                f"duplicate cells in zarr chunk {cidx}: the cube has "
                "more than one row per coordinate — add the missing "
                "dim to dim_cols"
            )
        vals = pdf[value_col].to_numpy()
        if np_dtype.kind != "f":
            edge_cells = 1
            for ci, s, cl in zip(cidx, shape, chunk_shape):
                lo = ci * cl
                edge_cells *= min(cl, s - lo)
            if len(flat) != edge_cells or (
                isinstance(vals.dtype, np.dtype)
                and vals.dtype.kind == "f"
                and np.isnan(vals).any()
            ):
                raise ValueError(
                    f"zarr chunk {cidx} is not fully covered and dtype "
                    f"{np_dtype} has no NaN — use a float dtype or "
                    "densify first"
                )
        arr.ravel()[flat] = vals.astype(np_dtype)
        name = ".".join(str(i) for i in cidx)
        payload = zlib.compress(np.ascontiguousarray(arr).tobytes(), 1)
        path = os.path.join(out_dir, value_col, name)
        # direct final-name write (no tmp): chunk bytes are
        # deterministic, so retry/speculative overwrites are
        # idempotent on every scheme
        sp = fs.resolve(path)
        with sp.open_write(sp.path) as f:
            f.write(payload)
        return pd.DataFrame(
            {
                "chunk": [name],
                "path": [path],
                "cells": [len(flat)],
                "bytes": [len(payload)],
            }
        )

    # right-size the one chunk-layout shuffle to the REAL group count
    # (computable driver-side from ords x chunk lengths) instead of
    # the session default: the eager-localCheckpoint execution below
    # bypasses AQE coalescing, so a 12-row streaming micro-batch was
    # paying 32 reduce tasks — 32 Python worker spin-ups for ~1
    # non-empty group (profiled r17: 3 x 32-task jobs, ~2.4 s of the
    # 4.4 s streaming_zarr_ingest wall). Scale-adaptive: capped at
    # 2 x defaultParallelism so warehouse-scale chunk grids still fan
    # wide, and a task holding several groups just writes them in
    # sequence (same applyInPandas semantics, same chunk bytes).
    n_groups = 1
    for d, cl in zip(dim_cols, chunks):
        n_groups *= len({i // cl for i, _ in ords[d]})
    n_parts = max(
        1,
        min(n_groups, 2 * spark.sparkContext.defaultParallelism),
    )
    plan = (
        keyed.repartition(n_parts, *chunk_cols)
        .groupBy(*chunk_cols)
        .applyInPandas(write_chunk, schema=ZARR_MANIFEST_SCHEMA)
    )
    # the manifest is chunk-count-sized; localCheckpoint forces the
    # writes to actually happen exactly once
    manifest = plan.localCheckpoint(eager=True)
    manifest._zarr_plan = plan
    return manifest


def _axis_to_python(arr: np.ndarray, spark_type: str | None) -> list:
    """Stored axis array -> python values matching the Spark type, for
    the broadcast ordinal tables and duplicate checks."""
    if arr.dtype.kind == "M":
        if spark_type == "date":
            return arr.astype("datetime64[D]").tolist()
        return arr.astype("datetime64[us]").tolist()
    return arr.tolist()


def append_zarr_slices(
    df: DataFrame,
    path: str,
    value_col: str = "value",
    dim_cols: list[str] | None = None,
    chunks: list[int] | None = None,
    dtype: str = "float64",
) -> DataFrame | None:
    """Append slices along the LEADING dimension of an existing zarr
    store (the streaming micro-batch sink primitive). The first call
    creates the store with leading-axis chunk length 1, so every later
    append is pure chunk-file addition + a tiny driver-side metadata
    update — no existing chunk is ever rewritten or renamed.

    Semantics:
    - trailing axes are FIXED at creation: every append must cover
      exactly the same grid values (a slice sink, not a re-gridder);
    - new leading values get the next ordinals in ARRIVAL order (zarr
      does not require sorted coordinates; the long-form reader is
      order-independent);
    - a batch whose leading values are exactly the stored TAIL is a
      REPLAY (foreachBatch retries after a failure): its chunks are
      rewritten in place — idempotent, exactly-once semantics without
      a transaction log;
    - a batch mixing already-stored and new leading values raises
      (neither a clean append nor a clean replay — data bug upstream).

    Single-writer by contract (a streaming query owns its sink).
    Returns the chunk manifest, or None for an empty batch.
    """
    meta_path = os.path.join(path, ".zmetadata")
    if not os.path.exists(meta_path):
        if dim_cols is None:
            dim_cols = [c for c in df.columns if c != value_col]
        # all axis cardinalities in ONE job (r13, micro-batch latency)
        card = df.agg(
            *[F.countDistinct(d).alias(d) for d in dim_cols]
        ).first()
        if card[dim_cols[0]] == 0:
            return None
        if chunks is None:
            chunks = [1] + default_chunks(
                [card[d] for d in dim_cols[1:]]
            )
        chunks = [1] + list(chunks[1:])
        return write_zarr_cube(
            df, path, value_col=value_col, dim_cols=dim_cols,
            chunks=chunks, dtype=dtype,
        )

    with open(meta_path) as f:
        meta = json.load(f)["metadata"]
    zarray = dict(meta[f"{value_col}/.zarray"])
    dims = meta[f"{value_col}/.zattrs"]["_ARRAY_DIMENSIONS"]
    if dim_cols is not None and list(dim_cols) != list(dims):
        raise ValueError(
            f"append_zarr_slices: store dims {dims} != {dim_cols}"
        )
    dim_cols = list(dims)
    if zarray["chunks"][0] != 1:
        raise ValueError(
            "append_zarr_slices: store was not created by this sink "
            f"(leading chunk length {zarray['chunks'][0]}, need 1)"
        )
    if zarray.get("compressor") != _COMPRESSOR:
        # the append path writes zlib chunks; appending into a store
        # declaring another codec (raw/blosc) would corrupt it
        raise ValueError(
            "append_zarr_slices: store compressor "
            f"{zarray.get('compressor')} != {_COMPRESSOR}; append only "
            "extends stores this sink wrote"
        )
    np_dtype = np.dtype(zarray["dtype"])
    spark_types = dict(df.dtypes)

    # stored axes
    stored: dict[str, np.ndarray] = {}
    for d in dim_cols:
        a_meta = meta[f"{d}/.zarray"]
        with open(os.path.join(path, d, "0"), "rb") as f:
            raw = zlib.decompress(f.read())
        stored[d] = np.frombuffer(raw, dtype=np.dtype(a_meta["dtype"]))[
            : a_meta["shape"][0]
        ]

    # axis checks: ALL dims in ONE aggregation job (the r11 shape ran
    # one driver round-trip per dim, which dominated micro-batch
    # latency — r13; sort_array(collect_set) == distinct().orderBy()
    # for the never-null axis values)
    lead = dim_cols[0]
    axis_row = df.agg(
        *[F.sort_array(F.collect_set(d)).alias(d) for d in dim_cols]
    ).first()
    for d in dim_cols[1:]:
        batch_vals = list(axis_row[d])
        want = _axis_to_python(
            stored[d], meta.get(f"{d}/.zattrs", {}).get("_SPARK_TYPE")
        )
        if batch_vals and batch_vals != want:
            raise ValueError(
                f"append_zarr_slices: axis {d!r} of the batch does not "
                f"match the stored grid ({len(batch_vals)} vs "
                f"{len(want)} values)"
            )

    lead_spark_type = meta.get(f"{lead}/.zattrs", {}).get("_SPARK_TYPE")
    stored_lead = _axis_to_python(stored[lead], lead_spark_type)
    new_vals = list(axis_row[lead])
    if not new_vals:
        return None
    n0 = len(stored_lead)
    overlap = set(new_vals) & set(stored_lead)
    if overlap and set(new_vals) == set(stored_lead[n0 - len(new_vals):]):
        # exact replay of the stored tail: rewrite those chunks in
        # place (idempotent micro-batch retry)
        lead_ords = [(stored_lead.index(v), v) for v in new_vals]
        new_shape0 = n0
        append = False
    elif overlap:
        raise ValueError(
            f"append_zarr_slices: {len(overlap)} leading values already "
            "stored but the batch is not an exact tail replay"
        )
    else:
        lead_ords = [(n0 + i, v) for i, v in enumerate(new_vals)]
        new_shape0 = n0 + len(new_vals)
        append = True

    # ords are (ordinal, value) pairs, the _write_chunks contract
    ords = {lead: lead_ords}
    for d in dim_cols[1:]:
        ords[d] = list(
            enumerate(
                _axis_to_python(
                    stored[d], meta.get(f"{d}/.zattrs", {}).get("_SPARK_TYPE")
                )
            )
        )
    shape = [new_shape0] + zarray["shape"][1:]

    manifest = _write_chunks(
        df, path, value_col, dim_cols, spark_types, ords,
        zarray["chunks"], shape, np_dtype,
    )
    n_written = manifest.count()
    if n_written > len(new_vals) * max(
        1,
        math.prod(
            math.ceil(s / c)
            for s, c in zip(zarray["shape"][1:], zarray["chunks"][1:])
        ),
    ):
        raise RuntimeError("append_zarr_slices: wrote more chunks than the slice grid")

    if append:
        # tiny driver-side metadata update: extended leading axis +
        # new shape, consolidated metadata rebuilt
        if stored[lead].dtype.kind == "M":
            new_arr = np.concatenate(
                [stored[lead], np.array(new_vals, dtype="datetime64[ns]")]
            )
        else:
            new_arr = np.concatenate(
                [stored[lead], np.asarray(new_vals, dtype=stored[lead].dtype)]
            )
        meta.update(_write_axis(path, lead, new_arr, lead_spark_type))
        zarray["shape"] = [int(new_shape0)] + list(zarray["shape"][1:])
        _write_json(os.path.join(path, value_col, ".zarray"), zarray)
        meta[f"{value_col}/.zarray"] = zarray
        _write_json(
            meta_path, {"zarr_consolidated_format": 1, "metadata": meta}
        )
    return manifest


def stream_zarr_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    value_col: str = "value",
    dim_cols: list[str] | None = None,
    chunks: list[int] | None = None,
    available_now: bool = True,
):
    """Structured-Streaming zarr sink: every micro-batch appends its
    time slices via ``append_zarr_slices`` inside ``foreachBatch`` —
    chunk files are written by the executors, only axis + JSON
    metadata touch the driver, and a retried batch is an idempotent
    tail replay. Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        append_zarr_slices(
            batch_df, path, value_col=value_col, dim_cols=dim_cols,
            chunks=chunks,
        )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def load_zarr_collection(spark, path: str, value_col: str | None = None):
    """zarr store -> CubeFrame: the distributed chunk reader plus the
    store's own ``_ARRAY_DIMENSIONS`` as the cube dims (spatial names
    map onto the openEO x/y/t/bands conventions the rest of the cube
    API resolves through ``utils/dim_utils.resolve_dim``). The
    reference loads zarr through xarray into a dask cube
    (get_datacube.py cube materialization); here the store explodes
    straight into the long-form Catalyst plan."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = read_zarr_cube(spark, path, value_col)
    vc = df.columns[-1]
    dims = {d: d for d in df.columns[:-1]}
    return CubeFrame(df, dims, vc, {"source": f"zarr:{path}"})


def read_zarr_cube(
    spark, path: str, value_col: str | None = None
) -> DataFrame:
    """Distributed zarr v2 source: the driver reads only the JSON
    metadata and the (axis-sized) coordinate arrays; chunk files
    decompress and explode to long form INSIDE mapInPandas on the
    executors. fill_value cells are dropped, so a cube written by
    ``write_zarr_cube`` round-trips to its own row set. Integer
    stores come back as ``bigint`` (they are hole-free by the sink
    contract); float stores as ``double``.

    Stores without consolidated metadata (e.g. written by stock
    xarray ``to_zarr(consolidated=False)``, the reference's
    minibackend/custom_processes.py:187-188 output mode) are opened
    by walking the per-array ``.zarray``/``.zattrs`` files instead."""
    zmeta = os.path.join(path, ".zmetadata")
    if os.path.exists(zmeta):
        with open(zmeta) as f:
            meta = json.load(f)["metadata"]
    else:
        # non-consolidated fallback: one tiny JSON read per array
        meta = {}
        for name in sorted(os.listdir(path)):
            adir_ = os.path.join(path, name)
            zarr_doc = os.path.join(adir_, ".zarray")
            if not os.path.isfile(zarr_doc):
                continue
            with open(zarr_doc) as f:
                meta[f"{name}/.zarray"] = json.load(f)
            zattrs_doc = os.path.join(adir_, ".zattrs")
            if os.path.isfile(zattrs_doc):
                with open(zattrs_doc) as f:
                    meta[f"{name}/.zattrs"] = json.load(f)
        if not meta:
            raise FileNotFoundError(
                f"read_zarr_cube: no .zmetadata and no <array>/.zarray "
                f"files under {path}"
            )
    if value_col is None:
        data_arrays = [
            k.split("/")[0]
            for k, v in meta.items()
            if k.endswith("/.zarray")
            and len(meta.get(f"{k.split('/')[0]}/.zattrs", {}).get(
                "_ARRAY_DIMENSIONS", []
            )) > 1
        ]
        if len(data_arrays) != 1:
            raise ValueError(
                f"read_zarr_cube: cannot infer the data array from "
                f"{sorted(data_arrays)}; pass value_col"
            )
        value_col = data_arrays[0]
    zarray = meta[f"{value_col}/.zarray"]
    dims = meta[f"{value_col}/.zattrs"]["_ARRAY_DIMENSIONS"]
    shape, chunk_shape = zarray["shape"], zarray["chunks"]
    np_dtype = np.dtype(zarray["dtype"])
    if zarray.get("order", "C") != "C":
        raise NotImplementedError(
            f"zarr array {value_col!r} is {zarray['order']}-order; "
            "only C-order chunks are readable here"
        )
    if zarray.get("filters"):
        raise NotImplementedError(
            f"zarr array {value_col!r} declares filters "
            f"{zarray['filters']}; filtered stores are not readable here"
        )
    decode = _chunk_decoder(zarray, value_col)

    # axis coordinates: driver-read, axis-sized
    axes: list[np.ndarray] = []
    spark_types: list[str | None] = []
    for d in dims:
        a_meta = meta[f"{d}/.zarray"]
        a_decode = _chunk_decoder(a_meta, d)
        with open(os.path.join(path, d, "0"), "rb") as f:
            raw = a_decode(f.read())
        axes.append(
            np.frombuffer(raw, dtype=np.dtype(a_meta["dtype"]))[
                : a_meta["shape"][0]
            ]
        )
        spark_types.append(
            meta.get(f"{d}/.zattrs", {}).get("_SPARK_TYPE")
        )

    adir = os.path.join(path, value_col)
    chunk_files = sorted(
        n for n in os.listdir(adir) if not n.startswith(".")
    )
    # slice the file list to the decode parallelism directly at
    # parallelize time: the old repartition spread the work the same
    # way but paid a 32-Python-task scan of the tiny list PLUS a
    # shuffle before the decode tasks (r17)
    files_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(n,) for n in chunk_files],
            max(1, min(len(chunk_files), 64)),
        ),
        "chunk string",
    )

    import pandas as pd

    sql_type = {
        "M": "timestamp", "i": "bigint", "u": "bigint", "f": "double",
        "b": "boolean", "U": "string",
    }
    dim_sql = [
        spark_types[i] or sql_type[axes[i].dtype.kind]
        for i in range(len(dims))
    ]
    dim_fields = ", ".join(
        f"`{d}` {t}" for d, t in zip(dims, dim_sql)
    )
    # integer stores are hole-free by the sink contract, so they come
    # back lossless as bigint (ADVICE r11: double coercion silently
    # loses int64/uint64 values above 2^53); floats stay double
    is_int = np_dtype.kind in ("i", "u")
    out_schema = (
        f"{dim_fields}, `{value_col}` {'bigint' if is_int else 'double'}"
    )
    is_float = np_dtype.kind == "f"
    # datetime64 axes whose original Spark type was DATE hand back
    # python date objects so the declared schema holds
    date_dims = {
        d for d, t in zip(dims, dim_sql) if t == "date"
    }

    def explode_chunks(batches):
        for pdf in batches:
            for name in pdf["chunk"]:
                cidx = [int(p) for p in name.split(".")]
                with open(os.path.join(adir, name), "rb") as f:
                    arr = np.frombuffer(
                        decode(f.read()), dtype=np_dtype
                    ).reshape(chunk_shape)
                # slice off edge padding
                slices = tuple(
                    slice(0, min(cl, s - ci * cl))
                    for ci, s, cl in zip(cidx, shape, chunk_shape)
                )
                arr = arr[slices]
                keep = (
                    ~np.isnan(arr) if is_float
                    else np.ones(arr.shape, dtype=bool)
                )
                locs = np.nonzero(keep)
                cols = {}
                for i, d in enumerate(dims):
                    ords = locs[i] + cidx[i] * chunk_shape[i]
                    vals = axes[i][ords]
                    if d in date_dims:
                        vals = pd.Series(vals).dt.date
                    cols[d] = vals
                vals = arr[locs]
                if is_int:
                    if np_dtype.kind == "u" and np_dtype.itemsize == 8 and (
                        vals > np.iinfo(np.int64).max
                    ).any():
                        raise ValueError(
                            "read_zarr_cube: uint64 store holds values "
                            "above int64 range — unrepresentable as "
                            "bigint without wrapping"
                        )
                    vals = vals.astype(np.int64)
                else:
                    vals = vals.astype(np.float64)
                cols[value_col] = vals
                yield pd.DataFrame(cols)

    return files_df.mapInPandas(explode_chunks, schema=out_schema)
