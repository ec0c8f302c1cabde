"""Distributed zarr v2 sink/source (io/zarr.py): round-trips through
save_result, spec-layout parsing INDEPENDENT of the module's reader
(json + zlib + frombuffer only), sparse stores, date axes, the
duplicate-cell and integer-coverage guards, and the default chunker."""

import datetime as dt
import json
import os
import zlib

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.zarr import (
    default_chunks,
    read_zarr_cube,
    write_zarr_cube,
)


def _cube_df(spark):
    rows = []
    for t in range(3):
        for b in ("red", "nir"):
            for y in range(5):
                for x in range(7):
                    rows.append(
                        (
                            dt.datetime(2024, 1, 1 + t),
                            b,
                            float(y),
                            float(x),
                            float(t * 100 + (b == "nir") * 50 + y * 7 + x),
                        )
                    )
    return spark.createDataFrame(
        rows, "time timestamp, band string, y double, x double, value double"
    )


def test_zarr_roundtrip_via_save_result(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import save_result

    df = _cube_df(spark)
    out = str(tmp_path / "store.zarr")
    assert save_result(df, out, format="zarr", chunks=[1, 1, 5, 7]) == out
    back = read_zarr_cube(spark, out)
    assert back.columns == ["time", "band", "y", "x", "value"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_zarr_store_layout_parses_independently(spark, tmp_path):
    """Validate the on-disk store with json/zlib/frombuffer ONLY — no
    module reader involved — so the layout itself is pinned to the
    zarr v2 spec (shape/chunks/dtype/fill_value/C-order, consolidated
    metadata, xarray _ARRAY_DIMENSIONS convention)."""
    df = _cube_df(spark)
    out = str(tmp_path / "store.zarr")
    write_zarr_cube(df, out, chunks=[1, 1, 5, 7]).count()

    assert json.load(open(os.path.join(out, ".zgroup"))) == {"zarr_format": 2}
    za = json.load(open(os.path.join(out, "value", ".zarray")))
    assert za["shape"] == [3, 2, 5, 7]
    assert za["chunks"] == [1, 1, 5, 7]
    assert za["dtype"] == "<f8"
    assert za["fill_value"] == "NaN"
    assert za["compressor"]["id"] == "zlib"
    assert za["order"] == "C"
    attrs = json.load(open(os.path.join(out, "value", ".zattrs")))
    assert attrs["_ARRAY_DIMENSIONS"] == ["time", "band", "y", "x"]
    zmeta = json.load(open(os.path.join(out, ".zmetadata")))
    assert zmeta["zarr_consolidated_format"] == 1
    assert "value/.zarray" in zmeta["metadata"]

    # band axis sorts ("nir", "red"); chunk (0, 0) is t=0 / nir, so
    # cell (y=2, x=3) = 0*100 + 50 + 2*7 + 3 = 67
    raw = zlib.decompress(
        open(os.path.join(out, "value", "0.0.0.0"), "rb").read()
    )
    arr = np.frombuffer(raw, "<f8").reshape(5, 7)
    assert arr[2, 3] == 67.0
    band_axis = np.frombuffer(
        zlib.decompress(open(os.path.join(out, "band", "0"), "rb").read()),
        json.load(open(os.path.join(out, "band", ".zarray")))["dtype"],
    )
    assert band_axis.tolist() == ["nir", "red"]
    time_meta = json.load(open(os.path.join(out, "time", ".zarray")))
    assert time_meta["dtype"] == "<M8[ns]"
    # 18 chunk files: 3 time x 2 band x 1 y x 1 x... no: chunks [1,1,5,7]
    files = [
        n for n in os.listdir(os.path.join(out, "value"))
        if not n.startswith(".")
    ]
    assert len(files) == 6


def test_zarr_sparse_and_edge_chunks(spark, tmp_path):
    """Missing cells come back as ABSENT rows (fill_value dropped) and
    edge chunks are stored padded to the chunk shape per spec."""
    df = _cube_df(spark).filter("value % 7 != 3")
    out = str(tmp_path / "sparse.zarr")
    write_zarr_cube(df, out, chunks=[2, 2, 3, 4]).count()
    # edge chunk 1.0.1.1 (time 2, band nir.., y 3-4, x 4-6) is padded:
    # stored cells = 2*2*3*4 even though valid extent is 1*2*2*3
    raw = zlib.decompress(
        open(os.path.join(out, "value", "1.0.1.1"), "rb").read()
    )
    assert len(raw) == 2 * 2 * 3 * 4 * 8
    back = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_zarr_date_axis_and_int_dtype(spark, tmp_path):
    df = (
        _cube_df(spark)
        .selectExpr(
            "cast(time as date) as day", "band", "y", "x", "value"
        )
        .filter("band = 'red'")
    )
    out = str(tmp_path / "day.zarr")
    write_zarr_cube(df, out, dtype="int64").count()
    za = json.load(open(os.path.join(out, "value", ".zarray")))
    assert za["dtype"] == "<i8" and za["fill_value"] == 0
    back = read_zarr_cube(spark, out)
    assert dict(back.dtypes)["day"] == "date"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_zarr_guards(spark, tmp_path):
    from pyspark.errors import PythonException

    df = _cube_df(spark)
    # duplicate cells (band dim dropped) must raise, never average
    dup = df.select("time", "y", "x", "value")
    with pytest.raises(PythonException, match="duplicate cells"):
        write_zarr_cube(dup, str(tmp_path / "dup.zarr")).count()
    # integer dtype + incomplete coverage must raise (no NaN to carry)
    sparse = df.filter("value % 7 != 3")
    with pytest.raises(PythonException, match="not fully covered"):
        write_zarr_cube(
            sparse, str(tmp_path / "hole.zarr"), dtype="int32"
        ).count()
    with pytest.raises(ValueError, match="chunks"):
        write_zarr_cube(df, str(tmp_path / "bad.zarr"), chunks=[9, 9])
    # unknown save_result option rejected
    from openeo_processes_dask_ml_spark.io.load import save_result

    with pytest.raises(ValueError, match="unknown options"):
        save_result(df, str(tmp_path / "o.zarr"), format="zarr", epsg=4326)


def test_default_chunks_policy():
    # trailing dims keep full runs first (C-order contiguity)
    assert default_chunks([3, 2, 5, 7]) == [3, 2, 5, 7]  # tiny: one chunk
    ch = default_chunks([1000, 10, 4096, 4096], target_cells=1 << 21)
    assert ch[3] == 4096 and ch[2] == 512 and ch[1] == 1 and ch[0] == 1
    assert default_chunks([5], target_cells=2) == [2]


def test_load_zarr_collection_cube(spark, tmp_path):
    """zarr store -> CubeFrame with the store's dims, usable by the
    cube API (dim aliasing via resolve_dim, reduce over time)."""
    from openeo_processes_dask_ml_spark.io.zarr import load_zarr_collection

    df = _cube_df(spark)
    out = str(tmp_path / "cube.zarr")
    write_zarr_cube(df, out, chunks=[1, 1, 5, 7]).count()
    cube = load_zarr_collection(spark, out)
    assert cube.dims == {"time": "time", "band": "band", "y": "y", "x": "x"}
    assert cube.value_col == "value"
    assert cube.attrs["source"] == f"zarr:{out}"
    # 't' resolves to the time column through the openEO alias table
    assert cube.dim_col("t") == "time"
    reduced = cube.reduce_dimension("t", "mean")
    got = {
        (r["band"], r["y"], r["x"]): r["value"]
        for r in reduced.df.collect()
    }
    # mean over t of t*100 + base = 100 + base
    assert got[("red", 0.0, 0.0)] == 100.0
    assert got[("nir", 4.0, 6.0)] == 100.0 + 50 + 4 * 7 + 6


def _slice_df(spark, t, n=None):
    rows = [
        (
            dt.datetime(2024, 1, 1 + t),
            float(y),
            float(x),
            float(t * 100 + y * 4 + x),
        )
        for y in range(3)
        for x in range(4)
    ]
    return spark.createDataFrame(
        rows, "time timestamp, y double, x double, value double"
    )


def test_append_zarr_slices_grow_replay_and_guards(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.zarr import append_zarr_slices

    out = str(tmp_path / "a.zarr")
    append_zarr_slices(_slice_df(spark, 0), out)
    append_zarr_slices(_slice_df(spark, 1), out)
    append_zarr_slices(_slice_df(spark, 2), out)
    za = json.load(open(os.path.join(out, "value", ".zarray")))
    assert za["shape"] == [3, 3, 4] and za["chunks"][0] == 1
    expect = (
        _slice_df(spark, 0)
        .union(_slice_df(spark, 1))
        .union(_slice_df(spark, 2))
    )
    back = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # exact tail replay (foreachBatch retry) is idempotent
    append_zarr_slices(_slice_df(spark, 2), out)
    back2 = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back2.collect())) == sorted(
        map(tuple, expect.collect())
    )
    # mixed stored+new leading values are neither append nor replay
    with pytest.raises(ValueError, match="tail replay"):
        append_zarr_slices(
            _slice_df(spark, 2).union(_slice_df(spark, 3)), out
        )
    # a batch on a different trailing grid must be rejected
    bad = _slice_df(spark, 4).filter("x < 3")
    with pytest.raises(ValueError, match="stored grid"):
        append_zarr_slices(bad, out)
    # an EMPTY micro-batch returns None per the documented contract
    # (r13: the old per-dim axis loop raised a spurious grid mismatch
    # on multi-dim stores before reaching the empty check)
    assert append_zarr_slices(_slice_df(spark, 5).filter("1=0"), out) is None


def test_stream_zarr_sink_microbatches(spark, tmp_path):
    """Three parquet files -> maxFilesPerTrigger=1 -> three
    micro-batches, each appending one time slice; the final store
    equals the batch union."""
    from openeo_processes_dask_ml_spark.io.zarr import stream_zarr_sink

    src = str(tmp_path / "src")
    for t in range(3):
        _slice_df(spark, t).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "time timestamp, y double, x double, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "s.zarr")
    q = stream_zarr_sink(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination()
    za = json.load(open(os.path.join(out, "value", ".zarray")))
    assert za["shape"] == [3, 3, 4]
    back = read_zarr_cube(spark, out)
    expect = spark.read.parquet(src)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_zarr_nonconsolidated_fallback(spark, tmp_path):
    """A store without .zmetadata (stock xarray to_zarr(
    consolidated=False), the reference's custom_processes.py:187-188
    output mode) opens via the per-array .zarray/.zattrs walk."""
    df = _cube_df(spark)
    out = str(tmp_path / "noconso.zarr")
    write_zarr_cube(df, out, chunks=[1, 1, 5, 7]).count()
    os.remove(os.path.join(out, ".zmetadata"))
    back = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # and a directory with neither form of metadata fails loudly
    empty = tmp_path / "empty.zarr"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no .zmetadata"):
        read_zarr_cube(spark, str(empty))


def test_zarr_float16_normalizes_to_f4(spark, tmp_path):
    """dtype='float16' resolves to the declared '<f4' wire dtype for
    the CHUNK BYTES too (ADVICE r11): the store must be
    self-consistent, not float16 bytes under an f4 header."""
    df = (
        _cube_df(spark)
        .filter("band = 'red'")
        .select("time", "y", "x", "value")
    )
    out = str(tmp_path / "f16.zarr")
    write_zarr_cube(
        df, out, dim_cols=["time", "y", "x"], dtype="float16",
        chunks=[1, 5, 7],
    ).count()
    za = json.load(open(os.path.join(out, "value", ".zarray")))
    assert za["dtype"] == "<f4"
    raw = zlib.decompress(
        open(os.path.join(out, "value", "0.0.0"), "rb").read()
    )
    assert len(raw) == 5 * 7 * 4  # f4 bytes, not f2
    back = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_zarr_int64_reads_lossless_bigint(spark, tmp_path):
    """int64 stores come back as bigint (ADVICE r11): a value above
    2^53 — unrepresentable in double — must round-trip exactly."""
    big = (1 << 60) + 12345
    df = spark.createDataFrame(
        [(0, 0, big), (0, 1, big + 1), (1, 0, 7), (1, 1, 8)],
        "y bigint, x bigint, value bigint",
    )
    out = str(tmp_path / "big.zarr")
    write_zarr_cube(df, out, dtype="int64", chunks=[2, 2]).count()
    back = read_zarr_cube(spark, out)
    assert dict(back.dtypes)["value"] == "bigint"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def _strip_compression(store: str) -> None:
    """Rewrite a sink-written store as a raw (compressor: null) store —
    the shape stock xarray produces under encoding={'compressor': None}:
    decompress every chunk file in place, patch every .zarray doc."""
    metas = {}
    for name in os.listdir(store):
        adir = os.path.join(store, name)
        zdoc = os.path.join(adir, ".zarray")
        if not os.path.isfile(zdoc):
            continue
        za = json.load(open(zdoc))
        za["compressor"] = None
        json.dump(za, open(zdoc, "w"))
        metas[f"{name}/.zarray"] = za
        for chunk in os.listdir(adir):
            if chunk.startswith("."):
                continue
            cp = os.path.join(adir, chunk)
            raw = zlib.decompress(open(cp, "rb").read())
            open(cp, "wb").write(raw)
    zmeta_path = os.path.join(store, ".zmetadata")
    zmeta = json.load(open(zmeta_path))
    for k, v in metas.items():
        zmeta["metadata"][k] = v
    json.dump(zmeta, open(zmeta_path, "w"))


def test_zarr_raw_uncompressed_store_reads(spark, tmp_path):
    """VERDICT r12 #3: a compressor:null store (stock xarray's
    encoding={'compressor': None} output) must read — raw C-order
    chunk bytes, zero codec work — in both consolidated and
    .zarray-walk forms."""
    df = _cube_df(spark)
    out = str(tmp_path / "raw.zarr")
    write_zarr_cube(df, out, chunks=[1, 1, 5, 7]).count()
    _strip_compression(out)
    back = read_zarr_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # the .zarray-walk (non-consolidated) path honors null too
    os.remove(os.path.join(out, ".zmetadata"))
    back2 = read_zarr_cube(spark, out)
    assert back2.count() == df.count()


def test_zarr_unsupported_codec_and_raw_append_guards(spark, tmp_path):
    """Blosc (or any other codec) names the readable encodings in its
    error; append refuses to extend a store it didn't write (raw
    chunks + zlib appends would corrupt the store)."""
    from openeo_processes_dask_ml_spark.io.zarr import append_zarr_slices

    df = _cube_df(spark)
    out = str(tmp_path / "blosc.zarr")
    write_zarr_cube(df, out, chunks=[1, 1, 5, 7]).count()
    zmeta_path = os.path.join(out, ".zmetadata")
    zmeta = json.load(open(zmeta_path))
    zmeta["metadata"]["value/.zarray"]["compressor"] = {
        "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
    }
    json.dump(zmeta, open(zmeta_path, "w"))
    with pytest.raises(NotImplementedError, match="compressor: null"):
        read_zarr_cube(spark, out)

    out2 = str(tmp_path / "raw2.zarr")
    write_zarr_cube(df, out2, chunks=[1, 1, 5, 7]).count()
    _strip_compression(out2)
    with pytest.raises(ValueError, match="only extends stores this sink"):
        append_zarr_slices(df, out2)


def test_zarr_sink_accepts_file_uri(spark, tmp_path):
    """file:// out_dirs route through io.fs (r14) and the store reads
    back from the same local path."""
    df = _cube_df(spark)
    local = str(tmp_path / "store_uri")
    write_zarr_cube(df, f"file://{local}", dim_cols=["time", "band", "y", "x"])
    back = read_zarr_cube(spark, local)
    assert back.count() == df.count()
    a = {tuple(r)[:4]: r["value"] for r in df.collect()}
    b = {tuple(r)[:4]: r["value"] for r in back.collect()}
    assert a == b
