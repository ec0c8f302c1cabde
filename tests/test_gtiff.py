"""Pure-numpy GeoTIFF codec + distributed tile sink (io/gtiff.py).

Reference analog: minibackend/custom_processes.py:115-219 writes real
rasters via rioxarray; here the uncompressed strip profile of classic
TIFF is implemented directly so the full chain (cube -> save_result ->
reload through decode_assets_to_cube) runs offline.
"""

import os
import struct

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.gtiff import (
    decode_gtiff,
    encode_gtiff,
    write_gtiff_tiles,
)


@pytest.mark.parametrize(
    "dtype", ["uint8", "uint16", "int16", "int32", "float32", "float64"]
)
def test_encode_decode_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(7)
    if np.dtype(dtype).kind == "f":
        arr = rng.random((5, 7)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (5, 7)).astype(dtype)
    out, meta = decode_gtiff(encode_gtiff(arr))
    assert out.dtype.newbyteorder("=") == np.dtype(dtype)
    np.testing.assert_array_equal(out, arr)
    assert meta == {}


def test_geotags_roundtrip():
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    payload = encode_gtiff(arr, bbox=(10.0, 40.0, 14.0, 43.0), epsg=32632)
    out, meta = decode_gtiff(payload)
    np.testing.assert_array_equal(out, arr)
    assert meta["bbox"] == (10.0, 40.0, 14.0, 43.0)
    assert meta["pixel_scale"] == (1.0, 1.0)
    assert meta["epsg"] == 32632
    # geographic CRS goes through the geographic geokey
    _, meta2 = decode_gtiff(
        encode_gtiff(arr, bbox=(0, 0, 4, 3), epsg=4326)
    )
    assert meta2["epsg"] == 4326


def test_decode_rejects_unsupported_profiles():
    with pytest.raises(ValueError, match="byte-order"):
        decode_gtiff(b"not a tiff at all")
    payload = encode_gtiff(np.zeros((2, 2), dtype=np.uint8))
    # flip the compression entry (tag 259, SHORT, count 1, value 1 -> 6
    # old-style JPEG, deprecated by TIFF-EP and genuinely unsupported —
    # LZW (5) is implemented since r9, new-style JPEG (7) since r10)
    plain = struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 1).ljust(4, b"\0")
    oldjpeg = struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 6).ljust(4, b"\0")
    assert plain in payload
    with pytest.raises(NotImplementedError, match="compression"):
        decode_gtiff(payload.replace(plain, oldjpeg))
    # a BigTIFF header cut off before its 8-byte IFD pointer
    with pytest.raises(ValueError, match="truncated BigTIFF"):
        decode_gtiff(struct.pack("<2sHI", b"II", 43, 8))
    # spec fixes the BigTIFF offset size at 8; anything else is alien
    with pytest.raises(NotImplementedError, match="offset size"):
        decode_gtiff(struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16))
    with pytest.raises(NotImplementedError, match="magic"):
        decode_gtiff(struct.pack("<2sHI", b"II", 44, 8))


def test_decode_image_dispatches_tiff():
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    arr = np.arange(6, dtype=np.uint8).reshape(2, 3)
    out = decode_image(encode_gtiff(arr), "gtiff")
    np.testing.assert_array_equal(out, arr)


def _cube_df(spark):
    rows = []
    for item in ("a", "b"):
        for band in ("red", "nir"):
            for yi in range(4):
                for xi in range(4):
                    rows.append(
                        (
                            item,
                            band,
                            3.5 - yi,  # pixel centers, north-up listing
                            xi + 0.5,
                            float(yi * 4 + xi + (100 if band == "nir" else 0)),
                        )
                    )
    return spark.createDataFrame(
        rows, "item_id string, band string, y double, x double, value double"
    )


def test_write_gtiff_tiles_and_reload(spark, tmp_path):
    """Distributed write -> manifest -> fetch+decode round-trip: the
    re-decoded cube is value-identical to the source, including the
    north-up row order and the pixel-center coordinate math."""
    from openeo_processes_dask_ml_spark.io.raster import decode_assets_to_cube
    from openeo_processes_dask_ml_spark.io.stac_client import ASSET_SCHEMA

    df = _cube_df(spark)
    out_dir = str(tmp_path / "tiles")
    manifest = write_gtiff_tiles(
        df, out_dir, group_cols=["item_id", "band"], epsg=32632
    ).collect()
    assert len(manifest) == 4
    for m in manifest:
        assert os.path.exists(m["path"])
        assert (m["n_rows"], m["n_cols"]) == (4, 4)
        assert (m["minx"], m["miny"], m["maxx"], m["maxy"]) == (0.0, 0.0, 4.0, 4.0)

    arr, meta = decode_gtiff(open(manifest[0]["path"], "rb").read())
    assert meta["epsg"] == 32632 and meta["bbox"] == (0.0, 0.0, 4.0, 4.0)

    assets = spark.createDataFrame(
        [
            (
                m["item_id"],
                "c",
                "2024-01-01T00:00:00Z",
                m["band"],
                m["path"],
                "image/tiff; application=geotiff",
                [m["minx"], m["miny"], m["maxx"], m["maxy"]],
            )
            for m in manifest
        ],
        ASSET_SCHEMA,
    )

    def read_file(href):
        with open(href, "rb") as f:
            return f.read()

    cube = decode_assets_to_cube(assets, read_file)
    back = {
        (r["item_id"], r["band"], r["y"], r["x"]): r["value"]
        for r in cube.df.collect()
    }
    src = {
        (r["item_id"], r["band"], r["y"], r["x"]): r["value"]
        for r in df.collect()
    }
    assert back == src


def test_save_result_gtiff_distributed(spark, tmp_path):
    """save_result(format='gtiff') takes the distributed tile path when
    x/y dims are identifiable — no geo-stack warning, real .tif files +
    a parquet manifest."""
    import warnings

    from openeo_processes_dask_ml_spark.io.load import save_result

    df = _cube_df(spark)
    out = str(tmp_path / "export")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning fails
        save_result(
            df,
            out,
            format="gtiff",
            value_col="value",
            dim_cols=["item_id", "band", "y", "x"],
            epsg=32632,
        )
    tifs = [f for f in os.listdir(out) if f.endswith(".tif")]
    assert len(tifs) == 4
    manifest = spark.read.parquet(os.path.join(out, "_manifest"))
    assert manifest.count() == 4
    assert set(manifest.columns) >= {"path", "n_rows", "n_cols", "minx"}


def test_write_gtiff_tiles_rejects_duplicates_and_int_holes(spark, tmp_path):
    """A sink must never alter data: duplicate (y, x) cells (coarse
    group_cols) raise instead of silently averaging; sparse coverage
    with an integer dtype raises instead of casting NaN to garbage.
    Sparse coverage with a float dtype writes NaN nodata."""
    dup = spark.createDataFrame(
        [("a", 0.5, 0.5, 1.0), ("a", 0.5, 0.5, 3.0), ("a", 1.5, 0.5, 2.0),
         ("a", 0.5, 1.5, 4.0), ("a", 1.5, 1.5, 5.0)],
        "g string, y double, x double, value double",
    )
    with pytest.raises(Exception, match="duplicate"):
        write_gtiff_tiles(dup, str(tmp_path / "d"), group_cols=["g"]).collect()

    sparse = spark.createDataFrame(
        [("a", 0.5, 0.5, 1.0), ("a", 1.5, 1.5, 2.0)],
        "g string, y double, x double, value double",
    )
    with pytest.raises(Exception, match="NaN"):
        write_gtiff_tiles(
            sparse, str(tmp_path / "i"), group_cols=["g"], dtype="int32"
        ).collect()
    m = write_gtiff_tiles(
        sparse, str(tmp_path / "f"), group_cols=["g"], dtype="float64"
    ).collect()
    arr, _ = decode_gtiff(open(m[0]["path"], "rb").read())
    assert np.isnan(arr).sum() == 2 and arr.shape == (2, 2)


@pytest.mark.parametrize(
    "compression,tile,predictor",
    [
        ("deflate", None, 1),
        ("deflate", None, 2),
        (None, (5, 4), 1),
        ("deflate", (5, 4), 1),
        ("deflate", (16, 16), 2),  # the real COG interior combo
        ("lzw", None, 1),
        ("lzw", None, 2),
        ("lzw", (5, 4), 1),
        ("lzw", (16, 16), 2),  # the classic archival combo
        ("packbits", None, 1),
        ("packbits", (5, 4), 2),
    ],
)
def test_roundtrip_cog_interior_layouts(compression, tile, predictor):
    """Deflate compression, tile organization, and predictor-2
    differencing — the layout real COGs use inside — round-trip
    bit-exactly, including non-tile-multiple edges."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 4096, (13, 11)).astype("uint16")
    payload = encode_gtiff(
        arr,
        bbox=(0.0, 0.0, 11.0, 13.0),
        epsg=32632,
        compression=compression,
        tile=tile,
        predictor=predictor,
    )
    out, meta = decode_gtiff(payload)
    np.testing.assert_array_equal(out, arr)
    assert meta["epsg"] == 32632


def test_deflate_predictor_compresses_smooth_rasters():
    """Predictor-2 deltas make smooth gradients highly compressible —
    the reason real Sentinel-2 COGs ship deflate+predictor."""
    grad = np.add.outer(
        np.arange(256, dtype=np.uint16), np.arange(256, dtype=np.uint16)
    )
    plain = encode_gtiff(grad)
    deflated = encode_gtiff(grad, compression="deflate", predictor=2)
    assert len(deflated) < len(plain) / 10
    out, _ = decode_gtiff(deflated)
    np.testing.assert_array_equal(out, grad)


def test_predictor_rejects_floats():
    with pytest.raises(ValueError, match="integer-only"):
        encode_gtiff(np.zeros((2, 2)), predictor=2)
    ok = encode_gtiff(np.zeros((2, 2)))  # float64 without predictor
    assert decode_gtiff(ok)[0].dtype.kind == "f"


def test_sink_deflate_tiled_roundtrip(spark, tmp_path):
    """The sink can emit COG-interior layouts (deflate + tiles) and the
    standard decode path reads them back identically."""
    df = _cube_df(spark)
    m = write_gtiff_tiles(
        df,
        str(tmp_path / "t"),
        group_cols=["item_id", "band"],
        compression="deflate",
        tile=(2, 2),
    ).collect()
    arr, _ = decode_gtiff(open(m[0]["path"], "rb").read())
    assert arr.shape == (4, 4)
    from openeo_processes_dask_ml_spark.scale.multimodal import decode_image

    np.testing.assert_array_equal(
        decode_image(open(m[0]["path"], "rb").read(), "gtiff"), arr
    )


def test_overview_pyramid_roundtrip():
    """COG-style chained overview IFDs: full-res at ifd 0, each level
    addressable, NewSubfileType-tagged, geo tags carrying the SAME
    cover with doubled pixel scale; past-the-chain access raises."""
    from openeo_processes_dask_ml_spark.io.gtiff import gtiff_ifd_count

    rng = np.random.default_rng(3)
    full = rng.integers(0, 255, (16, 16)).astype("uint8")
    ov1, ov2 = full[::2, ::2], full[::4, ::4]
    payload = encode_gtiff(
        full,
        bbox=(0.0, 0.0, 16.0, 16.0),
        epsg=32632,
        compression="deflate",
        tile=(8, 8),
        predictor=2,
        overviews=[ov1, ov2],
    )
    assert gtiff_ifd_count(payload) == 3
    a0, m0 = decode_gtiff(payload)
    a1, m1 = decode_gtiff(payload, ifd=1)
    a2, m2 = decode_gtiff(payload, ifd=2)
    np.testing.assert_array_equal(a0, full)
    np.testing.assert_array_equal(a1, ov1)
    np.testing.assert_array_equal(a2, ov2)
    assert m0["bbox"] == m1["bbox"] == m2["bbox"] == (0.0, 0.0, 16.0, 16.0)
    assert m1["pixel_scale"] == (2.0, 2.0)  # same cover, half the pixels
    assert m2["epsg"] == 32632
    with pytest.raises(ValueError, match="no IFD"):
        decode_gtiff(payload, ifd=3)


def test_sink_overview_levels(spark, tmp_path):
    df = _cube_df(spark)
    m = write_gtiff_tiles(
        df,
        str(tmp_path / "p"),
        group_cols=["item_id", "band"],
        overview_levels=2,
    ).collect()
    from openeo_processes_dask_ml_spark.io.gtiff import gtiff_ifd_count

    payload = open(m[0]["path"], "rb").read()
    # 4x4 base -> 2x2 then 1x1 overviews
    assert gtiff_ifd_count(payload) == 3
    base, _ = decode_gtiff(payload)
    ov, _ = decode_gtiff(payload, ifd=1)
    np.testing.assert_array_equal(ov, base[::2, ::2])


def test_level_selection_helpers():
    from openeo_processes_dask_ml_spark.io.gtiff import (
        gtiff_ifd_dims,
        gtiff_level_for_resolution,
    )

    full = np.zeros((16, 16), dtype="uint8")
    p = encode_gtiff(
        full, bbox=(0, 0, 16, 16), overviews=[full[::2, ::2], full[::4, ::4]]
    )
    assert gtiff_ifd_dims(p) == [(16, 16), (8, 8), (4, 4)]
    assert gtiff_level_for_resolution(p, (0, 0, 16, 16), 1.0) == 0
    assert gtiff_level_for_resolution(p, (0, 0, 16, 16), 2.0) == 1
    assert gtiff_level_for_resolution(p, (0, 0, 16, 16), 3.9) == 1
    assert gtiff_level_for_resolution(p, (0, 0, 16, 16), 100.0) == 2
    no_ov = encode_gtiff(full, bbox=(0, 0, 16, 16))
    assert gtiff_level_for_resolution(no_ov, (0, 0, 16, 16), 100.0) == 0


def test_decode_assets_pyramid_selection(spark):
    """target_resolution decodes the matching OVERVIEW IFD — 1/16 of
    the pixels for a 4x-coarser request — with pixel-center coords on
    the overview grid; files without overviews fall back to level 0."""
    from openeo_processes_dask_ml_spark.io.raster import decode_assets_to_cube
    from openeo_processes_dask_ml_spark.io.stac_client import ASSET_SCHEMA

    full = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = encode_gtiff(
        full,
        bbox=(0.0, 0.0, 16.0, 16.0),
        overviews=[full[::2, ::2], full[::4, ::4]],
        compression="deflate",
    )
    assets = spark.createDataFrame(
        [("A", "c", "2024-01-01T00:00:00Z", "red", "mem://A/red.tif",
          "image/tiff; application=geotiff", [0.0, 0.0, 16.0, 16.0])],
        ASSET_SCHEMA,
    )
    cube = decode_assets_to_cube(
        assets, lambda h, _p=payload: _p, target_resolution=4.0
    )
    rows = cube.df.collect()
    assert len(rows) == 16  # 4x4 overview, not 256 full-res pixels
    by_key = {(r["y"], r["x"]): r["value"] for r in rows}
    # level-2 grid: pixel size 4, centers at 2, 6, 10, 14; top-left
    # overview sample = full[0, 0]
    assert by_key[(14.0, 2.0)] == float(full[0, 0])
    assert by_key[(2.0, 14.0)] == float(full[12, 12])
    # full-res request unchanged
    assert decode_assets_to_cube(
        assets, lambda h, _p=payload: _p, target_resolution=1.0
    ).df.count() == 256


def test_ranged_decode_fetches_only_needed_bytes():
    """decode_gtiff_ranged + the cloud-optimized layout: an overview
    read of a large pyramid file moves a small fraction of the bytes
    (one head range + the level's chunks), and matches the whole-file
    decode bit-for-bit."""
    from openeo_processes_dask_ml_spark.io.gtiff import decode_gtiff_ranged

    rng = np.random.default_rng(5)
    full = rng.integers(0, 4096, (512, 512)).astype("uint16")
    payload = encode_gtiff(
        full,
        bbox=(0.0, 0.0, 512.0, 512.0),
        compression="deflate",
        tile=(64, 64),
        overviews=[full[::4, ::4], full[::16, ::16]],
    )

    fetched = {"bytes": 0, "calls": 0}

    def fetch_range(off, size):
        fetched["bytes"] += min(size, max(len(payload) - off, 0))
        fetched["calls"] += 1
        return payload[off : off + size]

    arr, meta = decode_gtiff_ranged(fetch_range, ifd=2)
    np.testing.assert_array_equal(arr, full[::16, ::16])
    assert meta["bbox"] == (0.0, 0.0, 512.0, 512.0)
    # random uint16 barely compresses: the full payload is ~0.5 MB;
    # the 32x32 overview read must move well under a tenth of it
    assert len(payload) > 400_000
    assert fetched["bytes"] < len(payload) / 10, fetched

    full_again, _ = decode_gtiff_ranged(fetch_range, ifd=0)
    np.testing.assert_array_equal(full_again, full)


def test_decode_assets_range_fetcher_pyramid(spark):
    """decode_assets_to_cube(range_fetcher=...): TIFF assets decode via
    byte ranges — a coarse request never fetches the full payload."""
    from openeo_processes_dask_ml_spark.io.raster import decode_assets_to_cube
    from openeo_processes_dask_ml_spark.io.stac_client import ASSET_SCHEMA

    full = np.arange(256 * 256, dtype=np.uint16).reshape(256, 256) % 251
    payload = encode_gtiff(
        full,
        bbox=(0.0, 0.0, 256.0, 256.0),
        tile=(64, 64),
        overviews=[full[::4, ::4], full[::16, ::16]],
    )
    assets = spark.createDataFrame(
        [("A", "c", "2024-01-01T00:00:00Z", "red", "mem://A/red.tif",
          "image/tiff; application=geotiff", [0.0, 0.0, 256.0, 256.0])],
        ASSET_SCHEMA,
    )

    def fetch_range(href, off, size, _p=payload):
        return _p[off : off + size]

    def no_whole_file(href):
        raise AssertionError("ranged path must not fetch whole files")

    cube = decode_assets_to_cube(
        assets,
        no_whole_file,
        target_resolution=16.0,
        range_fetcher=fetch_range,
    )
    rows = cube.df.collect()
    assert len(rows) == 256  # 16x16 overview of the 256x256 raster
    by_key = {(r["y"], r["x"]): r["value"] for r in rows}
    assert by_key[(248.0, 8.0)] == float(full[0, 0])


def test_cloud_optimized_byte_layout():
    """The encoder writes the actual COG layout: IFD0 directly after
    the 8-byte header, every IFD before any chunk data — what makes
    the one-head-read ranged metadata parse possible."""
    full = np.zeros((8, 8), dtype="uint8")
    payload = encode_gtiff(
        full, bbox=(0, 0, 8, 8), overviews=[full[::2, ::2]], tile=(4, 4)
    )
    ifd0 = struct.unpack("<I", payload[4:8])[0]
    assert ifd0 == 8  # header-first: IFDs start immediately
    # walk the chain; collect the max byte touched by any IFD block,
    # then assert every chunk offset lands after it
    bo = "<"
    off, max_ifd_end, chunk_offsets = ifd0, 0, []
    while off:
        n = struct.unpack(bo + "H", payload[off : off + 2])[0]
        for i in range(n):
            e = off + 2 + 12 * i
            tag, typ, count = struct.unpack(bo + "HHI", payload[e : e + 8])
            size = {3: 2, 4: 4, 12: 8}.get(typ, 1) * count
            if size > 4:
                (voff,) = struct.unpack(bo + "I", payload[e + 8 : e + 12])
                max_ifd_end = max(max_ifd_end, voff + size)
                if tag in (273, 324):  # strip/tile offsets
                    chunk_offsets += list(
                        struct.unpack(bo + "I" * count, payload[voff : voff + size])
                    )
            elif tag in (273, 324):
                chunk_offsets.append(struct.unpack(bo + "I", payload[e + 8 : e + 12])[0])
        end = off + 2 + 12 * n + 4
        max_ifd_end = max(max_ifd_end, end)
        (off,) = struct.unpack(bo + "I", payload[end - 4 : end])
    assert chunk_offsets and min(chunk_offsets) >= max_ifd_end


def test_lzw_stream_roundtrip_boundaries():
    """The TIFF LZW bit-width boundaries (9->10->11->12) and the
    mid-stream table reset (Clear before code 4094) all round-trip:
    a low-entropy megabyte forces thousands of table entries and at
    least one reset."""
    from openeo_processes_dask_ml_spark.io.gtiff import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"\x00",
        b"a" * 10_000,                       # KwKwK chains
        bytes(rng.integers(0, 4, 300_000)),  # forces width growth + clears
        bytes(rng.integers(0, 256, 50_000)), # high entropy
        np.add.outer(
            np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8)
        ).tobytes(),
    ]
    for raw in cases:
        assert _lzw_decode(_lzw_encode(raw)) == raw


def test_lzw_compresses_smooth_predictor_rasters():
    """LZW + predictor-2 meaningfully compresses smooth gradients (the
    archival Landsat-style layout)."""
    grad = np.add.outer(
        np.arange(256, dtype=np.uint16), np.arange(256, dtype=np.uint16)
    )
    plain = encode_gtiff(grad)
    lzw = encode_gtiff(grad, compression="lzw", predictor=2)
    assert len(lzw) < len(plain) / 4
    out, _ = decode_gtiff(lzw)
    np.testing.assert_array_equal(out, grad)


def test_save_result_gtiff_forwards_encoder_options(spark, tmp_path):
    """ADVICE r8: compression/tile/predictor/overview_levels flow
    through save_result to the encoder (files decode back with the
    requested layout), and unknown option keys raise instead of being
    silently dropped."""
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.io.gtiff import (
        decode_gtiff,
        gtiff_ifd_count,
    )
    from openeo_processes_dask_ml_spark.io.load import save_result

    df = _cube_df(spark)
    out = str(tmp_path / "export_lzw")
    save_result(
        df,
        out,
        format="gtiff",
        value_col="value",
        dim_cols=["item_id", "band", "y", "x"],
        epsg=32632,
        dtype="int32",
        compression="lzw",
        tile=(4, 4),
        predictor=2,
        overview_levels=1,
    )
    tifs = sorted(f for f in os.listdir(out) if f.endswith(".tif"))
    assert tifs
    payload = open(os.path.join(out, tifs[0]), "rb").read()
    # compression tag (259) must be LZW (5) and the pyramid present
    arr, meta = decode_gtiff(payload)
    assert gtiff_ifd_count(payload) == 2
    tag = struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 5).ljust(4, b"\0")
    assert tag in payload
    assert meta["epsg"] == 32632

    with _pytest.raises(ValueError, match="unknown options.*compresion"):
        save_result(
            df,
            str(tmp_path / "x"),
            format="gtiff",
            value_col="value",
            dim_cols=["item_id", "band", "y", "x"],
            compresion="lzw",  # typo'd on purpose
        )


# ----------------------------------------------------- planar (VERDICT r9 #8)


def _planar_tiff(arr, *, rows_per_strip=None, tile=None, compression=1,
                 predictor=1, planar_value=2):
    """Hand-crafted little-endian PlanarConfiguration=2 TIFF: each
    sample's plane stored as its own contiguous run of strips/tiles
    (TIFF 6.0 §, the rasterio-writable layout the reference reads for
    free). The module encoder is chunky-only by design, so planar
    payloads are built here from the module's own packing helpers."""
    import zlib

    from openeo_processes_dask_ml_spark.io import gtiff as G

    h, w, spp = arr.shape
    dt = arr.dtype
    bits, sfmt = G._DTYPES[dt]

    blocks = []
    if tile:
        tl, tw = tile
        for s in range(spp):
            plane = arr[:, :, s]
            for ty in range(0, h, tl):
                for tx in range(0, w, tw):
                    block = np.zeros((tl, tw), dt)
                    sub = plane[ty:ty + tl, tx:tx + tw]
                    block[:sub.shape[0], :sub.shape[1]] = sub
                    blocks.append(block)
    else:
        rps = rows_per_strip or h
        for s in range(spp):
            plane = arr[:, :, s]
            for y0 in range(0, h, rps):
                blocks.append(np.ascontiguousarray(plane[y0:y0 + rps]))
    payloads = []
    for block in blocks:
        if predictor == 2:
            block = G._apply_predictor2(block)
        elif predictor == 3:
            block = G._apply_predictor3(block)
        raw = block.tobytes()
        if compression == 8:
            raw = zlib.compress(raw)
        elif compression == 5:
            raw = G._lzw_encode(raw)
        payloads.append(raw)

    def longs(vals):
        return struct.pack(f"<{len(vals)}I", *vals)

    def shorts(vals):
        return struct.pack(f"<{len(vals)}H", *vals)

    def entries(offsets):
        es = [
            (G._T_WIDTH, G._TYPE_LONG, 1, w),
            (G._T_LENGTH, G._TYPE_LONG, 1, h),
            (G._T_BITS, G._TYPE_SHORT, spp, shorts([bits] * spp)),
            (G._T_COMPRESSION, G._TYPE_SHORT, 1, compression),
            (G._T_PHOTOMETRIC, G._TYPE_SHORT, 1, 1),
            (G._T_SPP, G._TYPE_SHORT, 1, spp),
            (G._T_SAMPLE_FORMAT, G._TYPE_SHORT, spp, shorts([sfmt] * spp)),
            (G._T_PLANAR, G._TYPE_SHORT, 1, planar_value),
        ]
        if predictor in (2, 3):
            es.append((G._T_PREDICTOR, G._TYPE_SHORT, 1, predictor))
        counts = [len(p) for p in payloads]
        if tile:
            es += [
                (G._T_TILE_WIDTH, G._TYPE_LONG, 1, tile[1]),
                (G._T_TILE_LENGTH, G._TYPE_LONG, 1, tile[0]),
                (G._T_TILE_OFFSETS, G._TYPE_LONG, len(offsets), longs(offsets)),
                (G._T_TILE_COUNTS, G._TYPE_LONG, len(counts), longs(counts)),
            ]
        else:
            es += [
                (G._T_STRIP_OFFSETS, G._TYPE_LONG, len(offsets), longs(offsets)),
                (G._T_ROWS_PER_STRIP, G._TYPE_LONG, 1, rows_per_strip or h),
                (G._T_STRIP_COUNTS, G._TYPE_LONG, len(counts), longs(counts)),
            ]
        return sorted(es, key=lambda e: e[0])

    # two-pass: size the IFD with placeholder offsets, then re-emit
    # with the real data offsets (same entry count/sizes -> same len)
    probe = G._emit_ifd(entries([0] * len(payloads)), 8, 0)
    data_start = 8 + len(probe)
    offsets, pos = [], data_start
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    ifd = G._emit_ifd(entries(offsets), 8, 0)
    assert len(ifd) == len(probe)
    return struct.pack("<2sHI", b"II", 42, 8) + ifd + b"".join(payloads)


def test_planar_strip_decode():
    """PlanarConfiguration=2 strips (plane-major runs, 2 strips per
    plane) decode to the same chunky (H, W, SPP) shape callers get
    from interleaved files."""
    h, w, spp = 4, 5, 3
    arr = (
        np.arange(h * w * spp).reshape(spp, h, w).transpose(1, 2, 0) % 251
    ).astype(np.uint8)
    out, _ = decode_gtiff(_planar_tiff(arr, rows_per_strip=2))
    np.testing.assert_array_equal(out, arr)


def test_planar_tiled_lzw_predictor_decode():
    """Planar + tiled + LZW + predictor-2 (each plane's tiles carry one
    sample, differenced per row) — the full archival combo."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 4096, (5, 6, 2)).astype("uint16")
    payload = _planar_tiff(arr, tile=(2, 4), compression=5, predictor=2)
    out, _ = decode_gtiff(payload)
    np.testing.assert_array_equal(out, arr)


def test_planar_deflate_single_sample_degenerate():
    """spp=1 with PlanarConfiguration=2 is byte-identical to chunky and
    must decode as (H, W); an unknown planar value still raises."""
    arr = (np.arange(12).reshape(3, 4, 1) * 3 % 251).astype(np.uint8)
    out, _ = decode_gtiff(_planar_tiff(arr, compression=8))
    np.testing.assert_array_equal(out, arr[:, :, 0])
    with pytest.raises(NotImplementedError, match="planar configuration"):
        decode_gtiff(_planar_tiff(arr, planar_value=3))


# ------------------------------------------------------------- BigTIFF


def test_bigtiff_roundtrip_layouts():
    """BigTIFF (magic 43, 64-bit offsets — the format that lifts the
    classic 4 GiB cap a 100 TB mosaic sink WILL hit) round-trips
    through the same codec paths as classic: tiles, LZW, predictor-2,
    overview pyramid, geotags."""
    from openeo_processes_dask_ml_spark.io.gtiff import (
        gtiff_ifd_count,
        gtiff_ifd_dims,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 4096, (13, 11)).astype("uint16")
    payload = encode_gtiff(
        arr,
        bbox=(0.0, 0.0, 11.0, 13.0),
        epsg=32632,
        compression="lzw",
        tile=(8, 8),
        predictor=2,
        overviews=[arr[::2, ::2]],
        bigtiff=True,
    )
    assert struct.unpack("<H", payload[2:4])[0] == 43
    out, meta = decode_gtiff(payload)
    np.testing.assert_array_equal(out, arr)
    assert meta["epsg"] == 32632
    ov, _ = decode_gtiff(payload, ifd=1)
    np.testing.assert_array_equal(ov, arr[::2, ::2])
    assert gtiff_ifd_count(payload) == 2
    assert gtiff_ifd_dims(payload) == [(11, 13), (6, 7)]


def test_bigtiff_ranged_decode_partial_reads():
    """The cloud-optimized contract holds for BigTIFF too: an overview
    read through decode_gtiff_ranged moves only the head + that
    level's chunks, never the full payload."""
    from openeo_processes_dask_ml_spark.io.gtiff import decode_gtiff_ranged

    grad = np.add.outer(
        np.arange(256, dtype=np.uint16), np.arange(256, dtype=np.uint16)
    )
    payload = encode_gtiff(
        grad,
        bbox=(0.0, 0.0, 256.0, 256.0),
        tile=(64, 64),
        overviews=[grad[::2, ::2], grad[::4, ::4]],
        bigtiff=True,
    )
    moved = []

    def fetch(off, size):
        moved.append(size)
        return payload[off : off + size]

    ov, _ = decode_gtiff_ranged(fetch, ifd=2)
    np.testing.assert_array_equal(ov, grad[::4, ::4])
    assert sum(moved) < len(payload) / 2


def test_bigtiff_auto_upgrade_and_classic_pin():
    """bigtiff=None keeps small files classic (byte-identical to the
    default), bigtiff=False still raises on 4 GiB overflow (the guard
    message survives for classic-only consumers)."""
    arr = np.arange(20, dtype=np.uint8).reshape(4, 5)
    assert encode_gtiff(arr) == encode_gtiff(arr, bigtiff=None) == encode_gtiff(arr, bigtiff=False)
    assert struct.unpack("<H", encode_gtiff(arr)[2:4])[0] == 42


def test_packbits_spec_vector_and_stream_properties():
    """The canonical TIFF 6.0 §9 example stream decodes to its
    documented expansion; encode o decode is the identity on arbitrary
    byte strings (runs, literals, 128-boundary lengths)."""
    from openeo_processes_dask_ml_spark.io.gtiff import (
        _packbits_decode,
        _packbits_encode,
    )

    spec = bytes.fromhex("FEAA02800A2AFDAA03800A2A22F7AA")
    expect = bytes.fromhex("AAAAAA800A2AAAAAAAAA800A2A22") + b"\xaa" * 10
    assert _packbits_decode(spec) == expect
    # n=128 is a spec'd no-op and must be skipped, not mis-read
    assert _packbits_decode(b"\x80\x00A") == b"A"
    for data in (
        b"",
        b"A",
        b"AB" * 200,
        b"A" * 500,
        bytes(range(256)) * 3,
        b"A" * 127 + b"BC" + b"D" * 130,
    ):
        assert _packbits_decode(_packbits_encode(data)) == data


# ------------------------------------------------- predictor 3 (floats)


def test_predictor3_float_roundtrip_layouts():
    """TIFF predictor 3 (TechNote 3 floating-point byte-plane
    differencing): bit-exact round-trips across compressions, tile and
    strip organization, float32 and float64."""
    rng = np.random.default_rng(5)
    arr32 = (rng.random((13, 11)) * 1000).astype("float32")
    for comp in (None, "deflate", "lzw", "packbits"):
        for tile in (None, (5, 4)):
            p = encode_gtiff(arr32, compression=comp, tile=tile, predictor=3)
            out, _ = decode_gtiff(p)
            np.testing.assert_array_equal(out, arr32)
    arr64 = (rng.random((6, 9)) - 0.5).astype("float64")
    out, _ = decode_gtiff(encode_gtiff(arr64, compression="deflate", predictor=3))
    np.testing.assert_array_equal(out, arr64)
    # NaN/inf survive (byte-exact transform, no arithmetic on values)
    weird = np.array([[np.nan, np.inf], [-np.inf, 0.0]], dtype="float32")
    np.testing.assert_array_equal(
        decode_gtiff(encode_gtiff(weird, predictor=3))[0], weird
    )


def test_predictor3_compresses_noisy_terrain():
    """The reason predictor 3 exists: on realistic DEM-like data
    (smooth trend + mantissa noise, modeled as a random walk)
    neighboring floats share exponent and high-mantissa bytes, so
    byte-plane deltas deflate measurably better than raw IEEE bytes
    (0.76x on this fixture). On perfectly regular synthetic grids
    plain LZ77 already finds the repeating 4-byte patterns, so those
    are NOT the fixture."""
    rng = np.random.default_rng(0)
    dem = (
        1000 + np.cumsum(rng.normal(0.0, 0.1, (64, 64)), axis=1)
    ).astype("float32")
    p1 = encode_gtiff(dem, compression="deflate")
    p3 = encode_gtiff(dem, compression="deflate", predictor=3)
    assert len(p3) < 0.85 * len(p1), (len(p1), len(p3))


def test_predictor3_validation_and_planar():
    """predictor 3 is float-only on both sides; planar float planes
    decode through the same per-row inverse."""
    with pytest.raises(ValueError, match="float-only"):
        encode_gtiff(np.zeros((2, 2), np.uint8), predictor=3)
    with pytest.raises(ValueError, match="integer-only"):
        encode_gtiff(np.zeros((2, 2), np.float32), predictor=2)
    rng = np.random.default_rng(9)
    arr = rng.random((4, 5, 2)).astype("float32")
    payload = _planar_tiff(arr, rows_per_strip=2, compression=8, predictor=3)
    out, _ = decode_gtiff(payload)
    np.testing.assert_array_equal(out, arr)


# ------------------------------------------------- JPEG-in-TIFF (comp 7)


def _jpeg_tiff(chunks, h, w, spp, *, rows_per_strip=None, tile=None,
               jpeg_tables=None, photometric=None):
    """Hand-crafted new-style-JPEG TIFF (compression 7): each chunk is
    an independent baseline JPEG stream; optional JPEGTables tag 347
    carries the shared abbreviated table stream."""
    from openeo_processes_dask_ml_spark.io import gtiff as G

    def longs(vals):
        return struct.pack(f"<{len(vals)}I", *vals)

    def shorts(vals):
        return struct.pack(f"<{len(vals)}H", *vals)

    def entries(offsets):
        es = [
            (G._T_WIDTH, G._TYPE_LONG, 1, w),
            (G._T_LENGTH, G._TYPE_LONG, 1, h),
            (G._T_BITS, G._TYPE_SHORT, spp, shorts([8] * spp)),
            (G._T_COMPRESSION, G._TYPE_SHORT, 1, 7),
            (G._T_PHOTOMETRIC, G._TYPE_SHORT, 1,
             photometric if photometric is not None
             else (6 if spp == 3 else 1)),
            (G._T_SPP, G._TYPE_SHORT, 1, spp),
        ]
        counts = [len(p) for p in chunks]
        if tile:
            es += [
                (G._T_TILE_WIDTH, G._TYPE_LONG, 1, tile[1]),
                (G._T_TILE_LENGTH, G._TYPE_LONG, 1, tile[0]),
                (G._T_TILE_OFFSETS, G._TYPE_LONG, len(offsets), longs(offsets)),
                (G._T_TILE_COUNTS, G._TYPE_LONG, len(counts), longs(counts)),
            ]
        else:
            es += [
                (G._T_STRIP_OFFSETS, G._TYPE_LONG, len(offsets), longs(offsets)),
                (G._T_ROWS_PER_STRIP, G._TYPE_LONG, 1, rows_per_strip or h),
                (G._T_STRIP_COUNTS, G._TYPE_LONG, len(counts), longs(counts)),
            ]
        if jpeg_tables is not None:
            es.append((G._T_JPEG_TABLES, 7, len(jpeg_tables), bytes(jpeg_tables)))
        return sorted(es, key=lambda e: e[0])

    probe = G._emit_ifd(entries([0] * len(chunks)), 8, 0)
    data_start = 8 + len(probe)
    offsets, pos = [], data_start
    for p in chunks:
        offsets.append(pos)
        pos += len(p)
    ifd = G._emit_ifd(entries(offsets), 8, 0)
    assert len(ifd) == len(probe)
    return struct.pack("<2sHI", b"II", 42, 8) + ifd + b"".join(chunks)


def test_jpeg_in_tiff_strips():
    """Compression-7 strips: independent grayscale JPEG streams per
    strip decode and stack into the declared (H, W)."""
    from test_jpeg import _fdct_blocks, _gray_jpeg

    rng = np.random.default_rng(21)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 4, (16, 24)), axis=1), 30, 220
    ).astype(np.uint8)
    top = _gray_jpeg(_fdct_blocks(img[:8]), 8, 24)
    bot = _gray_jpeg(_fdct_blocks(img[8:]), 8, 24)
    payload = _jpeg_tiff([top, bot], 16, 24, 1, rows_per_strip=8)
    out, _ = decode_gtiff(payload)
    assert out.shape == (16, 24)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_in_tiff_tiled_with_jpegtables():
    """Compression-7 tiles sharing DQT/DHT via the JPEGTables tag: the
    abbreviated table stream splices after each tile's SOI."""
    from test_jpeg import (
        _AC_COUNTS, _AC_SYMBOLS, _DC_COUNTS, _DC_SYMBOLS,
        _dht, _dqt, _fdct_blocks, _gray_jpeg,
    )

    rng = np.random.default_rng(22)
    img = np.clip(
        128 + np.cumsum(rng.normal(0, 3, (16, 16)), axis=0), 30, 220
    ).astype(np.uint8)
    tables = (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
        + _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
        + b"\xff\xd9"
    )

    def strip_tables(jp: bytes) -> bytes:
        # the per-tile stream keeps only SOI + SOF0 + SOS + entropy:
        # drop DQT (ffdb) and DHT (ffc4) segments
        out = bytearray(b"\xff\xd8")
        i = 2
        while i < len(jp) - 1:
            assert jp[i] == 0xFF
            m = jp[i + 1]
            if m == 0xDA:
                out += jp[i:-0 or None]
                break
            (ln,) = struct.unpack(">H", jp[i + 2 : i + 4])
            if m not in (0xDB, 0xC4):
                out += jp[i : i + 2 + ln]
            i += 2 + ln
        return bytes(out)

    tiles = [
        strip_tables(_gray_jpeg(_fdct_blocks(img[y : y + 8, x : x + 8]), 8, 8))
        for y in (0, 8)
        for x in (0, 8)
    ]
    payload = _jpeg_tiff(
        tiles, 16, 16, 1, tile=(8, 8), jpeg_tables=tables
    )
    out, _ = decode_gtiff(payload)
    assert out.shape == (16, 16)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_in_tiff_color_and_guards():
    """A 3-sample YCbCr (photometric 6) strip decodes to RGB; channel
    mismatch against SamplesPerPixel raises instead of mis-shaping."""
    from test_jpeg import _color_jpeg_420, _fdct_blocks, _gray_jpeg

    rng = np.random.default_rng(23)
    base = np.cumsum(rng.normal(0, 2, (16, 16)), axis=1)
    img = np.stack(
        [np.clip(120 + base, 40, 215)] * 3, axis=-1
    ).astype(np.uint8)
    payload = _jpeg_tiff([_color_jpeg_420(img)], 16, 16, 3)
    out, _ = decode_gtiff(payload)
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12

    gray = _gray_jpeg(_fdct_blocks(np.full((8, 8), 90, np.uint8)), 8, 8)
    with pytest.raises(ValueError, match="SamplesPerPixel"):
        decode_gtiff(_jpeg_tiff([gray], 8, 8, 3))


def _rgb_444_dc_jpeg(r: int, g: int, b: int) -> bytes:
    """One-MCU 4:4:4 3-component baseline JPEG whose planes are flat
    DC-only blocks of exactly (r, g, b) AS STORED — with q[0]=8 the
    IDCT flat value is DC + 128, so the plane values are exact."""
    from test_jpeg import (
        _AC_COUNTS, _AC_SYMBOLS, _Bits, _DC_COUNTS, _DC_SYMBOLS,
        _dht, _dqt, _put_ac_block, _put_dc, _sof0, _sos,
    )

    bw = _Bits()
    for v in (r, g, b):
        _put_dc(bw, v - 128)  # per-component predictor starts at 0
        _put_ac_block(bw, [0] * 63)
    return (
        b"\xff\xd8"
        + _dqt(0, [8] + [1] * 63)
        + _sof0(8, 8, [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
        + _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)
        + _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)])
        + bw.tobytes()
        + b"\xff\xd9"
    )


def test_jpeg_in_tiff_photometric_rgb_raw_and_unsupported():
    """PhotometricInterpretation drives the chunk color space (ADVICE
    r10 #4): photometric=2 (RGB-mode JPEG, libtiff JPEGCOLORMODE_RAW)
    decodes the planes AS the channels — no YCbCr matrix — while the
    same chunk under photometric=6 goes through BT.601 and lands on
    different values; an unsupported photometric (5 = CMYK separated)
    raises instead of silently mis-coloring."""
    jp = _rgb_444_dc_jpeg(100, 50, 200)
    out, _ = decode_gtiff(_jpeg_tiff([jp], 8, 8, 3, photometric=2))
    assert out.shape == (8, 8, 3)
    assert (out[:, :, 0] == 100).all()
    assert (out[:, :, 1] == 50).all()
    assert (out[:, :, 2] == 200).all()

    ycc, _ = decode_gtiff(_jpeg_tiff([jp], 8, 8, 3, photometric=6))
    # under the matrix the stored (100, 50, 200) is Y/Cb/Cr, not RGB
    assert not (ycc == out).all()

    with pytest.raises(NotImplementedError, match="photometric 5"):
        decode_gtiff(_jpeg_tiff([jp], 8, 8, 3, photometric=5))
