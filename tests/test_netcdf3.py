"""netCDF3-classic sink/source (io/netcdf3.py): full-cube roundtrip
through save_result, a struct-only golden parse of the on-disk layout
(independent of the module reader), sparse/fill handling, integer
lossless reads, CDF-2 offsets, and the coverage guards."""

import datetime as dt
import struct

import numpy as np
import pytest

from openeo_processes_dask_ml_spark.io.netcdf3 import (
    parse_netcdf3_header,
    read_netcdf3_cube,
    write_netcdf3_cube,
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


def test_netcdf3_roundtrip_via_save_result(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import save_result

    df = _cube_df(spark)
    out = str(tmp_path / "cube.nc")
    assert save_result(df, out, format="netcdf") == out
    back = read_netcdf3_cube(spark, out)
    assert back.columns == ["time", "band", "y", "x", "value"]
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, back.collect())
    )


def test_netcdf3_golden_layout_struct_only(spark, tmp_path):
    """Pin the wire format with struct/bytes ONLY — no module reader:
    magic, numrecs=0, dim list, big-endian float64 cells at the data
    var's begin offset, 4-byte alignment throughout."""
    df = spark.createDataFrame(
        [(0.0, 1.5), (1.0, 2.5), (2.0, 3.5)], "x double, value double"
    )
    out = str(tmp_path / "tiny.nc")
    write_netcdf3_cube(df, out, dim_cols=["x"])
    buf = open(out, "rb").read()
    assert buf[:4] == b"CDF\x01"
    (numrecs,) = struct.unpack(">i", buf[4:8])
    assert numrecs == 0
    tag, ndims = struct.unpack(">ii", buf[8:16])
    assert (tag, ndims) == (0x0A, 1)
    (namelen,) = struct.unpack(">i", buf[16:20])
    assert namelen == 1 and buf[20:24] == b"x\x00\x00\x00"
    (dimlen,) = struct.unpack(">i", buf[24:28])
    assert dimlen == 3
    # the data variable is the LAST header entry: its begin is the
    # last 4 bytes of the header; cells follow big-endian
    hdr = parse_netcdf3_header(buf)  # offsets only, bytes checked raw
    begin = hdr["vars"]["value"]["begin"]
    assert begin % 4 == 0
    assert struct.unpack(">3d", buf[begin:begin + 24]) == (1.5, 2.5, 3.5)
    xb = hdr["vars"]["x"]["begin"]
    assert struct.unpack(">3d", buf[xb:xb + 24]) == (0.0, 1.0, 2.0)
    assert len(buf) == begin + 24


def test_netcdf3_sparse_fill_and_missing_slab(spark, tmp_path):
    """Absent cells (and one entirely-absent leading slab) become NaN
    fill on disk and are DROPPED on read — the zarr hole contract."""
    df = _cube_df(spark).filter(
        "NOT (time = timestamp'2024-01-02')"
    ).filter("NOT (band = 'red' AND y = 0 AND x = 0)")
    # keep the time axis at 3 entries so slab 1 is written as fill
    import pyspark.sql.functions as F

    axis_keeper = _cube_df(spark).filter(
        "time = timestamp'2024-01-02' AND band='nir' AND y=4 AND x=6"
    )
    df = df.unionByName(axis_keeper)
    out = str(tmp_path / "sparse.nc")
    write_netcdf3_cube(df, out)
    back = read_netcdf3_cube(spark, out)
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, back.collect())
    )
    assert back.filter(F.isnan("value")).count() == 0


def test_netcdf3_int_reads_lossless_and_guards(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 0, 7), (0, 1, -8), (1, 0, 2**31 - 1), (1, 1, -(2**31))],
        "y bigint, x bigint, value bigint",
    )
    out = str(tmp_path / "int.nc")
    write_netcdf3_cube(df, out, dtype="int32")
    back = read_netcdf3_cube(spark, out)
    assert dict(back.dtypes)["value"] == "bigint"
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, back.collect())
    )
    # integer + hole -> loud failure (no NaN to fill with)
    with pytest.raises(Exception, match="not fully covered|has no NaN"):
        write_netcdf3_cube(
            df.filter("NOT (y=0 AND x=1)"), str(tmp_path / "bad.nc"),
            dtype="int32",
        )
    # duplicate cells -> loud failure
    with pytest.raises(Exception, match="duplicate cells"):
        write_netcdf3_cube(
            df.unionByName(df.limit(1)), str(tmp_path / "dup.nc"),
            dtype="int32",
        )
    # unsupported dtype named
    with pytest.raises(ValueError, match="float64/float32/int32"):
        write_netcdf3_cube(df, str(tmp_path / "i8.nc"), dtype="int64")


def test_netcdf3_date_axis_and_spark_types(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 1, 1), 0, 1.0),
            (dt.date(2024, 1, 1), 1, 2.0),
            (dt.date(2024, 2, 29), 0, 3.0),
            (dt.date(2024, 2, 29), 1, 4.0),
        ],
        "day date, x bigint, value double",
    )
    out = str(tmp_path / "dates.nc")
    write_netcdf3_cube(df, out)
    back = read_netcdf3_cube(spark, out)
    assert dict(back.dtypes) == {
        "day": "date", "x": "bigint", "value": "double",
    }
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, back.collect())
    )
    hdr = parse_netcdf3_header(open(out, "rb").read(1 << 16))
    assert hdr["vars"]["day"]["atts"]["units"].startswith("seconds since")
    assert hdr["vars"]["day"]["atts"]["_spark_type"] == "date"


def test_netcdf3_cdf2_header_roundtrip():
    """Offsets past 2^31 force the CDF-2 (64-bit begin) header form;
    the parser reads both widths."""
    from openeo_processes_dask_ml_spark.io.netcdf3 import _Var, _header

    v = _Var("value", [0], 6, {}, 4)
    v.begin = 0x1_2345_6789  # > 2^31
    buf = _header([("x", 4)], {}, [v], cdf2=True)
    hdr = parse_netcdf3_header(buf)
    assert hdr["cdf2"] is True
    assert hdr["vars"]["value"]["begin"] == 0x1_2345_6789
    # and the CDF-1 form stores the same var at a small offset
    v.begin = 1024
    hdr1 = parse_netcdf3_header(_header([("x", 4)], {}, [v], cdf2=False))
    assert hdr1["cdf2"] is False and hdr1["vars"]["value"]["begin"] == 1024


def test_netcdf3_string_axis_char_matrix(spark, tmp_path):
    """String axes land as the classic 2-D char-matrix variable (dim x
    strlen) and come back as strings."""
    df = spark.createDataFrame(
        [("alpha", 10.0), ("b", 20.0), ("gamma9", 30.0)],
        "band string, value double",
    )
    out = str(tmp_path / "bands.nc")
    write_netcdf3_cube(df, out, dim_cols=["band"])
    hdr = parse_netcdf3_header(open(out, "rb").read(1 << 16))
    assert ("band_strlen", 6) in hdr["dims"]
    assert len(hdr["vars"]["band"]["dimids"]) == 2
    back = read_netcdf3_cube(spark, out)
    assert sorted(map(tuple, back.collect())) == [
        ("alpha", 10.0), ("b", 20.0), ("gamma9", 30.0),
    ]


def test_netcdf3_header_fuzz_roundtrip():
    """Property fuzz of the header writer (VERDICT r12 #4): seeded
    random dim/var/attr combinations serialize through _header and
    parse back identically in both CDF forms; truncations of a valid
    header raise, never hang."""
    from openeo_processes_dask_ml_spark.io.netcdf3 import _Var, _header

    rng = np.random.default_rng(13)
    for trial in range(40):
        nd = int(rng.integers(1, 5))
        dims = [
            (f"d{i}_{'x' * int(rng.integers(0, 4))}",
             int(rng.integers(1, 1000)))
            for i in range(nd)
        ]
        cdf2 = bool(rng.integers(0, 2))
        variables = []
        for vi in range(int(rng.integers(1, 4))):
            dimids = sorted(
                rng.choice(nd, size=int(rng.integers(1, nd + 1)),
                           replace=False).tolist()
            )
            nct = int(rng.choice([1, 2, 3, 4, 5, 6]))
            atts = {}
            if rng.integers(0, 2):
                atts["units"] = "m" * int(rng.integers(1, 9))
            if rng.integers(0, 2):
                atts["off"] = float(rng.normal())
            n_cells = 1
            for d in dimids:
                n_cells *= dims[d][1]
            v = _Var(f"v{vi}", dimids, nct, atts, n_cells)
            v.begin = int(rng.integers(0, 2**40 if cdf2 else 2**31))
            variables.append(v)
        gatts = {"Conventions": "CF-1.6"} if rng.integers(0, 2) else {}
        buf = _header(dims, gatts, variables, cdf2)
        hdr = parse_netcdf3_header(buf)
        assert hdr["cdf2"] is cdf2
        assert hdr["dims"] == dims
        assert set(hdr["vars"]) == {v.name for v in variables}
        for v in variables:
            got = hdr["vars"][v.name]
            assert got["begin"] == v.begin
            assert got["dimids"] == list(v.dimids)
            assert got["nc_type"] == v.nc_type
            assert got["vsize"] == min(v.vsize, 0xFFFFFFFF)
            assert set(got["atts"]) == set(v.atts)
        # truncation at seeded points: raise, never hang
        for cut in rng.integers(4, len(buf), size=5):
            with pytest.raises(ValueError):
                parse_netcdf3_header(buf[:int(cut)])


def test_netcdf3_sink_accepts_file_uri(spark, tmp_path):
    """file:// paths route the driver stream through io.fs (r14)."""
    df = spark.createDataFrame(
        [(float(x), float(x) * 2.0) for x in range(9)],
        "x double, value double",
    )
    local = str(tmp_path / "uri.nc")
    write_netcdf3_cube(df, f"file://{local}", dim_cols=["x"])
    back = read_netcdf3_cube(spark, local)
    got = {r["x"]: r["value"] for r in back.collect()}
    assert got == {float(x): float(x) * 2.0 for x in range(9)}
