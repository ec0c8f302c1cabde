"""Sources/sinks + artifact staging + array-reducer sub-graphs +
property-based interpolation checks."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.io.load import load_collection, save_result
from openeo_processes_dask_ml_spark.mlm.artifacts import (
    cache_path_for,
    distribute_artifact,
    sanitize_uri,
    stage_artifact,
)

SF_DIR = "/root/testdata/sf0.001"


def test_load_collection_property_filters_pushdown(spark):
    cube = load_collection(
        spark,
        "events",
        SF_DIR,
        bands=["click", "view"],
        properties={"value": {"gte": 50.0, "lt": 150.0}},
    )
    rows = cube.df.collect()
    assert rows
    assert all(50.0 <= r["value"] < 150.0 for r in rows)
    assert {r["event_type"] for r in rows} <= {"click", "view"}
    # predicate must reach the parquet scan
    plan = cube.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(value,50.0)" in plan


def test_unknown_collection_rejected(spark):
    with pytest.raises(ValueError, match="unknown collection"):
        load_collection(spark, "nope", SF_DIR)


def test_save_result_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2.0)
    path = str(tmp_path / "out")
    save_result(df, path, format="parquet")
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert dict(back.dtypes)["v"] == "double"
    # netcdf routes to the pure-numpy netCDF3-classic sink (r13) —
    # a real file, no geo stack, no fallback
    from openeo_processes_dask_ml_spark.io.netcdf3 import read_netcdf3_cube

    path2 = str(tmp_path / "out2.nc")
    save_result(df, path2, format="netcdf")
    back2 = read_netcdf3_cube(spark, path2)
    assert back2.count() == 100
    assert dict(back2.dtypes)["v"] == "double"


def test_gtiff_slice_naming_and_nan_skip():
    """The multi-time GTiff zip logic (reference
    custom_processes.py:121-184): member names carry the %Y-%m-%dT%H-%M-%SZ
    stamp, and all-NaN timesteps are skipped. Pure-pandas pieces tested
    here; the rio write itself is import-gated (no rioxarray in sandbox)."""
    import numpy as np
    import pandas as pd

    from openeo_processes_dask_ml_spark.io.load import (
        _gtiff_slice_name,
        _nonnan_time_slices,
    )

    name = _gtiff_slice_name(pd.Timestamp("2024-03-01 12:30:00"), "abc123")
    assert name == "openeo_output__2024-03-01T12-30-00Z_abc123.tif"

    pdf = pd.DataFrame(
        {
            "time": ["t1", "t1", "t2", "t2", "t3", "t3"],
            "x": [0, 1, 0, 1, 0, 1],
            "value": [1.0, np.nan, np.nan, np.nan, 3.0, 4.0],
        }
    )
    assert _nonnan_time_slices(pdf, "time", "value") == ["t1", "t3"]


def test_save_result_gtiff_gated_fallback(spark, tmp_path):
    """gtiff (like netcdf) falls back to parquet with the explicit
    warning while rioxarray is absent — never a silent substitution."""
    df = spark.range(4).withColumn("v", F.col("id") * 1.0)
    path = str(tmp_path / "tif_out")
    with pytest.warns(UserWarning, match="geo stack"):
        save_result(df, path, format="gtiff")
    assert spark.read.parquet(path).count() == 4


def test_save_result_csv(spark, tmp_path):
    df = spark.range(5).withColumn("v", F.col("id") * 1.5)
    path = str(tmp_path / "csv_out")
    save_result(df, path, format="csv")
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 5


# --- artifact staging -----------------------------------------------------


def test_sanitize_uri():
    assert sanitize_uri("https://host/models/weights v2.pt") == "weights_v2.pt"
    assert sanitize_uri("https://host/") == "host"


def test_stage_artifact_local_and_cache(tmp_path):
    src = tmp_path / "weights.bin"
    src.write_bytes(b"model-bytes")
    cache = str(tmp_path / "cache")
    p1 = stage_artifact(str(src), cache_dir=cache)
    assert open(p1, "rb").read() == b"model-bytes"
    # cache hit: same path, survives source deletion
    os.remove(src)
    p2 = stage_artifact(str(src), cache_dir=cache)
    assert p2 == p1 and os.path.exists(p2)
    assert cache_path_for(str(src), cache) == p1


def test_distribute_artifact(spark, tmp_path):
    src = tmp_path / "weights.bin"
    src.write_bytes(b"xyz")
    name = distribute_artifact(spark, str(src), cache_dir=str(tmp_path / "c"))
    from pyspark import SparkFiles

    # resolvable on the driver-side executor (local mode shares the dir)
    assert open(SparkFiles.get(name), "rb").read() == b"xyz"


# --- array-mode sub-graph reducer ----------------------------------------


def test_reduce_dimension_array_positional(spark):
    """The reference's SCL cloud-mask pattern: a positional sub-graph
    (array_element + comparison + or) over the band axis compiles to
    the whole-array reducer (examples/train_rf.py:62-103)."""
    from openeo_processes_dask_ml_spark.graph import execute_graph

    graph = {
        "load": {"process_id": "load_collection", "arguments": {"id": "events"}},
        "r": {
            "process_id": "reduce_dimension",
            "arguments": {
                "data": {"from_node": "load"},
                "dimension": "bands",
                "reducer": {
                    "process_graph": {
                        "el0": {
                            "process_id": "array_element",
                            "arguments": {"data": {"from_parameter": "data"}, "index": 0},
                        },
                        "gt": {
                            "process_id": "gt",
                            "arguments": {"x": {"from_node": "el0"}, "y": 100.0},
                            "result": True,
                        },
                    }
                },
            },
            "result": True,
        },
    }
    cube = execute_graph(graph, spark, SF_DIR)
    rows = cube.df.limit(10).collect()
    assert rows
    assert "bands" not in cube.dims
    assert all(isinstance(r[cube.value_col], (bool, type(None))) for r in rows)


def test_reduce_dimension_array_order(spark):
    """Array order follows the dim label sort order deterministically."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    df = spark.createDataFrame(
        [(1, "b", 2.0), (1, "a", 1.0), (1, "c", 3.0), (2, "a", 9.0), (2, "b", 8.0), (2, "c", 7.0)],
        ["g", "band", "value"],
    )
    cube = CubeFrame(df, {"geometry": "g", "bands": "band"}, "value")
    out = cube.reduce_dimension_array("bands", lambda arr: F.element_at(arr, 1))
    got = {r["g"]: r["value"] for r in out.df.collect()}
    assert got == {1: 1.0, 2: 9.0}  # element 1 == band 'a'


# --- property-based: linear interpolation --------------------------------


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=4, max_size=12
    ),
    holes=st.sets(st.integers(min_value=1, max_value=10), min_size=1, max_size=4),
)
def test_interpolation_recovers_linear_series(spark, values, holes):
    """Nulling interior points of any series and interpolating must
    reproduce values lying on the chord between the bracketing points —
    checked against numpy.interp."""
    from openeo_processes_dask_ml_spark.operators.arrays import interpolate_linear_df

    n = len(values)
    holes = {h for h in holes if 0 < h < n - 1}
    rows = [
        (0, float(i), None if i in holes else float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, ["series", "t", "value"])
    out = interpolate_linear_df(df, ["series"], "t", "value")
    got = {r["t"]: r["value"] for r in out.collect()}

    kept_x = [float(i) for i in range(n) if i not in holes]
    kept_y = [float(values[i]) for i in range(n) if i not in holes]
    for h in holes:
        expected = np.interp(float(h), kept_x, kept_y)
        assert got[float(h)] == pytest.approx(expected, abs=1e-9)


def test_s3_artifact_stage(tmp_path, monkeypatch):
    """s3://bucket/path/key parses into (bucket, key); anonymous
    (unsigned) client is used when no key env vars are set; the
    download lands in the content-addressed cache."""
    import boto3

    calls = {}

    class FakeClient:
        def download_file(self, bucket, key, target):
            calls["bucket"], calls["key"] = bucket, key
            with open(target, "wb") as f:
                f.write(b"s3-model-bytes")

    def fake_client(service, **kwargs):
        assert service == "s3"
        calls["kwargs"] = kwargs
        return FakeClient()

    monkeypatch.delenv("OPENEO_SPARK_S3_ACCESS_KEY_ID", raising=False)
    monkeypatch.setattr(boto3, "client", fake_client)
    from openeo_processes_dask_ml_spark.mlm.artifacts import stage_artifact

    p = stage_artifact(
        "s3://models/deep/weights.pt", cache_dir=str(tmp_path / "c")
    )
    assert open(p, "rb").read() == b"s3-model-bytes"
    assert calls["bucket"] == "models" and calls["key"] == "deep/weights.pt"
    # unsigned config when anonymous (botocore UNSIGNED sentinel)
    from botocore import UNSIGNED

    assert calls["kwargs"]["config"].signature_version is UNSIGNED


def test_s3_staging_with_fake_boto3(tmp_path, monkeypatch):
    """Exercise the s3:// staging path end-to-end (bucket/key parse,
    anonymous vs credentialed client choice, custom endpoint, download
    into the content-addressed cache) with a stub boto3/botocore —
    the real library isn't bundled here."""
    import sys
    import types

    from openeo_processes_dask_ml_spark.mlm.artifacts import stage_artifact

    calls = {}

    class FakeClient:
        def __init__(self, kwargs):
            calls["client_kwargs"] = kwargs

        def download_file(self, bucket, key, target):
            calls["download"] = (bucket, key)
            with open(target, "wb") as f:
                f.write(b"model-bytes")

    fake_boto3 = types.ModuleType("boto3")
    fake_boto3.client = lambda svc, **kw: FakeClient(kw)
    fake_botocore = types.ModuleType("botocore")
    fake_botocore.UNSIGNED = "UNSIGNED-SENTINEL"
    fake_config_mod = types.ModuleType("botocore.config")

    class FakeConfig:
        def __init__(self, signature_version=None):
            self.signature_version = signature_version

    fake_config_mod.Config = FakeConfig
    fake_botocore.config = fake_config_mod
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)
    monkeypatch.setitem(sys.modules, "botocore", fake_botocore)
    monkeypatch.setitem(sys.modules, "botocore.config", fake_config_mod)

    # anonymous path (no creds): UNSIGNED config + endpoint forwarded
    monkeypatch.delenv("OPENEO_SPARK_S3_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("OPENEO_SPARK_S3_SECRET_ACCESS_KEY", raising=False)
    monkeypatch.setenv("OPENEO_SPARK_S3_ENDPOINT", "https://minio.example")
    local = stage_artifact("s3://mybucket/models/rf.onnx", cache_dir=str(tmp_path))
    assert open(local, "rb").read() == b"model-bytes"
    assert calls["download"] == ("mybucket", "models/rf.onnx")
    assert calls["client_kwargs"]["endpoint_url"] == "https://minio.example"
    assert calls["client_kwargs"]["config"].signature_version == "UNSIGNED-SENTINEL"
    # cache hit: no second download
    calls.pop("download")
    assert stage_artifact("s3://mybucket/models/rf.onnx", cache_dir=str(tmp_path)) == local
    assert "download" not in calls

    # credentialed path
    monkeypatch.setenv("OPENEO_SPARK_S3_ACCESS_KEY_ID", "AK")
    monkeypatch.setenv("OPENEO_SPARK_S3_SECRET_ACCESS_KEY", "SK")
    stage_artifact("s3://other/m.pt", cache_dir=str(tmp_path))
    assert calls["client_kwargs"]["aws_access_key_id"] == "AK"
    assert calls["client_kwargs"]["aws_secret_access_key"] == "SK"


def test_s3_staging_without_boto3_raises_clear_gate(tmp_path):
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.mlm.artifacts import stage_artifact

    try:
        import boto3  # noqa: F401

        _pytest.skip("boto3 present in this environment")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError, match="boto3"):
        stage_artifact("s3://bucket/key", cache_dir=str(tmp_path))


def test_export_gtiff_multi_time_zip_flow(tmp_path):
    """End-to-end multi-time export flow (reference
    custom_processes.py:121-184) with the rio writer stubbed: a
    2-live + 1-all-NaN timestep cube produces a .zip with exactly two
    .tif members named per timestep, and the loose temp .tifs are
    removed. The real rio write is import-gated; the zip/naming/skip
    orchestration is what this guards."""
    import os
    import zipfile

    import numpy as np
    import pandas as pd

    from openeo_processes_dask_ml_spark.io.load import _export_gtiff

    class FakeRio:
        def to_raster(self, path, **kw):
            with open(path, "wb") as f:
                f.write(b"TIF")

    class FakeSlice:
        rio = FakeRio()

    class FakeDA:
        def sel(self, sel):
            return FakeSlice()

        def isel(self, sel):
            return FakeSlice()

    class FakeDS(dict):
        pass

    ds = FakeDS(value=FakeDA())
    pdf = pd.DataFrame(
        {
            "time": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02"),
                     pd.Timestamp("2024-01-03")] * 2,
            "x": [0, 0, 0, 1, 1, 1],
            "value": [1.0, np.nan, 3.0, 2.0, np.nan, 4.0],
        }
    )
    out = str(tmp_path / "cube.gtiff")
    result = _export_gtiff(ds, pdf, out, "value", ["time", "x"])
    assert result.endswith(".zip") and os.path.exists(result)
    with zipfile.ZipFile(result) as zf:
        members = zf.namelist()
    assert len(members) == 2  # 2024-01-02 slice is all-NaN -> skipped
    assert all(m.endswith(".tif") for m in members)
    stamps = sorted(m.split("openeo_output__")[1][:20] for m in members)
    assert stamps[0].startswith("2024-01-01") and stamps[1].startswith("2024-01-03")
    # loose temp members cleaned up
    loose = [p for p in os.listdir(tmp_path) if p.endswith(".tif")]
    assert loose == []


def test_band_conversion_tables_and_routing():
    """Provider band tables + catalog routing (reference
    get_datacube.py:190-234, custom_processes.py:63-94): canonical
    requests rewrite to provider asset names per backend/collection,
    ids route to the right catalog, bad backends are rejected."""
    from openeo_processes_dask_ml_spark.io.load import (
        DATA_BACKENDS,
        parse_collection_id,
        to_provider_bands,
    )

    assert parse_collection_id("sentinel-2-l2a") == (
        "planetarycomputer", "sentinel-2-l2a",
    )
    assert parse_collection_id("cdse/sentinel-2-l2a") == (
        "cdse", "sentinel-2-l2a",
    )
    with pytest.raises(ValueError, match="not available"):
        parse_collection_id("nosuch/collection")
    with pytest.raises(ValueError, match="parse"):
        parse_collection_id("a/b/c")
    assert "stac.dataspace.copernicus.eu" in DATA_BACKENDS["cdse"]

    # CDSE L2A: resolution-suffixed assets; requests resolve through
    # the alias groups first (b04 == red)
    assert to_provider_bands(
        "cdse/sentinel-2-l2a", ["red", "b04", "nir", "scl"]
    ) == ["B04_10m", "B04_10m", "B08_10m", "scl"]
    assert to_provider_bands("cdse/sentinel-2-global-mosaics", ["red"]) == ["B04"]
    # planetarycomputer matches every collection via the "*" entry
    assert to_provider_bands("planetarycomputer/anything", ["red", "scl"]) == [
        "B04", "SCL",
    ]
    assert to_provider_bands("sentinel-2-l2a", ["swir16"]) == ["B11"]
    # aws uses canonical names: identity
    assert to_provider_bands("aws/sentinel-2-l2a", ["red"]) == ["red"]


def test_cdse_collection_canonicalizes_and_resolves_b04(spark):
    """End-to-end through a CDSE-flavored collection: stored band labels
    are provider asset names (B04_10m), load canonicalizes them to
    common names, and a filter_bands request for 'b04' resolves through
    the alias groups to the red band."""
    from openeo_processes_dask_ml_spark.io.load import load_collection

    cube = load_collection(spark, "events_s2_cdse", "/root/testdata/sf0.001")
    labels = {
        r[0] for r in cube.df.select(cube.dim_col("bands")).distinct().collect()
    }
    assert "red" in labels and "nir" in labels
    assert not any(lb.startswith("B0") for lb in labels)

    red = cube.filter_bands(["b04"])
    got = {r[0] for r in red.df.select(red.dim_col("bands")).distinct().collect()}
    assert got == {"red"}


def test_routed_collection_raises_with_resolved_url(spark):
    from openeo_processes_dask_ml_spark.io.load import load_collection

    with pytest.raises(NotImplementedError, match="planetarycomputer.microsoft.com"):
        load_collection(
            spark, "planetarycomputer/sentinel-2-l2a", "/root/testdata/sf0.001"
        )


def test_load_source_csv_json_roundtrip(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import load_source

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, name string, v double"
    )
    csv_p, json_p = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(csv_p)
    df.write.json(json_p)
    schema = "id int, name string, v double"
    got_csv = load_source(spark, csv_p, "csv", schema=schema)
    got_json = load_source(spark, json_p, "json", schema=schema)
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, got_csv.collect())) == want
    assert sorted(map(tuple, got_json.collect())) == want
    # schema is mandatory for row formats (no silent inference pass)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="explicit schema"):
        load_source(spark, csv_p, "csv")
    # ...and refused for formats that cannot consume one (ADVICE r6:
    # silently ignoring it hid a caller's wrong expectation)
    pq_p = str(tmp_path / "p")
    df.write.parquet(pq_p)
    for bad_fmt in ("parquet", "text"):
        with _pytest.raises(ValueError, match="do not take a schema"):
            load_source(spark, pq_p, bad_fmt, schema=schema)


def test_load_source_csv_failfast_on_malformed(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import load_source

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("id,v\n1,2.0\nnot_an_int,x\n")
    df = load_source(spark, str(p), "csv", schema="id int, v double")
    import pytest as _pytest

    # surfaces as Py4JJavaError wrapping SparkException(Malformed...)
    with _pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        df.collect()


def test_compact_table_collapses_small_files(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import compact_table

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(32).write.parquet(src)  # fragment: 32 tiny files
    n_out = compact_table(spark, src, dst)
    assert n_out == 1  # tiny table -> one target-size file
    back = spark.read.parquet(dst)
    assert len(back.inputFiles()) == 1
    assert back.count() == docs.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_load_source_quarantine_splits_json(spark, tmp_path):
    """PERMISSIVE + corrupt-record split: good rows carry exactly the
    declared schema, malformed lines land in quarantine with their raw
    text, and nothing is silently null-ed."""
    from openeo_processes_dask_ml_spark.io.load import (
        load_source_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'  # type mismatch -> corrupt
    )
    good, bad = load_source_quarantine(
        spark, str(p), "json", "doc_id long, text string"
    )
    good_rows = {(r["doc_id"], r["text"]) for r in good.collect()}
    assert good_rows == {(1, "ok one"), (2, "ok two")}
    assert good.columns == ["doc_id", "text"]
    raws = [r["_corrupt_record"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)


def test_load_source_quarantine_splits_csv(spark, tmp_path):
    from openeo_processes_dask_ml_spark.io.load import (
        load_source_quarantine,
    )

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,n\n"
        "1,10\n"
        "2,not_a_number\n"
        "3,30\n"
    )
    good, bad = load_source_quarantine(
        spark, str(p), "csv", "doc_id long, n long"
    )
    assert {(r["doc_id"], r["n"]) for r in good.collect()} == {(1, 10), (3, 30)}
    assert bad.count() == 1


def test_load_source_quarantine_csv_header_first_line_per_file(
    spark, tmp_path
):
    """Header dropping is positional — first line of EACH file — not a
    byte-match against the declared schema (ADVICE r7): a foreign
    header with different spelling is dropped rather than leaking as an
    all-string good row, and a data row that happens to equal the
    header string survives."""
    d = tmp_path / "drop"
    d.mkdir()
    # file 1: header spelled differently from the declared schema
    (d / "a.csv").write_text("ID , Name\n1,alpha\n2,beta\n")
    # file 2: a legitimate data row byte-equal to the declared header
    (d / "b.csv").write_text("doc_id,name\n3,gamma\ndoc_id,name\n")
    from openeo_processes_dask_ml_spark.io.load import (
        load_source_quarantine,
    )

    good, bad = load_source_quarantine(
        spark, str(d), "csv", "doc_id string, name string"
    )
    got = {(r["doc_id"], r["name"]) for r in good.collect()}
    # the duplicate-of-header DATA row is kept (all-string schema
    # parses it); both per-file headers are dropped, nothing leaks
    assert got == {
        ("1", "alpha"),
        ("2", "beta"),
        ("3", "gamma"),
        ("doc_id", "name"),
    }
    assert bad.count() == 0


def test_load_source_quarantine_rejects_parquet(spark):
    from openeo_processes_dask_ml_spark.io.load import (
        load_source_quarantine,
    )

    with pytest.raises(ValueError, match="row formats"):
        load_source_quarantine(spark, "/tmp/x", "parquet", "a long")


def test_load_source_quarantine_headerless_file_warns(spark, tmp_path):
    """ADVICE r8: the per-file first-line drop is guarded — a dropped
    line that does not look like a header (headerless file, or a
    split-ordering change dropping a data row) warns loudly; a proper
    header stays silent."""
    import warnings

    from openeo_processes_dask_ml_spark.io.load import (
        load_source_quarantine,
    )

    ok = tmp_path / "ok"
    ok.mkdir()
    (ok / "a.csv").write_text("doc_id,name\n1,alpha\n")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        good, _ = load_source_quarantine(
            spark, str(ok), "csv", "doc_id string, name string"
        )
        assert good.count() == 1

    raw = tmp_path / "headerless"
    raw.mkdir()
    (raw / "b.csv").write_text("7,gamma\n8,delta\n")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        good, _ = load_source_quarantine(
            spark, str(raw), "csv", "doc_id string, name string"
        )
        # the first data row is still dropped (documented header=true
        # behavior) but the mismatch is surfaced
        assert good.count() == 1
    assert any("does not look like a header" in str(w.message) for w in caught)
