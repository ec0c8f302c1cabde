"""Dim/band alias resolution (reference tests/utils/test_dim_utils.py):
alias groups band|bands|b|channel|channels, time|t|..., x|lon|...,
y|lat|..., batch|batches, and the Sentinel-2 band synonym table
(b04=red, b08=nir, b11=swir16, ...)."""

from openeo_processes_dask_ml_spark.utils.dim_utils import (
    canonical_band,
    dim_role,
    resolve_bands,
    resolve_dim,
)


def test_dim_roles():
    assert dim_role("bands") == "bands"
    assert dim_role("channel") == "bands"
    assert dim_role("T") == "time"
    assert dim_role("dates") == "time"
    assert dim_role("lon") == "x"
    assert dim_role("latitude") == "y"
    assert dim_role("batches") == "batch"
    assert dim_role("geometry") is None


def test_resolve_dim_exact_wins():
    assert resolve_dim("time", ["time", "t"]) == "time"
    assert resolve_dim("TIME", ["ts_col"]) is None
    assert resolve_dim("t", ["times", "x"]) == "times"
    assert resolve_dim("lon", ["longitude", "lat"]) == "longitude"
    assert resolve_dim("widgets", ["x", "y"]) is None


def test_band_synonyms():
    assert canonical_band("red") == "b04"
    assert canonical_band("B04") == "b04"
    assert canonical_band("nir") == "b08"
    assert canonical_band("swir16") == "b11"
    assert canonical_band("SCL") == "scl"
    assert canonical_band("mystery") == "mystery"


def test_resolve_bands_through_synonyms():
    available = ["B02", "B04", "B08", "SCL"]
    m = resolve_bands(["red", "nir", "blue"], available)
    assert m == {"red": "B04", "nir": "B08", "blue": "B02"}


def test_resolve_bands_exact_case_insensitive():
    m = resolve_bands(["scl", "b02"], ["SCL", "B02"])
    assert m == {"scl": "SCL", "b02": "B02"}


def test_resolve_bands_unmatched_omitted():
    m = resolve_bands(["red", "nope"], ["B04"])
    assert m == {"red": "B04"}
