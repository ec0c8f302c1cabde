"""STAC API client driven entirely through an injected transport —
the catalog half of the reference's load_stac pipeline (routing,
collection listing, filtered search, pagination) verified offline
against canned REST responses."""

import pytest


def _item(iid, dt, cloud, assets):
    return {
        "id": iid,
        "bbox": [10.0, 45.0, 11.0, 46.0],
        "properties": {"datetime": dt, "eo:cloud_cover": cloud},
        "assets": {
            k: {"href": f"s3://bucket/{iid}/{k}.tif", "type": "image/tiff"}
            for k in assets
        },
    }


CDSE = "https://stac.dataspace.copernicus.eu/v1"


def _canned_transport(calls):
    """Two-page /collections, two-page /search catalog."""

    def transport(url, body=None):
        calls.append((url, body))
        if url == f"{CDSE}/collections":
            return {
                "collections": [{"id": "sentinel-1-grd"}],
                "links": [{"rel": "next", "href": f"{CDSE}/collections?page=2"}],
            }
        if url == f"{CDSE}/collections?page=2":
            return {"collections": [{"id": "sentinel-2-l2a"}], "links": []}
        if body == {"token": "page2"}:
            return {
                "features": [
                    _item("C", "2024-06-03T10:00:00Z", 10, ["B04_10m", "B08_10m"])
                ],
                "links": [],
            }
        if url == f"{CDSE}/search":
            assert body["collections"] == ["sentinel-2-l2a"]
            assert body["bbox"] == [10.0, 45.0, 11.0, 46.0]
            assert body["query"] == {"eo:cloud_cover": {"lt": 20}}
            return {
                "features": [
                    _item("A", "2024-06-01T10:00:00Z", 5, ["B04_10m", "B08_10m"]),
                    # over the cloud threshold: the client must re-check
                    # server results (not every catalog implements query)
                    _item("B", "2024-06-02T10:00:00Z", 55, ["B04_10m"]),
                ],
                "links": [
                    {
                        "rel": "next",
                        "href": f"{CDSE}/search",
                        "body": {"token": "page2"},
                    }
                ],
            }
        raise AssertionError(f"unexpected request {url} {body}")

    return transport


def test_list_collections_follows_pagination():
    from openeo_processes_dask_ml_spark.io.stac_client import StacCatalog

    calls = []
    cat = StacCatalog("cdse", transport=_canned_transport(calls))
    assert cat.list_collections() == ["sentinel-1-grd", "sentinel-2-l2a"]
    assert len(calls) == 2  # both pages fetched, nothing more


def test_search_filters_and_paginates():
    from openeo_processes_dask_ml_spark.io.stac_client import StacCatalog

    cat = StacCatalog("cdse", transport=_canned_transport([]))
    items = cat.search(
        "sentinel-2-l2a",
        bbox=[10.0, 45.0, 11.0, 46.0],
        properties={"eo:cloud_cover": {"lt": 20}},
    )
    # B (cloud 55) dropped by the client-side re-check; C arrives from
    # the POST-continuation page whose body came from the next link
    assert [i["id"] for i in items] == ["A", "C"]


def test_search_max_items_stops_early():
    from openeo_processes_dask_ml_spark.io.stac_client import StacCatalog

    calls = []
    cat = StacCatalog("cdse", transport=_canned_transport(calls))
    items = cat.search(
        "sentinel-2-l2a",
        bbox=[10.0, 45.0, 11.0, 46.0],
        properties={"eo:cloud_cover": {"lt": 20}},
        max_items=1,
    )
    assert [i["id"] for i in items] == ["A"]
    assert len(calls) == 1  # page 2 never requested


def test_asset_table_routes_bands_and_lands_dataframe(spark):
    """End-to-end: routed id -> collection check -> search -> Spark
    asset table, with canonical band names converted to CDSE asset
    names (red -> B04_10m) before asset lookup."""
    from openeo_processes_dask_ml_spark.io.stac_client import stac_asset_table

    df = stac_asset_table(
        spark,
        "cdse/sentinel-2-l2a",
        bbox=[10.0, 45.0, 11.0, 46.0],
        bands=["red", "nir"],
        properties={"eo:cloud_cover": {"lt": 20}},
        transport=_canned_transport([]),
    )
    rows = {(r["item_id"], r["band"]): r for r in df.collect()}
    assert set(rows) == {
        ("A", "B04_10m"),
        ("A", "B08_10m"),
        ("C", "B04_10m"),
        ("C", "B08_10m"),
    }
    a_red = rows[("A", "B04_10m")]
    assert a_red["href"] == "s3://bucket/A/B04_10m.tif"
    assert a_red["collection"] == "cdse/sentinel-2-l2a"
    assert a_red["bbox"] == [10.0, 45.0, 11.0, 46.0]


def test_asset_table_rejects_unknown_collection(spark):
    from openeo_processes_dask_ml_spark.io.stac_client import stac_asset_table

    with pytest.raises(ValueError, match="not available on 'cdse'"):
        stac_asset_table(
            spark, "cdse/no-such-collection", transport=_canned_transport([])
        )


def test_default_transport_fails_loudly_offline():
    from openeo_processes_dask_ml_spark.io.stac_client import (
        default_transport,
    )

    with pytest.raises(RuntimeError, match="no network access"):
        # reserved TEST-NET address: guaranteed unroutable, fails fast
        default_transport("http://192.0.2.1/collections")
