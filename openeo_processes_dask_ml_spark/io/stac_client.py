"""Minimal STAC API client + Spark asset table.

The reference reaches live STAC catalogs through ``pystac_client``
(minibackend/custom_processes.py:11,25-37: ``Client.open`` +
collection listing; :63-94: backend routing) and loads the hits with
``load_stac_with_cache``. This module reproduces the CATALOG half of
that pipeline — collection listing, item search with bbox/datetime/
property filters, link-rel pagination — against the plain STAC REST
API with zero dependencies, and lands the results as a Spark DataFrame
of assets (one row per item x requested band) that the cube loaders
can consume.

Network access is injected: every request goes through a ``transport``
callable ``(url, body|None) -> dict`` so unit tests drive the full
client against canned JSON, and the default transport (urllib, 30 s
timeout) raises a clear error in offline environments instead of
hanging. Actual pixel/COG decoding stays behind the geo-stack gate in
``io/load.py`` — this client stops at hrefs, which is exactly the
boundary Spark wants: the asset table is a DataFrame, so downstream
decode fans out per-partition instead of driver-side.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from openeo_processes_dask_ml_spark.io.load import (
    DATA_BACKENDS,
    parse_collection_id,
    to_provider_bands,
)

Transport = Callable[[str, dict | None], dict]

_COMPARE = {
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
}


def default_transport(url: str, body: dict | None = None) -> dict:
    """GET (body is None) or POST-JSON via urllib. Kept out of the hot
    path by design — catalog metadata is driver-side and tiny."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Accept": "application/json"}
        | ({} if body is None else {"Content-Type": "application/json"}),
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())
    except (urllib.error.URLError, OSError) as exc:
        raise RuntimeError(
            f"STAC request to {url} failed ({exc}); this environment may "
            "have no network access — inject a transport for testing"
        ) from exc


def _next_link(doc: dict) -> tuple[str, dict | None] | None:
    """The rel=next pagination link, honoring the STAC API convention
    that POST-search continuations carry a merged request body."""
    for link in doc.get("links", ()):
        if link.get("rel") == "next":
            return link["href"], link.get("body")
    return None


class StacCatalog:
    """One STAC API root (``aws``/``cdse``/``planetarycomputer`` by
    backend name, or any explicit URL)."""

    def __init__(self, url_or_backend: str, transport: Transport | None = None):
        self.url = DATA_BACKENDS.get(
            url_or_backend, url_or_backend
        ).rstrip("/")
        self._transport = transport or default_transport

    # -- collections -----------------------------------------------------
    def list_collections(self) -> list[str]:
        """All collection ids, following rel=next pages (the reference's
        ``_get_stac_collections``, custom_processes.py:25-37)."""
        ids: list[str] = []
        url: str | None = f"{self.url}/collections"
        body: dict | None = None
        while url:
            doc = self._transport(url, body)
            ids.extend(c["id"] for c in doc.get("collections", ()))
            nxt = _next_link(doc)
            url, body = nxt if nxt else (None, None)
        return ids

    def has_collection(self, collection_id: str) -> bool:
        return collection_id in self.list_collections()

    # -- search ----------------------------------------------------------
    def search(
        self,
        collection_id: str,
        bbox: list[float] | None = None,
        datetime_range: str | None = None,
        properties: dict[str, dict] | None = None,
        page_limit: int = 100,
        max_items: int | None = None,
    ) -> list[dict]:
        """POST /search with rel=next pagination; returns raw item
        dicts. ``properties`` uses the reference's reduced form
        {prop: {op: value}} (custom_processes.py:32-51) — sent as the
        STAC ``query`` extension AND re-checked client-side, since not
        every catalog implements the extension."""
        body: dict = {"collections": [collection_id], "limit": page_limit}
        if bbox is not None:
            body["bbox"] = bbox
        if datetime_range is not None:
            body["datetime"] = datetime_range
        if properties:
            body["query"] = {
                p: {op: v for op, v in cond.items()}
                for p, cond in properties.items()
            }
        items: list[dict] = []
        url: str | None = f"{self.url}/search"
        while url:
            doc = self._transport(url, body)
            for item in doc.get("features", ()):
                if properties and not _item_matches(item, properties):
                    continue
                items.append(item)
                if max_items is not None and len(items) >= max_items:
                    return items
            nxt = _next_link(doc)
            url, body = nxt if nxt else (None, None)
        return items


def _item_matches(item: dict, properties: dict[str, dict]) -> bool:
    props = item.get("properties", {})
    for prop, cond in properties.items():
        if prop not in props:
            return False
        for op, value in cond.items():
            if op not in _COMPARE or not _COMPARE[op](props[prop], value):
                return False
    return True


# -- Spark asset table ----------------------------------------------------

ASSET_SCHEMA = (
    "item_id string, collection string, datetime string, band string, "
    "href string, media_type string, bbox array<double>"
)


def asset_rows(
    items: list[dict], collection_id: str, bands: list[str] | None = None
) -> list[tuple]:
    """Flatten STAC items to (item, band, href) rows. Requested
    canonical band names route through the provider conversion tables
    (``to_provider_bands`` — the reference's pre-load rename,
    get_datacube.py:190-234) before asset lookup; None selects every
    asset."""
    wanted = (
        None if bands is None else to_provider_bands(collection_id, bands)
    )
    rows = []
    for item in items:
        assets = item.get("assets", {})
        keys = assets.keys() if wanted is None else wanted
        for key in keys:
            asset = assets.get(key)
            if asset is None:
                continue
            rows.append(
                (
                    item.get("id"),
                    collection_id,
                    item.get("properties", {}).get("datetime"),
                    key,
                    asset.get("href"),
                    asset.get("type"),
                    [float(x) for x in item.get("bbox", [])] or None,
                )
            )
    return rows


def stac_asset_table(
    spark: SparkSession,
    collection_id: str,
    bbox: list[float] | None = None,
    datetime_range: str | None = None,
    bands: list[str] | None = None,
    properties: dict[str, dict] | None = None,
    transport: Transport | None = None,
    max_items: int | None = None,
) -> DataFrame:
    """The full reference catalog pipeline as one call: route
    "<backend>/<collection>" (custom_processes.py:63-94), verify the
    collection exists, search with filters, and land one DataFrame row
    per (item, band) asset. Catalog metadata is driver-side and
    bounded (max_items); the ASSET table is the distributed handoff —
    downstream decode partitions over hrefs instead of looping on the
    driver."""
    backend, coll = parse_collection_id(collection_id)
    cat = StacCatalog(backend, transport=transport)
    if not cat.has_collection(coll):
        raise ValueError(
            f"collection {coll!r} not available on {backend!r}; "
            "try another backend "
            f"({', '.join(sorted(DATA_BACKENDS))})"
        )
    items = cat.search(
        coll,
        bbox=bbox,
        datetime_range=datetime_range,
        properties=properties,
        max_items=max_items,
    )
    return spark.createDataFrame(
        asset_rows(items, collection_id, bands), ASSET_SCHEMA
    )
