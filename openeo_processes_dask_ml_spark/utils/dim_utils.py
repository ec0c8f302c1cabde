"""Dimension-name and band-name alias resolution.

The reference fuzzy-matches dimension names against alias groups and band
names against Sentinel-1/2 synonym groups (reference:
openeo_processes_dask_ml/process_implementations/utils/dim_utils.py:11-16,
154-221). In Spark, dims are ordinary columns, so the resolver is a thin
mapping from a user/model-supplied name to the actual column name of a
DataFrame — user data is never renamed.
"""

from __future__ import annotations

from collections.abc import Iterable

# Canonical role -> accepted spellings (case-insensitive).
DIM_ALIASES: dict[str, tuple[str, ...]] = {
    "bands": ("band", "bands", "b", "channel", "channels"),
    "time": ("time", "times", "t", "date", "dates"),
    # "width"/"height" are the STAC-MLM dim_order convention for the
    # spatial axes (e.g. [batch, channel, height, width] input shapes)
    "x": ("x", "lon", "lng", "longitude", "width"),
    "y": ("y", "lat", "latitude", "height"),
    "batch": ("batch", "batches"),
}

# Sentinel-2 / Sentinel-1 band synonym groups: every name in a group refers
# to the same physical band (public ESA band naming; mirrors the semantic
# table at reference dim_utils.py:161-186).
BAND_ALIAS_GROUPS: tuple[tuple[str, ...], ...] = (
    ("b01", "b1", "coastal", "coastal_aerosol"),
    ("b02", "b2", "blue"),
    ("b03", "b3", "green"),
    ("b04", "b4", "red"),
    ("b05", "b5", "rededge1", "red_edge_1"),
    ("b06", "b6", "rededge2", "red_edge_2"),
    ("b07", "b7", "rededge3", "red_edge_3"),
    ("b08", "b8", "nir"),
    ("b8a", "nir08", "nir2"),
    ("b09", "b9", "nir09", "water_vapour", "water_vapor"),
    ("b10", "cirrus"),
    ("b11", "swir16", "swir1"),
    ("b12", "swir22", "swir2"),
    ("scl", "scene_classification"),
    ("aot", "aerosol_optical_thickness"),
    ("wvp", "water_vapour_pressure"),
    ("vv",),
    ("vh",),
    ("hh",),
    ("hv",),
)

_BAND_CANON: dict[str, str] = {
    alias: group[0] for group in BAND_ALIAS_GROUPS for alias in group
}


def dim_role(name: str) -> str | None:
    """Return the canonical role ('bands'/'time'/'x'/'y'/'batch') for a
    dimension name, or None if it matches no alias group."""
    low = name.lower()
    for role, aliases in DIM_ALIASES.items():
        if low in aliases:
            return role
    return None


def resolve_dim(name: str, available: Iterable[str]) -> str | None:
    """Map a requested dim name onto an available column name.

    Exact (case-insensitive) match wins; otherwise both sides are reduced
    to their alias role and matched on that.
    """
    avail = list(available)
    low = name.lower()
    for col in avail:
        if col.lower() == low:
            return col
    role = dim_role(name)
    if role is None:
        return None
    for col in avail:
        if dim_role(col) == role:
            return col
    return None


_RES_SUFFIX = __import__("re").compile(r"_(\d+)m$")


def canonical_band(name: str) -> str:
    """Canonical spelling for a band name (identity if unknown).

    Provider asset names that carry a resolution suffix (CDSE's
    ``B04_10m`` style, reference get_datacube.py:190-215) reduce to the
    same canonical band as their plain spelling — the suffix is a
    storage detail, not a different physical band."""
    low = _RES_SUFFIX.sub("", name.lower())
    return _BAND_CANON.get(low, low)


def resolve_bands(requested: Iterable[str], available: Iterable[str]) -> dict[str, str]:
    """Map each requested band name to the matching available band label.

    Matching is case-insensitive through the synonym groups; unmatched
    names are omitted (callers decide whether that is an error).
    """
    avail = list(available)
    canon_to_avail = {canonical_band(a): a for a in avail}
    exact = {a.lower(): a for a in avail}
    out: dict[str, str] = {}
    for req in requested:
        if req.lower() in exact:
            out[req] = exact[req.lower()]
            continue
        hit = canon_to_avail.get(canonical_band(req))
        if hit is not None:
            out[req] = hit
    return out
