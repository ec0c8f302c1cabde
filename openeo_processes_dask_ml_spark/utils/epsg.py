"""CRS (EPSG) discovery from cube metadata.

The reference hunts for the EPSG code across coords ``epsg`` /
``spatial_ref``, attrs ``spec.epsg`` (stackstac RasterSpec) and
``crs='epsg:xxxx'`` strings (reference: utils/epsg_utils.py:10-64), and
re-attaches it to outputs. Here CRS lives in ``CubeFrame.attrs`` —
these helpers normalize the same input spellings.
"""

from __future__ import annotations

import re


def parse_epsg(value) -> int | None:
    """Normalize an EPSG declaration to its integer code."""
    if value is None:
        return None
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        m = re.match(r"(?i)^(?:epsg:)?(\d+)$", value.strip())
        if m:
            return int(m.group(1))
        return None
    if isinstance(value, dict):  # stackstac RasterSpec-style {"epsg": n}
        return parse_epsg(value.get("epsg"))
    epsg = getattr(value, "epsg", None)
    return parse_epsg(epsg) if epsg is not None else None


def discover_epsg(attrs: dict) -> int | None:
    """Check the attr spellings the reference accepts, in its order."""
    for key in ("epsg", "spatial_ref", "spec", "crs"):
        if key in attrs:
            code = parse_epsg(attrs[key])
            if code is not None:
                return code
    return None


def write_epsg(attrs: dict, epsg: int) -> dict:
    out = dict(attrs)
    out["epsg"] = int(epsg)
    return out
