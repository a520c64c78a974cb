"""GeoParquet CRS sniff — the parquet-side analogue of the reference's
data-driven SRID probe (reference src/SpatialReferenceRepository.cs:6-12
runs ``SELECT ST_SRID(geom) ... LIMIT 1`` against PostGIS; a parquet file
carries no per-row SRID, but a GeoParquet file carries the CRS in the
footer's ``geo`` key-value metadata, per the OGC GeoParquet 1.x spec).

Metadata-only: reads ONE file footer via pyarrow — no data rows, no Spark
job — so it is free at any corpus size. The ``geo`` value is JSON:

    {"version": "...", "primary_column": "geometry",
     "columns": {"geometry": {"encoding": "WKB",
                              "crs": {... PROJJSON ...,
                                      "id": {"authority": "EPSG",
                                             "code": 25831}}}}}

Per spec, an absent/null ``crs`` means OGC:CRS84 (lon/lat WGS84), which
maps to EPSG:4326 for this engine's purposes (axis order here is always
lon, lat). Non-EPSG authorities return None — the caller falls back to
``--source_epsg``.
"""

from __future__ import annotations

import json
import os


def _first_parquet_file(path: str) -> str | None:
    """``path`` may be a single .parquet file or a directory of part
    files; any one footer carries the dataset-level geo metadata."""
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return None


def read_geo_metadata(path: str) -> dict | None:
    """The parsed ``geo`` footer metadata dict, or None when the file is
    not GeoParquet (no ``geo`` key / unreadable / not parquet)."""
    f = _first_parquet_file(path)
    if f is None:
        return None
    try:
        import pyarrow.parquet as pq

        meta = pq.read_schema(f).metadata or {}
    except Exception:
        return None
    raw = meta.get(b"geo")
    if raw is None:
        return None
    try:
        return json.loads(raw.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None


def crs_epsg_from_geo(geo: dict) -> tuple[int | None, str | None]:
    """(epsg, primary_geometry_column) from a parsed ``geo`` dict.

    epsg resolution, per the GeoParquet spec's PROJJSON ``crs`` field:
    * column entry missing / ``crs`` absent or null -> 4326 (OGC:CRS84
      default, lon/lat order — exactly this engine's native frame)
    * PROJJSON with ``id.authority == "EPSG"`` -> that code
    * a bare ``"EPSG:nnnn"``/``"OGC:CRS84"`` string (seen in pre-1.0
      writers) -> parsed the obvious way
    * anything else -> None (caller decides; sniff cannot answer)
    """
    col = geo.get("primary_column")
    columns = geo.get("columns") or {}
    if col is None and columns:
        col = sorted(columns)[0]
    entry = columns.get(col, {}) if col else {}
    if "crs" not in entry or entry["crs"] is None:
        return 4326, col
    crs = entry["crs"]
    if isinstance(crs, str):
        c = crs.strip().upper()
        if c in ("OGC:CRS84", "CRS84", "EPSG:4326"):
            return 4326, col
        if c.startswith("EPSG:"):
            try:
                return int(c.split(":", 1)[1]), col
            except ValueError:
                return None, col
        return None, col
    ident = crs.get("id") or {}
    if str(ident.get("authority", "")).upper() == "EPSG":
        try:
            return int(ident["code"]), col
        except (KeyError, TypeError, ValueError):
            return None, col
    # OGC:CRS84 spelled as PROJJSON
    if str(ident.get("authority", "")).upper() == "OGC" and str(
        ident.get("code", "")
    ).upper() == "CRS84":
        return 4326, col
    return None, col


def sniff_crs(path: str) -> tuple[int | None, str | None]:
    """(epsg, primary_geometry_column) for a parquet path, or (None, None)
    when the input is not GeoParquet or the CRS is not EPSG-resolvable."""
    geo = read_geo_metadata(path)
    if geo is None:
        return None, None
    return crs_epsg_from_geo(geo)
