"""F16: vectorized WKB point decoding (no shapely/GDAL dependency).

The reference decodes PostGIS ``ST_AsBinary`` output into point geometries
row-by-row via the Wkx library (reference src/GeometryTypeHandler.cs:10-22).
Here: a numpy batch decoder for the WKB shapes PostGIS actually emits for
this workload — Point / PointZ (2D/3D), little- or big-endian, with or
without the EWKB SRID flag — suitable for an Arrow-batched pandas UDF over
a ``binary`` geometry column.
"""

from __future__ import annotations

import numpy as np

_WKB_POINT = 1
_EWKB_Z = 0x80000000
_EWKB_SRID = 0x20000000
# ISO WKB uses type + 1000 for Z variants
_ISO_Z_OFFSET = 1000


def decode_wkb_points(blobs) -> np.ndarray:
    """bytes sequence -> (N, 3) float64 (z = NaN for 2D points).

    Vectorized over the common case (uniform little-endian layout): one
    frombuffer per distinct layout class instead of per row.
    """
    n = len(blobs)
    out = np.full((n, 3), np.nan)
    # classify rows by (endianness, header length, has_z)
    groups: dict[tuple, list[int]] = {}
    metas = []
    for i, b in enumerate(blobs):
        if b is None or len(b) < 21:
            metas.append(None)
            continue
        little = b[0] == 1
        dt = "<u4" if little else ">u4"
        gtype = int(np.frombuffer(b[1:5], dt)[0])
        offset = 5
        has_z = False
        if gtype & _EWKB_Z:
            has_z = True
        if gtype & _EWKB_SRID:
            offset += 4
        base = gtype & 0x0FFFFFFF & ~_EWKB_Z
        if base >= _ISO_Z_OFFSET and base < 2 * _ISO_Z_OFFSET:
            has_z = True
            base -= _ISO_Z_OFFSET
        if base != _WKB_POINT:
            metas.append(None)
            continue
        key = (little, offset, has_z)
        groups.setdefault(key, []).append(i)
        metas.append(key)

    for (little, offset, has_z), idxs in groups.items():
        dt = "<f8" if little else ">f8"
        ncoord = 3 if has_z else 2
        stacked = np.frombuffer(
            b"".join(bytes(blobs[i][offset : offset + 8 * ncoord]) for i in idxs),
            dt,
        ).reshape(len(idxs), ncoord)
        out[idxs, :ncoord] = stacked
    return out


def encode_wkb_point(x: float, y: float, z: float | None = None) -> bytes:
    """Little-endian ISO WKB Point/PointZ (test helper / sink side)."""
    import struct

    if z is None:
        return struct.pack("<BIdd", 1, _WKB_POINT, x, y)
    return struct.pack("<BIddd", 1, _WKB_POINT + _ISO_Z_OFFSET, x, y, z)
