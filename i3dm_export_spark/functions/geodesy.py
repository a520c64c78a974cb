"""Vectorized geodesy kernel (numpy, batch-first).

Re-expresses the reference math kernel (SURVEY.md §2.6, F1-F9/F17) as numpy
batch functions. Float32 semantics deliberately mirror the reference's C#
``System.Numerics.Vector3`` math so the golden values in
``/root/reference/tests/Cesium/*`` and ``/root/reference/tests/*Rotation*``
reproduce bit-close (<=1e-4, the reference's own assertion tolerance):

- deg->rad                reference src/Cesium/Radian.cs:7-11
- spherical mercator      reference src/Cesium/SpatialConverter.cs:8-21
- ecef_to_enu_matrix      reference src/Cesium/SpatialConverter.cs:23-50
- rotate_vector           reference src/Cesium/Rotator.cs:8-21 (Rodrigues,
                          clockwise-positive: angle = 360 - heading)
- local_enu_basis         reference src/EnuCalculator.cs:8-40
- local_cartesian_basis   reference src/EnuCalculator.cs:42-77
- wgs84_to_ecef           owns what the reference delegates to PostGIS
                          ST_Transform(...,4978) (src/InstancesRepository.cs:42,52)
- y_up / quaternion       reference src/GPUTileHandler.cs:329-359

All functions take/return numpy arrays shaped (N, 3) / (N,) and contain no
Python-level per-row loops; they are safe to call inside Arrow-batched
pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid (reference src/Cesium/Ellipsoid.cs:5-14)
WGS84_A = 6378137.0
WGS84_B = 6356752.314245179
WGS84_E2 = 1.0 - (WGS84_B * WGS84_B) / (WGS84_A * WGS84_A)

_F32 = np.float32


def to_radians(deg):
    """F1 deg->rad (reference src/Cesium/Radian.cs:7-11)."""
    return np.asarray(deg, dtype=np.float64) * (np.pi / 180.0)


def wgs84_to_spherical_mercator(lon, lat):
    """F2 (reference src/Cesium/SpatialConverter.cs:8-14). Returns (x, y)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * 20037508.34 / 180.0
    y = np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / (np.pi / 180.0)
    y = y * 20037508.34 / 180.0
    return x, y


def spherical_mercator_to_wgs84(x, y):
    """F2 inverse (reference src/Cesium/SpatialConverter.cs:16-21)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x * 180.0 / 20037508.34
    lat = np.arctan(np.exp(y * np.pi / 20037508.34)) * 360.0 / np.pi - 90.0
    return lon, lat


def wgs84_to_ecef(lon_deg, lat_deg, height=0.0):
    """F17 geodetic (EPSG:4979) -> ECEF (EPSG:4978), double precision.

    The reference outsources this to PostGIS ``ST_Transform`` inside the
    instance-fetch SQL (src/InstancesRepository.cs:42,52); the engine owns it.
    Standard closed-form geodetic->ECEF on the WGS84 ellipsoid.
    """
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    h = np.asarray(height, dtype=np.float64)
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + h) * cos_lat * np.cos(lon)
    y = (n + h) * cos_lat * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return np.stack([x, y, z], axis=-1)


def _normalize_f32(v):
    """float32 vector normalize, matching System.Numerics.Vector3.Normalize."""
    v = v.astype(_F32, copy=False)
    norm = np.sqrt(np.sum(v * v, axis=-1, dtype=_F32)).astype(_F32)
    return (v / norm[..., None]).astype(_F32)


def _cross_f32(a, b):
    a = a.astype(_F32, copy=False)
    b = b.astype(_F32, copy=False)
    return np.cross(a, b).astype(_F32)


def geodetic_surface_normal_ecef(positions):
    """Unit geodetic 'up' at ECEF points, float32.

    Reference GetNormalUp (src/Cesium/SpatialConverter.cs:40-50):
    normalize(position * oneOverRadiiSquared) with float32 components.
    """
    p = np.atleast_2d(np.asarray(positions)).astype(_F32)
    inv = np.array(
        [1.0 / (WGS84_A * WGS84_A), 1.0 / (WGS84_A * WGS84_A), 1.0 / (WGS84_B * WGS84_B)],
        dtype=_F32,
    )
    return _normalize_f32(p * inv)


def ecef_to_enu_matrix(positions):
    """F3: per-point 4x4 ENU frame at ECEF positions (row-major, float32).

    Rows: east, north, up, position — matching the reference's matrix layout
    (src/Cesium/Matrix.cs:6-29, src/Cesium/SpatialConverter.cs:23-38). Shape
    (N, 4, 4).
    """
    p = np.atleast_2d(np.asarray(positions)).astype(_F32)
    n = p.shape[0]
    east = np.stack([-p[:, 1], p[:, 0], np.zeros(n, dtype=_F32)], axis=1)
    east_n = _normalize_f32(east)
    up_raw = geodetic_surface_normal_ecef(p)  # already normalized
    north = _cross_f32(up_raw, east)
    north_n = _normalize_f32(north)
    up_n = _normalize_f32(up_raw)

    m = np.zeros((n, 4, 4), dtype=_F32)
    m[:, 0, :3] = east_n
    m[:, 1, :3] = north_n
    m[:, 2, :3] = up_n
    m[:, 3, :3] = p
    m[:, 3, 3] = 1.0
    return m


def rotate_vector(rotatee, axis, heading_deg):
    """F4: Rodrigues rotation with the reference's clockwise-positive quirk.

    angle = radians(360 - heading) (reference src/Cesium/Rotator.cs:11).
    ``rotatee``/``axis`` are (N,3) float32; ``heading_deg`` scalar or (N,).
    """
    v = np.atleast_2d(np.asarray(rotatee)).astype(_F32)
    k = np.atleast_2d(np.asarray(axis)).astype(_F32)
    heading = np.asarray(heading_deg, dtype=np.float64)
    angle = (360.0 - heading) * (np.pi / 180.0)
    cos_a = np.cos(angle).astype(_F32)
    sin_a = np.sin(angle).astype(_F32)
    if cos_a.ndim == 0:
        cos_a = np.full(v.shape[0], cos_a, dtype=_F32)
        sin_a = np.full(v.shape[0], sin_a, dtype=_F32)
    dot = np.sum(v * k, axis=1, dtype=_F32).astype(_F32)
    base = k * dot[:, None]
    vpa = (v - base).astype(_F32)
    cx = vpa * cos_a[:, None]
    vppa = _cross_f32(k, vpa)
    cy = vppa * sin_a[:, None]
    return (base + cx + cy).astype(_F32)


def _rotate_if_nonzero(vec, axis, angles_deg):
    """Rotate+normalize rows whose angle != 0 (reference skips zero angles)."""
    angles = np.asarray(angles_deg, dtype=np.float64)
    if angles.ndim == 0:
        angles = np.full(vec.shape[0], angles, dtype=np.float64)
    nz = angles != 0.0
    if not np.any(nz):
        return vec
    out = vec.copy()
    rotated = rotate_vector(vec[nz], axis[nz], angles[nz])
    out[nz] = _normalize_f32(rotated)
    return out


def local_enu_basis(positions, yaw=0.0, pitch=0.0, roll=0.0):
    """F5: ENU basis with yaw/pitch/roll applied (reference src/EnuCalculator.cs:8-40).

    Order: yaw around up -> pitch around east -> roll around north, each
    skipped when 0, then re-orthonormalized (north = up x east, up = east x north).
    Returns (east, north, up), each (N, 3) float32.
    """
    m = ecef_to_enu_matrix(positions)
    east = _normalize_f32(m[:, 0, :3])
    north = _normalize_f32(m[:, 1, :3])
    up = _normalize_f32(m[:, 2, :3])

    east2 = _rotate_if_nonzero(east, up, yaw)
    north2 = _rotate_if_nonzero(north, up, yaw)
    east, north = east2, north2

    north2 = _rotate_if_nonzero(north, east, pitch)
    up2 = _rotate_if_nonzero(up, east, pitch)
    north, up = north2, up2

    east2 = _rotate_if_nonzero(east, north, roll)
    up2 = _rotate_if_nonzero(up, north, roll)
    east, up = east2, up2

    east = _normalize_f32(east)
    north = _normalize_f32(_cross_f32(up, east))
    up = _normalize_f32(_cross_f32(east, north))
    return east, north, up


def local_cartesian_basis(yaw=0.0, pitch=0.0, roll=0.0, n=None):
    """F6: identity-basis variant for keep_projection mode
    (reference src/EnuCalculator.cs:42-77). Returns (east, north, up)."""
    yaw_a = np.atleast_1d(np.asarray(yaw, dtype=np.float64))
    pitch_a = np.atleast_1d(np.asarray(pitch, dtype=np.float64))
    roll_a = np.atleast_1d(np.asarray(roll, dtype=np.float64))
    count = n or max(yaw_a.shape[0], pitch_a.shape[0], roll_a.shape[0])
    yaw_a = np.broadcast_to(yaw_a, (count,)).copy()
    pitch_a = np.broadcast_to(pitch_a, (count,)).copy()
    roll_a = np.broadcast_to(roll_a, (count,)).copy()

    east = np.tile(np.array([1, 0, 0], dtype=_F32), (count, 1))
    north = np.tile(np.array([0, 1, 0], dtype=_F32), (count, 1))
    up = np.tile(np.array([0, 0, 1], dtype=_F32), (count, 1))

    east2 = _rotate_if_nonzero(east, up, yaw_a)
    north2 = _rotate_if_nonzero(north, up, yaw_a)
    east, north = east2, north2

    north2 = _rotate_if_nonzero(north, east, pitch_a)
    up2 = _rotate_if_nonzero(up, east, pitch_a)
    north, up = north2, up2

    east2 = _rotate_if_nonzero(east, north, roll_a)
    up2 = _rotate_if_nonzero(up, north, roll_a)
    east, up = east2, up2

    east = _normalize_f32(east)
    north = _normalize_f32(_cross_f32(up, east))
    up = _normalize_f32(_cross_f32(east, north))
    return east, north, up


def relative_positions_f32(positions, origin):
    """F7: p - p_first per tile, float32 cast (reference src/TileHandler.cs:217-225)."""
    p = np.atleast_2d(np.asarray(positions, dtype=np.float64))
    o = np.asarray(origin, dtype=np.float64)
    return (p - o).astype(_F32)


def to_y_up(vectors):
    """F8: glTF Y-up swizzle (x,y,z)->(x,z,-y) (reference src/GPUTileHandler.cs:351-359)."""
    v = np.atleast_2d(np.asarray(vectors))
    return np.stack([v[:, 0], v[:, 2], -v[:, 1]], axis=1).astype(v.dtype)


def quaternion_from_basis(east, up, forward):
    """F9: row-major rotation matrix (rows: east, up, forward) -> quaternion
    (x, y, z, w), matching System.Numerics.CreateFromRotationMatrix semantics
    (reference src/GPUTileHandler.cs:329-349). All inputs (N,3) float32.
    """
    e = np.atleast_2d(np.asarray(east)).astype(np.float64)
    u = np.atleast_2d(np.asarray(up)).astype(np.float64)
    f = np.atleast_2d(np.asarray(forward)).astype(np.float64)
    n = e.shape[0]
    # Rotation matrix rows = (east, up, forward)
    m = np.stack([e, u, f], axis=1)  # (N, 3, 3)
    q = np.zeros((n, 4), dtype=np.float64)
    tr = m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]

    c0 = tr > 0
    s = np.sqrt(np.where(c0, tr + 1.0, 1.0)) * 2.0
    q[c0, 3] = 0.25 * s[c0]
    q[c0, 0] = (m[c0, 1, 2] - m[c0, 2, 1]) / s[c0]
    q[c0, 1] = (m[c0, 2, 0] - m[c0, 0, 2]) / s[c0]
    q[c0, 2] = (m[c0, 0, 1] - m[c0, 1, 0]) / s[c0]

    c1 = (~c0) & (m[:, 0, 0] >= m[:, 1, 1]) & (m[:, 0, 0] >= m[:, 2, 2])
    s1 = np.sqrt(np.where(c1, 1.0 + m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2], 1.0)) * 2.0
    q[c1, 0] = 0.25 * s1[c1]
    q[c1, 1] = (m[c1, 0, 1] + m[c1, 1, 0]) / s1[c1]
    q[c1, 2] = (m[c1, 0, 2] + m[c1, 2, 0]) / s1[c1]
    q[c1, 3] = (m[c1, 1, 2] - m[c1, 2, 1]) / s1[c1]

    c2 = (~c0) & (~c1) & (m[:, 1, 1] > m[:, 2, 2])
    s2 = np.sqrt(np.where(c2, 1.0 + m[:, 1, 1] - m[:, 0, 0] - m[:, 2, 2], 1.0)) * 2.0
    q[c2, 1] = 0.25 * s2[c2]
    q[c2, 0] = (m[c2, 0, 1] + m[c2, 1, 0]) / s2[c2]
    q[c2, 2] = (m[c2, 1, 2] + m[c2, 2, 1]) / s2[c2]
    q[c2, 3] = (m[c2, 2, 0] - m[c2, 0, 2]) / s2[c2]

    c3 = (~c0) & (~c1) & (~c2)
    s3 = np.sqrt(np.where(c3, 1.0 + m[:, 2, 2] - m[:, 0, 0] - m[:, 1, 1], 1.0)) * 2.0
    q[c3, 2] = 0.25 * s3[c3]
    q[c3, 0] = (m[c3, 0, 2] + m[c3, 2, 0]) / s3[c3]
    q[c3, 1] = (m[c3, 1, 2] + m[c3, 2, 1]) / s3[c3]
    q[c3, 3] = (m[c3, 0, 1] - m[c3, 1, 0]) / s3[c3]

    return q.astype(_F32)
