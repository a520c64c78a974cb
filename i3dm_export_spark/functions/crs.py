"""S1: source-CRS ingest — vectorized EPSG transforms to WGS84 lon/lat.

The reference accepts ANY source EPSG: it probes the table SRID
(src/SpatialReferenceRepository.cs:6-12) and reprojects in-scan with
PostGIS ``ST_Transform`` (src/InstancesRepository.cs:42,52), keeping the
source projection only under keep_projection
(tests/KeepProjectionTests.cs:73-87). This engine mirrors that at stage 0:
:func:`reproject_to_wgs84` rewrites (lon, lat) from the source CRS in one
Arrow-batched numpy kernel per batch — no per-row Python.

No C projection library ships in this container, so the transforms are
implemented directly from the public formulas:

* EPSG:4326 — identity.
* EPSG:3857 — spherical Web Mercator (closed form).
* UTM — EPSG:326xx (WGS84 north), 327xx (WGS84 south), 258xx (ETRS89 /
  GRS80): transverse Mercator via the Krüger n-series to n^6 with
  Karney's Newton inversion for the conformal latitude (Karney 2011,
  "Transverse Mercator with an accuracy of a few nanometers") —
  round-trip error < 1e-9 degrees (property-tested).

If ``pyproj`` is importable it is preferred for any EPSG outside this
registry; otherwise unsupported codes raise with the supported list.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_WGS84_A, _WGS84_F = 6378137.0, 1.0 / 298.257223563
_GRS80_A, _GRS80_F = 6378137.0, 1.0 / 298.257222101


def _krueger_coeffs(n: float):
    """Krüger series coefficients (forward alpha, inverse beta) to n^6."""
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    alpha = np.array([
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
        + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
        - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ])
    return alpha, beta


class TransverseMercator:
    """Ellipsoidal transverse Mercator (Krüger/Karney series)."""

    def __init__(self, a: float, f: float, lon0_deg: float, k0: float,
                 false_easting: float, false_northing: float):
        self.a, self.f = a, f
        self.lon0 = math.radians(lon0_deg)
        self.k0 = k0
        self.e0, self.n0 = false_easting, false_northing
        n = f / (2.0 - f)
        self.n = n
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
        self.alpha, self.beta = _krueger_coeffs(n)
        self.e2 = f * (2 - f)
        self.e = math.sqrt(self.e2)

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees -> (easting, northing) meters."""
        phi = np.radians(np.asarray(lat_deg, np.float64))
        lam = np.radians(np.asarray(lon_deg, np.float64)) - self.lon0
        e = self.e
        s = np.sin(phi)
        # conformal latitude tangent
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
        j = np.arange(1, 7)[:, None]
        xi = xi_p + (self.alpha[:, None]
                     * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)).sum(0)
        eta = eta_p + (self.alpha[:, None]
                       * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)).sum(0)
        return (self.e0 + self.k0 * self.A * eta,
                self.n0 + self.k0 * self.A * xi)

    def inverse(self, easting, northing):
        """(easting, northing) meters -> (lon, lat) degrees."""
        eta = (np.asarray(easting, np.float64) - self.e0) / (self.k0 * self.A)
        xi = (np.asarray(northing, np.float64) - self.n0) / (self.k0 * self.A)
        j = np.arange(1, 7)[:, None]
        xi_p = xi - (self.beta[:, None]
                     * np.sin(2 * j * xi) * np.cosh(2 * j * eta)).sum(0)
        eta_p = eta - (self.beta[:, None]
                       * np.cos(2 * j * xi) * np.sinh(2 * j * eta)).sum(0)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        # tangent of conformal latitude -> geodetic via Newton (Karney)
        taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        e, e2 = self.e, self.e2
        tau = taup / (1 - e2)
        for _ in range(6):
            sig = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
            taupa = tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)
            dtau = ((taup - taupa) * (1 + (1 - e2) * tau**2)
                    / ((1 - e2) * np.hypot(1.0, taupa) * np.hypot(1.0, tau)))
            tau = tau + dtau
        phi = np.arctan(tau)
        return (np.degrees(lam + self.lon0), np.degrees(phi))


class WebMercator:
    """EPSG:3857 spherical Web Mercator (closed form)."""

    R = 6378137.0

    def forward(self, lon_deg, lat_deg):
        lon = np.asarray(lon_deg, np.float64)
        lat = np.asarray(lat_deg, np.float64)
        x = self.R * np.radians(lon)
        y = self.R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
        return x, y

    def inverse(self, x, y):
        lon = np.degrees(np.asarray(x, np.float64) / self.R)
        lat = np.degrees(
            2 * np.arctan(np.exp(np.asarray(y, np.float64) / self.R))
            - np.pi / 2
        )
        return lon, lat


class Identity:
    def forward(self, lon, lat):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)

    inverse = forward


def projection_for_epsg(epsg: int):
    """Projection object (forward/inverse between lon/lat degrees and the
    projected CRS) for a supported EPSG code, else None."""
    if epsg == 4326:
        return Identity()
    if epsg == 3857:
        return WebMercator()
    if 32601 <= epsg <= 32660:  # WGS84 / UTM north
        zone = epsg - 32600
        return TransverseMercator(_WGS84_A, _WGS84_F, zone * 6 - 183, 0.9996,
                                  500_000.0, 0.0)
    if 32701 <= epsg <= 32760:  # WGS84 / UTM south
        zone = epsg - 32700
        return TransverseMercator(_WGS84_A, _WGS84_F, zone * 6 - 183, 0.9996,
                                  500_000.0, 10_000_000.0)
    if 25828 <= epsg <= 25838:  # ETRS89 / UTM (GRS80)
        zone = epsg - 25800
        return TransverseMercator(_GRS80_A, _GRS80_F, zone * 6 - 183, 0.9996,
                                  500_000.0, 0.0)
    return None


def to_wgs84(epsg: int, x, y):
    """Vectorized (x, y) in ``epsg`` -> (lon, lat) degrees. Prefers the
    built-in registry; falls back to pyproj when importable."""
    proj = projection_for_epsg(epsg)
    if proj is not None:
        return proj.inverse(x, y)
    try:
        from pyproj import Transformer
    except ImportError:
        raise ValueError(
            f"EPSG:{epsg} is not in the built-in registry (4326, 3857, "
            f"UTM 326xx/327xx, ETRS89 258xx) and pyproj is unavailable"
        ) from None
    tr = Transformer.from_crs(f"EPSG:{epsg}", "EPSG:4326", always_xy=True)
    return tr.transform(np.asarray(x, np.float64), np.asarray(y, np.float64))


def from_wgs84(epsg: int, lon, lat):
    """Vectorized (lon, lat) degrees -> (x, y) in ``epsg`` (test/fixture
    helper, the forward twin of :func:`to_wgs84`)."""
    proj = projection_for_epsg(epsg)
    if proj is not None:
        return proj.forward(lon, lat)
    try:
        from pyproj import Transformer
    except ImportError:
        raise ValueError(
            f"EPSG:{epsg} is not in the built-in registry and pyproj is "
            f"unavailable"
        ) from None
    tr = Transformer.from_crs("EPSG:4326", f"EPSG:{epsg}", always_xy=True)
    return tr.transform(np.asarray(lon, np.float64), np.asarray(lat, np.float64))


def reproject_to_wgs84(df, source_epsg: int, x_col: str = "lon",
                       y_col: str = "lat"):
    """Rewrite projected (x_col, y_col) to WGS84 lon/lat in one
    Arrow-batched kernel per batch (ST_Transform-at-ingest parity,
    reference src/InstancesRepository.cs:42,52). Identity for 4326."""
    if source_epsg == 4326:
        return df
    # fail fast on the driver for unsupported codes
    to_wgs84(source_epsg, np.array([0.0]), np.array([0.0]))

    from pyspark.sql import functions as F, types as T

    from ..packaging import ensure_shipped

    ensure_shipped(df.sparkSession)

    @F.pandas_udf(
        T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ])
    )
    def _tr(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = to_wgs84(source_epsg, x.to_numpy(), y.to_numpy())
        return pd.DataFrame({"lon": lon, "lat": lat})

    out = df.withColumn("_ll", _tr(F.col(x_col), F.col(y_col)))
    return (
        out.withColumn(x_col, F.col("_ll.lon"))
        .withColumn(y_col, F.col("_ll.lat"))
        .drop("_ll")
    )
