"""S2/A2/F12: table extent scan + root-bbox derivation.

Reference: one PostGIS ``ST_3DExtent`` query (src/InstancesRepository.cs:63-105)
plus driver-side fixes (src/Program.cs:81-91). Here: a single Spark agg job
(6 min/max, map-side partial agg, result broadcast by value).

Bug-compatibility (SURVEY.md §7 hazard 5): the reference's 10% inflation
mutates xmin/ymin **before** computing xmax/ymax deltas
(src/InstancesRepository.cs:89-93), making the inflation asymmetric
(upper edge moves ~11%). Reproduced exactly — it shifts every tile boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import Bounds


def compute_bounds(
    df: DataFrame,
    heights: tuple[float, float] = (0.0, 10.0),
    query: str = "",
    lon="lon",
    lat="lat",
    z="z",
    clamp: bool = True,
) -> Bounds:
    """Min/max extent -> inflated, clamped, degeneracy-fixed root Bounds."""
    if query:
        # P2 user predicate passthrough (reference src/Options.cs:25-26)
        df = df.filter(F.expr(query))
    row = df.agg(
        F.min(lon).alias("xmin"),
        F.max(lon).alias("xmax"),
        F.min(lat).alias("ymin"),
        F.max(lat).alias("ymax"),
        F.min(z).alias("zmin"),
        F.max(z).alias("zmax"),
    ).collect()[0]
    if row["xmin"] is None:
        raise ValueError(
            "extent scan found no rows (empty table or over-restrictive query)"
        )
    return derive_root_bounds(
        row["xmin"], row["ymin"], row["xmax"], row["ymax"],
        row["zmin"], row["zmax"], heights, clamp,
    )


def derive_root_bounds(
    xmin: float, ymin: float, xmax: float, ymax: float,
    zmin: float, zmax: float,
    heights: tuple[float, float] = (0.0, 10.0),
    clamp: bool = True,
) -> Bounds:
    """Pure driver math, separated for exact unit testing.

    Order of operations matches the reference exactly:
    1. z offsets (src/InstancesRepository.cs:83-84)
    2. asymmetric 10% inflation (src/InstancesRepository.cs:89-93 — xmax/ymax
       use the already-moved xmin/ymin)
    3. clamp to +/-180 / +/-90 unless keep_projection
       (src/InstancesRepository.cs:95-101)
    4. degenerate-area fix +/-0.0005 deg (src/Program.cs:81-91)
    """
    zmin = zmin + heights[0]
    zmax = zmax + heights[1]

    xmin = xmin - (xmax - xmin) * 0.1
    ymin = ymin - (ymax - ymin) * 0.1
    xmax = xmax + (xmax - xmin) * 0.1  # deliberate: uses mutated xmin
    ymax = ymax + (ymax - ymin) * 0.1  # deliberate: uses mutated ymin

    if clamp:
        xmin = max(xmin, -180.0)
        xmax = min(xmax, 180.0)
        ymin = max(ymin, -90.0)
        ymax = min(ymax, 90.0)

    if abs((xmax - xmin) * (ymax - ymin)) < 0.0001:
        delta = 0.001  # ~111 m, reference src/Program.cs:85
        xmin -= delta / 2
        ymin -= delta / 2
        xmax += delta / 2
        ymax += delta / 2

    return Bounds(xmin, ymin, xmax, ymax, zmin, zmax)
