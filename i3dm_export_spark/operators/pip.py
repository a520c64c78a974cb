"""Point-in-polygon join (north_star operator; generalizes reference J1).

The reference's only spatial predicate is point-in-rectangle via PostGIS
``ST_Intersects(geom, envelope)`` (src/InstancesRepository.cs:32-38). The
generalized engine adds true polygon boundaries:

* polygons ship as a **broadcast** list of vertex rings with precomputed
  envelopes (small dim side — reference analog: the glb model side input is
  also broadcast, SURVEY.md J2);
* candidate pruning is an **envelope prefilter** expressed as plain column
  predicates (Catalyst-optimizable, pushes to the scan);
* the exact test is vectorized numpy **ray casting** (even-odd rule) inside
  an Arrow-batched pandas UDF — no shapely dependency, no per-row Python;
* axis-aligned rectangles take a pure-SQL fast path (half-open edges),
  which is also the oracle-checkable surface in __spark_entry__.

At scale, instances carry an S2/quadkey cell column; polygons are bucketed
by covering cells so the prefilter becomes a broadcast equi-join on cell
rather than N_polygon envelope predicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def point_in_polygon_batch(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray casting of N points against one polygon ring (M, 2).

    Vectorized over points x edges; boundary points follow the half-open
    convention of the crossing rule (consistent, documented).
    """
    x, y = np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    vx, vy = ring[:, 0], ring[:, 1]
    vx2, vy2 = np.roll(vx, -1), np.roll(vy, -1)
    # edge straddles the horizontal line at y (half-open: [min, max))
    straddle = (vy[None, :] > y[:, None]) != (vy2[None, :] > y[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = vx[None, :] + (y[:, None] - vy[None, :]) / (vy2 - vy)[None, :] * (
            vx2 - vx
        )[None, :]
    crossings = straddle & (x[:, None] < x_int)
    return (np.count_nonzero(crossings, axis=1) % 2).astype(bool)


def pip_join(
    points: DataFrame,
    polygons: list[dict],
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "boundary_id",
) -> DataFrame:
    """Inner join points x polygons. ``polygons``: [{boundary_id, ring:
    [(x,y), ...], (optional) min_lon/min_lat/max_lon/max_lat}].

    Physical shape: envelope prefilter (column predicates -> candidate set
    per polygon is tiny) + one mapInPandas exact pass with the rings
    broadcast by closure. Output: points columns + boundary_id.
    """
    from ..packaging import ensure_shipped

    spark = points.sparkSession
    ensure_shipped(spark)
    polys = []
    for p in polygons:
        ring = np.asarray(p["ring"], np.float64)
        env = (
            p.get("min_lon", float(ring[:, 0].min())),
            p.get("min_lat", float(ring[:, 1].min())),
            p.get("max_lon", float(ring[:, 0].max())),
            p.get("max_lat", float(ring[:, 1].max())),
        )
        polys.append((int(p[id_col]), ring, env))

    # envelope prefilter: OR of per-polygon envelopes, Catalyst-pushed
    env_pred = None
    for _pid, _ring, (x0, y0, x1, y1) in polys:
        pred = (
            (F.col(lon) >= x0) & (F.col(lon) < x1)
            & (F.col(lat) >= y0) & (F.col(lat) < y1)
        )
        env_pred = pred if env_pred is None else (env_pred | pred)
    cand = points.filter(env_pred) if env_pred is not None else points

    bc = spark.sparkContext.broadcast(polys)
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField(id_col, T.LongType())]
    )

    def _exact(iterator):
        ps = bc.value
        for pdf in iterator:
            lons = pdf[lon].to_numpy(np.float64)
            lats = pdf[lat].to_numpy(np.float64)
            frames = []
            for pid, ring, (x0, y0, x1, y1) in ps:
                pre = (lons >= x0) & (lons < x1) & (lats >= y0) & (lats < y1)
                if not pre.any():
                    continue
                idx = np.flatnonzero(pre)
                inside = point_in_polygon_batch(lons[idx], lats[idx], ring)
                hit = idx[inside]
                if hit.size:
                    sub = pdf.iloc[hit].copy()
                    sub[id_col] = pid
                    frames.append(sub)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return cand.mapInPandas(_exact, schema=out_schema)


def pip_join_rect_sql(
    points: DataFrame,
    rects: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Rectangle fast path as a broadcast theta-join on half-open envelope
    predicates — fully JVM-side/codegen (the oracle-checkable surface)."""
    return points.join(
        F.broadcast(rects),
        (points[lon] >= rects["min_lon"]) & (points[lon] < rects["max_lon"])
        & (points[lat] >= rects["min_lat"]) & (points[lat] < rects["max_lat"]),
        "inner",
    )
