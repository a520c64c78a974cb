"""Serving-path queries against a finished export (bbox -> tiles/instances).

A consumer of the export (a 3D Tiles client, a spatial analyst, an ops
runbook) asks two questions the engine itself never needed until now:
*which content tiles intersect this bbox* and *which instances are in it*.
Both answer from artifacts the pipeline already maintains — no re-tiling,
no full-data scan:

* :func:`tiles_in_bbox` — the sink manifest (one tiny row per tile) joined
  against the closed-form per-level tile-index ranges of the bbox. The
  range table has one row per level (`<= max_level+1`), broadcast; tile
  keys parse from the ``{level}_{x}_{y}.{ext}`` relpath with JVM regexes.
  Cost is a manifest scan — O(tiles), never O(instances).
* :func:`instances_in_bbox` — the stage-3 assignment checkpoint filtered
  on lon/lat. The checkpoint is written Morton-range-partitioned
  (plans/pipeline stage 3), so the lon/lat predicates push down to parquet
  row-group stats that are spatially coherent — at cluster scale a small
  bbox reads a small fraction of files (PushedFilters gated in tests).

The bbox convention matches the tiling kernel (functions/cells.tile_xy):
root bounds from ``_export_meta.json``, y grows north from YMin, edge
clamping (reference src/ImplicitTiling.cs:81-88). Bbox corners are mapped
through the same floor/clamp kernel as points, so a bbox edge that
coincides exactly with a cell boundary includes the cell a point on that
edge would map to — self-consistent with instance assignment, if slightly
wider than a strict open-interval geometric intersection.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class ServingStateMissing(RuntimeError):
    """The artifact a serving query answers from (export meta, sink
    manifest, or the stage-3 checkpoint) is absent — e.g. the checkpoints
    were vacuumed with ``keep_stages=()`` or the export never completed.
    Serving queries never rebuild state; re-run the export (or point at
    the right --checkpoint_dir) instead."""


def _load_meta(out_dir: str, checkpoint_dir: str | None) -> dict:
    root = checkpoint_dir or os.path.join(out_dir, "_checkpoints")
    path = os.path.join(root, "_export_meta.json")
    if not os.path.exists(path):
        raise ServingStateMissing(
            f"no _export_meta.json under {root}: not a completed export "
            "root (or pass the export's checkpoint_dir)"
        )
    with open(path) as f:
        return json.load(f)


def bbox_tile_range(bounds, bbox, level: int):
    """Closed-form index range of tiles at ``level`` intersecting ``bbox``:
    ``(x0, x1, y0, y1)`` inclusive, clamped to the level's grid. Pure
    arithmetic — the same math as functions/cells.tile_xy applied to the
    bbox corners."""
    xmin, ymin, xmax, ymax = bounds[0], bounds[1], bounds[2], bounds[3]
    qx0, qy0, qx1, qy1 = bbox
    n = 1 << level

    def _idx(v, lo, hi):
        import math

        f = math.floor((v - lo) / (hi - lo) * n)
        return min(max(f, 0), n - 1)

    return (_idx(qx0, xmin, xmax), _idx(qx1, xmin, xmax),
            _idx(qy0, ymin, ymax), _idx(qy1, ymin, ymax))


def tiles_in_bbox(
    spark: SparkSession,
    out_dir: str,
    bbox,
    checkpoint_dir: str | None = None,
    level: int | None = None,
) -> DataFrame:
    """(level, x, y, relpath, n_bytes) of every content tile whose cell
    rectangle intersects ``bbox`` (minlon, minlat, maxlon, maxlat).
    ``level`` restricts the answer to one quadtree level (a tiles client
    asks per-LOD; the filter also prunes the broadcast range table)."""
    meta = _load_meta(out_dir, checkpoint_dir)
    bounds = meta["bounds"]
    max_level = int(meta["opts"]["max_level"])
    root = checkpoint_dir or os.path.join(out_dir, "_checkpoints")
    manifest_dir = os.path.join(root, "_sink_manifests", "content")
    if not os.path.isdir(manifest_dir):
        raise ServingStateMissing(
            f"no content sink manifest under {manifest_dir}: the export "
            "ran with write_content=False, or its manifests were removed — "
            "tiles_in_bbox answers from manifests only"
        )
    manifest = spark.read.parquet(manifest_dir)
    tiles = manifest.select(
        F.regexp_extract("relpath", r"^(\d+)_(\d+)_(\d+)\.", 1)
        .cast("int").alias("level"),
        F.regexp_extract("relpath", r"^(\d+)_(\d+)_(\d+)\.", 2)
        .cast("bigint").alias("x"),
        F.regexp_extract("relpath", r"^(\d+)_(\d+)_(\d+)\.", 3)
        .cast("bigint").alias("y"),
        "relpath", "n_bytes",
    )
    levels = (
        range(max_level + 1) if level is None
        else range(max(level, 0), min(level, max_level) + 1)
    )
    ranges = spark.createDataFrame(
        [(lv, *bbox_tile_range(bounds, bbox, lv)) for lv in levels],
        "level int, x0 bigint, x1 bigint, y0 bigint, y1 bigint",
    )
    return (
        tiles.join(F.broadcast(ranges), "level")
        .filter("x >= x0 and x <= x1 and y >= y0 and y <= y1")
        .select("level", "x", "y", "relpath", "n_bytes")
    )


def instances_in_bbox(
    spark: SparkSession,
    out_dir: str,
    bbox,
    checkpoint_dir: str | None = None,
    columns=("url", "lon", "lat", "level", "x", "y"),
) -> DataFrame:
    """Instances inside ``bbox`` from the stage-3 assignment checkpoint.
    Pure parquet filter — lon/lat predicates push to row-group stats that
    the Morton-ordered write made spatially coherent.

    Hard-depends on the ``stage3_assigned`` checkpoint: if it was vacuumed
    or never completed, this raises :class:`ServingStateMissing` (VERDICT
    r4 #7) — serving queries never recompute assignments."""
    root = checkpoint_dir or os.path.join(out_dir, "_checkpoints")
    stage3 = os.path.join(root, "stage3_assigned")
    if not os.path.isdir(stage3):
        raise ServingStateMissing(
            f"stage3_assigned checkpoint missing under {root} (vacuumed, "
            "or the export never completed): instances_in_bbox answers "
            "from the assignment checkpoint only — re-run the export or "
            "pass the correct checkpoint_dir"
        )
    assigned = spark.read.parquet(stage3)
    qx0, qy0, qx1, qy1 = (float(v) for v in bbox)
    return (
        assigned
        .filter(
            (F.col("lon") >= qx0) & (F.col("lon") <= qx1)
            & (F.col("lat") >= qy0) & (F.col("lat") <= qy1)
        )
        .select(*columns)
    )


def query_bbox_summary(
    spark: SparkSession,
    out_dir: str,
    bbox,
    checkpoint_dir: str | None = None,
    max_listed: int = 100,
) -> dict:
    """CLI-facing one-shot: tile + instance counts and a bounded file
    sample for a bbox."""
    tiles = tiles_in_bbox(spark, out_dir, bbox, checkpoint_dir).cache()
    try:
        n_tiles = tiles.count()
        sample = [
            r["relpath"] for r in
            tiles.orderBy("level", "x", "y").limit(max_listed).collect()
        ]
    finally:
        tiles.unpersist()
    n_instances = instances_in_bbox(
        spark, out_dir, bbox, checkpoint_dir
    ).count()
    return {
        "bbox": list(bbox), "n_tiles": n_tiles,
        "n_instances": n_instances, "tiles": sample,
    }
