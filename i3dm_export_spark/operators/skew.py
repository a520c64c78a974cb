"""Explicit skew handling (north_rule: "skewed hot cells salted and
range-repartitioned explicitly").

AQE's skew-join split is the backstop (session.py) but it cannot split a
GROUP: one ``applyInPandas`` group is one task, so a dense urban cell with
100x the median instance count pins one executor for (superlinearly) 100x
the median time. This module is the explicit mechanism:

* :func:`hot_cell_keys` — hot cells from the stage-2 counts (a tile is
  hot when its instance count exceeds ``threshold x max_features``);
* :func:`add_salt_for_hot` — deterministic per-row salt
  ``pmod(xxhash64(id), n_buckets)`` for rows in hot cells, salt 0
  elsewhere (cold groups are not fragmented);
* :func:`cluster_tiles_salted` — two-stage LOD reduction: stage A
  reduces each (tile, salt) sub-group to <= k rows, stage B reduces the
  <= n_buckets*k survivors per tile to exactly k.

The two-stage split is valid for reductions R where
R(R(A_1) u ... u R(A_m)) is an acceptable R(A) — k-means representative
selection qualifies (hierarchical k-means; the reference's own contract
is the COUNT invariant, reference tests/Clustering/ClusteringTests.cs:36-37,
since its RNG is unseeded, src/TileClustering.cs:19-26). Exact kNN does
NOT qualify; kNN instead runs after LOD reduction, whose output is
bounded by max_features per tile (operators/knn.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

TILE_KEY = ("level", "x", "y")


def hot_cell_keys(
    counts: DataFrame, hot_threshold: int, key_cols=TILE_KEY, count_col: str = "_n"
) -> DataFrame:
    """Cells whose count exceeds ``hot_threshold`` — the salting candidates.
    ``counts`` is the stage-2 per-cell count table (already tiny relative
    to instances), so this is a filter, not a scan of the data."""
    return counts.filter(F.col(count_col) > hot_threshold).select(*key_cols)


def add_salt_for_hot(
    df: DataFrame,
    hot: DataFrame,
    n_buckets: int,
    id_col: str = "url",
    key_cols=TILE_KEY,
    salt_col: str = "_salt",
) -> DataFrame:
    """Adds ``salt_col``: pmod(xxhash64(id), n_buckets) inside hot cells,
    0 elsewhere. The hot-key side is broadcast (it is a filtered subset of
    the cell-count table — small by construction even at 10^12 rows);
    the salt is a pure projection, so the only shuffle is whatever the
    downstream groupBy does on (key, salt)."""
    flagged = df.join(
        F.broadcast(hot.withColumn("_is_hot", F.lit(True))),
        list(key_cols),
        "left",
    )
    return flagged.withColumn(
        salt_col,
        F.when(
            F.col("_is_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)),
        ).otherwise(F.lit(0)),
    ).drop("_is_hot")


def cluster_tiles_salted(
    assigned: DataFrame, opts, order_col: str = "url"
) -> DataFrame:
    """Stage-4 LOD reduction with explicit skew salting.

    Routing by per-tile count n (k = max_features_per_tile,
    t = skew_salt_threshold, m = skew_salt_buckets):

    * n <= k          — pass through untouched;
    * k < n <= t*k    — single-stage reduce (one group, bounded work);
    * n > t*k (hot)   — salted two-stage: (tile, salt) sub-groups of
      ~n/m rows reduce to <= k each, then one final reduce of <= m*k rows
      per tile. Worst-case single-task input drops from n to
      max(n/m, m*k); per-task k-means cost is superlinear in group size,
      so wall-clock on a 100:1 hot cell drops accordingly.

    Output: exactly min(k, n) rows per content tile — the same count
    invariant as the unsalted path."""
    from ..packaging import ensure_shipped

    from .clustering import reduce_tile

    ensure_shipped(assigned.sparkSession)
    k = opts.max_features_per_tile
    seed = opts.cluster_seed
    m = max(int(opts.skew_salt_buckets), 1)
    hot_threshold = int(opts.skew_salt_threshold * k)
    key = list(TILE_KEY)
    schema = assigned.schema

    # per-tile size via a window count (one shuffle on the tile key, which
    # stage 3 already partitioned by — NOT a broadcast of the full per-tile
    # count table, which is one row per tile and would overflow broadcast
    # limits at deep-level scale). Only the filtered HOT key set below is
    # small-by-construction and safe to collect/broadcast.
    counts = assigned.groupBy(*key).agg(F.count(F.lit(1)).alias("_n"))
    wkey = Window.partitionBy(*key)
    with_n = assigned.withColumn("_n", F.count(F.lit(1)).over(wkey))

    small = with_n.filter(F.col("_n") <= k).drop("_n")
    warm = with_n.filter((F.col("_n") > k) & (F.col("_n") <= hot_threshold)).drop("_n")
    hot = with_n.filter(F.col("_n") > hot_threshold).drop("_n")

    use_ecef = not opts.keep_projection

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        return reduce_tile(pdf, k, seed=seed, order_col=order_col,
                           use_ecef=use_ecef)

    warm_reduced = warm.groupBy(*key).applyInPandas(_reduce, schema=schema)

    hot_keys = hot_cell_keys(counts, hot_threshold, key)
    salted = add_salt_for_hot(hot, hot_keys, m, id_col=order_col, key_cols=key)
    stage_a = (
        salted.groupBy(*key, "_salt")
        .applyInPandas(
            lambda pdf: _reduce(pdf.drop(columns=["_salt"])), schema=schema
        )
    )
    stage_b = stage_a.groupBy(*key).applyInPandas(_reduce, schema=schema)

    return small.unionByName(warm_reduced).unionByName(stage_b)
