"""Deterministic pages/instances fixtures (FIXTURES.md contract).

The primary input (BASELINE.json input_hint) is an Iceberg/parquet table of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``; each page
is geocoded and treated as one point instance. Two synthesis paths:

1. :func:`synthesize_pages` — pure-Python/pandas generator of the fixture
   scenarios (A = the reference's 50x50 clustering grid,
   /root/reference/tests/Clustering/create_testdata.sql:1-11; S = 90/10
   urban-skew) used by pytest and the bench.

2. ``INSTANCE_SQL`` — a deterministic geocode of the driver's ``documents``
   testdata table expressed as a SQL fragment that evaluates identically in
   Spark SQL and DuckDB (integer arithmetic only), so every queries()/
   oracle_sql() pair operates on the same derived instance table.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

GRID_N = 50
GRID_LON0, GRID_LAT0 = 34.0, 44.0
GRID_SPAN = 0.1


def synthesize_pages(n: int = 2500, scenario: str = "A", seed: int = 42) -> pd.DataFrame:
    """Deterministic pages table; columns per FIXTURES.md §1.

    Scenario A: 50x50 uniform grid over [34,34.1]x[44,44.1] (the reference
    clustering fixture; rows beyond 2500 wrap the grid with a sub-step
    offset so any n stays inside the bbox). Scenario S: 90% of rows in one
    0.001-deg "urban" cell at (34.05, 44.05), 10% uniform over [34,35]x[44,45].
    """
    i = np.arange(n, dtype=np.int64)
    step = GRID_SPAN / (GRID_N - 1)

    if scenario == "A":
        cell = i % (GRID_N * GRID_N)
        wrap = i // (GRID_N * GRID_N)
        # wrap offset keeps extra rows deterministic and inside the bbox
        lon = GRID_LON0 + (cell % GRID_N) * step + (wrap % 7) * step / 11.0
        lat = GRID_LAT0 + (cell // GRID_N) * step + (wrap % 5) * step / 13.0
    elif scenario == "S":
        rng = np.random.default_rng(seed)
        urban = rng.random(n) < 0.9
        lon = np.where(
            urban,
            34.05 + rng.random(n) * 0.001,
            34.0 + rng.random(n) * 1.0,
        )
        lat = np.where(
            urban,
            44.05 + rng.random(n) * 0.001,
            44.0 + rng.random(n) * 1.0,
        )
    else:
        raise ValueError(f"unknown scenario {scenario!r}")

    t0 = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    return pd.DataFrame(
        {
            "url": [f"https://example.org/p/{k:08d}" for k in i],
            "warc_ts": [t0 + _dt.timedelta(seconds=int(k)) for k in i],
            "html": [f"<html><body>doc {k}</body></html>".encode() for k in i],
            "text": [f"doc {k}" for k in i],
            "lang": [["en", "fr", "de", "nl"][k % 4] for k in i],
            "lon": lon,
            "lat": lat,
            "z": np.zeros(n),
            "scale": np.full(n, 50.0),
            "yaw": np.zeros(n),
            "pitch": np.zeros(n),
            "roll": np.zeros(n),
            "model": ["tree.glb"] * n,
            "tags": [None] * n,
        }
    )


def pages_df_distributed(spark, n: int, scenario: str = "A", partitions: int | None = None):
    """Scenario-A pages synthesized executor-side from ``spark.range`` —
    identical values to :func:`synthesize_pages` (same grid arithmetic,
    asserted in tests) but scales to hundreds of millions of rows without
    driver materialization. Used by the bench/scaling harness."""
    from pyspark.sql import functions as F

    if scenario != "A":
        raise ValueError("distributed synthesis implements scenario A only")
    step = GRID_SPAN / (GRID_N - 1)
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    cell = i % (GRID_N * GRID_N)
    wrap = (i / (GRID_N * GRID_N)).cast("bigint")
    lon = F.lit(GRID_LON0) + (cell % GRID_N) * F.lit(step) + (wrap % 7) * F.lit(step / 11.0)
    lat = (
        F.lit(GRID_LAT0) + (cell / GRID_N).cast("bigint") * F.lit(step)
        + (wrap % 5) * F.lit(step / 13.0)
    )
    return df.select(
        F.format_string("https://example.org/p/%08d", i).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=i)).alias("warc_ts"),
        F.encode(F.format_string("<html><body>doc %d</body></html>", i), "utf-8").alias("html"),
        F.format_string("doc %d", i).alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("nl")), (i % 4 + 1).cast("int")).alias("lang"),
        lon.alias("lon"), lat.alias("lat"),
        F.lit(0.0).alias("z"), F.lit(50.0).alias("scale"),
        F.lit(0.0).alias("yaw"), F.lit(0.0).alias("pitch"), F.lit(0.0).alias("roll"),
        F.lit("tree.glb").alias("model"),
        F.lit(None).cast("string").alias("tags"),
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "lon double, lat double, z double, scale double, yaw double, "
    "pitch double, roll double, model string, tags string"
)


def pages_df(spark, n: int = 2500, scenario: str = "A", partitions: int | None = None):
    """Pages fixture as a Spark DataFrame. Explicit schema: the all-NULL
    tags column breaks inference on non-Arrow sessions."""
    pdf = synthesize_pages(n, scenario)
    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


# ---------------------------------------------------------------------------
# Deterministic geocode of the driver's `documents` table (integer math only,
# identical results in Spark SQL and DuckDB — the correctness-gate contract).
# ---------------------------------------------------------------------------

# multiplicative hashes (Knuth 2654435761 and a 31-bit LCG multiplier).
# Every fractional literal is CAST to DOUBLE: Spark parses bare decimal
# literals as DECIMAL (exact) while DuckDB uses DOUBLE — without the casts
# the two engines do different arithmetic.
_LON_EXPR = (
    "(CAST(34.0 AS DOUBLE) + ((doc_id * 2654435761) % 1000000) / CAST(10000000.0 AS DOUBLE))"
)
_LAT_EXPR = (
    "(CAST(44.0 AS DOUBLE) + ((doc_id * 1099087573) % 1000000) / CAST(10000000.0 AS DOUBLE))"
)

INSTANCE_COLS = (
    f"doc_id, {_LON_EXPR} AS lon, {_LAT_EXPR} AS lat, "
    "CAST(0.0 AS DOUBLE) AS z, CAST(50.0 AS DOUBLE) AS scale, "
    "CAST(0.0 AS DOUBLE) AS yaw, CAST(0.0 AS DOUBLE) AS pitch, CAST(0.0 AS DOUBLE) AS roll, "
    "CONCAT('m', doc_id % 3, '.glb') AS model, "
    "lang, n_chars, text"
)

# CTE reusable in both engines; tables are pre-registered views in DuckDB
# and temp views in Spark (sources/tables.py).
INSTANCE_CTE = f"WITH instances AS (SELECT {INSTANCE_COLS} FROM documents)"

# Root bbox for the derived instance table. The geocode above lands inside
# [34.0, 34.1) x [44.0, 44.1); the engine's extent scan + 10% inflation is
# exercised separately (operators/extent.py). For cross-engine stable tile
# keys we pin the analysis bbox exactly:
DOCS_BBOX = (34.0, 44.0, 34.1, 44.1)
