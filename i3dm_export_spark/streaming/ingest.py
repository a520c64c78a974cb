"""Structured Streaming ingestion (engine extension; no reference analog).

The reference is a batch CLI (SURVEY.md §2.8 — no streaming surface). The
engine adds a thin streaming front-end for continuously-arriving page
crawls: a file-source stream of pages parquet -> the same stage-0/1
projection + cell encode -> either (a) an append sink of encoded instances
partitioned by coarse cell (the batch pipeline then tiles snapshots), or
(b) a watermarked per-cell rolling count used for hot-cell monitoring.

Kept deliberately small: this module stops at instance parquet. Since
round 4, streaming/maintain.py carries the stream INTO the tile directory
itself — foreachBatch incremental appends with per-micro-batch snapshot
consistency (the export contract — availability bitmaps + tileset.json —
is refreshed to a complete valid snapshot by every applied batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import Bounds
from ..operators.tiling import with_cell_keys
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of pages parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def encoded_instances_stream(pages: DataFrame, bounds: Bounds,
                             cell_level: int = 8) -> DataFrame:
    """stage-0/1 projection for a stream: drop heavy columns, add cell keys
    and the text fingerprint (same invariant as the batch pipeline)."""
    out = (
        pages.withColumn("text_fp", F.xxhash64("text"))
        .drop("html")
    )
    return with_cell_keys(out, bounds, cell_level)


def write_instances_stream(encoded: DataFrame, out_dir: str,
                           checkpoint_dir: str, trigger_once: bool = True):
    """Append sink partitioned by coarse cell (spatial locality for the
    downstream batch tiler). Returns the StreamingQuery."""
    w = (
        encoded.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell_x")
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def hot_cell_counts_stream(pages: DataFrame, bounds: Bounds,
                           cell_level: int = 8,
                           window_minutes: int = 10,
                           watermark_minutes: int = 30) -> DataFrame:
    """Watermarked tumbling-window per-cell counts (late data tolerated up
    to the watermark) — the streaming analog of the stage-2 deep counts,
    used to pre-detect skewed cells before a batch tiling run."""
    keyed = with_cell_keys(pages, bounds, cell_level)
    return (
        keyed.withWatermark("warc_ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.window("warc_ts", f"{window_minutes} minutes"),
            "cell_x", "cell_y",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hot_cell_detector_stream(
    pages: DataFrame,
    bounds: Bounds,
    cell_level: int = 8,
    half_life_s: float = 600.0,
    hot_rate: float = 1000.0,
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-cell exponentially-decayed arrival counter with a hot flag.

    Built-in watermarked window counts (:func:`hot_cell_counts_stream`)
    forget a cell entirely once its window closes; skew detection wants a
    RUNNING rate with smooth decay across micro-batches, which needs
    user-defined state: state per cell = (decayed_count, last_event_ts_s);
    each micro-batch decays the carried count by 2^(-dt/half_life) and
    adds the batch's arrivals. Emits one row per (cell, micro-batch) with
    the decayed rate and ``is_hot = rate > hot_rate`` — the streaming
    analog of operators/skew.hot_cell_keys, feeding salt decisions for
    the next batch tiling run.

    State is one tiny tuple per cell (bounded by 4^cell_level, in practice
    by the crawl's spatial footprint); grouping is on the cell key, so the
    shuffle matches the batch pipeline's partitioning.
    """
    import pandas as pd

    keyed = with_cell_keys(pages.select("url", "warc_ts", "lon", "lat"),
                           bounds, cell_level)
    out_schema = (
        "cell_x long, cell_y long, decayed_count double, "
        "batch_rows long, is_hot boolean"
    )
    state_schema = "decayed_count double, last_ts_s double"

    def _detect(key, pdfs, state):
        n = 0
        max_ts = None
        for pdf in pdfs:
            n += len(pdf)
            ts = pd.to_datetime(pdf["warc_ts"]).max()
            if max_ts is None or ts > max_ts:
                max_ts = ts
        now_s = max_ts.timestamp() if max_ts is not None else 0.0
        if state.exists:
            prev_count, prev_ts = state.get
            dt = max(now_s - prev_ts, 0.0)
            carried = prev_count * (0.5 ** (dt / half_life_s))
        else:
            carried, prev_ts = 0.0, now_s
        total = carried + n
        state.update((float(total), float(max(now_s, prev_ts))))
        yield pd.DataFrame(
            {
                "cell_x": [int(key[0])],
                "cell_y": [int(key[1])],
                "decayed_count": [float(total)],
                "batch_rows": [n],
                "is_hot": [bool(total > hot_rate)],
            }
        )

    return keyed.groupBy("cell_x", "cell_y").applyInPandasWithState(
        _detect, out_schema, state_schema, "append", "NoTimeout"
    )
