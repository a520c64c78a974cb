"""Structured Streaming ingestion (engine extension; no reference analog).

The reference is a batch CLI (SURVEY.md §2.8 — no streaming surface). The
engine adds a thin streaming front-end for continuously-arriving page
crawls: a file-source stream of pages parquet -> the same stage-0/1
projection + cell encode -> either (a) an append sink of encoded instances
partitioned by coarse cell (the batch pipeline then tiles snapshots), or
(b) a watermarked per-cell rolling count used for hot-cell monitoring.

Kept deliberately small: tiling itself stays batch (the reference's output
contract — availability bitmaps + tileset.json — is a consistent snapshot,
not an incremental stream; Iceberg-style snapshot tables are the resume
mechanism, SURVEY.md §2.8).
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
