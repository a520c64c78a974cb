"""Structured Streaming ingestion tests (availableNow trigger, file source)."""

import os

from i3dm_export_spark.config import Bounds
from i3dm_export_spark.sources.pages import DOCS_BBOX, synthesize_pages
from i3dm_export_spark.streaming import ingest


class TestStreamingIngest:
    def test_file_stream_roundtrip(self, spark, tmp_path):
        # drop two parquet files into the source dir
        src = tmp_path / "incoming"
        src.mkdir()
        import pyarrow as pa
        import pyarrow.parquet as pq

        for i, n in enumerate((300, 200)):
            pdf = synthesize_pages(n, scenario="A")
            pdf["warc_ts"] = pdf["warc_ts"].dt.tz_localize(None).astype("datetime64[us]")
            pdf["tags"] = pdf["tags"].astype("string")
            pq.write_table(pa.Table.from_pandas(pdf), src / f"drop{i}.parquet")

        pages = ingest.read_pages_stream(spark, str(src))
        assert pages.isStreaming
        enc = ingest.encoded_instances_stream(pages, Bounds(*DOCS_BBOX), cell_level=4)
        q = ingest.write_instances_stream(
            enc, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

        out = spark.read.parquet(str(tmp_path / "out"))
        assert out.count() == 500
        cols = set(out.columns)
        assert {"url", "text_fp", "cell_x", "cell_y"} <= cols
        assert "html" not in cols  # heavy column never enters the sink

    def test_hot_cell_counts_plan(self, spark, tmp_path):
        # the windowed agg compiles against a stream and is watermarked
        src = tmp_path / "in2"
        src.mkdir()
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = synthesize_pages(100, scenario="S")
        pdf["warc_ts"] = pdf["warc_ts"].dt.tz_localize(None).astype("datetime64[us]")
        pdf["tags"] = pdf["tags"].astype("string")
        pq.write_table(pa.Table.from_pandas(pdf), src / "d.parquet")

        pages = ingest.read_pages_stream(spark, str(src))
        counts = ingest.hot_cell_counts_stream(pages, Bounds(34.0, 44.0, 35.0, 45.0))
        q = (
            counts.writeStream.format("memory")
            .queryName("hot_cells")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(120)
        # append mode only emits closed windows; the plan executing without
        # error is the contract here (no wall-clock in the fixture closes
        # the watermark), so assert the query ran and the schema is right
        res = spark.sql("select * from hot_cells")
        assert {"window", "cell_x", "cell_y", "cnt"} <= set(res.columns)

    def test_stateful_hot_cell_detector(self, spark, tmp_path):
        """applyInPandasWithState: state carries decayed counts across
        micro-batches (maxFilesPerTrigger=1 -> one batch per file drop)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        src = tmp_path / "in3"
        src.mkdir()
        # two drops; skewed: most rows land in one cell
        for i in range(2):
            pdf = synthesize_pages(400, scenario="A")
            pdf["warc_ts"] = pdf["warc_ts"].dt.tz_localize(None).astype("datetime64[us]")
            pdf["tags"] = pdf["tags"].astype("string")
            # pack 90% of points into a single spot (one hot cell)
            hot = np.arange(len(pdf)) % 10 != 0
            pdf.loc[hot, "lon"] = 34.001
            pdf.loc[hot, "lat"] = 44.001
            pq.write_table(pa.Table.from_pandas(pdf), src / f"d{i}.parquet")

        pages = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1)
        det = ingest.hot_cell_detector_stream(
            pages, Bounds(34.0, 44.0, 34.1, 44.1), cell_level=4,
            half_life_s=3600.0, hot_rate=500.0,
        )
        q = (
            det.writeStream.format("memory")
            .queryName("hot_detector")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .start()
        )
        q.awaitTermination(180)
        res = spark.sql(
            "select * from hot_detector order by cell_x, cell_y, decayed_count"
        ).toPandas()
        assert len(res) > 0
        hot_cell = res[res["batch_rows"] >= 300]
        assert len(hot_cell) >= 2  # the hot cell appears in both batches
        # state accumulated: the second batch's decayed_count > one batch
        assert hot_cell["decayed_count"].max() > 500.0
        assert bool(hot_cell.iloc[-1]["is_hot"])
        # cold cells never flag
        cold = res[res["batch_rows"] < 100]
        assert not cold["is_hot"].any()


class TestStreamToBatchSnapshot:
    def test_streamed_instances_tile_identically_to_one_shot(self, spark, tmp_path):
        """The documented streaming->batch snapshot contract end to end:
        pages arrive as N parquet drops, the file-source stream appends
        encoded instances to a durable dir, and a batch export over the
        accumulated snapshot equals the one-shot export of the same rows."""
        import duckdb

        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.operators import extent
        from i3dm_export_spark.plans import pipeline
        from i3dm_export_spark.sources.pages import pages_df
        from i3dm_export_spark.streaming import ingest

        pages = pages_df(spark, 900, scenario="A")
        pdf = pages.toPandas()
        drops = tmp_path / "drops"
        drops.mkdir()
        for i in range(3):
            spark.createDataFrame(
                pdf.iloc[i * 300 : (i + 1) * 300], schema=pages.schema
            ).write.parquet(str(drops / f"batch_{i}.parquet"))

        bounds = extent.compute_bounds(pages)
        stream = ingest.read_pages_stream(spark, str(drops) + "/*")
        encoded = ingest.encoded_instances_stream(stream, bounds)
        q = ingest.write_instances_stream(
            encoded, str(tmp_path / "acc"), str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)

        acc = spark.read.parquet(str(tmp_path / "acc"))
        assert acc.count() == 900

        opts = ExportOptions(max_features_per_tile=100, max_level=10)
        pipeline.run_export(
            acc.drop("cell_x", "cell_y"), opts, str(tmp_path / "from_stream"),
            bounds=bounds, write_content=False,
        )
        pipeline.run_export(
            pages, opts, str(tmp_path / "one_shot"),
            bounds=bounds, write_content=False,
        )
        tq = ("select level, x, y, n_instances from parquet_scan('{}/"
              "_checkpoints/stage2_tiles/*.parquet') order by 1,2,3")
        a = duckdb.sql(tq.format(tmp_path / "from_stream")).df()
        b = duckdb.sql(tq.format(tmp_path / "one_shot")).df()
        assert a.equals(b)
        assert len(a) > 0
