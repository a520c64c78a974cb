"""End-to-end export pipeline tests: full run, outputs, resume, invariants."""

import json
import os

import pytest
from pyspark.sql import functions as F

from i3dm_export_spark.config import ExportOptions
from i3dm_export_spark.plans import pipeline
from i3dm_export_spark.sources.pages import pages_df


@pytest.fixture(scope="module")
def export_result(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    pages = pages_df(spark, 2500, scenario="A")
    opts = ExportOptions(max_features_per_tile=100, max_level=12, use_i3dm=True)
    summary = pipeline.run_export(pages, opts, str(out))
    return out, summary


class TestEndToEnd:
    def test_summary_counts(self, export_result):
        out, s = export_result
        assert s["n_instances"] == 2500
        assert s["n_content_tiles"] > 0
        assert s["n_subtree_files"] >= 1
        assert s["text_invariant_violations"] == 0
        assert s["available_levels"] >= 4

    def test_content_files_on_disk(self, export_result):
        out, s = export_result
        files = os.listdir(out / "content")
        assert len(files) == s["n_content_tiles"]
        assert all(f.endswith(".i3dm") for f in files)
        # spot-check one payload round-trips
        from i3dm_export_spark.operators.encode import parse_i3dm

        with open(out / "content" / sorted(files)[0], "rb") as f:
            ft, _, _, payload = parse_i3dm(f.read())
        assert ft["INSTANCES_LENGTH"] > 0
        assert "RTC_CENTER" in ft

    def test_subtree_files_on_disk(self, export_result):
        out, s = export_result
        files = os.listdir(out / "subtrees")
        assert len(files) == s["n_subtree_files"]
        assert "0_0_0.subtree" in files

    def test_tileset_json(self, export_result):
        out, s = export_result
        with open(out / "tileset.json") as f:
            ts = json.load(f)
        assert ts["root"]["implicitTiling"]["availableLevels"] == s["available_levels"]
        assert ts["root"]["content"]["uri"] == "content/{level}_{x}_{y}.i3dm"
        region = ts["root"]["boundingVolume"]["region"]
        assert len(region) == 6
        # radians: lon ~34 deg = 0.593 rad
        assert 0.5 < region[0] < 0.7

    def test_per_tile_counts_match_files(self, export_result):
        out, s = export_result
        # content tile count equals the tree's content_available tiles
        ckpt_tiles = os.path.join(out, "_checkpoints", "stage2_tiles")
        import duckdb

        n = duckdb.sql(
            f"select count(*) from parquet_scan('{ckpt_tiles}/*.parquet') where content_available"
        ).fetchone()[0]
        assert n == s["n_content_tiles"]


class TestResume:
    def test_resume_skips_completed_stages(self, spark, tmp_path):
        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=10)
        out = tmp_path / "exp"
        s1 = pipeline.run_export(pages, opts, str(out))
        # re-run: all stages must reload (wall_ms recorded once; done markers
        # unchanged) and results identical
        mtimes = {
            f: os.path.getmtime(os.path.join(out, "_checkpoints", "_lineage", f))
            for f in os.listdir(out / "_checkpoints" / "_lineage")
            if f.endswith(".done.json")
        }
        s2 = pipeline.run_export(pages, opts, str(out))
        for f, t in mtimes.items():
            assert os.path.getmtime(os.path.join(out, "_checkpoints", "_lineage", f)) == t
        assert s1["n_content_tiles"] == s2["n_content_tiles"]
        assert s1["n_tiles_recorded"] == s2["n_tiles_recorded"]

    def test_lineage_metrics_recorded(self, spark, tmp_path):
        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=10)
        s = pipeline.run_export(pages, opts, str(tmp_path / "exp2"))
        stages = {m["stage"] for m in s["stage_metrics"]}
        assert {"stage0_instances", "stage2_tiles",
                "stage3_assigned", "stage4_payloads",
                "stage5_subtrees"} <= stages
        # stage 1 is opt-in (fused default computes ECEF in the encoder)
        assert "stage1_encoded" not in stages
        for m in s["stage_metrics"]:
            assert m["n_rows"] > 0
            assert m["n_bytes"] > 0


class TestClusteredExport:
    def test_clustered_tiles_capped(self, spark, tmp_path):
        pages = pages_df(spark, 2500, scenario="A")
        opts = ExportOptions(
            max_features_per_tile=100, max_level=12, use_clustering=True
        )
        s = pipeline.run_export(pages, opts, str(tmp_path / "exp3"), write_content=False)
        ckpt = os.path.join(tmp_path / "exp3", "_checkpoints", "stage4_payloads")
        import duckdb

        mx = duckdb.sql(
            f"select max(n_instances) from parquet_scan('{ckpt}/*.parquet')"
        ).fetchone()[0]
        assert mx <= 100
        # clustering doubles up: interior over-full tiles also carry content
        assert s["n_content_tiles"] > 25  # 2500/100 leaves alone would be ~25


class TestDistributedSinks:
    def test_write_binary_files_idempotent(self, spark, tmp_path):
        from i3dm_export_spark.plans import sinks

        df = spark.createDataFrame(
            [("a/x.bin", bytearray(b"hello")), ("y.bin", bytearray(b"\x00\x01"))],
            "relpath string, payload binary",
        )
        root = tmp_path / "sink"
        n = sinks.write_binary_files(df, str(root), manifest_path=str(tmp_path / "m"))
        assert n == 2
        assert (root / "a" / "x.bin").read_bytes() == b"hello"
        assert (root / "y.bin").read_bytes() == b"\x00\x01"
        # second run: same files, same manifest count, no temp litter
        n2 = sinks.write_binary_files(df, str(root), manifest_path=str(tmp_path / "m"))
        assert n2 == 2
        assert (root / "a" / "x.bin").read_bytes() == b"hello"
        leftovers = [p for p in root.rglob("*.tmp.*")]
        assert leftovers == []

    def test_stale_same_size_file_is_rewritten(self, spark, tmp_path):
        """ADVICE r2: payload size is set by instance count / batch-table
        shape, not values — a pre-existing file of the SAME LENGTH but
        different bytes (stale tile from an earlier export of changed
        data) must be replaced, not size-skipped."""
        from i3dm_export_spark.plans import sinks

        root = tmp_path / "sink"
        root.mkdir()
        (root / "t.bin").write_bytes(b"STALE")  # same length as "FRESH"
        df = spark.createDataFrame(
            [("t.bin", bytearray(b"FRESH"))], "relpath string, payload binary"
        )
        sinks.write_binary_files(df, str(root))
        assert (root / "t.bin").read_bytes() == b"FRESH"

    def test_manifest_records_content_hash(self, spark, tmp_path):
        import hashlib

        from i3dm_export_spark.plans import sinks

        df = spark.createDataFrame(
            [("h.bin", bytearray(b"payload"))], "relpath string, payload binary"
        )
        sinks.write_binary_files(
            df, str(tmp_path / "s"), manifest_path=str(tmp_path / "m")
        )
        row = spark.read.parquet(str(tmp_path / "m")).collect()[0]
        assert row["content_md5"] == hashlib.md5(b"payload").hexdigest()

    def test_footer_stats_extent_requires_bare_scan(self, spark):
        """ADVICE r2: inputFiles() reflects the SOURCE; the metadata-only
        extent path must engage only when the frame is a bare (possibly
        column-pruned) scan of those files."""
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert pipeline._is_bare_scan(df)
        assert pipeline._is_bare_scan(df.select("doc_id", "lang"))
        assert not pipeline._is_bare_scan(df.filter("doc_id > 10"))
        assert not pipeline._is_bare_scan(
            df.select((df.n_chars * 2).alias("n_chars"), "lang")
        )
        assert not pipeline._is_bare_scan(spark.range(10))

    def test_filtered_frame_gets_filtered_bounds(self, spark, tmp_path):
        """End-to-end: run_export on a PRE-FILTERED frame must compute the
        root region from the filtered rows (compute_bounds fallback), not
        the parquet footer stats of the full source."""
        import json

        pages = pages_df(spark, 400, scenario="A")
        src = tmp_path / "pages_src"
        pages.write.parquet(str(src))
        stored = spark.read.parquet(str(src))
        med = stored.approxQuantile("lon", [0.5], 0.0)[0]
        filtered = stored.filter(F.col("lon") > med)
        opts = ExportOptions(max_features_per_tile=100, max_level=8)
        out = tmp_path / "exp_filtered"
        pipeline.run_export(filtered, opts, str(out), write_content=False)
        ts = json.loads((out / "tileset.json").read_text())
        region = ts["root"]["boundingVolume"]["region"]
        import math

        min_lon_deg = math.degrees(region[0])
        full_min = stored.agg(F.min("lon")).collect()[0][0]
        # root region must start near the filtered min (> median), far from
        # the full-source min
        assert min_lon_deg > full_min + 0.5 * (med - full_min)

    def test_resume_after_input_mutation_fails_loudly(self, spark, tmp_path):
        """VERDICT r2 item 9: the parquet-fallback snapshot pin. A resume
        whose INPUT FILES changed since the checkpoints were written must
        raise StaleCheckpointError, not silently reuse stale stages."""
        from i3dm_export_spark.plans.checkpoint import StaleCheckpointError

        src = tmp_path / "src"
        pages_df(spark, 300, scenario="A").write.parquet(str(src))
        stored = spark.read.parquet(str(src))
        out = tmp_path / "exp_stale"
        opts = ExportOptions(max_features_per_tile=100, max_level=8)
        pipeline.run_export(stored, opts, str(out), write_content=False)

        # mutate the input in place (different rows, new files)
        pages_df(spark, 500, scenario="A").write.mode("overwrite").parquet(
            str(src)
        )
        stored2 = spark.read.parquet(str(src))
        with pytest.raises(StaleCheckpointError, match="different input"):
            pipeline.run_export(stored2, opts, str(out), write_content=False)

    def test_export_never_materializes_on_driver(self, spark, tmp_path, monkeypatch):
        """K1/K3 plan gate (VERDICT r1 items 1-2, 10): the export hot path
        must not pull payloads or the tile table through the driver."""
        from pyspark.sql import DataFrame

        def _boom(name):
            def _f(self, *a, **k):
                raise AssertionError(f"driver materialization via {name} in export path")
            return _f

        monkeypatch.setattr(DataFrame, "toLocalIterator", _boom("toLocalIterator"))
        monkeypatch.setattr(DataFrame, "toPandas", _boom("toPandas"))
        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=10)
        s = pipeline.run_export(pages, opts, str(tmp_path / "exp_gate"))
        assert s["n_content_tiles"] > 0
        assert s["n_subtree_files"] >= 1


class TestTextInvariantModes:
    def test_full_join_mode_agrees_with_agg(self, spark, tmp_path):
        pages = pages_df(spark, 300, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=8)
        s_full = pipeline.run_export(
            pages, opts, str(tmp_path / "f"), write_content=False,
            text_invariant="full",
        )
        s_agg = pipeline.run_export(
            pages, opts, str(tmp_path / "a"), write_content=False,
            text_invariant="agg",
        )
        assert s_full["text_invariant_violations"] == 0
        assert s_agg["text_invariant_violations"] == 0


class TestFusedVsPrecomputedEcef:
    def test_payloads_byte_identical(self, spark, tmp_path):
        """precompute_ecef=True (stage-1 checkpoint) and the fused default
        must write byte-identical tile payloads — same ECEF float64 kernel
        either way, including the clustering metric."""
        import duckdb

        pages = pages_df(spark, 1500, scenario="A")
        for name, pre in (("fused", False), ("pre", True)):
            opts = ExportOptions(
                max_features_per_tile=100, max_level=10, use_i3dm=True,
                use_clustering=True, precompute_ecef=pre,
            )
            pipeline.run_export(
                pages, opts, str(tmp_path / name), write_content=False
            )
        q = ("select level, x, y, md5(base64(payload)) h from parquet_scan('{}/"
             "_checkpoints/stage4_payloads/*.parquet') order by 1,2,3")
        a = duckdb.sql(q.format(tmp_path / "fused")).df()
        b = duckdb.sql(q.format(tmp_path / "pre")).df()
        assert a.equals(b)
        assert len(a) > 0


class TestPartialSinkResume:
    def test_deleted_file_restored_others_untouched(self, spark, tmp_path):
        """north_rule resume: after a kill that lost one tile file, a
        re-run restores ONLY the missing file — completed tiles are
        skipped (size-match fast path), stages reload from checkpoints."""
        import time

        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=10,
                             use_i3dm=True)
        out = tmp_path / "exp"
        pipeline.run_export(pages, opts, str(out))
        content = out / "content"
        files = sorted(os.listdir(content))
        assert len(files) >= 2
        victim = files[0]
        (content / victim).unlink()
        mtimes = {f: os.path.getmtime(content / f) for f in files[1:]}
        time.sleep(1.1)  # mtime resolution guard
        pipeline.run_export(pages, opts, str(out))
        assert os.path.exists(content / victim)
        for f, t in mtimes.items():
            assert os.path.getmtime(content / f) == t, f
