"""Incremental append (plans/incremental.py): byte parity with a
from-scratch export of the union, dirty-tile economics (untouched files
stay untouched on disk), checkpoint refresh across successive appends,
and the loud degradation paths."""

import json
import os

import pytest

from i3dm_export_spark.config import Bounds, ExportOptions
from i3dm_export_spark.plans.incremental import (
    IncrementalRebuildRequired,
    incremental_append,
)
from i3dm_export_spark.plans.pipeline import run_export
from i3dm_export_spark.sources.pages import DOCS_BBOX, pages_df

BB = Bounds(*DOCS_BBOX)
OPTS = ExportOptions(max_features_per_tile=60, max_level=8, use_i3dm=True)


def _split(spark, n_total, n_base):
    """Deterministic disjoint base/append batches: the synthesized pages
    are a pure function of the row index, so filtering the SAME n_total
    frame by url reproduces an exact partition of the union."""
    full = pages_df(spark, n_total)
    urls = sorted(r["url"] for r in full.select("url").collect())
    cut = urls[n_base]
    return full.filter(f"url < '{cut}'"), full.filter(f"url >= '{cut}'"), full


def _tree_files(root):
    out = {}
    for sub in ("content", "subtrees"):
        d = os.path.join(root, sub)
        for fn in sorted(os.listdir(d)):
            with open(os.path.join(d, fn), "rb") as f:
                out[f"{sub}/{fn}"] = f.read()
    with open(os.path.join(root, "tileset.json")) as f:
        out["tileset.json"] = f.read()
    return out


class TestIncrementalParity:
    def test_append_matches_full_rebuild_bytes(self, spark, tmp_path):
        base, batch, full = _split(spark, 900, 750)

        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)

        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)

        # snapshot mtimes before the append to prove clean files untouched
        pre_mtime = {
            fn: os.stat(os.path.join(out_incr, "content", fn)).st_mtime_ns
            for fn in os.listdir(os.path.join(out_incr, "content"))
        }

        summary = incremental_append(batch, out_incr)

        want = _tree_files(out_full)
        got = _tree_files(out_incr)
        assert set(want) == set(got)
        diff = [k for k in want if want[k] != got[k]]
        assert diff == []

        # economics: the localized append must not re-encode everything
        assert 0 < summary["n_dirty_tiles"] < summary["n_content_tiles"]
        untouched = [
            fn
            for fn, m in pre_mtime.items()
            if os.path.exists(os.path.join(out_incr, "content", fn))
            and os.stat(os.path.join(out_incr, "content", fn)).st_mtime_ns == m
        ]
        assert untouched, "every pre-existing tile file was rewritten"

    def test_two_successive_appends(self, spark, tmp_path):
        """The checkpoint refresh must leave a diffable state: A + B + C
        equals a from-scratch A∪B∪C."""
        full = pages_df(spark, 1000)
        urls = sorted(r["url"] for r in full.select("url").collect())
        a = full.filter(f"url < '{urls[800]}'")
        b = full.filter(f"url >= '{urls[800]}' and url < '{urls[920]}'")
        c = full.filter(f"url >= '{urls[920]}'")

        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)

        out_incr = str(tmp_path / "incr")
        run_export(a, OPTS, out_incr, bounds=BB)
        incremental_append(b, out_incr)
        s2 = incremental_append(c, out_incr)

        assert _tree_files(out_full) == _tree_files(out_incr)
        assert s2["n_instances"] == 1000

    def test_manifest_stays_consistent(self, spark, tmp_path):
        """After an append, the merged manifest matches the on-disk file
        set exactly (names and byte sizes)."""
        base, batch, _ = _split(spark, 700, 600)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        incremental_append(batch, out)

        mani = {
            r["relpath"]: r["n_bytes"]
            for r in spark.read.parquet(
                os.path.join(out, "_checkpoints", "_sink_manifests", "content")
            ).collect()
        }
        disk = {
            fn: os.path.getsize(os.path.join(out, "content", fn))
            for fn in os.listdir(os.path.join(out, "content"))
            if fn.endswith(".i3dm")
        }
        assert mani == disk


    def test_localized_append_reassembles_few_subtrees(self, spark, tmp_path):
        """A spatially-localized append must reassemble only the subtrees
        whose bit-relevant tile rows changed — a strict subset — while
        still matching the from-scratch union bytes, and the subtrees
        manifest must keep covering every file on disk."""
        full = pages_df(spark, 900)
        base = full.filter("lon < 34.09")
        batch = full.filter("lon >= 34.09")

        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)

        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)

        summary = incremental_append(batch, out_incr)

        assert _tree_files(out_full) == _tree_files(out_incr)
        assert 0 < summary["n_dirty_subtrees"] < summary["n_subtree_files"]

        mani = {
            r["relpath"]: r["n_bytes"]
            for r in spark.read.parquet(
                os.path.join(out_incr, "_checkpoints", "_sink_manifests",
                             "subtrees")
            ).collect()
        }
        disk = {
            fn: os.path.getsize(os.path.join(out_incr, "subtrees", fn))
            for fn in os.listdir(os.path.join(out_incr, "subtrees"))
        }
        assert mani == disk


class TestIncrementalGuards:
    def test_out_of_bounds_append_degrades_loudly(self, spark, tmp_path):
        base, batch, _ = _split(spark, 500, 450)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        shift = BB.xmax - BB.xmin + 1.0
        rogue = batch.withColumn("lon", batch["lon"] + shift)
        with pytest.raises(IncrementalRebuildRequired, match="outside"):
            incremental_append(rogue, out)

    def test_changed_opts_degrade_loudly(self, spark, tmp_path):
        base, batch, _ = _split(spark, 500, 450)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        other = ExportOptions(max_features_per_tile=10, max_level=8,
                              use_i3dm=True)
        with pytest.raises(IncrementalRebuildRequired, match="options"):
            incremental_append(batch, out, opts=other)

    def test_missing_base_export_degrades_loudly(self, spark, tmp_path):
        _, batch, _ = _split(spark, 500, 450)
        with pytest.raises(IncrementalRebuildRequired):
            incremental_append(batch, str(tmp_path / "nowhere"))

    @staticmethod
    def _interior_split(spark, n=700, k=50):
        """(base, batch): batch strictly inside base's lon/lat extent, so
        computed union bounds equal computed base bounds exactly."""
        from pyspark.sql import functions as F

        full = pages_df(spark, n)
        rows = full.select("url", "lon", "lat").collect()
        lons = sorted(r["lon"] for r in rows)
        lats = sorted(r["lat"] for r in rows)
        lo1, lo2 = lons[n // 5], lons[4 * n // 5]
        la1, la2 = lats[n // 5], lats[4 * n // 5]
        interior = [
            r["url"] for r in rows
            if lo1 < r["lon"] < lo2 and la1 < r["lat"] < la2
        ][:k]
        return (
            full.filter(~F.col("url").isin(interior)),
            full.filter(F.col("url").isin(interior)),
            full,
        )

    def test_z_outside_extent_degrades_loudly(self, spark, tmp_path):
        """ADVICE r3: with COMPUTED base bounds, an appended z outside the
        base z-range would shift the from-scratch union's region zmin/zmax
        — the append must refuse, not silently break byte parity."""
        from pyspark.sql import functions as F

        base, batch, _ = self._interior_split(spark)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out)  # bounds computed from data
        rogue = batch.withColumn("z", F.lit(25.0))
        with pytest.raises(IncrementalRebuildRequired, match="z-range"):
            incremental_append(rogue, out)

    def test_computed_bounds_interior_append_byte_parity(self, spark, tmp_path):
        """Byte parity WITHOUT pinned bounds: an interior batch leaves the
        computed union extent identical, so append == full rebuild."""
        base, batch, full = self._interior_split(spark)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr)
        incremental_append(batch, out_incr)
        assert _tree_files(out_full) == _tree_files(out_incr)

    def test_post_append_resume_keeps_input_pinning(self, spark, tmp_path):
        """VERDICT r3 item 7: after an append the refreshed checkpoints
        hold union state matching no single input — a later run_export
        resume over file-backed input must raise StaleCheckpointError
        (mutated or not), never silently serve union-state stages."""
        from i3dm_export_spark.plans.checkpoint import StaleCheckpointError

        base, batch, _ = _split(spark, 500, 450)
        base_path = str(tmp_path / "base_pq")
        batch_path = str(tmp_path / "batch_pq")
        base.write.parquet(base_path)
        batch.write.parquet(batch_path)

        out = str(tmp_path / "o")
        run_export(spark.read.parquet(base_path), OPTS, out, bounds=BB)
        incremental_append(spark.read.parquet(batch_path), out)

        # mutate the base input in place (one row fewer, new file stats)
        cut = base.select("url").orderBy("url").limit(1).collect()[0]["url"]
        mutated = base.filter(base["url"] != cut).localCheckpoint()
        mutated.write.mode("overwrite").parquet(base_path)
        with pytest.raises(StaleCheckpointError):
            run_export(spark.read.parquet(base_path), OPTS, out, bounds=BB)

    def test_stage0_refresh_is_additive(self, spark, tmp_path):
        """The refreshed stage-0 checkpoint must reuse the base's data
        files by hard link (same inode — zero corpus bytes rewritten) and
        add only batch files: the Iceberg-fast-append analogue that keeps
        append cost O(batch), not O(corpus)."""
        base, batch, _ = _split(spark, 700, 600)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        s0 = os.path.join(out, "_checkpoints", "stage0_instances")

        def data_files(d):
            return {
                f: os.stat(os.path.join(d, f)).st_ino
                for f in os.listdir(d) if not f.startswith(("_", "."))
            }

        before = data_files(s0)
        incremental_append(batch, out)
        after = data_files(s0)
        assert set(before) <= set(after), "base data files were dropped"
        for f, ino in before.items():
            assert after[f] == ino, f"base file {f} was rewritten, not linked"
        assert any(f.startswith("batch-") for f in after)
        assert spark.read.parquet(s0).count() == 700

    def test_preprojected_base_append_byte_parity(self, spark, tmp_path):
        """A base export over an already-projected durable instance table
        takes the stage-0 shortcut (no stage0 checkpoint — the source IS
        the durable copy, the bench/e2e path); the append must
        reconstruct the base from the recorded source files and stay
        byte-par with the full rebuild."""
        from i3dm_export_spark.plans.pipeline import stage0_instances

        base, batch, full = _split(spark, 700, 600)
        base_path = str(tmp_path / "base_inst")
        stage0_instances(base).write.parquet(base_path)
        base_pre = spark.read.parquet(base_path)

        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base_pre, OPTS, out_incr, bounds=BB)
        assert not os.path.exists(
            os.path.join(out_incr, "_checkpoints", "_lineage",
                         "stage0_instances.done.json")
        ), "preprojected shortcut did not engage — test premise broken"

        s = incremental_append(batch, out_incr)
        assert _tree_files(out_full) == _tree_files(out_incr)
        assert s["n_instances"] == 700

    def test_preprojected_base_mutation_fails_loudly(self, spark, tmp_path):
        """ADVICE r4 #3: the preprojected path reads the source files
        directly; if they were replaced since the export, the append must
        raise instead of diffing against data that no longer matches
        stage3_assigned."""
        from i3dm_export_spark.plans.pipeline import stage0_instances

        base, batch, _full = _split(spark, 700, 600)
        base_path = str(tmp_path / "base_inst")
        stage0_instances(base).write.parquet(base_path)
        base_pre = spark.read.parquet(base_path)

        out = str(tmp_path / "incr")
        run_export(base_pre, OPTS, out, bounds=BB)
        # mutate the durable source AFTER the export, keeping the recorded
        # paths valid parquet: clobber one part file with another (content,
        # size and mtime change; a wholesale path change would already fail
        # via PATH_NOT_FOUND — this is the silent case the guard is for)
        import shutil

        parts = sorted(
            f for f in os.listdir(base_path) if f.endswith(".parquet")
        )
        assert len(parts) >= 2, "need two part files to cross-clobber"
        shutil.copy2(os.path.join(base_path, parts[0]),
                     os.path.join(base_path, parts[1]))
        with pytest.raises(IncrementalRebuildRequired,
                           match="preprojected source files changed"):
            incremental_append(batch, out)


class TestCliAppend:
    def test_cli_append_flag(self, spark, tmp_path):
        """--append routes -c through incremental_append against the
        recorded base export; bytes match a from-scratch CLI export of
        the union."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from i3dm_export_spark.__main__ import main
        from i3dm_export_spark.sources.pages import synthesize_pages

        pdf = synthesize_pages(600)
        lo_q = pdf["lon"].quantile(0.2), pdf["lon"].quantile(0.8)
        la_q = pdf["lat"].quantile(0.2), pdf["lat"].quantile(0.8)
        interior = (
            (pdf["lon"] > lo_q[0]) & (pdf["lon"] < lo_q[1])
            & (pdf["lat"] > la_q[0]) & (pdf["lat"] < la_q[1])
        )
        batch = pdf[interior].head(40)
        base = pdf.drop(batch.index)

        p_full = str(tmp_path / "full.parquet")
        p_base = str(tmp_path / "base.parquet")
        p_batch = str(tmp_path / "batch.parquet")
        schema = pa.schema([
            ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()), ("text", pa.string()),
            ("lang", pa.string()), ("lon", pa.float64()),
            ("lat", pa.float64()), ("z", pa.float64()),
            ("scale", pa.float64()), ("yaw", pa.float64()),
            ("pitch", pa.float64()), ("roll", pa.float64()),
            ("model", pa.string()), ("tags", pa.string()),
        ])
        for frame, path in ((pdf, p_full), (base, p_base), (batch, p_batch)):
            # Spark cannot read TIMESTAMP(NANOS) and the all-None tags
            # column must stay a STRING column, hence the explicit schema
            frame = frame.assign(warc_ts=frame["warc_ts"].dt.tz_convert("UTC")
                               .dt.tz_localize(None).astype("datetime64[us]"))
            pq.write_table(
                pa.Table.from_pandas(frame, preserve_index=False,
                                     schema=schema), path
            )

        common = ["--use_i3dm", "--max_features_per_tile", "60",
                  "--max_level", "8"]
        out_full = str(tmp_path / "out_full")
        main(["-c", p_full, "-o", out_full, *common], spark=spark)

        out_incr = str(tmp_path / "out_incr")
        main(["-c", p_base, "-o", out_incr, *common], spark=spark)
        summary = main(["-c", p_batch, "-o", out_incr, "--append", *common],
                       spark=spark)
        assert summary["n_new_instances"] == 40
        assert summary["n_instances"] == 600

        # content parity is the sharp check; tileset region derives from
        # the BASE bounds (by design: appends never move the root), so
        # compare content + subtree payload maps keyed by name
        def files(root, sub):
            d = os.path.join(root, sub)
            return {
                fn: open(os.path.join(d, fn), "rb").read()
                for fn in sorted(os.listdir(d))
            }

        # full rebuild computed bounds from the union == base bounds here
        # (the appended rows are interior), so full parity must hold
        assert files(out_full, "content") == files(out_incr, "content")
        assert files(out_full, "subtrees") == files(out_incr, "subtrees")


class TestDirtyTilesProperty:
    from hypothesis import given, settings, strategies as st

    _assign = st.dictionaries(
        st.integers(min_value=0, max_value=30).map(lambda i: f"u{i}"),
        st.tuples(st.integers(2, 3), st.integers(0, 3), st.integers(0, 3)),
        max_size=20,
    )

    @given(old=_assign, new=_assign)
    @settings(max_examples=8, deadline=None)
    def test_dirty_set_is_exactly_changed_keys(self, spark, old, new):
        """dirty_tiles == the tiles (old and new side) of every url whose
        assignment changed, appeared, or disappeared — no more, no less."""
        from i3dm_export_spark.plans.incremental import dirty_tiles

        def df(d):
            rows = [(u, l, x, y) for u, (l, x, y) in sorted(d.items())]
            return spark.createDataFrame(
                rows or [("_", 0, 0, 0)],
                "url string, level int, x int, y int",
            ).filter("url != '_'")

        got = {
            (r["level"], r["x"], r["y"])
            for r in dirty_tiles(df(old), df(new)).collect()
        }
        want = set()
        for u in set(old) | set(new):
            if old.get(u) != new.get(u):
                if u in old:
                    want.add(old[u])
                if u in new:
                    want.add(new[u])
        assert got == want


class TestIncrementalClusteredParity:
    def test_append_matches_full_rebuild_with_clustering(self, spark, tmp_path):
        """The LOD-reduce path (seeded per-tile k-means + salting) is a
        deterministic function of each tile's member set, so dirty-tile
        re-encode under use_clustering must still match a full rebuild."""
        opts = ExportOptions(max_features_per_tile=40, max_level=8,
                             use_i3dm=True, use_clustering=True)
        base, batch, full = _split(spark, 700, 600)

        out_full = str(tmp_path / "full")
        run_export(full, opts, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, opts, out_incr, bounds=BB)
        incremental_append(batch, out_incr)

        assert _tree_files(out_full) == _tree_files(out_incr)


class TestIncrementalGpuParity:
    def test_append_matches_full_rebuild_gpu_glb(self, spark, tmp_path):
        """GPU-glb payloads (EXT_mesh_gpu_instancing + binary property
        tables) are also a deterministic function of the member set."""
        opts = ExportOptions(max_features_per_tile=60, max_level=8,
                             use_gpu_instancing=True)
        base, batch, full = _split(spark, 600, 520)

        out_full = str(tmp_path / "full")
        run_export(full, opts, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, opts, out_incr, bounds=BB)
        incremental_append(batch, out_incr)

        assert _tree_files(out_full) == _tree_files(out_incr)


class TestDeltaPath:
    """The sub-linear refresh (VERDICT r4 item 1): counts merge + descent
    instead of a corpus groupBy, reassignment of batch + flipped-covered
    rows only, and a stage-3 refresh that hard-links every clean file."""

    def test_fresh_export_append_takes_delta_path(self, spark, tmp_path):
        base, batch, full = _split(spark, 900, 750)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)

        s3 = os.path.join(out_incr, "_checkpoints", "stage3_assigned")
        pre_ino = {
            f: os.stat(os.path.join(s3, f)).st_ino
            for f in os.listdir(s3)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        }
        summary = incremental_append(batch, out_incr)

        assert summary["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)
        # stage-3 economics: clean base files survive as hard links of the
        # SAME inodes (zero corpus bytes rewritten for the clean region)
        assert summary["n_stage3_linked_files"] > 0
        post_ino = {
            f: os.stat(os.path.join(s3, f)).st_ino
            for f in os.listdir(s3)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        }
        linked = [f for f, ino in pre_ino.items() if post_ino.get(f) == ino]
        assert len(linked) == summary["n_stage3_linked_files"]

    def test_pre_r5_base_falls_back_then_upgrades(self, spark, tmp_path):
        """A base export lacking the stage2_cellcounts checkpoint (pre-r5
        layout) must fall back to the legacy full rebuild — same bytes —
        and write the counts in passing so the NEXT append goes delta."""
        import shutil

        full = pages_df(spark, 1000)
        urls = sorted(r["url"] for r in full.select("url").collect())
        a = full.filter(f"url < '{urls[800]}'")
        b = full.filter(f"url >= '{urls[800]}' and url < '{urls[920]}'")
        c = full.filter(f"url >= '{urls[920]}'")

        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(a, OPTS, out_incr, bounds=BB)

        ckpt_root = os.path.join(out_incr, "_checkpoints")
        shutil.rmtree(os.path.join(ckpt_root, "stage2_cellcounts"))
        for aux in ("_lineage/stage2_cellcounts.done.json",):
            p = os.path.join(ckpt_root, aux)
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(
            os.path.join(ckpt_root, "_lineage", "stage2_cellcounts"),
            ignore_errors=True,
        )

        s1 = incremental_append(b, out_incr)
        assert s1["delta_path"] is False
        s2 = incremental_append(c, out_incr)
        assert s2["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)

    def test_distributed_twin_byte_parity(self, spark, tmp_path, monkeypatch):
        """Beyond _MAX_DRIVER_CELLS the delta path switches to the
        cells-granularity Spark twin (distributed counts merge, distributed
        descent, full-outer flipped diff). Forcing the budget to 0 routes
        every step through it — bytes must still match a full rebuild."""
        from i3dm_export_spark.plans import incremental as incr

        monkeypatch.setattr(incr, "_MAX_DRIVER_CELLS", 0)
        base, batch, full = _split(spark, 900, 750)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)
        s = incremental_append(batch, out_incr)
        assert s["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)

    def test_tile_granularity_spark_twins_byte_parity(
        self, spark, tmp_path, monkeypatch
    ):
        """The r5 driver fast paths gated on _MAX_DRIVER_TILES (pandas
        manifest merges, numpy changed-roots) and _MAX_DRIVER_UNLINKS
        (thread-pool unlinks) are latency optimizations with distributed
        Spark twins behind the budgets; forcing both to 0 routes those
        steps through the twins — bytes must still match a full rebuild.
        (The pyarrow stage-2 writes key on the CELL budget and are
        exercised by test_distributed_twin_byte_parity instead.)"""
        from i3dm_export_spark.plans import incremental as incr

        monkeypatch.setattr(incr, "_MAX_DRIVER_TILES", 0)
        monkeypatch.setattr(incr, "_MAX_DRIVER_UNLINKS", 0)
        base, batch, full = _split(spark, 900, 750)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)
        s = incremental_append(batch, out_incr)
        assert s["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)

    def test_driver_roots_spark_assembly_byte_parity(
        self, spark, tmp_path, monkeypatch
    ):
        """Changed-root diff on the driver but the subtree-write budget at
        0: affected roots flow into build_subtrees_spark via
        createDataFrame and files are written by the executor sink —
        bytes must match a full rebuild."""
        from i3dm_export_spark.plans import incremental as incr

        monkeypatch.setattr(incr, "_MAX_DRIVER_SUBTREE_WRITES", 0)
        base, batch, full = _split(spark, 900, 750)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)
        s = incremental_append(batch, out_incr)
        assert s["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)

    def test_driver_unlink_threshold_routes_distributed(
        self, spark, tmp_path, monkeypatch
    ):
        """With the manifest merge on the driver path but the unlink
        budget at 0, removals must still happen (via the executor-side
        mapInPandas) — no stale content file survives a split flip."""
        from i3dm_export_spark.plans import incremental as incr

        monkeypatch.setattr(incr, "_MAX_DRIVER_UNLINKS", 0)
        base, batch, full = _split(spark, 900, 700)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, OPTS, out_incr, bounds=BB)
        s = incremental_append(batch, out_incr)
        # parity implies every removed-tile file is gone and every
        # current file present, whichever unlink path ran
        assert _tree_files(out_full) == _tree_files(out_incr)
        assert s["n_removed_files"] >= 0

    def test_delta_engages_under_clustering(self, spark, tmp_path):
        """Clustering assigns an instance to its leaf AND every over-full
        ancestor (multi-row stage-3) — the covered-row dedup inside the
        delta refresh is what keeps parity here."""
        opts = ExportOptions(max_features_per_tile=40, max_level=8,
                             use_i3dm=True, use_clustering=True)
        base, batch, full = _split(spark, 700, 600)
        out_full = str(tmp_path / "full")
        run_export(full, opts, out_full, bounds=BB)
        out_incr = str(tmp_path / "incr")
        run_export(base, opts, out_incr, bounds=BB)
        s = incremental_append(batch, out_incr)
        assert s["delta_path"] is True
        assert _tree_files(out_full) == _tree_files(out_incr)


class TestIncrementalEdgeCases:
    def test_duplicate_url_append_degrades_loudly(self, spark, tmp_path):
        """An appended url that already exists would alias its old row in
        the assignment diff (same-tile copies look 'unchanged' and the
        tile would silently keep one instance); must raise instead."""
        base, batch, _ = _split(spark, 500, 450)
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        overlapping = base.limit(5).unionByName(batch)
        with pytest.raises(IncrementalRebuildRequired, match="already exist"):
            incremental_append(overlapping, out)

    def test_empty_batch_is_a_noop(self, spark, tmp_path):
        base = pages_df(spark, 400)
        batch = base.filter("url > 'z'")  # empty
        out = str(tmp_path / "o")
        run_export(base, OPTS, out, bounds=BB)
        pre = {
            fn: os.stat(os.path.join(out, "content", fn)).st_mtime_ns
            for fn in os.listdir(os.path.join(out, "content"))
        }
        summary = incremental_append(batch, out)
        assert summary["n_dirty_tiles"] == 0
        assert summary["n_new_instances"] == 0
        post = {
            fn: os.stat(os.path.join(out, "content", fn)).st_mtime_ns
            for fn in os.listdir(os.path.join(out, "content"))
        }
        assert pre == post
