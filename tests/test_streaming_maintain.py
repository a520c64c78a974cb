"""Streaming tile maintenance (streaming/maintain): foreachBatch appends.

Contracts under test:
* a page stream drained with availableNow applies every micro-batch as an
  incremental append, and the final export is BYTE-IDENTICAL to a
  from-scratch run_export over the union (transitively via the append
  parity contract, asserted directly here);
* replays are idempotent twice over — by the applied-batch marker, and by
  the content fallback when the marker write was lost (crash window);
* a genuine partial upsert still fails loudly.
"""
from __future__ import annotations

import json
import os

import pytest

from i3dm_export_spark.config import Bounds, ExportOptions
from i3dm_export_spark.plans.incremental import IncrementalRebuildRequired
from i3dm_export_spark.plans.pipeline import run_export
from i3dm_export_spark.sources.pages import DOCS_BBOX, pages_df
from i3dm_export_spark.streaming import maintain
from i3dm_export_spark.streaming.ingest import read_pages_stream

BB = Bounds(*DOCS_BBOX)
OPTS = ExportOptions(max_features_per_tile=60, max_level=8, use_i3dm=True)


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


def _three_way_split(spark, n_total, cuts=(600, 650)):
    full = pages_df(spark, n_total)
    urls = sorted(r["url"] for r in full.select("url").collect())
    c1, c2 = urls[cuts[0]], urls[cuts[1]]
    return (
        full.filter(f"url < '{c1}'"),
        full.filter(f"url >= '{c1}' and url < '{c2}'"),
        full.filter(f"url >= '{c2}'"),
        full,
    )


class TestStreamingMaintain:
    def test_streamed_appends_match_full_rebuild(self, spark, tmp_path):
        base, b1, b2, full = _three_way_split(spark, 700)
        out_full = str(tmp_path / "full")
        run_export(full, OPTS, out_full, bounds=BB)

        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        # two parquet drops -> two micro-batches (maxFilesPerTrigger=1)
        drops = str(tmp_path / "drops")
        b1.coalesce(1).write.mode("append").parquet(drops)
        b2.coalesce(1).write.mode("append").parquet(drops)

        stream = read_pages_stream(spark, drops, max_files_per_trigger=1)
        q = maintain.maintain_export_stream(
            stream, out, stream_checkpoint_dir=str(tmp_path / "sck"),
        )
        q.awaitTermination(300)
        assert maintain.last_applied_batch(out) >= 1  # two batches applied
        assert _tree_files(out) == _tree_files(out_full)

    def test_marker_skips_replayed_batch(self, spark, tmp_path):
        base, b1, _b2, _full = _three_way_split(spark, 700)
        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        apply_fn = maintain.append_batch_fn(out)
        apply_fn(b1, 0)
        state = _tree_files(out)
        marker = json.load(open(
            os.path.join(out, "_checkpoints", "_streamed_batches.json")))
        assert marker["last_applied"] == 0
        apply_fn(b1, 0)  # straight replay: marker short-circuits
        assert _tree_files(out) == state

    def test_content_fallback_converges_lost_marker(self, spark, tmp_path):
        """Crash window: append committed, marker write lost. The replay
        must detect the batch is fully in, re-record the marker, and
        change no bytes."""
        base, b1, _b2, _full = _three_way_split(spark, 700)
        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        apply_fn = maintain.append_batch_fn(out)
        apply_fn(b1, 0)
        state = _tree_files(out)
        os.remove(os.path.join(out, "_checkpoints", "_streamed_batches.json"))
        apply_fn(b1, 0)  # replay with NO marker
        assert _tree_files(out) == state
        marker = json.load(open(
            os.path.join(out, "_checkpoints", "_streamed_batches.json")))
        assert marker["last_applied"] == 0
        assert marker["last_summary"] == {"replay_converged": 1}

    def test_partial_upsert_still_fails_loudly(self, spark, tmp_path):
        base, b1, b2, _full = _three_way_split(spark, 700)
        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        apply_fn = maintain.append_batch_fn(out)
        apply_fn(b1, 0)
        mixed = b1.union(b2)  # half already applied, half new
        with pytest.raises(IncrementalRebuildRequired):
            apply_fn(mixed, 1)

    def test_full_overlap_upsert_fails_loudly(self, spark, tmp_path):
        """ADVICE r4 #1: a batch whose urls ALL exist in the base but whose
        content changed (same-urls-different-data upsert) must not be
        recorded as replay_converged — the content anti-join distinguishes
        it and the append's upsert guard fails it loudly."""
        from pyspark.sql import functions as F

        base, b1, _b2, _full = _three_way_split(spark, 700)
        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        apply_fn = maintain.append_batch_fn(out)
        apply_fn(b1, 0)
        state = _tree_files(out)
        # full url overlap, changed text -> genuine upsert, not a replay
        mutated = b1.withColumn("text", F.concat(F.col("text"), F.lit("!")))
        with pytest.raises(IncrementalRebuildRequired):
            apply_fn(mutated, 1)
        assert _tree_files(out) == state  # nothing half-written
        marker = json.load(open(
            os.path.join(out, "_checkpoints", "_streamed_batches.json")))
        assert marker["last_applied"] == 0  # batch 1 NOT recorded

    def test_snapshot_before_batch(self, spark, tmp_path):
        from i3dm_export_spark.plans.snapshots import list_snapshots, rollback

        base, b1, _b2, _full = _three_way_split(spark, 700)
        out = str(tmp_path / "live")
        run_export(base, OPTS, out, bounds=BB)
        before = _tree_files(out)
        apply_fn = maintain.append_batch_fn(out, snapshot_before_batch=True)
        apply_fn(b1, 0)
        snaps = list_snapshots(out)
        assert len(snaps) == 1 and "batch 0" in snaps[0]["note"]
        rollback(out, snaps[0]["gen"])
        assert _tree_files(out) == before
