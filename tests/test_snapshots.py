"""Export generations (plans/snapshots): snapshot, rollback, retention.

The contract under test: a snapshot is a zero-copy archive of the live
export (hard links for payloads — surviving later in-place replacements —
byte copies for the rewritten-in-place JSONs); rollback restores the
archived generation byte-for-byte INCLUDING checkpoints (so post-rollback
appends behave as at snapshot time) and auto-archives the pre-rollback
state so it is itself revertible.
"""
from __future__ import annotations

import json
import os

import pytest

from i3dm_export_spark.config import Bounds, ExportOptions
from i3dm_export_spark.plans.incremental import incremental_append
from i3dm_export_spark.plans.pipeline import run_export
from i3dm_export_spark.plans.snapshots import (
    create_snapshot,
    expire_snapshots,
    list_snapshots,
    rollback,
)
from i3dm_export_spark.sources.pages import DOCS_BBOX, pages_df

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


def _split(spark, n_total, n_base):
    full = pages_df(spark, n_total)
    urls = sorted(r["url"] for r in full.select("url").collect())
    cut = urls[n_base]
    return full.filter(f"url < '{cut}'"), full.filter(f"url >= '{cut}'")


class TestSnapshotRollback:
    def test_snapshot_append_rollback_is_byte_identical(self, spark, tmp_path):
        """The headline contract: append mutates tiles in place; rollback
        to the pre-append generation restores every content/subtree/
        tileset byte, and the auto-archive makes the append state itself
        recoverable."""
        out = str(tmp_path / "out")
        base, batch = _split(spark, 700, 600)
        run_export(base, OPTS, out, bounds=BB)
        before = _tree_files(out)
        snap = create_snapshot(out, note="pre-append")
        assert snap["gen"] == 1 and snap["n_files"] == len(
            [r for r in _walk_all(out)])

        incremental_append(batch, out)
        after_append = _tree_files(out)
        assert after_append != before  # the append really mutated tiles

        rep = rollback(out, 1)
        assert rep["restored_gen"] == 1 and rep["saved_gen"] == 2
        assert _tree_files(out) == before
        # rollback is revertible: restore the post-append auto-archive
        rollback(out, 2)
        assert _tree_files(out) == after_append

    def test_rollback_restores_append_capability(self, spark, tmp_path):
        """Checkpoints travel with the generation: append -> rollback ->
        the SAME append again must produce the same bytes as the first
        time (fingerprints and stage state restored, not stale)."""
        out = str(tmp_path / "out")
        base, batch = _split(spark, 600, 520)
        run_export(base, OPTS, out, bounds=BB)
        create_snapshot(out)
        incremental_append(batch, out)
        appended = _tree_files(out)
        rollback(out, 1)
        incremental_append(batch, out)
        assert _tree_files(out) == appended

    def test_hard_links_survive_in_place_replacement(self, spark, tmp_path):
        """The inode contract the archive relies on: overwriting a tile via
        the sinks' os.replace swaps the inode, leaving the archived link
        holding the OLD bytes."""
        out = str(tmp_path / "out")
        base, batch = _split(spark, 700, 600)
        run_export(base, OPTS, out, bounds=BB)
        before = _tree_files(out)
        create_snapshot(out)
        incremental_append(batch, out)
        gfiles = os.path.join(out, "_snapshots", "g0001", "files")
        archived = {}
        for sub in ("content", "subtrees"):
            d = os.path.join(gfiles, sub)
            for fn in sorted(os.listdir(d)):
                with open(os.path.join(d, fn), "rb") as f:
                    archived[f"{sub}/{fn}"] = f.read()
        with open(os.path.join(gfiles, "tileset.json")) as f:
            archived["tileset.json"] = f.read()
        assert archived == before

    def test_snapshot_freezes_payload_inodes(self, spark, tmp_path):
        """After a snapshot, an external IN-PLACE write to a tile (which
        would corrupt the live tree and the shared-inode archive together)
        fails loudly; the pipeline's own replace-style writes still work
        (exercised by the append tests above)."""
        import stat

        out = str(tmp_path / "out")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB)
        create_snapshot(out)
        content = os.path.join(out, "content")
        tile = os.path.join(content, sorted(os.listdir(content))[0])
        mode = stat.S_IMODE(os.stat(tile).st_mode)
        assert mode == 0o444, oct(mode)
        if os.geteuid() != 0:  # root bypasses file modes (CAP_DAC_OVERRIDE)
            with pytest.raises(PermissionError):
                open(tile, "wb")
        # replace-style write (what the sinks do) still works
        tmp = tile + ".tmp.x"
        open(tmp, "wb").write(b"new")
        os.replace(tmp, tile)
        assert open(tile, "rb").read() == b"new"

    def test_list_and_expire(self, spark, tmp_path):
        out = str(tmp_path / "out")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB)
        create_snapshot(out, note="a")
        create_snapshot(out, note="b")
        create_snapshot(out, note="c")
        gens = list_snapshots(out)
        assert [m["gen"] for m in gens] == [1, 2, 3]
        assert [m["note"] for m in gens] == ["a", "b", "c"]
        assert expire_snapshots(out, keep_last=1) == [1, 2]
        assert [m["gen"] for m in list_snapshots(out)] == [3]
        # numbering continues after expiry (no id reuse)
        assert create_snapshot(out)["gen"] == 4

    def test_crashed_snapshot_tmp_swept(self, spark, tmp_path):
        """A killed create_snapshot leaves g<N>.tmp; the next snapshot
        sweeps it (a generation only ever appears atomically)."""
        out = str(tmp_path / "out")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB)
        create_snapshot(out)
        stale = os.path.join(out, "_snapshots", "g0099.tmp")
        os.makedirs(os.path.join(stale, "files"))
        with open(os.path.join(stale, "files", "junk"), "wb") as f:
            f.write(b"x")
        m = create_snapshot(out)
        assert m["gen"] == 2
        assert not os.path.exists(stale)
        assert [g["gen"] for g in list_snapshots(out)] == [1, 2]

    def test_external_checkpoint_root_travels_with_generation(
            self, spark, tmp_path):
        """ADVICE r4 #2: an export with --checkpoint_dir outside -o must
        snapshot AND rollback the external root too; otherwise rollback
        restores old tiles against newer stage3_assigned and the next
        append silently diffs against the wrong assignment."""
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp_external")
        base, batch = _split(spark, 700, 600)
        run_export(base, OPTS, out, bounds=BB, checkpoint_dir=cp)
        before_tiles = _tree_files(out)
        before_cp = _dir_bytes(cp)
        snap = create_snapshot(out, note="pre", checkpoint_dir=cp)
        assert snap["gen"] == 1

        incremental_append(batch, out, checkpoint_dir=cp)
        assert _dir_bytes(cp) != before_cp  # append mutated checkpoints

        rollback(out, 1, checkpoint_dir=cp)
        assert _tree_files(out) == before_tiles
        assert _dir_bytes(cp) == before_cp  # checkpoints restored too
        # and the restored state supports the same append again
        rep = incremental_append(batch, out, checkpoint_dir=cp)
        assert rep["n_new_instances"] > 0

    def test_rollback_external_root_mismatch_raises(self, spark, tmp_path):
        out = str(tmp_path / "out")
        cp = str(tmp_path / "cp_external")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB, checkpoint_dir=cp)
        create_snapshot(out, note="no-cp")  # forgot checkpoint_dir
        with pytest.raises(ValueError, match="covers no external"):
            rollback(out, 1, checkpoint_dir=cp)
        create_snapshot(out, note="with-cp", checkpoint_dir=cp)
        with pytest.raises(ValueError, match="pass checkpoint_dir"):
            rollback(out, 2)

    def test_rollback_unknown_generation(self, spark, tmp_path):
        out = str(tmp_path / "out")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB)
        with pytest.raises(FileNotFoundError, match="g0007"):
            rollback(out, 7)

    def test_cli_modes(self, spark, tmp_path, capsys):
        from i3dm_export_spark.__main__ import main

        out = str(tmp_path / "out")
        base, _ = _split(spark, 300, 299)
        run_export(base, OPTS, out, bounds=BB)
        rep = main(["--snapshot", "--snapshot_note", "n1", "-o", out])
        assert rep["gen"] == 1
        rep = main(["--list_snapshots", "-o", out])
        assert rep["snapshots"][0]["note"] == "n1"
        rep = main(["--rollback", "1", "-o", out])
        assert rep["restored_gen"] == 1
        rep = main(["--expire_snapshots", "1", "-o", out])
        assert rep["expired"] == [1]
        assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _dir_bytes(root):
    out = {}
    for r, _d, files in os.walk(root):
        for fn in files:
            fp = os.path.join(r, fn)
            with open(fp, "rb") as f:
                out[os.path.relpath(fp, root)] = f.read()
    return out


def _walk_all(out_dir):
    for name in ("content", "subtrees", "tileset.json", "_checkpoints"):
        p = os.path.join(out_dir, name)
        if os.path.isfile(p):
            yield name
        elif os.path.isdir(p):
            for root, _d, files in os.walk(p):
                for fn in files:
                    yield os.path.relpath(os.path.join(root, fn), out_dir)
