"""Export generations: zero-copy snapshots and rollback (time travel).

Iceberg gives tables snapshot ids and rollback; the tile directory the
sinks maintain has no such safety net — an append that encodes bad data
overwrites dirty tiles in place (atomically, but irreversibly). This
module adds generation semantics to the export directory itself:

* :func:`create_snapshot` archives the current export under
  ``_snapshots/g<N>/`` — **hard links** for tile payloads and checkpoint
  parquet (zero bytes copied; the sinks replace files via ``os.replace``,
  so a later rewrite swaps the inode and the archived link keeps the old
  bytes), byte **copies** for the small ``*.json`` metadata (those are
  rewritten in place, which would mutate a shared inode). Cost is one
  metadata op per file — a 10^8-tile snapshot is a namespace pass, no
  data movement. On object storage the same contract maps to bucket
  versioning / manifest pointers; the local-fs form is the sandbox seam.
* :func:`rollback` restores a generation: the current state is first
  auto-archived (rollback is itself revertible), then content/, subtrees/,
  tileset.json and the checkpoint root are replaced from the archive.
  Restored checkpoints keep their input fingerprints, so post-rollback
  resumes and appends behave exactly as they did at snapshot time.
* :func:`list_snapshots` enumerates generations with note/file counts.

Fits the maintenance suite: vacuum (GC), fsck (audit), snapshots
(time travel). No Spark session required — pure filesystem metadata.
"""

from __future__ import annotations

import json
import os
import shutil

#: export-root entries covered by a generation
_ROOTS = ("content", "subtrees", "tileset.json", "_checkpoints")
_SNAPDIR = "_snapshots"


def _snap_root(out_dir: str) -> str:
    return os.path.join(out_dir, _SNAPDIR)


def _gen_dir(out_dir: str, gen: int) -> str:
    return os.path.join(_snap_root(out_dir), f"g{gen:04d}")


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if src.endswith(".json"):
        # rewritten in place by the pipeline -> must not share the inode
        shutil.copy2(src, dst)
        return
    try:
        os.link(src, dst)
    except OSError:
        # cross-device / FS without hard links: degrade to a copy
        shutil.copy2(src, dst)
        return
    # freeze the shared inode (git-objects style): the pipeline only ever
    # REPLACES payload files (sinks/checkpoints write tmp + os.replace, so
    # a rewrite swaps the inode and the archive keeps the old bytes), but
    # an external in-place write would corrupt live tree AND archive
    # together — read-only makes that fail loudly instead. Deletes and
    # replaces still work (they need only directory permission).
    try:
        os.chmod(src, 0o444)
    except OSError:
        pass


def _walk_export(out_dir: str):
    """Yield relpaths (to out_dir) of every file a generation covers."""
    for name in _ROOTS:
        path = os.path.join(out_dir, name)
        if os.path.isfile(path):
            yield name
        elif os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    yield os.path.relpath(os.path.join(root, fn), out_dir)


def create_snapshot(out_dir: str, note: str = "") -> dict:
    """Archive the current export as the next generation; returns the
    manifest dict (``gen``, ``note``, ``n_files``, ``n_bytes`` — logical
    bytes covered, not bytes copied)."""
    root = _snap_root(out_dir)
    if os.path.isdir(root):  # sweep tmps from ANY crashed snapshot attempt
        for name in os.listdir(root):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    existing = list_snapshots(out_dir)
    gen = (existing[-1]["gen"] + 1) if existing else 1
    gdir = _gen_dir(out_dir, gen)
    if os.path.exists(gdir):  # crashed half-snapshot with this id
        shutil.rmtree(gdir)
    tmp = gdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    n_files = 0
    n_bytes = 0
    rels = []
    for rel in _walk_export(out_dir):
        src = os.path.join(out_dir, rel)
        _link_or_copy(src, os.path.join(tmp, "files", rel))
        n_files += 1
        n_bytes += os.path.getsize(src)
        rels.append(rel)
    manifest = {
        "gen": gen, "note": note, "n_files": n_files, "n_bytes": n_bytes,
    }
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({**manifest, "files": sorted(rels)}, f)
    os.replace(tmp, gdir)  # a generation appears atomically
    return manifest


def list_snapshots(out_dir: str) -> list[dict]:
    """Generations in ascending order (manifest dicts without file lists)."""
    root = _snap_root(out_dir)
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        mpath = os.path.join(root, name, "manifest.json")
        if name.startswith("g") and os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            out.append({k: m[k] for k in ("gen", "note", "n_files", "n_bytes")})
    return sorted(out, key=lambda m: m["gen"])


def rollback(out_dir: str, gen: int) -> dict:
    """Restore generation ``gen``. The pre-rollback state is archived
    first (as a new generation), so a rollback can itself be undone.
    Returns ``{"restored_gen": gen, "saved_gen": <auto archive id>,
    "n_files": ...}``."""
    gdir = _gen_dir(out_dir, gen)
    mpath = os.path.join(gdir, "manifest.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no snapshot generation g{gen:04d} under {_snap_root(out_dir)}; "
            f"have: {[m['gen'] for m in list_snapshots(out_dir)]}"
        )
    saved = create_snapshot(out_dir, note=f"auto before rollback to g{gen:04d}")

    with open(mpath) as f:
        manifest = json.load(f)
    # drop the live state the generation covers, then restore from the
    # archive (links/copies back out — again metadata-only for payloads)
    for name in _ROOTS:
        path = os.path.join(out_dir, name)
        if os.path.isfile(path):
            os.remove(path)
        elif os.path.isdir(path):
            shutil.rmtree(path)
    for rel in manifest["files"]:
        _link_or_copy(os.path.join(gdir, "files", rel),
                      os.path.join(out_dir, rel))
    return {
        "restored_gen": gen,
        "saved_gen": saved["gen"],
        "n_files": manifest["n_files"],
    }


def expire_snapshots(out_dir: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` generations (snapshot
    retention, same role as Iceberg's expire_snapshots). Returns the
    expired generation ids. Hard links mean dropping a generation only
    frees bytes whose inodes no other generation or the live tree still
    references."""
    gens = [m["gen"] for m in list_snapshots(out_dir)]
    expired = gens[:-keep_last] if keep_last > 0 else gens
    for g in expired:
        shutil.rmtree(_gen_dir(out_dir, g), ignore_errors=True)
    return expired
