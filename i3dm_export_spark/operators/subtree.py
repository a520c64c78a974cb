"""T4/K3: 3D Tiles 1.1 implicit-tiling subtree bitmaps + binary writer.

The reference delegates this to the external `subtree` NuGet package
(reference src/Program.cs:143-152, src/ImplicitTiling.cs:13-31); this module
owns it per the public 3D Tiles 1.1 spec (implicit tiling):

* the tile tree is cut into subtrees of ``subtree_levels`` levels; subtree
  roots sit at absolute levels 0, s, 2s, ...;
* within a subtree, tiles are indexed level-by-level in **Morton order**
  (interleaved x/y bits relative to the subtree root);
* three bitstreams per subtree file: tileAvailability ((4^s - 1)/3 bits),
  contentAvailability (same length), childSubtreeAvailability (4^s bits);
* binary layout: 24-byte header (magic ``subt``, version 1, uint64 JSON
  byte length, uint64 binary byte length), 8-byte space-padded JSON chunk,
  zero-padded binary buffer.

Availability rule (spec-monotone, derived from the tiles table):
  tile bit          = recorded tile whose subtree holds any content
                      (equivalently n_instances > 0)
  content bit       = content_available
  child-subtree bit = recorded boundary tile (local level == s) with
                      n_instances > 0

The tiles table is tiny relative to instances (README.md:179: 372 subtree
files for 588k instances), so assembly runs either on the driver
(:func:`build_subtrees_pandas`) or distributed as one ``groupBy(root)``
``applyInPandas`` over tile rows (:func:`build_subtrees_spark`).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd

from ..functions.cells import morton_encode


def subtree_roots(levels, xs, ys, subtree_levels: int):
    """Map absolute tile keys -> (root_level, root_x, root_y) of the subtree
    each tile is INTERIOR to. Boundary tiles (local level == s) are interior
    to their own subtree but also feed the parent subtree's
    childSubtreeAvailability — handled at assembly time."""
    levels = np.asarray(levels, np.int64)
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    root_level = (levels // subtree_levels) * subtree_levels
    shift = levels - root_level
    return root_level, xs >> shift, ys >> shift


def _local_bit_index(local_level, lx, ly):
    """Bit offset inside the level-major Morton layout:
    offset(level) = (4^level - 1)/3, index = offset + morton(lx, ly)."""
    offset = ((np.int64(4) ** np.asarray(local_level, np.int64)) - 1) // 3
    return offset + morton_encode(lx, ly)


def _pack_bits(indices, n_bits: int) -> bytes:
    bits = np.zeros(n_bits, dtype=np.uint8)
    idx = np.asarray(indices, np.int64)
    if idx.size:
        bits[idx] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def _pad8(b: bytes, pad: bytes) -> bytes:
    if len(b) % 8:
        b += pad * (8 - len(b) % 8)
    return b


def subtree_bitstrings(rows: pd.DataFrame, root_level: int, root_x: int,
                       root_y: int, subtree_levels: int):
    """(tileAvailability, contentAvailability, childSubtreeAvailability) as
    '0'/'1' strings in Morton order — the exact representation the
    reference's wrapper consumes (src/ImplicitTiling.cs:13-31).

    ``rows`` must hold the recorded tiles at absolute levels
    [root_level, root_level + s]; out-of-subtree rows are ignored.
    """
    s = subtree_levels
    n_interior = (4**s - 1) // 3
    tile_b = np.zeros(n_interior, np.uint8)
    content_b = np.zeros(n_interior, np.uint8)
    child_b = np.zeros(4**s, np.uint8)

    levels = rows["level"].to_numpy(np.int64)
    xs = rows["x"].to_numpy(np.int64)
    ys = rows["y"].to_numpy(np.int64)
    content = rows["content_available"].to_numpy(bool)
    has_content_below = rows["n_instances"].to_numpy(np.int64) > 0

    ll = levels - root_level
    lx = xs - (np.int64(root_x) << np.maximum(ll, 0))
    ly = ys - (np.int64(root_y) << np.maximum(ll, 0))
    in_range = (
        (ll >= 0) & (ll <= s)
        & (lx >= 0) & (ly >= 0)
        & (lx < (1 << np.maximum(ll, 0))) & (ly < (1 << np.maximum(ll, 0)))
    )

    interior = in_range & (ll < s)
    if interior.any():
        idx = _local_bit_index(ll[interior], lx[interior], ly[interior])
        tile_b[idx[has_content_below[interior]]] = 1
        content_b[idx[content[interior]]] = 1

    boundary = in_range & (ll == s)
    if boundary.any():
        cidx = morton_encode(lx[boundary], ly[boundary])
        child_b[cidx[has_content_below[boundary]]] = 1

    return (
        "".join(map(str, tile_b)),
        "".join(map(str, content_b)),
        "".join(map(str, child_b)),
    )


_HEADER_CACHE: dict = {}


def _header_for_lengths(n_tile: int, n_content: int, n_child: int):
    """header + JSON chunk + per-chunk padded offsets for given bitstream
    lengths. The JSON depends ONLY on the lengths (fixed per
    subtree_levels), so it is built once and reused across the millions of
    subtree files of one export."""
    key = (n_tile, n_content, n_child)
    hit = _HEADER_CACHE.get(key)
    if hit is not None:
        return hit
    views = []
    off = 0
    padded = []
    for n_bits in key:
        n_bytes = (n_bits + 7) // 8
        views.append({"buffer": 0, "byteOffset": off, "byteLength": n_bytes})
        pad = (8 - n_bytes % 8) % 8
        padded.append((n_bytes, pad))
        off += n_bytes + pad
    sub_json = {
        "buffers": [{"byteLength": off}],
        "bufferViews": views,
        "tileAvailability": {"bitstream": 0},
        "contentAvailability": [{"bitstream": 1}],
        "childSubtreeAvailability": {"bitstream": 2},
    }
    jbytes = _pad8(json.dumps(sub_json, separators=(",", ":")).encode(), b" ")
    header = struct.pack("<4sIQQ", b"subt", 1, len(jbytes), off)
    out = (header + jbytes, padded)
    _HEADER_CACHE[key] = out
    return out


def serialize_subtree(tile_bits: str, content_bits: str, child_bits: str) -> bytes:
    """Bitstrings -> .subtree binary (public 3D Tiles 1.1 layout)."""
    prefix, padded = _header_for_lengths(
        len(tile_bits), len(content_bits), len(child_bits)
    )
    parts = [prefix]
    for b, (_n_bytes, pad) in zip((tile_bits, content_bits, child_bits), padded):
        chunk = _pack_bits(
            np.flatnonzero(np.frombuffer(b.encode(), np.uint8) == ord("1")),
            len(b),
        )
        parts.append(chunk)
        if pad:
            parts.append(b"\x00" * pad)
    return b"".join(parts)


def build_subtrees_pandas(tiles_pdf: pd.DataFrame, subtree_levels: int = 2):
    """All subtree files from the collected tiles table.

    Returns {(level, x, y): (tile_bits, content_bits, child_bits, bytes)}.
    A subtree file exists for every subtree root whose subtree records any
    content (mirrors the reference: only reachable subtrees are written).
    """
    s = subtree_levels
    r_level, r_x, r_y = subtree_roots(
        tiles_pdf["level"], tiles_pdf["x"], tiles_pdf["y"], s
    )
    has_content = tiles_pdf["n_instances"].to_numpy(np.int64) > 0

    roots = set()
    for rl, rx, ry, hc in zip(r_level, r_x, r_y, has_content):
        if hc:
            roots.add((int(rl), int(rx), int(ry)))

    out = {}
    levels = tiles_pdf["level"].to_numpy(np.int64)
    xs = tiles_pdf["x"].to_numpy(np.int64)
    ys = tiles_pdf["y"].to_numpy(np.int64)
    for rl, rx, ry in sorted(roots):
        ll = levels - rl
        sel = (ll >= 0) & (ll <= s)
        sel &= (xs >> np.maximum(ll, 0)) == rx
        sel &= (ys >> np.maximum(ll, 0)) == ry
        rows = tiles_pdf[sel]
        bits = subtree_bitstrings(rows, rl, rx, ry, s)
        out[(rl, rx, ry)] = (*bits, serialize_subtree(*bits))
    return out


def build_subtrees_pandas_for_roots(tiles_pdf, roots, subtree_levels: int = 2):
    """Driver twin of ``build_subtrees_spark(roots=...)``: assemble ONLY
    the requested subtree roots from a collected tiles frame — same row
    selection (absolute levels [root, root+s] under the root's prefix),
    same existence rule (any interior row with content, the
    ``_assemble_root_group`` / :func:`build_subtrees_pandas` rule), same
    serialized bytes (shared bitstring builders). Returns
    ``[(root_level, root_x, root_y, payload)]`` in sorted root order.
    Used by the incremental append's driver fast path for localized
    batches, where a tile-row shuffle costs more than the payloads."""
    s = subtree_levels
    levels = tiles_pdf["level"].to_numpy(np.int64)
    xs = tiles_pdf["x"].to_numpy(np.int64)
    ys = tiles_pdf["y"].to_numpy(np.int64)
    hc = tiles_pdf["n_instances"].to_numpy(np.int64) > 0
    out = []
    for rl, rx, ry in sorted(roots):
        ll = levels - rl
        sel = (ll >= 0) & (ll <= s)
        sel &= (xs >> np.maximum(ll, 0)) == rx
        sel &= (ys >> np.maximum(ll, 0)) == ry
        if not bool((sel & (ll < s) & hc).any()):
            continue
        bits = subtree_bitstrings(
            tiles_pdf[sel], int(rl), int(rx), int(ry), s
        )
        out.append((int(rl), int(rx), int(ry), serialize_subtree(*bits)))
    return out


def subtree_tile_pairs(tiles, subtree_levels: int):
    """(subtree root, tile) pairs as a DataFrame — the distributed analogue
    of the per-root row selection in :func:`build_subtrees_pandas`.

    Every tile maps to the root of the subtree it is INTERIOR to
    (local level in [0, s)); tiles sitting exactly on a subtree-root level
    additionally feed the PARENT subtree as boundary rows (local level s,
    childSubtreeAvailability). Pure JVM expressions, no UDF.
    """
    from pyspark.sql import functions as F

    s = subtree_levels
    t = tiles.select("level", "x", "y", "content_available", "n_instances")
    own = t.select(
        (F.col("level") - F.col("level") % s).cast("int").alias("root_level"),
        F.expr(f"shiftright(x, CAST(level % {s} AS INT))").cast("long").alias("root_x"),
        F.expr(f"shiftright(y, CAST(level % {s} AS INT))").cast("long").alias("root_y"),
        "level", "x", "y", "content_available", "n_instances",
        F.lit(True).alias("is_interior"),
    )
    parent = t.filter((F.col("level") % s == 0) & (F.col("level") > 0)).select(
        (F.col("level") - s).cast("int").alias("root_level"),
        F.expr(f"shiftright(x, {s})").cast("long").alias("root_x"),
        F.expr(f"shiftright(y, {s})").cast("long").alias("root_y"),
        "level", "x", "y", "content_available", "n_instances",
        F.lit(False).alias("is_interior"),
    )
    return own.unionByName(parent)


def affected_subtree_roots(keys, subtree_levels: int):
    """Distinct (root_level, root_x, root_y) whose bitstreams read ANY of
    ``keys`` (a DataFrame of level/x/y tile keys): each key's own subtree
    root plus, for boundary tiles, the parent subtree root that records
    the key in its childSubtreeAvailability. Feeding this to
    :func:`build_subtrees_spark` ``roots=`` restricts assembly to the
    subtrees an incremental append can have changed."""
    from pyspark.sql import functions as F

    t = keys.select(
        "level", "x", "y",
        F.lit(True).alias("content_available"),
        F.lit(1).cast("bigint").alias("n_instances"),
    )
    return subtree_tile_pairs(t, subtree_levels).select(
        "root_level", "root_x", "root_y"
    ).distinct()


_SUBTREE_SCHEMA = (
    "root_level int, root_x long, root_y long, "
    "tile_bits string, content_bits string, child_bits string, payload binary"
)


def _assemble_root_group(pdf: pd.DataFrame, s: int):
    """One subtree root's rows -> 0 or 1 result tuples."""
    rl = int(pdf["root_level"].iloc[0])
    rx = int(pdf["root_x"].iloc[0])
    ry = int(pdf["root_y"].iloc[0])
    interior = pdf["is_interior"].to_numpy(bool)
    hc = pdf["n_instances"].to_numpy(np.int64) > 0
    # a subtree file exists iff the subtree records any content
    # (same root-set rule as build_subtrees_pandas)
    if not bool((interior & hc).any()):
        return None
    bits = subtree_bitstrings(pdf, rl, rx, ry, s)
    return (rl, rx, ry, bits[0], bits[1], bits[2], serialize_subtree(*bits))


def build_subtrees_spark(tiles, subtree_levels: int = 2,
                         num_partitions: int | None = None,
                         roots=None):
    """T4 at scale: all subtree files assembled IN EXECUTORS.

    One shuffle of tile rows (never instances) hash-partitioned by subtree
    root, then ``mapInPandas`` per PARTITION with a vectorized pandas
    groupby inside — thousands of (bounded, <= (4^s-1)/3 + 4^s rows)
    root groups per Arrow batch, so per-group overhead is C-level, not a
    Spark task round-trip. Assembles a full level-10 tree (1.4M tiles ->
    1.1M subtree files) in seconds; the 10^8-tile regime the driver-side
    :func:`build_subtrees_pandas` cannot reach (the reference delegates to
    a single-process NuGet package, src/ImplicitTiling.cs:13-31).

    Returns a DataFrame (root_level, root_x, root_y, tile_bits,
    content_bits, child_bits, payload) with one row per subtree file,
    bit-identical to :func:`build_subtrees_pandas` (parity-tested).

    ``roots`` (optional DataFrame of root_level/root_x/root_y) restricts
    assembly to those subtrees — the tile-row shuffle and every payload
    build then scale with the requested root set (an incremental append's
    dirty region), not the corpus tree. The filter is a broadcast
    semi-join BEFORE the repartition, so unrequested tile rows never
    shuffle.
    """
    from pyspark.sql import functions as F

    from ..packaging import ensure_shipped

    spark = tiles.sparkSession
    ensure_shipped(spark)
    s = subtree_levels
    n_parts = num_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions")), 1
    )
    pairs = subtree_tile_pairs(tiles, s)
    if roots is not None:
        pairs = pairs.join(
            F.broadcast(roots.select("root_level", "root_x", "root_y")),
            ["root_level", "root_x", "root_y"],
            "left_semi",
        )
    pairs = pairs.repartition(n_parts, "root_level", "root_x", "root_y")
    cols = ["root_level", "root_x", "root_y", "tile_bits",
            "content_bits", "child_bits", "payload"]

    def _assemble_partition(batches):
        # a partition holds every row of each root it owns (hash
        # partitioning), but one root's rows may span Arrow batches —
        # concatenate first, then groupby (groups are tiny; the partition
        # row count is bounded by tiles/partition, safe to hold)
        pdfs = [pdf for pdf in batches]
        if not pdfs:
            return
        whole = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        out = []
        for _, g in whole.groupby(
            ["root_level", "root_x", "root_y"], sort=False
        ):
            row = _assemble_root_group(g, s)
            if row is not None:
                out.append(row)
        if out:
            yield pd.DataFrame(out, columns=cols)

    return pairs.mapInPandas(_assemble_partition, _SUBTREE_SCHEMA)


def parse_subtree(data: bytes):
    """Round-trip reader for tests: returns (json_dict, raw_buffer)."""
    magic, version, jlen, blen = struct.unpack("<4sIQQ", data[:24])
    assert magic == b"subt" and version == 1
    j = json.loads(data[24 : 24 + jlen].decode())
    buf = data[24 + jlen : 24 + jlen + blen]
    return j, buf


def available_levels(tiles_pdf: pd.DataFrame) -> int:
    """reference src/Program.cs:152: max recorded level + 1."""
    return int(tiles_pdf["level"].max()) + 1
