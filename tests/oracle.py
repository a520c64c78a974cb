"""Pure-Python oracle for the reference's quadtree descent semantics.

Independent reimplementation of the recursion in
/root/reference/src/ImplicitTiling.cs:33-113 used ONLY to generate golden
expectations for tests: depth-first descent, per-node count, the T2
decision table, and recursive midpoint bbox halving (child key
(z+1, 2x+dx, 2y+dy), y north from YMin).

Deviation shared with the engine (documented, SURVEY.md §7): cells are
half-open (a point on a shared edge belongs to the east/north child) where
the reference's ST_Intersects double-counts edge points. Fixture data is
checked to avoid exact boundary hits.
"""

from __future__ import annotations


def reference_tile_tree(
    lons, lats, bbox, max_features, use_clustering=False, max_level=20
):
    """Returns dict {(level, x, y): (available, content, count)} in the same
    membership as the reference's accumulated List<Tile> + content writes."""
    pts = list(zip(lons, lats))
    tiles = {}

    def recurse(b, z, x, y, idx):
        cnt = len(idx)
        if cnt == 0:
            tiles[(z, x, y)] = (False, False, 0)
            return
        if cnt > max_features and z < max_level:
            avail = bool(use_clustering)
            tiles[(z, x, y)] = (avail, avail, cnt)
            x0, y0, x1, y1 = b
            dx = (x1 - x0) / 2
            dy = (y1 - y0) / 2
            for cx in (0, 1):
                for cy in (0, 1):
                    xs = x0 + dx * cx
                    ys = y0 + dy * cy
                    sub = [
                        k
                        for k in idx
                        if _inside(pts[k][0], xs, xs + dx, cx == 1, x0, x1)
                        and _inside(pts[k][1], ys, ys + dy, cy == 1, y0, y1)
                    ]
                    recurse((xs, ys, xs + dx, ys + dy), z + 1, x * 2 + cx, y * 2 + cy, sub)
        else:
            tiles[(z, x, y)] = (True, True, cnt)

    def _inside(v, lo, hi, is_upper_half, plo, phi):
        # half-open cells; the outermost edges clamp inward
        lo_ok = v >= lo if is_upper_half else True
        hi_ok = v < hi if not is_upper_half else True
        return lo_ok and hi_ok

    recurse(tuple(bbox), 0, 0, 0, list(range(len(pts))))
    return tiles
