"""DuckDB oracle SQL builders for __spark_entry__.

Every query in __spark_entry__.queries() has a matching ANSI-SQL text here
that DuckDB evaluates over the same parquet views. Cross-engine value
equality is engineered, not hoped for:

* cell keys / extents / distances: identical double arithmetic (same
  literals, same op order; power-of-two scaling exact in IEEE754);
* hashes: md5 hex strings (identical in Spark and DuckDB); min() over
  fixed-length hex == min over the 128-bit value;
* SimHash / Jaccard / rolling hash: integer arithmetic only;
* the few genuinely FP-accumulating results (ECEF trig, cosine folds,
  event sums) are rounded to a tolerance far above libm drift;
* DuckDB regexp_replace needs the explicit 'g' flag to match Spark's
  replace-all default.
"""

from __future__ import annotations

from .functions.text import BPE_RE
from .sources.pages import DOCS_BBOX, INSTANCE_CTE

BBOX = DOCS_BBOX
_X0, _Y0, _X1, _Y1 = BBOX
_W = _X1 - _X0
_H = _Y1 - _Y0

NORM_TEXT = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


def cell_expr(axis: str, level: int) -> str:
    """Quadtree cell key expr (matches operators/tiling.with_cell_keys)."""
    n = 1 << level
    col, lo, span = ("lon", _X0, _W) if axis == "x" else ("lat", _Y0, _H)
    return (
        f"CAST(LEAST(GREATEST(FLOOR(({col} - {lo!r}) / {span!r} * {n}), 0), {n - 1}) AS BIGINT)"
    )


def tree_ctes(max_features: int, max_level: int) -> str:
    """Non-recursive per-level CTE chain reproducing the T2 decision table:
    counts per level via group-by, children of split parents left-join the
    next level's counts (empty children recorded with cnt=0)."""
    parts = [INSTANCE_CTE[5:]]  # strip leading 'WITH '
    for lvl in range(max_level + 1):
        parts.append(
            f"c{lvl} AS (SELECT {cell_expr('x', lvl)} AS x, {cell_expr('y', lvl)} AS y, "
            f"COUNT(*) AS cnt FROM instances GROUP BY 1, 2)"
        )
    parts.append(
        "l0 AS (SELECT 0 AS level, CAST(0 AS BIGINT) AS x, CAST(0 AS BIGINT) AS y, "
        "COALESCE((SELECT SUM(cnt) FROM c0), 0) AS cnt)"
    )
    for lvl in range(1, max_level + 1):
        parts.append(
            f"l{lvl} AS (SELECT {lvl} AS level, ch.x, ch.y, COALESCE(c.cnt, 0) AS cnt "
            f"FROM (SELECT p.x*2+d.dx AS x, p.y*2+d.dy AS y "
            f"      FROM l{lvl - 1} p, (VALUES (0,0),(0,1),(1,0),(1,1)) d(dx, dy) "
            f"      WHERE p.cnt > {max_features}) ch "
            f"LEFT JOIN c{lvl} c ON c.x = ch.x AND c.y = ch.y)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM l{lvl}" for lvl in range(max_level + 1))
    parts.append(f"tree AS ({union})")
    return "WITH " + ",\n".join(parts)


def tree_select(max_features: int, max_level: int) -> str:
    """Availability columns per the T2 table + forced leaf at max_level."""
    return (
        f"SELECT CAST(level AS INT) AS level, x, y, "
        f"(cnt > 0 AND (cnt <= {max_features} OR level = {max_level})) AS available, "
        f"(cnt > 0 AND (cnt <= {max_features} OR level = {max_level})) AS content_available, "
        f"CAST(cnt AS BIGINT) AS n_instances FROM tree"
    )


def q_tile_tree(max_features: int = 50, max_level: int = 6) -> str:
    return f"{tree_ctes(max_features, max_level)}\n{tree_select(max_features, max_level)}"


def q_leaf_assignment(max_features: int = 50, max_level: int = 6) -> str:
    lvl_cases_x = " ".join(
        f"WHEN t.level = {lvl} THEN {cell_expr('x', lvl)}" for lvl in range(max_level + 1)
    )
    lvl_cases_y = " ".join(
        f"WHEN t.level = {lvl} THEN {cell_expr('y', lvl)}" for lvl in range(max_level + 1)
    )
    return (
        f"{tree_ctes(max_features, max_level)},\n"
        f"content AS ({tree_select(max_features, max_level)}"
        f"), leaves AS (SELECT level, x, y FROM content WHERE content_available)\n"
        f"SELECT i.doc_id, CAST(t.level AS INT) AS level, t.x, t.y\n"
        f"FROM instances i JOIN leaves t\n"
        f"  ON (CASE {lvl_cases_x} END) = t.x AND (CASE {lvl_cases_y} END) = t.y"
    )


def q_tile_counts(level: int = 5) -> str:
    return (
        f"{INSTANCE_CTE}\n"
        f"SELECT {cell_expr('x', level)} AS x, {cell_expr('y', level)} AS y, "
        f"COUNT(*) AS n FROM instances GROUP BY 1, 2"
    )


def q_extent() -> str:
    """Min/max + the reference's asymmetric 10% inflation (F12/A2), as one
    nested select mirroring operators/extent.derive_root_bounds."""
    return (
        f"{INSTANCE_CTE},\n"
        "raw AS (SELECT MIN(lon) AS xmin0, MAX(lon) AS xmax0, MIN(lat) AS ymin0, "
        "MAX(lat) AS ymax0, MIN(z) + 0.0 AS zmin, MAX(z) + 10.0 AS zmax FROM instances),\n"
        "s1 AS (SELECT xmin0 - (xmax0 - xmin0) * 0.1 AS xmin, "
        "ymin0 - (ymax0 - ymin0) * 0.1 AS ymin, xmax0, ymax0, zmin, zmax FROM raw)\n"
        "SELECT xmin, ymin, xmax0 + (xmax0 - xmin) * 0.1 AS xmax, "
        "ymax0 + (ymax0 - ymin) * 0.1 AS ymax, zmin, zmax FROM s1"
    )


def q_count_in_box() -> str:
    return (
        f"{INSTANCE_CTE}\n"
        "SELECT COUNT(*) AS n FROM instances "
        "WHERE lon >= 34.02 AND lon < 34.06 AND lat >= 44.02 AND lat < 44.06 "
        "AND lang = 'en'"
    )


def q_instance_fetch_ecef() -> str:
    from .functions.geodesy import WGS84_A, WGS84_E2  # same constants as the UDF

    return (
        f"{INSTANCE_CTE},\n"
        "t AS (SELECT doc_id, radians(lon) AS lam, radians(lat) AS phi, scale, model "
        "FROM instances),\n"
        f"n AS (SELECT *, {WGS84_A!r} / sqrt(1.0 - {WGS84_E2!r} * sin(phi) * sin(phi)) AS nn FROM t)\n"
        "SELECT doc_id, ROUND(nn * cos(phi) * cos(lam), 2) AS x_ecef, "
        "ROUND(nn * cos(phi) * sin(lam), 2) AS y_ecef, "
        f"ROUND(nn * (1.0 - {WGS84_E2!r}) * sin(phi), 2) AS z_ecef, scale, model FROM n"
    )


def q_rtc_relative(level: int = 3) -> str:
    return (
        f"{INSTANCE_CTE},\n"
        f"keyed AS (SELECT doc_id, lon, lat, {cell_expr('x', level)} AS x, "
        f"{cell_expr('y', level)} AS y FROM instances)\n"
        "SELECT doc_id, x, y, "
        "lon - FIRST_VALUE(lon) OVER w AS dx, "
        "lat - FIRST_VALUE(lat) OVER w AS dy "
        "FROM keyed WINDOW w AS (PARTITION BY x, y ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )


def q_distinct_models(level: int = 3) -> str:
    return (
        f"{INSTANCE_CTE}\n"
        f"SELECT {cell_expr('x', level)} AS x, {cell_expr('y', level)} AS y, "
        "COUNT(DISTINCT model) AS n_models, MIN(model) AS first_model "
        "FROM instances GROUP BY 1, 2"
    )


def q_batch_table(level: int = 2) -> str:
    return (
        f"{INSTANCE_CTE},\n"
        f"keyed AS (SELECT doc_id, lang, {cell_expr('x', level)} AS x, "
        f"{cell_expr('y', level)} AS y FROM instances)\n"
        "SELECT x, y, '{\"lang\":[' || STRING_AGG('\"' || lang || '\"', ',' ORDER BY doc_id) "
        "|| '],\"id\":[' || STRING_AGG('\"' || CAST(doc_id AS VARCHAR) || '\"', ',' ORDER BY doc_id) "
        "|| ']}' AS batch_json FROM keyed GROUP BY x, y"
    )


def q_knn(k: int = 3, n_query: int = 50, n_cand: int = 200) -> str:
    return (
        f"{INSTANCE_CTE},\n"
        f"q AS (SELECT doc_id, lon, lat FROM instances WHERE doc_id < {n_query}),\n"
        f"c AS (SELECT doc_id AS neighbor_id, lon AS nx, lat AS ny FROM instances "
        f"WHERE doc_id < {n_cand}),\n"
        "d AS (SELECT q.doc_id, c.neighbor_id, "
        "(q.lon - c.nx) * (q.lon - c.nx) + (q.lat - c.ny) * (q.lat - c.ny) AS d2 "
        "FROM q, c WHERE q.doc_id != c.neighbor_id),\n"
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY d2 ASC, neighbor_id ASC) AS rank FROM d)\n"
        f"SELECT doc_id, neighbor_id, CAST(rank AS INT) AS rank, d2 FROM r WHERE rank <= {k}"
    )


def q_pip_rect(grid: int = 4) -> str:
    cell_w = _W / grid
    cell_h = _H / grid
    return (
        f"{INSTANCE_CTE},\n"
        f"rects AS (SELECT CAST(r AS BIGINT) AS boundary_id, "
        f"{_X0!r} + (r % {grid}) * {cell_w!r} AS min_lon, "
        f"{_X0!r} + (r % {grid} + 1) * {cell_w!r} AS max_lon, "
        f"{_Y0!r} + (r // {grid}) * {cell_h!r} AS min_lat, "
        f"{_Y0!r} + (r // {grid} + 1) * {cell_h!r} AS max_lat "
        f"FROM range({grid * grid}) t(r))\n"
        "SELECT i.doc_id, b.boundary_id FROM instances i JOIN rects b "
        "ON i.lon >= b.min_lon AND i.lon < b.max_lon "
        "AND i.lat >= b.min_lat AND i.lat < b.max_lat"
    )


def pip_polygons() -> list[dict]:
    """Shared concave-polygon fixture for the pip_polygon query + oracle.

    Built from DOCS_BBOX in Python floats so the Spark side (numpy ray
    casting over these exact doubles) and the SQL side (literal reprs of
    the same doubles) evaluate identical IEEE754 arithmetic."""
    x0, y0, x1, y1 = BBOX
    w, h = x1 - x0, y1 - y0
    return [
        {  # L-shape covering west strip + south strip
            "boundary_id": 0,
            "ring": [
                (x0, y0), (x0 + 0.6 * w, y0), (x0 + 0.6 * w, y0 + 0.3 * h),
                (x0 + 0.3 * w, y0 + 0.3 * h), (x0 + 0.3 * w, y0 + 0.8 * h),
                (x0, y0 + 0.8 * h),
            ],
        },
        {  # triangle in the northeast
            "boundary_id": 1,
            "ring": [
                (x0 + 0.5 * w, y0 + 0.5 * h), (x1, y0 + 0.5 * h), (x1, y1),
            ],
        },
    ]


def q_pip_polygon() -> str:
    """Ray-casting PIP in ANSI SQL, bit-matching operators/pip.pip_join:
    per-polygon half-open envelope prefilter, then odd crossing count over
    non-horizontal edges with the crossing abscissa computed in the same
    FP op order as the numpy kernel (``ex + (lat-ey)/(ey2-ey)*(ex2-ex)``).
    Horizontal edges never straddle and are dropped up front (also keeps
    the SQL free of divide-by-zero)."""
    env_rows, edge_rows = [], []
    for p in pip_polygons():
        pid = p["boundary_id"]
        ring = p["ring"]
        xs = [v[0] for v in ring]
        ys = [v[1] for v in ring]
        env_rows.append(
            f"({pid}, {min(xs)!r}, {min(ys)!r}, {max(xs)!r}, {max(ys)!r})"
        )
        m = len(ring)
        for i in range(m):
            ex, ey = ring[i]
            ex2, ey2 = ring[(i + 1) % m]
            if ey == ey2:
                continue
            edge_rows.append(f"({pid}, {ex!r}, {ey!r}, {ex2!r}, {ey2!r})")
    return (
        f"{INSTANCE_CTE},\n"
        "envs(boundary_id, ex0, ey0, ex1, ey1) AS (VALUES "
        + ", ".join(env_rows)
        + "),\nedges(boundary_id, vx, vy, vx2, vy2) AS (VALUES "
        + ", ".join(edge_rows)
        + "),\n"
        "cand AS (SELECT i.doc_id, i.lon, i.lat, v.boundary_id FROM instances i "
        "JOIN envs v ON i.lon >= v.ex0 AND i.lon < v.ex1 "
        "AND i.lat >= v.ey0 AND i.lat < v.ey1)\n"
        "SELECT c.doc_id, CAST(c.boundary_id AS BIGINT) AS boundary_id "
        "FROM cand c JOIN edges e ON e.boundary_id = c.boundary_id "
        "AND ((e.vy > c.lat) <> (e.vy2 > c.lat)) "
        "AND c.lon < e.vx + (c.lat - e.vy) / (e.vy2 - e.vy) * (e.vx2 - e.vx) "
        "GROUP BY c.doc_id, c.boundary_id HAVING COUNT(*) % 2 = 1"
    )


def q_knn_per_tile(k: int = 3, max_features: int = 50, max_level: int = 6) -> str:
    """Per-tile exact kNN over the leaf assignment: self-join within
    (level, x, y) + window rank. d2 uses the same FP op order as the
    recomputed distance in operators/knn.knn_pairs_batch; ties break on
    (d2, neighbor_id) in both engines."""
    lvl_cases_x = " ".join(
        f"WHEN t.level = {lvl} THEN {cell_expr('x', lvl)}" for lvl in range(max_level + 1)
    )
    lvl_cases_y = " ".join(
        f"WHEN t.level = {lvl} THEN {cell_expr('y', lvl)}" for lvl in range(max_level + 1)
    )
    return (
        f"{tree_ctes(max_features, max_level)},\n"
        f"content AS ({tree_select(max_features, max_level)}"
        f"), leaves AS (SELECT level, x, y FROM content WHERE content_available),\n"
        f"assigned AS (SELECT i.doc_id, i.lon, i.lat, t.level, t.x, t.y "
        f"FROM instances i JOIN leaves t "
        f"ON (CASE {lvl_cases_x} END) = t.x AND (CASE {lvl_cases_y} END) = t.y),\n"
        "d AS (SELECT a.level, a.x, a.y, a.doc_id AS id, b.doc_id AS neighbor_id, "
        "(a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) AS d2 "
        "FROM assigned a JOIN assigned b ON a.level = b.level AND a.x = b.x "
        "AND a.y = b.y AND a.doc_id <> b.doc_id),\n"
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY level, x, y, id "
        "ORDER BY d2 ASC, neighbor_id ASC) AS rank FROM d)\n"
        f"SELECT CAST(level AS INT) AS level, x, y, id, neighbor_id, "
        f"CAST(rank AS INT) AS rank, d2 FROM r WHERE rank <= {k}"
    )


def q_range_join(grid: int = 8, level: int = 3, margin: float = 0.1) -> str:
    cw = _W / grid
    ch = _H / grid
    n = 1 << level
    tw = _W / n
    th = _H / n
    return (
        f"WITH rasters AS (SELECT CAST(r AS BIGINT) AS raster_id, "
        f"{_X0!r} + (r % {grid}) * {cw!r} - {cw * margin!r} AS min_lon, "
        f"{_X0!r} + (r % {grid} + 1) * {cw!r} + {cw * margin!r} AS max_lon, "
        f"{_Y0!r} + (r // {grid}) * {ch!r} - {ch * margin!r} AS min_lat, "
        f"{_Y0!r} + (r // {grid} + 1) * {ch!r} + {ch * margin!r} AS max_lat "
        f"FROM range({grid * grid}) t(r)),\n"
        f"tiles AS (SELECT CAST(c % {n} AS BIGINT) AS x, CAST(c // {n} AS BIGINT) AS y, "
        f"{_X0!r} + (c % {n}) * {tw!r} AS min_lon, {_X0!r} + (c % {n} + 1) * {tw!r} AS max_lon, "
        f"{_Y0!r} + (c // {n}) * {th!r} AS min_lat, {_Y0!r} + (c // {n} + 1) * {th!r} AS max_lat "
        f"FROM range({n * n}) t(c))\n"
        "SELECT r.raster_id, t.x, t.y FROM rasters r JOIN tiles t "
        "ON r.min_lon < t.max_lon AND r.max_lon > t.min_lon "
        "AND r.min_lat < t.max_lat AND r.max_lat > t.min_lat"
    )


# ---------------------------------------------------------------------------
# dedup / text / similarity
# ---------------------------------------------------------------------------

def q_dedup_exact() -> str:
    return (
        f"SELECT md5({NORM_TEXT}) AS text_hash, MIN(doc_id) AS representative, "
        "COUNT(*) AS n_dups FROM documents GROUP BY 1"
    )


_SHINGLES = (
    f"norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents),\n"
    "nums AS (SELECT CAST(n AS INT) AS s FROM range(1, 100001) t(n)),\n"
    "sh AS (SELECT DISTINCT doc_id, substring(tt, s, {n}) AS shingle "
    "FROM norm JOIN nums ON s <= GREATEST(length(tt) - {n_minus_1}, 1))"
)


def _shingle_cte(n: int) -> str:
    return _SHINGLES.format(n=n, n_minus_1=n - 1)


def _sigs_cte(n_bands: int, rows_per_band: int) -> str:
    """Banded-minhash signature CTEs (matches operators/dedup.
    minhash_signatures): hash i = band*rows_per_band + row is the 8-hex
    word i % 8 of sha256((i // 8) || '#' || shingle)."""
    return (
        f"hashes AS (SELECT CAST(hid // {rows_per_band} AS BIGINT) AS band, "
        f"hid % {rows_per_band} AS row, "
        f"CAST(hid // 8 AS VARCHAR) AS dgst, (hid % 8) * 8 + 1 AS wpos "
        f"FROM range({n_bands * rows_per_band}) t(hid)),\n"
        "mh AS (SELECT doc_id, band, row, "
        "MIN(substring(sha256(dgst || '#' || shingle), wpos, 8)) AS mh "
        "FROM sh, hashes GROUP BY doc_id, band, row),\n"
        "sigs AS (SELECT doc_id, band, "
        "STRING_AGG(CAST(row AS VARCHAR) || ':' || mh, '|' "
        "ORDER BY row) AS sig "
        "FROM mh GROUP BY doc_id, band)"
    )


def q_minhash_sigs(n_bands: int = 4, shingle_n: int = 5, rows_per_band: int = 2) -> str:
    return (
        f"WITH {_shingle_cte(shingle_n)},\n{_sigs_cte(n_bands, rows_per_band)}\n"
        "SELECT doc_id, band, sig FROM sigs"
    )


def q_lsh_pairs(n_bands: int = 4, shingle_n: int = 5, rows_per_band: int = 2) -> str:
    return (
        f"WITH {_shingle_cte(shingle_n)},\n{_sigs_cte(n_bands, rows_per_band)}\n"
        "SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM sigs l JOIN sigs r "
        "ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id"
    )


def q_simhash(bits: int = 16) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN substring(h, {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    total = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents),\n"
        "toks AS (SELECT doc_id, md5(tok) AS h FROM norm, "
        "LATERAL unnest(string_split(tt, ' ')) u(tok) WHERE length(tok) > 0),\n"
        f"s AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)\n"
        f"SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM s"
    )


def q_ngram_jaccard(n: int = 3, n_bands: int = 4, shingle_n: int = 5,
                    rows_per_band: int = 2) -> str:
    return (
        f"WITH {_shingle_cte(shingle_n)},\n{_sigs_cte(n_bands, rows_per_band)},\n"
        "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM sigs l JOIN sigs r "
        "ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id),\n"
        f"sh3 AS (SELECT DISTINCT doc_id, substring(tt, s, {n}) AS shingle "
        f"FROM norm JOIN nums ON s <= GREATEST(length(tt) - {n - 1}, 1)),\n"
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh3 GROUP BY doc_id),\n"
        "inter AS (SELECT c.a, c.b, COUNT(*) AS n_inter FROM cand c "
        "JOIN sh3 sa ON sa.doc_id = c.a JOIN sh3 sb ON sb.doc_id = c.b "
        "AND sa.shingle = sb.shingle GROUP BY c.a, c.b)\n"
        "SELECT i.a, i.b, i.n_inter, za.sz AS sz_a, zb.sz AS sz_b, "
        "CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter) AS jaccard "
        "FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b"
    )


def q_cosine_topk(k: int = 5, n_query: int = 10) -> str:
    dot = "list_dot_product(q.e, c.e)"
    nq = "sqrt(list_dot_product(q.e, q.e))"
    nc = "sqrt(list_dot_product(c.e, c.e))"
    return (
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),\n"
        f"q AS (SELECT vec_id, e FROM v WHERE vec_id < {n_query}),\n"
        "c AS (SELECT vec_id, e FROM v),\n"
        "d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
        f"ROUND({dot} / ({nq} * {nc}), 6) AS cosine FROM q, c "
        "WHERE q.vec_id != c.vec_id),\n"
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM d)\n"
        f"SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM r WHERE rank <= {k}"
    )


def q_text_tokens() -> str:
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents)\n"
        "SELECT doc_id, CAST(CASE WHEN length(tt) = 0 THEN 0 ELSE "
        "len(string_split(tt, ' ')) END AS BIGINT) AS n_tokens, "
        f"CAST(len(regexp_extract_all(tt, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens "
        "FROM norm"
    )


def q_text_quality() -> str:
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents),\n"
        "c AS (SELECT doc_id, CAST(length(tt) AS BIGINT) AS n, "
        "CAST(length(tt) - length(regexp_replace(tt, '[a-z]', '', 'g')) AS BIGINT) AS alpha, "
        "CAST(length(tt) - length(regexp_replace(tt, '[0-9]', '', 'g')) AS BIGINT) AS digit, "
        "CAST(length(tt) - length(regexp_replace(tt, ' ', '', 'g')) AS BIGINT) AS space, "
        "CAST(CASE WHEN length(tt) = 0 THEN 0 ELSE len(string_split(tt, ' ')) END AS BIGINT) AS ntok "
        "FROM norm)\n"
        "SELECT doc_id, n AS n_chars_norm, ntok AS n_tokens, "
        "alpha / GREATEST(n, 1) AS alpha_ratio, "
        "digit / GREATEST(n, 1) AS digit_ratio, "
        "(n - alpha - digit - space) / GREATEST(n, 1) AS punct_ratio, "
        "(n - space) / GREATEST(ntok, 1) AS mean_token_len FROM c"
    )


def q_text_langid(n: int | None = None, top_k: int | None = None) -> str:
    """Cavnar-Trenkle trigram language ID (functions/text.lang_id_ngram):
    the oracle inlines the SAME rank-weighted profile table the engine
    broadcasts (pure function of the embedded samples), reproduces the
    n-gram explode with substring positions, and applies the identical
    (score DESC, lang ASC) argmax. Integer weights/sums -> bit-exact."""
    from .functions.text import LANGID_NGRAM_N, LANGID_TOP_K, ngram_profiles

    # default to the engine's own constants so a profile retune can never
    # silently diverge the oracle from the query (r4: top_k 300 -> 700)
    n = LANGID_NGRAM_N if n is None else n
    top_k = LANGID_TOP_K if top_k is None else top_k
    profiles = ngram_profiles(n, top_k)
    rows = []
    for lang in sorted(profiles):
        for g, w in sorted(profiles[lang].items()):
            ge = g.replace("'", "''")
            rows.append(f"('{ge}','{lang}',{w})")
    return (
        f"WITH prof(gram, lang, weight) AS (VALUES {','.join(rows)}),\n"
        f"norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents),\n"
        "nums AS (SELECT CAST(x AS INT) AS s FROM range(1, 100001) t(x)),\n"
        f"g AS (SELECT DISTINCT doc_id, substring(tt, s, {n}) AS gram "
        f"FROM norm JOIN nums ON s <= GREATEST(length(tt) - {n - 1}, 1)),\n"
        "sc AS (SELECT doc_id, lang, CAST(SUM(weight) AS BIGINT) AS score "
        "FROM g JOIN prof USING (gram) GROUP BY doc_id, lang),\n"
        "b AS (SELECT doc_id, lang, score, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM sc)\n"
        "SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred, "
        "COALESCE(b.score, CAST(0 AS BIGINT)) AS lang_score FROM documents d "
        "LEFT JOIN (SELECT * FROM b WHERE rn = 1) b ON d.doc_id = b.doc_id"
    )


def q_text_fingerprint() -> str:
    # rolling hash over first 32 chars, base 131 mod 1e9+7 (integer only)
    h = "CAST(0 AS BIGINT)"
    for i in range(1, 33):
        c = f"(CASE WHEN length(tt) >= {i} THEN ascii(substring(tt, {i}, 1)) ELSE 0 END)"
        h = f"(({h}) * 131 + {c}) % 1000000007"
    return (
        f"WITH norm AS (SELECT doc_id, {NORM_TEXT} AS tt FROM documents)\n"
        f"SELECT doc_id, md5(tt) AS fp_md5, CAST({h} AS BIGINT) AS fp_roll FROM norm"
    )


def q_events_hourly() -> str:
    return (
        "SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, "
        "COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )


def q_subtree_bits(max_features: int = 50, max_level: int = 6) -> str:
    """Root-subtree availability bitstreams (subtree_levels=2) as rows
    (stream, bit_index, bit). Morton for 1-2 bit coords is pure arithmetic:
    level-1 index = x + 2y; level-2 child index = (x&1) + 2(y&1) + 4(x>>1)
    + 8(y>>1)."""
    return (
        f"{tree_ctes(max_features, max_level)},\n"
        f"t AS ({tree_select(max_features, max_level)}),\n"
        "interior AS (SELECT CASE WHEN level = 0 THEN 0 ELSE 1 + CAST(x + 2*y AS INT) END AS bit_index, "
        "(n_instances > 0) AS tile_bit, content_available AS content_bit "
        "FROM t WHERE level <= 1),\n"
        "boundary AS (SELECT CAST((x % 2) + 2*(y % 2) + 4*(x // 2) + 8*(y // 2) AS INT) AS bit_index, "
        "(n_instances > 0) AS child_bit FROM t WHERE level = 2),\n"
        "pos5 AS (SELECT CAST(p AS INT) AS bit_index FROM range(5) r(p)),\n"
        "pos16 AS (SELECT CAST(p AS INT) AS bit_index FROM range(16) r(p))\n"
        "SELECT 'tile' AS stream, p.bit_index, "
        "CAST(COALESCE(MAX(CASE WHEN i.tile_bit THEN 1 ELSE 0 END), 0) AS INT) AS bit "
        "FROM pos5 p LEFT JOIN interior i ON i.bit_index = p.bit_index GROUP BY p.bit_index\n"
        "UNION ALL\n"
        "SELECT 'content' AS stream, p.bit_index, "
        "CAST(COALESCE(MAX(CASE WHEN i.content_bit THEN 1 ELSE 0 END), 0) AS INT) AS bit "
        "FROM pos5 p LEFT JOIN interior i ON i.bit_index = p.bit_index GROUP BY p.bit_index\n"
        "UNION ALL\n"
        "SELECT 'child' AS stream, p.bit_index, "
        "CAST(COALESCE(MAX(CASE WHEN b.child_bit THEN 1 ELSE 0 END), 0) AS INT) AS bit "
        "FROM pos16 p LEFT JOIN boundary b ON b.bit_index = p.bit_index GROUP BY p.bit_index"
    )


def q_lineitem_pricing() -> str:
    """TPC-H-Q1-shaped pricing summary over the driver's lineitem table —
    exercises the general hash-aggregate surface the generalized engine
    inherits from Spark (the reference itself has only count/extent aggs,
    SURVEY.md §2.4). Sums go through DECIMAL so both engines accumulate
    exactly (double sums are addition-order-dependent); the final CAST to
    DOUBLE of an exact decimal is deterministic."""
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    )


def q_orders_topk_join() -> str:
    """TPC-H-Q3-shaped 3-way join + top-k — exercises the broadcast/shuffle
    join surface. Revenue stays DECIMAL through the ORDER BY (exact, so
    both engines pick the same top-k) and only the final projection casts
    to DOUBLE; tie-break on o_orderkey."""
    return (
        "SELECT o_orderkey, CAST(revenue AS DOUBLE) AS revenue, o_orderdate FROM ("
        "SELECT o.o_orderkey, "
        "SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS revenue, "
        "o.o_orderdate "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00' "
        "GROUP BY o.o_orderkey, o.o_orderdate) t "
        "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"
    )


# ---------------------------------------------------------------------------
# multimodal columns (operators/multimodal.py)
# ---------------------------------------------------------------------------

# Deterministic synthetic media blobs: ASCII magic prefix chosen by
# doc_id % 4, concatenated with the document text and utf-8 encoded. ASCII
# prefixes (GIF8 / RIFF / ID3) keep the blob valid UTF-8 so DuckDB's
# md5(VARCHAR) hashes the same bytes Spark's F.md5(BINARY) does.
_MEDIA_CTE = (
    "media AS (SELECT doc_id AS media_id, "
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'GIF8' WHEN 1 THEN 'RIFF' "
    "WHEN 2 THEN 'ID3' ELSE '' END || text AS blob_str FROM documents)"
)


def q_media_metadata() -> str:
    """media_metadata: byte size + md5 fingerprint + magic-byte sniff.
    The sniff CASE mirrors operators/multimodal._MAGIC for the prefixes
    reachable from valid UTF-8 text (the non-ASCII magics cannot occur)."""
    return (
        f"WITH {_MEDIA_CTE}\n"
        "SELECT media_id, "
        "CAST(octet_length(encode(blob_str)) AS BIGINT) AS media_bytes, "
        "md5(blob_str) AS media_md5, "
        "CASE WHEN blob_str LIKE 'GIF8%' THEN 'image/gif' "
        "WHEN blob_str LIKE 'RIFF%' THEN 'audio/wav-or-avi' "
        "WHEN blob_str LIKE 'ID3%' THEN 'audio/mp3' "
        "ELSE 'application/octet-stream' END AS media_type "
        "FROM media"
    )


def q_video_frames(n_frames: int = 4) -> str:
    """sample_video_frames stub: frame i = b'FRAME:i:' + md5(blob).digest().
    Compared as hex (Spark F.hex / DuckDB hex are both uppercase; md5 hex
    is lowercase in both, upper() = hex of the raw digest)."""
    return (
        f"WITH {_MEDIA_CTE},\n"
        f"idx AS (SELECT CAST(p AS INT) AS frame_index FROM range({n_frames}) r(p))\n"
        "SELECT media_id, frame_index, "
        "hex(encode('FRAME:' || frame_index || ':')) || upper(md5(blob_str)) AS frame_hex "
        "FROM media CROSS JOIN idx"
    )


def q_resize_images(width: int = 64, height: int = 64) -> str:
    """resize_images stub: b'RESIZED:WxH:' + md5(blob).digest(), as hex."""
    return (
        f"WITH {_MEDIA_CTE}\n"
        "SELECT media_id, "
        f"hex(encode('RESIZED:{width}x{height}:')) || upper(md5(blob_str)) AS resized_hex "
        "FROM media"
    )


def q_cluster_counts(max_features: int = 50, max_level: int = 6) -> str:
    """Clustering-mode LOD reduction, checked on COUNTS — the reference's
    own test criterion (tests/Clustering/ClusteringTests.cs:36-37 asserts
    exactly-k, not member identity). With clustering on, every visited
    tile with cnt > 0 holds content (over-full tiles get reduced content
    AND recurse, src/ImplicitTiling.cs:47-66), and the reduced row count
    is exactly LEAST(cnt, max_features)."""
    return (
        f"{tree_ctes(max_features, max_level)}\n"
        f"SELECT CAST(level AS INT) AS level, x, y, "
        f"CAST(LEAST(cnt, {max_features}) AS BIGINT) AS n_reduced "
        f"FROM tree WHERE cnt > 0"
    )


def q_near_dup_exact(threshold: float = 0.3) -> str:
    """embedding_near_dup with n_planes=0 (single LSH bucket) = exact
    all-pairs near-dup; threshold applies to the 6-decimal-rounded cosine
    exactly as the engine filters."""
    dot = "list_dot_product(a.e, b.e)"
    na = "sqrt(list_dot_product(a.e, a.e))"
    nb = "sqrt(list_dot_product(b.e, b.e))"
    return (
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),\n"
        "p AS (SELECT a.vec_id AS a, b.vec_id AS b, "
        f"ROUND({dot} / ({na} * {nb}), 6) AS cosine "
        "FROM v a, v b WHERE a.vec_id < b.vec_id)\n"
        f"SELECT a, b, cosine FROM p WHERE cosine >= {threshold}"
    )


def q_ann_exact_parity(k: int = 5, n_query: int = 10) -> str:
    """Both ANN paths in their degenerate-exact configurations (IVF with
    n_probe == n_lists, LSH with n_planes = 0) reduce to exact top-k, so
    one brute-force oracle checks codebook assignment, bucket/list joins,
    and re-rank end to end for both methods."""
    return (
        "SELECT m.method, b.query_id, b.neighbor_id, b.rank, b.cosine "
        f"FROM ({q_cosine_topk(k, n_query)}) b "
        "CROSS JOIN (VALUES ('ivf'), ('lsh')) m(method)"
    )


def q_ann_recall(k: int = 5, n_query: int = 10) -> str:
    """Golden expectation for the recall@k gate: every approximate method
    must clear its documented recall threshold vs the in-engine exact
    top-k (the engine computes the actual recall; the oracle pins the
    verdict, k, and query-set size)."""
    return (
        f"SELECT method, CAST({k} AS INT) AS k, "
        f"CAST({n_query} AS INT) AS n_queries, TRUE AS recall_ok "
        "FROM (VALUES ('ivf'), ('lsh'), ('lsh_multiprobe')) m(method) "
        "ORDER BY method"
    )


def q_embedding_near_dup(
    threshold: float = 0.3, dim: int = 64, n_planes: int = 4, seed: int = 42,
    max_bucket_size: int | None = None,
) -> str:
    """Bucketed near-dup pairs with the LSH signature REPRODUCED IN SQL:
    the oracle derives the same seeded +-1 hyperplanes as
    operators/similarity.hyperplane_signature and computes each vector's
    bucket via list_dot_product against plane-coefficient literals, so the
    bucket-restricted pair semantics (not just the cosine filter) are
    oracle-checked. Sign threshold dot > 0 in float64 on both sides; +-1
    coefficients keep dots far from reassociation noise."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.choice([-1.0, 1.0], size=(n_planes, dim))
    sig_terms = []
    for p in range(n_planes):
        coeffs = ", ".join(str(float(c)) for c in planes[p])
        sig_terms.append(
            f"(CASE WHEN list_dot_product(e, [{coeffs}]) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    sig = " + ".join(sig_terms)
    dot = "list_dot_product(a.e, b.e)"
    na = "sqrt(list_dot_product(a.e, a.e))"
    nb = "sqrt(list_dot_product(b.e, b.e))"
    cap_cte = ""
    cap_join = ""
    if max_bucket_size is not None:
        # mirror the engine's max_bucket_size: buckets above the cap are
        # dropped entirely before pairing
        cap_cte = (
            f"ok AS (SELECT sig FROM s GROUP BY sig "
            f"HAVING COUNT(*) <= {max_bucket_size}),\n"
        )
        cap_join = "JOIN ok ON a.sig = ok.sig "
    return (
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings),\n"
        f"s AS (SELECT vec_id, e, {sig} AS sig FROM v),\n"
        f"{cap_cte}"
        "p AS (SELECT a.vec_id AS a, b.vec_id AS b, "
        f"ROUND({dot} / ({na} * {nb}), 6) AS cosine "
        f"FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id "
        f"{cap_join})\n"
        f"SELECT a, b, cosine FROM p WHERE cosine >= {threshold}"
    )


def q_image_features(dim: int = 16) -> str:
    """Deterministic stub 'decode': feature i = (md5-digest byte (i mod 16)
    + i) mod 256 — SQL-expressible (hex-nibble arithmetic over md5), so the
    codec-seam plumbing (mapInPandas batching, schema, null handling) is
    oracle-checked even though the 'decode' is a documented fake."""
    b1 = "strpos('0123456789abcdef', substr(h, 2 * (feature_index % 16) + 1, 1)) - 1"
    b2 = "strpos('0123456789abcdef', substr(h, 2 * (feature_index % 16) + 2, 1)) - 1"
    return (
        f"WITH {_MEDIA_CTE},\n"
        "hm AS (SELECT media_id, md5(blob_str) AS h FROM media),\n"
        f"idx AS (SELECT CAST(p AS INT) AS feature_index FROM range({dim}) r(p))\n"
        "SELECT media_id, feature_index, "
        f"CAST((({b1}) * 16 + ({b2}) + feature_index) % 256 AS DOUBLE) AS feature "
        "FROM hm CROSS JOIN idx"
    )


# ---------------------------------------------------------------------------
# general SQL surface — engine inheritance beyond the reference (§2.5 gaps:
# the reference has no windows/sorts/set-ops; the generalized engine gets
# them from Spark, checked by running the SAME SQL text in both engines)
# ---------------------------------------------------------------------------

#: fixed serving-path probe bbox (inside DOCS_BBOX), shared with the Spark
#: side of the serve_tiles_bbox gate row
SERVE_BBOX = (34.02, 44.03, 34.06, 44.07)


def q_serve_tiles_bbox(max_features: int = 50, max_level: int = 6,
                       bounds=DOCS_BBOX, bbox=SERVE_BBOX) -> str:
    """Oracle for the serving path (plans/serve.tiles_in_bbox): the content
    tiles of the decision-table tree whose cell rectangle intersects
    ``bbox``. The per-level inclusive index ranges are recomputed here with
    independent floor/clamp arithmetic (the same convention as the tiling
    kernel: bbox corners map through the point kernel, edges clamp) and
    inlined as constants — the engine side instead parses tile keys out of
    a real export's sink-manifest relpaths and broadcast-joins its own
    closed-form range table."""
    import math

    xmin, ymin, xmax, ymax = (float(v) for v in bounds[:4])
    qx0, qy0, qx1, qy1 = (float(v) for v in bbox)

    def _idx(v: float, lo: float, hi: float, n: int) -> int:
        return min(max(math.floor((v - lo) / (hi - lo) * n), 0), n - 1)

    clauses = []
    for lvl in range(max_level + 1):
        n = 1 << lvl
        x0, x1 = _idx(qx0, xmin, xmax, n), _idx(qx1, xmin, xmax, n)
        y0, y1 = _idx(qy0, ymin, ymax, n), _idx(qy1, ymin, ymax, n)
        clauses.append(
            f"(level = {lvl} AND x BETWEEN {x0} AND {x1} "
            f"AND y BETWEEN {y0} AND {y1})"
        )
    where = " OR ".join(clauses)
    return (
        f"{tree_ctes(max_features, max_level)},\n"
        f"content AS ({tree_select(max_features, max_level)})\n"
        f"SELECT level, x, y FROM content "
        f"WHERE content_available AND ({where})"
    )


def q_region_revenue() -> str:
    """TPC-H-Q5-shaped 6-table join: revenue per region/nation where the
    customer and supplier share a nation. Decimal-exact sum."""
    return (
        "SELECT r_name, n_name, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    )


def q_events_topk_window() -> str:
    """Window-function surface: top-5 events by value per type
    (deterministic tie-break on event_id)."""
    return (
        "SELECT event_type, event_id, value, rnk FROM ("
        "SELECT event_type, event_id, value, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id ASC) AS INT) AS rnk "
        "FROM events) t WHERE rnk <= 5"
    )


def q_customers_without_orders() -> str:
    """Anti-join surface (NOT EXISTS -> left-anti in Catalyst). The
    priority filter makes the result non-empty on the synthetic data
    (every customer has SOME order; ~14% have no urgent one)."""
    return (
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT')"
    )


def q_pricing_rollup() -> str:
    """Grouping-sets surface: ROLLUP super-aggregates (absent from the
    reference, SURVEY.md §2.4 'no grouping sets')."""
    return (
        "SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, "
        "COALESCE(l_linestatus, 'ALL') AS linestatus, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    )


def q_nations_setops() -> str:
    """Set-op surface: nations having both customers and suppliers."""
    return (
        "SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey "
        "INTERSECT "
        "SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey"
    )


def q_asof_join() -> str:
    """Backward as-of join oracle via DuckDB's native ASOF LEFT JOIN:
    each click event picks up the latest purchase value (per user) at or
    before its timestamp. The right side is deduped per (user, ts) so the
    match is well-defined (operators/asof.py determinism note)."""
    return (
        "WITH l AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'),\n"
        "r AS (SELECT user_id, ts, MAX(value) AS pval FROM events "
        "WHERE event_type = 'purchase' GROUP BY 1, 2)\n"
        "SELECT l.event_id, l.user_id, "
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts, ROUND(r.pval, 6) AS pval "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"
    )


def q_events_daily_rollup() -> str:
    """Daily aggregate computed DIRECTLY from raw rows — the engine side
    derives it from hourly partials instead; equality proves the
    hierarchical rollup is lossless (DECIMAL sums are associative)."""
    return (
        "SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1, 2"
    )


def q_dedup_components(n_bands: int = 4, shingle_n: int = 9,
                       rows_per_band: int = 4) -> str:
    """Connected components over the LSH candidate-pair graph via a
    recursive CTE: every node labeled with the MIN reachable doc_id
    (the engine's iterative min-label propagation must agree exactly)."""
    return (
        f"WITH RECURSIVE {_shingle_cte(shingle_n)},\n"
        f"{_sigs_cte(n_bands, rows_per_band)},\n"
        "p AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM sigs l "
        "JOIN sigs r ON l.band = r.band AND l.sig = r.sig "
        "AND l.doc_id < r.doc_id),\n"
        "e AS (SELECT a AS src, b AS dst FROM p "
        "UNION SELECT b AS src, a AS dst FROM p),\n"
        "reach(node, m) AS (SELECT src, src FROM e "
        "UNION SELECT e.dst, reach.m FROM reach JOIN e ON e.src = reach.node)\n"
        "SELECT node, MIN(m) AS comp FROM reach GROUP BY node"
    )


def q_stratified_sample(per_group: int = 20) -> str:
    """Deterministic stratified sampling: keep ``per_group`` docs per lang
    in md5-of-id order — the seedless, engine-independent sampling recipe
    a training pipeline uses to take reproducible slices at any scale
    (md5 hex compares identically everywhere; doc_id breaks exact-hash
    ties, which cannot occur, but makes the order total by construction)."""
    return (
        "SELECT doc_id, lang FROM ("
        "SELECT doc_id, lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk "
        f"FROM documents) t WHERE rk <= {per_group}"
    )


def q_term_freq_topk(k: int = 50) -> str:
    """Corpus term frequency top-k — the canonical shuffle-heavy
    explode+aggregate (map-side partial agg keeps the shuffle at
    O(distinct terms), not O(tokens))."""
    return (
        "WITH toks AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok "
        "FROM documents)\n"
        "SELECT tok, COUNT(*) AS n FROM toks WHERE tok != '' "
        f"GROUP BY tok ORDER BY n DESC, tok ASC LIMIT {k}"
    )


def q_sessionize(gap_seconds: int = 1800) -> str:
    """Gap-based session numbering (operators/sessionize.py): lag gap ->
    new-session flag -> running sum, (ts, event_id) tie-break. epoch()
    differences are timezone-invariant, matching Spark's long cast."""
    return (
        "SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id FROM ("
        "SELECT event_id, user_id, "
        "SUM(CASE WHEN prev_ts IS NULL OR "
        f"CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT) > {gap_seconds} "
        "THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id "
        "FROM (SELECT event_id, user_id, ts, "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        "FROM events) t1) t2"
    )


def q_pricing_cube() -> str:
    """CUBE grouping sets (completes the grouping-sets surface beside
    ROLLUP): all four aggregation levels over returnflag x linestatus."""
    return (
        "SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, "
        "COALESCE(l_linestatus, 'ALL') AS linestatus, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
    )


def q_events_percentiles() -> str:
    """Exact interpolated percentiles per group (ordered statistics —
    absent from the reference; Spark percentile == DuckDB quantile_cont,
    both linear interpolation on the sorted values)."""
    return (
        "SELECT event_type, "
        "ROUND(quantile_cont(value, 0.5), 6) AS p50, "
        "ROUND(quantile_cont(value, 0.9), 6) AS p90 "
        "FROM events GROUP BY event_type"
    )
