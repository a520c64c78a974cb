"""Serving-path bbox queries (plans/serve) against a finished export.

Correctness model: brute force over the same artifacts — a tile belongs in
the answer iff its cell rectangle intersects the bbox; an instance iff its
lon/lat is inside. The operators must agree with the model exactly, answer
from manifests/checkpoints only (no re-tiling), and the instance path must
push its lon/lat predicates into the parquet scan.
"""
from __future__ import annotations

import json
import os

import pytest

from i3dm_export_spark.config import Bounds, ExportOptions
from i3dm_export_spark.plans.pipeline import run_export
from i3dm_export_spark.plans.serve import (
    bbox_tile_range,
    instances_in_bbox,
    query_bbox_summary,
    tiles_in_bbox,
)
from i3dm_export_spark.sources.pages import DOCS_BBOX, pages_df

BB = Bounds(*DOCS_BBOX)
BOX = (BB.xmin, BB.ymin, BB.xmax, BB.ymax)
OPTS = ExportOptions(max_features_per_tile=60, max_level=8, use_i3dm=True)
# interior sub-box of DOCS_BBOX (34.0..34.1 lon, 44.0..44.1 lat)
# corners deliberately OFF every cell boundary (34.05 is the
# midpoint = a boundary at every level >= 1; an edge exactly on a
# boundary is float-ambiguous between the geometric model and the
# floor/clamp kernel)
QBOX = (34.021, 44.032, 34.047, 44.063)


@pytest.fixture(scope="module")
def export_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("serve") / "out")
    run_export(pages_df(spark, 900), OPTS, out, bounds=BB)
    return out


def _cell_rect(bounds, level, x, y):
    xmin, ymin, xmax, ymax = bounds[0], bounds[1], bounds[2], bounds[3]
    n = 1 << level
    tw, th = (xmax - xmin) / n, (ymax - ymin) / n
    return (xmin + x * tw, ymin + y * th, xmin + (x + 1) * tw,
            ymin + (y + 1) * th)


class TestServe:
    def test_tiles_match_brute_force_intersection(self, spark, export_dir):
        got = {
            (r["level"], r["x"], r["y"]): r["relpath"]
            for r in tiles_in_bbox(spark, export_dir, QBOX).collect()
        }
        # model: every manifest tile whose rectangle intersects QBOX
        content = os.path.join(export_dir, "content")
        expect = {}
        for fn in os.listdir(content):
            lv, x, y = (int(v) for v in fn.split(".")[0].split("_"))
            rx0, ry0, rx1, ry1 = _cell_rect(BOX, lv, x, y)
            if not (rx1 < QBOX[0] or rx0 > QBOX[2]
                    or ry1 < QBOX[1] or ry0 > QBOX[3]):
                expect[(lv, x, y)] = fn
        assert got == expect
        assert 0 < len(got) < len(os.listdir(content))  # real subset

    def test_instances_match_brute_force_filter(self, spark, export_dir):
        got = sorted(
            r["url"] for r in
            instances_in_bbox(spark, export_dir, QBOX).collect()
        )
        assigned = spark.read.parquet(
            os.path.join(export_dir, "_checkpoints", "stage3_assigned"))
        expect = sorted(
            r["url"] for r in assigned.collect()
            if QBOX[0] <= r["lon"] <= QBOX[2]
            and QBOX[1] <= r["lat"] <= QBOX[3]
        )
        assert got == expect and 0 < len(got) < assigned.count()

    def test_instance_filter_pushes_down(self, spark, export_dir):
        plan = instances_in_bbox(spark, export_dir, QBOX)._jdf \
            .queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters")[1][:400]
        # Spark truncates the rendered filter list, so assert on the
        # leading predicates only
        assert "GreaterThanOrEqual(lon" in pushed
        assert "LessThanOrEqual(lon" in pushed

    def test_degenerate_and_full_bbox(self, spark, export_dir):
        full = tiles_in_bbox(spark, export_dir, BOX).count()
        assert full == len(os.listdir(os.path.join(export_dir, "content")))
        outside = tiles_in_bbox(
            spark, export_dir, (0.0, 0.0, 1.0, 1.0))
        # edge clamping maps an outside bbox onto edge cells (same
        # convention as tile_xy) — it must not error; instances are empty
        assert outside.count() >= 0
        assert instances_in_bbox(
            spark, export_dir, (0.0, 0.0, 1.0, 1.0)).count() == 0

    def test_bbox_tile_range_closed_form(self):
        # level 1 over DOCS_BBOX: mid-split at (34.05, 44.05)
        assert bbox_tile_range(BOX, (34.0, 44.0, 34.04, 44.04), 1) \
            == (0, 0, 0, 0)
        assert bbox_tile_range(BOX, (34.06, 44.06, 34.09, 44.09), 1) \
            == (1, 1, 1, 1)
        assert bbox_tile_range(BOX, QBOX, 0) == (0, 0, 0, 0)

    def test_cli_query_bbox(self, spark, export_dir, capsys):
        from i3dm_export_spark.__main__ import main

        rep = main(["--query_bbox", "34.021,44.032,34.047,44.063",
                    "-o", export_dir], spark=spark)
        assert rep["n_tiles"] > 0 and rep["n_instances"] > 0
        assert json.loads(capsys.readouterr().out.strip())["n_tiles"] \
            == rep["n_tiles"]
        with pytest.raises(SystemExit, match="query_bbox"):
            main(["--query_bbox", "1,2,3", "-o", export_dir], spark=spark)


class TestServeRobustness:
    def test_missing_stage3_raises_clear_error(self, spark, export_dir,
                                               tmp_path):
        """VERDICT r4 #7: instances_in_bbox hard-depends on the
        stage3_assigned checkpoint; a vacuumed/missing checkpoint must be
        a clear ServingStateMissing, not a PATH_NOT_FOUND stack."""
        import shutil

        from i3dm_export_spark.plans.serve import ServingStateMissing

        clone = str(tmp_path / "clone")
        shutil.copytree(export_dir, clone)
        shutil.rmtree(os.path.join(clone, "_checkpoints", "stage3_assigned"))
        with pytest.raises(ServingStateMissing, match="stage3_assigned"):
            instances_in_bbox(spark, clone, QBOX).count()
        # tiles_in_bbox still answers (manifests survive)
        assert tiles_in_bbox(spark, clone, QBOX).count() > 0

    def test_missing_meta_raises_clear_error(self, spark, tmp_path):
        from i3dm_export_spark.plans.serve import ServingStateMissing

        with pytest.raises(ServingStateMissing, match="_export_meta"):
            tiles_in_bbox(spark, str(tmp_path), QBOX).count()

    def test_level_filter(self, spark, export_dir):
        """Per-LOD serving: level=k returns exactly the level-k slice of
        the unfiltered answer."""
        full = tiles_in_bbox(spark, export_dir, QBOX).collect()
        by_level = {}
        for r in full:
            by_level.setdefault(r["level"], set()).add((r["x"], r["y"]))
        assert len(by_level) > 1, "need multiple levels for a real test"
        for lvl, want in by_level.items():
            got = {
                (r["x"], r["y"])
                for r in tiles_in_bbox(spark, export_dir, QBOX,
                                       level=lvl).collect()
            }
            assert got == want
        # a level with no tiles answers empty, not an error
        assert tiles_in_bbox(spark, export_dir, QBOX, level=0).count() in (0, 1)
