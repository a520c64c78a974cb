"""GeoParquet CRS sniff (S1 data-driven source-CRS probe, parquet side).

The reference probes the SRID from the data (src/SpatialReferenceRepository
.cs:6-12); for parquet input the CRS lives in the GeoParquet ``geo`` footer
metadata. These tests cover the pure parser and the CLI wiring end to end:
a Web-Mercator GeoParquet file exports to the same lon/lat tile tree as an
explicit ``--source_epsg 3857`` run, with no flag given.
"""

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from i3dm_export_spark.sources.geoparquet import (
    crs_epsg_from_geo,
    read_geo_metadata,
    sniff_crs,
)


def _projjson_epsg(code: int) -> dict:
    return {
        "type": "ProjectedCRS",
        "name": f"synthetic EPSG:{code}",
        "id": {"authority": "EPSG", "code": code},
    }


class TestGeoParser:
    def test_projjson_epsg(self):
        geo = {
            "version": "1.1.0",
            "primary_column": "geometry",
            "columns": {"geometry": {"encoding": "WKB",
                                     "crs": _projjson_epsg(25831)}},
        }
        assert crs_epsg_from_geo(geo) == (25831, "geometry")

    def test_absent_crs_is_crs84(self):
        geo = {"primary_column": "geom",
               "columns": {"geom": {"encoding": "WKB"}}}
        assert crs_epsg_from_geo(geo) == (4326, "geom")
        geo["columns"]["geom"]["crs"] = None
        assert crs_epsg_from_geo(geo) == (4326, "geom")

    def test_string_crs_forms(self):
        for s, want in [("EPSG:3857", 3857), ("OGC:CRS84", 4326),
                        ("epsg:4326", 4326)]:
            geo = {"primary_column": "g",
                   "columns": {"g": {"crs": s}}}
            assert crs_epsg_from_geo(geo)[0] == want

    def test_ogc_crs84_projjson(self):
        geo = {"primary_column": "g",
               "columns": {"g": {"crs": {"id": {"authority": "OGC",
                                                "code": "CRS84"}}}}}
        assert crs_epsg_from_geo(geo) == (4326, "g")

    def test_non_epsg_authority_unresolvable(self):
        geo = {"primary_column": "g",
               "columns": {"g": {"crs": {"id": {"authority": "ESRI",
                                                "code": 102100}}}}}
        assert crs_epsg_from_geo(geo) == (None, "g")

    def test_missing_primary_column_falls_back_sorted(self):
        geo = {"columns": {"b": {"crs": _projjson_epsg(3857)},
                           "a": {"crs": _projjson_epsg(25831)}}}
        assert crs_epsg_from_geo(geo) == (25831, "a")

    def test_non_geoparquet_returns_none(self, tmp_path):
        f = str(tmp_path / "plain.parquet")
        pq.write_table(pa.table({"x": [1, 2]}), f)
        assert read_geo_metadata(f) is None
        assert sniff_crs(f) == (None, None)
        assert sniff_crs(str(tmp_path / "missing")) == (None, None)


R = 6378137.0


def _mercator(lon, lat):
    x = R * np.radians(lon)
    y = R * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


@pytest.fixture()
def mercator_geoparquet(tmp_path):
    """GeoParquet file: WKB points in EPSG:3857 under column 'geometry'
    (NOT the CLI default 'geom' — exercises the primary_column sniff),
    footer geo metadata carrying the PROJJSON CRS."""
    from i3dm_export_spark.functions.wkb import encode_wkb_point

    rng = np.random.default_rng(11)
    n = 300
    lon = 34.0 + rng.uniform(0, 0.1, n)
    lat = 44.0 + rng.uniform(0, 0.1, n)
    x, y = _mercator(lon, lat)
    tbl = pa.table({
        "url": [f"https://example.org/{i:06d}" for i in range(n)],
        "text": [f"body {i}" for i in range(n)],
        "geometry": [encode_wkb_point(float(xi), float(yi))
                     for xi, yi in zip(x, y)],
        "rotation": rng.uniform(0, 6.28, n),
        "scale": np.ones(n),
        "model": ["tree.glb"] * n,
        "tags": [json.dumps([{"customer": f"c{i % 3}"}]) for i in range(n)],
    })
    geo = {
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB",
                                 "geometry_types": ["Point"],
                                 "crs": _projjson_epsg(3857)}},
    }
    meta = dict(tbl.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo).encode()
    tbl = tbl.replace_schema_metadata(meta)
    f = str(tmp_path / "pages_3857.parquet")
    pq.write_table(tbl, f)
    return f, (float(lon.min()), float(lon.max()),
               float(lat.min()), float(lat.max()))


class TestCliSniff:
    def test_sniffed_crs_matches_explicit_flag(
        self, spark, mercator_geoparquet, tmp_path
    ):
        """No --source_epsg, geometry column not named 'geom': the sniff
        must recover both from the footer and produce a lon/lat tileset
        identical to the explicit-flag run."""
        from i3dm_export_spark.__main__ import main

        path, (lo_min, lo_max, la_min, la_max) = mercator_geoparquet
        out_sniff = str(tmp_path / "out_sniff")
        out_flag = str(tmp_path / "out_flag")
        common = ["--use_i3dm", "--max_features_per_tile", "100",
                  "--max_level", "8"]
        s1 = main(["-c", path, "-o", out_sniff, *common], spark=spark)
        s2 = main(["-c", path, "-o", out_flag, "--source_epsg", "3857",
                   "--geometrycolumn", "geometry", *common], spark=spark)
        assert s1["n_instances"] == s2["n_instances"] == 300

        def region(out):
            with open(os.path.join(out, "tileset.json")) as fh:
                return json.load(fh)["root"]["boundingVolume"]["region"]

        r_sniff, r_flag = region(out_sniff), region(out_flag)
        assert r_sniff == r_flag
        # and the region is lon/lat radians of the source box (inflated
        # root region contains it), NOT raw mercator metres
        west, south, east, north = r_sniff[:4]
        assert west <= math.radians(lo_min) and east >= math.radians(lo_max)
        assert south <= math.radians(la_min) and north >= math.radians(la_max)
        assert east < math.pi  # a metres-as-degrees bug would blow past pi

    def test_explicit_flag_overrides_sniff(
        self, spark, mercator_geoparquet, tmp_path
    ):
        """--source_epsg on the command line wins over the footer CRS:
        keep_projection + explicit 4326 treats stored coords verbatim."""
        from i3dm_export_spark.__main__ import main

        path, _ = mercator_geoparquet
        out = str(tmp_path / "out_override")
        summary = main(
            ["-c", path, "-o", out, "--source_epsg", "4326",
             "--geometrycolumn", "geometry", "--keep_projection", "--use_i3dm",
             "--max_features_per_tile", "200", "--max_level", "6"],
            spark=spark,
        )
        assert summary["n_instances"] == 300

    def test_equals_form_flag_overrides_sniff(
        self, spark, mercator_geoparquet, tmp_path
    ):
        """``--source_epsg=3857`` (equals spelling) must behave identically
        to the two-token spelling: the old implementation scanned argv for
        the literal token ``--source_epsg`` and silently let the sniff win
        for this form."""
        from i3dm_export_spark.__main__ import main

        path, _ = mercator_geoparquet
        out_eq = str(tmp_path / "out_eq")
        out_tok = str(tmp_path / "out_tok")
        common = ["--geometrycolumn", "geometry", "--use_i3dm",
                  "--max_features_per_tile", "100", "--max_level", "8"]
        s_eq = main(["-c", path, "-o", out_eq, "--source_epsg=3857",
                     *common], spark=spark)
        s_tok = main(["-c", path, "-o", out_tok, "--source_epsg", "3857",
                      *common], spark=spark)
        assert s_eq["n_instances"] == s_tok["n_instances"] == 300

        def region(out):
            with open(os.path.join(out, "tileset.json")) as fh:
                return json.load(fh)["root"]["boundingVolume"]["region"]

        assert region(out_eq) == region(out_tok)
