"""S1 source-CRS ingest tests: transform correctness vs published values,
round-trip precision, and tile-key parity between a projected fixture and
its 4326 twin (VERDICT r1 item 7 'done' criterion)."""

import numpy as np
import pytest

from i3dm_export_spark.functions import crs


class TestTransverseMercator:
    def test_krueger_rectifying_radius(self):
        # published Krüger A for WGS84 (quarter meridian / (pi/2))
        tm = crs.projection_for_epsg(32631)
        assert abs(tm.A - 6367449.145823) < 1e-5

    def test_central_meridian_equator_is_false_origin(self):
        tm = crs.projection_for_epsg(32631)
        e, n = tm.forward(3.0, 0.0)
        assert abs(e - 500_000.0) < 1e-6
        assert abs(n) < 1e-6

    def test_published_utm_point_cn_tower(self):
        # CN Tower (43.642567 N, 79.387139 W) = UTM 17N 630084 E, 4833438 N
        tm = crs.projection_for_epsg(32617)
        e, n = tm.forward(-79.387139, 43.642567)
        assert abs(e - 630_084.0) < 1.0
        assert abs(n - 4_833_438.0) < 1.0

    def test_southern_hemisphere_false_northing(self):
        tm = crs.projection_for_epsg(32734)  # zone 34S (lon0 = 21)
        _, n = tm.forward(21.0, -33.9)
        assert 6_000_000 < n < 10_000_000
        lon, lat = tm.inverse(*tm.forward(18.4, -33.9))
        assert abs(lon - 18.4) < 1e-9 and abs(lat + 33.9) < 1e-9

    def test_roundtrip_precision(self):
        tm = crs.projection_for_epsg(32631)
        rng = np.random.default_rng(0)
        lon = 3 + rng.uniform(-3, 3, 2000)
        lat = rng.uniform(-80, 84, 2000)
        lon2, lat2 = tm.inverse(*tm.forward(lon, lat))
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_etrs89_matches_wgs84_utm_to_submillimeter(self):
        # GRS80 vs WGS84 flattening differ in the 10th digit
        a = crs.projection_for_epsg(25832)
        b = crs.projection_for_epsg(32632)
        ea, na = a.forward(9.5, 52.0)
        eb, nb = b.forward(9.5, 52.0)
        assert abs(ea - eb) < 1e-3 and abs(na - nb) < 1e-3


class TestWebMercator:
    def test_closed_form_edges(self):
        wm = crs.projection_for_epsg(3857)
        x, _ = wm.forward(180.0, 0.0)
        assert abs(x - 20037508.342789244) < 1e-6
        lon, lat = wm.inverse(*wm.forward(4.9, 52.37))
        assert abs(lon - 4.9) < 1e-12 and abs(lat - 52.37) < 1e-12


class TestRegistry:
    def test_identity_4326(self):
        lon, lat = crs.to_wgs84(4326, np.array([4.9]), np.array([52.37]))
        assert lon[0] == 4.9 and lat[0] == 52.37

    def test_unsupported_epsg_raises(self):
        with pytest.raises(ValueError, match="28992"):
            crs.to_wgs84(28992, np.array([0.0]), np.array([0.0]))


class TestSparkIngest:
    def test_reproject_dataframe(self, spark):
        from pyspark.sql import functions as F

        pdf_lon = np.array([4.0, 4.5, 5.2])
        pdf_lat = np.array([52.0, 52.2, 51.8])
        e, n = crs.from_wgs84(32631, pdf_lon, pdf_lat)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(e, n)], "lon double, lat double"
        )
        out = crs.reproject_to_wgs84(df, 32631).orderBy("lon").collect()
        got_lon = np.array([r["lon"] for r in out])
        got_lat = np.array([r["lat"] for r in out])
        assert np.abs(np.sort(got_lon) - np.sort(pdf_lon)).max() < 1e-9
        assert np.abs(np.sort(got_lat) - np.sort(pdf_lat)).max() < 1e-9
        # no stray columns
        assert set(df.columns) == {"lon", "lat"}

    def test_tile_keys_match_4326_twin(self, spark):
        """The S1 'done' criterion: a projected-CRS fixture must produce
        IDENTICAL quadtree cell keys to its 4326 twin."""
        from i3dm_export_spark.operators import extent, tiling
        from i3dm_export_spark.sources.pages import synthesize_pages

        pdf = synthesize_pages(2000, scenario="A")
        bounds = extent.derive_root_bounds(
            pdf["lon"].min(), pdf["lat"].min(), pdf["lon"].max(), pdf["lat"].max(), 0, 0
        )
        base = spark.createDataFrame(pdf)
        e, n = crs.from_wgs84(32636, pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
        proj_pdf = pdf.copy()
        proj_pdf["lon"] = e
        proj_pdf["lat"] = n
        projected = crs.reproject_to_wgs84(
            spark.createDataFrame(proj_pdf), 32636
        )

        k1 = tiling.with_cell_keys(base, bounds, 8).select(
            "url", "cell_x", "cell_y"
        )
        k2 = tiling.with_cell_keys(projected, bounds, 8).select(
            "url", "cell_x", "cell_y"
        )
        diff = k1.join(k2, "url").filter(
            (k1["cell_x"] != k2["cell_x"]) | (k1["cell_y"] != k2["cell_y"])
        )
        assert diff.count() == 0
        assert k1.count() == 2000

    def test_export_with_source_epsg(self, spark, tmp_path):
        """run_export(source_epsg=...) writes the same tile tree as the
        4326 export of the same points."""
        import duckdb

        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.plans import pipeline
        from i3dm_export_spark.sources.pages import pages_df

        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(max_features_per_tile=100, max_level=10)
        s_base = pipeline.run_export(
            pages, opts, str(tmp_path / "base"), write_content=False
        )

        pdf = pages.toPandas()
        e, n = crs.from_wgs84(32636, pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
        pdf["lon"], pdf["lat"] = e, n
        proj_opts = ExportOptions(
            max_features_per_tile=100, max_level=10, source_epsg=32636
        )
        s_proj = pipeline.run_export(
            spark.createDataFrame(pdf), proj_opts, str(tmp_path / "proj"),
            write_content=False,
        )
        q = "select level, x, y, n_instances from parquet_scan('{}/_checkpoints/stage2_tiles/*.parquet') order by 1,2,3"
        t1 = duckdb.sql(q.format(tmp_path / "base")).df()
        t2 = duckdb.sql(q.format(tmp_path / "proj")).df()
        assert t1.equals(t2)
        assert s_base["n_tiles_recorded"] == s_proj["n_tiles_recorded"]


class TestStatsBounds:
    """Metadata-only extent (parquet footer stats) parity with the scan."""

    def test_stats_bounds_match_scan(self, spark, tmp_path):
        from i3dm_export_spark.operators import extent
        from i3dm_export_spark.sources.pages import pages_df

        p = str(tmp_path / "pages")
        pages_df(spark, 2000, scenario="A").write.parquet(p)
        df = spark.read.parquet(p)
        b_scan = extent.compute_bounds(df)
        b_stats = extent.bounds_from_parquet_stats(p)
        assert b_stats == b_scan
        # file-list form with file: URIs (what run_export passes)
        assert extent.bounds_from_parquet_stats(list(df.inputFiles())) == b_scan

    def test_export_bounds_identical_from_stats_path(self, spark, tmp_path):
        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.operators import extent
        from i3dm_export_spark.plans import pipeline
        from i3dm_export_spark.sources.pages import pages_df

        p = str(tmp_path / "in")
        pages_df(spark, 300, scenario="A").write.parquet(p)
        df = spark.read.parquet(p)
        s = pipeline.run_export(
            df, ExportOptions(max_features_per_tile=100, max_level=8),
            str(tmp_path / "out"), write_content=False,
        )
        b_scan = extent.compute_bounds(df)
        assert tuple(s["bounds"]) == tuple(b_scan.bbox)


class TestAllZonesProperty:
    def test_roundtrip_every_utm_zone(self):
        """Property: forward/inverse round-trips under 1e-9 deg across all
        60 north + 60 south WGS84 zones and the ETRS89 range, at points
        spread over each zone's width and extreme latitudes."""
        rng = np.random.default_rng(7)
        lat = rng.uniform(-79.5, 83.5, 40)
        for epsg_base, zones, south in (
            (32600, range(1, 61), False),
            (32700, range(1, 61), True),
            (25800, range(28, 39), False),
        ):
            for zone in zones:
                tm = crs.projection_for_epsg(epsg_base + zone)
                lon0 = zone * 6 - 183
                lon = lon0 + rng.uniform(-2.9, 2.9, 40)
                la = -np.abs(lat) if south else lat
                lon2, lat2 = tm.inverse(*tm.forward(lon, la))
                assert np.abs(lon2 - lon).max() < 1e-9, epsg_base + zone
                assert np.abs(lat2 - la).max() < 1e-9, epsg_base + zone
