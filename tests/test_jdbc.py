"""JDBC/PostGIS ingest adapter (sources/jdbc.py).

No Postgres server or JDBC driver jar ships in this sandbox, so the
translation layer is tested pure and the integration path is exercised by
mocking the DataFrameReader — the options recorded are exactly what a
live cluster sends to the driver jar.
"""

import pandas as pd
import pytest

from i3dm_export_spark.sources import jdbc


class TestConnectionRouting:
    def test_jdbc_urls_detected(self):
        assert jdbc.is_jdbc_connection("jdbc:postgresql://h:5432/db")
        assert jdbc.is_jdbc_connection(
            "Host=localhost;Username=postgres;Password=x;Database=geo"
        )
        assert jdbc.is_jdbc_connection("host=h;database=d")

    def test_paths_not_detected(self):
        assert not jdbc.is_jdbc_connection("/data/instances")
        assert not jdbc.is_jdbc_connection("./out/table.parquet")
        # partition dirs contain '=' but after a '/'
        assert not jdbc.is_jdbc_connection("/data/idx/ivf_list=3")

    def test_parse_ado_connection(self):
        kv = jdbc.parse_ado_connection(
            "Host=myserver;Port=5433;Username=postgres;Password=s3c;"
            "Database=bertt"
        )
        assert kv == {
            "host": "myserver", "port": "5433", "user": "postgres",
            "password": "s3c", "database": "bertt",
        }

    def test_jdbc_url_from_ado(self):
        url, props = jdbc.jdbc_url(
            "Host=h;Username=u;Password=p;Database=d"
        )
        assert url == "jdbc:postgresql://h:5432/d"
        assert props["user"] == "u" and props["password"] == "p"
        assert props["driver"] == "org.postgresql.Driver"

    def test_jdbc_url_passthrough(self):
        url, props = jdbc.jdbc_url("jdbc:postgresql://h:1/db")
        assert url == "jdbc:postgresql://h:1/db" and props == {}


class TestQueries:
    def test_probe_srid_sql_matches_reference(self):
        # reference src/SpatialReferenceRepository.cs:9-10
        assert (
            jdbc.probe_srid_sql("public.trees", "geom")
            == "SELECT ST_SRID(geom) from public.trees  limit 1"
        )
        assert (
            jdbc.probe_srid_sql("t", "g", "height > 2")
            == "SELECT ST_SRID(g) from t WHERE height > 2 limit 1"
        )

    def test_instances_query_pushes_geometry(self):
        q = jdbc.instances_query("public.trees", "geom", "scale > 0")
        assert "ST_X(st_force3d(geom)) AS lon" in q
        assert "ST_Y(st_force3d(geom)) AS lat" in q
        assert "WHERE scale > 0" in q
        assert q.endswith("AS instances")

    def test_instances_query_projects_explicit_columns(self):
        """ADVICE r3: no bare ``*`` — it would re-select the geometry
        column and collide with source tables that already carry
        lon/lat/z names. The attribute list is explicit and honors
        extra_cols."""
        q = jdbc.instances_query("t", "geom")
        assert "*" not in q
        assert (
            "AS z, url, text, scale, rotation, yaw, pitch, roll, model, "
            "tags " in q
        )
        q2 = jdbc.instances_query("t", "geom", extra_cols=("url", "scale"))
        assert "AS z, url, scale FROM t" in q2

    def test_default_projection_includes_text(self):
        """ADVICE r4 #4: stage0_instances derives text_fp from ``text``;
        the default JDBC projection must therefore carry it, or any real
        ingest with default columns fails with an unresolved-column
        AnalysisException."""
        assert "text" in jdbc.instances_query("t", "geom")

    def test_probe_bounds_sql(self):
        assert (
            jdbc.probe_bounds_sql("public.trees", "id")
            == "SELECT MIN(id) AS lo, MAX(id) AS hi FROM public.trees"
        )
        assert (
            jdbc.probe_bounds_sql("t", "id", "height > 2")
            == "SELECT MIN(id) AS lo, MAX(id) AS hi FROM t WHERE height > 2"
        )


class _FakeReader:
    """Records .option calls; .load returns a canned local DataFrame —
    a MIN/MAX bounds row when the recorded SQL is the bounds probe, the
    instance frame otherwise."""

    def __init__(self, spark, recorded, probe_result=(7, 4_000_000)):
        self._spark = spark
        self.recorded = recorded
        self._opts = {}
        self._probe_result = probe_result

    def option(self, k, v):
        self._opts[k] = v
        return self

    def load(self):
        if "MIN(" in self._opts.get("query", ""):
            self.recorded.setdefault("probe_opts", dict(self._opts))
            if self._probe_result is None:  # empty table
                return self._spark.createDataFrame([], "lo long, hi long")
            lo, hi = self._probe_result
            return self._spark.createDataFrame(
                pd.DataFrame({"lo": [lo], "hi": [hi]})
            )
        self.recorded.update(self._opts)
        return self._spark.createDataFrame(
            pd.DataFrame(
                {"lon": [4.9], "lat": [52.3], "z": [0.0], "scale": [1.0]}
            )
        )


class TestMockedReads:
    def test_partitioned_read_options(self, spark, monkeypatch):
        from pyspark.sql import DataFrameReader

        recorded = {}

        def fake_format(self, fmt):
            recorded["format"] = fmt
            return _FakeReader(spark, recorded)

        monkeypatch.setattr(DataFrameReader, "format", fake_format)
        df = jdbc.load_jdbc_instances(
            spark, "Host=h;Username=u;Password=p;Database=d",
            "public.trees", partition_column="id", num_partitions=16,
            lower_bound=0, upper_bound=1_000_000,
        )
        assert df.count() == 1
        assert recorded["format"] == "jdbc"
        assert recorded["url"] == "jdbc:postgresql://h:5432/d"
        assert recorded["partitionColumn"] == "id"
        assert recorded["numPartitions"] == "16"
        assert recorded["lowerBound"] == "0"
        assert recorded["upperBound"] == "1000000"
        assert "ST_X(st_force3d(geom))" in recorded["dbtable"]

    def test_partition_bounds_auto_probed(self, spark, monkeypatch):
        """VERDICT r3 item 4: partition_column without bounds triggers a
        1-row MIN/MAX probe and the derived bounds reach the reader, so
        the bulk path defaults to parallel cursors."""
        from pyspark.sql import DataFrameReader

        recorded = {}

        def fake_format(self, fmt):
            return _FakeReader(spark, recorded)

        monkeypatch.setattr(DataFrameReader, "format", fake_format)
        df = jdbc.load_jdbc_instances(
            spark, "Host=h;Username=u;Password=p;Database=d",
            "public.trees", partition_column="id", num_partitions=8,
            query="height > 2",
        )
        assert df.count() == 1
        probe = recorded["probe_opts"]
        assert probe["query"] == (
            "SELECT MIN(id) AS lo, MAX(id) AS hi FROM public.trees "
            "WHERE height > 2"
        )
        assert probe["url"] == "jdbc:postgresql://h:5432/d"
        assert recorded["lowerBound"] == "7"
        assert recorded["upperBound"] == "4000000"
        assert recorded["numPartitions"] == "8"

    def test_partition_bounds_probe_empty_table_raises(self, spark, monkeypatch):
        from pyspark.sql import DataFrameReader

        def fake_format(self, fmt):
            return _FakeReader(spark, {}, probe_result=None)

        monkeypatch.setattr(DataFrameReader, "format", fake_format)
        with pytest.raises(ValueError, match="MIN/MAX probe"):
            jdbc.load_jdbc_instances(
                spark, "Host=h;Database=d", "t", partition_column="id"
            )

    def test_cli_routes_jdbc_connection(self, spark, monkeypatch, tmp_path):
        """-c with a connection string must take the JDBC route end to end
        (probe SRID, load, export) — mocked source, real pipeline."""
        import i3dm_export_spark.__main__ as cli
        from i3dm_export_spark.sources import jdbc as jmod
        from i3dm_export_spark.sources.pages import pages_df

        calls = {}

        def fake_load(spark_, connection, table, **kw):
            calls["connection"] = connection
            calls["table"] = table
            return pages_df(spark_, 300, scenario="A")

        def fake_probe(spark_, connection, table, **kw):
            calls["probed"] = True
            return 4326

        monkeypatch.setattr(jmod, "load_jdbc_instances", fake_load)
        monkeypatch.setattr(jmod, "probe_srid", fake_probe)
        out = tmp_path / "jdbc_out"
        summary = cli.main(
            [
                "-c", "Host=h;Username=u;Password=p;Database=d",
                "-t", "public.trees",
                "-o", str(out), "--use_i3dm",
                "--max_features_per_tile", "100",
            ],
            spark=spark,
        )
        assert calls["connection"].startswith("Host=h")
        assert calls["table"] == "public.trees"
        assert calls["probed"]
        assert summary["n_content_tiles"] > 0
        assert (out / "tileset.json").exists()

    def test_cli_jdbc_columns_flag(self, spark, monkeypatch, tmp_path):
        """--jdbc_columns overrides the explicit JDBC projection list for
        source tables lacking one of the default optional columns."""
        import i3dm_export_spark.__main__ as cli
        from i3dm_export_spark.sources import jdbc as jmod
        from i3dm_export_spark.sources.pages import pages_df

        seen = {}

        def fake_load(spark_, connection, table, **kw):
            seen.update(kw)
            return pages_df(spark_, 200)

        monkeypatch.setattr(jmod, "load_jdbc_instances", fake_load)
        monkeypatch.setattr(jmod, "probe_srid", lambda *a, **k: 4326)
        cli.main(
            ["-c", "Host=h;Database=d", "-t", "t",
             "-o", str(tmp_path / "o"), "--use_i3dm",
             "--max_features_per_tile", "100",
             "--jdbc_columns", "url, scale, model"],
            spark=spark,
        )
        assert seen["extra_cols"] == ("url", "scale", "model")
