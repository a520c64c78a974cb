"""EP1 CLI tests: reference-flag-compatible entry point over a parquet
table with WKB geometry and the legacy rotation column."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def wkb_table(spark, tmp_path):
    from i3dm_export_spark.functions.wkb import encode_wkb_point

    rng = np.random.default_rng(3)
    n = 400
    rows = []
    for i in range(n):
        lon = 34.0 + float(rng.uniform(0, 0.1))
        lat = 44.0 + float(rng.uniform(0, 0.1))
        rows.append((
            f"https://example.org/{i:06d}",
            f"body {i}",
            bytearray(encode_wkb_point(lon, lat)),  # 2D point: z forced to 0
            float(rng.uniform(0, 6.28)),            # legacy 'rotation'
            1.0,
            "tree.glb",
            json.dumps([{"customer": f"c{i % 3}"}]),
        ))
    df = spark.createDataFrame(
        rows,
        "url string, text string, geom binary, rotation double, "
        "scale double, model string, tags string",
    )
    path = str(tmp_path / "instances")
    df.write.parquet(path)
    return path


class TestCli:
    def test_end_to_end_export(self, spark, wkb_table, tmp_path, capsys):
        from i3dm_export_spark.__main__ import main

        out = str(tmp_path / "out")
        summary = main(
            [
                "-c", wkb_table,
                "-o", out,
                "--use_i3dm",
                "--max_features_per_tile", "100",
                "--max_level", "10",
            ],
            spark=spark,
        )
        assert summary["n_instances"] == 400
        assert summary["n_content_tiles"] > 0
        files = os.listdir(os.path.join(out, "content"))
        assert files and all(f.endswith(".i3dm") for f in files)
        assert os.path.exists(os.path.join(out, "tileset.json"))
        assert os.path.exists(os.path.join(out, "subtrees", "0_0_0.subtree"))
        # the printed line is the summary JSON (driver-friendly)
        printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert printed["n_instances"] == 400

    def test_query_flag_filters(self, spark, wkb_table, tmp_path):
        from i3dm_export_spark.__main__ import main

        summary = main(
            [
                "-c", wkb_table,
                "-o", str(tmp_path / "out2"),
                "-q", "scale = 1.0 and url < 'https://example.org/000100'",
                "--max_features_per_tile", "50",
                "--max_level", "8",
            ],
            spark=spark,
        )
        assert summary["n_instances"] == 400  # scan rows
        # content tiles hold only the 100 filtered instances
        import duckdb

        total = duckdb.sql(
            "select sum(n_instances) from parquet_scan('{}/_checkpoints/"
            "stage2_tiles/*.parquet') where level = 0".format(tmp_path / "out2")
        ).fetchone()[0]
        assert total == 100

    def test_table_subpath_and_missing_geometry_error(self, spark, tmp_path):
        from i3dm_export_spark.__main__ import main

        bad = tmp_path / "bad"
        import pandas as pd

        spark.createDataFrame(
            pd.DataFrame({"a": [1, 2]})
        ).write.parquet(str(bad / "t"))
        with pytest.raises(SystemExit, match="lon/lat"):
            main(
                ["-c", str(bad), "-t", "t", "-o", str(tmp_path / "o")],
                spark=spark,
            )
