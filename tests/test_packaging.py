"""spark-submit --py-files shipping (north_rule: "ships as a
spark-submit --py-files package").

The sharp test launches a SEPARATE python process whose sys.path does NOT
contain the repo — only the built zip — and runs a pandas-UDF-bearing
pipeline end to end. That is exactly the import environment of a
`spark-submit --py-files i3dm_export_spark_pyfiles.zip job.py` driver and
its executors: if any module is missing from the zip, or any UDF closure
sneaks in a repo-path import, this fails."""

import os
import subprocess
import sys
import zipfile

from i3dm_export_spark.packaging import build_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestZipContents:
    def test_zip_has_every_source_module(self, tmp_path):
        dest = str(tmp_path / "pyfiles.zip")
        assert build_pyfiles_zip(dest) == dest
        with zipfile.ZipFile(dest) as zf:
            names = set(zf.namelist())
        # every committed source module ships
        pkg_dir = os.path.join(REPO, "i3dm_export_spark")
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    rel = os.path.join(
                        "i3dm_export_spark",
                        os.path.relpath(os.path.join(root, fn), pkg_dir),
                    )
                    assert rel in names, rel
        # and nothing else does
        assert all(n.endswith(".py") for n in names)
        assert not any("__pycache__" in n or n.startswith("tests") for n in names)


DRIVER = r"""
import sys

# simulate the spark-submit --py-files environment: the repo must NOT be
# importable from disk; only the zip serves the package
sys.path = [p for p in sys.path if "repo" not in p]
sys.path.insert(0, sys.argv[1])

import i3dm_export_spark
assert sys.argv[1] in i3dm_export_spark.__file__, i3dm_export_spark.__file__

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.submit.pyFiles", sys.argv[1])
    .getOrCreate()
)
spark.sparkContext.addPyFile(sys.argv[1])

from i3dm_export_spark.config import Bounds, ExportOptions
from i3dm_export_spark.operators import tiling
from i3dm_export_spark.operators.encode import encode_tiles
from i3dm_export_spark.sources.pages import DOCS_BBOX, pages_df_distributed
from i3dm_export_spark.plans.pipeline import stage0_instances

pages = stage0_instances(pages_df_distributed(spark, 2000, partitions=4))
bounds = Bounds(*DOCS_BBOX)
opts = ExportOptions(max_features_per_tile=200, max_level=6, use_i3dm=True)
tree = tiling.build_tile_tree(pages, bounds, opts)
assigned = tiling.assign_to_content_tiles(pages, tree, opts)
n = encode_tiles(assigned, opts).count()   # pandas UDF -> workers import from zip
assert n > 0, n
print("PYFILES_OK", n)
spark.stop()
"""


class TestRunFromZipOnly:
    def test_udf_pipeline_runs_with_zip_only_imports(self, tmp_path):
        dest = str(tmp_path / "pyfiles.zip")
        build_pyfiles_zip(dest)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [sys.executable, "-c", DRIVER, dest],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
            env=env,
        )
        assert "PYFILES_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]
