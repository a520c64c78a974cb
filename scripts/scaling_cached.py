#!/usr/bin/env python
"""Cached-input scaling ladder + shared-disk scan probe.

The e2e ladder (scripts/scaling_bench.py) reads its input from this
sandbox's ONE shared disk; scan/shuffle I/O therefore has a fixed
bandwidth ceiling that does not grow with local[N] threads — unlike a
real cluster, where every added node brings its own disks (the regime the
north_rule's "N vs 4N executors" targets). This script separates the two
effects:

* scan probe: a column-sum over the stage-0 parquet (I/O-dominated) at
  each parallelism — measures the box's disk ceiling directly;
* cached ladder: the identical export job with the input persisted
  MEMORY_ONLY first — compute + shuffle scaling with the disk removed,
  the faithful single-box proxy for per-node-disk cluster scaling.

Writes one JSON line; scripts/scaling_bench.py's BENCH_SCALING.md is
updated by hand from both artifacts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SCALING_ROWS", 24_000_000))
STAGE_DIR = os.environ.get("SCALING_STAGE_DIR", f"/tmp/scaling_pages_{ROWS}")
MAX_FEATURES = int(os.environ.get("SCALING_MAX_FEATURES", 4_000))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
from pyspark import StorageLevel
from pyspark.sql import functions as F
from i3dm_export_spark.session import get_spark
from i3dm_export_spark.config import ExportOptions
from i3dm_export_spark.operators import extent, tiling
from i3dm_export_spark.operators.encode import encode_tiles
spark = get_spark(app_name=f"scaling_cached_{{cpus}}",
                  master=f"local[{{cpus}}]", shuffle_partitions=cpus)
pages = spark.read.parquet({stage_dir!r})

# disk scan probe (I/O-dominated column sums, cold-ish: different columns
# than the later stages touch first)
t0 = time.perf_counter()
pages.agg(F.sum("lon"), F.sum("lat"), F.sum("z")).collect()
scan_sec = time.perf_counter() - t0

cached = pages.persist(StorageLevel.MEMORY_ONLY)
n = cached.count()  # materialize the cache (untimed)

t0 = time.perf_counter()
bounds = extent.compute_bounds(cached)
opts = ExportOptions(max_features_per_tile={max_features}, max_level=14,
                     use_i3dm=True)
tree = tiling.build_tile_tree(cached, bounds, opts, n_estimate=n)
assigned = tiling.assign_to_content_tiles(cached, tree, opts)
n_tiles = encode_tiles(assigned, opts).count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "rows": n, "tiles": n_tiles,
      "scan_sec": round(scan_sec, 2),
      "scan_rows_per_sec": round(n / scan_sec, 1),
      "cached_sec": round(dt, 2),
      "cached_instances_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    out = subprocess.run(
        [sys.executable, "-c",
         RUNNER.format(repo=REPO, stage_dir=STAGE_DIR,
                       max_features=MAX_FEATURES),
         str(cpus)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    txt = out.stdout + "\n" + out.stderr
    for line in txt.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}:\n{txt[-3000:]}")


def main():
    if not os.path.exists(os.path.join(STAGE_DIR, "_SUCCESS")):
        raise SystemExit(
            f"stage dir {STAGE_DIR} missing; run scripts/scaling_bench.py "
            f"first (it stages the input)"
        )
    r2, r8, r32 = run(2), run(8), run(32)
    report = {
        "local2": r2, "local8": r8, "local32": r32,
        "cached_efficiency_2_to_8": round(
            r8["cached_instances_per_sec"] / r2["cached_instances_per_sec"] / 4,
            3,
        ),
        "cached_efficiency_8_to_32": round(
            r32["cached_instances_per_sec"] / r8["cached_instances_per_sec"] / 4,
            3,
        ),
        "scan_speedup_2_to_8": round(
            r8["scan_rows_per_sec"] / r2["scan_rows_per_sec"], 2
        ),
        "rows": ROWS,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
