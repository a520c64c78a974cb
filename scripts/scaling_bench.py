#!/usr/bin/env python
"""north_rule scaling evidence: identical job at local[8] (N) vs local[32]
(4N) on the same deterministic input; reports instances/s + tiles/s at both
and the scaling efficiency = (throughput@32 / throughput@8) / 4, target
>= 0.8 (BASELINE.md). Each run is a separate spark-submit-style subprocess
so the JVM is sized to its core count. Writes BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("SCALING_ROWS", 48_000_000))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); rows = int(sys.argv[2])
from i3dm_export_spark.session import get_spark
from i3dm_export_spark.config import ExportOptions
from i3dm_export_spark.operators import extent, tiling
from i3dm_export_spark.operators.encode import encode_tiles
from i3dm_export_spark.plans.pipeline import stage1_encode
from i3dm_export_spark.sources.pages import pages_df_distributed
spark = get_spark(app_name=f"scaling_{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
from i3dm_export_spark.plans.pipeline import stage0_instances
# stage-0 projection (html/text never flow further — the pipeline contract);
# the narrow checkpoint stands in for the stage-0 parquet checkpoint
pages = stage0_instances(
    pages_df_distributed(spark, rows, scenario="A", partitions=cpus * 4)
).localCheckpoint()
n = pages.count()
t0 = time.perf_counter()
bounds = extent.compute_bounds(pages)
opts = ExportOptions(max_features_per_tile=4000, max_level=14, use_i3dm=True)
tree = tiling.build_tile_tree(pages, bounds, opts, n_estimate=n)
assigned = tiling.assign_to_content_tiles(pages, tree, opts)
payloads = encode_tiles(stage1_encode(assigned), opts)
n_tiles = payloads.count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{"cpus": cpus, "rows": n, "tiles": n_tiles,
      "sec": round(dt, 2), "instances_per_sec": round(n / dt, 1),
      "tiles_per_sec": round(n_tiles / dt, 2)}}))
spark.stop()
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), str(cpus), str(ROWS)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    r8 = run(8)
    r32 = run(32)
    eff = (r32["instances_per_sec"] / r8["instances_per_sec"]) / 4.0
    report = {
        "local8": r8, "local32": r32,
        "scaling_efficiency": round(eff, 3), "target": 0.8,
        "rows": ROWS,
    }
    print(json.dumps(report))
    md = f"""# BENCH_SCALING — two-parallelism scaling evidence (north_rule)

Identical export job (tile tree + assignment + i3dm payload encode over a
deterministic {ROWS:,}-instance pages table, scenario A) run at two
parallelism levels in separate JVMs. Reference single-thread baseline:
13,427 instances/s (BASELINE.md).

| config | instances/s | tiles/s | wall (s) | content tiles |
|---|---|---|---|---|
| local[8]  (N)  | {r8['instances_per_sec']:,} | {r8['tiles_per_sec']} | {r8['sec']} | {r8['tiles']} |
| local[32] (4N) | {r32['instances_per_sec']:,} | {r32['tiles_per_sec']} | {r32['sec']} | {r32['tiles']} |

**Scaling efficiency (throughput@4N / throughput@N) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule).

Caveats: single machine, shared memory bus; local[8] still background-loads
all cores during scans (I/O), so this is a conservative lower bound for
true multi-executor scaling where each executor owns its cores.
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
