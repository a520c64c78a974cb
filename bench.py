#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the flagship tiling export (tree + assignment + payload encode
over a deterministically synthesized 600k-instance pages table — the
BASELINE.md workload shape) plus representative operator queries from
__spark_entry__ at the sf dir. Extra keys report derived throughput
(instances/s, tiles/s) for the north_rule comparison; BASELINE.md's
reference numbers are 13.4k instances/s / 53.5 tiles/s single-threaded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
N_EXPORT = int(os.environ.get("BENCH_EXPORT_ROWS", 600_000))
# best-of-N trials per repeatable leg: this box runs co-tenant workloads
# whose bursts inflate single-shot legs up to 30x (paired probe, round 3:
# two back-to-back identical runs scored 255.6 s vs 61.6 s total; the
# unchanged single-shuffle dedup_exact leg alone swung 60.1 s -> 1.87 s).
# The minimum over trials estimates the engine's cost, not the neighbors'.
TRIALS = max(1, int(os.environ.get("BENCH_TRIALS", 3)))
# Bounded quiet-window gate: wait (up to BENCH_QUIET_WAIT_S seconds, default
# 240) for the 1-min load to drop below BENCH_QUIET_LOAD (default 2.0)
# before the timed section, so a driver-invoked run isn't recorded inside a
# co-tenant burst (VERDICT r3 item 1). The actual wait is reported as
# `quiet_wait_s`; a still-noisy start shows in `loadavg_start` as before.
QUIET_WAIT_S = float(os.environ.get("BENCH_QUIET_WAIT_S", 240))
QUIET_LOAD = float(os.environ.get("BENCH_QUIET_LOAD", 2.0))
# Per-leg load audit (VERDICT r4 item 2): a leg whose best trial ran inside
# a co-tenant burst is re-run after a short quiet wait, bounded by
# BENCH_LEG_RETRIES extra trials — so the recorded artifact carries clean
# numbers (or an audit trail proving no clean window existed) instead of
# unexplained regressions. Pollution is judged on EXTERNAL CPU — busy
# jiffies from /proc/stat minus this process tree's own jiffies — because
# 1-min loadavg conflates the leg's own 32 threads with co-tenants (an 18 s
# leg at 32 runnable threads alone pushes loadavg past 8, which made every
# clean headline window read "polluted" and burned retries for nothing).
POLLUTED_EXT_CORES = float(os.environ.get("BENCH_POLLUTED_EXT_CORES", 2.0))
LEG_RETRIES = max(0, int(os.environ.get("BENCH_LEG_RETRIES", 2)))
LEG_AUDIT: dict[str, dict] = {}
_HZ = os.sysconf("SC_CLK_TCK")


def _total_busy_jiffies() -> int:
    """All-CPU busy jiffies (everything except idle+iowait) since boot."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return -1
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return sum(vals) - idle


def _tree_jiffies() -> int:
    """utime+stime (+ reaped-child cutime/cstime) summed over this process
    tree — the bench's python driver plus the Spark JVM it gatewayed.
    Reaped children fold into the parent's cutime/cstime and leave /proc,
    so live-sum + cutime never double-counts."""
    me = os.getpid()
    ppid: dict[int, int] = {}
    cpu: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue  # raced a process exit
        try:
            rest = s[s.rindex(")") + 2:].split()
            pid = int(d)
            ppid[pid] = int(rest[1])
            cpu[pid] = (int(rest[11]) + int(rest[12])
                        + int(rest[13]) + int(rest[14]))
        except (ValueError, IndexError):
            continue
    total = 0
    for pid in cpu:
        p, seen = pid, set()
        while p > 1 and p not in seen:
            if p == me:
                total += cpu[pid]
                break
            seen.add(p)
            p = ppid.get(p, 1)
    return total


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def wait_quiet(budget: float = QUIET_WAIT_S) -> float:
    """Block until load < QUIET_LOAD or ``budget`` s elapse; return wait."""
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget:
        la = _loadavg()
        if la < 0 or la < QUIET_LOAD:
            break
        time.sleep(10)
    return round(time.perf_counter() - t0, 1)


def best_of(fn, trials: int = TRIALS, name: str | None = None) -> tuple[float, object]:
    """(min wall seconds, last result) over ``trials`` executions.

    Every trial samples the external CPU burned during its window —
    co-tenant cores-on-average, excluding this process tree by
    construction. If the best trial's window was polluted
    (> POLLUTED_EXT_CORES), the leg re-runs after a short quiet wait, up
    to LEG_RETRIES extra trials. The audit — best-trial external cores +
    loadavg context + retry count — lands in ``leg_audit`` when ``name``
    is given."""
    best = float("inf")
    best_ext = float("inf")
    best_load = -1.0
    res = None

    def run_once():
        nonlocal best, best_ext, best_load, res
        la0 = _loadavg()
        b0, o0 = _total_busy_jiffies(), _tree_jiffies()
        t0 = time.perf_counter()
        res = fn()
        wall = time.perf_counter() - t0
        db = _total_busy_jiffies() - b0
        if b0 < 0 or db < 0:
            ext = -1.0  # /proc unreadable: audit unavailable, never retries
        else:
            ext = max(0.0, (db - (_tree_jiffies() - o0)) / _HZ / max(wall, 1e-9))
        if wall < best:
            best, best_ext, best_load = wall, ext, max(la0, _loadavg())

    for _ in range(trials):
        run_once()
    retries = 0
    while best_ext > POLLUTED_EXT_CORES and retries < LEG_RETRIES:
        wait_quiet(60)
        retries += 1
        run_once()
    if name is not None:
        LEG_AUDIT[name] = {"ext_cores": round(best_ext, 2),
                           "load": round(best_load, 2), "retries": retries}
    return best, res


def main() -> None:
    from i3dm_export_spark.config import ExportOptions
    from i3dm_export_spark.operators import extent, tiling
    from i3dm_export_spark.operators.encode import encode_tiles
    from i3dm_export_spark.session import get_spark
    from i3dm_export_spark.sources.pages import pages_df

    import __spark_entry__ as entry

    spark = get_spark(app_name="i3dm_export_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    extras["quiet_wait_s"] = wait_quiet()
    extras["loadavg_start"] = _loadavg()

    # ---- headline: tiling export over 600k synthesized instances ----------
    # executor-side synthesis + stage-0 projection (html/text dropped, the
    # pipeline contract); checkpoint excludes synthesis from the measurement
    from i3dm_export_spark.plans.pipeline import stage0_instances
    from i3dm_export_spark.sources.pages import pages_df_distributed

    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="bench_pages_")
    stage0_instances(
        pages_df_distributed(spark, N_EXPORT, scenario="A", partitions=CPUS * 4)
    ).write.mode("overwrite").parquet(stage_dir)
    pages = spark.read.parquet(stage_dir)
    n_instances = pages.count()

    # untimed warm-up at 4% of the workload: first execution of each code
    # path pays whole-stage-codegen compilation + Python-worker fork
    # (~2x the steady-state wall for the full run); the reference baseline
    # is a long-running single process, so steady state is the comparable
    # regime. Same code path end to end, small N.
    warm = pages.limit(max(n_instances // 25, 1)).localCheckpoint()
    warm_opts = ExportOptions(max_features_per_tile=1000, max_level=14, use_i3dm=True)
    warm_bounds = extent.compute_bounds(warm)
    warm_tree = tiling.build_tile_tree(warm, warm_bounds, warm_opts,
                                       n_estimate=n_instances // 25)
    encode_tiles(
        tiling.assign_to_content_tiles(warm, warm_tree, warm_opts), warm_opts
    ).count()

    opts = ExportOptions(max_features_per_tile=1000, max_level=14, use_i3dm=True)

    def _i3dm_leg():
        bounds = extent.compute_bounds(pages)
        tree = tiling.build_tile_tree(pages, bounds, opts, n_estimate=n_instances)
        assigned = tiling.assign_to_content_tiles(pages, tree, opts)
        # fused path: ECEF computed inside the per-tile encoder (one Arrow
        # round-trip; byte-identical to the stage1-precomputed path)
        return bounds, encode_tiles(assigned, opts).count()

    dt, (bounds, n_tiles) = best_of(_i3dm_leg, name="export_pipeline")
    timings["export_pipeline"] = round(dt, 3)
    extras["export_instances"] = n_instances
    extras["export_content_tiles"] = n_tiles
    extras["instances_per_sec"] = round(n_instances / dt, 1)
    extras["tiles_per_sec"] = round(n_tiles / dt, 2)

    # ---- GPU glb mode (reference parity: README.md:183 GPU bench) ----------
    gpu_opts = ExportOptions(max_features_per_tile=1000, max_level=14,
                             use_gpu_instancing=True)

    def _gpu_leg():
        gpu_tree = tiling.build_tile_tree(pages, bounds, gpu_opts,
                                          n_estimate=n_instances)
        return encode_tiles(
            tiling.assign_to_content_tiles(pages, gpu_tree, gpu_opts), gpu_opts
        ).count()

    dt, gpu_tiles = best_of(_gpu_leg, name="export_pipeline_gpu")
    timings["export_pipeline_gpu"] = round(dt, 3)
    extras["gpu_instances_per_sec"] = round(n_instances / dt, 1)
    extras["gpu_content_tiles"] = gpu_tiles

    # ---- full run_export incl. distributed file sinks (K1/K3/K4) ----------
    # the complete product path: checkpointed stages + executor-side
    # content/subtree writes + tileset.json; measures that the distributed
    # sink sustains export throughput (VERDICT r1 item 1 done-criterion)
    import shutil

    from i3dm_export_spark.config import ExportOptions as _EO
    from i3dm_export_spark.plans.incremental import incremental_append
    from i3dm_export_spark.plans.pipeline import run_export
    from pyspark.sql import functions as F

    # ~1% append batch: new urls beyond the base id range, remapped into a
    # small interior box so the dirty region is LOCAL (VERDICT r3 item 6)
    n_batch = max(N_EXPORT // 100, 1)
    batch = (
        pages_df_distributed(
            spark, N_EXPORT + n_batch, scenario="A", partitions=CPUS
        )
        .filter(
            F.col("url")
            >= F.format_string("https://example.org/p/%08d", F.lit(N_EXPORT))
        )
        .withColumn(
            "lon",
            F.lit(34.04)
            + F.pmod(F.xxhash64("url"), F.lit(100)).cast("double")
            * F.lit(0.0002),
        )
        .withColumn(
            "lat",
            F.lit(44.04)
            + F.pmod(F.xxhash64("url", F.lit(1)), F.lit(100)).cast("double")
            * F.lit(0.0002),
        )
    )

    # e2e + append run as a PAIR per trial (the append consumes the fresh
    # export's state), each leg recorded as the min over trials — single
    # shots were the last legs still exposed to co-tenant bursts
    from i3dm_export_spark.plans.serve import query_bbox_summary

    best_e2e = best_app = best_serve = float("inf")
    best_pair_speedup = 0.0
    pair_ext = float("inf")
    pair_load = -1.0
    pair_retries = 0
    summary = app = served = None

    def _pair_trial():
        nonlocal best_e2e, best_app, best_serve, best_pair_speedup
        nonlocal pair_ext, pair_load, summary, app, served
        la0 = _loadavg()
        b0, o0 = _total_busy_jiffies(), _tree_jiffies()
        t_pair = time.perf_counter()
        e2e_dir = tempfile.mkdtemp(prefix="bench_e2e_")
        t0 = time.perf_counter()
        summary = run_export(
            pages,
            _EO(max_features_per_tile=1000, max_level=14, use_i3dm=True),
            e2e_dir,
            subtree_levels=2,
        )
        e2e_i = time.perf_counter() - t0
        t0 = time.perf_counter()
        app = incremental_append(batch, e2e_dir)
        app_i = time.perf_counter() - t0
        # append-vs-full is only meaningful within ONE trial (both legs in
        # the same co-tenant window); cross-trial mins mismatch windows
        best_pair_speedup = max(best_pair_speedup, e2e_i / max(app_i, 1e-9))
        # serving path against the fresh export: tiles + instances for the
        # append's interior box (manifest scan + pushed-down parquet filter)
        t0 = time.perf_counter()
        served = query_bbox_summary(
            spark, e2e_dir, (34.04, 44.04, 34.06, 44.06), max_listed=10
        )
        serve_i = time.perf_counter() - t0
        shutil.rmtree(e2e_dir, ignore_errors=True)
        wall = time.perf_counter() - t_pair
        db = _total_busy_jiffies() - b0
        if b0 < 0 or db < 0:
            ext = -1.0
        else:
            ext = max(0.0, (db - (_tree_jiffies() - o0)) / _HZ / max(wall, 1e-9))
        if min(e2e_i - best_e2e, app_i - best_app, serve_i - best_serve) < 0:
            # window behind at least one recorded best
            pair_ext, pair_load = ext, max(la0, _loadavg())
        best_e2e = min(best_e2e, e2e_i)
        best_app = min(best_app, app_i)
        best_serve = min(best_serve, serve_i)

    for _ in range(TRIALS):
        _pair_trial()
    while pair_ext > POLLUTED_EXT_CORES and pair_retries < LEG_RETRIES:
        wait_quiet(60)
        pair_retries += 1
        _pair_trial()
    for leg in ("export_e2e_sinks", "incremental_append_1pct",
                "serve_query_bbox"):
        LEG_AUDIT[leg] = {"ext_cores": round(pair_ext, 2),
                          "load": round(pair_load, 2),
                          "retries": pair_retries}

    timings["export_e2e_sinks"] = round(best_e2e, 3)
    extras["e2e_instances_per_sec"] = round(n_instances / best_e2e, 1)
    extras["e2e_content_files"] = summary["n_content_tiles"]
    extras["e2e_subtree_files"] = summary["n_subtree_files"]
    timings["incremental_append_1pct"] = round(best_app, 3)
    extras["append_new_instances"] = app["n_new_instances"]
    extras["append_dirty_tiles"] = app["n_dirty_tiles"]
    extras["append_content_tiles"] = app["n_content_tiles"]
    extras["append_dirty_subtrees"] = app["n_dirty_subtrees"]
    extras["append_speedup_vs_full"] = round(best_pair_speedup, 2)
    extras["append_phase_walls"] = app.get("phase_walls", {})
    extras["append_delta_path"] = app.get("delta_path", False)
    extras["append_stage3_linked_files"] = app.get("n_stage3_linked_files", 0)
    extras["append_stage3_rewritten_files"] = app.get(
        "n_stage3_rewritten_files", -1
    )
    timings["serve_query_bbox"] = round(best_serve, 3)
    extras["serve_tiles"] = served["n_tiles"]
    extras["serve_instances"] = served["n_instances"]

    # ---- operator queries at the sf dir ------------------------------------
    qs = entry.queries()
    for name in (
        "tile_tree", "leaf_assignment", "knn", "knn_per_tile", "pip_rect",
        "pip_polygon", "range_join",
        "dedup_exact", "minhash_sigs", "lsh_pairs", "simhash",
        "cosine_topk", "ann_exact_parity", "text_quality", "text_langid",
        "events_hourly", "cluster_kmeans",
        "media_metadata", "events_topk_window",
    ):
        dt, n = best_of(lambda: qs[name](spark, SF_DIR).count(), name=name)
        timings[name] = round(dt, 3)
        extras[f"rows_{name}"] = n

    # ---- LSH signatures at a real embedding dim (768) ----------------------
    # VERDICT r1 item 5 bench point: the Arrow-matmul signature path; plan
    # size is dim-independent, so this measures pure batch throughput
    from pyspark.sql import functions as F

    from i3dm_export_spark.operators.similarity import hyperplane_signature
    from i3dm_export_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings", min_splits=CPUS).withColumn(
        "embedding", F.flatten(F.array_repeat("embedding", 12))
    ).localCheckpoint()
    n_emb = emb.count()
    hyperplane_signature(emb, 768, 16).select("lsh_sig").count()  # warm
    dt, n = best_of(
        lambda: hyperplane_signature(emb, 768, 16)
        .select("lsh_sig").distinct().count(),
        name="lsh_sig_dim768",
    )
    timings["lsh_sig_dim768"] = round(dt, 3)
    extras["rows_lsh_sig_dim768"] = n
    extras["sig768_vecs_per_sec"] = round(n_emb / dt, 1)

    total = round(sum(timings.values()), 3)
    extras["bench_trials"] = TRIALS
    extras["leg_audit"] = LEG_AUDIT
    extras["loadavg_end"] = _loadavg()
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    shutil.rmtree(stage_dir, ignore_errors=True)
    payload = {
        "metric": "tiling_export_and_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "cpus": CPUS,
        **extras,
    }
    line = json.dumps(payload)
    # the machine-readable record survives stdout truncation (VERDICT r4
    # item 3: the driver's tail capture clipped the r4 line's head)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_LAST.json")
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
