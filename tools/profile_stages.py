"""Full per-query stage profile (optimization round 1).

Like tools/stage_audit.py but records EVERY completed stage per query
(executorRunTime, task count, input/shuffle bytes, executorCpuTime) so a
query's wall can be attributed: compute-bound vs shuffle-bound vs
scheduling overhead (wall >> sum(stage run)/cores). Used to target the
round-8 optimization work; stage_audit.py remains the under-parallelized
gate.

Usage: python tools/profile_stages.py [sf_dir] [out_json]
       [--only q1,q2] [--no-respread] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(spark, path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_stages.json"
    only = (
        sys.argv[sys.argv.index("--only") + 1].split(",")
        if "--only" in sys.argv
        else None
    )
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 1

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-stages")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.retainedStages", "60000")
        .config("spark.ui.retainedJobs", "30000")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    from hbase_bulkload_service_spark import cachereg, registry
    from tools.stage_audit import respread_fixtures

    if "--no-respread" not in sys.argv:
        sf_dir = respread_fixtures(spark, sf_dir, cpus)

    names = only if only is not None else sorted(registry.QUERIES)

    app = _api(spark, "applications")[0]["id"]
    results: dict[str, dict] = {}
    for rep in range(runs):
        for name in names:
            cachereg.release_all()
            group = f"{name}#r{rep}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            err = None
            try:
                registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:200]
            wall = round(time.time() - t0, 2)
            spark.catalog.clearCache()
            rec = results.setdefault(
                name, {"wall_s": wall, "err": err, "walls": [], "stages": []}
            )
            rec["walls"].append(wall)
            rec["wall_s"] = min(rec["walls"])
            rec.setdefault("groups", []).append(group)

    jobs = _api(spark, f"applications/{app}/jobs")
    stages = {s["stageId"]: s for s in _api(spark, f"applications/{app}/stages")}
    group_to_name = {g: n for n, r in results.items() for g in r["groups"]}
    seen: set[int] = set()
    for j in jobs:
        g = j.get("jobGroup")
        name = group_to_name.get(g)
        if name is None:
            continue
        rep = int(g.rsplit("#r", 1)[1])
        for sid in j["stageIds"]:
            if sid in seen:
                continue
            seen.add(sid)
            s = stages.get(sid)
            if s is None or s.get("status") != "COMPLETE":
                continue
            results[name]["stages"].append(
                {
                    "rep": rep,
                    "stage": sid,
                    "tasks": s.get("numTasks", 0),
                    "run_ms": s.get("executorRunTime", 0),
                    "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                    "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "detail": (s.get("description") or s.get("name") or "")[:120],
                }
            )

    for name, rec in results.items():
        rec["n_stages_rep0"] = sum(1 for s in rec["stages"] if s["rep"] == 0)
        rec["sum_run_ms_rep0"] = sum(
            s["run_ms"] for s in rec["stages"] if s["rep"] == 0
        )
        rec.pop("groups", None)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for name in names:
        r = results[name]
        print(
            f"{name}: wall={r['wall_s']}s stages={r['n_stages_rep0']} "
            f"sum_run={r['sum_run_ms_rep0']}ms err={r['err']}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
