"""Per-query stage-parallelism audit (round 3).

Runs every registered query at the bench scale factor and, via Spark's
/api/v1 status API, flags stages that are HEAVY but UNDER-PARALLELIZED —
the shape of defect that serialized q69's shingle build onto one task
(Generate filter-inference trap, see SCALE.md). A flagged stage is not
automatically a bug (driver-bounded metadata collects are fine) but every
one must have an explanation.

Flag rule: stage runtime > --min-ms AND numTasks < cores/4.

Round 7 (VERDICT r06 item 6): by default the audit first RE-SPREADS the
base tables into a scratch mirror with file counts proportional to the
scale factor (the driver-generated sf0.1 parquet is 1-3 row groups per
table, so every raw scan planned <= 3 tasks and the SAME split-bounded
"few-task scan" flags — q01/q11/q130/q198 class — were re-adjudicated
every round; parquet cannot split inside a row group, so the fix must
rewrite the fixture). The mirror is schema-faithful (events' nanos
timestamps normalize through load_events either way), written once per
(sf_dir, file plan) and reused. --no-respread audits the raw fixtures.

Usage: python tools/stage_audit.py [sf_dir] [out_json] [--min-ms 1000]
       [--no-respread]
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


def respread_fixtures(spark, sf_dir: str, cpus: int) -> str:
    """Materialize a scratch mirror of the base tables with file counts
    proportional to table size (target ~4 MB/file, capped at the core
    count), so scan parallelism reflects the ENGINE's plan rather than
    the fixture's row-group count. Idempotent per (sf_dir, plan)."""
    import hashlib
    import tempfile

    from hbase_bulkload_service_spark.sources.tables import TABLES, load

    plan = {}
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(src)
            for f in fs
        ) if os.path.isdir(src) else os.path.getsize(src)
        plan[t] = max(1, min(cpus, -(-size // (4 * 1024 * 1024))))
    tag = hashlib.md5(
        (sf_dir + json.dumps(plan, sort_keys=True)).encode()
    ).hexdigest()[:10]
    dst = os.path.join(tempfile.gettempdir(), f"stage_audit_fixtures_{tag}")
    done = os.path.join(dst, "_DONE")
    if os.path.exists(done):
        return dst
    os.makedirs(dst, exist_ok=True)
    for t, n in plan.items():
        load(spark, sf_dir, t).repartition(n).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
    with open(done, "w") as f:
        json.dump(plan, f)
    print(f"respread fixtures -> {dst} ({plan})", flush=True)
    return dst


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stage_audit.json"
    min_ms = int(sys.argv[sys.argv.index("--min-ms") + 1]) if "--min-ms" in sys.argv else 1000
    # optional comma-separated query filter for fast iteration
    only = (
        set(sys.argv[sys.argv.index("--only") + 1].split(","))
        if "--only" in sys.argv
        else None
    )

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # the end-of-run status sweep needs EVERY query's stages still
        # retained (default 1000 evicts the early queries' stages on a
        # 170-query audit — same blind spot as the r05 linearity probe)
        .config("spark.ui.retainedStages", "60000")
        .config("spark.ui.retainedJobs", "30000")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    from hbase_bulkload_service_spark import cachereg, registry

    if "--no-respread" not in sys.argv:
        sf_dir = respread_fixtures(spark, sf_dir, cpus)

    app = _api(spark, "applications")[0]["id"]
    results: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        if only is not None and name not in only:
            continue
        cachereg.release_all()  # no cross-query persist contamination
        sc.setJobGroup(name, name)
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
        results[name] = {"wall_s": wall, "err": err, "flagged": []}

    # one status sweep at the end: map job groups -> stages
    jobs = _api(spark, f"applications/{app}/jobs")
    stages = {s["stageId"]: s for s in _api(spark, f"applications/{app}/stages")}
    seen: set[int] = set()
    for j in jobs:
        g = j.get("jobGroup")
        if g not in results:
            continue
        for sid in j["stageIds"]:
            if sid in seen:
                continue
            seen.add(sid)
            s = stages.get(sid)
            if s is None or s.get("status") != "COMPLETE":
                continue
            run_ms = s.get("executorRunTime", 0)
            n_tasks = s.get("numTasks", 0)
            if run_ms > min_ms and n_tasks < max(2, cpus // 4):
                results[g]["flagged"].append(
                    {
                        "stage": sid,
                        "tasks": n_tasks,
                        "run_ms": run_ms,
                        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                        "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                        "detail": (s.get("description") or s.get("name") or "")[:160],
                    }
                )

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    n_flag = sum(1 for r in results.values() if r["flagged"])
    for name, r in sorted(results.items()):
        if r["flagged"] or r["err"]:
            print(name, r["wall_s"], "s", r["err"] or "", json.dumps(r["flagged"]))
    print(f"AUDIT {len(results)} queries, {n_flag} with flagged stages (> {min_ms} ms, < {max(2, cpus // 4)} tasks)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
