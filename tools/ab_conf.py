"""Same-session A/B for runtime-settable Spark confs over registry queries.

Usage::

    python tools/ab_conf.py --conf spark.k=v[,spark.k2=v2] \
        --queries q01_pricing_summary,q02_revenue_by_nation \
        [--runs 2] [--sf /root/testdata/sf0.1]

Methodology mirrors bench.py (noop sink, cachereg release + clearCache
between queries, per-query MIN across runs) but interleaves A (session
defaults) and B (defaults + the given confs) inside ONE session so both
arms see the same JVM/VM state. Prints per-query A/B mins and the total.
Only confs that are runtime-settable (planner/AQE/arrow) are valid here —
static confs (e.g. spark.serializer) need a fresh session per arm; use
--fresh-session for those (two sequential sessions, arm A first).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_bulkload_service_spark import cachereg, registry  # noqa: E402
from hbase_bulkload_service_spark.session import get_spark  # noqa: E402


def _run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = registry.QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    cachereg.release_all()
    spark.catalog.clearCache()
    return round(sec, 3)


def _warm(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    registry.QUERIES["q04_point_get"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    ident = pandas_udf(lambda s: s, "long")
    spark.range(0, 100000).repartition(8).select(
        ident(F.col("id")).alias("x")
    ).write.format("noop").mode("overwrite").save()
    from hbase_bulkload_service_spark.sources.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--conf", required=True, help="k=v[,k=v...] for arm B")
    p.add_argument("--queries", required=True)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--fresh-session", action="store_true")
    args = p.parse_args()

    confs = dict(kv.split("=", 1) for kv in args.conf.split(","))
    names = args.queries.split(",")

    a: dict[str, list[float]] = {n: [] for n in names}
    b: dict[str, list[float]] = {n: [] for n in names}

    if args.fresh_session:
        spark = get_spark(app_name="ab_conf_A")
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark, args.sf)
        for _ in range(args.runs):
            for n in names:
                a[n].append(_run_one(spark, n, args.sf))
        spark.stop()
        spark = get_spark(app_name="ab_conf_B", **confs)
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark, args.sf)
        for _ in range(args.runs):
            for n in names:
                b[n].append(_run_one(spark, n, args.sf))
        spark.stop()
    else:
        spark = get_spark(app_name="ab_conf")
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark, args.sf)
        base = {k: spark.conf.get(k, None) for k in confs}
        for _ in range(args.runs):
            for n in names:
                a[n].append(_run_one(spark, n, args.sf))
            for k, v in confs.items():
                spark.conf.set(k, v)
            for n in names:
                b[n].append(_run_one(spark, n, args.sf))
            for k, v in base.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    amin = {n: min(v) for n, v in a.items()}
    bmin = {n: min(v) for n, v in b.items()}
    out = {
        "conf": confs,
        "runs": args.runs,
        "a_min": amin,
        "b_min": bmin,
        "a_total": round(sum(amin.values()), 3),
        "b_total": round(sum(bmin.values()), 3),
        "ratio": round(sum(bmin.values()) / max(sum(amin.values()), 1e-9), 3),
        "per_query_ratio": {
            n: round(bmin[n] / max(amin[n], 1e-9), 3) for n in names
        },
        "a_runs": a,
        "b_runs": b,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
