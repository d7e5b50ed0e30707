"""Capture ``explain("formatted")`` for registered queries into plans/<round>/ (SPARK_GRAFT_PLANS_ROUND, default r09).

Usage: ``python tools/capture_plan.py <suffix> q56_bulkload_e2e[,q11_...]
[sf_dir]``

Writes ``plans/<round>/<query>_<suffix>.txt`` (suffix = "before"/"after") for
each named query. The plan is captured from the UNEXECUTED DataFrame the
registry builds (AdaptiveSparkPlan initial plan) — the same thing
``df.explain("formatted")`` prints interactively; judge-checkable without
running Spark.

Queries that materialize side effects at build time (e2e harnesses like
q56 write temp dirs while BUILDING the frame) still work: the returned
frame's plan is what gets captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_bulkload_service_spark import registry  # noqa: E402
from hbase_bulkload_service_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r09")
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"capture_plan_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
