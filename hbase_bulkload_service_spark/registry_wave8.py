"""Registry wave 8 (q115+) — round-4 additions: oracle-gated sketch
accuracy (converts the last non-BPE rows-only gate into a hash-exact
row), the HFL1 binary-container bulkload round-trip, and exact heavy
hitters via the two-pass Misra-Gries shape.

Same portability rules as registry.py: integer cents, epoch-millis
timestamps, identical aliases both sides, DuckDB SUMs cast back to
BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_bulkload_service_spark.operators import analytics
from hbase_bulkload_service_spark.registry import cents, register
from hbase_bulkload_service_spark.sources.tables import load_events


# ===========================================================================
# q115 — sketch accuracy verdicts (oracle-gated twin of q73)
# ===========================================================================

@register(
    "q115_sketch_accuracy",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS hll_within_bound,
           TRUE AS gk_rank_within_bound
    FROM events
    GROUP BY event_type
    """,
)
def q115_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q73's sketches pushed through the cross-engine gate: the oracle
    computes the EXACT side (row count, distinct users) and asserts the
    accuracy booleans as literal TRUE — the row hash-matches iff HLL++
    and the GK median actually meet their error contracts on this data
    (operators/analytics.py:sketch_accuracy carries the integer-ppm
    bound algebra). Sketch STATES stay out of the oracle by nature;
    their ACCURACY no longer does."""
    ev = load_events(spark, sf_dir, spread=True).withColumn(
        "cents", cents(F.col("value"))
    )
    return analytics.sketch_accuracy(ev, "event_type", "user_id", "cents")
