"""Structured Streaming variants of the batch operators (SURVEY.md §2.J).

The reference is batch-only (AbstractHBaseTableSource.java:174-178
`isBounded() -> true`; the DataSet API pipeline in TsdbBulkload.java) — its
"streaming" is macro-level job orchestration. These operators are the
north-star NEW capability: the same TSDB semantics (5-minute rollup E2,
latest-version dedup D3/E1, upsert sink H4/H6) expressed over unbounded
input with watermarks and state.
"""

from hbase_bulkload_service_spark.streaming.ops import (  # noqa: F401
    CELL_SCHEMA,
    EWMA_SAMPLE_SCHEMA,
    SAMPLE_SCHEMA,
    await_finite,
    stream_stream_interval_join,
    streaming_bulkload,
    streaming_counter_deltas,
    streaming_counter_rate,
    streaming_ewma_chart,
    streaming_first_seen_dedup,
    streaming_incremental_dedup,
    streaming_latest_version,
    streaming_lookup_join,
    streaming_rollup_5m,
    upsert_batch_writer,
)
