"""Structured Streaming mirrors of the reference's queue pipeline
(SURVEY §2.9 Q1-Q13). Batch-deterministic forms live in ``queries/queue.py``
and are oracle-checked; these streaming forms share the same column logic
(``route_events`` is literally the same projection) and are smoke-tested
end-to-end in ``tests/test_streaming.py``.
"""

from .pipeline import (
    EVENT_SCHEMA,
    ROUTED_SCHEMA,
    batch_type_chi2,
    batch_value_drift,
    batch_value_psi,
    correlate_streams,
    dedup_stream,
    drift_monitor_stream,
    rate_limit_stream,
    streaming_heavy_hitters,
    merge_partial_indexes,
    read_document_stream,
    read_event_stream,
    read_index_state,
    read_pending_state,
    run_incremental_index,
    rollup_stream,
    route_events,
    run_prioritized_carryover,
    run_two_phase,
    session_counts,
    enrich_stream,
    sliding_counts,
    stale_users_stream,
    tumbling_counts,
    windowed_distinct_users,
)

__all__ = [
    "EVENT_SCHEMA",
    "ROUTED_SCHEMA",
    "batch_type_chi2",
    "batch_value_drift",
    "batch_value_psi",
    "correlate_streams",
    "dedup_stream",
    "drift_monitor_stream",
    "rate_limit_stream",
    "streaming_heavy_hitters",
    "merge_partial_indexes",
    "read_document_stream",
    "read_event_stream",
    "read_index_state",
    "read_pending_state",
    "run_incremental_index",
    "rollup_stream",
    "route_events",
    "run_prioritized_carryover",
    "run_two_phase",
    "session_counts",
    "enrich_stream",
    "sliding_counts",
    "stale_users_stream",
    "tumbling_counts",
    "windowed_distinct_users",
]
