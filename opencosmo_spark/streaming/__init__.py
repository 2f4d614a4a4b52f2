"""Structured Streaming surface.

The reference is pure batch (SURVEY §1.3) — this module is part of the
beyond-parity scope: the same engine operators applied to unbounded
event streams. Batch DataFrame queries (the `events` table operators)
carry over verbatim; this adds the streaming execution shell:
watermarks, windowed aggregation, sessionization, and a stateful
custom-operator hook.
"""

from .events import (
    ann_index_stream,
    block_pack_stream,
    corpus_dedup_stream,
    corpus_profile_stream,
    decontaminate_stream,
    near_dedup_stream,
    drift_monitor_stream,
    dedup_stream,
    event_time_expr,
    frequent_items_stream,
    interval_join_stream,
    read_event_stream,
    run_stream_to_memory,
    run_stream_to_parquet,
    streaming_top_items,
    running_user_stats,
    sessionize_stream,
    windowed_aggregate,
)

__all__ = [
    "read_event_stream",
    "ann_index_stream",
    "block_pack_stream",
    "event_time_expr",
    "frequent_items_stream",
    "streaming_top_items",
    "interval_join_stream",
    "corpus_dedup_stream",
    "corpus_profile_stream",
    "decontaminate_stream",
    "near_dedup_stream",
    "drift_monitor_stream",
    "dedup_stream",
    "windowed_aggregate",
    "sessionize_stream",
    "running_user_stats",
    "run_stream_to_memory",
    "run_stream_to_parquet",
]
