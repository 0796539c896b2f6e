"""Incremental layer: Structured Streaming versions of the engine's aggregations.

The reference's IVM machinery is dead code in its snapshot (SURVEY §2.8 —
``FoldOperators.scala`` fully commented out); what survives is a
finite-differencing prototype deriving delta queries for
map/filter/union/join/indexBy (``derivation/Prototype.scala:17-133``).
Structured Streaming provides exactly that capability natively: the same
DataFrame query executed incrementally with managed state. This package
exposes the reference's "register query → keep result maintained" intent
(``Optimization.addIndex``) as streaming-maintained materialized views.
"""

from linqonsteroids_spark.streaming.incremental import (  # noqa: F401
    CdcUpsertMV,
    IncrementalAggMV,
    VersionedAggMV,
    VersionedCdcMV,
    apply_change_feed_to_group_sum,
    StreamingIndex,
    ROCKSDB_PROVIDER,
    has_tws_runtime,
    sessionized_counts,
    stateful_running_totals,
    stateful_typed_totals,
    stream_stream_interval_join,
    streaming_index_by,
    windowed_aggregate,
)
