"""Structured Streaming front-end (SURVEY.md §2.11).

The batch-incremental CdcPipeline is the primary engine; this package
runs the SAME apply semantics continuously: `readStream` over the
changelog directory → `foreachBatch` → the identical
store-merge-then-ledger protocol. Exactly-once comes from the same two
mechanisms as batch mode (idempotent LWW merge keyed by `_last_lsn`,
ledger written after the snapshot commit), not from trusting the
streaming checkpoint alone.
"""

from nifi_spark.streaming.cdc_stream import (StreamingCdcPipeline,
                                             dedup_stream,
                                             interval_join_streams,
                                             windowed_rollup)
from nifi_spark.streaming.dedup_index_stream import (
    StreamingDedupIndex, compact_index)
from nifi_spark.streaming.stateful import (detect_duplicate_stream,
                                           rate_limit_stream,
                                           sessionize_stream)

__all__ = ["StreamingCdcPipeline", "StreamingDedupIndex",
           "compact_index",
           "dedup_stream",
           "detect_duplicate_stream",
           "interval_join_streams", "windowed_rollup",
           "rate_limit_stream", "sessionize_stream"]
