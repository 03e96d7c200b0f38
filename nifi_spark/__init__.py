"""nifi_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Reimplements the *capabilities* of Apache NiFi 1.1.2 (reference surveyed in
SURVEY.md) as idiomatic Spark: DataFrame stage combinators + a micro-batch
driver over an ordered change-event log, with exactly-once upsert/merge into
a bucketed, snapshot-versioned lake table, offset-ledger resumability,
schema evolution, provenance/lineage records, and skew-aware partitioning.

This is NOT a port of NiFi's execution engine — queues, scheduling agents,
content claims, the Expression Language interpreter, and clustering are all
replaced by Catalyst/Tungsten, the shuffle service, and snapshot commits.
"""

from nifi_spark.session import get_spark
from nifi_spark import fixtures, oracle

__all__ = ["get_spark", "fixtures", "oracle"]
__version__ = "0.1.0"
