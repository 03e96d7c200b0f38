"""Provenance / lineage — per-partition records with NiFi's event vocabulary.

Event types are the subset of NiFi's ProvenanceEventType enum relevant to a
batch pipeline (nifi-api/src/main/java/org/apache/nifi/provenance/
ProvenanceEventType.java:25-126): RECEIVE, ROUTE, CONTENT_MODIFIED,
ATTRIBUTES_MODIFIED, FORK, JOIN, DROP, SEND. Record fields mirror
ProvenanceEventRecord.java:35-231 at partition granularity (componentId →
stage, content-claim coords → lsn range + row/byte counts).

Where NiFi journals one event per FlowFile into 16 rolling Lucene-indexed
files (nifi-docs/src/main/asciidoc/nifi-in-depth.adoc:94), the Spark-native
shape is ONE aggregated row per (stage, partition) appended to a parquet
table — queryable with plain SQL, no Lucene needed, and the write cost per
batch is O(partitions), not O(rows).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENT_TYPES = ("RECEIVE", "ROUTE", "CONTENT_MODIFIED", "ATTRIBUTES_MODIFIED",
               "FORK", "JOIN", "DROP", "SEND")

_SCHEMA = ("event_id long, event_type string, batch_id long, stage string, "
           "partition_id int, lsn_min long, lsn_max long, row_count long, "
           "byte_count long, ts timestamp")


class ProvenanceWriter:
    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled
        self._seq = 0

    def emit(self, events: DataFrame, event_type: str, batch_id: int,
             stage: str, content_col: str | None = "content") -> None:
        """Aggregate per Spark partition and append to the provenance table."""
        if not self.enabled:
            return
        assert event_type in EVENT_TYPES, event_type
        if content_col and content_col in events.columns:
            size = F.coalesce(F.octet_length(F.col(content_col)), F.lit(0))
        else:
            size = F.lit(0).cast("long")
        lsn = F.col("lsn") if "lsn" in events.columns else F.lit(None).cast("long")
        self._seq += 1
        base = self._seq * 1_000_000
        rec = (events
               .select(F.spark_partition_id().alias("partition_id"),
                       lsn.alias("lsn"), size.alias("_sz"))
               .groupBy("partition_id")
               .agg(F.min("lsn").alias("lsn_min"), F.max("lsn").alias("lsn_max"),
                    F.count(F.lit(1)).alias("row_count"),
                    F.sum("_sz").cast("long").alias("byte_count"))
               .select((F.lit(base) + F.col("partition_id")).alias("event_id"),
                       F.lit(event_type).alias("event_type"),
                       F.lit(batch_id).cast("long").alias("batch_id"),
                       F.lit(stage).alias("stage"),
                       "partition_id", "lsn_min", "lsn_max",
                       "row_count", "byte_count",
                       F.lit(time.time()).cast("timestamp").alias("ts")))
        rec.write.mode("append").parquet(self.path)

    def emit_counts(self, spark: SparkSession, event_type: str, batch_id: int,
                    stage: str, row_count: int, lsn_min: int = -1,
                    lsn_max: int = -1) -> None:
        """Driver-side scalar event (e.g. DROP count from a dedup stage)."""
        if not self.enabled:
            return
        self._seq += 1
        row = [(self._seq * 1_000_000, event_type, batch_id, stage, -1,
                lsn_min, lsn_max, row_count, 0)]
        df = spark.createDataFrame(
            row, "event_id long, event_type string, batch_id long, "
                 "stage string, partition_id int, lsn_min long, lsn_max long, "
                 "row_count long, byte_count long")
        df.withColumn("ts", F.lit(time.time()).cast("timestamp")) \
          .write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(_SCHEMA).parquet(self.path)


def lineage_for_lsn(prov: DataFrame, lsn: int) -> DataFrame:
    """Which batches/stages/partitions processed a given LSN — the
    submitLineageComputation analog (PersistentProvenanceRepository.java:
    2242-2259), as a plain predicate-pushdown query instead of a Lucene
    search."""
    return (prov.filter((F.col("lsn_min") <= lsn) & (F.col("lsn_max") >= lsn))
            .orderBy("batch_id", "event_id")
            .select("batch_id", "stage", "event_type", "partition_id",
                    "lsn_min", "lsn_max", "row_count", "ts"))


def batch_summary(prov: DataFrame) -> DataFrame:
    """Per-batch pipeline summary: rows/bytes per stage — the provenance
    query surface (submitQuery analog, :2006-2056)."""
    return (prov.groupBy("batch_id", "stage", "event_type")
            .agg(F.sum("row_count").alias("rows"),
                 F.sum("byte_count").alias("bytes"),
                 F.count(F.lit(1)).alias("partitions"),
                 F.min("lsn_min").alias("lsn_min"),
                 F.max("lsn_max").alias("lsn_max"))
            .orderBy("batch_id", "stage"))


def partition_balance(prov: DataFrame, stage: str = "compact") -> DataFrame:
    """Skew observability: per-batch max/mean partition row counts for a
    stage. The north-rule skew check — a hot repo must NOT concentrate
    into one partition after the narrow agg (salting/AQE would be the
    next lever if it did)."""
    per = prov.filter((F.col("stage") == stage) & (F.col("partition_id") >= 0))
    return (per.groupBy("batch_id")
            .agg(F.max("row_count").alias("max_rows"),
                 F.avg("row_count").alias("mean_rows"),
                 F.count(F.lit(1)).alias("partitions"))
            .withColumn("skew_ratio",
                        F.round(F.col("max_rows") / F.col("mean_rows"), 3))
            .orderBy("batch_id"))
