"""Dedup operators — first-seen detection and last-writer-wins compaction.

NiFi ancestors:
* DetectDuplicate (standard/DetectDuplicate.java:58-118): keyed dedup
  against a DistributedMapCache, first-seen wins, duplicate/non-duplicate
  relationships, age-off TTL.
* The (key, lsn) exactly-once watermark combination of DetectDuplicate +
  QueryDatabaseTable state (SURVEY.md §2.1/§2.5).

Spark-first: within a batch, first-seen is a min_by hash-agg (partial
map-side combine — skew-safe, no window sort); across batches, the
"cache" is the applied-keys ledger table and duplicates fall out of a
left_anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def detect_duplicate(df: DataFrame, key_cols: list[str], order_col: str,
                     seen: DataFrame | None = None) -> dict[str, DataFrame]:
    """Split into non_duplicate (EXACTLY one first occurrence per key, by
    order_col) and duplicate. `seen` (prior applied keys) routes
    cross-batch dups.

    Uses row_number (not min_by) because re-delivered rows share the same
    order value — a min-based tag would pass every tied copy as "first".
    The window sort is the price of exact multiplicity semantics; when
    only the surviving row matters, prefer `latest_wins` (hash-agg,
    map-side combine, skew-safe).
    """
    from pyspark.sql.window import Window
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    tagged = df.withColumn("_rn", F.row_number().over(w))
    non_dup = tagged.filter(F.col("_rn") == 1).drop("_rn")
    dup = tagged.filter(F.col("_rn") > 1).drop("_rn")
    if seen is not None:
        seen_keys = seen.select(*key_cols).distinct()
        cross_dup = non_dup.join(seen_keys, on=key_cols, how="left_semi")
        non_dup = non_dup.join(seen_keys, on=key_cols, how="left_anti")
        dup = dup.unionByName(cross_dup)
    return {"non_duplicate": non_dup, "duplicate": dup}


def latest_wins(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """LWW compaction: keep the row with max order_col per key — a single
    max_by hash aggregation (the engine's core compaction primitive)."""
    others = [c for c in df.columns if c not in key_cols]
    row = F.struct(*[F.col(c) for c in others])
    agg = (df.groupBy(*key_cols)
           .agg(F.max_by(row, F.col(order_col)).alias("_w")))
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in others])
