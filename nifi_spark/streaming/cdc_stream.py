"""Streaming CDC apply + watermarked rollups.

NiFi is a continuous-operator system (timer/event scheduling,
SchedulingStrategy.java:51-74); Spark's analog is a micro-batch stream.
`StreamingCdcPipeline` wires `readStream(parquet dir)` with
`maxFilesPerTrigger` (the back-pressure knob — NiFi's queue threshold,
StandardFlowFileQueue.java:98) into `foreachBatch`, where each
micro-batch flows through the exact batch-engine path:

    filter lsn > ledger watermark   (drops replayed/late duplicates)
      → schema-change split + DDL   (same CdcPipeline code)
      → LWW merge into SnapshotTableStore (idempotent)
      → ledger commit

foreachBatch can re-deliver a batch after a crash; the merge is
idempotent under replay (max-by-LSN with stored `_last_lsn`), so the
sink is exactly-once end-to-end — the streaming checkpoint only decides
*scheduling*, the ledger + store decide *state*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from nifi_spark.ledger import OffsetLedger
from nifi_spark.pipeline import CdcPipeline
from nifi_spark.storage import SnapshotTableStore


class StreamingCdcPipeline:
    def __init__(self, spark: SparkSession, changelog_path: str,
                 store: SnapshotTableStore, ledger: OffsetLedger,
                 checkpoint_dir: str, stream: str = "changelog",
                 max_files_per_trigger: int = 8):
        self.spark = spark
        self.changelog_path = changelog_path
        self.store = store
        self.ledger = ledger
        self.checkpoint_dir = checkpoint_dir
        self.stream = stream
        self.max_files_per_trigger = max_files_per_trigger
        # reuse the batch engine for the apply logic
        self._pipe = CdcPipeline(spark, changelog_path, store, ledger,
                                 stream=stream, checksum=False)

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # The micro-batch carries whatever files the trigger picked up;
        # the ledger watermark — not the streaming offset — decides what
        # is new. agg is on the tiny batch slice.
        hi = batch_df.agg(F.max("lsn").alias("m")).first()["m"]
        if hi is None:
            return
        self._pipe.apply_until(int(hi))

    def start(self, schema: str | None = None, trigger_once: bool = True):
        """Start the stream; trigger_once processes the backlog and stops
        (the testable mode); otherwise runs continuously."""
        schema = schema or (
            "lsn long, op string, repo string, path string, commit string, "
            "lang string, content string, ts timestamp, sc_kind string, "
            "sc_column string, sc_new_name string, sc_dtype string")
        reader = (self.spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
                  .parquet(self.changelog_path))
        writer = (reader.writeStream
                  .foreachBatch(self._apply_batch)
                  .option("checkpointLocation", self.checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def windowed_rollup(events: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour", watermark: str = "2 hours",
                    keys: list[str] | None = None) -> DataFrame:
    """Watermarked tumbling-window aggregation for late data — the
    streaming analog of the hourly rollup query. Late events beyond the
    watermark are dropped and counted by Spark's state store; NiFi's
    closest construct is the listing lag guard
    (AbstractListProcessor.java:159,384)."""
    keys = keys or []
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                  .alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), *keys,
                    "n", "sum_value"))


def dedup_stream(events: DataFrame, key_cols: list[str],
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming DetectDuplicate: the first event per key wins, with
    state that EXPIRES at the watermark horizon —
    dropDuplicatesWithinWatermark, so state size is bounded by
    rate × horizon instead of growing forever like a bare
    dropDuplicates (the reference's DetectDuplicate bounds its cache
    the same way via the cache's eviction policy,
    standard/DetectDuplicate.java:58-68 + the map-cache TTL).

    Duplicates farther apart than the horizon can BOTH survive — the
    documented trade every watermarked dedup makes; size the horizon
    to the feed's redelivery window (at-least-once redeliveries are
    near-duplicates in time by construction)."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


def interval_join_streams(left: DataFrame, right: DataFrame,
                          key_cols: list[str],
                          left_ts: str = "ts", right_ts: str = "ts",
                          watermark: str = "1 hour",
                          within: str = "30 minutes",
                          how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join: a right event matches a
    left event with equal keys whose time lies in
    [left_ts, left_ts + within]. This is the two-live-feeds enrichment
    the reference approximates with Fetch/PutDistributedMapCache
    (standard/FetchDistributedMapCache.java) — but with real event-time
    semantics: both sides carry watermarks, so the join state each side
    buffers is bounded by rate × (watermark + within) instead of the
    whole feed. Late rows beyond the watermark are dropped, the
    documented trade.

    Output: key columns + left columns (l_ prefix where renamed by the
    caller) + right columns; the right timestamp keeps its name with a
    `right_` prefix if it collides. Columns other than the keys must be
    disjoint across the two sides."""
    if right_ts == left_ts:
        right = right.withColumnRenamed(right_ts, f"right_{right_ts}")
        right_ts = f"right_{right_ts}"
    dup = (set(left.columns) & set(right.columns)) - set(key_cols)
    if dup:
        raise ValueError(f"non-key columns collide across sides: {dup}")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in key_cols:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    cond = (cond & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{right_ts}")
               <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")))
    joined = lw.join(rw, cond, how)
    keep = [F.col(f"l.{k}").alias(k) for k in key_cols]
    keep += [F.col(f"l.{c}") for c in left.columns if c not in key_cols]
    keep += [F.col(f"r.{c}") for c in right.columns if c not in key_cols]
    return joined.select(*keep)
