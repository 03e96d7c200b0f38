"""CdcPipeline — the micro-batch driver: tail → compact → merge → checkpoint.

One NiFi session-commit == one micro-batch here (SURVEY.md §3.1 mapping):

    read change slice (lsn > ledger watermark, pushdown to parquet scan)
      → split at schema_change boundaries, apply DDL serially between
        sub-batches (NiFi sidesteps this — every processor is schema-less;
        ConvertJSONToSQL.java:101-113 is its drift-policy ancestor)
      → LWW compaction per (repo,path) via max_by hash-agg
        (map-side partial combine ⇒ hot-repo skew tolerated; the window/sort
        alternative would shuffle+sort the whole slice)
      → SnapshotTableStore.merge — dirty-bucket snapshot commit (atomic)
      → provenance records per stage/partition
      → OffsetLedger.commit (checksum'd) — AFTER the table commit

Crash matrix (tests/test_resume.py): crash before merge ⇒ nothing happened;
crash between merge and ledger ⇒ batch replays, `_last_lsn` LWW makes the
replay idempotent; crash after ledger ⇒ batch never replays. Exactly-once
final state in all three.

Duplicate (key,lsn) re-deliveries — NiFi's DetectDuplicate concern
(standard/DetectDuplicate.java:58-68) — are absorbed by two mechanisms:
cross-batch dups have lsn <= watermark and never pass the slice filter;
in-batch dups collapse in the max_by compaction (identical payload).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from nifi_spark.ledger import OffsetLedger, slice_checksum
from nifi_spark.provenance import ProvenanceWriter
from nifi_spark.storage import KEY, SnapshotTableStore


@dataclass
class BatchStats:
    batch_id: int
    lsn_from: int
    lsn_to: int
    events: int = 0
    data_events: int = 0
    schema_events: int = 0
    upserts: int = 0
    deletes: int = 0
    sub_batches: int = 0
    table_version: int = -1


@dataclass
class CdcPipeline:
    spark: SparkSession
    changelog_path: str
    store: SnapshotTableStore
    ledger: OffsetLedger
    stream: str = "changelog"
    provenance: ProvenanceWriter | None = None
    checksum: bool = True
    coalesce_ddl: bool = False  # True: apply all DDL up-front (perf mode,
    # valid while data events never reference evolved columns)
    history: list[BatchStats] = field(default_factory=list)

    # ---------------- source ----------------
    def _read_slice(self, lsn_from_excl: int, lsn_to_incl: int) -> DataFrame:
        # Both predicates push down to the parquet scan (min/max row-group
        # pruning) — the QueryDatabaseTable incremental-fetch analog
        # (standard/QueryDatabaseTable.java:324-354: strict '>' on the
        # first watermark column).
        return (self.spark.read.parquet(self.changelog_path)
                .filter((F.col("lsn") > F.lit(lsn_from_excl))
                        & (F.col("lsn") <= F.lit(lsn_to_incl))))

    # ---------------- compaction ----------------
    def _compact(self, data: DataFrame) -> DataFrame:
        """One row per key: the winning event by LSN, op ∈ {upsert, delete}.

        A delete followed by a same-batch re-insert resolves to the
        re-insert (higher lsn); a trailing delete survives as a tombstone —
        the FIXTURES.md edge cases fall out of max-by-LSN directly.
        """
        cols = [n for n, _ in self.store.schema_columns()]
        data = data.select(
            *[F.col(c) if c in data.columns else F.lit(None).cast(t).alias(c)
              for c, t in self.store.schema_columns()],
            F.when(F.col("op") == "delete", "delete").otherwise("upsert").alias("op"),
            "lsn")
        row = F.struct(*[F.col(c) for c in cols], F.col("op"))
        return (data.groupBy(*KEY)
                .agg(F.max_by(row, F.col("lsn")).alias("w"),
                     F.max("lsn").alias("lsn"))
                .select(*[F.col(f"w.{c}").alias(c) for c in cols],
                        F.col("w.op").alias("op"), "lsn"))

    # ---------------- one micro-batch ----------------
    def apply_until(self, lsn_to_incl: int) -> BatchStats:
        wm = self.ledger.get(self.stream)["last_applied_lsn"]
        batch_id = self.ledger.get(self.stream)["batch_id"] + 1
        stats = BatchStats(batch_id=batch_id, lsn_from=wm, lsn_to=lsn_to_incl)
        if lsn_to_incl <= wm:
            return stats

        sl = self._read_slice(wm, lsn_to_incl).cache()
        try:
            stats.events = sl.count()  # materializes the cache
            if self.provenance:
                self.provenance.emit(sl, "RECEIVE", batch_id, "tail")

            # schema-change boundaries (tiny driver-side list; NiFi's analog
            # is per-record — we split the batch instead)
            sc = (sl.filter(F.col("op") == "schema_change")
                    .select("lsn", "sc_kind", "sc_column", "sc_new_name", "sc_dtype")
                    .sort("lsn").collect())
            data = sl.filter(F.col("op") != "schema_change")
            stats.schema_events = len(sc)

            if self.coalesce_ddl:
                for r in sc:
                    self.store.evolve(r.sc_kind, r.sc_column, r.sc_new_name,
                                      r.sc_dtype or "string", lsn=r.lsn)
                sc = []

            lo = wm
            boundaries = [r.lsn for r in sc] + [lsn_to_incl + 1]
            for i, b in enumerate(boundaries):
                sub = data.filter((F.col("lsn") > lo) & (F.col("lsn") < b))
                self._apply_data(sub, batch_id, stats)
                if i < len(sc):
                    r = sc[i]
                    self.store.evolve(r.sc_kind, r.sc_column, r.sc_new_name,
                                      r.sc_dtype or "string", lsn=r.lsn)
                lo = b - 1
                stats.sub_batches += 1

            cs = slice_checksum(data) if self.checksum else None
            stats.table_version = self.store.current_version()
            self.ledger.commit(self.stream, lsn_to_incl, batch_id, cs,
                               stats.table_version)
            self.history.append(stats)
            return stats
        finally:
            sl.unpersist()

    def _apply_data(self, sub: DataFrame, batch_id: int, stats: BatchStats) -> None:
        changes = self._compact(sub)
        if self.provenance:
            self.provenance.emit(changes, "JOIN", batch_id, "compact")
        res = self.store.merge(self.spark, changes)
        if res["dirty_buckets"] and self.provenance:
            self.provenance.emit_counts(self.spark, "SEND", batch_id, "merge",
                                        len(res["dirty_buckets"]))

    # ---------------- full run / resume ----------------
    def run(self, bounds: list[int]) -> list[BatchStats]:
        """Apply batches up to each bound; already-applied bounds skip (resume)."""
        out = []
        for b in bounds:
            out.append(self.apply_until(b))
        return out

    def final_table(self) -> DataFrame:
        return self.store.read(self.spark)
