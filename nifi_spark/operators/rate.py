"""Rate / activity operators — batch sizing and inactivity detection.

NiFi ancestors:
* ControlRate (standard/ControlRate.java:70-134): token-bucket throttle by
  count/bytes/attribute-sum, optionally per group. In a pull-based batch
  engine this becomes deterministic batch assignment — slice a stream into
  bounded micro-batches (the `maxOffsetsPerTrigger` analog).
* MonitorActivity (standard/MonitorActivity.java:67-113): emit `inactive`
  after a threshold with no data, `activity.restored` when data returns —
  here a driver-side assertion over batch stats.
* Connection back pressure (StandardFlowFileQueue.java:98,253-270):
  DEFAULT_BACKPRESSURE_COUNT=10000 → default batch cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_BATCH_CAP = 10_000  # NiFi DEFAULT_BACKPRESSURE_COUNT


def control_rate(df: DataFrame, order_col: str,
                 rows_per_batch: int = DEFAULT_BATCH_CAP,
                 group_col: str | None = None,
                 out_col: str = "batch_id") -> DataFrame:
    """Assign each row a deterministic micro-batch id.

    Grouped: position within the group's order / cap — a PARTITIONED
    window (parallel across groups; one group's rows must sort together
    anyway).

    Ungrouped (the changelog case): batch id is computed ARITHMETICALLY
    from the ordering column's value range — (order - min) / cap after a
    one-row min agg broadcast back. Assumes a dense ordering column (an
    LSN/sequence, which is what back pressure caps in the reference,
    StandardFlowFileQueue.java:98); sparse columns yield under-full
    batches, never over-full ones, so the cap still holds. (An earlier
    version used a partition-less row_number window — the whole stream
    through ONE task.)
    """
    if group_col:
        w = Window.partitionBy(group_col).orderBy(F.col(order_col))
        pos = F.row_number().over(w) - 1
        return df.withColumn(out_col, (pos / rows_per_batch).cast("long"))
    lo = df.agg(F.min(F.col(order_col)).alias("_lo"))
    return (df.crossJoin(F.broadcast(lo))
            .withColumn(out_col,
                        ((F.col(order_col) - F.col("_lo")) / rows_per_batch)
                        .cast("long"))
            .drop("_lo"))


def monitor_activity(batch_rows: list[int], inactive_after: int = 3) -> list[str]:
    """Driver-side inactivity detector over per-batch row counts: returns
    markers per batch: 'active' | 'inactive' | 'activity.restored'."""
    out, idle, was_inactive = [], 0, False
    for n in batch_rows:
        if n == 0:
            idle += 1
            if idle >= inactive_after:
                out.append("inactive")
                was_inactive = True
            else:
                out.append("active")
        else:
            out.append("activity.restored" if was_inactive else "active")
            idle, was_inactive = 0, False
    return out
