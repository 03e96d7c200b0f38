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
    """Assign each row a deterministic micro-batch id: position within the
    (optionally per-group) order, divided by the batch cap."""
    w = (Window.partitionBy(group_col) if group_col else
         Window.partitionBy()).orderBy(F.col(order_col))
    pos = F.row_number().over(w) - 1
    return df.withColumn(out_col, (pos / rows_per_batch).cast("long"))


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
