"""Distribution / ordering — weighted fan-out, salting, prioritizers.

NiFi ancestors:
* DistributeLoad (standard/DistributeLoad.java:76-94,122,167-169):
  round-robin / next-available / weighted fan-out (e.g. 80/20).
* FlowFile prioritizers (nifi-standard-prioritizers/*): FIFO / newest /
  oldest / priority-attribute queue ordering.
* S2S load-aware peer weighting (PeerSelector.java:172-209) — on Spark
  the shuffle service replaces peers; what remains our job is explicit
  skew handling: `salt_keys` splits a hot key across `salt_n` sub-keys
  for pre-aggregation, then results re-combine on the unsalted key
  (north_rule requirement; AQE skew-join handles the join case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def distribute_load(df: DataFrame, weights: dict[str, int],
                    order_col: str | None = None,
                    out_col: str = "destination") -> DataFrame:
    """Weighted destination assignment (DistributeLoad weighted strategy).

    Deterministic: position in `order_col` order is taken modulo the total
    weight and mapped to destinations proportionally — a 5:1 weighting
    sends 5 of every 6 rows to the first destination.
    """
    from pyspark.sql.window import Window
    total = sum(weights.values())
    if order_col:
        pos = F.row_number().over(Window.orderBy(F.col(order_col))) - 1
    else:
        pos = F.monotonically_increasing_id()
    slot = pos % total
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (slot >= lo) & (slot < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn(out_col, expr)


def salt_keys(df: DataFrame, key_col: str, salt_n: int,
              salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt ∈ [0, salt_n) so a hot key spreads over
    salt_n reducers. Pre-aggregate on (key, salt), then finish on key —
    dedup/LWW must run on the UNSALTED key after the salted partial
    (SURVEY.md §7 'What's hard')."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                                    F.col(key_col)), F.lit(salt_n)).cast("int"))


def prioritize(df: DataFrame, strategy: str = "fifo",
               ts_col: str = "ts", priority_col: str = "priority") -> DataFrame:
    """Queue-ordering analog: fifo | newest_first | oldest_first |
    priority_attribute (ties broken FIFO, PriorityAttributePrioritizer)."""
    if strategy == "fifo" or strategy == "oldest_first":
        return df.orderBy(F.col(ts_col).asc())
    if strategy == "newest_first":
        return df.orderBy(F.col(ts_col).desc())
    if strategy == "priority_attribute":
        return df.orderBy(F.col(priority_col).asc(), F.col(ts_col).asc())
    raise ValueError(f"unknown strategy {strategy!r}")


def repartition_by_key_range(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """Range partitioning for ordered, co-located apply
    (GenerateTableFetch partition-planning analog, SURVEY.md §2.1)."""
    return df.repartitionByRange(n, *[F.col(c) for c in cols])
