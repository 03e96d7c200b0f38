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
                    out_col: str = "destination",
                    strategy: str = "hash") -> DataFrame:
    """Weighted destination assignment (DistributeLoad weighted strategy,
    DistributeLoad.java:76-94 — which round-robins per node, so exact
    proportions are only ever statistical across the cluster).

    strategy='hash' (default, the scale path): slot =
    portable_hash(order_col) % total_weight — a stateless per-row
    projection, zero shuffles, deterministic given the column values, and
    proportions converge to the weights. (An earlier version ranked the
    whole dataset with a partition-less row_number window — a
    single-reducer global sort, the slowest possible plan at scale.)

    strategy='ordered': exact position-based round-robin via a GLOBAL
    window sort — exact proportions, but one-task; only for driver-sized
    batches (e.g. distributing a file listing, not a corpus).
    """
    from nifi_spark.functions.portable_hash import portable_hash64
    total = sum(weights.values())
    if strategy == "hash":
        if order_col:
            slot = F.pmod(portable_hash64(F.col(order_col).cast("string"),
                                          seed="dl:"), F.lit(total))
        else:
            slot = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                          F.lit(total))
    elif strategy == "ordered":
        from pyspark.sql.window import Window
        if not order_col:
            raise ValueError("strategy='ordered' requires order_col")
        slot = (F.row_number().over(Window.orderBy(F.col(order_col))) - 1) % total
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
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


def enforce_order(df: DataFrame, group_col: str, seq_col: str,
                  start: int = 0) -> dict[str, DataFrame]:
    """Per-group sequence enforcement (EnforceOrder shape: hold/route
    records whose sequence number is not the expected next one). Batch
    semantics: within each group, rows route to 'in_order' when their
    sequence is exactly start + their ordinal position (no gaps, no
    dups); 'out_of_order' otherwise (gap successors, duplicates). The
    window is PARTITIONED by group — parallel across groups."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(group_col).orderBy(F.col(seq_col).asc())
    pos = F.row_number().over(w) - 1
    tagged = df.withColumn("_expected", F.lit(start) + pos)
    ok = F.col(seq_col) == F.col("_expected")
    return {"in_order": tagged.filter(ok).drop("_expected"),
            "out_of_order": tagged.filter(~ok).drop("_expected")}


def repartition_by_key_range(df: DataFrame, n: int, *cols: str) -> DataFrame:
    """Range partitioning for ordered, co-located apply
    (GenerateTableFetch partition-planning analog, SURVEY.md §2.1)."""
    return df.repartitionByRange(n, *[F.col(c) for c in cols])
