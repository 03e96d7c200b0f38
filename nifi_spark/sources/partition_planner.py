"""Parallel-fetch partition planning — the GenerateTableFetch analog.

GenerateTableFetch plans parallel pulls with one COUNT/MAX metadata query
followed by LIMIT/OFFSET pages of 10,000 rows (nifi-nar-bundles/
nifi-standard-bundle/nifi-standard-processors/src/main/java/org/apache/
nifi/processors/standard/GenerateTableFetch.java:146-240). LIMIT/OFFSET
degrades linearly on large tables; the Spark-native plan is range
predicates from quantiles, which `spark.read.jdbc(partitionColumn=...)`
or a filtered scan can fetch in parallel with index-range scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_fetch_partitions(df: DataFrame, column: str,
                          rows_per_partition: int = 100_000,
                          max_partitions: int = 4096) -> list[tuple]:
    """Split `df` into ~equal ranges of `column`.

    Returns [(lo, hi), ...] half-open ranges covering all values, sized by
    approxQuantile — one cheap pass, no LIMIT/OFFSET re-scans. Feed these
    to `spark.read.jdbc` bounds or to per-range filters.
    """
    n = df.count()
    if n == 0:
        return []
    k = min(max(1, n // rows_per_partition), max_partitions)
    if k == 1:
        return [(None, None)]
    probs = [i / k for i in range(1, k)]
    cuts = df.approxQuantile(column, probs, 0.001)
    # dedupe equal cuts (skewed columns collapse ranges)
    uniq: list[float] = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    bounds: list[tuple] = []
    lo = None
    for c in uniq:
        bounds.append((lo, c))
        lo = c
    bounds.append((lo, None))
    return bounds
