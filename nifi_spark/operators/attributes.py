"""Attribute operators — projection/update/hash over typed columns.

NiFi ancestors:
* UpdateAttribute (nifi-update-attribute-bundle/.../UpdateAttribute.java:
  124-260): set/delete attributes, optional rules engine (conditions →
  actions) — here `update_columns` with plain Column expressions and
  `when` chains (the EL interpreter is replaced wholesale by Catalyst,
  SURVEY.md §2.9/§3.2).
* AttributesToJSON (standard/AttributesToJSON.java): attribute map →
  JSON document.
* HashContent / HashAttribute (standard/HashContent.java:56-123,
  HashAttribute.java): digest of content / selected attributes — the
  per-row sha256(content) invariant used for reference equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def update_columns(df: DataFrame, updates: dict[str, Column | str],
                   delete: list[str] | None = None) -> DataFrame:
    """Set columns from expressions; drop listed columns (UpdateAttribute).

    Values may be Columns OR NiFi EL property-value STRINGS — a string
    containing ${...} compiles through functions.el_parser exactly as
    NiFi compiles dynamic property values (a plain string without ${}
    is a literal, NiFi's behavior for static properties)."""
    from nifi_spark.functions.el_parser import compile_template
    compiled = {k: (compile_template(v) if "${" in v else F.lit(v))
                if isinstance(v, str) else v
                for k, v in updates.items()}
    out = df.withColumns(compiled)
    if delete:
        out = out.drop(*delete)
    return out


def update_with_rules(df: DataFrame,
                      rules: list[tuple[Column, dict[str, Column]]],
                      default: dict[str, Column] | None = None) -> DataFrame:
    """Rules engine: first matching condition's actions win per column
    (UpdateAttribute rules mode, UpdateAttribute.java:223-260)."""
    cols: dict[str, Column] = {}
    targets = {name for _, acts in rules for name in acts}
    for name in targets:
        expr = None
        for cond, acts in rules:
            if name in acts:
                expr = F.when(cond, acts[name]) if expr is None else expr.when(cond, acts[name])
        fallback = (default or {}).get(name, F.col(name) if name in df.columns
                    else F.lit(None))
        cols[name] = expr.otherwise(fallback)
    return df.withColumns(cols)


def global_sequence(df: DataFrame, order_col: str, start: int = 0,
                    out_col: str = "seq",
                    partitions: int | None = None) -> tuple[DataFrame, int]:
    """Cross-partition monotonic row numbering WITHOUT a global
    single-task sort: range-repartition on order_col (so partition i's
    values all precede partition i+1's), count rows per partition (a
    tiny driver-side list), turn the counts into cumulative offsets, and
    number within each partition with a PARTITIONED window. Every stage
    is parallel; the only driver data is one count per partition.
    Returns (numbered_df, next_sequence_value)."""
    from pyspark.sql.window import Window
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint PINS the range partitioning: repartitionByRange
    # SAMPLES its boundaries, so the counts job below and the final
    # evaluation would otherwise each sample their own (possibly
    # different) ranges — the driver-side offsets would then be stale
    # and the numbering wrong. Materializing once also means the input
    # is scanned once, not twice.
    d = (df.repartitionByRange(n, F.col(order_col))
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint())
    counts = {r["_pid"]: r["c"] for r in
              d.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long")), start
    off = F.create_map(*[F.lit(x) for kv in sorted(offsets.items())
                         for x in kv])
    w = Window.partitionBy("_pid").orderBy(F.col(order_col))
    out = (d.withColumn(out_col,
                        (off[F.col("_pid")]
                         + F.row_number().over(w) - 1).cast("long"))
           .drop("_pid"))
    return out, acc


def stateful_counter(df: DataFrame, state, key: str, order_col: str,
                     out_col: str = "seq") -> DataFrame:
    """@Stateful UpdateAttribute counter
    (nifi-update-attribute-bundle/.../UpdateAttribute.java:124): rows
    receive monotonically increasing sequence numbers that CONTINUE
    across batches — the next start value persists in a KVState
    (ledger.KVState). The numbering itself is `global_sequence` (range
    partition + per-partition offsets — no global sort). State commits
    when this function returns; a crash before the downstream sink
    commits re-numbers the batch identically on replay (same state, same
    deterministic ordering)."""
    st = state.get(key, {"next": 0})
    out, nxt = global_sequence(df, order_col, start=int(st["next"]),
                               out_col=out_col)
    state.put(key, {"next": int(nxt)})
    return out


def attributes_to_json(df: DataFrame, cols: list[str],
                       out_col: str = "json") -> DataFrame:
    """Project selected columns into a JSON document column."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def hash_content(df: DataFrame, content_col: str = "content",
                 out_col: str = "content_sha256", algorithm: str = "sha256") -> DataFrame:
    """Digest of the content column (HashContent; MD5/SHA-256/xxhash)."""
    c = F.col(content_col)
    if algorithm == "sha256":
        h = F.sha2(c, 256)
    elif algorithm == "md5":
        h = F.md5(c)
    elif algorithm == "xxhash64":
        h = F.xxhash64(c).cast("string")
    else:
        raise ValueError(f"unsupported algorithm {algorithm!r}")
    return df.withColumn(out_col, h)


def hash_attribute(df: DataFrame, cols: list[str],
                   out_col: str = "group_key") -> DataFrame:
    """Stable hash over selected columns → grouping/partition key
    (HashAttribute grouping use, SURVEY.md §2.5)."""
    return df.withColumn(out_col,
                         F.sha2(F.concat_ws("", *[F.col(c) for c in cols]), 256))
