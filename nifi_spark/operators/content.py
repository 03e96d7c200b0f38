"""Content transforms + fragment contract (split/defragment/compaction).

NiFi ancestors:
* ReplaceText (standard/ReplaceText.java:79-159): regex/literal/prepend/
  append, Entire-text or Line-by-Line.
* ExtractText (standard/ExtractText.java): regex capture groups → columns.
* SplitText / SegmentContent (standard/SplitText.java:78-128,
  SegmentContent.java:1-50): 1→N fragmentation carrying the fragment
  contract `fragment.identifier / fragment.index / fragment.count`
  (restated in MergeContent.java:102-110).
* MergeContent (standard/MergeContent.java:127-222): Defragment mode
  (reassemble exactly fragment.count pieces in fragment.index order) and
  Bin-Packing mode (small-file compaction — here `bin_pack`, expressed as
  repartition-before-write, the Spark-native equivalent of claim
  coalescing, FileSystemRepository.java:105).

All transforms are built-in column expressions — JVM-side, whole-stage
codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def replace_text(df: DataFrame, content_col: str, search: str, replacement: str,
                 mode: str = "regex", out_col: str | None = None) -> DataFrame:
    """modes: regex | literal | prepend | append | always (ReplaceText)."""
    c = F.col(content_col)
    if mode == "regex":
        new = F.regexp_replace(c, search, replacement)
    elif mode == "literal":
        new = F.replace(c, F.lit(search), F.lit(replacement))
    elif mode == "prepend":
        new = F.concat(F.lit(replacement), c)
    elif mode == "append":
        new = F.concat(c, F.lit(replacement))
    elif mode == "always":
        new = F.lit(replacement)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.withColumn(out_col or content_col, new)


def replace_text_line_by_line(df: DataFrame, content_col: str, search: str,
                              replacement: str, sep: str = "\n") -> DataFrame:
    """Line-by-Line mode: transform() over split lines, re-joined —
    still fully JVM-side (higher-order function, no UDF)."""
    lines = F.split(F.col(content_col), sep)
    fixed = F.transform(lines, lambda ln: F.regexp_replace(ln, search, replacement))
    return df.withColumn(content_col, F.array_join(fixed, sep))


def extract_text(df: DataFrame, content_col: str,
                 patterns: dict[str, tuple[str, int]]) -> DataFrame:
    """Regex capture groups → new columns: {out_col: (pattern, group)}."""
    return df.withColumns({name: F.regexp_extract(F.col(content_col), pat, grp)
                           for name, (pat, grp) in patterns.items()})


def split_text(df: DataFrame, content_col: str, sep: str = "\n",
               id_cols: list[str] | None = None) -> DataFrame:
    """1→N split carrying the NiFi fragment contract:
    fragment_id / fragment_index / fragment_count (+ the fragment text)."""
    id_cols = id_cols or []
    parts = F.split(F.col(content_col), sep)
    frag_id = F.sha2(F.concat_ws("\x00", *[F.col(c) for c in id_cols],
                                 F.col(content_col)), 256) if id_cols else \
        F.sha2(F.col(content_col), 256)
    return (df.withColumn("fragment_id", frag_id)
              .withColumn("fragment_count", F.size(parts))
              .select("*", F.posexplode(parts).alias("fragment_index", "fragment"))
              .drop(content_col))


def segment_content(df: DataFrame, content_col: str, segment_chars: int,
                    id_cols: list[str] | None = None) -> DataFrame:
    """Fixed-size segmentation (SegmentContent): substring windows, no UDF."""
    id_cols = id_cols or []
    n = F.ceil(F.length(F.col(content_col)) / F.lit(segment_chars)).cast("int")
    frag_id = F.sha2(F.concat_ws("\x00", *[F.col(c) for c in id_cols],
                                 F.col(content_col)), 256)
    idx = F.explode(F.sequence(F.lit(0), n - 1))
    return (df.withColumn("fragment_id", frag_id)
              .withColumn("fragment_count", n)
              .select("*", idx.alias("fragment_index"))
              .withColumn("fragment",
                          F.substring(F.col(content_col),
                                      F.col("fragment_index") * segment_chars + 1,
                                      segment_chars))
              .drop(content_col))


def merge_defragment(df: DataFrame, content_col: str = "fragment",
                     sep: str = "\n", require_complete: bool = True) -> DataFrame:
    """Defragment: reassemble fragments in fragment_index order.

    `complete` = (#fragments seen == fragment_count) — MergeContent's
    Defragment completeness requirement (MergeContent.java:145-151).
    Incomplete groups are kept with complete=false when
    require_complete=False, else dropped (NiFi would hold them in the bin).
    """
    merged = (df.groupBy("fragment_id")
              .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct(F.col("fragment_index").alias("i"),
                                        F.col(content_col).alias("c")))),
                           lambda s: s["c"]), sep).alias("content"),
                   F.count(F.lit(1)).alias("_n"),
                   F.first("fragment_count").alias("_expected")))
    merged = merged.withColumn("complete", F.col("_n") == F.col("_expected"))
    if require_complete:
        merged = merged.filter(F.col("complete"))
    return merged.drop("_n", "_expected")


def bin_pack(df: DataFrame, target_rows_per_bin: int | None = None,
             correlation_col: str | None = None, n_bins: int | None = None) -> DataFrame:
    """Bin-packing = output-file compaction: co-locate rows into few
    partitions before write (MergeContent Bin-Packing / BinFiles.java:52-96).

    With a correlation column, rows sharing the key land in the same bin
    (repartition by key); otherwise coalesce to n_bins.
    """
    if correlation_col:
        return df.repartition(n_bins or df.sparkSession.sparkContext.defaultParallelism,
                              correlation_col)
    return df.coalesce(n_bins or 1)


def replace_text_with_mapping(df: DataFrame, content_col: str,
                              mapping: DataFrame, find_col: str = "find",
                              replace_col: str = "replace",
                              sep: str = " ") -> DataFrame:
    """Dictionary-driven whole-word find/replace
    (ReplaceTextWithMapping, standard/ReplaceTextWithMapping.java — the
    reference streams each FlowFile's content once against an in-memory
    mapping file; this is the same shape distributed).

    Plan: the mapping is broadcast-sized BY CONTRACT (NiFi loads it on
    the heap of every node), so it is collected once and inlined as a map
    literal; the replace is then a single narrow projection —
    transform(split(content)) with a per-token map lookup, zero
    exchanges, no per-row Python. (An earlier version posexploded every
    token of every document and reassembled with a groupBy/collect_list —
    two full-corpus wide shuffles for the same result.)
    For sub-word/regex mappings use replace_text per rule instead.
    """
    pairs = mapping.select(find_col, replace_col).collect()
    lookup = F.create_map(*[F.lit(v) for kv in pairs for v in (kv[0], kv[1])])
    words = F.split(F.col(content_col), sep)
    replaced = F.transform(words, lambda w: F.coalesce(lookup[w], w))
    return df.withColumn(content_col, F.array_join(replaced, sep))


def validate_csv(df: DataFrame, content_col: str, schema: str,
                 sep: str = ",") -> dict[str, DataFrame]:
    """CSV content validation → valid/invalid routing (ValidateCsv,
    standard/ValidateCsv.java:1-40). `schema` is a Spark DDL string; a
    row is invalid when from_csv leaves any non-null-typed field null or
    the corrupt-record marker fires."""
    from pyspark.sql.types import StructType
    parsed = df.withColumn(
        "_rec", F.from_csv(F.col(content_col), schema,
                           {"sep": sep, "mode": "PERMISSIVE"}))
    # Parse the DDL properly — naive ','-splitting mangles parameterized
    # types like decimal(10,2) into bogus field names.
    field_names = [f.name for f in StructType.fromDDL(schema).fields]
    ok = F.lit(True)
    for n in field_names:
        ok = ok & F.col(f"_rec.{n}").isNotNull()
    valid = parsed.filter(ok).drop("_rec")
    invalid = parsed.filter(~ok).drop("_rec")
    return {"valid": valid, "invalid": invalid}


def evaluate_json_path(df: DataFrame, content_col: str,
                       paths: dict[str, str]) -> DataFrame:
    """JsonPath → columns (EvaluateJsonPath, standard/EvaluateJsonPath.java):
    {out_col: '$.field'} via get_json_object (JVM-side)."""
    return df.withColumns({name: F.get_json_object(F.col(content_col), p)
                           for name, p in paths.items()})


def split_json_array(df: DataFrame, content_col: str,
                     element_schema: str | None = None) -> DataFrame:
    """Split a JSON array into one row per element with the fragment
    contract (SplitJson, standard/SplitJson.java)."""
    arr = F.from_json(F.col(content_col),
                      f"array<{element_schema or 'string'}>")
    return (df.withColumn("fragment_count", F.size(arr))
              .select("*", F.posexplode(arr).alias("fragment_index", "fragment"))
              .drop(content_col))


def evaluate_xpath(df: DataFrame, content_col: str,
                   paths: dict[str, str]) -> DataFrame:
    """XPath → columns (EvaluateXPath, standard/EvaluateXPath.java):
    {out_col: xpath} via the built-in xpath_string expression (JVM-side
    javax.xml; no Python in the path)."""
    return df.withColumns({
        name: F.xpath_string(F.col(content_col), F.lit(p))
        for name, p in paths.items()})


SYSLOG_3164 = (r"^(?:<(\d+)>)?"
               r"([A-Z][a-z]{2}\s{1,2}\d{1,2}\s\d{2}:\d{2}:\d{2})\s"
               r"(\S+)\s"
               r"([^:\[]+)(?:\[(\d+)\])?:\s*"
               r"(.*)$")


def parse_syslog(df: DataFrame, content_col: str) -> dict[str, DataFrame]:
    """RFC-3164 syslog line → structured columns, valid/invalid routing
    (ParseSyslog, standard/ParseSyslog.java). Pure regexp_extract."""
    g = lambda i: F.regexp_extract(F.col(content_col), SYSLOG_3164, i)  # noqa: E731
    parsed = df.withColumns({
        "syslog_priority": F.nullif(g(1), F.lit("")).cast("int"),
        "syslog_timestamp": g(2),
        "syslog_hostname": g(3),
        "syslog_tag": F.trim(g(4)),
        "syslog_pid": F.nullif(g(5), F.lit("")).cast("int"),
        "syslog_message": g(6),
    })
    ok = F.col(content_col).rlike(SYSLOG_3164) & (F.col("syslog_timestamp") != "")
    return {"valid": parsed.filter(ok),
            "invalid": df.filter(~(F.col(content_col).rlike(SYSLOG_3164))
                                 | (F.regexp_extract(F.col(content_col),
                                                     SYSLOG_3164, 2) == ""))}
