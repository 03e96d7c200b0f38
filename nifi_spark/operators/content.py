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

import re

from pyspark.sql import Column, DataFrame, functions as F


def nifi_replacement(search: str, replacement: str) -> str:
    """NiFi's replacement-string normalization (ReplaceText.java:275-305,
    634-640), reproduced exactly so golden-file outputs match:

    1. escapeLiteralBackReferences — with ZERO capture groups in the
       search pattern the reference returns the input untouched
       (ReplaceText.java:276-278; a ``$N`` then throws at replace time
       and routes to failure — here the Spark task errors, the same
       contract). Otherwise each ``$N`` whose index (after repeatedly
       truncating a >=10 index by /10, Java Matcher's greedy group-number
       parse) exceeds the capture-group count gets a ``\\`` prefix.
       The reference computes insertion offsets on the PRE-insertion
       string (its Matcher keeps walking the original), so when two or
       more backrefs escape, the kth backslash lands k-1 characters
       early — mirrored here verbatim, quirk and all.
    2. normalizeReplacementString — if the result still contains ``$``
       followed by a NON-digit, the WHOLE string is quoted
       (Matcher.quoteReplacement): every ``\\`` and ``$`` literal.

    Java regexp replacement syntax is shared by Spark's regexp_replace,
    so the normalized string drops straight in."""
    import re as _re
    groups = _re.compile(search).groups
    value = replacement
    if groups > 0:
        positions = []
        for m in _re.finditer(r"\$(\d+)", replacement):
            num = m.group(1)
            if num.startswith("0"):
                continue
            n = int(num)
            while n > groups and n >= 10:
                n //= 10
            if n > groups:
                positions.append(m.start(1))  # first digit; '$' is at p-1
        for p in positions:  # stale offsets, exactly like the reference
            value = value[:p - 1] + "\\" + value[p - 1:]
    if _re.search(r"\$\D", value):
        value = value.replace("\\", "\\\\").replace("$", "\\$")
    return value


def replace_text(df: DataFrame, content_col: str, search: str, replacement: str,
                 mode: str = "regex", out_col: str | None = None) -> DataFrame:
    """modes: regex | literal | prepend | append | always (ReplaceText)."""
    c = F.col(content_col)
    if mode == "regex":
        new = F.regexp_replace(c, search, nifi_replacement(search, replacement))
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
                              replacement: str, sep: str = "\n",
                              mode: str = "regex") -> DataFrame:
    """Line-by-Line mode: transform() over split lines, re-joined —
    still fully JVM-side (higher-order function, no UDF). modes: regex |
    literal | prepend | append, matching the reference's strategies
    (ReplaceText.java:90-110); prepend/append respect a trailing CR when
    splitting on LF (the reference's CRLF golden behavior)."""
    lines = F.split(F.col(content_col), sep)
    if mode == "regex":
        repl = nifi_replacement(search, replacement)
        fn = lambda ln: F.regexp_replace(ln, search, repl)  # noqa: E731
    elif mode == "literal":
        fn = lambda ln: F.replace(ln, F.lit(search), F.lit(replacement))  # noqa: E731
    elif mode == "prepend":
        fn = lambda ln: F.concat(F.lit(replacement), ln)  # noqa: E731
    elif mode == "append":
        fn = lambda ln: F.concat(  # insert before a trailing CR
            F.regexp_replace(ln, "\r$", ""), F.lit(replacement),
            F.when(ln.rlike("\r$"), F.lit("\r")).otherwise(F.lit("")))  # noqa: E731
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.withColumn(content_col, F.array_join(F.transform(lines, fn), sep))


def extract_text(df: DataFrame, content_col: str,
                 patterns: dict[str, tuple[str, int]]) -> DataFrame:
    """Regex capture groups → new columns: {out_col: (pattern, group)}."""
    return df.withColumns({name: F.regexp_extract(F.col(content_col), pat, grp)
                           for name, (pat, grp) in patterns.items()})


def _demarcate_lines(data: bytes) -> list[tuple[bytes, int]]:
    """TextLineDemarcator analog: lines WITH their terminator
    (\n, \r, or \r\n), plus each line's terminator byte length."""
    import re as _re
    out = []
    for m in _re.finditer(rb"[^\r\n]*(?:\r\n|\r|\n)|[^\r\n]+", data):
        line = m.group(0)
        body = line.rstrip(b"\r\n")
        out.append((line, len(line) - len(body)))
    return out


def _split_text_doc(data: bytes, line_split_count: int,
                    header_line_count: int, header_marker: bytes | None,
                    max_fragment_size: int | None,
                    remove_trailing_newlines: bool) -> list[tuple] | None:
    """One document through the reference's exact split algorithm
    (SplitText.java:206-258 computeHeader/nextSplit/generateSplitFlowFiles).
    Returns [(fragment bytes, split_line_count, fragment_count)] or None
    for the insufficient-header failure route."""
    lines = _demarcate_lines(data)
    maxs = max_fragment_size if max_fragment_size is not None else float("inf")

    pos = 0
    header_last_crlf = 0
    if header_line_count > 0:
        if len(lines) < header_line_count:
            return None                                   # REL_FAILURE
        pos = header_line_count
        header_last_crlf = lines[pos - 1][1]
    elif header_marker is not None:
        while pos < len(lines) and lines[pos][0].startswith(header_marker):
            pos += 1
        # Java quirk: lastCrlfLength is taken from the line that BROKE the
        # marker scan (the first non-header line) when one exists
        header_last_crlf = lines[pos][1] if pos < len(lines) \
            else (lines[pos - 1][1] if pos else 0)
    header = b"".join(ln for ln, _ in lines[:pos])
    if len(header) > maxs:
        return None

    # greedy chunking with remainder carry (nextSplit)
    chunks: list[list[tuple[bytes, int]]] = []
    cur: list[tuple[bytes, int]] = []
    cur_len = 0
    i = pos
    while i < len(lines):
        ln, crlf = lines[i]
        if cur and cur_len + len(ln) + len(header) > maxs:
            chunks.append(cur)
            cur, cur_len = [], 0
            continue                                      # line carries over
        if not cur and len(ln) + len(header) > maxs:
            chunks.append([lines[i]])                     # oversize line alone
            i += 1
            continue
        cur.append(lines[i])
        cur_len += len(ln)
        i += 1
        if line_split_count > 0 and len(cur) >= line_split_count:
            chunks.append(cur)
            cur, cur_len = [], 0
    if cur:
        chunks.append(cur)

    frags: list[tuple] = []
    if not chunks:
        if not header:
            return []
        frag = header[:len(header) - header_last_crlf]
        return [(frag, 0, 0)]
    for chunk in chunks:
        text = b"".join(ln for ln, _ in chunk)
        trailing = 0
        last_crlf = 0
        for ln, crlf in chunk:                            # Java's trim walk
            last_crlf = crlf
            if len(ln) == crlf:
                trailing += crlf
            elif len(ln) > crlf:
                trailing = 0
        if len(text) - trailing >= last_crlf:
            trailing += last_crlf
        content_len = (len(text) - trailing) if remove_trailing_newlines \
            else len(text)
        if not header and content_len == 0:
            continue                                      # dropped, but still
        if header and content_len == 0:                   # counted in total
            frag = header[:len(header) - header_last_crlf]
        else:
            frag = header + text[:content_len]
        frags.append((frag, len(chunk), len(chunks)))
    return frags


def split_text_grouped(df: DataFrame, content_col: str,
                       line_split_count: int, header_line_count: int = 0,
                       header_marker: str | None = None,
                       max_fragment_size: int | None = None,
                       remove_trailing_newlines: bool = True,
                       id_cols: list[str] | None = None) -> DataFrame:
    """Full-semantics SplitText analog (reference SplitText.java:90-461):
    N-lines-per-fragment grouping with header replication (line count or
    leading-marker headers), byte-budget fragment close with remainder
    carry (an oversize single line still ships alone), and the
    reference's exact trailing-newline trim (trailing blank lines + the
    last terminator). Emits the reference's attribute contract:
    fragment_index is 1-based over EMITTED fragments while
    fragment_count counts ALL computed chunks (dropped blank chunks
    included) — a reference quirk kept for parity. Insufficient header
    routes the row to relationship='failure' (content untouched).

    Scale shape: Arrow-batched mapInPandas — the greedy byte-budget fold
    is inherently sequential WITHIN a document, so the document is the
    unit of parallelism (same contract as the codec seams); the simple
    one-line-per-fragment case stays on the columnar split_text path."""
    import pandas as pd

    id_cols = id_cols or [c for c in df.columns if c != content_col]
    marker = header_marker.encode() if header_marker is not None else None
    cols = df.select(*id_cols, F.col(content_col).alias("_content"))
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.select(*id_cols).schema.fields)
    out_schema += (", relationship string, fragment string, "
                   "fragment_index int, fragment_count int, "
                   "split_line_count int, fragment_size int")

    def run(batches):
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                *ids, content = tup
                data = content.encode() if isinstance(content, str) \
                    else bytes(content)
                frags = _split_text_doc(
                    data, line_split_count, header_line_count, marker,
                    max_fragment_size, remove_trailing_newlines)
                if frags is None:
                    rows.append((*ids, "failure", None, None, None,
                                 None, None))
                    continue
                for idx, (frag, lc, total) in enumerate(frags, start=1):
                    rows.append((*ids, "splits", frag.decode(), idx,
                                 total, lc, len(frag)))
            yield pd.DataFrame(rows, columns=[*pdf.columns[:-1],
                                              "relationship", "fragment",
                                              "fragment_index",
                                              "fragment_count",
                                              "split_line_count",
                                              "fragment_size"])

    return cols.mapInPandas(run, schema=out_schema)


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


def merge_concat(df: DataFrame, content_col: str, group_col: str,
                 order_col: str, header: str = "", demarcator: str = "",
                 footer: str = "") -> DataFrame:
    """MergeContent Binary-Concatenation format with text delimiters
    (MergeContent.java MERGE_FORMAT_CONCAT + HEADER/DEMARCATOR/FOOTER —
    the reference reads them from files or literals; pass the resolved
    text here). One merged row per group: header + parts-in-order joined
    by demarcator + footer. One group-keyed hash-agg (map-side
    combinable) — the same shape as the v3 FlowFileStream pack."""
    merged = (df.groupBy(group_col)
              .agg(F.array_join(
                  F.transform(
                      F.array_sort(F.collect_list(
                          F.struct(F.col(order_col).alias("i"),
                                   F.col(content_col).alias("c")))),
                      lambda s: s["c"]), demarcator).alias("_body"),
                  F.count(F.lit(1)).alias("merge_count")))
    return (merged.withColumn(
        "content", F.concat(F.lit(header), F.col("_body"), F.lit(footer)))
        .drop("_body"))


def bin_assign(df: DataFrame, order_col: str, content_col: str,
               max_bytes: int = 64 << 20, max_rows: int = 100_000,
               correlation_col: str | None = None,
               out_col: str = "bin_id") -> DataFrame:
    """Deterministic bin ASSIGNMENT with byte + row caps (MergeContent
    Bin-Packing thresholds, BinFiles.java:52-96: Max Group Size /
    Max Entries; Max Bin Age is a streaming-trigger concern, not a batch
    one). A row opens a new bin when its start offset crosses a
    max_bytes boundary or its index crosses max_rows — both ids are
    monotone in sequence, so taking their max keeps bins contiguous and
    every bin within (max_bytes + one row, max_rows). The window is
    PARTITIONED by the correlation key (BinFiles' Correlation Attribute)
    → parallel across groups; compose with `bin_pack` to turn bin ids
    into output partitions/files. Without a correlation key the window
    is global — acceptable ONLY for listing-sized inputs (binning file
    listings, NiFi's actual use), not row-level corpora."""
    from pyspark.sql.window import Window
    # ROWS frame, not the default RANGE frame: with RANGE, rows tied on
    # order_col include each other's bytes in `start`, inflating offsets
    # past the documented max_bytes+one-row bound whenever order values
    # repeat (and diverging from a ROWS-frame SQL oracle).
    w = (Window.partitionBy(correlation_col) if correlation_col
         else Window.partitionBy(F.lit(0))).orderBy(F.col(order_col))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sz = F.coalesce(F.octet_length(F.col(content_col)), F.lit(0))
    start = F.coalesce(F.sum(sz).over(wsum) - sz, F.lit(0))
    idx = F.row_number().over(w) - 1
    byte_bin = (start / max_bytes).cast("long")
    row_bin = (idx / max_rows).cast("long")
    return df.withColumn(out_col, F.greatest(byte_bin, row_bin))


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
    if sep == "whitespace":
        # reference semantics (any-whitespace token boundaries, mixed
        # separators preserved): zero-width split keeps the separator
        # characters as their own array elements, so the rebuild is a
        # plain concat and every token sees ONE map lookup — still a
        # single-pass projection, zero exchanges.
        words = F.split(F.col(content_col),
                        r"(?=[ \t\r\n])|(?<=[ \t\r\n])")
        replaced = F.transform(words, lambda w: F.coalesce(lookup[w], w))
        return df.withColumn(content_col, F.array_join(replaced, ""))
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


def _split_cell_processors(schema: str) -> list[str]:
    """The reference's top-level splitter (ValidateCsv.java:251-293):
    top-level commas separate processors, parens nest (so argument
    lists with commas stay whole)."""
    out: list[str] = []
    buf, depth, i = "", 0, 0
    while i < len(schema):
        c = schema[i]
        i += 1
        if depth == 0 and c == ",":
            if buf.strip():
                out.append(buf.strip())
            buf = ""
            continue
        buf += c
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                out.append(buf.strip())
                buf = ""
    if buf.strip():
        out.append(buf.strip())
    return out


def _java_hashcode(cell):
    """Java String.hashCode as a Column: s[0]*31^(n-1)+... with 32-bit
    wraparound (mod-2^32 fold kept in longs, signed at the end).

    Java folds UTF-16 CODE UNITS while split('')/ascii yield
    codepoints, so supplementary-plane characters (emoji etc.) expand
    to their surrogate pair inside the fold: acc*31²+hi*31+lo with
    hi = 0xD800 + ((cp-0x10000) >> 10), lo = 0xDC00 + ((cp-0x10000)
    & 0x3FF). acc < 2^32 so acc*961 + 31*hi + lo < 2^43 — one pmod per
    element keeps everything in longs."""
    two32 = F.lit(4294967296).cast("long")

    def step(acc, ch):
        cp = F.ascii(ch).cast("long")
        sup = cp - 65536
        hi = F.shiftright(sup, 10) + 55296
        lo = F.pmod(sup, F.lit(1024).cast("long")) + 56320
        return F.when(cp < 65536, F.pmod(acc * 31 + cp, two32)) \
                .otherwise(F.pmod((acc * 31 + hi) * 31 + lo, two32))

    folded = F.aggregate(F.split(cell, ""), F.lit(0).cast("long"), step)
    return F.when(folded >= 2147483648, folded - 4294967296) \
            .otherwise(folded).cast("long")


def _cell_predicate(spec: str):
    """One cell processor → (predicate(Column)->Column | None,
    stateful-kind | None). Mirrors ValidateCsv.getProcessor
    (ValidateCsv.java:295-420, Super CSV semantics): empty CSV cells
    arrive as NULL; every parse check is strict (no leniency)."""
    opening = spec.find("(")
    method = (spec if opening == -1 else spec[:opening]).strip().lower()
    arg = None if opening == -1 else spec[opening + 1:spec.rfind(")")]

    def quoted_list(a: str) -> list[str]:
        return [s.strip() for s in a.replace('"', "").split(",")]

    if method == "null":
        return None, None
    if method == "optional":
        sub, stateful = _cell_predicate(arg)
        if stateful:
            raise ValueError("Optional() cannot wrap a stateful "
                             "processor")
        return (lambda c: c.isNull() | sub(c)), None
    if method == "parsedate":
        fmt = arg.strip().strip('"')
        return (lambda c: c.isNotNull()
                & F.try_to_timestamp(c, F.lit(fmt)).isNotNull()), None
    if method == "parsedouble":
        return (lambda c: c.try_cast("double").isNotNull()), None
    if method == "parsebigdecimal":
        pat = r"[-+]?(\d+(\.\d+)?|\.\d+)([eE][-+]?\d+)?"
        return (lambda c: c.isNotNull() & c.rlike(f"^{pat}$")), None
    if method == "parsebool":
        toks = ["true", "false", "1", "0", "t", "f", "y", "n"]
        return (lambda c: F.lower(c).isin(toks)), None
    if method == "parsechar":
        return (lambda c: F.length(c) == 1), None
    if method in ("parseint", "parselong"):
        t = "int" if method == "parseint" else "long"
        return (lambda c: c.rlike(r"^[-+]?\d+$")
                & c.try_cast(t).isNotNull()), None
    if method == "notnull":
        return (lambda c: c.isNotNull()), None
    if method == "strregex":
        pat = arg.strip().strip('"')
        return (lambda c: c.isNotNull()
                & c.rlike(f"^(?:{pat})$")), None
    if method == "strlen":
        lens = [int(x) for x in arg.split(",")]
        return (lambda c: F.length(c).isin(lens)), None
    if method == "strminmax":
        lo, hi = [int(x) for x in arg.split(",")]
        return (lambda c: c.isNotNull()
                & F.length(c).between(lo, hi)), None
    if method == "lminmax":
        lo, hi = [int(x) for x in arg.split(",")]
        return (lambda c: c.try_cast("long").between(lo, hi)), None
    if method == "dminmax":
        lo, hi = [float(x) for x in arg.split(",")]
        return (lambda c: c.try_cast("double").between(lo, hi)), None
    if method == "forbidsubstr":
        subs = quoted_list(arg)
        def pred(c):
            out = c.isNotNull()
            for s in subs:
                out = out & ~F.contains(c, F.lit(s))
            return out
        return pred, None
    if method == "requiresubstr":
        subs = quoted_list(arg)
        def pred(c):
            out = F.lit(False)
            for s in subs:
                out = out | F.contains(c, F.lit(s))
            return out
        return pred, None
    if method == "strnotnullorempty":
        return (lambda c: c.isNotNull() & (F.length(c) > 0)), None
    if method == "requirehashcode":
        codes = [int(x) for x in arg.split(",")]
        return (lambda c: c.isNotNull()
                & _java_hashcode(c).isin(codes)), None
    if method == "isincludedin":
        vals = quoted_list(arg)
        return (lambda c: c.isin(vals)), None
    if method == "equals":
        return None, "equals"
    if method in ("unique", "uniquehashcode"):
        # UniqueHashCode differs from Unique only through Java hashCode
        # collisions; value-uniqueness is the collision-free analog
        return None, "unique"
    raise ValueError(f"[{method}] is not an allowed method to define "
                     "a Cell Processor")


def validate_csv_cells(df: DataFrame, content_col: str, schema: str,
                       sep: str = ",", quote: str = '"',
                       order_col: str | None = None
                       ) -> dict[str, DataFrame]:
    """ValidateCsv with the reference's Super CSV cell-processor DSL
    (standard/ValidateCsv.java:240-420): each row of `content_col` is
    one CSV line, `schema` is the processor list — e.g.
    ``Null, ParseDate("dd/MM/yyyy"), Optional(ParseDouble())`` — and
    rows route valid/invalid per the identical cell semantics
    (TestValidateCsv cases replay verbatim in pytest).

    Stateless processors compile to Catalyst predicates over the split
    cells. The stateful trio needs cross-row context and `order_col`,
    and — like Super CSV, which aborts a row at its FIRST failing cell
    — its state is fed ONLY by rows that reached that cell: a row
    failing an earlier (more-leftward) processor never registers in
    Unique state and never anchors Equals. Unique()/UniqueHashCode()
    keep the first eligible occurrence (cumulative eligible-count over
    a per-value window — narrow keys), Equals() anchors on the first
    ELIGIBLE row's value (1-row broadcast; left join so an all-invalid
    input still routes every row to `invalid`). Field-count mismatches
    route invalid (checked by separator count on quote-free lines;
    quoted lines trust the CSV parser's null-fill) and abort before any
    cell state, again as the reference does."""
    procs = _split_cell_processors(schema)
    preds = [_cell_predicate(s) for s in procs]
    n = len(preds)
    ddl = ", ".join(f"_c{i} string" for i in range(n)) + ", _extra string"
    rec = F.from_csv(F.col(content_col), ddl,
                     {"sep": sep, "quote": quote, "mode": "PERMISSIVE"})
    out = df.withColumn("_rec", rec)
    ok = F.col("_rec._extra").isNull()
    esc = re.escape(sep)
    ok = ok & (F.contains(F.col(content_col), F.lit(quote))
               | (F.size(F.split(F.col(content_col), esc)) == n))
    if any(kind for _, kind in preds) and order_col is None:
        raise ValueError("Unique()/Equals() processors need "
                         "order_col= (first-occurrence semantics)")
    out = out.withColumn("_ok", ok)
    from pyspark.sql import Window
    # column order matters: `_ok` at processor i reflects exactly the
    # checks a Super CSV row passes before reaching cell i
    for i, (pred, kind) in enumerate(preds):
        cell = F.col(f"_rec._c{i}")
        if kind is None:
            if pred is not None:
                out = out.withColumn(
                    "_ok", F.col("_ok")
                    & F.coalesce(pred(cell), F.lit(False)))
        elif kind == "unique":
            w = (Window.partitionBy(cell).orderBy(order_col)
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
            cum = F.sum(F.when(F.col("_ok"), 1).otherwise(0)).over(w)
            out = out.withColumn("_ok", F.col("_ok") & (cum == 1))
        else:                                        # equals
            anchor = (out.filter(F.col("_ok")).orderBy(order_col)
                      .select(cell.alias("_anchor"),
                              F.lit(1).alias("_j")).limit(1))
            out = (out.withColumn("_j", F.lit(1))
                   .join(F.broadcast(anchor), "_j", "left")
                   .withColumn("_ok", F.col("_ok")
                               & cell.eqNullSafe(F.col("_anchor")))
                   .drop("_anchor", "_j"))
    valid = out.filter(F.col("_ok")).drop("_rec", "_ok")
    invalid = out.filter(~F.col("_ok")).drop("_rec", "_ok")
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


CEF_HEADER = (r"^CEF:(\d+)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)"
              r"\|([^|]*)\|(.*)$")


def parse_cef(df: DataFrame, content_col: str,
              ext_keys: list[str] | None = None) -> dict[str, DataFrame]:
    """ArcSight CEF line → structured columns + selected extension keys,
    valid/invalid routing (ParseCEF, standard/ParseCEF.java:1-50 — which
    delegates to a CEF parser lib; here the pipe-delimited header and
    `key=value` extension grammar are plain regexp_extract, JVM-side)."""
    g = lambda i: F.regexp_extract(F.col(content_col), CEF_HEADER, i)  # noqa: E731
    cols = {
        "cef_version": F.nullif(g(1), F.lit("")).cast("int"),
        "cef_vendor": g(2), "cef_product": g(3), "cef_device_version": g(4),
        "cef_signature_id": g(5), "cef_name": g(6),
        "cef_severity": g(7), "cef_extension": g(8),
    }
    for k in ext_keys or []:
        # value runs to the next ` key=` or end; CEF escapes spaces so a
        # bare non-space run is the token. The first extension key is
        # preceded by the header's final '|', later ones by whitespace.
        cols[f"cef_{k}"] = F.nullif(
            F.regexp_extract(F.col(content_col),
                             rf"(?:^|[\s|]){k}=(\S*)", 1), F.lit(""))
    parsed = df.withColumns(cols)
    ok = F.col(content_col).rlike(CEF_HEADER)
    return {"valid": parsed.filter(ok), "invalid": df.filter(~ok)}


MIME_MAGIC = [
    # NiFi's own envelope formats first (custom-mimetypes.xml gives
    # them top priority; flowfile-v1 = a tar whose first entry is
    # "flowfile.attributes")
    ("4E694669464633", "application/flowfile-v3"),   # "NiFiFF3"
    ("666C6F7766696C652E61747472696275746573",
     "application/flowfile-v1"),                      # "flowfile.attributes"
    ("89504E47", "image/png"), ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"), ("25504446", "application/pdf"),
    ("377ABCAF271C", "application/x-7z-compressed"),
    ("1F8B", "application/gzip"),
    ("425A68", "application/x-bzip2"), ("424D", "image/bmp"),
    ("3C3F786D6C", "application/xml"),                # "<?xml"
    ("494433", "audio/mpeg"), ("4F676753", "audio/ogg"),
    ("52494646", "audio/x-wav"),
    ("4F626A01", "application/avro-binary"),          # "Obj\x01"
]

#: Tika MimeType.getExtension() values for the detected types — the
#: mime.extension attribute surface (TestIdentifyMimeType's matrix)
MIME_EXTENSIONS = {
    "application/x-7z-compressed": ".7z", "application/x-msaccess": ".mdb",
    "text/plain": ".txt", "text/csv": ".csv",
    "application/x-bzip2": ".bz2", "application/gzip": ".gz",
    "application/zip": ".zip", "image/png": ".png",
    "image/jpeg": ".jpg", "application/pdf": ".pdf",
    "image/gif": ".gif", "application/x-tar": ".tar",
    "application/java-archive": ".jar", "application/xml": ".xml",
    "image/bmp": ".bmp", "audio/mpeg": ".mp3", "audio/ogg": ".ogg",
    "audio/x-wav": ".wav",
}


def identify_mime_type(df: DataFrame, content_col: str,
                       out_col: str = "mime_type",
                       filename_col: str | None = None,
                       extension_col: str | None = None) -> DataFrame:
    """Magic-byte content sniffing (IdentifyMimeType,
    standard/IdentifyMimeType.java — which wraps Apache Tika with
    NiFi's custom-mimetypes.xml; here the same rules as a when-chain,
    one narrow projection). Beyond head prefixes: GNU/POSIX tar via
    "ustar" at offset 257, Access via "Standard Jet DB" at offset 4,
    jar as a zip carrying META-INF/MANIFEST.MF in the first KiB
    (even-aligned hex match), and — like the reference, which passes
    the flowfile filename to Tika as RESOURCE_NAME_KEY — an optional
    `filename_col` hint that refines generic text to text/csv for
    *.csv names. `extension_col` adds Tika's mime.extension surface
    ('' for types Tika maps to none, e.g. the flowfile envelopes).
    Fallback: text/plain for printable-ASCII heads, else
    application/octet-stream. The reference's full TestIdentifyMimeType
    17-file matrix replays verbatim in pytest."""
    c = F.col(content_col)
    if dict(df.dtypes)[content_col] != "binary":
        c = F.encode(c, "utf-8")
    # 24-byte head: the longest prefix magic (flowfile.attributes, 19
    # bytes) must fit; the flowfile checks outrank tar — a v1 envelope
    # IS a tar whose first entry name is flowfile.attributes
    head = F.hex(F.substring(c, 1, 24))
    expr = F.when(
        head.startswith(bytes("NiFiFF3", "ascii").hex().upper()),
        "application/flowfile-v3").when(
        head.startswith(
            bytes("flowfile.attributes", "ascii").hex().upper()),
        "application/flowfile-v1").when(
        head.startswith("504B0304")
        & F.hex(F.substring(c, 1, 1024)).rlike("^(?:..)*?" + bytes(
            "META-INF/MANIFEST.MF", "ascii").hex().upper()),
        "application/java-archive").when(
        head.startswith("504B0304"), "application/zip").when(
        F.hex(F.substring(c, 5, 15))
        == bytes("Standard Jet DB", "ascii").hex().upper(),
        "application/x-msaccess").when(
        F.hex(F.substring(c, 258, 5))
        == bytes("ustar", "ascii").hex().upper(), "application/x-tar")
    for magic, mime in MIME_MAGIC:
        expr = expr.when(head.startswith(magic), mime)
    texty = F.substring(c, 1, 8).cast("string").rlike(
        r"^[\x09\x0A\x0D\x20-\x7E]*$")
    text_mime = F.lit("text/plain")
    if filename_col is not None:
        text_mime = F.when(F.lower(F.col(filename_col)).endswith(".csv"),
                           "text/csv").otherwise("text/plain")
    out = df.withColumn(out_col,
                        expr.otherwise(F.when(texty, text_mime)
                                       .otherwise(
                                           "application/octet-stream")))
    if extension_col is not None:
        ext = None
        for m, e in MIME_EXTENSIONS.items():
            cond = F.col(out_col) == m
            ext = F.when(cond, e) if ext is None else ext.when(cond, e)
        out = out.withColumn(extension_col, ext.otherwise(""))
    return out


def split_xml(df: DataFrame, content_col: str, tag: str,
              id_cols: list[str] | None = None) -> DataFrame:
    """Split an XML document into one row per <tag> element with the
    fragment contract (SplitXml, standard/SplitXml.java — SAX-based
    depth-1 splitting there; here a regexp_extract_all over the element
    span, which covers non-nested repeated records, the overwhelming
    splitting case). Compose with evaluate_xpath on `fragment` for
    field extraction."""
    id_cols = id_cols or []
    pat = rf"(?s)<{tag}(?:\s[^>]*)?>.*?</{tag}>"
    parts = F.regexp_extract_all(F.col(content_col), F.lit(pat), 0)
    frag_id = F.sha2(F.concat_ws("\x00", *[F.col(c) for c in id_cols],
                                 F.col(content_col)), 256) if id_cols else \
        F.sha2(F.col(content_col), 256)
    return (df.withColumn("fragment_id", frag_id)
              .withColumn("fragment_count", F.size(parts))
              .select("*", F.posexplode(parts).alias("fragment_index",
                                                     "fragment"))
              .drop(content_col))


def validate_xml(df: DataFrame, content_col: str) -> dict[str, DataFrame]:
    """Well-formedness routing (ValidateXml, standard/ValidateXml.java).

    Spark's built-in xpath expressions THROW on malformed XML (no
    try_-variant exists), which would fail the whole job instead of
    routing — so the check is an Arrow-batched mapInPandas parse
    (xml.etree, the expat C parser) producing a boolean; the split
    itself stays a DataFrame filter. This is a declared Python seam of
    the same kind as the codec operators."""
    from collections.abc import Iterator

    import pandas as pd

    schema = ", ".join(f"`{n}` {t}" for n, t in df.dtypes) + ", `_wf` boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        def ok(s):
            if s is None:
                return False
            try:
                ET.fromstring(s)
                return True
            except ET.ParseError:
                return False

        for pdf in batches:
            pdf = pdf.copy()
            pdf["_wf"] = pdf[content_col].map(ok)
            yield pdf

    tagged = df.mapInPandas(run, schema=schema)
    return {"valid": tagged.filter(F.col("_wf")).drop("_wf"),
            "invalid": tagged.filter(~F.col("_wf")).drop("_wf")}


def reshape_json(df: DataFrame, content_col: str, shift: dict[str, str],
                 defaults: dict[str, str] | None = None,
                 types: dict[str, str] | None = None,
                 out_col: str | None = None) -> DataFrame:
    """JSON restructuring combinator (JoltTransformJSON's shift+default
    specs, standard/JoltTransformJSON.java:1-50): `shift` maps output
    field → JsonPath in the input document; `defaults` adds constant
    fields; `types` casts extracted strings. Output is a rebuilt JSON
    document column (get_json_object → struct → to_json, all JVM-side).
    Like Jolt shift, fields whose path is absent are dropped (to_json
    omits nulls)."""
    fields = []
    for name, path in shift.items():
        c = F.get_json_object(F.col(content_col), path)
        if types and name in types:
            c = c.cast(types[name])
        fields.append(c.alias(name))
    for name, v in (defaults or {}).items():
        fields.append(F.lit(v).alias(name))
    return df.withColumn(out_col or content_col,
                         F.to_json(F.struct(*fields)))


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


def duplicate_flowfile(df: DataFrame, copies: int,
                       index_col: str = "copy_index") -> DataFrame:
    """Original + N clones per row (DuplicateFlowFile,
    standard/DuplicateFlowFile.java:69-82 — a load/test fan-out
    utility). index 0 = the original, 1..N the clones; the index column
    is this engine's observability addition (1.1.2 adds no attribute).
    One JVM-side sequence explode — no Python, no shuffle."""
    if copies < 0:
        raise ValueError("copies must be >= 0")
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(copies)))
        .alias(index_col))
