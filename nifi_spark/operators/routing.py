"""Routing operators — N-way splits on predicates, content, and dictionaries.

NiFi ancestors:
* RouteOnAttribute (standard/RouteOnAttribute.java:52-101,220-264):
  dynamic property per relationship, strategies Route-to-Property-Name
  (a row may go to EVERY matching branch), All-Match, Any-Match; rows
  matching nothing go to `unmatched`.
* RouteText (standard/RouteText.java:98-158): per-LINE routing with a
  grouping regex.
* RouteOnContent (standard/RouteOnContent.java): regex vs content.
* ScanAttribute/ScanContent (standard/ScanAttribute.java,
  ScanContent.java): dictionary-membership — here a broadcast semi-join.

Spark-first notes: a single-pass `when(...).otherwise('unmatched')` tag
column is preferred when branches are exclusive (one scan, no re-reads);
per-branch `filter` is used for route-to-all-matches because a row may
appear in several outputs — Catalyst still collapses each branch to one
pushed-down scan.
"""

from __future__ import annotations

# module-level so the pandas_udf type hints resolve: with stringized
# annotations (future import) the UDF introspector evaluates "pd.Series"
# against this module's globals (the text.py normalize lesson)
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

UNMATCHED = "unmatched"


def route_on_attribute(df: DataFrame, routes: dict[str, Column | str],
                       strategy: str = "exclusive") -> dict[str, DataFrame]:
    """N-way route. strategy:
    'exclusive'  — first matching route wins (single-pass when/otherwise);
    'all_matches'— copy to every matching route (NiFi Route-to-Property-Name);
    'any_match'  / 'all_match' — boolean fold to matched/unmatched.

    Conditions may be Columns or NiFi EL strings exactly as a flow
    definition carries them (``${value:gt(100)}``) — strings compile
    through functions.el_parser.
    """
    from nifi_spark.functions.el_parser import compile_el
    routes = {k: (compile_el(v) if isinstance(v, str) else v)
              for k, v in routes.items()}
    if strategy == "exclusive":
        tag = None
        for name, cond in routes.items():
            tag = F.when(cond, name) if tag is None else tag.when(cond, name)
        tagged = df.withColumn("_route", tag.otherwise(UNMATCHED))
        out = {name: tagged.filter(F.col("_route") == name).drop("_route")
               for name in routes}
        out[UNMATCHED] = tagged.filter(F.col("_route") == UNMATCHED).drop("_route")
        return out
    if strategy == "all_matches":
        out = {name: df.filter(cond) for name, cond in routes.items()}
        none_match = ~F.greatest(*[c.cast("boolean") for c in routes.values()]) \
            if len(routes) > 1 else ~list(routes.values())[0]
        out[UNMATCHED] = df.filter(F.coalesce(none_match, F.lit(True)))
        return out
    conds = list(routes.values())
    if strategy == "any_match":
        m = conds[0]
        for c in conds[1:]:
            m = m | c
    elif strategy == "all_match":
        m = conds[0]
        for c in conds[1:]:
            m = m & c
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return {"matched": df.filter(m), UNMATCHED: df.filter(~F.coalesce(m, F.lit(False)))}


def route_tag(df: DataFrame, routes: dict[str, Column],
              tag_col: str = "route") -> DataFrame:
    """Single-DataFrame variant: adds a route tag column (exclusive,
    first-match-wins) — the shape used for partitioned writes."""
    tag = None
    for name, cond in routes.items():
        tag = F.when(cond, name) if tag is None else tag.when(cond, name)
    return df.withColumn(tag_col, tag.otherwise(UNMATCHED))


def route_text(df: DataFrame, content_col: str, routes: dict[str, Column],
               line_col: str = "line", sep: str = "\n") -> DataFrame:
    """Per-line routing (RouteText): explode lines, tag each with its route.

    The route conditions reference `line_col`. Returns one row per line with
    (original columns, line_index, line, route).
    """
    exploded = df.select(
        "*", F.posexplode(F.split(F.col(content_col), sep)).alias("line_index",
                                                                  line_col))
    return route_tag(exploded, routes)


def route_on_content(df: DataFrame, content_col: str,
                     patterns: dict[str, str]) -> dict[str, DataFrame]:
    """Regex-vs-content routing, copy-to-each-match (RouteOnContent)."""
    return route_on_attribute(
        df, {name: F.col(content_col).rlike(p) for name, p in patterns.items()},
        strategy="all_matches")


def put_map_cache(df: DataFrame, key_col: str, value_col: str) -> Column:
    """PutDistributedMapCache: publish a (key → value) table as a
    broadcast map literal (standard/PutDistributedMapCache.java — NiFi
    materializes the cache on every node; the Spark analog is a
    constant-folded map in the plan, shipped with the broadcast).
    Returns a map Column for use with fetch_map_cache. Caller contract:
    the table is cache-sized (it lives on the driver and in every task),
    exactly as NiFi's DistributedMapCacheServer assumes."""
    rows = df.select(key_col, value_col).collect()
    return F.create_map(*[F.lit(v) for r in rows
                          for v in (r[key_col], r[value_col])])


def fetch_map_cache(cache: Column, key: Column | str,
                    default: Column | None = None) -> Column:
    """FetchDistributedMapCache as a column lookup against the broadcast
    map (complements the broadcast-join form used by scan_attribute)."""
    k = F.col(key) if isinstance(key, str) else key
    got = cache[k]
    return F.coalesce(got, default) if default is not None else got


def scan_attribute(df: DataFrame, col: str, dictionary: DataFrame,
                   dict_col: str, mode: str = "matched") -> DataFrame:
    """Dictionary-membership filter as a broadcast semi/anti join."""
    dim = F.broadcast(dictionary.select(F.col(dict_col).alias(col)).distinct())
    how = "left_semi" if mode == "matched" else "left_anti"
    return df.join(dim, on=col, how=how)


def scan_content(df: DataFrame, content_col: str, dictionary: DataFrame,
                 dict_col: str = "term", mode: str = "substring",
                 out_col: str = "matched_terms") -> DataFrame:
    """Dictionary match against the CONTENT stream (ScanContent,
    standard/ScanContent.java:1-307). NiFi runs Aho-Corasick over the
    raw bytes, so terms match ANYWHERE — including inside words; that is
    mode='substring' here (works on string or binary columns via
    contains()). mode='token' keeps whole-word membership for callers
    that want ScanAttribute-over-tokens semantics.

    The dictionary becomes a constant array literal in the plan (NiFi
    loads the dictionary file into memory on every node — same
    driver-sized contract as put_map_cache), and matching is ONE
    codegen'd filter/exists projection: O(len·terms) per row vs
    Aho-Corasick's O(len+hits), but with no JVM→Python boundary, no
    shuffle, and scan-dominated at the dictionary sizes the reference
    supports. mode='automaton' is the LARGE-dictionary scale path —
    the reference's actual Aho-Corasick (functions/ahocorasick.py)
    built once driver-side and run in an Arrow-batched mapInPandas:
    O(len + hits) per row, the right regime from ~10^4 terms up.
    Output is identical to 'substring' (dictionary-sorted matches).
    Adds `out_col` (matched terms, dictionary-sorted) and boolean
    `matched` for routing.
    """
    terms = sorted({r[0] for r in
                    dictionary.select(dict_col).distinct().collect()})
    if mode == "automaton":
        from nifi_spark.functions.ahocorasick import AhoCorasick
        ac = AhoCorasick(terms)

        @F.pandas_udf("array<string>")
        def _scan(s: pd.Series) -> pd.Series:
            return s.map(lambda v: [] if v is None
                         else sorted(ac.search(str(v))))

        out = (df.withColumn(out_col, _scan(F.col(content_col)))
               .withColumn("matched", F.size(F.col(out_col)) > 0))
        return out
    arr = F.array(*[F.lit(t) for t in terms])
    c = F.col(content_col)
    if mode == "substring":
        hits = F.filter(arr, lambda t: F.contains(c, t))
        staged = df
    elif mode == "token":
        # two-stage: the token array materializes in its own Project —
        # referencing it inside the per-term lambda would re-tokenize
        # the content once per dictionary term (lambda bodies get no
        # subexpression elimination)
        staged = df.withColumn("_toks", F.array_distinct(
            F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")))
        hits = F.filter(arr,
                        lambda t: F.array_contains(F.col("_toks"), t))
    else:
        raise ValueError(f"unknown scan_content mode: {mode}")
    out = (staged.withColumn(out_col, hits)
           .withColumn("matched", F.size(F.col(out_col)) > 0))
    return out.drop("_toks") if mode == "token" else out


def debug_flow(df: DataFrame, *, order_col: str,
               success_iterations: int = 1,
               failure_iterations: int = 0,
               rollback_iterations: int = 0,
               exception_iterations: int = 0) -> dict[str, DataFrame]:
    """DebugFlow analog (standard/DebugFlow.java — the reference's
    flow-testing processor cycles each incoming FlowFile through
    success → failure → rollback → exception relationships by its
    per-processor iteration counters).

    Batch analog: the row's position in the cycle is computed
    ARITHMETICALLY from `order_col`, which must be an integral
    ordinal (lsn, event id) — ``pos = order_col % cycle`` — so the
    route is a zero-shuffle codegen projection, not a global window
    (the same design rule as distribute_load/control_rate).
    'rollback' rows are the batch analog of session.rollback(): the
    caller re-feeds them next run. 'exception' rows model the
    configured throw — returned as a route so a driver can assert or
    raise on them deterministically.
    """
    spec = [("success", success_iterations),
            ("failure", failure_iterations),
            ("rollback", rollback_iterations),
            ("exception", exception_iterations)]
    cycle = sum(n for _, n in spec)
    if cycle <= 0:
        raise ValueError("debug_flow needs a positive iteration cycle")
    pos = F.col(order_col).cast("long") % F.lit(cycle)
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, n in spec:
        if n <= 0:
            continue
        out[name] = df.filter((pos >= lo) & (pos < lo + n))
        lo += n
    return out
