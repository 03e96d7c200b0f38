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
