"""Catalog-table listing with a refresh-interval watermark — the
ListDatabaseTables analog.

Reference semantics (nifi-nar-bundles/nifi-standard-bundle/
nifi-standard-processors/src/main/java/org/apache/nifi/processors/
standard/ListDatabaseTables.java:1-317): enumerate tables from catalog
metadata with optional schema/name filters, emit each table AT MOST ONCE
per refresh interval (state keyed by fully-qualified name stores the
last-listed timestamp), optionally attach a row count. The JDBC
DatabaseMetaData walk becomes a spark.catalog.listTables() walk; the
StateManager entry becomes a KVState dict with the same
commit-then-checkpoint discipline as the file-listing source: the caller
persists the returned state only AFTER the downstream batch commits, so
a crash between list and commit re-lists (at-least-once, like the
reference).
"""

from __future__ import annotations

import fnmatch
import time


def list_database_tables(spark, state, key: str = "db_tables",
                         database: str | None = None,
                         pattern: str | None = None,
                         refresh_seconds: float = 3600.0,
                         include_count: bool = False,
                         now: float | None = None) -> tuple[list[dict], dict]:
    """Tables not yet listed inside the refresh window.

    Returns (entries, new_state); commit new_state via
    ``state.put(key, new_state)`` only after downstream commits.
    `now` is injectable for deterministic tests.
    """
    ts = time.time() if now is None else now
    st = state.get(key)
    listed: dict = dict(st.get("listed", {}))
    entries: list[dict] = []
    tables = (spark.catalog.listTables(database) if database
              else spark.catalog.listTables())
    for t in sorted(tables, key=lambda t: t.name):
        if pattern and not fnmatch.fnmatch(t.name, pattern):
            continue
        fq = ".".join([p for p in [t.catalog, *(t.namespace or []), t.name]
                       if p])
        last = listed.get(fq)
        if last is not None and ts - last < refresh_seconds:
            continue
        e = {"catalog": t.catalog, "namespace": list(t.namespace or []),
             "table": t.name, "type": t.tableType,
             "is_temporary": bool(t.isTemporary)}
        if include_count:
            e["row_count"] = spark.table(
                t.name if t.isTemporary else fq).count()
        entries.append(e)
        listed[fq] = ts
    return entries, {"listed": listed}
