"""Schema-drift policies — the ConvertJSONToSQL policy surface, Spark-side.

NiFi's only schema-drift controls live in ConvertJSONToSQL
(nifi-nar-bundles/nifi-standard-bundle/nifi-standard-processors/src/main/java/
org/apache/nifi/processors/standard/ConvertJSONToSQL.java):
  * Unmatched Field Behavior  — incoming field absent from the table:
    IGNORE | FAIL (:101-104,156-160)
  * Unmatched Column Behavior — table column absent from the record:
    IGNORE | WARN | FAIL (:105-113,162-166)

We keep both enums and add EVOLVE (add the column before merge — what the
Iceberg-era engine should do; NiFi 1.1.2 predates it). `reconcile` returns
the projection applied to the change set before SnapshotTableStore.merge.
"""

from __future__ import annotations

import logging
from enum import Enum

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger(__name__)

_META_COLS = {"op", "lsn", "ts", "sc_kind", "sc_column", "sc_new_name", "sc_dtype"}


class UnmatchedField(Enum):
    IGNORE = "ignore"   # drop incoming fields the table doesn't have
    FAIL = "fail"
    EVOLVE = "evolve"   # add them to the table first (Iceberg-style)


class UnmatchedColumn(Enum):
    IGNORE = "ignore"   # null-fill table columns the record lacks
    WARN = "warn"
    FAIL = "fail"


class SchemaDriftError(ValueError):
    pass


def reconcile(changes: DataFrame, table_columns: list[tuple[str, str]],
              field_policy: UnmatchedField = UnmatchedField.IGNORE,
              column_policy: UnmatchedColumn = UnmatchedColumn.IGNORE,
              evolve_fn=None) -> DataFrame:
    """Project a change set onto the table schema per the drift policies."""
    table_names = [n for n, _ in table_columns]
    incoming = [c for c in changes.columns if c not in _META_COLS]
    extra_fields = [c for c in incoming if c not in table_names]
    missing_cols = [n for n in table_names if n not in incoming]

    if extra_fields:
        if field_policy is UnmatchedField.FAIL:
            raise SchemaDriftError(f"unmatched fields {extra_fields}")
        if field_policy is UnmatchedField.EVOLVE:
            if evolve_fn is None:
                raise SchemaDriftError("EVOLVE policy requires evolve_fn")
            for c in extra_fields:
                evolve_fn("add_column", c, None, "string")
            table_columns = table_columns + [(c, "string") for c in extra_fields]
            table_names = [n for n, _ in table_columns]
            missing_cols = [n for n in table_names if n not in incoming]
        # IGNORE: simply not selected below

    if missing_cols:
        if column_policy is UnmatchedColumn.FAIL:
            raise SchemaDriftError(f"record lacks table columns {missing_cols}")
        if column_policy is UnmatchedColumn.WARN:
            log.warning("record lacks table columns %s — null-filling", missing_cols)

    sel = [F.col(n) if n in incoming else F.lit(None).cast(t).alias(n)
           for n, t in table_columns]
    keep = [c for c in ("op", "lsn") if c in changes.columns]
    return changes.select(*sel, *[F.col(c) for c in keep])
