"""ConvertJSONToSQL — parametrized INSERT/UPDATE statement generation.

Reference: standard/ConvertJSONToSQL.java:397-615 (generateInsert /
generateUpdate) + :255-380 (onTrigger array handling, fragment
attributes, sql.table/sql.catalog). The reference turns each JSON
record into ONE statement string plus typed positional parameters in
``sql.args.N.type`` / ``sql.args.N.value`` attributes (values never
enter the SQL text — injection-safe), routing the result to 'sql' or
'failure'. Semantics reproduced here:

* field → column matching via ``normalizeColumnName`` (upper +
  strip '_' when translate_field_names, ConvertJSONToSQL.java:614-616)
* unmatched JSON field: ignore or fail (the UnmatchedField policy the
  drift module already models)
* unmatched/required table column: ignore / warn / fail
  (UnmatchedColumn)
* UPDATE: SET = non-key fields, WHERE = update keys (falling back to
  the table's primary keys); the reference appends the NORMALIZED
  column name in the WHERE clause (not the table spelling) — mirrored,
  quirk and all (ConvertJSONToSQL.java:592-599)
* present-but-null JSON field: column included, ``.type`` attribute
  set, ``.value`` attribute absent (reference :449-456) — JSON-absent
  and JSON-null are DIFFERENT, which is why this operator parses the
  raw JSON tree (schemaless Arrow-batched map, the Jolt seam) instead
  of ``from_json``
* value truncation to the column size; quoted identifiers option
* a JSON ARRAY input yields one output row per element with the
  reference's ``fragment.index`` / ``fragment.count`` attributes

Statement text is deterministic for a given record (field order =
JSON object order), so gate rows replay the full SQL string in DuckDB.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

# java.sql.Types constants for the sql.args.N.type attribute
JDBC_TYPES = {
    "string": 12, "varchar": 12,        # VARCHAR
    "bigint": -5, "long": -5,           # BIGINT
    "int": 4, "integer": 4,             # INTEGER
    "smallint": 5, "short": 5,
    "tinyint": -6, "byte": -6,
    "double": 8,                        # DOUBLE
    "float": 6,                         # FLOAT
    "boolean": 16,                      # BOOLEAN
    "timestamp": 93, "date": 91,
    "decimal": 3, "numeric": 2,
    "binary": -3,                       # VARBINARY
}


def normalize_column_name(name: str, translate: bool) -> str:
    """ConvertJSONToSQL.java:614-616."""
    return name.upper().replace("_", "") if translate else name


def _scalar_text(v) -> str:
    """JsonNode.asText() for scalars: JSON booleans print lowercase,
    numbers in their JSON form."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def generate_sql_for_record(
        record: dict, table_name: str,
        columns: list[tuple[str, str]], *,
        statement_type: str = "INSERT",
        update_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        translate_field_names: bool = True,
        ignore_unmapped_fields: bool = True,
        fail_unmapped_columns: bool = False,
        warn_unmapped_columns: bool = False,
        quoted_identifiers: bool = False,
        quote: str = '"',
        column_sizes: dict[str, int] | None = None,
        required: list[str] | None = None) -> tuple[str, dict[str, str]]:
    """One record → (statement text, attributes). Raises ValueError on
    every reference ProcessException path (caller routes to failure)."""
    sizes = column_sizes or {}
    # normalized name -> (table spelling, dtype)
    cols = {normalize_column_name(n, translate_field_names): (n, t)
            for n, t in columns}
    norm_fields = {normalize_column_name(f, translate_field_names)
                   for f in record}

    def quoted(name: str) -> str:
        return f"{quote}{name}{quote}" if quoted_identifiers else name

    def arg(attrs: dict, n: int, dtype: str, table_col: str, value) -> None:
        attrs[f"sql.args.{n}.type"] = str(JDBC_TYPES.get(dtype.lower(), 12))
        if value is not None:
            text = _scalar_text(value)
            size = sizes.get(table_col)
            if size is not None and len(text) > size:
                text = text[:size]
            attrs[f"sql.args.{n}.value"] = text

    attrs: dict[str, str] = {}
    if statement_type.upper() == "INSERT":
        for req in (required or []):
            if normalize_column_name(req, translate_field_names) \
                    not in norm_fields:
                msg = (f"JSON does not have a value for the Required "
                       f"column '{req}'")
                if fail_unmapped_columns:
                    raise ValueError(msg)
        names, n = [], 0
        for field, value in record.items():
            norm = normalize_column_name(field, translate_field_names)
            if norm not in cols:
                if not ignore_unmapped_fields:
                    raise ValueError(f"Cannot map JSON field '{field}' "
                                     f"to any column in the database")
                continue
            table_col, dtype = cols[norm]
            n += 1
            names.append(quoted(table_col))
            arg(attrs, n, dtype, table_col, value)
        if n == 0:
            raise ValueError(f"None of the fields in the JSON map to the "
                             f"columns defined by the {table_name} table")
        sql = (f"INSERT INTO {table_name} ({', '.join(names)}) "
               f"VALUES ({', '.join('?' * n)})")
        return sql, attrs

    if statement_type.upper() != "UPDATE":
        raise ValueError(f"unknown statement type {statement_type!r}")

    keys = update_keys if update_keys is not None else (primary_keys or [])
    if not keys:
        raise ValueError(f"Table '{table_name}' does not have a Primary "
                         f"Key and no Update Keys were specified")
    norm_keys = {normalize_column_name(k.strip(), translate_field_names)
                 for k in keys}
    for k in keys:
        if normalize_column_name(k.strip(), translate_field_names) \
                not in norm_fields:
            msg = f"JSON does not have a value for the Key column '{k}'"
            if fail_unmapped_columns:
                raise ValueError(msg)
    sets, n = [], 0
    for field, value in record.items():
        norm = normalize_column_name(field, translate_field_names)
        if norm not in cols:
            if not ignore_unmapped_fields:
                raise ValueError(f"Cannot map JSON field '{field}' "
                                 f"to any column in the database")
            continue
        if norm in norm_keys:
            continue
        table_col, dtype = cols[norm]
        n += 1
        sets.append(f"{quoted(table_col)} = ?")
        arg(attrs, n, dtype, table_col, value)
    wheres = []
    for field, value in record.items():
        norm = normalize_column_name(field, translate_field_names)
        if norm not in cols or norm not in norm_keys:
            continue
        table_col, dtype = cols[norm]
        n += 1
        # the reference appends the NORMALIZED name here, not the table
        # spelling (ConvertJSONToSQL.java:592-599)
        wheres.append(f"{quoted(norm)} = ?")
        arg(attrs, n, dtype, table_col, value)
    sql = (f"UPDATE {table_name} SET {', '.join(sets)} "
           f"WHERE {' AND '.join(wheres)}")
    return sql, attrs


def convert_json_to_sql(df: DataFrame, json_col: str, table_name: str,
                        columns: list[tuple[str, str]],
                        id_cols: list[str] | None = None,
                        **opts) -> DataFrame:
    """DataFrame form: `json_col` holds one JSON object or array per
    row. Output: id columns + relationship ('sql' / 'failure') +
    sql / sql_table / fragment_index / fragment_count + sql_attrs map
    (the reference's flowfile attributes). Array inputs fan out one
    row per element, exactly like the reference's per-element
    fragments (ConvertJSONToSQL.java:330-380)."""
    import pandas as pd

    id_cols = id_cols or []
    sel = df.select(*id_cols, json_col)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in sel.schema.fields[:-1])
    if out_schema:
        out_schema += ", "
    out_schema += ("relationship string, sql string, sql_table string, "
                   "fragment_index int, fragment_count int, "
                   "sql_attrs map<string,string>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                *ids, raw = tup
                try:
                    parsed = json.loads(raw)
                except Exception:  # noqa: BLE001 — malformed → failure
                    rows.append((*ids, "failure", None, table_name,
                                 None, None, None))
                    continue
                elems = parsed if isinstance(parsed, list) else [parsed]
                total = len(elems)
                for i, rec in enumerate(elems):
                    if not isinstance(rec, dict):
                        rows.append((*ids, "failure", None, table_name,
                                     i, total, None))
                        continue
                    try:
                        sql, attrs = generate_sql_for_record(
                            rec, table_name, columns, **opts)
                        rows.append((*ids, "sql", sql, table_name,
                                     i, total, attrs))
                    except ValueError:
                        rows.append((*ids, "failure", None, table_name,
                                     i, total, None))
            yield pd.DataFrame(rows, columns=[
                *pdf.columns[:-1], "relationship", "sql", "sql_table",
                "fragment_index", "fragment_count", "sql_attrs"])

    return sel.mapInPandas(run, schema=out_schema)
