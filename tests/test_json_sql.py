"""ConvertJSONToSQL — statement generation semantics + a full
round-trip: generated INSERT/UPDATE statements executed against DuckDB
must reproduce the SnapshotTableStore's own merge result."""

from __future__ import annotations

import json

import duckdb
import pytest

from nifi_spark.operators.json_sql import (convert_json_to_sql,
                                           generate_sql_for_record)

COLS = [("user_id", "bigint"), ("name", "string"), ("score", "double")]


def test_insert_field_order_and_typed_args():
    sql, attrs = generate_sql_for_record(
        {"name": "bo", "user_id": 7}, "users", COLS)
    assert sql == "INSERT INTO users (name, user_id) VALUES (?, ?)"
    assert attrs == {"sql.args.1.type": "12", "sql.args.1.value": "bo",
                     "sql.args.2.type": "-5", "sql.args.2.value": "7"}


def test_null_field_has_type_but_no_value():
    sql, attrs = generate_sql_for_record(
        {"user_id": 1, "score": None}, "users", COLS)
    assert sql == "INSERT INTO users (user_id, score) VALUES (?, ?)"
    assert "sql.args.2.type" in attrs
    assert "sql.args.2.value" not in attrs


def test_unmapped_field_ignored_or_fails():
    sql, _ = generate_sql_for_record(
        {"user_id": 1, "bogus": 9}, "users", COLS)
    assert sql == "INSERT INTO users (user_id) VALUES (?)"
    with pytest.raises(ValueError, match="Cannot map JSON field"):
        generate_sql_for_record({"user_id": 1, "bogus": 9}, "users",
                                COLS, ignore_unmapped_fields=False)


def test_no_mappable_fields_fails():
    with pytest.raises(ValueError, match="None of the fields"):
        generate_sql_for_record({"bogus": 9}, "users", COLS)


def test_translate_field_names_upper_strips_underscores():
    sql, _ = generate_sql_for_record({"USERID": 3}, "users", COLS)
    assert sql == "INSERT INTO users (user_id) VALUES (?)"
    with pytest.raises(ValueError):
        generate_sql_for_record({"USERID": 3}, "users", COLS,
                                translate_field_names=False)


def test_update_where_uses_normalized_name_quirk():
    sql, attrs = generate_sql_for_record(
        {"user_id": 7, "name": "x"}, "users", COLS,
        statement_type="UPDATE", update_keys=["user_id"])
    # reference quirk: WHERE appends the NORMALIZED spelling
    assert sql == "UPDATE users SET name = ? WHERE USERID = ?"
    assert attrs["sql.args.2.value"] == "7"


def test_update_without_keys_fails():
    with pytest.raises(ValueError, match="Primary Key"):
        generate_sql_for_record({"user_id": 1}, "users", COLS,
                                statement_type="UPDATE")


def test_quoted_identifiers_and_colsize_truncation():
    sql, attrs = generate_sql_for_record(
        {"name": "abcdefgh"}, "users", COLS,
        quoted_identifiers=True, column_sizes={"name": 3})
    assert sql == 'INSERT INTO users ("name") VALUES (?)'
    assert attrs["sql.args.1.value"] == "abc"


def test_dataframe_array_input_fans_out(spark):
    payload = json.dumps([{"user_id": 1, "name": "a"},
                          {"user_id": 2, "name": "b"}])
    df = spark.createDataFrame([(1, payload), (2, "{nope")],
                               "id int, js string")
    out = convert_json_to_sql(df, "js", "users", COLS,
                              id_cols=["id"]).collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], []).append(r)
    assert len(by[1]) == 2
    assert all(r["relationship"] == "sql" for r in by[1])
    assert {r["fragment_index"] for r in by[1]} == {0, 1}
    assert all(r["fragment_count"] == 2 for r in by[1])
    assert by[2][0]["relationship"] == "failure"


def test_roundtrip_generated_statements_reproduce_store_merge(spark):
    """The PutSQL story end-to-end: the same change set applied (a) via
    generated statements executed on DuckDB and (b) via
    SnapshotTableStore.merge must converge to the same table."""
    from nifi_spark.storage import SnapshotTableStore

    cols = [("repo", "string"), ("path", "string"), ("commit", "string"),
            ("lang", "string"), ("content", "string")]
    inserts = [{"repo": "r1", "path": f"f{i}.py", "commit": f"c{i}",
                "lang": "py", "content": f"body-{i}"} for i in range(8)]
    updates = [{"repo": "r1", "path": f"f{i}.py", "commit": f"c{i}b",
                "lang": "py", "content": f"body-{i}-v2"}
               for i in range(0, 8, 2)]

    con = duckdb.connect()
    con.sql("CREATE TABLE repos (repo VARCHAR, path VARCHAR, "
            "commit VARCHAR, lang VARCHAR, content VARCHAR)")
    for rec in inserts:
        sql, attrs = generate_sql_for_record(rec, "repos", cols)
        n = sum(1 for k in attrs if k.endswith(".type"))
        args = [attrs.get(f"sql.args.{i}.value") for i in range(1, n + 1)]
        con.execute(sql, args)
    for rec in updates:
        sql, attrs = generate_sql_for_record(
            rec, "repos", cols, statement_type="UPDATE",
            update_keys=["repo", "path"])
        n = sum(1 for k in attrs if k.endswith(".type"))
        args = [attrs.get(f"sql.args.{i}.value") for i in range(1, n + 1)]
        con.execute(sql.replace("REPO", "repo").replace("PATH", "path"),
                    args)
    via_sql = con.sql("SELECT * FROM repos ORDER BY path").df()

    store = SnapshotTableStore(str(spark.sparkContext._temp_dir)
                               + "/jsonsql_store", n_buckets=2)
    store.init()
    rows = [(r["repo"], r["path"], r["commit"], r["lang"], r["content"],
             "upsert", i + 1)
            for i, r in enumerate(inserts + updates)]
    chg = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, op string, lsn long")
    store.merge(spark, chg)
    via_store = (store.read(spark).toPandas()
                 .sort_values("path").reset_index(drop=True))
    assert via_sql[["repo", "path", "commit", "lang", "content"]] \
        .reset_index(drop=True).equals(
            via_store[["repo", "path", "commit", "lang", "content"]])


REF_JSON_DIR = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
                "nifi-standard-processors/src/test/resources/"
                "TestConvertJSONToSQL")


def test_reference_person_fixtures_golden_parity():
    """TestConvertJSONToSQL's person fixtures replayed verbatim: exact
    statement text + typed sql.args for insert (plain and quoted),
    update with key fallback, array fan-out, null-code typing, and the
    malformed fixture routing to failure."""
    import json as _json
    import os as _os
    import pytest as _pt
    if not _os.path.isdir(REF_JSON_DIR):
        _pt.skip("reference repo absent")
    from nifi_spark.operators.json_sql import generate_sql_for_record
    cols = [("ID", "integer"), ("NAME", "varchar"), ("CODE", "integer")]

    def load(name):
        return _json.loads(open(_os.path.join(REF_JSON_DIR, name),
                                "rb").read())

    p1 = load("person-1.json")
    sql, attrs = generate_sql_for_record(p1, "PERSONS", cols)
    assert sql == "INSERT INTO PERSONS (ID, NAME, CODE) VALUES (?, ?, ?)"
    assert attrs["sql.args.1.type"] == "4" and attrs["sql.args.1.value"] == "1"
    assert attrs["sql.args.2.type"] == "12" and attrs["sql.args.2.value"] == "Mark"
    assert attrs["sql.args.3.type"] == "4" and attrs["sql.args.3.value"] == "48"
    sql_q, _ = generate_sql_for_record(p1, "PERSONS", cols,
                                       quoted_identifiers=True)
    assert sql_q == ('INSERT INTO PERSONS ("ID", "NAME", "CODE") '
                     "VALUES (?, ?, ?)")
    sql_u, attrs_u = generate_sql_for_record(
        p1, "PERSONS", cols, statement_type="UPDATE",
        primary_keys=["ID"])
    assert sql_u == "UPDATE PERSONS SET NAME = ?, CODE = ? WHERE ID = ?"
    assert attrs_u["sql.args.1.value"] == "Mark"
    assert attrs_u["sql.args.3.value"] == "1"
    # null code: type present, value attribute absent
    pn = load("person-with-null-code.json")
    _, attrs_n = generate_sql_for_record(pn, "PERSONS", cols)
    assert attrs_n["sql.args.3.type"] == "4"
    assert "sql.args.3.value" not in attrs_n
    # extra field ignored by default, fails when asked
    pe = load("person-with-extra-field.json")
    sql_e, _ = generate_sql_for_record(pe, "PERSONS", cols)
    assert sql_e == "INSERT INTO PERSONS (ID, NAME, CODE) VALUES (?, ?, ?)"
    with _pt.raises(ValueError):
        generate_sql_for_record(pe, "PERSONS", cols,
                                ignore_unmapped_fields=False)
    # array fixture fans out record-per-element with the same statement
    persons = load("persons.json")
    assert isinstance(persons, list) and len(persons) > 1
    for rec in persons:
        s, _ = generate_sql_for_record(rec, "PERSONS", cols)
        assert s == "INSERT INTO PERSONS (ID, NAME, CODE) VALUES (?, ?, ?)"
    # the malformed fixture is not even JSON → failure route upstream
    with _pt.raises(ValueError):
        _json.loads(open(_os.path.join(
            REF_JSON_DIR, "malformed-person-extra-comma.json"),
            "rb").read())
