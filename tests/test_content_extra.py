"""ReplaceTextWithMapping, ValidateCsv, EvaluateJsonPath, SplitJson."""

from __future__ import annotations

from nifi_spark.operators import (evaluate_json_path,
                                  replace_text_with_mapping,
                                  split_json_array, validate_csv)


def test_replace_text_with_mapping(spark):
    df = spark.createDataFrame(
        [(1, "drop the table now"), (2, "merge table stats"), (3, "nothing")],
        "id long, text string")
    mapping = spark.createDataFrame(
        [("table", "TBL"), ("merge", "MRG")], "find string, replace string")
    out = {r.id: r.text
           for r in replace_text_with_mapping(df, "text", mapping).collect()}
    assert out[1] == "drop the TBL now"
    assert out[2] == "MRG TBL stats"
    assert out[3] == "nothing"


def test_validate_csv_routes(spark):
    df = spark.createDataFrame(
        [(1, "1,a,2.5"), (2, "2,b,oops"), (3, "3,,1.0"), (4, "junk")],
        "id long, line string")
    routed = validate_csv(df, "line", "k long, name string, v double")
    valid_ids = {r.id for r in routed["valid"].collect()}
    invalid_ids = {r.id for r in routed["invalid"].collect()}
    assert valid_ids == {1}
    assert invalid_ids == {2, 3, 4}


def test_evaluate_json_path(spark):
    df = spark.createDataFrame(
        [(1, '{"a": {"b": 7}, "c": "x"}'), (2, '{"c": "y"}')],
        "id long, doc string")
    out = evaluate_json_path(df, "doc", {"ab": "$.a.b", "c": "$.c"})
    rows = {r.id: (r.ab, r.c) for r in out.collect()}
    assert rows[1] == ("7", "x")
    assert rows[2] == (None, "y")


def test_split_json_array_fragment_contract(spark):
    df = spark.createDataFrame([(1, '[10, 20, 30]')], "id long, doc string")
    out = split_json_array(df, "doc", "int").collect()
    assert [(r.fragment_index, r.fragment) for r in out] == \
        [(0, 10), (1, 20), (2, 30)]
    assert all(r.fragment_count == 3 for r in out)


def test_evaluate_xpath(spark):
    from nifi_spark.operators.content import evaluate_xpath
    df = spark.createDataFrame(
        [(1, "<doc><name>alpha</name><v>3</v></doc>")], "id long, xml string")
    out = evaluate_xpath(df, "xml", {"name": "/doc/name/text()",
                                     "v": "/doc/v/text()"}).first()
    assert (out.name, out.v) == ("alpha", "3")


def test_parse_syslog_routes(spark):
    from nifi_spark.operators.content import parse_syslog
    df = spark.createDataFrame(
        [(1, "<34>Oct 11 22:14:15 host1 sshd[123]: Failed password"),
         (2, "Oct 11 22:14:15 host2 cron: job done"),
         (3, "not a syslog line at all")],
        "id long, line string")
    routed = parse_syslog(df, "line")
    valid = {r.id: r for r in routed["valid"].collect()}
    assert set(valid) == {1, 2}
    assert valid[1].syslog_priority == 34
    assert valid[1].syslog_hostname == "host1"
    assert valid[1].syslog_tag == "sshd"
    assert valid[1].syslog_pid == 123
    assert valid[1].syslog_message == "Failed password"
    assert valid[2].syslog_pid is None
    assert {r.id for r in routed["invalid"].collect()} == {3}
