"""HL7: parser model, query language (reference TestHL7Query parity),
RouteHL7 / ExtractHL7Attributes analogs."""

from __future__ import annotations

import os

import pytest

from nifi_spark.operators.hl7 import (HL7ParseError, HL7Query,
                                      HL7QueryError,
                                      extract_hl7_attributes, parse_hl7,
                                      route_hl7)

_REF = ("/root/reference/nifi-commons/nifi-hl7-query-language/"
        "src/test/resources")

_HYPO = (
    "MSH|^~\\&|XXXXXX||HealthOrg01||||ORU^R01|Q1111111111111111111|P|2.3|\r"
    "PID|||000000001||SMITH^JOHN||19700101|M||||||||||999999999999|"
    "123456789|\r"
    "PD1||||1234567890^LAST^FIRST^M^^^^^NPI|\r"
    "OBR|1|341856649^HNAM_ORDERID|000000000000000000|"
    "648088^Basic Metabolic Panel|||20150101000100|||||||||"
    "1620^Johnson^John^R||||||20150101000100|||M|||||||||||"
    "20150101000100|\r"
    "OBX|1|NM|GLU^Glucose Lvl|59|mg/dL|65-99^65^99|L|||F|||"
    "20150101000100|\r")


# ------------------------------------------------------------ parser

def test_parse_model():
    m = parse_hl7(_HYPO)
    assert [s.name for s in m.segments] == ["MSH", "PID", "PD1", "OBR",
                                            "OBX"]
    msh = m.segments[0]
    assert msh.fields[0].value == "|"          # MSH-1 = field separator
    assert msh.fields[1].value == "^~\\&"      # MSH-2, never split
    obx = m.get_segments("OBX")[0]
    assert obx.fields[0].value == "1"
    assert obx.fields[3].value == "59"
    assert obx.fields[5].components[2].value == "99"   # 65-99^65^99
    # empty field -> None value
    assert obx.fields[7].value is None


def test_parse_repetitions_and_subcomponents():
    m = parse_hl7("MSH|^~\\&|A\rPID|1|X~Y~Z|a&b^c|")
    pid = m.get_segments("PID")[0]
    reps = pid.fields[1]
    assert [r.value for r in reps] == ["X", "Y", "Z"]
    f3 = pid.fields[2]
    assert f3.value == "a&b^c"
    assert f3.components[0].components[1].value == "b"


def test_parse_errors():
    for bad in ("", "garbage", "PID|1|", "MSH_no_sep"):
        with pytest.raises(HL7ParseError):
            parse_hl7(bad)


# ------------------------------------- reference TestHL7Query parity

_PARITY = [
    ("SELECT MESSAGE", "hypo", True),
    ("SELECT PID.5", "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT result "
     "WHERE result.7 != 'N' AND result.1 = 1", "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.7 = 'L'",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.7 = 'H'",
     "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 < 600",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 < 59",
     "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.4 < result.6.2", "hypo", True),
    # reference-exact: NOT is identity (NotEvaluator.java:33-37)
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE NOT(result.4 > result.6.3)", "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 <= 59",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 <= 58",
     "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 >= 59",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 >= 580",
     "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 > 58",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.4 > 580",
     "hypo", False),
    ("DECLARE result1 AS REQUIRED OBX, result2 AS REQUIRED OBX "
     "SELECT MESSAGE WHERE result1.7 = 'L' OR result2.7 != 'H'",
     "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.7 = 'L' AND result.3.1 = 'GLU'", "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.7 = 'L' AND result.3.1 = 'GLU'", "hyper", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.7 = 'H' AND result.3.1 = 'GLU'", "hyper", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE (( ((result.7 = 'H')) AND ( ((result.3.1 = 'GLU')) )))",
     "hyper", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.999 IS NULL", "hypo", True),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.1 IS NULL",
     "hypo", False),
    ("SELECT MESSAGE WHERE ZZZ IS NULL", "hypo", True),
    ("SELECT MESSAGE WHERE OBX IS NULL", "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE "
     "WHERE result.999 NOT NULL", "hypo", False),
    ("DECLARE result AS REQUIRED OBX SELECT MESSAGE WHERE result.1 NOT NULL",
     "hypo", True),
    ("SELECT MESSAGE WHERE ZZZ NOT NULL", "hypo", False),
    ("SELECT MESSAGE WHERE OBX NOT NULL", "hypo", True),
]


@pytest.fixture(scope="module")
def messages():
    if os.path.isdir(_REF):
        hypo = open(os.path.join(_REF, "hypoglycemia")).read()
        hyper = open(os.path.join(_REF, "hyperglycemia")).read()
    else:
        hypo = _HYPO
        hyper = _HYPO.replace("|59|", "|125|").replace("|L|", "|H|")
    return {"hypo": parse_hl7(hypo), "hyper": parse_hl7(hyper)}


@pytest.mark.parametrize("query,which,want", _PARITY)
def test_reference_query_parity(messages, query, which, want):
    assert HL7Query.compile(query).evaluate(messages[which]).is_match \
        is want


def test_select_field_value_and_distinct_hits(messages):
    r = HL7Query.compile("SELECT PID.5").evaluate(messages["hypo"])
    assert r.labels == ["PID.5"]
    vals = r.hits[0]["PID.5"]
    assert [f.value for f in vals] == ["SMITH^JOHN"]
    # two aliases over the same single OBX: one DISTINCT hit
    r2 = HL7Query.compile(
        "DECLARE a AS REQUIRED OBX, b AS REQUIRED OBX SELECT MESSAGE "
        "WHERE a.7 = 'L' OR b.7 != 'H'").evaluate(messages["hypo"])
    assert r2.hit_count == 1


def test_optional_and_required_declarations(messages):
    m = messages["hypo"]
    assert not HL7Query.compile(
        "DECLARE z AS REQUIRED ZZZ SELECT MESSAGE").evaluate(m).is_match
    assert HL7Query.compile(
        "DECLARE z AS OPTIONAL ZZZ SELECT MESSAGE "
        "WHERE z IS NULL").evaluate(m).is_match


def test_select_alias_label(messages):
    r = HL7Query.compile("SELECT PID.5 AS name, MESSAGE").evaluate(
        messages["hypo"])
    assert r.labels == ["name", "MESSAGE"]


def test_query_errors():
    for bad in ("WHERE x = 1",                        # no SELECT
                "SELECT foo",                         # undeclared alias
                "DECLARE a AS MAYBE OBX SELECT a",    # bad qualifier
                "SELECT MESSAGE WHERE OBX.1 LIKE 'x'",   # lexer-only op
                "SELECT MESSAGE WHERE $bad"):
        with pytest.raises(HL7QueryError):
            HL7Query.compile(bad)


def test_repetition_any_match():
    m = parse_hl7("MSH|^~\\&|A\rPID|1|A~B~X|")
    q = HL7Query.compile("DECLARE p AS REQUIRED PID SELECT MESSAGE "
                         "WHERE p.2 = 'X'")
    assert q.evaluate(m).is_match
    q2 = HL7Query.compile("DECLARE p AS REQUIRED PID SELECT MESSAGE "
                          "WHERE p.2 = 'Q'")
    assert not q2.evaluate(m).is_match


# ------------------------------------------------------ spark analogs

def _mk_df(spark):
    good = _HYPO.replace("\r", "\n")
    rows = [(1, good),
            (2, good.replace("|59|", "|700|")),
            (3, "this is not HL7")]
    return spark.createDataFrame(rows, "id long, msg string")


def test_route_hl7(spark):
    df = _mk_df(spark)
    routed = route_hl7(df, "msg", {
        "low_glucose": ("DECLARE r AS REQUIRED OBX SELECT MESSAGE "
                        "WHERE r.4 < 100"),
        "any_obx": "SELECT MESSAGE WHERE OBX NOT NULL",
    })
    assert {r.id for r in routed["low_glucose"].collect()} == {1}
    assert {r.id for r in routed["any_obx"].collect()} == {1, 2}
    assert {r.id for r in routed["original"].collect()} == {1, 2}
    assert {r.id for r in routed["failure"].collect()} == {3}
    with pytest.raises(HL7QueryError, match="reserved"):
        route_hl7(df, "msg", {"original": "SELECT MESSAGE"})


def test_extract_hl7_attributes(spark):
    df = _mk_df(spark).filter("id = 1")
    out = extract_hl7_attributes(df, "msg", id_cols=["id"])
    attrs = {r.attr_name: r.attr_value for r in out.collect()}
    assert attrs["OBX.4"] == "59"
    assert attrs["OBX.3.1"] == "GLU"          # composite splits
    assert attrs["OBX.3.2"] == "Glucose Lvl"
    assert attrs["PID.5.1"] == "SMITH"
    assert attrs["MSH.9.1"] == "ORU"
    assert "OBX.8" not in attrs               # empty fields skipped
    bad = extract_hl7_attributes(
        spark.createDataFrame([(9, "junk")], "id long, msg string"),
        "msg", id_cols=["id"])
    assert bad.collect()[0].attr_name == "<parse_error>"


def test_extract_repeating_segment_keys(spark):
    two_obx = ("MSH|^~\\&|A\n"
               "OBX|1|NM|X|10|\n"
               "OBX|2|NM|Y|20|\n")
    df = spark.createDataFrame([(1, two_obx)], "id long, msg string")
    attrs = {r.attr_name: r.attr_value
             for r in extract_hl7_attributes(df, "msg",
                                             id_cols=["id"]).collect()}
    assert attrs["OBX_1.4"] == "10"
    assert attrs["OBX_2.4"] == "20"
    assert "OBX.4" not in attrs


_HL7_TEMPLATE = """<template><name>hl7flow</name><snippet>
<processors><id>p1</id><name>gen</name><type>a.GenerateFlowFile</type>
  <config><properties/></config></processors>
<processors><id>p2</id><name>route</name>
  <type>org.apache.nifi.processors.hl7.RouteHL7</type>
  <config><properties>
    <entry><key>Character Encoding</key><value>UTF-8</value></entry>
    <entry><key>lowGlu</key><value>DECLARE r AS REQUIRED OBX SELECT \
MESSAGE WHERE r.4 &lt; 100</value></entry>
  </properties></config></processors>
<processors><id>p3</id><name>extract</name>
  <type>org.apache.nifi.processors.hl7.ExtractHL7Attributes</type>
  <config><properties/></config></processors>
<connections><source><id>p1</id></source>
  <destination><id>p2</id></destination></connections>
<connections><source><id>p2</id></source>
  <destination><id>p3</id></destination>
  <selectedRelationships>lowGlu</selectedRelationships></connections>
</snippet></template>"""


def test_template_compiles_hl7_processors(spark):
    from nifi_spark.plans import load_template
    df = _mk_df(spark)
    flow = load_template(_HL7_TEMPLATE, sources={"gen": df},
                         content_col="msg")
    out = flow.run()
    assert {r.id for r in out["route.lowGlu"].collect()} == {1}
    assert {r.id for r in out["route.failure"].collect()} == {3}
    attrs = {r.attr_name: r.attr_value
             for r in out["extract.success"].collect()}
    assert attrs["OBX.4"] == "59"


def test_unescape_in_extract(spark):
    m = "MSH|^~\\&|A\nNTE|1|co\\F\\de|"
    df = spark.createDataFrame([(1, m)], "id long, msg string")
    attrs = {r.attr_name: r.attr_value
             for r in extract_hl7_attributes(df, "msg",
                                             id_cols=["id"]).collect()}
    assert attrs["NTE.2"] == "co|de"


# ------------------------------------------- TestExtractHL7Attributes
# The reference's use-segment-names test cases run VERBATIM
# (TestExtractHL7Attributes.java:88-279): same message, same
# (useSegmentNames, parseSegmentFields) matrix, same EXACT expected
# attribute maps (in named mode the reference's segment-count check
# degenerates to exact key-set equality, so these maps are complete).

_EXTRACT_MSG = (
    "MSH|^~\\&|XXXXXXXX||HealthProvider||||ORU^R01|Q1111111111111111111"
    "|P|2.3|\r\n"
    "PID|||12345^^^XYZ^MR||SMITH^JOHN||19700100|M||||||||||111111111111"
    "|123456789|\r\n"
    "PD1||||1234567890^LAST^FIRST^M^^^^^NPI|\r\n"
    "ORC|NW|987654321^EPC|123456789^EPC||||||20161003000000|||SMITH\r\n"
    "OBR|1|341856649^HNAM_ORDERID|000000000000000000|648088^Basic "
    "Metabolic Panel|||20150101000000|||||||||1620^Johnson^Corey^A||||||"
    "20150101000000|||F|||||||||||20150101000000|\r\n"
    "OBX|1|NM|GLU^Glucose Lvl|59|mg/dL|65-99^65^99|L|||F|||"
    "20150102000000|\r\n")

_ORU_GROUP_REPEATING = {"ORC", "OBR", "OBX"}

_EXPECTED_NAMES_ONLY = {
    "MSH.FieldSeparator": "|",
    "MSH.EncodingCharacters": "^~\\&",
    "MSH.SendingApplication": "XXXXXXXX",
    "MSH.ReceivingApplication": "HealthProvider",
    "MSH.MessageType": "ORU^R01",
    "MSH.MessageControlID": "Q1111111111111111111",
    "MSH.ProcessingID": "P",
    "MSH.VersionID": "2.3",
    "ORC_1.OrderControl": "NW",
    "ORC_1.PlacerOrderNumber": "987654321^EPC",
    "ORC_1.FillerOrderNumber": "123456789^EPC",
    "ORC_1.DateTimeOfTransaction": "20161003000000",
    "ORC_1.OrderingProvider": "SMITH",
    "OBR_1.SetIDObservationRequest": "1",
    "OBR_1.PlacerOrderNumber": "341856649^HNAM_ORDERID",
    "OBR_1.FillerOrderNumber": "000000000000000000",
    "OBR_1.UniversalServiceIdentifier": "648088^Basic Metabolic Panel",
    "OBR_1.ObservationDateTime": "20150101000000",
    "OBR_1.OrderingProvider": "1620^Johnson^Corey^A",
    "OBR_1.ResultsRptStatusChngDateTime": "20150101000000",
    "OBR_1.ResultStatus": "F",
    "OBR_1.ScheduledDateTime": "20150101000000",
    "OBX_1.SetIDOBX": "1",
    "OBX_1.ValueType": "NM",
    "OBX_1.ObservationIdentifier": "GLU^Glucose Lvl",
    "OBX_1.ObservationSubID": "59",
    "OBX_1.ObservationValue": "mg/dL",
    "OBX_1.Units": "65-99^65^99",
    "OBX_1.ReferencesRange": "L",
    "OBX_1.NatureOfAbnormalTest": "F",
    "OBX_1.UserDefinedAccessChecks": "20150102000000",
    "PD1.PatientPrimaryCareProviderNameIDNo":
        "1234567890^LAST^FIRST^M^^^^^NPI",
    "PID.PatientIDInternalID": "12345^^^XYZ^MR",
    "PID.PatientName": "SMITH^JOHN",
    "PID.DateOfBirth": "19700100",
    "PID.Sex": "M",
    "PID.PatientAccountNumber": "111111111111",
    "PID.SSNNumberPatient": "123456789",
}

_EXPECTED_NAMES_AND_FIELDS = {
    "MSH.FieldSeparator": "|",
    "MSH.EncodingCharacters": "^~\\&",
    "MSH.SendingApplication.HD.1": "XXXXXXXX",
    "MSH.ReceivingApplication.HD.1": "HealthProvider",
    "MSH.MessageType.CM.1": "ORU",
    "MSH.MessageType.CM.2": "R01",
    "MSH.MessageControlID": "Q1111111111111111111",
    "MSH.ProcessingID.PT.1": "P",
    "MSH.VersionID": "2.3",
    "ORC_1.OrderControl": "NW",
    "ORC_1.PlacerOrderNumber.EI.1": "987654321",
    "ORC_1.PlacerOrderNumber.EI.2": "EPC",
    "ORC_1.FillerOrderNumber.EI.1": "123456789",
    "ORC_1.FillerOrderNumber.EI.2": "EPC",
    "ORC_1.DateTimeOfTransaction": "20161003000000",
    "ORC_1.OrderingProvider.XCN.1": "SMITH",
    "OBR_1.SetIDObservationRequest": "1",
    "OBR_1.PlacerOrderNumber.EI.1": "341856649",
    "OBR_1.PlacerOrderNumber.EI.2": "HNAM_ORDERID",
    "OBR_1.FillerOrderNumber.EI.1": "000000000000000000",
    "OBR_1.UniversalServiceIdentifier.CE.1": "648088",
    "OBR_1.UniversalServiceIdentifier.CE.2": "Basic Metabolic Panel",
    "OBR_1.ObservationDateTime": "20150101000000",
    "OBR_1.OrderingProvider.XCN.1": "1620",
    "OBR_1.OrderingProvider.XCN.2": "Johnson",
    "OBR_1.OrderingProvider.XCN.3": "Corey",
    "OBR_1.OrderingProvider.XCN.4": "A",
    "OBR_1.ResultsRptStatusChngDateTime": "20150101000000",
    "OBR_1.ResultStatus": "F",
    "OBR_1.ScheduledDateTime": "20150101000000",
    "OBX_1.SetIDOBX": "1",
    "OBX_1.ValueType": "NM",
    "OBX_1.ObservationIdentifier.CE.1": "GLU",
    "OBX_1.ObservationIdentifier.CE.2": "Glucose Lvl",
    "OBX_1.ObservationSubID": "59",
    "OBX_1.ObservationValue": "mg/dL",
    "OBX_1.Units.CE.1": "65-99",
    "OBX_1.Units.CE.2": "65",
    "OBX_1.Units.CE.3": "99",
    "OBX_1.ReferencesRange": "L",
    "OBX_1.NatureOfAbnormalTest": "F",
    "OBX_1.UserDefinedAccessChecks": "20150102000000",
    "PD1.PatientPrimaryCareProviderNameIDNo.XCN.1": "1234567890",
    "PD1.PatientPrimaryCareProviderNameIDNo.XCN.2": "LAST",
    "PD1.PatientPrimaryCareProviderNameIDNo.XCN.3": "FIRST",
    "PD1.PatientPrimaryCareProviderNameIDNo.XCN.4": "M",
    "PD1.PatientPrimaryCareProviderNameIDNo.XCN.9": "NPI",
    "PID.PatientIDInternalID.CX.1": "12345",
    "PID.PatientIDInternalID.CX.4": "XYZ",
    "PID.PatientIDInternalID.CX.5": "MR",
    "PID.PatientName.XPN.1": "SMITH",
    "PID.PatientName.XPN.2": "JOHN",
    "PID.DateOfBirth": "19700100",
    "PID.Sex": "M",
    "PID.PatientAccountNumber.CX.1": "111111111111",
    "PID.SSNNumberPatient": "123456789",
}


def _extract_map(spark, use_names, parse):
    df = spark.createDataFrame([(1, _EXTRACT_MSG)],
                               "id long, msg string")
    out = extract_hl7_attributes(
        df, "msg", id_cols=["id"], parse_fields=parse,
        use_segment_names=use_names,
        group_repeating=_ORU_GROUP_REPEATING)
    return {r.attr_name: r.attr_value for r in out.collect()}


def test_extract_use_segment_names_reference_parity(spark):
    # testExtract (useSegmentNames=true, parseSegmentFields=false)
    assert _extract_map(spark, True, False) == _EXPECTED_NAMES_ONLY


def test_extract_segment_names_and_fields_reference_parity(spark):
    # testExtractWithSegmentNamesAndFields (true, true)
    assert (_extract_map(spark, True, True)
            == _EXPECTED_NAMES_AND_FIELDS)


_EXPECTED_NUMERIC = {
    "MSH.1": "|", "MSH.2": "^~\\&", "MSH.3": "XXXXXXXX",
    "MSH.5": "HealthProvider", "MSH.9": "ORU^R01",
    "MSH.10": "Q1111111111111111111", "MSH.11": "P", "MSH.12": "2.3",
    "ORC_1.1": "NW", "ORC_1.2": "987654321^EPC",
    "ORC_1.3": "123456789^EPC", "ORC_1.9": "20161003000000",
    "ORC_1.12": "SMITH",
    "OBR_1.1": "1", "OBR_1.2": "341856649^HNAM_ORDERID",
    "OBR_1.3": "000000000000000000",
    "OBR_1.4": "648088^Basic Metabolic Panel",
    "OBR_1.7": "20150101000000", "OBR_1.16": "1620^Johnson^Corey^A",
    "OBR_1.22": "20150101000000", "OBR_1.25": "F",
    "OBR_1.36": "20150101000000",
    "OBX_1.1": "1", "OBX_1.2": "NM", "OBX_1.3": "GLU^Glucose Lvl",
    "OBX_1.4": "59", "OBX_1.5": "mg/dL", "OBX_1.6": "65-99^65^99",
    "OBX_1.7": "L", "OBX_1.10": "F", "OBX_1.13": "20150102000000",
    "PD1.4": "1234567890^LAST^FIRST^M^^^^^NPI",
    "PID.3": "12345^^^XYZ^MR", "PID.5": "SMITH^JOHN",
    "PID.7": "19700100", "PID.8": "M", "PID.18": "111111111111",
    "PID.19": "123456789",
}


def test_extract_numeric_mode_reference_parity(spark):
    # testExtract default mode (useSegmentNames=false,
    # parseSegmentFields=false), group structure declared
    assert _extract_map(spark, False, False) == _EXPECTED_NUMERIC
