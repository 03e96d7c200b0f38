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


# ---------------- Jolt full-spec transforms ----------------

def test_jolt_apply_shift_wildcards_and_refs():
    """Classic Jolt shiftr doc example: literal match wins over `*`,
    `&1` back-references the matched key one level up."""
    import json

    from nifi_spark.operators import jolt_apply
    doc = json.dumps({"rating": {"primary": {"value": 3},
                                 "quality": {"value": 5}}})
    chain = [{"operation": "shift",
              "spec": {"rating": {
                  "primary": {"value": "Rating"},
                  "*": {"value": "SecondaryRatings.&1.Value"}}}}]
    assert json.loads(jolt_apply(doc, chain)) == {
        "Rating": 3, "SecondaryRatings": {"quality": {"Value": 5}}}


def test_jolt_apply_full_chain():
    """All five operations chained: shift → cardinality → default →
    remove → sort, plus []-append, auto-list promotion and MANY."""
    import json

    from nifi_spark.operators import jolt_apply
    doc = json.dumps({"meta": {"debug": "x", "kind": "click"},
                      "vals": [42], "id": 7})
    chain = [
        {"operation": "shift",
         "spec": {"meta": {"kind": "etype", "debug": "dbg"},
                  "vals": "vals", "id": "eid"}},
        {"operation": "cardinality", "spec": {"vals": "ONE"}},
        {"operation": "default", "spec": {"src": "nifi",
                                          "etype": "unknown"}},
        {"operation": "remove", "spec": {"dbg": ""}},
        {"operation": "sort"},
    ]
    out = jolt_apply(doc, chain)
    assert out == '{"eid":7,"etype":"click","src":"nifi","vals":42}'
    # []-append gathers values; MANY wraps scalars back into lists
    doc2 = json.dumps({"a": 1, "b": 2})
    got = json.loads(jolt_apply(doc2, [
        {"operation": "shift", "spec": {"*": "nums[]"}},
        {"operation": "cardinality", "spec": {"nums": "ONE"}},
        {"operation": "cardinality", "spec": {"nums": "MANY"}}]))
    assert got == {"nums": [1]}
    # nested remove with wildcard
    doc3 = json.dumps({"a": {"x": 1, "y": 2}, "b": {"x": 3}})
    got3 = json.loads(jolt_apply(doc3, [
        {"operation": "remove", "spec": {"*": {"x": ""}}}]))
    assert got3 == {"a": {"y": 2}, "b": {}}


def test_jolt_transform_column(spark):
    """The Spark operator: valid docs transform, junk rows yield NULL
    (the failure route)."""
    from nifi_spark.operators import jolt_transform
    df = spark.createDataFrame(
        [(1, '{"old": 5}'), (2, "not json")], "id long, content string")
    chain = [{"operation": "shift", "spec": {"old": "new"}},
             {"operation": "default", "spec": {"v": 1}},
             {"operation": "sort"}]
    got = {r.id: r.content
           for r in jolt_transform(df, "content", chain).collect()}
    assert got[1] == '{"new":5,"v":1}'
    assert got[2] is None


import json as _json
import os as _os

import pytest as _pytest

_JOLT_GOLDEN = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
                "nifi-standard-processors/src/test/resources/"
                "TestJoltTransformJson")


@_pytest.mark.skipif(not _os.path.isdir(_JOLT_GOLDEN),
                     reason="reference checkout not present")
@_pytest.mark.parametrize("name,specf,outf,op", [
    ("chainr", "chainrSpec.json", "chainrOutput.json", None),
    ("shiftr", "shiftrSpec.json", "shiftrOutput.json", "shift"),
    ("defaultr", "defaultrSpec.json", "defaultrOutput.json", "default"),
    ("removr", "removrSpec.json", "removrOutput.json", "remove"),
    ("cardr", "cardrSpec.json", "cardrOutput.json", "cardinality"),
    ("sortr", None, "sortrOutput.json", "sort"),
])
def test_jolt_reference_golden_files(name, specf, outf, op):
    """The engine must reproduce the reference's OWN JoltTransformJSON
    golden files byte-semantically (TestJoltTransformJson resources) —
    including the chainr spec's '$' key-as-value operator."""
    from nifi_spark.operators.jolt import jolt_apply
    inp = open(_os.path.join(_JOLT_GOLDEN, "input.json")).read()
    expected = _json.load(open(_os.path.join(_JOLT_GOLDEN, outf)))
    if op is None:
        chain = _json.load(open(_os.path.join(_JOLT_GOLDEN, specf)))
    else:
        spec = _json.load(open(_os.path.join(_JOLT_GOLDEN, specf))) \
            if specf else None
        chain = [{"operation": op, "spec": spec}]
    got = jolt_apply(inp, chain)
    assert got is not None and _json.loads(got) == expected


_REF_MAP = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
            "nifi-standard-processors/src/test/resources/"
            "TestReplaceTextWithMapping")


@_pytest.mark.skipif(not _os.path.isdir(_REF_MAP),
                     reason="reference checkout not present")
def test_replace_with_mapping_reference_golden(spark):
    """ReplaceTextWithMapping against the reference's own mapping file
    and input, matching TestReplaceTextWithMapping.testSimple's expected
    output exactly (whitespace-boundary mode)."""
    from nifi_spark.operators import replace_text_with_mapping
    mapping_rows = []
    for line in open(_os.path.join(_REF_MAP,
                                   "color-fruit-mapping.txt")):
        parts = line.split()
        if len(parts) == 2:
            mapping_rows.append(tuple(parts))
    mapping = spark.createDataFrame(mapping_rows, "find string, replace string")
    content = open(_os.path.join(_REF_MAP,
                                 "colors-without-dashes.txt")).read()
    df = spark.createDataFrame([(1, content)], "id long, content string")
    out = replace_text_with_mapping(df, "content", mapping,
                                    sep="whitespace").first().content
    assert out == ("roses are apple\n"
                   "violets are blueberry\n"
                   "something else is grape\n"
                   "I'm not good at writing poems")


# ---------------------------------------------------- ReplaceText goldens

_RT_DIR = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
           "nifi-standard-processors/src/test/resources/"
           "TestReplaceTextLineByLine")

# (search, replacement, mode, expected golden file) — extracted verbatim
# from the reference's TestReplaceText.java line-by-line tests; every
# NiFi back-reference quirk is here: invalid index escaping ($1$2 with
# one group -> literal $2), non-digit $ quoting ($d -> whole replacement
# literal), \$ escaping, literal-strategy $ passthrough.
_RT_CASES = [
    ("odo", "ood", "regex", "food.txt"),
    (None, "TEST ", "prepend", "PrependLineByLineTest.txt"),
    (None, " TEST", "append", "AppendLineByLineTest.txt"),
    ("odo", "ood", "literal", "food.txt"),
    ("jo", "[$1]", "literal", "cu[$1]_Po[$1].txt"),
    ("(DODO)", "[$1]", "regex", "[DODO].txt"),
    ("(lu)", "$1$2", "regex", "Blu$2e_clu$2e.txt"),
    ("(ew)", "$d", "regex", "D$d_h$d.txt"),
    ("(DO)", "\\$1", "regex", "$1$1.txt"),
    ("(jo)", "", "regex", "cu_Po.txt"),
    ("Z", "Morning", "regex", "testFile.txt"),
    ("l", "R", "regex", "BRue_cRue_RiRey.txt"),
]


@_pytest.mark.skipif(not _os.path.isdir(_RT_DIR),
                     reason="reference checkout not present")
@_pytest.mark.parametrize("search,repl,mode,golden", _RT_CASES,
                          ids=[c[3] for c in _RT_CASES])
def test_replace_text_reference_goldens(spark, search, repl, mode, golden):
    """replace_text_line_by_line reproduces the reference's OWN golden
    outputs byte-for-byte over its testFile.txt, including the
    back-reference normalization quirks (ReplaceText.java:275-305,634)."""
    from nifi_spark.operators.content import replace_text_line_by_line
    with open(f"{_RT_DIR}/testFile.txt") as f:
        src = f.read()
    with open(f"{_RT_DIR}/{golden}") as f:
        expected = f.read()
    df = spark.createDataFrame([(src,)], "content string")
    out = replace_text_line_by_line(df, "content", search or "",
                                    repl, mode=mode)
    assert out.collect()[0]["content"] == expected, golden


def test_nifi_replacement_normalization():
    from nifi_spark.operators.content import nifi_replacement
    assert nifi_replacement("(a)", "[$1]") == "[$1]"
    assert nifi_replacement("(a)", "$1$2") == "$1\\$2"      # invalid escaped
    assert nifi_replacement("(a)", "$d") == "\\$d"          # whole-quote
    assert nifi_replacement("(a)", "\\$1") == "\\$1"        # already literal
    assert nifi_replacement("(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)(l)",
                            "$123") == "$123"               # 12 groups: $12+3
    # 123 truncates /10 -> 12 -> 1 which IS a valid group: left untouched
    # (Java's Matcher then greedily parses it as $1 + literal "23")
    assert nifi_replacement("(a)", "$123") == "$123"


# ------------------------------------------------------ SplitText goldens

_ST_DIR = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
           "nifi-standard-processors/src/test/resources/TestSplitText")


def _split_doc(spark, text, **kw):
    from nifi_spark.operators.content import split_text_grouped
    df = spark.createDataFrame([(1, text)], "id long, content string")
    rows = split_text_grouped(df, "content", **kw).collect()
    return sorted(rows, key=lambda r: (r["fragment_index"] or 0))


@_pytest.mark.skipif(not _os.path.isdir(_ST_DIR),
                     reason="reference checkout not present")
def test_split_text_reference_goldens(spark):
    """split_text_grouped reproduces the reference's OWN golden fragments
    (TestSplitText: original.txt -> 1-4.txt at split 3, 5-6.txt at
    split 5, header 2 lines, trailing newlines removed)."""
    with open(f"{_ST_DIR}/original.txt") as f:
        src = f.read()
    rows = _split_doc(spark, src, line_split_count=3, header_line_count=2)
    assert len(rows) == 4
    for i, r in enumerate(rows, start=1):
        with open(f"{_ST_DIR}/{i}.txt") as f:
            assert r["fragment"] == f.read(), i
        assert r["fragment_index"] == i and r["fragment_count"] == 4
    rows = _split_doc(spark, src, line_split_count=5, header_line_count=2)
    assert len(rows) == 2
    for i, r in enumerate(rows, start=5):
        with open(f"{_ST_DIR}/{i}.txt") as f:
            assert r["fragment"] == f.read(), i


@_pytest.mark.skipif(not _os.path.isdir(_ST_DIR),
                     reason="reference checkout not present")
def test_split_text_reference_attribute_cases(spark):
    """The reference's attribute assertions, case for case."""
    with open(f"{_ST_DIR}/original.txt") as f:
        src = f.read()
    # testSingleCharacterHeaderMarker: marker H, split 7, keep newlines
    rows = _split_doc(spark, src, line_split_count=7, header_marker="H",
                      remove_trailing_newlines=False)
    assert [(r["split_line_count"], r["fragment_size"]) for r in rows] \
        == [(7, 86), (3, 54)]
    # testMultipleHeaderIndicators: count=1 beats marker; split 5
    rows = _split_doc(spark, src, line_split_count=5, header_line_count=1,
                      header_marker="Head", remove_trailing_newlines=False)
    assert [(r["split_line_count"], r["fragment_size"]) for r in rows] \
        == [(5, 62), (5, 55), (1, 23)]
    # testMaxSizeExceeded: size-only budget includes the header each chunk
    rows = _split_doc(spark, src, line_split_count=0, header_line_count=2,
                      max_fragment_size=71, remove_trailing_newlines=False)
    assert [(r["split_line_count"], r["fragment_size"]) for r in rows] \
        == [(5, 70), (5, 70)]


def test_split_text_multiple_directives(spark):
    # testMultipleSplitDirectives: an oversize line ships alone mid-stream
    src = ("Header Line #1\nHeader Line #2\nLine #1\nLine #2\n"
           "Line #3 This line has additional text added so that it exceeds "
           "the maximum fragment size\n"
           "Line #4\nLine #5\nLine #6\nLine #7\nLine #8\nLine #9\nLine #10\n")
    rows = _split_doc(spark, src, line_split_count=2, header_line_count=2,
                      max_fragment_size=50, remove_trailing_newlines=False)
    assert [r["fragment_size"] for r in rows] == [46, 119, 46, 46, 46, 39]


def test_split_text_failure_and_header_only(spark):
    # insufficient header -> failure relationship
    rows = _split_doc(spark, "only one line", line_split_count=2,
                      header_line_count=2)
    assert len(rows) == 1 and rows[0]["relationship"] == "failure"
    # header-only flowfile -> single fragment, trailing newline trimmed
    rows = _split_doc(spark, "Header Line #1\nHeaderLine#2\n",
                      line_split_count=2, header_marker="Head",
                      max_fragment_size=50)
    assert len(rows) == 1
    assert rows[0]["fragment"] == "Header Line #1\nHeaderLine#2"
    assert rows[0]["fragment_count"] == 0 and rows[0]["split_line_count"] == 0


def test_split_text_blank_chunk_semantics(spark):
    # the reference's testSplitWithOnlyCarriageReturn /
    # testSplitWithCarriageReturnAndNewLines, inputs verbatim: blank
    # chunks emit header-only fragments; with no header they are dropped
    # but still counted in fragment_count (reference quirk)
    for nl in ("\r", "\r\n"):
        src = nl.join(["H1", "H2", "1", "2", "3",
                       "", "", "", "", "", "", "10", "11", "12"]) + nl
        rows = _split_doc(spark, src, line_split_count=3,
                          header_line_count=2)
        assert [r["fragment"] for r in rows] == [
            f"H1{nl}H2{nl}1{nl}2{nl}3", "H1" + nl + "H2", "H1" + nl + "H2",
            f"H1{nl}H2{nl}10{nl}11{nl}12"], nl
        src2 = nl.join(["1", "2", "3", "", "", "", "", "", "",
                        "10", "11", "12"]) + nl
        rows = _split_doc(spark, src2, line_split_count=3)
        assert [r["fragment"] for r in rows] == [
            f"1{nl}2{nl}3", f"10{nl}11{nl}12"], nl
        assert all(r["fragment_count"] == 4 for r in rows)
        assert [r["fragment_index"] for r in rows] == [1, 2]


def test_merge_concat_reference_delimiters(spark):
    """MergeContent CONCAT with the reference's own head/demarcate/foot
    delimiter files: 'Hello', ', ', 'World!' must merge to
    '(|)Hello***, ***World!___' (TestMergeContent.java
    testSimpleBinaryConcatWithFileDelimiters)."""
    from nifi_spark.operators.content import merge_concat
    base = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
            "nifi-standard-processors/src/test/resources/TestMergeContent")
    if _os.path.isdir(base):
        head = open(f"{base}/head").read()
        dem = open(f"{base}/demarcate").read()
        foot = open(f"{base}/foot").read()
    else:
        head, dem, foot = "(|)", "***", "___"
    df = spark.createDataFrame(
        [(1, 0, "Hello"), (1, 1, ", "), (1, 2, "World!"),
         (2, 0, "solo")],
        "gid long, idx long, part string")
    rows = {r["gid"]: r for r in
            merge_concat(df, "part", "gid", "idx",
                         header=head, demarcator=dem, footer=foot).collect()}
    assert rows[1]["content"] == "(|)Hello***, ***World!___"
    assert rows[1]["merge_count"] == 3
    assert rows[2]["content"] == "(|)solo___"
    # header-only variant from testSimpleBinaryConcatWithTextDelimiters
    rows = {r["gid"]: r for r in
            merge_concat(df.where("gid = 1"), "part", "gid", "idx",
                         header="@").collect()}
    assert rows[1]["content"] == "@Hello, World!"


# -------------------------------------------------- ValidateCsv DSL

def _vcsv(spark, lines, schema, order=True):
    from nifi_spark.operators import validate_csv_cells
    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "rid long, line string")
    out = validate_csv_cells(df, "line", schema,
                             order_col="rid" if order else None)
    v = [r["rid"] for r in out["valid"].collect()]
    iv = [r["rid"] for r in out["invalid"].collect()]
    return sorted(v), sorted(iv)


def test_validate_csv_cells_reference_cases(spark):
    """TestValidateCsv.java cases replayed verbatim over the Super CSV
    cell-processor DSL."""
    # testValidDateOptionalDouble / invalid variants
    sch = 'Null, ParseDate("dd/MM/yyyy"), Optional(ParseDouble())'
    v, iv = _vcsv(spark, ["John,22/11/1954,63.2", "Bob,01/03/2004,45.0"],
                  sch)
    assert (v, iv) == ([0, 1], [])
    v, iv = _vcsv(spark, ["John,22/11/1954,63a2", "Bob,01/032004,45.0"],
                  sch)
    assert (v, iv) == ([], [0, 1])
    v, iv = _vcsv(spark, ["John,22/111954,63.2", "Bob,01/03/2004,45.0"],
                  sch)
    assert (v, iv) == ([1], [0])
    # testIsIncludedIn
    sch = 'Null, ParseDate("dd/MM/yyyy"), IsIncludedIn("male", "female")'
    v, iv = _vcsv(spark, ["John,22/11/1954,male", "Marie,01/03/2004,female"],
                  sch)
    assert (v, iv) == ([0, 1], [])
    v, iv = _vcsv(spark, ["John,22/111954,63.2"], sch)
    assert (v, iv) == ([], [0])
    # testBigDecimalBoolCharIntLong (header line dropped by caller)
    sch = "ParseBigDecimal(), ParseBool(), ParseChar(), ParseInt(), ParseLong()"
    v, iv = _vcsv(spark, ["10.0001,true,c,1,92147483647"], sch)
    assert (v, iv) == ([0], [])
    v, iv = _vcsv(spark, ["10.0001,true,c,92147483647,92147483647"], sch)
    assert (v, iv) == ([], [0])      # 92147483647 overflows int
    # testEqualsNotNullStrNotNullOrEmpty
    sch = "Equals(), NotNull(), StrNotNullOrEmpty()"
    v, iv = _vcsv(spark, ["test,test,test", "test,test,test"], sch)
    assert (v, iv) == ([0, 1], [])
    v, iv = _vcsv(spark, ["test,test,test", "tset,test,test"], sch)
    assert (v, iv) == ([0], [1])
    # testStrlenStrMinMaxStrRegex
    sch = 'Strlen(4), StrMinMax(3,5), StrRegex("[a-z0-9\\._]+@[a-z0-9\\.]+")'
    v, iv = _vcsv(spark, ["test,test,test@apache.org"], sch)
    assert (v, iv) == ([0], [])
    v, iv = _vcsv(spark, ["test,test,testapache.org"], sch)
    assert (v, iv) == ([], [0])
    # testDMinMaxLMinMaxForbidSubStr
    sch = 'DMinMax(10,100),LMinMax(10,100),ForbidSubStr("test", "tset")'
    v, iv = _vcsv(spark, ["50.001,50,hello"], sch)
    assert (v, iv) == ([0], [])
    v, iv = _vcsv(spark, ["10,10,testapache.org"], sch)
    assert (v, iv) == ([], [0])
    # testUnique — first occurrence wins
    sch = "Unique(), UniqueHashCode()"
    v, iv = _vcsv(spark, ["1,2", "3,4"], sch)
    assert (v, iv) == ([0, 1], [])
    v, iv = _vcsv(spark, ["1,2", "1,4"], sch)
    assert (v, iv) == ([0], [1])
    # testRequire — java hashCode of 'test'
    hc = 3556498  # "test".hashCode()
    sch = f'RequireHashCode({hc}), RequireSubStr("test")'
    v, iv = _vcsv(spark, ["test,test"], sch)
    assert (v, iv) == ([0], [])
    v, iv = _vcsv(spark, ["tset,tset"], sch)
    assert (v, iv) == ([], [0])
    # quoted empty + truly empty cells both null under Null processors
    v, iv = _vcsv(spark, ['John,"",63.2', "Bob,,45.0"], "Null, Null, Null")
    assert (v, iv) == ([0, 1], [])
    # field-count mismatch routes invalid
    v, iv = _vcsv(spark, ["a,b", "a,b,c"], "Null, Null, Null")
    assert (v, iv) == ([1], [0])


def test_validate_csv_stateful_eligibility(spark):
    """Super CSV aborts a row at its first failing cell, so a row
    failing an earlier processor must NOT register in Unique state or
    anchor Equals (the r4 ADVICE divergence)."""
    # row 0 fails ParseLong, so its Unique key 'k' never registers;
    # row 1 is the first ELIGIBLE occurrence of 'k' → valid
    sch = "ParseLong(), Unique()"
    v, iv = _vcsv(spark, ["x,k", "1,k", "2,k"], sch)
    assert (v, iv) == ([1], [0, 2])
    # row 0 fails ParseLong → never anchors Equals; anchor = row 1's 'b'
    sch = "ParseLong(), Equals()"
    v, iv = _vcsv(spark, ["x,a", "1,b", "2,b", "3,a"], sch)
    assert (v, iv) == ([1, 2], [0, 3])
    # all rows fail the stateless prefix: Equals anchor is empty, every
    # row still routes invalid (left join keeps them)
    v, iv = _vcsv(spark, ["x,a", "y,b"], sch)
    assert (v, iv) == ([], [0, 1])
    # field-count mismatch aborts before cell state too
    sch = "Null, Unique()"
    v, iv = _vcsv(spark, ["a,k,extra", "b,k"], sch)
    assert (v, iv) == ([1], [0])


def test_java_hashcode_surrogate_pairs(spark):
    """RequireHashCode folds UTF-16 code units like Java: a
    supplementary-plane char expands to its surrogate pair."""
    s = "a\U0001F600b"                       # a + emoji + b
    import struct as _struct
    enc = s.encode("utf-16-be")
    h = 0
    for (u,) in _struct.iter_unpack(">H", enc):
        h = (h * 31 + u) & 0xFFFFFFFF
    if h >= 2**31:
        h -= 2**32
    v, iv = _vcsv(spark, [s], f"RequireHashCode({h})")
    assert (v, iv) == ([0], [])
    v, iv = _vcsv(spark, [s], "RequireHashCode(12345)")
    assert (v, iv) == ([], [0])


def test_validate_csv_cells_errors(spark):
    from nifi_spark.operators import validate_csv_cells
    import pytest as _pt
    df = spark.createDataFrame([(1, "a")], "rid long, line string")
    with _pt.raises(ValueError, match="not an allowed method"):
        validate_csv_cells(df, "line", "Bogus()")
    with _pt.raises(ValueError, match="order_col"):
        validate_csv_cells(df, "line", "Unique()")


REF_MIME_DIR = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
                "nifi-standard-processors/src/test/resources/"
                "TestIdentifyMimeType")


def test_identify_mime_reference_matrix(spark):
    """TestIdentifyMimeType's full 17-file matrix (mime type AND
    extension), replayed verbatim over the reference's own fixtures."""
    import os as _os
    import pytest as _pt
    if not _os.path.isdir(REF_MIME_DIR):
        _pt.skip("reference repo absent")
    from nifi_spark.operators import identify_mime_type
    expected = {
        "1.7z": ("application/x-7z-compressed", ".7z"),
        "1.mdb": ("application/x-msaccess", ".mdb"),
        "1.txt": ("text/plain", ".txt"),
        "1.csv": ("text/csv", ".csv"),
        "1.txt.bz2": ("application/x-bzip2", ".bz2"),
        "1.txt.gz": ("application/gzip", ".gz"),
        "1.zip": ("application/zip", ".zip"),
        "bgBannerFoot.png": ("image/png", ".png"),
        "blueBtnBg.jpg": ("image/jpeg", ".jpg"),
        "1.pdf": ("application/pdf", ".pdf"),
        "grid.gif": ("image/gif", ".gif"),
        "1.tar": ("application/x-tar", ".tar"),
        "1.tar.gz": ("application/gzip", ".gz"),
        "1.jar": ("application/java-archive", ".jar"),
        "1.xml": ("application/xml", ".xml"),
        "flowfilev3": ("application/flowfile-v3", ""),
        "flowfilev1.tar": ("application/flowfile-v1", ""),
    }
    rows = [(name, bytearray(open(_os.path.join(REF_MIME_DIR, name),
                                  "rb").read()))
            for name in expected]
    df = spark.createDataFrame(rows, "filename string, content binary")
    got = {r["filename"]: (r["mime_type"], r["mime_ext"])
           for r in identify_mime_type(
               df, "content", filename_col="filename",
               extension_col="mime_ext").collect()}
    assert got == expected
