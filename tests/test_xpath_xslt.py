"""XPath 1.0 / XSLT subset / XQuery FLWOR engine tests (pure Python —
no Spark session; the Spark-side wiring is covered in
test_codec_formats.py and the transform_xml_xslt / xquery_flwor gate
rows)."""

from __future__ import annotations

import pytest
from xml.etree import ElementTree as ET

from nifi_spark.functions.xpath1 import XPathError, evaluate_on
from nifi_spark.operators.xquery import (XQueryError, eval_flwor,
                                         parse_flwor)
from nifi_spark.operators.xslt import XsltError, XsltStylesheet

XML = """<catalog>
  <book id="b1" price="10.5"><title>Alpha</title><author>Ann</author></book>
  <book id="b2" price="3"><title>Beta</title><author>Bob</author></book>
  <book id="b3" price="22"><title>Gamma</title><author>Ann</author></book>
  <note>hello <b>bold</b> tail</note>
</catalog>"""


@pytest.fixture(scope="module")
def root():
    return ET.fromstring(XML)


XPATH_CASES = [
    ("count(/catalog/book)", 3.0),
    ("count(//book[@price > 5])", 2.0),
    ("string(/catalog/book[2]/title)", "Beta"),
    ("string(//book[last()]/title)", "Gamma"),
    ("normalize-space(/catalog/note)", "hello bold tail"),
    ("sum(//book/@price)", 35.5),
    ("count(//book[author='Ann'])", 2.0),
    ("concat(//book[1]/title, '-', //book[1]/@id)", "Alpha-b1"),
    ("count(//book/title | //book/author)", 6.0),
    ("string(//book[@id='b2']/following-sibling::*[1]/title)", "Gamma"),
    ("string(//title[.='Beta']/../@id)", "b2"),
    ("substring-before(string(//book[1]/@price), '.')", "10"),
    ("substring-after('a=b', '=')", "b"),
    ("substring('12345', 2, 3)", "234"),
    ("string-length(string(//book[3]/title))", 5.0),
    ("translate('abc-def', '-', '_')", "abc_def"),
    ("translate('abc', 'b', '')", "ac"),
    ("2 + 3 * 4", 14.0),
    ("10 div 4", 2.5),
    ("7 mod 3", 1.0),
    ("-(3) + 5", 2.0),
    ("count(//book[position() > 1])", 2.0),
    ("boolean(//missing)", False),
    ("not(//missing)", True),
    ("string(/catalog/book[@price < 5]/author)", "Bob"),
    ("count(//*)", 12.0),
    ("count(/catalog/note/text())", 2.0),
    ("string(/catalog/note/text()[2])", " tail"),
    ("name(//book[1]/*[2])", "author"),
    ("floor(10.7)", 10.0),
    ("ceiling(10.2)", 11.0),
    ("round(2.5)", 3.0),
    ("count(//title/ancestor::*)", 4.0),
    ("count(//book[1]/preceding-sibling::book)", 0.0),
    ("count(//book[3]/preceding-sibling::book)", 2.0),
    ("starts-with(string(//book[1]/@id), 'b')", True),
    ("contains('haystack', 'sta')", True),
    ("string(//book[starts-with(title, 'G')]/@id)", "b3"),
    ("number('12') = 12", True),
    ("'x' != 'y'", True),
]


@pytest.mark.parametrize("src,want", XPATH_CASES,
                         ids=[c[0][:40] for c in XPATH_CASES])
def test_xpath_cases(root, src, want):
    assert evaluate_on(src, root) == want


def test_xpath_errors(root):
    with pytest.raises(XPathError, match="unsupported function"):
        evaluate_on("key('k', 'v')", root)
    with pytest.raises(XPathError, match="unbound variable"):
        evaluate_on("$nope", root)
    with pytest.raises(XPathError):
        evaluate_on("//book[", root)


def test_xslt_template_rules_and_modes(root):
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:output method="text"/>
      <xsl:template match="/">
        <xsl:apply-templates select="//book" mode="short"/>
      </xsl:template>
      <xsl:template match="book" mode="short">
        <xsl:value-of select="title"/>
        <xsl:if test="position() != last()">,</xsl:if>
      </xsl:template>
    </xsl:stylesheet>"""
    assert XsltStylesheet(xsl).apply(XML) == "Alpha,Beta,Gamma"


def test_xslt_priority_and_builtin_rules():
    # the more specific pattern must win; unmatched elements fall to
    # the built-in rules (recurse + copy text)
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:output method="text"/>
      <xsl:template match="b">[B]</xsl:template>
      <xsl:template match="note/b">[NB]</xsl:template>
    </xsl:stylesheet>"""
    out = XsltStylesheet(xsl).apply("<r><note>x <b>y</b></note><b>z</b></r>")
    assert out == "x [NB][B]"


def test_xslt_named_templates_and_params():
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:output method="text"/>
      <xsl:template match="/">
        <xsl:call-template name="greet">
          <xsl:with-param name="who" select="'world'"/>
        </xsl:call-template>
        <xsl:call-template name="greet"/>
      </xsl:template>
      <xsl:template name="greet">
        <xsl:param name="who" select="'default'"/>
        <xsl:text>hi </xsl:text><xsl:value-of select="$who"/>
        <xsl:text>;</xsl:text>
      </xsl:template>
    </xsl:stylesheet>"""
    assert XsltStylesheet(xsl).apply("<r/>") == "hi world;hi default;"


def test_xslt_copy_of_and_element(root):
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <xsl:element name="keep">
          <xsl:copy-of select="//book[@id='b2']/title"/>
        </xsl:element>
      </xsl:template>
    </xsl:stylesheet>"""
    assert XsltStylesheet(xsl).apply(XML) == \
        "<keep><title>Beta</title></keep>"


def test_xslt_unsupported_raises():
    with pytest.raises(XsltError, match="unresolvable"):
        XsltStylesheet(
            '<xsl:stylesheet version="1.0" xmlns:xsl='
            '"http://www.w3.org/1999/XSL/Transform">'
            '<xsl:import href="x.xsl"/></xsl:stylesheet>')
    with pytest.raises(XsltError, match="xsl:unknown-thing"):
        xsl = ('<xsl:stylesheet version="1.0" xmlns:xsl='
               '"http://www.w3.org/1999/XSL/Transform">'
               '<xsl:template match="/"><xsl:unknown-thing/>'
               '</xsl:template></xsl:stylesheet>')
        XsltStylesheet(xsl).apply("<r/>")


def test_xslt_format_number_and_decimal_format():
    from nifi_spark.operators.xslt import _format_decimal
    assert _format_decimal(1234.5678, "#,##0.00", {}) == "1,234.57"
    assert _format_decimal(-1234.5, "#,##0.0;(#,##0.0)", {}) == "(1,234.5)"
    assert _format_decimal(-7.25, "0.00", {}) == "-7.25"
    assert _format_decimal(0.256, "0%", {}) == "26%"
    assert _format_decimal(42.0, "000000", {}) == "000042"
    assert _format_decimal(float("nan"), "0", {}) == "NaN"
    assert _format_decimal(float("inf"), "0", {}) == "Infinity"
    assert _format_decimal(2.5, "0", {}) == "2"    # HALF_EVEN
    assert _format_decimal(3.5, "0", {}) == "4"
    assert _format_decimal(
        1234.5, "#.##0,00",
        {"decimal-separator": ",", "grouping-separator": "."}) == "1.234,50"
    sheet = XsltStylesheet(
        '<xsl:stylesheet version="1.0" xmlns:xsl='
        '"http://www.w3.org/1999/XSL/Transform">'
        '<xsl:decimal-format name="eu" decimal-separator=","'
        ' grouping-separator="."/>'
        '<xsl:output method="text"/>'
        '<xsl:template match="/">'
        "<xsl:value-of select=\"format-number(sum(//p/@v), '#,##0.00')\"/>"
        "<xsl:text>|</xsl:text>"
        "<xsl:value-of select="
        "\"format-number(sum(//p/@v), '#.##0,00', 'eu')\"/>"
        '</xsl:template></xsl:stylesheet>')
    assert sheet.apply('<r><p v="1200.5"/><p v="34.25"/></r>') == \
        "1,234.75|1.234,75"
    with pytest.raises(XsltError, match="undeclared decimal format"):
        sheet_bad = XsltStylesheet(
            '<xsl:stylesheet version="1.0" xmlns:xsl='
            '"http://www.w3.org/1999/XSL/Transform">'
            '<xsl:output method="text"/>'
            '<xsl:template match="/">'
            "<xsl:value-of select=\"format-number(1, '0', 'nope')\"/>"
            '</xsl:template></xsl:stylesheet>')
        sheet_bad.apply("<r/>")


def test_xslt_apply_imports():
    imported = ('<xsl:stylesheet version="1.0" xmlns:xsl='
                '"http://www.w3.org/1999/XSL/Transform">'
                '<xsl:template match="item"><base>'
                '<xsl:value-of select="."/></base></xsl:template>'
                '</xsl:stylesheet>')
    main = XsltStylesheet(
        '<xsl:stylesheet version="1.0" xmlns:xsl='
        '"http://www.w3.org/1999/XSL/Transform">'
        '<xsl:import href="base.xsl"/>'
        '<xsl:template match="/">'
        '<xsl:apply-templates select="//item"/></xsl:template>'
        '<xsl:template match="item"><wrap><xsl:apply-imports/></wrap>'
        '</xsl:template></xsl:stylesheet>',
        resolver={"base.xsl": imported})
    assert main.apply("<r><item>a</item><item>b</item></r>") == \
        "<wrap><base>a</base></wrap><wrap><base>b</base></wrap>"
    # no lower-precedence match -> the built-in rules take over
    solo = XsltStylesheet(
        '<xsl:stylesheet version="1.0" xmlns:xsl='
        '"http://www.w3.org/1999/XSL/Transform">'
        '<xsl:template match="/">'
        '<xsl:apply-templates select="//item"/></xsl:template>'
        '<xsl:template match="item"><w><xsl:apply-imports/></w>'
        '</xsl:template></xsl:stylesheet>')
    assert solo.apply("<r><item>x</item></r>") == "<w>x</w>"


def test_xslt_namespace_alias():
    sheet = XsltStylesheet(
        '<xsl:stylesheet version="1.0"'
        ' xmlns:xsl="http://www.w3.org/1999/XSL/Transform"'
        ' xmlns:axsl="http://example.test/alias">'
        '<xsl:namespace-alias stylesheet-prefix="axsl"'
        ' result-prefix="xsl"/>'
        '<xsl:template match="/">'
        '<axsl:template match="x"><axsl:value-of select="."/>'
        '</axsl:template></xsl:template></xsl:stylesheet>')
    out = sheet.apply("<r/>")
    assert "http://www.w3.org/1999/XSL/Transform" in out
    assert "example.test/alias" not in out
    with pytest.raises(XsltError, match="not declared"):
        XsltStylesheet(
            '<xsl:stylesheet version="1.0" xmlns:xsl='
            '"http://www.w3.org/1999/XSL/Transform">'
            '<xsl:namespace-alias stylesheet-prefix="nope"'
            ' result-prefix="xsl"/></xsl:stylesheet>')


_XSL_HEAD = ('<xsl:stylesheet version="1.0" xmlns:xsl='
             '"http://www.w3.org/1999/XSL/Transform">')


def test_xslt_key():
    xsl = (_XSL_HEAD +
           '<xsl:key name="by-author" match="book" use="author"/>'
           '<xsl:template match="/">'
           "<hits><xsl:for-each select=\"key('by-author', 'Ann')\">"
           '<t><xsl:value-of select="title"/></t>'
           '</xsl:for-each></hits></xsl:template></xsl:stylesheet>')
    assert XsltStylesheet(xsl).apply(XML) == \
        "<hits><t>Alpha</t><t>Gamma</t></hits>"


def test_xslt_number_levels():
    doc = ("<d><ch><s/><s/><s/></ch><ch><s/><s/></ch></d>")
    # level=single: position among matching siblings
    xsl = (_XSL_HEAD + '<xsl:output method="text"/>'
           '<xsl:template match="/">'
           '<xsl:for-each select="//s">'
           '<xsl:number level="single" count="s" format="1."/>'
           '</xsl:for-each></xsl:template></xsl:stylesheet>')
    assert XsltStylesheet(xsl).apply(doc) == "1.2.3.1.2."
    # level=any counts across the whole document in doc order
    xsl_any = xsl.replace('level="single"', 'level="any"')
    assert XsltStylesheet(xsl_any).apply(doc) == "1.2.3.4.5."
    # level=multiple: ch.s hierarchical numbering + alpha format
    xsl_m = (_XSL_HEAD + '<xsl:output method="text"/>'
             '<xsl:template match="/">'
             '<xsl:for-each select="//s">'
             '<xsl:number level="multiple" count="ch|s" format="1.a "/>'
             '</xsl:for-each></xsl:template></xsl:stylesheet>')
    assert XsltStylesheet(xsl_m).apply(doc) == \
        "1.a 1.b 1.c 2.a 2.b "
    # value= + roman format
    xsl_v = (_XSL_HEAD + '<xsl:output method="text"/>'
             '<xsl:template match="/">'
             '<xsl:number value="14" format="I"/>'
             '</xsl:template></xsl:stylesheet>')
    assert XsltStylesheet(xsl_v).apply("<r/>") == "XIV"


def test_xslt_import_precedence_and_include():
    base = (_XSL_HEAD + '<xsl:output method="text"/>'
            '<xsl:template match="book">'
            'base:<xsl:value-of select="@id"/>;'
            '</xsl:template>'
            '<xsl:template match="note">N</xsl:template>'
            '</xsl:stylesheet>')
    inc = (_XSL_HEAD +
           '<xsl:template match="title|author"/></xsl:stylesheet>')
    main = (_XSL_HEAD + '<xsl:import href="base.xsl"/>'
            '<xsl:include href="inc.xsl"/>'
            '<xsl:template match="book[@id=\'b2\']" priority="-5">'
            'main:b2;</xsl:template></xsl:stylesheet>')
    out = XsltStylesheet(
        main, resolver={"base.xsl": base, "inc.xsl": inc}).apply(XML)
    # the importing sheet's b2 rule wins DESPITE priority -5 (import
    # precedence dominates); other books fall through to the import;
    # the included empty rules suppress title/author text (remaining
    # whitespace is the source document's, as real XSLT preserves it)
    assert "".join(out.split()) == "base:b1;main:b2;base:b3;N"


def test_flwor_let_where_order(root):
    q = """for $b in //book
           let $p := $b/@price
           where $p >= 3 and $p <= 11
           order by $p
           return concat($b/@id, '=', $p)"""
    assert eval_flwor(parse_flwor(q), root) == ["b2=3", "b1=10.5"]


def test_flwor_constructor_and_cartesian(root):
    q = """for $a in //author, $b in //book
           where $b/author = $a and $b/@price > 5
           return string($b/@id)"""
    # Ann appears twice -> her matches repeat (XQuery tuple semantics)
    assert eval_flwor(parse_flwor(q), root) == ["b1", "b3", "b1", "b3"]
    q2 = 'for $b in //book[1] return <w t="{$b/title}">{$b/author}</w>'
    assert eval_flwor(parse_flwor(q2), root) == \
        ['<w t="Alpha"><author>Ann</author></w>']


def test_flwor_nested_in_return(root):
    q = """for $a in //author[.='Bob']
           return for $b in //book[author = $a]
                  return concat('hit:', $b/@id)"""
    assert eval_flwor(parse_flwor(q), root) == ["hit:b2"]
    # nested FLWOR inside a constructor hole: markup items concatenate
    q2 = """for $c in /catalog
            return <list>{ for $b in $c/book
                           where $b/@price > 5
                           return <i>{string($b/@id)}</i> }</list>"""
    assert eval_flwor(parse_flwor(q2), root) == \
        ["<list><i>b1</i><i>b3</i></list>"]
    # parenthesized nested FLWOR in a let binding: atomics space-join
    q3 = """for $c in /catalog
            let $ids := (for $b in $c/book return string($b/@id))
            return concat(count($ids), ':', $ids[1])"""
    assert eval_flwor(parse_flwor(q3), root) == ["3:b1"]


def test_flwor_prolog_variables_and_namespace(root):
    q = """xquery version "1.0";
           declare namespace x = "http://example.test";
           declare variable $floor := 5;
           declare variable $ceil := $floor + 17;
           for $b in //book
           where $b/@price > $floor and $b/@price <= $ceil
           return string($b/@id)"""
    plan = parse_flwor(q)
    assert plan["namespaces"] == {"x": "http://example.test"}
    assert eval_flwor(plan, root) == ["b1", "b3"]


def test_flwor_external_variables(root):
    q = """declare variable $floor external;
           declare variable $fmt external := "id:";
           for $b in //book where $b/@price > $floor
           return concat($fmt, $b/@id)"""
    plan = parse_flwor(q)
    assert plan["external_vars"] == [("floor", None), ("fmt", '"id:"')]
    # bound externally; the default kicks in for the unbound one
    assert eval_flwor(plan, root, variables={"floor": 5.0}) == \
        ["id:b1", "id:b3"]
    # both bound: binding wins over the default
    assert eval_flwor(plan, root,
                      variables={"floor": 5.0, "fmt": "#"}) == ["#b1", "#b3"]
    # a plain external with no binding raises the declared error
    with pytest.raises(XQueryError, match=r"external variable \$floor"):
        eval_flwor(plan, root)


def test_flwor_prolog_functions(root):
    q = """declare function local:tag($b) { concat('[', $b/@id, ']') };
           for $b in //book
           where $b/@price > 5
           return local:tag($b)"""
    assert eval_flwor(parse_flwor(q), root) == ["[b1]", "[b3]"]
    # recursive function with a typed signature (annotations ignored)
    q2 = """declare function local:fact($n as xs:integer) as xs:integer
            { local:fact-impl($n) };
            declare function local:fact-impl($n)
            { concat('', $n * 1) };
            for $b in //book[1] return local:fact(3)"""
    assert eval_flwor(parse_flwor(q2), root) == ["3"]
    q3 = """declare function local:down($n)
            { local:down($n) };
            for $b in //book[1] return local:down(1)"""
    with pytest.raises(XQueryError, match="recursion"):
        eval_flwor(parse_flwor(q3), root)


def test_flwor_review_fixes(root):
    # variable declaration without whitespace before := parses
    q = "declare variable $v:=3; for $b in //book[@price > 20] return $v"
    assert eval_flwor(parse_flwor(q), root) == ["3"]
    # a return of '(a) op (b)' keeps non-enclosing parens intact
    q2 = "for $c in /catalog return (count($c/book)) * (1 + 1)"
    assert eval_flwor(parse_flwor(q2), root) == ["6"]


def test_xslt_review_fixes():
    # xsl:number value= rounds half-up (XPath round), not banker's
    xsl = (_XSL_HEAD + '<xsl:output method="text"/>'
           '<xsl:template match="/"><xsl:number value="2.5"/>'
           '</xsl:template></xsl:stylesheet>')
    assert XsltStylesheet(xsl).apply("<r/>") == "3"
    # cyclic imports raise cleanly instead of recursing forever
    a = (_XSL_HEAD + '<xsl:import href="b.xsl"/></xsl:stylesheet>')
    b = (_XSL_HEAD + '<xsl:import href="a.xsl"/></xsl:stylesheet>')
    main = (_XSL_HEAD + '<xsl:import href="a.xsl"/></xsl:stylesheet>')
    with pytest.raises(XsltError, match="cyclic"):
        XsltStylesheet(main, resolver={"a.xsl": a, "b.xsl": b})


import os as _os

_REF_XSL = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
            "nifi-standard-processors/src/test/resources/TestTransformXml")


@pytest.mark.skipif(not _os.path.isdir(_REF_XSL),
                    reason="reference checkout not present")
def test_reference_math_stylesheet():
    """Run the reference's own math.xsl (TestTransformXml resources) —
    an XPath tokenizer torture test using div/mod/or as ELEMENT NAMES in
    operator positions — with the header param injected the way
    TransformXml passes flowfile attributes. Every semantic line of the
    checked-in math.html must appear. (tokens.xsl is XSLT 2.0 —
    xsl:function/analyze-string — outside the engine's 1.0 scope.)"""
    xsl = open(_os.path.join(_REF_XSL, "math.xsl")).read()
    xml = open(_os.path.join(_REF_XSL, "math.xml")).read()
    out = XsltStylesheet(xsl).apply(xml, params={"header": "Test for mod"})
    assert "<H1>Test for mod</H1>" in out
    assert out.count('Should say "1": 1') == 2
    assert 'Should say "-1": -1' in out
    assert "<P>true</P>" in out


def test_xslt_param_injection_overrides_default():
    sheet = XsltStylesheet(
        '<xsl:stylesheet version="1.0" xmlns:xsl='
        '"http://www.w3.org/1999/XSL/Transform">'
        '<xsl:param name="p" select="\'default\'"/>'
        '<xsl:output method="text"/>'
        '<xsl:template match="/"><xsl:value-of select="$p"/>'
        '</xsl:template></xsl:stylesheet>')
    assert sheet.apply("<r/>") == "default"
    assert sheet.apply("<r/>", params={"p": "given"}) == "given"


# ------------------------------------------------- XSLT 2.0 subset

TOKENS_DIR = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
              "nifi-standard-processors/src/test/resources/TestTransformXml")


@pytest.mark.skipif(not _os.path.isdir(TOKENS_DIR),
                    reason="reference checkout not present")
def test_reference_tokens_stylesheet_golden():
    """tokens.xsl is XSLT 2.0 (xsl:function + xsl:analyze-string +
    tokenize/remove/replace/regex-group + string sequences) — previously
    a declared scope boundary, now byte-for-byte against the reference's
    tokens.xml incl. Xalan-style indent and the encoding declaration."""
    from nifi_spark.operators.xslt import XsltStylesheet
    csv = open(f"{TOKENS_DIR}/tokens.csv").read()
    data = "<data>\n" + "".join(ln + "\n" for ln in csv.splitlines()) \
        + "</data>"
    out = XsltStylesheet(open(f"{TOKENS_DIR}/tokens.xsl").read()).apply(
        data, params={"uuid_0": "uuid_0", "uuid_1": "uuid_1"})
    assert out == open(f"{TOKENS_DIR}/tokens.xml").read()


@pytest.mark.skipif(not _os.path.isdir(TOKENS_DIR),
                    reason="reference checkout not present")
def test_tokens_stylesheet_quote_torture():
    """The getTokens doc-comment cases from the stylesheet itself:
    quoted commas, empty quoted fields, doubled quotes."""
    from nifi_spark.operators.xslt import XsltStylesheet
    # row 2 is the header the stylesheet discards with remove($rows, 2);
    # the well-formed CSV quote cases from the stylesheet's doc comment:
    # quoted commas, empty quoted fields, doubled quotes
    data = ('<data>\nh1,h2,h3,h4,h5\n'
            '"foo, bar",foo,"",bar,""""\n</data>')
    out = XsltStylesheet(open(f"{TOKENS_DIR}/tokens.xsl").read()).apply(
        data, params={"uuid_0": "u0", "uuid_1": "u1"})
    import re
    toks = [m.group(1) if m.group(1) is not None else ""
            for m in re.finditer(r"<token(?:\s*/>|>(.*?)</token>)", out,
                                 re.S)]
    assert toks[:5] == ["foo, bar", "foo", "", "bar", '"']


def test_analyze_string_and_sequence_function():
    from nifi_spark.operators.xslt import XsltStylesheet
    sheet = XsltStylesheet("""
<xsl:stylesheet version="2.0"
    xmlns:xsl="http://www.w3.org/1999/XSL/Transform" xmlns:f="f">
  <xsl:output method="text"/>
  <xsl:function name="f:nums">
    <xsl:param name="s"/>
    <xsl:analyze-string select="$s" regex="(\\d+)">
      <xsl:matching-substring>
        <xsl:sequence select="concat('[', regex-group(1), ']')"/>
      </xsl:matching-substring>
      <xsl:non-matching-substring>
        <xsl:sequence select="'-'"/>
      </xsl:non-matching-substring>
    </xsl:analyze-string>
  </xsl:function>
  <xsl:template match="d">
    <xsl:variable name="v" select="f:nums(.)"/>
    <xsl:value-of select="$v[2]"/>
    <xsl:value-of select="string-join($v, '')"/>
  </xsl:template>
</xsl:stylesheet>""")
    out = sheet.apply("<d>a12b345c</d>")
    assert out == "[12]-[12]-[345]-"


def test_xpath2_functions_direct():
    from nifi_spark.functions.xpath1 import (Context, Document, evaluate,
                                             xpath_replacement)
    import xml.etree.ElementTree as ET
    ctx = Context(Document(ET.fromstring("<r/>")), None)
    ctx = Context(ctx.doc, ctx.doc)
    assert evaluate("tokenize('a,b,,c', ',')", ctx) == ["a", "b", "", "c"]
    assert evaluate("tokenize('', ',')", ctx) == []
    assert evaluate("remove(tokenize('x,y,z', ','), 2)", ctx) == ["x", "z"]
    assert evaluate("replace('aXbXc', 'X', '-')", ctx) == "a-b-c"
    assert evaluate("replace('a1b', '(\\d)', '[$1]')", ctx) == "a[1]b"
    assert evaluate('replace(\'"q"\', \'^"|"$|("")"\', "$1")', ctx) == "q"
    # XPath doubled-quote literal escaping
    assert evaluate('concat("a""b", \'c\'\'d\')', ctx) == 'a"bc\'d'
    assert xpath_replacement("\\$1") == "$1"
    assert xpath_replacement("$12") == "\\g<12>"


# --------------------------------------------- quantified expressions

def test_quantified_some_every(root):
    """XQuery 1.0 §3.9: some/every … satisfies over single and multiple
    bindings, vacuous truth on empty sequences, usable in where and in
    return holes."""
    q = """for $c in /catalog
           where some $b in $c/book satisfies $b/@price > 20
           return 'has-expensive'"""
    assert eval_flwor(parse_flwor(q), root) == ["has-expensive"]
    q = """for $c in /catalog
           where every $b in $c/book satisfies $b/@price > 20
           return 'all-expensive'"""
    assert eval_flwor(parse_flwor(q), root) == []
    q = """for $c in /catalog
           where every $b in $c/book satisfies $b/@price > 2
           return 'all-above-2'"""
    assert eval_flwor(parse_flwor(q), root) == ["all-above-2"]
    # multiple bindings = cartesian: some pair of books shares an author
    q = """for $c in /catalog
           where some $x in $c/book, $y in $c/book
                 satisfies $x/author = $y/author and
                           not($x/@id = $y/@id)
           return 'shared-author'"""
    assert eval_flwor(parse_flwor(q), root) == ["shared-author"]
    # vacuous truth: empty binding sequence
    q = """for $c in /catalog
           where every $m in $c/missing satisfies $m = 'x'
           return 'vacuous-true'"""
    assert eval_flwor(parse_flwor(q), root) == ["vacuous-true"]
    q = """for $c in /catalog
           where some $m in $c/missing satisfies $m = 'x'
           return 'never'"""
    assert eval_flwor(parse_flwor(q), root) == []
    # in a return hole, yields a boolean
    q = """for $c in /catalog
           return <r>{some $b in $c/book satisfies $b/@price < 5}</r>"""
    assert eval_flwor(parse_flwor(q), root) == ["<r>true</r>"]


def test_quantified_errors(root):
    import pytest as _pt
    with _pt.raises(XQueryError, match="satisfies"):
        eval_flwor(parse_flwor(
            "for $c in /catalog where some $b in $c/book "
            "return 'x'"), root)
