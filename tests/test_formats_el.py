"""Format conversion family + extended EL functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.functions import EL
from nifi_spark.operators import (avro_available, convert_format,
                                  convert_schema, infer_ddl)


def test_convert_format_parquet_to_orc_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame([(i, f"row{i}") for i in range(50)],
                          "id long, v string").write.parquet(src)
    out = convert_format(spark, src, "parquet", str(tmp_path / "out"), "orc")
    assert out.count() == 50
    assert {r.v for r in out.filter(F.col("id") < 3).collect()} == \
        {"row0", "row1", "row2"}


def test_convert_format_csv_to_json_with_transform(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string") \
        .write.option("header", "true").csv(src)
    out = convert_format(
        spark, src, "csv", str(tmp_path / "out"), "json",
        read_options={"header": "true"},
        transform=lambda df: df.withColumn("k2", F.col("k") * 2))
    got = {r.k: r.k2 for r in out.collect()}
    assert got == {1: 2, 2: 4}


def test_avro_conversion_without_datasource(spark, tmp_path):
    """With no spark-avro on the classpath, convert_format now rides the
    pure-Python container codec both directions (previously a gated
    error); an empty input dir still fails with a clear message."""
    if avro_available(spark):
        pytest.skip("spark-avro present; fallback not exercised")
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))
    out = convert_format(spark, str(tmp_path / "in"), "parquet",
                         str(tmp_path / "av"), "avro")
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "b")}
    back = convert_format(spark, str(tmp_path / "av"), "avro",
                          str(tmp_path / "pq"), "parquet")
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}
    with pytest.raises(Exception, match="avro|PATH_NOT_FOUND"):
        convert_format(spark, str(tmp_path / "nope"), "avro",
                       str(tmp_path / "o"), "parquet")


def test_convert_schema_projection(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "a long, b string, c double")
    out = convert_schema(df, rename={"a": "id"}, casts={"id": "string"},
                         defaults={"src": F.lit("conv")},
                         select=["id", "b", "src"])
    r = out.first()
    assert (r.id, r.b, r.src) == ("1", "x", "conv")
    assert dict(out.dtypes)["id"] == "string"


def test_infer_ddl(spark, tmp_path):
    src = str(tmp_path / "csv")
    spark.createDataFrame([(1, "a", 1.5)], "k int, s string, f double") \
        .write.option("header", "true").csv(src)
    ddl = infer_ddl(spark, src, "csv")
    from pyspark.sql.types import StructType
    st = StructType.fromDDL(ddl)
    assert {f.name for f in st.fields} == {"k", "s", "f"}


def test_el_extended_functions(spark):
    df = spark.createDataFrame(
        [("hello table world table", 'say "hi"\there')],
        "t string, j string")
    r = df.select(
        EL.indexOf("t", "table").alias("idx"),
        EL.indexOf("t", "zzz").alias("idx_missing"),
        EL.lastIndexOf("t", "table").alias("lidx"),
        EL.lastIndexOf("t", "zzz").alias("lidx_missing"),
        EL.equalsIgnoreCase("t", "HELLO TABLE WORLD TABLE").alias("eqi"),
        (EL.plus(EL.length("t"), 2)).alias("p"),
        EL.escapeJson("j").alias("ej"),
        EL.unescapeJson(EL.escapeJson("j")).alias("uj"),
        EL.escapeXml(F.lit("<a&b>")).alias("ex"),
        EL.unescapeXml(EL.escapeXml(F.lit("<a&'b\">"))).alias("ux"),
        EL.escapeCsv(F.lit('v,"x"')).alias("ec"),
        EL.escapeCsv(F.lit("plain")).alias("ec_plain"),
        EL.replaceFirst("t", "table", "TBL").alias("rf"),
        EL.anyDelineatedValue("t", " ",
                              lambda w: F.length(w) > 4).alias("any5"),
        EL.allDelineatedValues("t", " ",
                               lambda w: F.length(w) >= 5).alias("all5"),
        EL.allDelineatedValues("t", " ",
                               lambda w: F.length(w) >= 6).alias("all6"),
        EL.anyAttribute(lambda c: F.contains(c, F.lit("hi")),
                        "t", "j").alias("anyattr"),
    ).first()
    assert r.idx == 6 and r.idx_missing == -1
    assert r.lidx == 18 and r.lidx_missing == -1
    assert r.eqi is True
    assert r.p == len("hello table world table") + 2
    assert r.ej == 'say \\"hi\\"\\there'
    assert r.uj == 'say "hi"\there'
    assert r.ex == "&lt;a&amp;b&gt;"
    assert r.ux == "<a&'b\">"
    assert r.ec == '"v,""x"""' and r.ec_plain == "plain"
    assert r.rf == "hello TBL world table"
    # every word in t is exactly 5 chars: all5 holds, all6 does not
    assert r.any5 is True and r.all5 is True and r.all6 is False
    assert r.anyattr is True


# ---------------- EL string compiler ----------------


def test_el_string_compiler(spark):
    import pytest as _pt

    from nifi_spark.functions import ELSyntaxError, compile_el, compile_template
    df = spark.createDataFrame([("a/b/file.TXT", 7, "hello world")],
                               "path string, n long, msg string")

    def one(expr):
        return df.select(compile_el(expr).alias("x")).first()[0]

    assert one("${path:substringAfterLast('/'):toUpper()}") == "FILE.TXT"
    assert one("${n:mod(4):plus(10)}") == 13
    assert one("${msg:replace('world', 'there'):toUpper()}") == "HELLO THERE"
    assert one("${msg:contains('wor')}") is True
    assert one("${n:toRadix(2)}") == "111"
    assert one("${msg:padLeft(13, '*')}") == "**hello world"
    assert one("${msg:isEmpty():not()}") is True
    t = df.select(compile_template(
        "f=${path:substringAfterLast('/')} n=${n:plus(1)} $$5").alias("t")
    ).first()[0]
    assert t == "f=file.TXT n=8 $5"
    # subjectless + quoted attr names
    assert len(one("${uuid()}")) == 36
    df2 = spark.createDataFrame([("v",)], "`my attr` string")
    got = df2.select(compile_el("${'my attr':toUpper()}").alias("x")).first()[0]
    assert got == "V"
    # nested expression arguments compile (Column passthrough)
    assert one("${msg:contains(${msg})}") is True
    assert one("${n:plus(${n})}") == 14
    df3 = spark.createDataFrame([("abc", "b")], "s string, frag string")
    got3 = df3.select(compile_el("${s:contains(${frag})}").alias("x")).first()[0]
    assert got3 is True
    for bad in ["${path:nosuchfn()}", "${anyAttribute('x')}",
                "${path:replace(@@)}", "${path", "${path:toUpper()}x"]:
        with _pt.raises(ELSyntaxError):
            compile_el(bad)


def test_el_html_escape_family(spark):
    """escapeHtml3/4, unescapeHtml3/4, unescapeCsv — commons-lang3
    translator parity (CharSequenceTranslatorEvaluator.java:42-66)."""
    from nifi_spark.functions.el import EL, unescape_csv, unescape_html

    df = spark.createDataFrame(
        [('<a href="x">café & naïve — Σ €</a>',)], "s string")

    def one(col):
        return df.select(col.alias("x")).first()[0]

    esc4 = one(EL.escapeHtml4("s"))
    assert esc4 == ("&lt;a href=&quot;x&quot;&gt;caf&eacute; &amp; "
                    "na&iuml;ve &mdash; &Sigma; &euro;&lt;/a&gt;")
    esc3 = one(EL.escapeHtml3("s"))
    # HTML3 = basic + ISO-8859-1 only: é/ï escape, — Σ € stay raw
    assert "&eacute;" in esc3 and "&iuml;" in esc3
    assert "—" in esc3 and "Σ" in esc3 and "€" in esc3
    # roundtrips
    assert one(EL.unescapeHtml4(EL.escapeHtml4("s"))) == df.first()[0]
    assert one(EL.unescapeHtml3(EL.escapeHtml3("s"))) == df.first()[0]
    # single-pass contract + numeric refs + unknown names (pure fn)
    assert unescape_html("&amp;lt;") == "&lt;"
    assert unescape_html("&#xE9;&#233;&bogus;") == "éé&bogus;"
    # unescapeCsv: quoted+special unquotes; quoted-plain stays quoted
    assert unescape_csv('"a,b""c"') == 'a,b"c'
    assert unescape_csv('"plain"') == '"plain"'
    df2 = spark.createDataFrame([('x,"y',)], "s string")
    got = df2.select(
        EL.unescapeCsv(EL.escapeCsv("s")).alias("x")).first()[0]
    assert got == 'x,"y'


def test_el_string_compiler_html_escape(spark):
    """NiFi property strings reach the new escape family through the
    ${...} compiler."""
    from nifi_spark.functions.el_parser import compile_el
    df = spark.createDataFrame([('<a href="x">5 &amp; 6</a>',)],
                               "s string")
    got = df.select(
        compile_el("${s:escapeHtml4()}").alias("e"),
        compile_el("${s:unescapeHtml4():escapeXml()}").alias("rt"),
    ).first()
    assert got["e"] == ("&lt;a href=&quot;x&quot;&gt;5 &amp;amp; 6"
                        "&lt;/a&gt;")
    assert got["rt"] == ("&lt;a href=&quot;x&quot;&gt;5 &amp; 6"
                         "&lt;/a&gt;")
