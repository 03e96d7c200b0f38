"""Codec operators, format parsers (CEF/mime/XML/Jolt), bin thresholds,
and the ExecuteSQL surface."""

from __future__ import annotations

import os
import struct
import gzip
import io
import zipfile

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators import (bin_assign, compress_content,
                                  convert_character_set, decode_content,
                                  encode_content, identify_mime_type,
                                  parse_cef, reshape_json, split_xml,
                                  unpack_content)
from nifi_spark.operators.content import evaluate_xpath
from nifi_spark.plans import Flow, SqlEngine


@pytest.fixture
def files(spark):
    rows = [("f1", "a.py", "python", "import os\nprint('hi')", 3),
            ("f2", "b.java", "java", "class B {}\n// todo", 7),
            ("f3", "c.py", "python", "def f():\n    return 1", 1),
            ("f4", "d.md", "markdown", "# title\nsome text", 9)]
    return spark.createDataFrame(
        rows,
        "name string, path string, lang string, content string, priority int")


# ---------------- codecs ----------------

def test_base64_hex_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "schön!")],
                               "id long, text string")
    enc = encode_content(df, "text", "base64", out_col="b64")
    dec = decode_content(enc, "b64", "base64", out_col="back",
                         charset="utf-8")
    rows = {r.id: r for r in dec.collect()}
    assert rows[1].b64 == "aGVsbG8gd29ybGQ="
    assert rows[1].back == "hello world" and rows[2].back == "schön!"
    hx = decode_content(encode_content(df, "text", "hex", out_col="h"),
                        "h", "hex", out_col="back", charset="utf-8")
    assert {r.back for r in hx.collect()} == {"hello world", "schön!"}


def test_charset_convert(spark):
    df = spark.createDataFrame([(1, "héllo")], "id long, text string")
    lat = convert_character_set(df, "text", "iso-8859-1", out_col="b")
    out = lat.select(F.decode(F.col("b"), "iso-8859-1").alias("s")).first()
    assert out.s == "héllo"
    assert lat.select(F.octet_length("b")).first()[0] == 5  # 1 byte/é


def test_compress_roundtrip_all_codecs(spark):
    df = spark.createDataFrame([(i, f"row {i} " + "x" * 200)
                                for i in range(20)], "id long, text string")
    binary = df.withColumn("payload", F.encode("text", "utf-8"))
    for codec in ("gzip", "deflate", "bzip2", "lzma"):
        comp = compress_content(binary, "payload", codec, out_col="c")
        back = compress_content(comp, "c", codec, mode="decompress",
                                out_col="d")
        got = back.select(
            F.sum(F.when(F.col("d") == F.col("payload"), 1)
                  .otherwise(0)).alias("same")).first().same
        assert got == 20, codec


def test_compress_interops_with_python_gzip(spark):
    df = spark.createDataFrame([(1, "interop check")], "id long, t string")
    comp = compress_content(df.withColumn("p", F.encode("t", "utf-8")),
                            "p", "gzip", out_col="c")
    blob = bytes(comp.select("c").first().c)
    assert gzip.decompress(blob) == b"interop check"


def test_unpack_content_zip(spark):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"alpha")
        z.writestr("b/b.txt", b"beta")
    df = spark.createDataFrame([(7, bytearray(buf.getvalue()))],
                               "doc long, archive binary")
    out = unpack_content(df, "archive", ["doc"]).collect()
    got = {r.entry_name: (r.doc, r.entry_index, r.entry_count,
                          bytes(r.entry)) for r in out}
    assert got == {"a.txt": (7, 0, 2, b"alpha"),
                   "b/b.txt": (7, 1, 2, b"beta")}


# ---------------- format parsers ----------------

def test_parse_cef(spark):
    line = ("CEF:0|Vendor|IDS|1.2|100|Port scan|7|src=10.0.0.1 dst=10.0.0.9 "
            "spt=4242")
    df = spark.createDataFrame([(1, line), (2, "not cef")],
                               "id long, msg string")
    routed = parse_cef(df, "msg", ext_keys=["src", "spt", "missing"])
    v = routed["valid"].collect()
    assert len(v) == 1 and len(routed["invalid"].collect()) == 1
    r = v[0]
    assert (r.cef_version, r.cef_vendor, r.cef_name, r.cef_severity) == \
        (0, "Vendor", "Port scan", "7")
    assert r.cef_src == "10.0.0.1" and r.cef_spt == "4242"
    assert r.cef_missing is None


def test_parse_evtx_roundtrip(spark):
    """Pack→parse roundtrip across a multi-chunk EVTX container: record
    ids, FILETIME microseconds and payload bytes all survive exactly;
    chunk walking follows the 64 KiB layout."""
    import hashlib
    from nifi_spark.operators import build_evtx, parse_evtx
    recs = [(i, 1_600_000_000_000_000 + i * 7,
             f"rec-{i}".encode() * (i % 40 + 1)) for i in range(1, 601)]
    blob = build_evtx(recs)
    assert len(blob) > 4096 + 65536  # forces the multi-chunk path
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    out = {r.record_id: r for r in
           parse_evtx(df, "content", id_col="fid").collect()}
    assert len(out) == 600
    for rid, us, payload in recs:
        r = out[rid]
        assert r.record_time_us == us
        assert r.payload_len == len(payload)
        assert r.payload_md5 == hashlib.md5(payload).hexdigest()
        assert r.src_id == 1
    assert max(r.chunk_index for r in out.values()) >= 1


def test_parse_evtx_bad_magic_and_stub_seam(spark):
    from pyspark.errors import PythonException
    from nifi_spark.operators import build_evtx, parse_evtx
    bad = spark.createDataFrame([(1, b"not an evtx blob at all")],
                                "fid long, content binary")
    with pytest.raises(PythonException, match="bad magic"):
        parse_evtx(bad, "content").collect()
    ok = spark.createDataFrame(
        [(1, build_evtx([(1, 1_000_000, b"x")]))], "fid long, content binary")
    with pytest.raises(PythonException, match="BinXML decode"):
        parse_evtx(ok, "content", decode_stub=False).collect()


def test_transform_xml_rules(spark):
    from nifi_spark.operators import transform_xml
    xml = ('<rec id="7"><debug>x</debug><old>v1</old>'
           '<nest><old>v2</old></nest></rec>')
    df = spark.createDataFrame([(1, xml), (2, "<broken")],
                               "id long, content string")
    out = {r.id: r.content for r in transform_xml(df, "content", [
        {"op": "drop", "match": ".//debug"},
        {"op": "rename", "match": ".//old", "to": "new"},
        {"op": "promote_attr", "match": ".", "attr": "id", "child": "rid"},
        {"op": "wrap", "tag": "envelope"},
    ]).collect()}
    assert out[2] is None                       # malformed → NULL
    t = out[1]
    assert t.startswith("<envelope><rec>")
    assert "<debug>" not in t and "<old>" not in t
    assert t.count("<new>") == 2 and "<rid>7</rid>" in t


def test_transform_xml_stylesheet_engine(spark):
    """stylesheet= runs the real XSLT-subset engine row-wise."""
    from nifi_spark.operators import transform_xml
    from nifi_spark.operators.xslt import XsltError
    df = spark.createDataFrame(
        [(1, '<order id="7"><line qty="2" price="3"/>'
             '<line qty="1" price="10"/></order>'),
         (2, "<broken")],
        "id long, content string")
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/order">
        <summary id="{@id}" n="{count(line)}">
          <total><xsl:value-of select="sum(line/@price)"/></total>
          <xsl:apply-templates select="line">
            <xsl:sort select="@price" data-type="number"
                      order="descending"/>
          </xsl:apply-templates>
        </summary>
      </xsl:template>
      <xsl:template match="line">
        <l><xsl:value-of select="@qty * @price"/></l>
      </xsl:template>
    </xsl:stylesheet>"""
    out = {r.id: r.content
           for r in transform_xml(df, "content",
                                  stylesheet=xsl).collect()}
    assert out[2] is None
    assert out[1] == ('<summary id="7" n="2"><total>13</total>'
                      '<l>10</l><l>6</l></summary>')
    # an unresolvable import still raises — driver-side, at compile
    with pytest.raises(XsltError, match="unresolvable"):
        transform_xml(df, "content", stylesheet=(
            '<xsl:stylesheet version="1.0" xmlns:xsl='
            '"http://www.w3.org/1999/XSL/Transform">'
            '<xsl:import href="missing.xsl"/></xsl:stylesheet>'))
    with pytest.raises(ValueError, match="unknown transform op"):
        transform_xml(df, "content", [{"op": "explode"}])


def test_evaluate_xquery_paths_and_flwor(spark):
    from nifi_spark.operators import evaluate_xquery
    from nifi_spark.operators.xquery import XQueryError
    xml = ('<o><i p="5"><n>a</n></i><i p="9"><n>b</n></i>'
           '<i p="2"><n>c</n></i></o>')
    df = spark.createDataFrame([(1, xml)], "id long, content string")
    r = evaluate_xquery(df, "content",
                        {"names": "/o/i/n/text()"}).collect()[0]
    assert list(r.names) == ["a", "b", "c"]
    first = evaluate_xquery(df, "content",
                            {"first": "/o/i/n", "count": "count(/o/i)"},
                            first_only=True).collect()[0]
    assert first.first == "a" and first["count"] in ("2", "2.0", "3",
                                                     "3.0")
    # FLWOR: where + order by + direct constructor with {} holes
    q = ('for $i in /o/i where $i/@p > 3 '
         'order by $i/@p descending '
         'return <hit p="{$i/@p}">{string($i/n)}</hit>')
    got = evaluate_xquery(df, "content", {"hits": q}).collect()[0]
    assert list(got.hits) == ['<hit p="9">b</hit>', '<hit p="5">a</hit>']
    # nested FLWOR in return now evaluates (one joined string per
    # outer binding; markup items concatenate)
    nest = evaluate_xquery(df, "content", {
        "q": ("for $i in /o/i[@p > 3] "
              "return for $j in $i/n return <x>{string($j)}</x>")
    }).collect()[0]
    assert list(nest.q) == ["<x>a</x>", "<x>b</x>"]
    # external variables bind through bindings= (Saxon
    # setExternalVariable analog); unbound plain externals raise at eval
    ext = evaluate_xquery(df, "content", {
        "q": ("declare variable $min external; "
              "for $i in /o/i where $i/@p > $min return string($i/@p)")},
        bindings={"min": 4.0}).collect()[0]
    assert list(ext.q) == ["5", "9"]  # doc order (no order-by clause)
    from xml.etree import ElementTree as ET

    from nifi_spark.operators.xquery import eval_flwor, parse_flwor
    with pytest.raises(XQueryError, match="external variable"):
        eval_flwor(parse_flwor(
            "declare variable $v external; for $i in /o/i return $i"),
            ET.fromstring(xml))


def test_identify_mime_type(spark):
    rows = [(1, bytearray(b"\x89PNG\r\n\x1a\nrest")),
            (2, bytearray(b"\xff\xd8\xff\xe0jpeg")),
            (3, bytearray(b"PK\x03\x04zipdata")),
            (4, bytearray(b"\x1f\x8b\x08gz")),
            (5, bytearray(b"plain text here")),
            (6, bytearray(b"\x00\x01\x02binary"))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r.mime_type
           for r in identify_mime_type(df, "payload").collect()}
    assert got == {1: "image/png", 2: "image/jpeg", 3: "application/zip",
                   4: "application/gzip", 5: "text/plain",
                   6: "application/octet-stream"}


def test_split_xml_and_xpath(spark):
    xml = ("<feed><item id=\"1\"><name>a</name></item>"
           "<item id=\"2\"><name>b</name></item></feed>")
    df = spark.createDataFrame([(1, xml)], "doc long, content string")
    frags = split_xml(df, "content", "item", id_cols=["doc"])
    assert frags.count() == 2
    ext = evaluate_xpath(frags, "fragment", {"name": "//name/text()"})
    assert sorted(r.name for r in ext.collect()) == ["a", "b"]
    assert {r.fragment_count for r in frags.collect()} == {2}


def test_reshape_json(spark):
    df = spark.createDataFrame(
        [(1, '{"user": {"id": 42, "name": "ada"}, "v": 1.5}')],
        "id long, doc string")
    out = reshape_json(df, "doc",
                       shift={"uid": "$.user.id", "uname": "$.user.name",
                              "score": "$.v", "absent": "$.nope"},
                       defaults={"source": "api"},
                       types={"uid": "long", "score": "double"})
    assert out.first().doc == \
        '{"uid":42,"uname":"ada","score":1.5,"source":"api"}'


def test_bin_assign_thresholds(spark):
    df = spark.createDataFrame(
        [(i, "g" if i < 6 else "h", "x" * 100) for i in range(10)],
        "seq long, grp string, content string")
    out = bin_assign(df, "seq", "content", max_bytes=250, max_rows=100,
                     correlation_col="grp")
    bins = {(r.grp, r.seq): r.bin_id for r in out.collect()}
    # 100-byte rows, 250-byte cap: start offsets 0,100,200,300,400,500 →
    # byte-window ids 0,0,0,1,1,2 (window 0 carries 300 B — within the
    # documented max_bytes + one-row overflow bound)
    assert [bins[("g", i)] for i in range(6)] == [0, 0, 0, 1, 1, 2]
    assert [bins[("h", i)] for i in range(6, 10)] == [0, 0, 0, 1]
    rowcap = bin_assign(df, "seq", "content", max_bytes=1 << 30, max_rows=4,
                        correlation_col="grp")
    got = {(r.grp, r.seq): r.bin_id for r in rowcap.collect()}
    assert [got[("g", i)] for i in range(6)] == [0, 0, 0, 0, 1, 1]


def test_bin_assign_tied_order_values(spark):
    """ROWS frame regression: with all order values equal, the default
    RANGE frame would put the WHOLE partition's bytes in every row's
    cumulative sum (start = 500 for all), collapsing bin boundaries.
    ROWS frame must still pack sequentially: 100-byte rows, 250-byte cap
    → bins 0,0,0,1,1,2 regardless of ties."""
    df = spark.createDataFrame(
        [(7, i, "x" * 100) for i in range(6)],
        "seq long, uid long, content string")
    out = bin_assign(df, "seq", "content", max_bytes=250, max_rows=100)
    assert sorted(r.bin_id for r in out.collect()) == [0, 0, 0, 1, 1, 2]


# ---------------- ExecuteSQL surface ----------------

def test_sql_engine_fixed_query(spark, files):
    eng = SqlEngine(spark)
    eng.register("files", files)
    out = eng.sql("SELECT lang, count(*) AS n FROM files GROUP BY lang")
    got = {r.lang: r.n for r in out.collect()}
    assert got["python"] >= 1


def test_sql_engine_flow_stage(spark, files):
    eng = SqlEngine(spark)
    flow = (Flow("sql-flow")
            .source("src", lambda: files)
            .add("filtered", lambda df: df.filter(F.col("priority") <= 2),
                 inputs="src")
            .add("agg", eng.stage(
                "SELECT lang, count(*) AS n FROM staged GROUP BY lang",
                input_names=["staged"]), inputs="filtered"))
    out = flow.run()["agg"]
    assert out.count() >= 1
    assert set(out.columns) == {"lang", "n"}


def test_validate_xml_routes(spark):
    from nifi_spark.operators import validate_xml
    df = spark.createDataFrame(
        [(1, "<a><b>x</b></a>"), (2, "<a><b>x</a>"), (3, None),
         (4, "not xml at all"), (5, "<ok/>")],
        "id long, content string")
    routed = validate_xml(df, "content")
    assert {r.id for r in routed["valid"].collect()} == {1, 5}
    assert {r.id for r in routed["invalid"].collect()} == {2, 3, 4}


def test_kafka_offsets_bookkeeping(spark, tmp_path):
    import pytest
    from nifi_spark.ledger import KVState
    from nifi_spark.sources import (KafkaBatchSource, kafka_available,
                                    next_starting_offsets, offsets_json)
    assert offsets_json("t", {1: 42, 0: 7}) == '{"t": {"0": 7, "1": 42}}'
    st = KVState(str(tmp_path))
    assert next_starting_offsets(st, "k", "t") == "earliest"
    st.put("k", {"topic": "t", "offsets": {"0": 10, "1": 20}})
    assert next_starting_offsets(st, "k", "t") == \
        '{"t": {"0": 10, "1": 20}}'
    if not kafka_available(spark):
        with pytest.raises(ValueError, match="spark-sql-kafka"):
            KafkaBatchSource(spark, "b:9092", "t", st)


def test_modify_bytes(spark):
    from nifi_spark.operators import modify_bytes
    df = spark.createDataFrame([(1, bytearray(b"HEADpayloadTAIL"))],
                               "id long, content binary")
    out = modify_bytes(df, "content", drop_head=4, drop_tail=4).first()
    assert bytes(out.content) == b"payload"
    short = modify_bytes(spark.createDataFrame(
        [(1, bytearray(b"ab"))], "id long, content binary"),
        "content", drop_head=4, drop_tail=4).first()
    assert bytes(short.content) == b""


def test_encrypt_decrypt_roundtrip(spark):
    from nifi_spark.operators import decrypt_content, encrypt_content
    key = "0123456789abcdef"  # 16-byte AES key
    df = spark.createDataFrame([(1, "secret payload"), (2, "другой")],
                               "id long, text string")
    enc = encrypt_content(df, "text", key, out_col="ct")
    # ciphertext is binary and never equals the plaintext bytes
    assert enc.filter(F.col("ct") == F.encode("text", "utf-8")).count() == 0
    back = decrypt_content(enc, "ct", key, charset="utf-8", out_col="pt")
    assert {r.pt for r in back.collect()} == {"secret payload", "другой"}


def test_split_content_binary_delimiter(spark):
    from nifi_spark.operators import split_content
    blob = b"\x00\x01rec1\xff\x00rec2\xff\x00rec3\x02"
    df = spark.createDataFrame([(9, bytearray(blob))],
                               "id long, content binary")
    out = split_content(df, "content", b"\xff\x00", id_cols=["id"])
    frags = [bytes(r.fragment) for r in
             sorted(out.collect(), key=lambda r: r.fragment_index)]
    assert frags == [b"\x00\x01rec1", b"rec2", b"rec3\x02"]
    assert {r.fragment_count for r in out.collect()} == {3}


def test_enforce_order(spark):
    from nifi_spark.operators import enforce_order
    rows = [("g1", 0), ("g1", 1), ("g1", 2),          # clean run
            ("g2", 0), ("g2", 2), ("g2", 3),          # gap at 1
            ("g3", 0), ("g3", 0), ("g3", 1)]          # duplicate 0
    df = spark.createDataFrame(rows, "grp string, seq long")
    routed = enforce_order(df, "grp", "seq")
    in_order = {(r.grp, r.seq) for r in routed["in_order"].collect()}
    out_order = sorted((r.grp, r.seq)
                       for r in routed["out_of_order"].collect())
    assert in_order == {("g1", 0), ("g1", 1), ("g1", 2),
                        ("g2", 0), ("g3", 0)}
    assert out_order == [("g2", 2), ("g2", 3), ("g3", 0), ("g3", 1)]


def test_map_cache_lookup(spark):
    from nifi_spark.operators import fetch_map_cache, put_map_cache
    cache_df = spark.createDataFrame([("a", "1"), ("b", "2")],
                                     "k string, v string")
    cache = put_map_cache(cache_df, "k", "v")
    df = spark.createDataFrame([("a",), ("b",), ("zz",)], "k string")
    out = df.withColumn("v", fetch_map_cache(cache, "k", F.lit("miss")))
    assert {(r.k, r.v) for r in out.collect()} == \
        {("a", "1"), ("b", "2"), ("zz", "miss")}


def test_publish_kafka_gated(spark):
    import pytest
    from nifi_spark.sources import kafka_available, publish_kafka
    if kafka_available(spark):
        pytest.skip("kafka module present")
    df = spark.createDataFrame([("k", "v")], "key string, value string")
    with pytest.raises(ValueError, match="spark-sql-kafka"):
        publish_kafka(df, "b:9092", "t")


def test_binxml_decode_value_spec():
    """decode_binxml: literal trees, escaping, and every supported
    substitution value type (strings, ints, FILETIME, GUID, NULL)."""
    from nifi_spark.operators.evtx import (_VT_FILETIME, _VT_GUID,
                                           _VT_INT32, _VT_NULL, _VT_STRING,
                                           _VT_UINT64, decode_binxml,
                                           encode_binxml,
                                           encode_binxml_template)
    lit = encode_binxml("Event", attrs=[("P", 'a<"b"&c')],
                        children=[("Id", [], [], "7")])
    assert decode_binxml(lit) == \
        '<Event P="a&lt;&quot;b&quot;&amp;c"><Id>7</Id></Event>'
    assert decode_binxml(encode_binxml("Empty")) == "<Empty/>"
    tpl = encode_binxml_template(
        "E", attrs=[("p", ("sub", 0))],
        children=[("i", [], [], ("sub", 1)),
                  ("u", [], [], ("sub", 2)),
                  ("t", [], [], ("sub", 3)),
                  ("g", [], [], ("sub", 4)),
                  ("o", [], [], ("sub", 5, "opt"))],
        values=[(_VT_STRING, "sec"), (_VT_INT32, -9),
                (_VT_UINT64, 2**53), (_VT_FILETIME, 1_000_000),
                (_VT_GUID, "00112233-4455-6677-8899-aabbccddeeff"),
                (_VT_NULL, None)])
    assert decode_binxml(tpl) == (
        '<E p="sec"><i>-9</i><u>9007199254740992</u>'
        '<t>1970-01-01T00:00:01.000000Z</t>'
        '<g>00112233-4455-6677-8899-aabbccddeeff</g><o></o></E>')


def test_binxml_resident_ref_is_the_seam():
    """Chunk-resident name/template offsets (back-references to earlier
    records) raise the declared BinXmlResidentRef seam."""
    import struct as _s

    from nifi_spark.operators.evtx import (BinXmlResidentRef, decode_binxml,
                                           encode_binxml)
    blob = bytearray(encode_binxml("A"))
    # fragment(4) + token(1) + dep(2) = name-offset field at byte 11;
    # point it at offset 0 (outside the inline position) → resident ref
    _s.pack_into("<I", blob, 11, 0)
    with pytest.raises(BinXmlResidentRef):
        decode_binxml(bytes(blob))


def test_parse_evtx_decodes_binxml_payloads(spark):
    """Records whose payload is real BinXML come back as decoded XML;
    non-BinXML payloads in the same file keep the digest placeholder."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import encode_binxml
    recs = [(1, 1_000_000, encode_binxml("Ev", children=[("N", [], [], "1")])),
            (2, 2_000_000, b"plain text payload")]
    df = spark.createDataFrame([(9, build_evtx(recs))],
                               "fid long, content binary")
    out = {r.record_id: r.xml
           for r in parse_evtx(df, "content", id_col="fid").collect()}
    assert out[1] == "<Ev><N>1</N></Ev>"
    assert out[2].startswith('<Event RecordID="2" MD5=')


def test_parse_evtx_chunk_resident_backrefs(spark):
    """Records encoded with the per-chunk registry carry only offsets
    for repeated names/template definitions; strict decode must resolve
    them via whole-chunk context, and later records must be smaller."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import (_VT_STRING, _VT_UINT32,
                                           BinXmlResidentRef,
                                           decode_binxml,
                                           encode_binxml_template)

    def make(i):
        def enc(base, reg):
            return encode_binxml_template(
                "Ev", attrs=[("t", ("sub", 0))],
                children=[("n", [], [], ("sub", 1))],
                values=[(_VT_STRING, f"k{i % 2}"), (_VT_UINT32, i)],
                template_id=5, base=base, registry=reg)
        return enc

    blob = build_evtx([(i + 1, 1_700_000_000_000_000 + i, make(i))
                       for i in range(6)])
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    rows = {r.record_id: r for r in
            parse_evtx(df, "content", id_col="fid",
                       decode_stub=False).collect()}
    assert len(rows) == 6
    for i in range(6):
        r = rows[i + 1]
        assert r.xml == f'<Ev t="k{i % 2}"><n>{i}</n></Ev>'
        assert r.record_time_us == 1_700_000_000_000_000 + i
    # every record after the first is the shrunken back-ref form
    assert all(rows[i + 1].payload_len < rows[1].payload_len
               for i in range(1, 6))
    # a chunk-relative payload alone (no chunk context) must still
    # raise the declared resident-ref error, not mis-decode
    from nifi_spark.operators.evtx import _walk_records
    payloads = [p for _, _, _, p, _, _ in _walk_records(blob)]
    with pytest.raises(BinXmlResidentRef):
        decode_binxml(payloads[1])


def test_parse_evtx_full_token_set(spark):
    """CDATA / charref / entityref / PI tokens and the full value-spec
    list decode to their XML text forms under strict decode."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import (_VT_ANSI, _VT_BINARY, _VT_BOOL,
                                           _VT_HEX32, _VT_HEX64,
                                           _VT_REAL64, _VT_SID, _VT_SIZET,
                                           _VT_SYSTIME,
                                           encode_binxml,
                                           encode_binxml_template)
    p1 = encode_binxml(
        "Ev", children=[
            ("cdata", "a <raw> & b"),
            ("charref", 169),
            ("entityref", "amp"),
            ("pi", "target", "do this"),
            ("N", [], [], "tail"),
        ])
    p2 = encode_binxml_template(
        "V", children=[(f"v{i}", [], [], ("sub", i)) for i in range(9)],
        values=[(_VT_ANSI, "café"), (_VT_REAL64, 2.5),
                (_VT_BOOL, True), (_VT_BINARY, b"\xde\xad\xbe\xef"),
                (_VT_SIZET, 4096), (_VT_HEX32, 0x1f), (_VT_HEX64, 2**40),
                (_VT_SYSTIME, (2024, 3, 0, 9, 12, 30, 45, 7)),
                (_VT_SID, "S-1-5-21-1111-2222")],
        template_id=3)
    blob = build_evtx([(1, 1_000_000, p1), (2, 2_000_000, p2)])
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    out = {r.record_id: r.xml
           for r in parse_evtx(df, "content", id_col="fid",
                               decode_stub=False).collect()}
    assert out[1] == ("<Ev><![CDATA[a <raw> & b]]>&#169;&amp;"
                      "<?target do this?><N>tail</N></Ev>")
    assert out[2] == ("<V><v0>café</v0><v1>2.5</v1><v2>true</v2>"
                      "<v3>deadbeef</v3><v4>0x1000</v4><v5>0x1f</v5>"
                      "<v6>0x10000000000</v6>"
                      "<v7>2024-03-09T12:30:45.007Z</v7>"
                      "<v8>S-1-5-21-1111-2222</v8></V>")


def test_parse_evtx_array_values(spark):
    """Array value types (0x80|T): fixed-size elements and UTF-16
    string arrays render comma-joined."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import (_VT_STRING, _VT_UINT32,
                                           encode_binxml_template)
    payload = encode_binxml_template(
        "A", children=[("ids", [], [], ("sub", 0)),
                       ("tags", [], [], ("sub", 1))],
        values=[(0x80 | _VT_UINT32, [7, 11, 13]),
                (0x80 | _VT_STRING, ["alpha", "beta"])],
        template_id=4)
    blob = build_evtx([(1, 1_000_000, payload)])
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    out = parse_evtx(df, "content", id_col="fid",
                     decode_stub=False).collect()[0]
    assert out.xml == ("<A><ids>7,11,13</ids>"
                       "<tags>alpha,beta</tags></A>")


def test_parse_evtx_embedded_binxml_and_var_arrays(spark):
    """Embedded-BinXML substitution values (0x21) splice in as markup —
    recursively decoded, escaping applied to their scalar text only —
    and variable-size arrays (ANSI strings, SIDs) render comma-joined."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import (_VT_ANSI, _VT_BINXML, _VT_SID,
                                           encode_binxml_template)
    emb = ("EventData", [],
           [("Data", [("Name", "k")], [], "v<esc>&")], None)
    payload = encode_binxml_template(
        "Event", children=[("Body", [], [], ("sub", 0)),
                           ("Tags", [], [], ("sub", 1)),
                           ("Sids", [], [], ("sub", 2))],
        values=[(_VT_BINXML, emb),
                (0x80 | _VT_ANSI, ["aa", "b", "ccc"]),
                (0x80 | _VT_SID, ["S-1-5-21-7", "S-1-5-3"])],
        template_id=6)
    blob = build_evtx([(1, 2_000_000, payload)])
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    out = parse_evtx(df, "content", id_col="fid",
                     decode_stub=False).collect()[0]
    assert out.xml == (
        "<Event><Body><EventData>"
        '<Data Name="k">v&lt;esc&gt;&amp;</Data></EventData></Body>'
        "<Tags>aa,b,ccc</Tags><Sids>S-1-5-21-7,S-1-5-3</Sids></Event>")


def test_parse_evtx_embedded_binxml_chunk_mode(spark):
    """0x21 values inside chunk-resident (back-referenced) templates:
    the embedded fragment's offsets stay correct in base/registry mode,
    and later instances shrink to the back-reference form."""
    from nifi_spark.operators import build_evtx, parse_evtx
    from nifi_spark.operators.evtx import _VT_BINXML, _VT_STRING, \
        encode_binxml_template
    def mk(tag):
        def payload(base, registry):
            emb = ("D", [], [], f"x{tag}")
            return encode_binxml_template(
                "E", children=[("B", [], [], ("sub", 0)),
                               ("N", [], [], ("sub", 1))],
                values=[(_VT_BINXML, emb), (_VT_STRING, f"n{tag}")],
                template_id=5, base=base, registry=registry)
        return payload
    blob = build_evtx([(i, 1_000_000 * i, mk(i)) for i in range(1, 5)])
    df = spark.createDataFrame([(1, blob)], "fid long, content binary")
    rows = {r.record_id: r for r in
            parse_evtx(df, "content", id_col="fid",
                       decode_stub=False).collect()}
    assert len(rows) == 4
    for i in range(1, 5):
        assert rows[i].xml == f"<E><B><D>x{i}</D></B><N>n{i}</N></E>"
    # later records carry only the back-reference + values
    assert rows[2].payload_len < rows[1].payload_len


def test_flowfile_pack_roundtrips():
    """v1/v2/v3 codec roundtrips, long-value length escaping, multi-
    package v3 streams, and the version sniffer."""
    from nifi_spark.operators.flowfile_pack import (
        pack_v1, pack_v2, pack_v3, sniff_package, unpack_v1, unpack_v2,
        unpack_v3)
    attrs = {"path": "/a/b", "uuid": "u-1", "empty": ""}
    content = b"hello \x00 world" * 3
    for pack, unpack, ver in ((pack_v1, unpack_v1, 1),
                              (pack_v2, unpack_v2, 2),
                              (pack_v3, unpack_v3, 3)):
        blob = pack(attrs, content)
        assert sniff_package(blob) == ver
        assert unpack(blob) == [(attrs, content)]
    # >=64KiB value forces the 0xFFFF + 4-byte length escape
    big = {"k": "x" * 70000}
    blob = pack_v3(big, b"c")
    assert b"\xff\xff" in blob
    assert unpack_v3(blob) == [(big, b"c")]
    # packages concatenate (the FlowFileStream merge format)
    stream = pack_v3({"i": "1"}, b"one") + pack_v3({"i": "2"}, b"two")
    assert unpack_v3(stream) == [({"i": "1"}, b"one"),
                                 ({"i": "2"}, b"two")]
    with pytest.raises(ValueError, match="not a FlowFile v3"):
        unpack_v3(b"garbage-not-a-package")


def test_flowfile_pack_spark_roundtrip(spark):
    """package_flowfiles -> unpack_flowfiles over Spark: per-row v1 and
    merged v3 group streams both recover attributes + content."""
    from nifi_spark.operators import package_flowfiles, unpack_flowfiles
    src = spark.createDataFrame(
        [(i, f"grp{i % 2}", f"name-{i}", f"content {i}".encode())
         for i in range(8)],
        "id long, grp string, name string, content binary")
    # per-row v1 (TAR)
    packed = package_flowfiles(src, "content", ["name"], version=1)
    back = unpack_flowfiles(packed, "package", ["name"]).collect()
    assert len(back) == 8
    for r in back:
        i = int(r.name.split("-")[1])
        assert r.attributes == {"name": f"name-{i}"}
        assert bytes(r.content) == f"content {i}".encode()
    # merged v3 streams: one per group, 4 packages each
    merged = package_flowfiles(src, "content", ["name"], version=3,
                               group_cols=["grp"])
    rows = merged.collect()
    assert sorted(r.n_packages for r in rows) == [4, 4]
    back = unpack_flowfiles(merged, "package", ["grp"]).collect()
    assert len(back) == 8
    by_grp = {}
    for r in back:
        by_grp.setdefault(r.grp, []).append(r.attributes["name"])
    for g, names in by_grp.items():
        assert names == sorted(names)  # attr-sorted within the stream
    with pytest.raises(ValueError, match="TAR"):
        package_flowfiles(src, "content", ["name"], version=1,
                          group_cols=["grp"])


def test_identify_mime_flowfile_and_avro_magic(spark):
    """IdentifyMimeType reports NiFi's own envelope formats: flowfile-v3
    streams and Avro datafiles (plus the new magics don't disturb the
    text fallback)."""
    from nifi_spark.operators import identify_mime_type
    from nifi_spark.operators.flowfile_pack import pack_v3
    df = spark.createDataFrame(
        [(1, bytearray(pack_v3({"a": "1"}, b"x"))),
         (2, bytearray(b"Obj\x01\x02rest-of-avro")),
         (3, bytearray(b"plain text here"))],
        "id long, content binary")
    rows = {r.id: r.mime_type
            for r in identify_mime_type(df, "content").collect()}
    assert rows[1] == "application/flowfile-v3"
    assert rows[2] == "application/avro-binary"
    assert rows[3] == "text/plain"


_REF_RES = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
            "nifi-standard-processors/src/test/resources")


def _os_path_join_simple_jpg():
    import os
    return os.path.join(_REF_RES, "simple.jpg")


@pytest.mark.skipif(not __import__("os").path.isdir(_REF_RES),
                    reason="reference checkout not present")
def test_reference_flowfile_streams_and_archives(spark):
    """Decode the reference's OWN checked-in artifacts: flowfile-v3/v2
    streams (TestUnpackContent) through unpack_flowfiles, plus its
    zip/tar archives through unpack_content — contents must match the
    source files in the sibling 'folder' directory."""
    import os

    from nifi_spark.operators import unpack_content, unpack_flowfiles
    base = os.path.join(_REF_RES, "TestUnpackContent")
    cal = open(os.path.join(base, "folder", "cal.txt"), "rb").read()
    date = open(os.path.join(base, "folder", "date.txt"), "rb").read()

    for fname, version in (("data.flowfilev3", 3), ("data.flowfilev2", 2)):
        blob = open(os.path.join(base, fname), "rb").read()
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "id long, content binary")
        rows = unpack_flowfiles(df, "content", ["id"],
                                version=version).collect()
        got = {r.attributes["filename"]: bytes(r.content) for r in rows}
        assert got == {"cal.txt": cal, "date.txt": date}
        if version == 3:
            assert all(r.attributes["path"] == "folder" for r in rows)

    for fname, fmt in (("data.zip", "zip"), ("data.tar", "tar")):
        blob = open(os.path.join(base, fname), "rb").read()
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "id long, content binary")
        rows = unpack_content(df, "content", ["id"], archive=fmt).collect()
        got = {r.entry_name.split("/")[-1]: bytes(r.entry) for r in rows}
        assert got == {"cal.txt": cal, "date.txt": date}, (fmt, got.keys())


@pytest.mark.skipif(not __import__("os").path.isdir(_REF_RES),
                    reason="reference checkout not present")
def test_reference_compressed_samples(spark):
    """Decompress the reference's own gz/bz2 samples back to its
    checked-in plaintext (CompressedData resources)."""
    import os

    from nifi_spark.operators import compress_content
    base = os.path.join(_REF_RES, "CompressedData")
    plain = open(os.path.join(base, "SampleFile.txt"), "rb").read()
    # the reference's checked-in JPEG sniffs as image/jpeg
    from nifi_spark.operators import identify_mime_type
    jpg = open(_os_path_join_simple_jpg(), "rb").read()
    jdf = spark.createDataFrame([(1, bytearray(jpg))],
                                "id long, content binary")
    assert identify_mime_type(jdf, "content").first().mime_type == \
        "image/jpeg"
    for fname, codec in (("SampleFile.txt.gz", "gzip"),
                         ("SampleFile.txt.bz2", "bzip2")):
        blob = open(os.path.join(base, fname), "rb").read()
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "id long, content binary")
        out = compress_content(df, "content", codec,
                               mode="decompress").collect()[0]
        assert bytes(out.content) == plain, fname


def test_convert_charset_reference_utf32_golden(spark):
    """ConvertCharacterSet UTF-8 -> UTF-32 must reproduce the reference's
    own Converted2.txt bytes (Java "UTF-32" = big-endian, no BOM) — this
    charset is outside Spark encode()'s set, so it exercises the Arrow
    fallback path."""
    import os
    from nifi_spark.operators.codec import convert_character_set
    R = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
         "nifi-standard-processors/src/test/resources/"
         "CharacterSetConversionSamples")
    if not os.path.isdir(R):
        import pytest
        pytest.skip("reference checkout not present")
    with open(f"{R}/Original.txt", "rb") as f:
        original = f.read()
    with open(f"{R}/Converted2.txt", "rb") as f:
        expected = f.read()
    df = spark.createDataFrame([(1, original)], "id long, content binary")
    out = convert_character_set(df, "content", "UTF-32",
                                from_charset="UTF-8").collect()
    assert bytes(out[0]["content"]) == expected
    # and back
    df2 = spark.createDataFrame([(1, expected)], "id long, content binary")
    rt = convert_character_set(df2, "content", "UTF-8",
                               from_charset="UTF-32").collect()
    assert bytes(rt[0]["content"]) == original


def test_load_dictionary_reference_filters(spark):
    """ScanAttribute dictionary files with DICTIONARY_FILTER, the
    reference's own fixtures and assertions (TestScanAttribute.java)."""
    import os
    from nifi_spark.operators.codec import load_dictionary
    from nifi_spark.operators.routing import scan_attribute
    R = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
         "nifi-standard-processors/src/test/resources/ScanAttribute")
    if not os.path.isdir(R):
        import pytest
        pytest.skip("reference checkout not present")
    with open(f"{R}/dictionary-with-extra-info") as f:
        lines = f.readlines()
    greet = load_dictionary(lines, "(.*)<greeting>")
    assert greet == ["hello", "goodbye", "adios", "foo"]
    anyt = load_dictionary(lines, "(.*)<.*>")
    assert "world" in anyt and len(anyt) == 9
    with open(f"{R}/dictionary-with-empty-new-lines") as f:
        nonempty = load_dictionary(f.readlines())
    assert "" not in nonempty
    # routing parity: 'hello' matches under the greeting filter, 'world'
    # only under the any-tag filter
    df = spark.createDataFrame([("hello",), ("world",)], "abc string")
    dim = spark.createDataFrame([(t,) for t in greet], "term string")
    assert {r["abc"] for r in
            scan_attribute(df, "abc", dim, "term").collect()} == {"hello"}
    dim2 = spark.createDataFrame([(t,) for t in anyt], "term string")
    assert {r["abc"] for r in
            scan_attribute(df, "abc", dim2, "term").collect()} \
        == {"hello", "world"}


REF_EVTX = ("/root/reference/nifi-nar-bundles/nifi-evtx-bundle/"
            "nifi-evtx-processors/src/test/resources/application-logs.evtx")


@pytest.mark.skipif(not os.path.exists(REF_EVTX),
                    reason="reference repo absent")
def test_parse_evtx_reference_file_lifecycle_parity():
    """The reference's ParseEvtxTest lifecycle numbers on its own
    application-logs.evtx, reproduced exactly: bad chunks {1, 2}
    (1-based, current chunk skipped), 960 records parsed — 5 from
    chunk 2 before its record stream breaks — and every record's
    BinXML decodes to well-formed Event XML."""
    import xml.etree.ElementTree as ET
    from nifi_spark.operators.evtx import (BinXmlResidentRef,
                                           _walk_records,
                                           decode_binxml,
                                           decode_binxml_in_chunk,
                                           evtx_chunk_status)
    blob = open(REF_EVTX, "rb").read()
    st = {s["chunk"]: (s["status"], s["n_records"])
          for s in evtx_chunk_status(blob)}
    assert st[1] == ("bad_header", 0)        # data checksum fails
    assert st[2] == ("bad_records", 5)       # stream breaks after 5
    assert all(st[c][0] == "ok" for c in range(3, 11))
    assert len(st) == 10                     # current chunk skipped
    n = 0
    for ci, rid, ft, payload, chunk, poff in _walk_records(blob):
        try:
            xml = decode_binxml(payload)
        except BinXmlResidentRef:
            xml = decode_binxml_in_chunk(chunk, poff)
        root = ET.fromstring(xml)
        assert root.tag.endswith("Event")
        # their validateFlowFiles: every Event has exactly 2 children
        assert len(root) == 2, xml[:200]
        n += 1
    assert n == 960


def test_parse_evtx_chunks_statuses(spark):
    """Synthetic bad-chunk routing: corrupting one data byte flips that
    chunk to bad_header (data CRC); garbling a record's trailing size
    copy flips it to bad_records keeping the records before the
    break."""
    from nifi_spark.operators import build_evtx, parse_evtx_chunks
    from nifi_spark.operators.evtx import CHUNK_HEADER_SIZE, CHUNK_SIZE

    def recs(lo, hi):
        return [(i, 1_700_000_000_000_000 + i, b"x" * 2000)
                for i in range(lo, hi)]

    # ~2030 bytes/record -> 32 records/chunk; 90 records = 3 chunks
    blob = bytearray(build_evtx(recs(1, 91)))
    # corrupt one payload byte in chunk 2 (data CRC now fails)
    blob[4096 + CHUNK_SIZE + CHUNK_HEADER_SIZE + 100] ^= 0xFF
    # break chunk 3's SECOND record: garble its magic, then re-patch
    # both CRCs (the real file's broken chunk carries a VALID checksum
    # over its garbage — the writer checksummed what it wrote)
    import zlib
    c3 = 4096 + 2 * CHUNK_SIZE
    rec_size = struct.unpack_from("<I", blob, c3 + CHUNK_HEADER_SIZE + 4)[0]
    blob[c3 + CHUNK_HEADER_SIZE + rec_size] ^= 0xFF
    next_rec = struct.unpack_from("<I", blob, c3 + 48)[0]
    struct.pack_into(
        "<I", blob, c3 + 52,
        zlib.crc32(bytes(blob[c3 + CHUNK_HEADER_SIZE:c3 + next_rec]))
        & 0xFFFFFFFF)
    struct.pack_into(
        "<I", blob, c3 + 124,
        zlib.crc32(bytes(blob[c3:c3 + 120])
                   + bytes(blob[c3 + 128:c3 + 512])) & 0xFFFFFFFF)
    df = spark.createDataFrame([(7, bytes(blob))],
                               "src_id long, content binary")
    rows = {(r["chunk"]): (r["status"], r["n_records"])
            for r in parse_evtx_chunks(df, "content", "src_id").collect()}
    n_per = struct.unpack_from("<Q", bytes(blob), 4096 + 16)[0]  # last id c1
    assert rows[1] == ("ok", int(n_per))
    assert rows[2] == ("bad_header", 0)
    assert rows[3] == ("bad_records", 1)
