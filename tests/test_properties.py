"""Property-based roundtrip/equivalence checks (hypothesis).

Each property batches its random cases into ONE DataFrame so a property
costs one Spark job, not one per example — the randomized complement to
the fixed-seed oracle tests (SURVEY.md §5: the reference's tests are
example-based; properties cover the input space the examples can't).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nifi_spark.functions import EL
from nifi_spark.operators import (compress_content, decode_content,
                                  encode_content, latest_wins,
                                  merge_defragment, segment_content)

SET = settings(deadline=None, max_examples=8,
               suppress_health_check=list(HealthCheck))

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8",
                           exclude_categories=("Cs",)),
    min_size=0, max_size=300)


@SET
@given(st.lists(text_strategy, min_size=1, max_size=12),
       st.integers(min_value=1, max_value=64))
def test_segment_defragment_roundtrip_property(spark, texts, seg):
    # non-empty docs only: a zero-length doc has zero fragments and
    # legitimately vanishes (NiFi emits no segment for empty content)
    rows = [(i, t) for i, t in enumerate(texts) if t]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    frags = segment_content(df, "text", seg, id_cols=["doc_id"])
    merged = merge_defragment(frags, "fragment", sep="")
    back = {r.doc_id: r.content
            for r in frags.select("doc_id", "fragment_id").distinct()
            .join(merged, "fragment_id").collect()}
    assert back == {i: t for i, t in rows}


@SET
@given(st.lists(st.binary(min_size=0, max_size=500),
                min_size=1, max_size=10))
def test_codec_roundtrips_property(spark, blobs):
    df = spark.createDataFrame([(i, bytearray(b)) for i, b in
                                enumerate(blobs)],
                               "id long, payload binary")
    gz = compress_content(df, "payload", "gzip", out_col="c")
    back = compress_content(gz, "c", "gzip", mode="decompress",
                            out_col="d")
    b64 = decode_content(encode_content(df, "payload", "base64",
                                        out_col="b"),
                         "b", "base64", out_col="e")
    got = {r.id: (bytes(r.d), bytes(r.e)) for r in
           back.join(b64.select("id", "e"), "id").collect()}
    for i, b in enumerate(blobs):
        assert got[i] == (b, b), i


@SET
@given(st.lists(text_strategy, min_size=1, max_size=10))
def test_el_escape_roundtrips_property(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "id long, t string")
    out = df.select(
        "id",
        EL.unescapeJson(EL.escapeJson("t")).alias("j"),
        EL.unescapeXml(EL.escapeXml("t")).alias("x"))
    got = {r.id: (r.j, r.x) for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == (t, t), (i, t)


@SET
@given(st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 50), st.text(max_size=10)),
    min_size=1, max_size=40))
def test_latest_wins_matches_python(spark, rows):
    df = spark.createDataFrame([(k, s, v) for k, s, v in rows],
                               "key int, seq int, v string")
    got = {r.key: (r.seq, r.v)
           for r in latest_wins(df, ["key"], "seq").collect()}
    expect = {}
    for k, s, v in rows:
        if k not in expect or s > expect[k][0]:
            expect[k] = (s, v)
    # ties on seq: max_by picks an arbitrary copy — compare seq only,
    # and values when the winning seq is unique
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        if sum(1 for kk, ss, _ in rows
               if kk == k and ss == expect[k][0]) == 1:
            assert got[k][1] == expect[k][1]


@SET
@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=40, unique=True),
       st.lists(st.integers(min_value=1, max_value=50),
                min_size=2, max_size=4))
def test_dataset_split_partition_property(spark, ids, weights):
    """Every row lands in exactly one split; membership matches the
    portable-hash bucket arithmetic for ANY weights vector."""
    from nifi_spark.datalib import dataset_split
    from nifi_spark.functions.portable_hash import portable_hash64_py
    names = [f"s{i}" for i in range(len(weights))]
    w = dict(zip(names, weights))
    total = sum(weights)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.split
           for r in dataset_split(df, "doc_id", weights=w).collect()}
    assert set(got) == set(ids)
    for did in ids:
        b = portable_hash64_py(str(did)) % total
        acc = 0
        for nm, wt in w.items():
            acc += wt
            if b < acc:
                assert got[did] == nm
                break


@SET
@given(st.lists(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False, allow_infinity=False,
                                   width=32),
                         min_size=1, max_size=16),
                min_size=1, max_size=12))
def test_quantize_int8_property(spark, vecs):
    """Quantized ints match the python oracle and stay within ±127 for
    arbitrary finite float vectors (incl. all-zero)."""
    import math

    from nifi_spark.datalib import quantize_int8
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: (list(r.qvec), r.qscale)
           for r in quantize_int8(df, "vec_id", "embedding").collect()}
    for i, v in enumerate(vecs):
        s = max(abs(float(x)) for x in v)
        q, gs = got[i]
        assert gs == s
        if s == 0:
            assert q == [0] * len(v)
        else:
            expect = [math.floor(float(x) / s * 127.0 + 0.5) for x in v]
            assert q == expect
            assert all(-127 <= e <= 127 for e in q)


@given(st.dictionaries(
    st.text(min_size=1, max_size=20), st.text(max_size=200), max_size=6),
    st.binary(max_size=2000))
@settings(max_examples=60, deadline=None)
def test_flowfile_pack_roundtrip_property(attrs, content):
    """pack→unpack is the identity for every attr dict / content blob,
    across all three FlowFile package versions (pure codec, no Spark)."""
    from nifi_spark.operators.flowfile_pack import (
        pack_v1, pack_v2, pack_v3, unpack_v1, unpack_v2, unpack_v3)
    for pack, unpack in ((pack_v2, unpack_v2), (pack_v3, unpack_v3)):
        assert unpack(pack(attrs, content)) == [(attrs, content)]
    # v1 XML-escapes through ElementTree; control chars below 0x20 are
    # not representable in XML 1.0 text, so restrict that leg
    if all("\x00" <= ch and ch >= " " or ch in "\t\n"
           for kv in attrs.items() for ch in kv[0] + kv[1]):
        assert unpack_v1(pack_v1(attrs, content)) == [(attrs, content)]


@given(st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=10),
       st.sampled_from([1, 3, 4]),
       st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, channels, rng):
    """encode_png→decode_png is the identity on arbitrary rasters."""
    from nifi_spark.datalib import media_codec as mc
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    assert mc.decode_png(mc.encode_png(w, h, channels, px)) == \
        (w, h, channels, px)


@SET
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60))
def test_connected_components_matches_union_find_property(spark, edges):
    from nifi_spark.datalib import connected_components
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    # union-find ground truth with min-id labels
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    exp = {n: min(ns) for ns in groups.values() for n in ns}
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8",
                                      exclude_categories=("Cs",)),
               max_size=200))
def test_html_escape_roundtrip_property(s):
    # pure-python engine functions: cheap enough for many examples
    from nifi_spark.functions.el import (_HTML3_ESCAPE, _HTML3_NAMES,
                                         _HTML4_ESCAPE, _HTML4_NAMES,
                                         unescape_html)
    esc4 = s.translate(_HTML4_ESCAPE)
    assert unescape_html(esc4, _HTML4_NAMES) == s
    esc3 = s.translate(_HTML3_ESCAPE)
    assert unescape_html(esc3, _HTML3_NAMES) == s


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.sampled_from(list('ab,"\r\n')), max_size=20))
def test_csv_escape_roundtrip_property(s):
    """commons CsvEscaper/CsvUnescaper compose to identity for every
    string over the CSV special alphabet."""
    from nifi_spark.functions.el import unescape_csv
    special = any(c in s for c in ',"\r\n')
    esc = '"' + s.replace('"', '""') + '"' if special else s
    assert unescape_csv(esc) == s
