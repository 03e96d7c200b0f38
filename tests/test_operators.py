"""Per-operator unit tests — the TestRunner/MockProcessSession pattern
(nifi-mock/src/main/java/org/apache/nifi/util/TestRunner.java:245-324:
enqueue → run → assertAllFlowFilesTransferred/assertTransferCount), with a
local SparkSession as the mock framework."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.functions import EL, portable_hash64
from nifi_spark.functions.portable_hash import portable_hash64_py
from nifi_spark.operators import (attributes_to_json, bin_pack, control_rate,
                                  detect_duplicate, distribute_load,
                                  extract_text, hash_content, latest_wins,
                                  merge_defragment, monitor_activity,
                                  prioritize, replace_text, route_on_attribute,
                                  route_on_content, route_text, scan_attribute,
                                  segment_content, split_text, update_columns)
from nifi_spark.operators.attributes import update_with_rules
from nifi_spark.operators.content import replace_text_line_by_line
from nifi_spark.operators.distribute import salt_keys


@pytest.fixture(scope="module")
def files(spark):
    rows = [("f1", "a.py", "python", "import os\nprint('hi')", 3),
            ("f2", "b.java", "java", "class B {}\n// todo", 7),
            ("f3", "c.py", "python", "def f():\n    return 1", 1),
            ("f4", "d.md", "markdown", "# title\nsome text", 9)]
    return spark.createDataFrame(
        rows, "name string, path string, lang string, content string, priority int")


# ---------------- routing ----------------

def test_route_on_attribute_exclusive(files):
    out = route_on_attribute(files, {
        "py": F.col("lang") == "python",
        "jvm": F.col("lang").isin("java", "scala")})
    assert out["py"].count() == 2
    assert out["jvm"].count() == 1
    assert out["unmatched"].count() == 1
    # exclusive: partitions the input
    total = sum(df.count() for df in out.values())
    assert total == files.count()


def test_route_on_attribute_all_matches(files):
    # overlapping: a row can reach multiple relationships (RouteOnAttribute
    # Route-to-Property-Name semantics, RouteOnAttribute.java:52-93)
    out = route_on_attribute(files, {
        "small": F.col("priority") < 8,
        "py": F.col("lang") == "python"}, strategy="all_matches")
    assert out["small"].count() == 3
    assert out["py"].count() == 2
    assert out["unmatched"].count() == 1  # f4: priority 9, markdown


def test_route_any_all_match(files):
    any_m = route_on_attribute(files, {
        "a": F.col("lang") == "python", "b": F.col("priority") > 8},
        strategy="any_match")
    assert any_m["matched"].count() == 3
    all_m = route_on_attribute(files, {
        "a": F.col("lang") == "python", "b": F.col("priority") < 2},
        strategy="all_match")
    assert all_m["matched"].count() == 1


def test_route_text_lines(files):
    routed = route_text(files, "content",
                        {"imports": F.col("line").startswith("import"),
                         "comments": F.col("line").startswith("//")})
    pdf = routed.toPandas()
    assert len(pdf) == 8  # every file has 2 lines
    assert (pdf["route"] == "imports").sum() == 1
    assert (pdf["route"] == "comments").sum() == 1
    assert set(pdf.columns) >= {"line_index", "line", "route"}


def test_route_on_content(files):
    out = route_on_content(files, "content", {"has_def": r"def \w+",
                                              "has_class": r"class \w+"})
    assert out["has_def"].count() == 1
    assert out["has_class"].count() == 1


def test_scan_attribute(spark, files):
    dictionary = spark.createDataFrame([("python",), ("go",)], "term string")
    hit = scan_attribute(files, "lang", dictionary, "term")
    miss = scan_attribute(files, "lang", dictionary, "term", mode="unmatched")
    assert hit.count() == 2 and miss.count() == 2


# ---------------- attributes ----------------

def test_update_columns_and_el(files):
    out = update_columns(files, {
        "ext": EL.substringAfterLast("path", "."),
        "upper_lang": EL.toUpper("lang"),
        "has_todo": EL.contains("content", "todo")}, delete=["priority"])
    pdf = out.toPandas().set_index("name")
    assert pdf.loc["f1", "ext"] == "py"
    assert pdf.loc["f2", "upper_lang"] == "JAVA"
    assert bool(pdf.loc["f2", "has_todo"]) is True
    assert "priority" not in pdf.columns


def test_el_extended_surface(files):
    """Round-2 EL additions: boolean combinators, math dispatch,
    substringBeforeLast, attribute base64, numberToDate, NiFi-spelled
    aliases (lexer :104-188; MathEvaluator.java,
    SubstringBeforeLastEvaluator.java:45-52)."""
    out = update_columns(files, {
        "both": EL.and_(EL.startsWith("path", "a"), EL.equals("lang", "python")),
        "either": EL.or_(EL.equals("lang", "java"), EL.equals("lang", "markdown")),
        "neg": EL.not_(EL.contains("content", "todo")),
        "dir_part": EL.substringBeforeLast("path", "."),
        "b64": EL.base64Decode(EL.base64Encode("lang")),
        "prio_sq": EL.math("pow", "priority", 2),
        "prio_abs": EL.math("abs", EL.minus("priority", 5)),
        "prio_max": EL.math("max", "priority", 4),
        "as_str": EL.toString("priority"),
        "ts": EL.numberToDate(EL.multiply("priority", 1000)),
    })
    pdf = out.toPandas().set_index("name")
    assert bool(pdf.loc["f1", "both"]) and not bool(pdf.loc["f2", "both"])
    assert bool(pdf.loc["f2", "either"]) and not bool(pdf.loc["f1", "either"])
    assert not bool(pdf.loc["f2", "neg"]) and bool(pdf.loc["f1", "neg"])
    assert pdf.loc["f1", "dir_part"] == "a"
    assert pdf.loc["f2", "b64"] == "java"
    assert pdf.loc["f2", "prio_sq"] == 49.0
    assert pdf.loc["f3", "prio_abs"] == 4
    assert pdf.loc["f3", "prio_max"] == 4 and pdf.loc["f2", "prio_max"] == 7
    assert pdf.loc["f4", "as_str"] == "9"
    assert pdf.loc["f2", "ts"].isoformat().startswith("1970-01-01T00:00:07")
    with pytest.raises(ValueError):
        EL.math("nope", "priority")


def test_el_substring_before_last_absent_and_aliases(files):
    out = update_columns(files, {
        "whole": EL.substringBeforeLast("lang", "/"),   # sep absent → subject
        "in_set": getattr(EL, "in")("lang", "python", "go"),
        "fmt": getattr(EL, "format")(EL.numberToDate(F.lit(0)), "yyyy-MM-dd"),
    })
    pdf = out.toPandas().set_index("name")
    assert pdf.loc["f2", "whole"] == "java"
    assert bool(pdf.loc["f1", "in_set"]) and not bool(pdf.loc["f2", "in_set"])
    assert pdf.loc["f1", "fmt"] == "1970-01-01"
    # aggregate alias: count (CountEvaluator)
    assert files.agg(EL.count("name").alias("n")).collect()[0]["n"] == 4


def test_el_matching_attribute_folds(files):
    out = update_columns(files, {
        "any_txt": EL.anyMatchingAttribute(
            files, "(lang|content)", lambda c: F.contains(c, F.lit("todo"))),
        "all_nonempty": EL.allMatchingAttributes(
            files, "(name|path)", lambda c: F.length(c) > 0),
        "no_match": EL.anyMatchingAttribute(
            files, "zzz.*", lambda c: F.lit(True)),
    })
    pdf = out.toPandas().set_index("name")
    assert bool(pdf.loc["f2", "any_txt"]) and not bool(pdf.loc["f1", "any_txt"])
    assert bool(pdf.loc["f1", "all_nonempty"])
    assert not bool(pdf.loc["f1", "no_match"])


def test_update_with_rules(files):
    out = update_with_rules(files, [
        (F.col("lang") == "python", {"tier": F.lit("first")}),
        (F.col("priority") > 5, {"tier": F.lit("second")}),
    ], default={"tier": F.lit("rest")})
    pdf = out.toPandas().set_index("name")["tier"]
    assert pdf["f1"] == "first" and pdf["f3"] == "first"
    assert pdf["f2"] == "second" and pdf["f4"] == "second"


def test_attributes_to_json_and_hash(files):
    out = attributes_to_json(hash_content(files), ["name", "lang"])
    row = out.filter(F.col("name") == "f1").collect()[0]
    assert '"name":"f1"' in row["json"]
    import hashlib
    assert row["content_sha256"] == hashlib.sha256(
        "import os\nprint('hi')".encode()).hexdigest()


# ---------------- content ----------------

def test_replace_extract_segment(files):
    out = replace_text(files, "content", r"import (\w+)", r"require($1)")
    assert "require(os)" in out.filter(F.col("name") == "f1").collect()[0]["content"]
    out2 = replace_text_line_by_line(files, "content", r"^#\s*", "H1: ")
    assert out2.filter(F.col("name") == "f4").collect()[0]["content"].startswith("H1: title")
    out3 = extract_text(files, "content", {"first_word": (r"^(\w+)", 1)})
    assert out3.filter(F.col("name") == "f3").collect()[0]["first_word"] == "def"
    seg = segment_content(files, "content", 8, id_cols=["name"])
    f1 = seg.filter(F.col("name") == "f1").orderBy("fragment_index").collect()
    assert "".join(r["fragment"] for r in f1) == "import os\nprint('hi')"
    assert f1[0]["fragment_count"] == len(f1)


def test_split_and_defragment_roundtrip(files):
    frags = split_text(files, "content", id_cols=["name"])
    merged = merge_defragment(frags)
    back = merged.toPandas()
    orig = files.toPandas()
    assert sorted(back["content"]) == sorted(orig["content"])
    assert back["complete"].all()


def test_defragment_incomplete_held(files):
    frags = split_text(files, "content", id_cols=["name"])
    # drop one fragment → that group is incomplete (MergeContent Defragment
    # holds it; we drop or flag it)
    damaged = frags.filter(~((F.col("name") == "f1") & (F.col("fragment_index") == 0)))
    merged = merge_defragment(damaged)
    assert merged.count() == 3
    flagged = merge_defragment(damaged, require_complete=False)
    assert flagged.count() == 4
    assert flagged.filter(~F.col("complete")).count() == 1


# ---------------- dedup ----------------

def test_detect_duplicate(spark):
    df = spark.createDataFrame(
        [("k1", 1, "a"), ("k1", 2, "b"), ("k2", 3, "c"), ("k2", 5, "d")],
        "key string, seq long, v string")
    out = detect_duplicate(df, ["key"], "seq")
    assert out["non_duplicate"].count() == 2
    assert {r["v"] for r in out["non_duplicate"].collect()} == {"a", "c"}
    seen = spark.createDataFrame([("k2",)], "key string")
    out2 = detect_duplicate(df, ["key"], "seq", seen=seen)
    assert {r["v"] for r in out2["non_duplicate"].collect()} == {"a"}
    assert out2["duplicate"].count() == 3


def test_latest_wins(spark):
    df = spark.createDataFrame(
        [("k1", 1, "old"), ("k1", 9, "new"), ("k2", 2, "only")],
        "key string, seq long, v string")
    out = latest_wins(df, ["key"], "seq").toPandas().set_index("key")
    assert out.loc["k1", "v"] == "new" and out.loc["k2", "v"] == "only"


# ---------------- distribute / rate ----------------

def test_distribute_load_weighted_ordered(spark):
    df = spark.range(100).withColumnRenamed("id", "seq")
    out = distribute_load(df, {"w80": 8, "w20": 2}, order_col="seq",
                          strategy="ordered")
    counts = {r["destination"]: r["count"] for r in
              out.groupBy("destination").count().collect()}
    assert counts == {"w80": 80, "w20": 20}


def test_distribute_load_weighted_hash(spark):
    # default scale path: stateless hash slots — deterministic, and
    # proportions converge to the weights (exactness is statistical,
    # matching DistributeLoad's per-node round-robin)
    df = spark.range(2000).withColumnRenamed("id", "seq")
    out = distribute_load(df, {"w80": 8, "w20": 2}, order_col="seq")
    counts = {r["destination"]: r["count"] for r in
              out.groupBy("destination").count().collect()}
    assert counts == {r["destination"]: r["count"] for r in
                      distribute_load(df, {"w80": 8, "w20": 2},
                                      order_col="seq")
                      .groupBy("destination").count().collect()}
    assert 0.7 < counts["w80"] / 2000 < 0.9
    assert counts["w80"] + counts["w20"] == 2000


def test_salt_keys_spread(spark):
    df = spark.createDataFrame([("hot",)] * 1000, "key string")
    out = salt_keys(df, "key", 8)
    n = out.select("_salt").distinct().count()
    assert n == 8  # hot key spread over all salt values


def test_prioritize(files):
    newest = prioritize(files, "newest_first", ts_col="priority").collect()
    assert newest[0]["name"] == "f4"
    pri = prioritize(files, "priority_attribute", ts_col="name").collect()
    assert pri[0]["name"] == "f3"


def test_control_rate_and_monitor(spark):
    df = spark.range(25).withColumnRenamed("id", "seq")
    out = control_rate(df, "seq", rows_per_batch=10)
    counts = dict(out.groupBy("batch_id").count().orderBy("batch_id")
                  .collect())
    assert counts == {0: 10, 1: 10, 2: 5}
    assert monitor_activity([5, 0, 0, 0, 7], inactive_after=3) == \
        ["active", "active", "active", "inactive", "activity.restored"]


def test_bin_pack_partitions(files):
    packed = bin_pack(files, n_bins=1)
    assert packed.rdd.getNumPartitions() == 1
    by_key = bin_pack(files, correlation_col="lang", n_bins=2)
    assert by_key.rdd.getNumPartitions() == 2


# ---------------- portable hash ----------------

def test_portable_hash_matches_python_and_duckdb(spark):
    import duckdb
    vals = ["abc", "nifi", "spark/x", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", portable_hash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == portable_hash64_py(v)
        duck = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{v}'), 1, 15))::BIGINT").fetchone()[0]
        assert got[v] == duck


def test_hash_attribute_group_key(spark):
    from nifi_spark.operators import hash_attribute
    df = spark.createDataFrame([("a", "x"), ("a", "x"), ("b", "y")],
                               "c1 string, c2 string")
    out = hash_attribute(df, ["c1", "c2"]).toPandas()
    assert out["group_key"].nunique() == 2          # same attrs → same key
    assert (out["group_key"].str.len() == 64).all()  # sha256 hex


def test_route_tag_first_match_wins(spark):
    from pyspark.sql import functions as F
    from nifi_spark.operators import route_tag
    df = spark.createDataFrame([(5,), (15,), (50,)], "v int")
    out = {r.v: r.route for r in route_tag(df, {
        "small": F.col("v") < 10,
        "medium": F.col("v") < 20,   # 15 matches both; 'small' checked first
        }).collect()}
    assert out[5] == "small" and out[15] == "medium"
    assert out[50] == "unmatched"


def test_repartition_by_key_range_ordering(spark):
    from pyspark.sql import functions as F
    from nifi_spark.operators import repartition_by_key_range
    df = spark.range(1000).withColumnRenamed("id", "k")
    rp = repartition_by_key_range(df, 4, "k").withColumn(
        "pid", F.spark_partition_id())
    bounds = (rp.groupBy("pid").agg(F.min("k").alias("lo"),
                                    F.max("k").alias("hi"))
              .orderBy("pid").collect())
    for a, b in zip(bounds, bounds[1:]):  # ranges are ordered and disjoint
        assert a.hi < b.lo


def test_execute_stream_command_lines(spark):
    from pyspark.sql import functions as F
    from nifi_spark.operators import execute_stream_command
    df = spark.createDataFrame([(1, "hello"), (2, "WoRld"), (3, "x y z")],
                               "id long, content string")
    out = execute_stream_command(df, "content",
                                 ["tr", "a-z", "A-Z"]).toPandas()
    got = dict(zip(out["id"], out["stdout"]))
    assert got == {1: "HELLO", 2: "WORLD", 3: "X Y Z"}


def test_execute_stream_command_whole_and_newline_guard(spark):
    import pytest as _pt
    from nifi_spark.operators import execute_stream_command
    df = spark.createDataFrame([(1, "a\nb")], "id long, content string")
    with _pt.raises(Exception):
        execute_stream_command(df, "content", ["cat"]).collect()
    out = execute_stream_command(df, "content", ["wc", "-l"],
                                 mode="whole").collect()
    assert out[0].stdout.strip() == "1"   # one newline in "a\nb"


def test_update_columns_el_strings(spark):
    from nifi_spark.operators import update_columns
    df = spark.createDataFrame([("a/b/c.txt", "go")], "path string, lang string")
    out = update_columns(df, {
        "fname": "${path:substringAfterLast('/')}",
        "tag": "lang=${lang:toUpper()}",
        "static": "just text",
    }).first()
    assert out.fname == "c.txt"
    assert out.tag == "lang=GO"
    assert out.static == "just text"


def test_route_on_attribute_el_strings(spark):
    from nifi_spark.operators import route_on_attribute
    df = spark.createDataFrame([(5, "go"), (150, "py"), (80, "go")],
                               "value long, lang string")
    out = route_on_attribute(df, {
        "big": "${value:gt(100)}",
        "golang": "${lang:equals('go')}",
    })
    assert {r.value for r in out["big"].collect()} == {150}
    assert {r.value for r in out["golang"].collect()} == {5, 80}
    assert out["unmatched"].count() == 0


def test_scan_content_substring_and_token_modes(spark):
    """Byte-level ScanContent: substring terms match INSIDE words (the
    reference's Aho-Corasick semantics); token mode requires whole-word
    membership; binary columns match on raw bytes."""
    from nifi_spark.operators import scan_content
    df = spark.createDataFrame(
        [(1, "the merging of partitions"), (2, "nothing relevant"),
         (3, "merge")], "id long, text string")
    d = spark.createDataFrame([("merg",), ("rti",)], "term string")
    sub = {r.id: (list(r.matched_terms), r.matched)
           for r in scan_content(df, "text", d).collect()}
    assert sub[1] == (["merg", "rti"], True)   # inside 'merging'/'partitions'
    assert sub[2] == ([], False)
    assert sub[3] == (["merg"], True)
    tok = {r.id: list(r.matched_terms)
           for r in scan_content(df, "text", d, mode="token").collect()}
    assert tok == {1: [], 2: [], 3: []}        # no whole-word hits
    d2 = spark.createDataFrame([("merge",)], "term string")
    tok2 = {r.id: r.matched
            for r in scan_content(df, "text", d2, mode="token").collect()}
    assert tok2 == {1: False, 2: False, 3: True}
    # binary content
    from pyspark.sql import functions as F
    bdf = df.select("id", F.encode("text", "utf-8").alias("payload"))
    bd = spark.createDataFrame([(b"merg",)], "term binary")
    got = {r.id: r.matched
           for r in scan_content(bdf, "payload", bd).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_execute_process_source_mode(spark):
    """ExecuteProcess source analog: whole-stdout single row, row-count
    batching, and non-zero exit raising."""
    import subprocess

    import pytest as _pt
    from nifi_spark.operators import execute_process
    one = execute_process(spark, ["printf", "a\nb\nc\n"]).collect()
    assert len(one) == 1 and one[0].content == "a\nb\nc\n"
    batched = execute_process(spark, ["seq", "1", "7"],
                              batch_duration_rows=3).collect()
    got = {r.part: r.content for r in batched}
    assert got == {0: "1\n2\n3", 1: "4\n5\n6", 2: "7"}
    with _pt.raises(subprocess.CalledProcessError):
        execute_process(spark, ["false"])


def test_invoke_http_routing_and_body(spark):
    """InvokeHTTP relationship routing (2xx/5xx/4xx/exception) and the
    request-body path, over an injectable transport."""
    from nifi_spark.operators import invoke_http, route_http_response
    seen = {}

    def transport(url, method, body):
        i = int(url.rsplit("/", 1)[1])
        if i == 3:
            raise TimeoutError("boom")
        if i == 2:
            return 500, b"err"
        if i == 1:
            return 301, b"moved"
        return 200, b"ok:" + (body or b"-")

    df = spark.createDataFrame(
        [(i, f"http://x/{i}", f"b{i}") for i in range(4)],
        "id long, url string, payload string")
    out = invoke_http(df, "url", method="POST", body_col="payload",
                      transport=transport)
    rows = {r.id: r for r in out.collect()}
    assert rows[0].status_code == 200
    assert bytes(rows[0].response_body) == b"ok:b0"  # body reached POST
    assert rows[1].status_code == 301
    assert rows[2].status_code == 500
    assert rows[3].status_code == -1
    assert "TimeoutError" in rows[3].error and rows[3].response_body is None
    routed = route_http_response(out)
    assert {r.id for r in routed["response"].collect()} == {0}
    assert {r.id for r in routed["retry"].collect()} == {2}
    assert {r.id for r in routed["no_retry"].collect()} == {1}
    assert {r.id for r in routed["failure"].collect()} == {3}
    assert {r.id for r in routed["original"].collect()} == {0}
