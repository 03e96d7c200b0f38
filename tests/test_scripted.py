"""Scripted processors: ExecuteScript / InvokeScriptedProcessor analogs
(plans/scripted.py) + template compilation of script nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.plans import (ScriptedProcessor, ScriptError,
                              compile_script, compile_script_properties,
                              load_template, register_processor)
from nifi_spark.plans.scripted import clear_registry


@pytest.fixture
def ev(spark):
    return spark.createDataFrame(
        [(1, "error", 20.0), (2, "click", 1.0), (3, "view", 16.0),
         (4, "error", 2.0)],
        "id long, et string, v double")


def test_execute_script_form_routes(ev):
    proc = compile_script("""
def process(df):
    scored = df.withColumn("score", F.col("v") * 2)
    return {"success": scored.filter(F.col("score") >= 10),
            "failure": scored.filter(F.col("score") < 10)}
""")
    out = proc(ev)
    assert {r.id for r in out["success"].collect()} == {1, 3}
    assert {r.id for r in out["failure"].collect()} == {2, 4}


def test_execute_script_bare_dataframe_is_success(ev):
    proc = compile_script("def process(df):\n    return df.limit(1)\n")
    out = proc(ev)
    assert list(out) == ["success"]
    assert out["success"].count() == 1


def test_execute_script_rejects_undeclared_relationship(ev):
    proc = compile_script(
        "def process(df):\n    return {'weird': df}\n")
    with pytest.raises(ScriptError, match="undeclared"):
        proc(ev)


def test_invoke_scripted_processor_form(ev):
    proc = compile_script("""
def split(df):
    return {"errors": df.filter(F.col("et") == "error"),
            "rest": df.filter(F.col("et") != "error")}

processor = ScriptedProcessor("splitter", split,
                              relationships=["errors", "rest"])
""")
    out = proc(ev)
    assert {r.id for r in out["errors"].collect()} == {1, 4}
    assert {r.id for r in out["rest"].collect()} == {2, 3}


def test_dynamic_properties_bind_into_namespace(ev):
    proc = compile_script_properties({
        "Script Body": ("def process(df):\n"
                        "    return df.filter(F.col('et') == wanted)\n"),
        "Script Engine": "python",
        "wanted": "click",
    })
    assert {r.id for r in proc(ev)["success"].collect()} == {2}


def test_engine_and_property_validation():
    with pytest.raises(ScriptError, match="not supported"):
        compile_script("def process(df): return df", engine="Groovy")
    with pytest.raises(ScriptError, match="exactly one of"):
        compile_script_properties({"Script Engine": "python"})
    with pytest.raises(ScriptError, match="exactly one of"):
        compile_script_properties({"Script Body": "x=1",
                                   "Script File": "a.py"})
    with pytest.raises(ScriptError, match="script_resolver"):
        compile_script_properties({"Script File": "a.py"})
    with pytest.raises(ScriptError, match="does not compile"):
        compile_script("def process(df:\n")
    with pytest.raises(ScriptError, match="must define process"):
        compile_script("x = 1")
    with pytest.raises(ScriptError, match="ScriptedProcessor instance"):
        compile_script("processor = 42")


def test_script_file_via_resolver(ev):
    files = {"scripts/route.py":
             "def process(df):\n    return df.filter(F.col('v') > 10)\n"}
    proc = compile_script_properties(
        {"Script File": "scripts/route.py"},
        script_resolver=files.__getitem__)
    assert {r.id for r in proc(ev)["success"].collect()} == {1, 3}


_TEMPLATE = """<template><name>scripted</name><snippet>
<processors><id>p1</id><name>gen</name>
  <type>org.apache.nifi.processors.standard.GenerateFlowFile</type>
  <config><properties/></config></processors>
<processors><id>p2</id><name>score</name>
  <type>org.apache.nifi.processors.script.ExecuteScript</type>
  <config><properties>
    <entry><key>Script Engine</key><value>python</value></entry>
    <entry><key>Script Body</key><value>
def process(df):
    scored = df.withColumn("score", F.col("v") * 2)
    return {"success": scored.filter(F.col("score") &gt;= 10),
            "failure": scored.filter(F.col("score") &lt; 10)}
</value></entry>
  </properties></config></processors>
<processors><id>p3</id><name>custom</name>
  <type>com.example.MyCustomProcessor</type>
  <config><properties/></config></processors>
<connections><source><id>p1</id></source>
  <destination><id>p2</id></destination></connections>
<connections><source><id>p2</id></source>
  <destination><id>p3</id></destination>
  <selectedRelationships>success</selectedRelationships></connections>
</snippet></template>"""


def test_template_compiles_script_and_registered_nodes(spark, ev):
    clear_registry()
    register_processor(ScriptedProcessor(
        "custom",
        lambda df: {"out": df.groupBy("et").agg(
            F.count(F.lit(1)).alias("n"))},
        relationships=["out"]))
    try:
        flow = load_template(_TEMPLATE, sources={"gen": ev})
        out = flow.run()
        assert {r.id for r in out["score.failure"].collect()} == {2, 4}
        got = {(r.et, r.n) for r in out["custom.out"].collect()}
        assert got == {("error", 1), ("view", 1)}
    finally:
        clear_registry()


def test_template_unknown_type_still_errors_when_unregistered(spark, ev):
    clear_registry()
    from nifi_spark.plans import TemplateError
    bad = _TEMPLATE.replace("com.example.MyCustomProcessor",
                            "com.example.SomethingElse")
    with pytest.raises(TemplateError, match="unsupported"):
        load_template(bad, sources={"gen": ev})
