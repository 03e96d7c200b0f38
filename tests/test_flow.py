"""Flow DAG builder: wiring, named relationships, laziness, errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_spark.operators import route_on_attribute
from nifi_spark.plans import Flow, FlowError


def test_flow_route_and_join(spark):
    ev = spark.createDataFrame(
        [(1, "error", 20.0), (2, "click", 1.0), (3, "view", 16.0)],
        "id long, et string, v double")

    flow = (Flow("demo")
            .source("tail", lambda: ev)
            .add("route", lambda df: route_on_attribute(df, {
                "errors": F.col("et") == "error",
                "high": F.col("v") >= 15.0,
            }), inputs="tail")
            .add("tag_err", lambda df: df.withColumn("sev", F.lit("E")),
                 inputs="route.errors")
            .add("tag_high", lambda df: df.withColumn("sev", F.lit("H")),
                 inputs="route.high")
            .add("funnel", lambda a, b: a.unionByName(b),
                 inputs=["tag_err", "tag_high"]))
    out = flow.run()
    rows = {(r.id, r.sev) for r in out["funnel"].collect()}
    assert rows == {(1, "E"), (3, "H")}
    assert {r.id for r in out["route.unmatched"].collect()} == {2}


def test_flow_errors(spark):
    ev = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(FlowError, match="duplicate"):
        Flow().source("a", lambda: ev).source("a", lambda: ev)
    with pytest.raises(FlowError, match="unknown input"):
        Flow().add("b", lambda df: df, inputs="missing").run()
    with pytest.raises(FlowError, match="not produced"):
        (Flow().source("a", lambda: ev)
         .add("b", lambda df: df, inputs="a.nope").run())
    with pytest.raises(FlowError, match="cycle"):
        (Flow().add("x", lambda df: df, inputs="y")
         .add("y", lambda df: df, inputs="x").run())
