"""Get/Modify/PutHTMLElement analogs (operators/html_ops.py) vs the
reference's own Weather.html expectations (TestGetHTMLElement.java)."""

import os

import pytest

from nifi_spark.operators.html_ops import (get_html_element,
                                           modify_html_element, parse_html,
                                           put_html_element, select)

WEATHER = ("/root/reference/nifi-nar-bundles/nifi-html-bundle/"
           "nifi-html-processors/src/test/resources/Weather.html")
ref_present = pytest.mark.skipif(not os.path.isfile(WEATHER),
                                 reason="reference checkout not present")


@ref_present
def test_reference_weather_expectations():
    root = parse_html(open(WEATHER).read())
    assert len(select(root, "a")) == 3          # testRunner: 3 successes
    assert select(root, "b") == []              # -> not-found route
    assert len(select(root, "head")) == 1
    atl = select(root, "#ATL")
    assert len(atl) == 1
    assert atl[0].attrs["href"] == \
        "http://w1.weather.gov/obhistory/KPDK.html"
    assert atl[0].text() == "Atlanta Weather"
    meta = select(root, "meta[name=author]")
    assert len(meta) == 1
    assert meta[0].attrs["content"] == "Apache NiFi Community"
    # nested element text flattens (jsoup .text() semantics)
    gdr = select(root, "#GDR")[0]
    assert gdr.text() == "Grand Rapids Weather"


def test_selector_combinators_and_classes():
    html = ('<div class="box big"><p><span id="x">a</span></p></div>'
            '<div class="box"><span>b</span></div><span>c</span>')
    root = parse_html(html)
    assert [n.text() for n in select(root, "div span")] == ["a", "b"]
    assert [n.text() for n in select(root, "div > span")] == ["b"]
    assert [n.text() for n in select(root, ".box.big span")] == ["a"]
    assert [n.text() for n in select(root, "span#x, div.box > span")] \
        == ["a", "b"]
    assert len(select(root, "*")) == 6
    with pytest.raises(ValueError):
        select(root, "p !!bad!!")


def test_get_html_element_spark(spark):
    html = ('<p><a href="u1">one</a><a href="u2">two</a></p>')
    df = spark.createDataFrame([(1, html), (2, "<p>no links</p>")],
                               "id long, content string")
    out = get_html_element(df, "content", "a", output="attr",
                           attr="href").collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], []).append(r)
    assert [(r["match_idx"], r["value"]) for r in
            sorted(by[1], key=lambda r: r["match_idx"])] \
        == [(0, "u1"), (1, "u2")]
    assert by[2][0]["relationship"] == "not_found"
    txt = get_html_element(df.where("id = 1"), "content", "a",
                           output="text").collect()
    assert sorted(r["value"] for r in txt) == ["one", "two"]


def test_modify_and_put_html_element(spark):
    html = '<div id="put"><a href="u">x</a></div>'
    df = spark.createDataFrame([(1, html)], "id long, content string")
    got = modify_html_element(df, "content", "a", mod="attr",
                              attr="href", value="v2").collect()[0]
    assert 'href="v2"' in got["content"]
    got = modify_html_element(df, "content", "a", mod="text",
                              value="Y").collect()[0]
    assert ">Y</a>" in got["content"]
    got = put_html_element(df, "content", "#put",
                           "<b>new</b>").collect()[0]
    assert got["content"].endswith("<b>new</b></div>")
