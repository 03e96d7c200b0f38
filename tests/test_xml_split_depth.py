"""Depth-based SplitXml with namespace reinjection
(operators/xml_split_depth.py) vs the reference's goldens and counts."""

import os
import xml.etree.ElementTree as ET

import pytest

from nifi_spark.operators.xml_split_depth import (split_xml_depth,
                                                  split_xml_document)

REF = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
       "nifi-standard-processors/src/test/resources/TestXml")
ref_present = pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference checkout not present")


@ref_present
def test_namespace_goldens_byte_for_byte():
    text = open(f"{REF}/namespace.xml").read()
    frags = split_xml_document(text, 3)
    assert frags[0] == open(f"{REF}/namespaceSplit1.xml").read()
    assert frags[1] == open(f"{REF}/namespaceSplit2.xml").read()
    assert len(frags) == 2


@ref_present
@pytest.mark.parametrize("depth,count", [(1, 6), (2, 12), (3, 12)])
def test_bundle_split_counts_match_reference(depth, count):
    text = open(f"{REF}/xml-bundle-1").read()
    frags = split_xml_document(text, depth)
    assert len(frags) == count
    for f in frags:                      # every fragment is valid XML
        ET.fromstring(f)


def test_split_xml_depth_spark_contract(spark):
    doc = ('<r xmlns:a="urn:a"><g><a:x k="1">v&amp;1</a:x>'
           '<a:x k="2">v2</a:x></g><g><a:x k="3">v3</a:x></g></r>')
    df = spark.createDataFrame([(7, doc), (8, "<broken")],
                               "id long, xml string")
    rows = split_xml_depth(df, "xml", split_depth=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    ok = sorted(by_id[7], key=lambda r: r["fragment_index"])
    assert len(ok) == 3 and all(r["fragment_count"] == 3 for r in ok)
    assert ok[0]["fragment"] == ('<?xml version="1.0" encoding="UTF-8"?>'
                                 '<a:x xmlns:a="urn:a" k="1">v&amp;1</a:x>')
    assert by_id[8][0]["relationship"] == "failure"


def test_prefix_redeclaration_nearest_wins():
    doc = ('<r xmlns:p="urn:outer"><m xmlns:p="urn:inner">'
           '<p:leaf/></m></r>')
    frags = split_xml_document(doc, 2)
    assert frags == ['<?xml version="1.0" encoding="UTF-8"?>'
                     '<p:leaf xmlns:p="urn:inner"></p:leaf>']
