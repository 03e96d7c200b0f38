"""TNEF (operators/tnef.py): reference-fixture conformance, checksum
validation, build→parse roundtrip, Spark extraction routing."""

from __future__ import annotations

import os
import struct

import pytest

from nifi_spark.operators.tnef import (TnefError, build_tnef,
                                       extract_tnef_attachments,
                                       parse_tnef)

_REF = ("/root/reference/nifi-nar-bundles/nifi-email-bundle/"
        "nifi-email-processors/src/test/resources")


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference checkout not present")
@pytest.mark.parametrize("fname,want", [
    ("winmail-simple.dat", []),
    ("winmail-with-attachment.dat", ["nifiDrop.svg"]),
    ("winmail-with-attachments.dat", ["MINIFI~1.PNG", "nifiDrop.svg"]),
])
def test_reference_fixture_parity(fname, want):
    """The reference's own TestExtractTNEFAttachments expectations:
    filename = attAttachTitle (NOT the MAPI long name)."""
    m = parse_tnef(open(os.path.join(_REF, fname), "rb").read())
    assert sorted(a["title"] for a in m["attachments"]) == sorted(want)
    assert m["message_class"] == "IPM.Microsoft Mail.Note"


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference checkout not present")
def test_long_filenames_from_mapi_props():
    m = parse_tnef(open(os.path.join(
        _REF, "winmail-with-attachments.dat"), "rb").read())
    assert [a["long_filename"] for a in m["attachments"]] == \
        ["minifi-logo.png", "nifiDrop.svg"]
    # payloads are the real files (PNG magic / SVG xml)
    assert m["attachments"][0]["data"][:4] == b"\x89PNG"
    assert m["attachments"][1]["data"][:5] == b"<?xml"


def test_roundtrip_and_errors():
    blob = build_tnef([("a.txt", b"hello"), ("b.bin", bytes(range(256)))])
    m = parse_tnef(blob)
    assert [(a["title"], a["data"]) for a in m["attachments"]] == \
        [("a.txt", b"hello"), ("b.bin", bytes(range(256)))]
    with pytest.raises(TnefError, match="signature"):
        parse_tnef(b"\x00" * 16)
    with pytest.raises(TnefError, match="too short"):
        parse_tnef(b"ab")
    # corrupt a checksum byte
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(TnefError, match="checksum"):
        parse_tnef(bytes(bad))
    # truncated mid-record
    with pytest.raises(TnefError, match="truncated"):
        parse_tnef(blob[:len(blob) - 3])


def test_spark_extraction_routing(spark):
    good1 = build_tnef([("x.txt", b"payload-x")])
    good2 = build_tnef([])
    rows = [(1, good1), (2, good2), (3, b"not tnef at all")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = extract_tnef_attachments(df, "payload", id_cols=["id"])
    got = [(r.id, r.relationship, r.filename, r.size)
           for r in out.orderBy("id", "attach_idx").collect()]
    import hashlib
    assert (1, "original", "IPM.Microsoft Mail.Note", None) in got
    assert (1, "attachments", "x.txt", 9) in got
    assert (2, "original", "IPM.Microsoft Mail.Note", None) in got
    assert any(r[0] == 3 and r[1] == "failure" for r in got)
    md5s = {r.payload_hexmd5 for r in out.collect() if r.payload_hexmd5}
    want = hashlib.md5(b"payload-x".hex().upper().encode()).hexdigest()
    assert md5s == {want}
