"""ModifyBytes — byte-for-byte parity with the reference's own
TestModifyBytes fixtures and offset matrix (env-gated on the
reference checkout)."""

from __future__ import annotations

import os

import pytest

_REF = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
        "nifi-standard-processors/src/test/resources/TestModifyBytes/")

pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference artifacts not present")

_MB = 1 << 20


def _read(name: str) -> bytes:
    with open(_REF + name, "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("head,tail,expected", [
    (_MB, _MB, b""),                       # testRemoveAll
    (0, 0, "testFile.txt"),                # testNothingToDo
    (12, 0, "noHeader.txt"),               # testRemoveHeader
    (181, 0, b"<<<FOOTER>>>"),             # testKeepFooter
    (0, 181, b"<<<HEADER>>>"),             # testKeepHeader
    (0, 12, "noFooter.txt"),               # testRemoveFooter
    (12, 12, "noFooter_noHeader.txt"),     # testRemoveHeaderAndFooter
    (97, 97, b""),                         # offsets overlap -> empty
])
def test_reference_offset_matrix(spark, head, tail, expected):
    from nifi_spark.operators import modify_bytes
    content = _read("testFile.txt")
    df = spark.createDataFrame([(1, content)],
                               "id long, content binary")
    out = modify_bytes(df, "content", drop_head=head, drop_tail=tail)
    got = bytes(out.collect()[0]["content"])
    want = _read(expected) if isinstance(expected, str) else expected
    assert got == want
