"""ListS3 / FetchS3Object / PutS3Object analogs (sources/s3.py):
SigV4-verified REST calls, ListObjectsV2 paging, and ListS3's exact
same-timestamp dedup contract."""

from __future__ import annotations

import pytest

from nifi_spark.ledger import KVState
from nifi_spark.sources.s3 import (ListS3Source, S3Client, S3Error,
                                   S3Server)


@pytest.fixture()
def s3():
    srv = S3Server(secrets={"AK": "secret1"})
    srv.create_bucket("lake")
    return srv, S3Client(srv.transport,
                         endpoint="https://s3.us-east-1.amazonaws.com",
                         access_key="AK", secret_key="secret1")


def test_put_get_delete_roundtrip(s3):
    _srv, c = s3
    etag = c.put_object("lake", "raw/a.txt", b"hello s3")
    got = c.get_object("lake", "raw/a.txt")
    assert got["content"] == b"hello s3" and got["s3.etag"] == etag
    assert got["filename"] == "raw/a.txt"
    c.delete_object("lake", "raw/a.txt")
    with pytest.raises(S3Error, match="NoSuchKey"):
        c.get_object("lake", "raw/a.txt")
    # idempotent delete like real S3
    c.delete_object("lake", "raw/a.txt")


def test_list_v2_paging_and_prefix(s3):
    srv, c = s3
    for i in range(57):
        srv.put_direct("lake", f"logs/f{i:03d}.log", b"x" * (i + 1))
    srv.put_direct("lake", "other/skip.log", b"nope")
    before = srv.requests_served
    objs = c.list_objects_v2("lake", prefix="logs/", max_keys=10)
    assert len(objs) == 57
    assert [o["filename"] for o in objs] == \
        [f"logs/f{i:03d}.log" for i in range(57)]
    assert objs[3]["s3.length"] == 4
    # ceil(57/10) = 6 pages
    assert srv.requests_served - before == 6


def test_wrong_secret_rejected(s3):
    srv, _c = s3
    bad = S3Client(srv.transport,
                   endpoint="https://s3.us-east-1.amazonaws.com",
                   access_key="AK", secret_key="WRONG")
    with pytest.raises(S3Error, match="SignatureDoesNotMatch"):
        bad.list_objects_v2("lake")
    assert srv.rejected == 1


def test_list_s3_same_timestamp_dedup_contract(s3, tmp_path, spark):
    """ListS3.java:156-168: watermark = newest lastModified + the key
    set AT that timestamp. Same-listing re-run emits nothing; a NEW
    key at the boundary millisecond emits; an older key does not."""
    srv, c = s3
    for i in range(25):
        srv.put_direct("lake", f"logs/f{i:02d}.log", b"x")
    state = KVState(str(tmp_path / "st"))
    src = ListS3Source(str(tmp_path / "sp"), state)
    assert src.drain(c, "lake", prefix="logs/", max_keys=7) == 25
    assert src.drain(c, "lake", prefix="logs/") == 0
    wm = state.get("list_s3")["currentTimestamp"]
    srv.put_direct("lake", "logs/same_ms.log", b"yy",
                   last_modified_ms=wm)
    assert src.drain(c, "lake", prefix="logs/") == 1
    srv.put_direct("lake", "logs/older.log", b"zz",
                   last_modified_ms=wm - 5)
    assert src.drain(c, "lake", prefix="logs/") == 0
    df = src.read(spark)
    assert df.count() == 26
    assert df.filter(df.filename == "logs/same_ms.log").count() == 1
    # fetch composes with the listing
    row = df.filter(df.filename == "logs/f03.log").collect()[0]
    fetched = c.get_object(row["bucket"], row["filename"])
    assert fetched["content"] == b"x" and \
        fetched["s3.etag"] == row["etag"]
