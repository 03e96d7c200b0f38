"""WebHDFS connector (sources/webhdfs.py): REST op encoding, the
two-step 307 redirect dance, RemoteException surfacing, watermarked
listing with the lag guard, create/open/delete over the fake namenode."""

from __future__ import annotations

import pytest

from nifi_spark.ledger import KVState
from nifi_spark.sources.webhdfs import (ListHDFSSource, WebHdfsClient,
                                        WebHdfsError,
                                        fake_hdfs_transport)


def _client(ns, mtimes=None):
    calls = []

    base = fake_hdfs_transport(ns, mtimes=mtimes)

    def spy(method, url, body):
        calls.append((method, url))
        return base(method, url, body)

    return WebHdfsClient("http://nn:9870", user="etl",
                         transport=spy), calls


def test_list_status_and_file_status():
    ns = {"/data/a.log": b"aaa", "/data/b.log": b"bb",
          "/data/sub/c.log": b"c"}
    c, calls = _client(ns, mtimes={"/data/a.log": 100,
                                   "/data/b.log": 200})
    got = c.list_status("/data")
    assert [(e["pathSuffix"], e["type"]) for e in got] == \
        [("a.log", "FILE"), ("b.log", "FILE"), ("sub", "DIRECTORY")]
    assert got[1]["length"] == 2 and got[1]["modificationTime"] == 200
    st = c.get_file_status("/data/a.log")
    assert st["type"] == "FILE" and st["length"] == 3
    assert "user.name=etl" in calls[0][1]
    with pytest.raises(WebHdfsError, match="FileNotFoundException"):
        c.list_status("/nope")


def test_open_follows_307_to_datanode():
    ns = {"/f.bin": bytes(range(100))}
    c, calls = _client(ns)
    assert c.open("/f.bin") == bytes(range(100))
    assert c.open("/f.bin", offset=10, length=5) == bytes(range(10, 15))
    # exactly two hops: namenode (307) then datanode
    urls = [u for _m, u in calls if "op=OPEN" in u]
    assert urls[0].startswith("http://nn:9870")
    assert urls[1].startswith("http://dn1:9864")


def test_create_overwrite_delete_mkdirs():
    ns = {}
    c, _calls = _client(ns)
    c.create("/out/part-0", b"hello")
    assert ns["/out/part-0"] == b"hello"
    with pytest.raises(WebHdfsError, match="FileAlreadyExists"):
        c.create("/out/part-0", b"x")
    c.create("/out/part-0", b"x", overwrite=True)
    assert ns["/out/part-0"] == b"x"
    assert c.mkdirs("/emptydir") is True
    assert c.delete("/out/part-0") is True
    assert c.delete("/out/part-0") is False


def test_listing_watermark_and_lag(tmp_path):
    ns = {"/in/f1": b"1", "/in/f2": b"2", "/in/f3": b"3"}
    mtimes = {"/in/f1": 1000, "/in/f2": 2000, "/in/f3": 2990}
    c, _ = _client(ns, mtimes=mtimes)
    clock = [3050]
    src = ListHDFSSource(c, "/in", KVState(str(tmp_path / "state")),
                         lag_ms=100, now_ms=lambda: clock[0])
    # f3 (2990) is inside the lag window (boundary 2950) → held back
    got = src.poll()
    assert [e["path"] for e in got] == ["/in/f1", "/in/f2"]
    src.commit()
    # second poll after time passes: only f3, exactly once
    clock[0] = 3200
    got2 = src.poll()
    assert [e["path"] for e in got2] == ["/in/f3"]
    src.commit()
    assert src.poll() == []
    # a NEW source over the same state resumes the watermark
    src2 = ListHDFSSource(c, "/in", KVState(str(tmp_path / "state")),
                          lag_ms=100, now_ms=lambda: clock[0])
    assert src2.poll() == []
    # new file lands → emitted
    ns["/in/f4"] = b"4"
    mtimes["/in/f4"] = 3100
    assert [e["path"] for e in src2.poll()] == ["/in/f4"]


def test_list_fetch_land_roundtrip(spark, tmp_path):
    """ListHDFS → FetchHDFS → landed table: the reference's
    list-then-fetch topology end-to-end over the fake cluster."""
    ns = {f"/logs/day={d}/events-{i}.jsonl":
          f'{{"d": {d}, "i": {i}}}\n'.encode()
          for d in (1, 2) for i in range(3)}
    mtimes = {p: 1000 + 10 * j for j, p in enumerate(sorted(ns))}
    c, _ = _client(ns, mtimes=mtimes)
    state = KVState(str(tmp_path / "state"))
    landed = []
    for day in (1, 2):
        src = ListHDFSSource(c, f"/logs/day={day}", state,
                             now_ms=lambda: 10_000)
        for e in src.poll():
            landed.append((e["path"], c.open(e["path"])))
        src.commit()
    assert len(landed) == 6
    df = spark.createDataFrame(
        [(p, b.decode()) for p, b in landed], "path string, body string")
    parsed = (df.selectExpr("path", "from_json(body, 'd int, i int') j")
              .selectExpr("j.d d", "j.i i"))
    assert [tuple(r) for r in
            parsed.groupBy("d").count().orderBy("d").collect()] == \
        [(1, 3), (2, 3)]
