"""DistributedMapCacheServer / SetCacheServer wire protocol
(sources/map_cache.py): handshake vectors, every map/set action over
the socketpair loopback, LFU/LRU/FIFO eviction ordering, WAL
persistence restore, Spark fetch/put integration."""

from __future__ import annotations

import io
import struct
import threading

import pytest

from nifi_spark.sources.map_cache import (
    MAGIC, MapCacheClient, PersistentMapCache, SetCacheClient,
    SimpleMapCache, SimpleSetCache, cache_loopback, fetch_into_column,
    initiate_handshake, put_from_rows, receive_handshake,
    serve_map_connection)


class _Duplex:
    """Two in-memory pipes glued into client/server stream pairs."""

    def __init__(self):
        a2b, b2a = _Pipe(), _Pipe()
        self.client = _Ends(b2a, a2b)
        self.server = _Ends(a2b, b2a)


class _Pipe:
    def __init__(self):
        self.buf = b""
        self.cv = threading.Condition()
        self.closed = False

    def read(self, n):
        with self.cv:
            while not self.buf and not self.closed:
                self.cv.wait(5)
            out, self.buf = self.buf[:n], self.buf[n:]
            return out

    def write(self, data):
        with self.cv:
            self.buf += data
            self.cv.notify_all()

    def close(self):
        with self.cv:
            self.closed = True
            self.cv.notify_all()


class _Ends:
    def __init__(self, rpipe, wpipe):
        self._r, self._w = rpipe, wpipe

    def read(self, n):
        return self._r.read(n)

    def write(self, data):
        self._w.write(data)

    def flush(self):
        pass


# ------------------------------------------------------- handshake

def test_handshake_wire_bytes():
    """ProtocolHandshake: magic NiFi + int 1; server answers byte 20."""
    client_out = io.BytesIO()
    client_in = io.BytesIO(bytes([20]))
    v = initiate_handshake(client_in, client_out, versions=(1,))
    assert v == 1
    assert client_out.getvalue() == MAGIC + struct.pack(">i", 1)


def test_handshake_version_stepdown():
    """Client proposes 3; server (only v1) answers 21 + 1; client
    retries with 1 and gets 20."""
    d = _Duplex()
    result = {}

    def server():
        result["v"] = receive_handshake(d.server, d.server, versions=(1,))

    t = threading.Thread(target=server, daemon=True)
    t.start()
    v = initiate_handshake(d.client, d.client, versions=(3, 2, 1))
    t.join(5)
    assert v == 1 and result["v"] == 1


def test_handshake_abort_no_common_version():
    d = _Duplex()

    def server():
        try:
            receive_handshake(d.server, d.server, versions=(5,))
        except IOError:
            pass

    t = threading.Thread(target=server, daemon=True)
    t.start()
    with pytest.raises(IOError, match="aborted"):
        initiate_handshake(d.client, d.client, versions=(2, 1))
    t.join(5)


# ----------------------------------------------------- map actions

def test_map_actions_over_loopback():
    cache = SimpleMapCache(max_size=100)
    inp, out, join = cache_loopback(cache, "map")
    c = MapCacheClient(inp, out)
    assert c.put_if_absent(b"k1", b"v1") is True
    assert c.put_if_absent(b"k1", b"v2") is False     # first wins
    assert c.get(b"k1") == b"v1"
    assert c.get(b"missing") is None
    assert c.get_and_put_if_absent(b"k1", b"v3") == b"v1"
    assert c.get_and_put_if_absent(b"k2", b"v9") is None  # added
    assert c.get(b"k2") == b"v9"
    c.put(b"k1", b"over")                              # unconditional
    assert c.get(b"k1") == b"over"
    assert c.contains_key(b"k2") is True
    assert c.remove(b"k2") is True
    assert c.remove(b"k2") is False
    assert c.contains_key(b"k2") is False
    c.close()
    join()


def test_set_actions_over_loopback():
    cache = SimpleSetCache(max_size=100)
    inp, out, join = cache_loopback(cache, "set")
    c = SetCacheClient(inp, out)
    assert c.add_if_absent(b"a") is True
    assert c.add_if_absent(b"a") is False
    assert c.contains(b"a") is True
    assert c.contains(b"b") is False
    assert c.remove(b"a") is True
    assert c.contains(b"a") is False
    c.close()
    join()


def test_illegal_action_raises_through_join():
    cache = SimpleMapCache()
    inp, out, join = cache_loopback(cache, "map")
    c = MapCacheClient(inp, out)
    out.write(struct.pack(">H", 4) + b"nope")
    with pytest.raises(IOError, match="Illegal Request"):
        join()


# -------------------------------------------------------- eviction

def _fill(cache, keys):
    for k in keys:
        cache.put_if_absent(k, b"v" + k)


def test_fifo_evicts_oldest_entry():
    cache = SimpleMapCache(max_size=3, eviction="FIFO")
    _fill(cache, [b"a", b"b", b"c"])
    cache.get(b"a")            # hits don't matter for FIFO
    cache.put_if_absent(b"d", b"vd")
    assert cache.evicted == [b"a"]
    assert cache.get(b"a") is None and cache.get(b"b") == b"vb"


def test_lru_evicts_least_recently_touched():
    cache = SimpleMapCache(max_size=3, eviction="LRU")
    _fill(cache, [b"a", b"b", b"c"])
    cache.get(b"a")            # refresh a → b is now least recent
    cache.put_if_absent(b"d", b"vd")
    assert cache.evicted == [b"b"]


def test_lfu_evicts_fewest_hits_then_oldest():
    cache = SimpleMapCache(max_size=3, eviction="LFU")
    _fill(cache, [b"a", b"b", b"c"])
    cache.get(b"a")
    cache.get(b"a")
    cache.get(b"c")
    # b has 0 hits → evicted regardless of recency
    cache.put_if_absent(b"d", b"vd")
    assert cache.evicted == [b"b"]
    # now a=2 hits, c=1, d=0 → next eviction takes d's replacement? add e
    cache.put_if_absent(b"e", b"ve")
    assert cache.evicted == [b"b", b"d"]


# ----------------------------------------------------- persistence

def test_persistent_restore_replays_creates(tmp_path):
    p = str(tmp_path / "wal" / "map.log")
    c1 = PersistentMapCache(p, SimpleMapCache(max_size=100))
    assert c1.restore() == 0
    c1.put_if_absent(b"k1", b"v1")
    c1.put_if_absent(b"k2", b"v2")
    c1.put(b"k3", b"v3")
    c1.remove(b"k2")
    c1.close()
    c2 = PersistentMapCache(p, SimpleMapCache(max_size=100))
    n = c2.restore()
    assert n == 2                      # k1 and k3 recovered, k2 dead
    assert c2.get(b"k1") == b"v1"
    assert c2.get(b"k3") == b"v3"
    assert c2.get(b"k2") is None
    c2.close()


def test_persistent_cache_serves_over_wire(tmp_path):
    p = str(tmp_path / "wal" / "map.log")
    cache = PersistentMapCache(p, SimpleMapCache(max_size=100))
    cache.restore()
    inp, out, join = cache_loopback(cache, "map")
    c = MapCacheClient(inp, out)
    c.put(b"k", b"v")
    assert c.get(b"k") == b"v"
    c.close()
    join()
    cache.close()
    c2 = PersistentMapCache(p, SimpleMapCache(max_size=100))
    assert c2.restore() == 1 and c2.get(b"k") == b"v"
    c2.close()


# ------------------------------------------------ Spark integration

def test_fetch_and_put_spark_roundtrip(spark):
    cache = SimpleMapCache(max_size=1000)
    inp, out, join = cache_loopback(cache, "map")
    c = MapCacheClient(inp, out)
    src = spark.createDataFrame(
        [(f"k{i % 5}", f"val{i % 5}") for i in range(20)],
        "key string, value string")
    assert put_from_rows(src, c, "key", "value") == 5
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(8)], "key string")
    got = fetch_into_column(spark, probe, c, "key", "cached")
    rows = {r["key"]: r["cached"] for r in got.collect()}
    assert rows["k0"] == "val0" and rows["k4"] == "val4"
    assert rows["k6"] is None and rows["k7"] is None
    c.close()
    join()
