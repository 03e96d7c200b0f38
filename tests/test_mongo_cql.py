"""GetMongo (sources/mongo.py — BSON + OP_MSG) and QueryCassandra
(sources/cql.py — CQL binary protocol v4) analogs: codec roundtrips,
wire sessions over socketpairs, cursor/paging semantics, error paths.
No Spark session needed — pure protocol tests."""

from __future__ import annotations

import pytest

from nifi_spark.sources.cql import (CqlClient, CqlError, CqlServer,
                                    cql_loopback)
from nifi_spark.sources.mongo import (MongoClient, MongoError,
                                      MongoServer, ObjectId,
                                      bson_decode, bson_encode,
                                      mongo_loopback)


# ------------------------------------------------------------- BSON


def test_bson_roundtrip_all_types():
    doc = {"a": 1, "neg": -7, "b": 2.5, "s": "héllo", "empty": "",
           "n": None, "t": True, "f": False, "big": 2 ** 40,
           "negbig": -(2 ** 40), "arr": [1, "x", {"y": 2}, None],
           "sub": {"k": "v", "deep": {"z": [1, 2]}},
           "bin": b"\x00\x01\xff", "oid": ObjectId(bytes(range(12)))}
    assert bson_decode(bson_encode(doc)) == doc


def test_bson_int_width_boundaries():
    for v in (2 ** 31 - 1, -(2 ** 31), 2 ** 31, -(2 ** 31) - 1):
        assert bson_decode(bson_encode({"v": v}))["v"] == v


def test_bson_rejects_nul_key_and_trailing_bytes():
    with pytest.raises(MongoError):
        bson_encode({"a\x00b": 1})
    with pytest.raises(MongoError):
        bson_decode(bson_encode({"a": 1}) + b"\x00")


# ----------------------------------------------------------- OP_MSG


def test_mongo_find_filters_sort_limit_projection():
    srv = MongoServer()
    r, w, join = mongo_loopback(srv)
    c = MongoClient(r, w)
    docs = [{"_id": i, "grp": i % 5, "v": i * i} for i in range(137)]
    assert c.insert("metrics", docs) == 137
    got = c.find("metrics", {"grp": {"$lt": 2}}, sort={"v": -1},
                 batch_size=10)
    exp = sorted([d for d in docs if d["grp"] < 2],
                 key=lambda d: -d["v"])
    assert got == exp
    assert c.find("metrics", {}, sort={"_id": 1}, limit=7,
                  projection={"v": 1, "_id": 0}) == \
        [{"v": i * i} for i in range(7)]
    assert len(c.find("metrics", {"grp": {"$in": [0, 4]}})) == \
        sum(1 for d in docs if d["grp"] in (0, 4))
    join()


def test_mongo_cursor_paging_is_real():
    """batchSize smaller than the result forces getMore round trips;
    the doc stream must still be complete and ordered."""
    srv = MongoServer()
    r, w, join = mongo_loopback(srv)
    c = MongoClient(r, w)
    c.insert("t", [{"_id": i} for i in range(53)])
    got = c.find("t", {}, sort={"_id": 1}, batch_size=7)
    assert [d["_id"] for d in got] == list(range(53))
    join()
    # 1 hello + 1 insert + 1 find + ceil((53-7)/7)=7 getMores
    assert srv.commands_served == 10


def test_mongo_unknown_command_and_dead_cursor():
    srv = MongoServer()
    assert srv.handle({"frobnicate": 1})["ok"] == 0.0
    assert srv.handle({"getMore": 999, "collection": "x"})["code"] == 43


def test_mongo_kill_cursors():
    srv = MongoServer()
    r, w, join = mongo_loopback(srv)
    c = MongoClient(r, w)
    c.insert("t", [{"_id": i} for i in range(30)])
    reply = c._cmd({"find": "t", "filter": {}, "batchSize": 5})
    cid = reply["cursor"]["id"]
    assert cid != 0
    assert c.kill_cursors("t", [cid]) == [cid]
    assert c.kill_cursors("t", [cid]) == []
    join()


# -------------------------------------------------------------- CQL


@pytest.fixture()
def cql_pair():
    srv = CqlServer()
    rows = [(i, i % 7, f"name{i}", i * 1.5, i % 2 == 0, i * 10 ** 10)
            for i in range(211)]
    srv.add_table("events",
                  [("id", "int"), ("grp", "int"), ("name", "varchar"),
                   ("score", "double"), ("flag", "boolean"),
                   ("big", "bigint")], rows)
    r, w, join = cql_loopback(srv)
    yield srv, CqlClient(r, w), rows, join
    join()


def test_cql_select_where_limit_types(cql_pair):
    srv, c, rows, _ = cql_pair
    cols, got = c.query("SELECT id, name, score, flag, big FROM "
                        "ks.events WHERE grp >= 3 AND grp < 5 LIMIT 40")
    assert cols == [("id", "int"), ("name", "varchar"),
                    ("score", "double"), ("flag", "boolean"),
                    ("big", "bigint")]
    exp = [(i, f"name{i}", i * 1.5, i % 2 == 0, i * 10 ** 10)
           for i in range(211) if 3 <= i % 7 < 5][:40]
    assert got == exp


def test_cql_paging_covers_everything(cql_pair):
    srv, c, rows, _ = cql_pair
    _cols, got = c.query("SELECT id FROM events", page_size=50)
    assert [g[0] for g in got] == list(range(211))
    # 1 startup + ceil(211/50)=5 query pages
    assert srv.queries_served == 5


def test_cql_string_where_and_star(cql_pair):
    _srv, c, rows, _ = cql_pair
    _cols, got = c.query("SELECT * FROM events WHERE name = 'name5'")
    assert got == [rows[5]]


def test_cql_error_frame(cql_pair):
    _srv, c, _rows, _ = cql_pair
    with pytest.raises(CqlError, match="0x2200"):
        c.query("DROP TABLE events")
    # connection survives an error frame
    _cols, got = c.query("SELECT id FROM events LIMIT 1")
    assert got == [(0,)]


def test_cql_null_values_roundtrip():
    srv = CqlServer()
    srv.add_table("t", [("id", "int"), ("opt", "varchar")],
                  [(1, "x"), (2, None)])
    r, w, join = cql_loopback(srv)
    c = CqlClient(r, w)
    _cols, got = c.query("SELECT id, opt FROM t")
    assert got == [(1, "x"), (2, None)]
    join()


# ----------------------------------------------- GetMongoTest parity
# Mirrors the reference's GetMongoTest scenarios
# (nifi-mongodb-bundle/.../GetMongoTest.java:51-203) over the wire
# analog: the same three DOCUMENTS, the same query/projection/sort/
# limit properties, the same expected document sequences. (The
# reference asserts the Java driver's toJson() bytes; here document
# EQUALITY is asserted — the spool serialization is this repo's
# documented deterministic compact JSON.)

_GM_DOCS = [
    {"_id": "doc_1", "a": 1, "b": 2, "c": 3},
    {"_id": "doc_2", "a": 1, "b": 2, "c": 4},
    {"_id": "doc_3", "a": 1, "b": 3},
]


@pytest.fixture()
def getmongo():
    srv = MongoServer(dbname="getmongotest")
    r, w, join = mongo_loopback(srv)
    c = MongoClient(r, w, db="getmongotest")
    c.insert("test", [dict(d) for d in _GM_DOCS])
    yield c
    join()


def test_getmongo_read_one_document(getmongo):
    # GetMongoTest.testReadOneDocument: {a: 1, b: 3} -> DOCUMENTS[2]
    assert getmongo.find("test", {"a": 1, "b": 3}) == [_GM_DOCS[2]]


def test_getmongo_read_multiple_documents(getmongo):
    # testReadMultipleDocuments: {a: {$exists: true}} -> all three in
    # insertion order
    assert getmongo.find("test", {"a": {"$exists": True}}) == _GM_DOCS


def test_getmongo_projection(getmongo):
    # testProjection: query {a:1, b:3}, projection {_id:0, a:1} -> {a:1}
    got = getmongo.find("test", {"a": 1, "b": 3},
                        projection={"_id": 0, "a": 1})
    assert got == [{"a": 1}]


def test_getmongo_sort(getmongo):
    # testSort: {a:-1, b:-1, c:1} -> doc_3, doc_1, doc_2 (doc_3 has no
    # c; missing sorts as null/lowest exactly like Mongo)
    got = getmongo.find("test", {"a": {"$exists": True}},
                        sort={"a": -1, "b": -1, "c": 1})
    assert got == [_GM_DOCS[2], _GM_DOCS[0], _GM_DOCS[1]]


def test_getmongo_limit(getmongo):
    # testLimit: limit 1 -> DOCUMENTS[0]
    got = getmongo.find("test", {"a": {"$exists": True}}, limit=1)
    assert got == [_GM_DOCS[0]]


# ------------------------------------------------ PutCassandraQL half


def test_put_cassandra_ql_insert_and_readback():
    from nifi_spark.sources.cql import put_cassandra_ql
    srv = CqlServer()
    srv.add_table("t", [("id", "int"), ("name", "varchar"),
                        ("score", "double")], [])
    r, w, join = cql_loopback(srv)
    c = CqlClient(r, w)
    put_cassandra_ql(c, [
        "INSERT INTO ks.t (id, name, score) VALUES "
        "(1, 'it''s a test', 2.5)",
        "INSERT INTO t (score, id, name) VALUES (3.5, 2, 'two')"])
    _cols, rows = c.query("SELECT * FROM t")
    assert rows == [(1, "it's a test", 2.5), (2, "two", 3.5)]
    with pytest.raises(CqlError, match="every column"):
        c.query("INSERT INTO t (id) VALUES (9)")
    join()


# ------------------------------------------------ prepared statements


def test_cql_prepare_reports_typed_bind_metadata(cql_pair):
    _srv, c, _rows, _ = cql_pair
    stmt = c.prepare("SELECT id, name FROM events "
                     "WHERE grp = ? AND score >= ?")
    assert len(stmt.id) == 16            # Cassandra's MD5Digest
    assert stmt.binds == [("grp", "int"), ("score", "double")]


def test_cql_execute_binds_and_pages(cql_pair):
    srv, c, rows, _ = cql_pair
    stmt = c.prepare("SELECT id FROM events WHERE grp = ?")
    _cols, got = c.execute(stmt, (3,), page_size=10)
    assert [g[0] for g in got] == [i for i in range(211) if i % 7 == 3]
    # same statement, different binding — no re-prepare needed
    _cols, got2 = c.execute(stmt, (6,))
    assert [g[0] for g in got2] == [i for i in range(211) if i % 7 == 6]
    assert len(srv.prepared) == 1


def test_cql_prepared_insert_all_types_and_quote_escape():
    from nifi_spark.sources.cql import put_cassandra_prepared
    srv = CqlServer()
    srv.add_table("t", [("id", "int"), ("name", "varchar"),
                        ("score", "double"), ("flag", "boolean"),
                        ("big", "bigint")], [])
    r, w, join = cql_loopback(srv)
    c = CqlClient(r, w)
    n = put_cassandra_prepared(
        c, "INSERT INTO ks.t (id, name, score, flag, big) "
           "VALUES (?, ?, ?, ?, ?)",
        [(1, "it's ? quoted", 2.5, True, 7 * 10 ** 12),
         (2, "two", -0.5, False, -1)])
    assert n == 2
    _cols, rows = c.query("SELECT * FROM t")
    assert rows == [(1, "it's ? quoted", 2.5, True, 7 * 10 ** 12),
                    (2, "two", -0.5, False, -1)]
    join()


def test_cql_execute_unknown_id_gets_unprepared_error(cql_pair):
    from nifi_spark.sources.cql import PreparedStatement
    _srv, c, _rows, _ = cql_pair
    bogus = PreparedStatement(b"\x00" * 16, [])
    with pytest.raises(CqlError, match="0x2500"):
        c.execute(bogus, ())
    # connection survives; real statements still work
    stmt = c.prepare("SELECT id FROM events LIMIT 1")
    assert stmt.binds == []
    _cols, got = c.execute(stmt, ())
    assert got == [(0,)]


def test_cql_prepare_validates_against_schema(cql_pair):
    _srv, c, _rows, _ = cql_pair
    with pytest.raises(CqlError, match="unknown column"):
        c.prepare("SELECT id FROM events WHERE nope = ?")
    with pytest.raises(CqlError, match="expected 1 values, got 2"):
        c.execute(c.prepare("SELECT id FROM events WHERE grp = ?"),
                  (1, 2))  # arity enforced client-side


def test_cql_execute_wrong_arity_server_side(cql_pair):
    _srv, c, _rows, _ = cql_pair
    stmt = c.prepare("SELECT id FROM events WHERE grp = ?")
    # bypass the client check by lying about binds
    stmt2 = type(stmt)(stmt.id, [("grp", "int"), ("grp", "int")])
    with pytest.raises(CqlError, match="expected 1 values, got 2"):
        c.execute(stmt2, (1, 2))


def test_cql_password_auth_success():
    srv = CqlServer(credentials=("cassandra", "s3cret"))
    srv.add_table("t", [("id", "int")], [(7,)])
    r, w, join = cql_loopback(srv)
    c = CqlClient(r, w, auth=("cassandra", "s3cret"))
    _cols, got = c.query("SELECT id FROM t")
    assert got == [(7,)]
    join()


def test_cql_password_auth_bad_credentials():
    srv = CqlServer(credentials=("cassandra", "s3cret"))
    r, w, join = cql_loopback(srv)
    with pytest.raises(CqlError, match="0x0100"):
        CqlClient(r, w, auth=("cassandra", "wrong"))
    join()


def test_cql_auth_required_but_none_supplied():
    srv = CqlServer(credentials=("u", "p"))
    r, w, join = cql_loopback(srv)
    with pytest.raises(CqlError,
                       match="PasswordAuthenticator.*no credentials"):
        CqlClient(r, w)
    join()


def test_cql_query_refused_before_auth():
    # raw frames: STARTUP (gets AUTHENTICATE), then QUERY without
    # answering the challenge -> 0x0100 error, connection survives
    from nifi_spark.sources.cql import (
        REQUEST, OP_STARTUP, OP_QUERY, OP_AUTH_RESPONSE, write_frame,
        read_frame, _string_map, _long_string, _bytes, CONSISTENCY_ONE)
    import struct as _s
    srv = CqlServer(credentials=("u", "p"))
    srv.add_table("t", [("id", "int")], [(1,)])
    r, w, join = cql_loopback(srv)
    write_frame(w, REQUEST, OP_STARTUP,
                _string_map({"CQL_VERSION": "3.0.0"}), stream=1)
    assert read_frame(r)[2] == 0x03  # AUTHENTICATE
    q = _long_string("SELECT id FROM t") \
        + _s.pack(">H", CONSISTENCY_ONE) + b"\x00"
    write_frame(w, REQUEST, OP_QUERY, q, stream=2)
    ver, stream, op, body = read_frame(r)
    assert op == 0x00 and _s.unpack(">i", body[:4])[0] == 0x0100
    write_frame(w, REQUEST, OP_AUTH_RESPONSE,
                _bytes(b"\x00u\x00p"), stream=3)
    assert read_frame(r)[2] == 0x10  # AUTH_SUCCESS
    write_frame(w, REQUEST, OP_QUERY, q, stream=4)
    assert read_frame(r)[2] == 0x08  # RESULT
    w.close() if hasattr(w, "close") else None
    join()
