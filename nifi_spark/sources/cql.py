"""QueryCassandra analog — the Cassandra CQL binary protocol v4,
implemented from the public spec (native_protocol_v4.spec in the
Cassandra source tree).

NiFi ancestor: nifi-cassandra-bundle QueryCassandra.java — executes a
user CQL SELECT, streams the ResultSet out as JSON (or Avro),
honoring the driver's fetch size (server-side paging). The reference
rides the DataStax driver; here the wire format itself is
implemented: the 9-byte frame header (version 0x04/0x84, flags,
int16 stream, opcode, int32 length), STARTUP → READY, OPTIONS →
SUPPORTED, and QUERY → RESULT Rows with full metadata (global table
spec, typed columns) plus REAL server-side paging — a QUERY carrying
page_size gets has_more_pages metadata and an opaque paging_state,
and the client loops exactly like the driver's
ResultSet.iterator().

Value types cover the connector surface: int (0x0009), bigint
(0x0002), varchar (0x000D), double (0x0007), boolean (0x0004) — all
big-endian per spec. The in-process `CqlServer` holds tables in
memory and evaluates a small CQL SELECT subset (projection, WHERE
with =/</<=/>/>=/!= conjunctions, LIMIT) — enough to replay the
query shapes the reference's tests issue. Prepared statements are
real: PREPARE analyzes the ?-markers against the table schema and
returns an MD5 statement id + typed bind metadata (exactly
Cassandra's MD5Digest contract), EXECUTE carries raw [bytes] values
decoded server-side with those types, and an unknown id gets the
spec's 0x2500 Unprepared error so drivers know to re-prepare.
Compression and auth are closed too: PasswordAuthenticator SASL
(OP_AUTHENTICATE dance) and STARTUP-negotiated lz4/snappy body
compression (functions/lz4_codec.py + snappy_codec.py, per-frame
compressed flag both ways). No declared boundary remains.

Transport = injectable ``read(n)``/``write(b)`` callables (tests
loop back on a socketpair; production wraps a TCP socket).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import struct

from pyspark.sql import DataFrame, SparkSession, functions as F


class CqlError(IOError):
    pass


REQUEST, RESPONSE = 0x04, 0x84
OP_ERROR, OP_STARTUP, OP_READY, OP_OPTIONS, OP_SUPPORTED = \
    0x00, 0x01, 0x02, 0x05, 0x06
OP_AUTHENTICATE, OP_AUTH_RESPONSE, OP_AUTH_SUCCESS = 0x03, 0x0F, 0x10
ERR_BAD_CREDENTIALS = 0x0100
_PASSWORD_AUTHENTICATOR = \
    "org.apache.cassandra.auth.PasswordAuthenticator"
OP_QUERY, OP_RESULT, OP_PREPARE, OP_EXECUTE = 0x07, 0x08, 0x09, 0x0A

T_BIGINT, T_BOOLEAN, T_DOUBLE, T_INT, T_VARCHAR = \
    0x0002, 0x0004, 0x0007, 0x0009, 0x000D
_TYPE_NAMES = {T_BIGINT: "bigint", T_BOOLEAN: "boolean",
               T_DOUBLE: "double", T_INT: "int", T_VARCHAR: "varchar"}
_NAME_TYPES = {v: k for k, v in _TYPE_NAMES.items()}

CONSISTENCY_ONE = 0x0001
_Q_VALUES, _Q_PAGE_SIZE, _Q_PAGING_STATE = 0x01, 0x04, 0x08
_M_GLOBAL_SPEC, _M_MORE_PAGES, _M_NO_METADATA = 0x0001, 0x0002, 0x0004

KIND_VOID, KIND_ROWS, KIND_PREPARED = 1, 2, 4
ERR_INVALID, ERR_UNPREPARED = 0x2200, 0x2500


# ------------------------------------------------------------- frames


FLAG_COMPRESSED = 0x01
SUPPORTED_COMPRESSIONS = ("lz4", "snappy")


def _compress_body(algo: str, body: bytes) -> bytes:
    """Native-protocol body compression: lz4 carries a 4-byte
    big-endian uncompressed length before the block (what the
    Cassandra lz4 transport does); snappy is the raw block format
    (self-describing preamble)."""
    if algo == "lz4":
        from nifi_spark.functions.lz4_codec import lz4_block_compress
        return struct.pack(">I", len(body)) + lz4_block_compress(body)
    if algo == "snappy":
        from nifi_spark.functions.snappy_codec import snappy_compress
        return snappy_compress(body)
    raise CqlError(f"unsupported compression {algo!r}")


def _decompress_body(algo: str, body: bytes) -> bytes:
    if algo == "lz4":
        from nifi_spark.functions.lz4_codec import lz4_block_decompress
        (want,) = struct.unpack_from(">I", body, 0)
        out = lz4_block_decompress(body[4:])
        if len(out) != want:
            raise CqlError(f"lz4 length mismatch {len(out)} != {want}")
        return out
    if algo == "snappy":
        from nifi_spark.functions.snappy_codec import snappy_decompress
        return snappy_decompress(body)
    raise CqlError(f"unsupported compression {algo!r}")


def write_frame(write, version: int, opcode: int, body: bytes, *,
                stream: int = 0,
                compression: "str | None" = None) -> None:
    flags = 0
    if compression and body:
        body = _compress_body(compression, body)
        flags |= FLAG_COMPRESSED
    write(struct.pack(">BBhBi", version, flags, stream, opcode,
                      len(body)) + body)


def read_frame(read, *, compression: "str | None" = None
               ) -> "tuple[int, int, int, bytes] | None":
    hdr = _read_exact(read, 9, eof_ok=True)
    if hdr is None:
        return None
    version, flags, stream, opcode, length = struct.unpack(">BBhBi", hdr)
    body = _read_exact(read, length)
    if flags & FLAG_COMPRESSED:
        if compression is None:
            raise CqlError("compressed frame but no negotiated codec")
        body = _decompress_body(compression, body)
        flags &= ~FLAG_COMPRESSED
    if flags:
        raise CqlError("traced/custom-payload frames not supported")
    return version, stream, opcode, body


def _read_exact(read, n: int, *, eof_ok: bool = False):
    buf = b""
    while len(buf) < n:
        chunk = read(n - len(buf))
        if not chunk:
            if eof_ok and not buf:
                return None
            raise CqlError("connection closed mid-frame")
        buf += chunk
    return buf


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">H", len(b)) + b


def _long_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


def _bytes(b: "bytes | None") -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _string_map(m: dict[str, str]) -> bytes:
    return (struct.pack(">H", len(m))
            + b"".join(_string(k) + _string(v) for k, v in m.items()))


class _Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        if len(out) != n:
            raise CqlError("truncated frame body")
        self.pos += n
        return out

    def u8(self):
        return self.take(1)[0]

    def u16(self):
        return struct.unpack(">H", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def string(self) -> str:
        return self.take(self.u16()).decode()

    def long_string(self) -> str:
        return self.take(self.i32()).decode()

    def bytes_(self) -> "bytes | None":
        n = self.i32()
        return None if n < 0 else self.take(n)

    def string_map(self) -> dict[str, str]:
        return {self.string(): self.string()
                for _ in range(self.u16())}


# ------------------------------------------------------- value codec


def encode_value(type_id: int, v) -> "bytes | None":
    if v is None:
        return None
    if type_id == T_INT:
        return struct.pack(">i", v)
    if type_id == T_BIGINT:
        return struct.pack(">q", v)
    if type_id == T_DOUBLE:
        return struct.pack(">d", v)
    if type_id == T_BOOLEAN:
        return b"\x01" if v else b"\x00"
    if type_id == T_VARCHAR:
        return str(v).encode()
    raise CqlError(f"unsupported type 0x{type_id:04x}")


def decode_value(type_id: int, b: "bytes | None"):
    if b is None:
        return None
    if type_id == T_INT:
        return struct.unpack(">i", b)[0]
    if type_id == T_BIGINT:
        return struct.unpack(">q", b)[0]
    if type_id == T_DOUBLE:
        return struct.unpack(">d", b)[0]
    if type_id == T_BOOLEAN:
        return b[0] == 1
    if type_id == T_VARCHAR:
        return b.decode()
    raise CqlError(f"unsupported type 0x{type_id:04x}")


# --------------------------------------------------------- mini-CQL

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[\w.]+)\s*"
    r"\((?P<cols>[\w\s,]+)\)\s*VALUES\s*\((?P<vals>.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<cols>\*|[\w\s,]+?)\s+FROM\s+(?P<table>[\w.]+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"\s*;?\s*$", re.IGNORECASE | re.DOTALL)
_COND_RE = re.compile(
    r"^\s*(?P<col>\w+)\s*(?P<op>>=|<=|!=|=|<|>)\s*(?P<val>.+?)\s*$")

_OPS = {"=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}


def _split_csv(s: str) -> list[str]:
    """Split a VALUES list on top-level commas (quotes respected,
    '' escape inside strings)."""
    out, buf, in_str, i = [], [], False, 0
    while i < len(s):
        ch = s[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == ",":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    out.append("".join(buf))
    return out


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1].replace("''", "'")
    if tok.lower() in ("true", "false"):
        return tok.lower() == "true"
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def _render_literal(v) -> str:
    """Inverse of `_parse_literal` — inline a bound value back into
    CQL text ('' escaping for strings, true/false for booleans)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if v is None:
        raise CqlError("NULL bind values not supported")
    return "'" + str(v).replace("'", "''") + "'"


def _substitute_binds(cql: str, rendered: list[str]) -> str:
    """Replace top-level ?-markers (quote-aware) with rendered
    literals, in order."""
    out, in_str, it = [], False, iter(rendered)
    for ch in cql:
        if in_str:
            out.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == "?":
            try:
                out.append(next(it))
            except StopIteration:
                raise CqlError("too few bind values") from None
        else:
            out.append(ch)
    leftover = sum(1 for _ in it)
    if leftover:
        raise CqlError(f"{leftover} extra bind values")
    return "".join(out)


class CqlServer:
    """In-memory tables + the SELECT-subset evaluator, served over
    protocol-v4 frames with real paging state (the opaque
    paging_state encodes the row offset — exactly what it is)."""

    def __init__(self, credentials: "tuple[str, str] | None" = None):
        # table -> (schema [(name, type_name)], rows [tuple])
        self.tables: dict[str, tuple[list[tuple[str, str]],
                                     list[tuple]]] = {}
        self.queries_served = 0
        # prepared id (md5 of the query text, like Cassandra's
        # MD5Digest) -> (cql, [(bind col name, type name), ...])
        self.prepared: dict[bytes,
                            tuple[str, list[tuple[str, str]]]] = {}
        # (user, password) -> STARTUP answers AUTHENTICATE with the
        # PasswordAuthenticator class name and expects a SASL PLAIN
        # AUTH_RESPONSE (\0user\0pass), exactly the driver dance the
        # reference's Username/Password properties configure
        self.credentials = credentials
        self._authed_ok = credentials is None

    def add_table(self, name: str, schema: list[tuple[str, str]],
                  rows: list[tuple]) -> None:
        for _c, t in schema:
            if t not in _NAME_TYPES:
                raise CqlError(f"unsupported column type {t}")
        self.tables[name] = (schema, [tuple(r) for r in rows])

    def _run_insert(self, cql: str) -> None:
        """PutCassandraQL's statement shape (literal values; the
        reference binds sql.args.N into ?-placeholders before
        execute — callers here inline them the same way)."""
        m = _INSERT_RE.match(cql)
        table = m.group("table").split(".")[-1]
        if table not in self.tables:
            raise CqlError(f"unknown table {table}")
        schema, rows = self.tables[table]
        names = [c.strip() for c in m.group("cols").split(",")]
        vals = [_parse_literal(v) for v in
                _split_csv(m.group("vals"))]
        if len(names) != len(vals):
            raise CqlError("column/value count mismatch")
        if set(names) != {c for c, _t in schema}:
            raise CqlError("INSERT must cover every column")
        by_name = dict(zip(names, vals))
        rows.append(tuple(by_name[c] for c, _t in schema))

    def _run_select(self, cql: str):
        m = _SELECT_RE.match(cql)
        if not m:
            raise CqlError(f"unsupported CQL: {cql!r}")
        table = m.group("table").split(".")[-1]
        if table not in self.tables:
            raise CqlError(f"unknown table {table}")
        schema, rows = self.tables[table]
        idx = {c: i for i, (c, _t) in enumerate(schema)}
        out = rows
        if m.group("where"):
            for cond in re.split(r"\s+AND\s+", m.group("where"),
                                 flags=re.IGNORECASE):
                cm = _COND_RE.match(cond)
                if not cm or cm.group("col") not in idx:
                    raise CqlError(f"unsupported condition {cond!r}")
                i = idx[cm.group("col")]
                op = _OPS[cm.group("op")]
                rhs = _parse_literal(cm.group("val"))
                out = [r for r in out
                       if r[i] is not None and op(r[i], rhs)]
        cols_tok = m.group("cols").strip()
        if cols_tok == "*":
            proj = list(range(len(schema)))
        else:
            names = [c.strip() for c in cols_tok.split(",")]
            for c in names:
                if c not in idx:
                    raise CqlError(f"unknown column {c}")
            proj = [idx[c] for c in names]
        if m.group("limit"):
            out = out[:int(m.group("limit"))]
        pschema = [schema[i] for i in proj]
        return pschema, [tuple(r[i] for i in proj) for r in out]

    def _analyze_binds(self, cql: str) -> list[tuple[str, str]]:
        """Infer the (name, type) of every ?-marker from the table
        schema, in appearance order — what Cassandra does at PREPARE
        time so EXECUTE can carry raw [bytes] values."""
        im = _INSERT_RE.match(cql)
        if im:
            table = im.group("table").split(".")[-1]
            if table not in self.tables:
                raise CqlError(f"unknown table {table}")
            schema = dict(self.tables[table][0])
            names = [c.strip() for c in im.group("cols").split(",")]
            binds = []
            for name, tok in zip(names, _split_csv(im.group("vals"))):
                if tok.strip() == "?":
                    if name not in schema:
                        raise CqlError(f"unknown column {name}")
                    binds.append((name, schema[name]))
            return binds
        sm = _SELECT_RE.match(cql)
        if not sm:
            raise CqlError(f"unsupported CQL: {cql!r}")
        table = sm.group("table").split(".")[-1]
        if table not in self.tables:
            raise CqlError(f"unknown table {table}")
        schema = dict(self.tables[table][0])
        binds = []
        for cond in re.split(r"\s+AND\s+", sm.group("where") or "",
                             flags=re.IGNORECASE):
            cm = _COND_RE.match(cond)
            if cm and cm.group("val").strip() == "?":
                name = cm.group("col")
                if name not in schema:
                    raise CqlError(f"unknown column {name}")
                binds.append((name, schema[name]))
        return binds

    def _rows_result(self, table: str, schema, rows, *,
                     offset: int, page_size: int) -> bytes:
        end = offset + page_size if page_size else len(rows)
        page = rows[offset:end]
        more = end < len(rows)
        flags = _M_GLOBAL_SPEC | (_M_MORE_PAGES if more else 0)
        body = struct.pack(">i", KIND_ROWS)
        body += struct.pack(">ii", flags, len(schema))
        if more:
            body += _bytes(str(end).encode())        # paging_state
        body += _string("nifi") + _string(table)
        for name, tname in schema:
            body += _string(name) + struct.pack(">H", _NAME_TYPES[tname])
        body += struct.pack(">i", len(page))
        for row in page:
            for (_n, tname), v in zip(schema, row):
                body += _bytes(encode_value(_NAME_TYPES[tname], v))
        return body

    def _exec_cql(self, cql: str, r: "_Reader", *,
                  bind_types: "list[str] | None", write,
                  stream: int) -> None:
        """Shared QUERY/EXECUTE tail: parse the query-parameters
        block positioned at `r`, bind values if EXECUTE, run, reply."""
        try:
            r.u16()                                   # consistency
            qflags = r.u8()
            if qflags & _Q_VALUES:
                if bind_types is None:
                    raise CqlError("values on a simple QUERY frame "
                                   "not supported")
                n = r.u16()
                if n != len(bind_types):
                    raise CqlError(
                        f"expected {len(bind_types)} values, got {n}")
                vals = [decode_value(_NAME_TYPES[t], r.bytes_())
                        for t in bind_types]
                cql = _substitute_binds(
                    cql, [_render_literal(v) for v in vals])
            page_size = r.i32() if qflags & _Q_PAGE_SIZE else 0
            offset = 0
            if qflags & _Q_PAGING_STATE:
                st = r.bytes_()
                offset = int(st.decode()) if st else 0
            self.queries_served += 1
            if _INSERT_RE.match(cql):
                self._run_insert(cql)
                write_frame(write, RESPONSE, OP_RESULT,
                            struct.pack(">i", KIND_VOID),
                            stream=stream)
                return
            m = _SELECT_RE.match(cql)
            table = m.group("table").split(".")[-1] if m else "?"
            schema, rows = self._run_select(cql)
        except CqlError as exc:
            write_frame(write, RESPONSE, OP_ERROR,
                        struct.pack(">i", ERR_INVALID)
                        + _string(str(exc)), stream=stream)
            return
        write_frame(write, RESPONSE, OP_RESULT,
                    self._rows_result(table, schema, rows,
                                      offset=offset,
                                      page_size=page_size),
                    stream=stream)

    def handle(self, opcode: int, body: bytes, write, stream: int):
        if opcode == OP_STARTUP:
            opts = _Reader(body).string_map()
            if "CQL_VERSION" not in opts:
                raise CqlError("STARTUP without CQL_VERSION")
            if self.credentials is not None:
                write_frame(write, RESPONSE, OP_AUTHENTICATE,
                            _string(_PASSWORD_AUTHENTICATOR),
                            stream=stream)
            else:
                write_frame(write, RESPONSE, OP_READY, b"",
                            stream=stream)
        elif opcode == OP_AUTH_RESPONSE:
            token = _Reader(body).bytes_() or b""
            parts = token.split(b"\x00")
            ok = (self.credentials is not None and len(parts) == 3
                  and parts[1].decode() == self.credentials[0]
                  and parts[2].decode() == self.credentials[1])
            if ok:
                self._authed_ok = True
                write_frame(write, RESPONSE, OP_AUTH_SUCCESS,
                            _bytes(None), stream=stream)
            else:
                write_frame(write, RESPONSE, OP_ERROR,
                            struct.pack(">i", ERR_BAD_CREDENTIALS)
                            + _string("Bad credentials"),
                            stream=stream)
        elif not self._authed_ok:
            write_frame(write, RESPONSE, OP_ERROR,
                        struct.pack(">i", ERR_BAD_CREDENTIALS)
                        + _string("not authenticated"), stream=stream)
        elif opcode == OP_OPTIONS:
            # [string multimap]: CQL_VERSION + the body codecs we take
            mm = struct.pack(">H", 2)
            mm += _string("CQL_VERSION") + struct.pack(">H", 1) \
                + _string("3.4.4")
            mm += _string("COMPRESSION") \
                + struct.pack(">H", len(SUPPORTED_COMPRESSIONS))
            for a in SUPPORTED_COMPRESSIONS:
                mm += _string(a)
            write_frame(write, RESPONSE, OP_SUPPORTED, mm,
                        stream=stream)
        elif opcode == OP_QUERY:
            r = _Reader(body)
            cql = r.long_string()
            self._exec_cql(cql, r, bind_types=None, write=write,
                           stream=stream)
        elif opcode == OP_PREPARE:
            cql = _Reader(body).long_string()
            try:
                binds = self._analyze_binds(cql)
            except CqlError as exc:
                write_frame(write, RESPONSE, OP_ERROR,
                            struct.pack(">i", ERR_INVALID)
                            + _string(str(exc)), stream=stream)
                return
            pid = hashlib.md5(cql.encode()).digest()
            self.prepared[pid] = (cql, binds)
            im = _INSERT_RE.match(cql)
            table = ((im or _SELECT_RE.match(cql))
                     .group("table").split(".")[-1])
            meta = struct.pack(
                ">ii", _M_GLOBAL_SPEC if binds else 0, len(binds))
            meta += struct.pack(">i", 0)              # pk_count (v4)
            if binds:
                meta += _string("nifi") + _string(table)
                for name, tname in binds:
                    meta += _string(name) + struct.pack(
                        ">H", _NAME_TYPES[tname])
            # result metadata: NO_METADATA — the EXECUTE response
            # carries the full row metadata anyway
            meta += struct.pack(">ii", _M_NO_METADATA, 0)
            write_frame(write, RESPONSE, OP_RESULT,
                        struct.pack(">i", KIND_PREPARED)
                        + struct.pack(">H", len(pid)) + pid + meta,
                        stream=stream)
        elif opcode == OP_EXECUTE:
            r = _Reader(body)
            pid = r.take(r.u16())
            if pid not in self.prepared:
                write_frame(write, RESPONSE, OP_ERROR,
                            struct.pack(">i", ERR_UNPREPARED)
                            + _string("unprepared statement")
                            + struct.pack(">H", len(pid)) + pid,
                            stream=stream)
                return
            cql, binds = self.prepared[pid]
            self._exec_cql(cql, r, bind_types=[t for _n, t in binds],
                           write=write, stream=stream)
        else:
            write_frame(write, RESPONSE, OP_ERROR,
                        struct.pack(">i", 0x000A)
                        + _string(f"unsupported opcode {opcode}"),
                        stream=stream)

    def serve(self, read, write) -> int:
        """Per-connection loop. Compression negotiates in STARTUP's
        COMPRESSION option (STARTUP itself is never compressed, per
        the protocol spec); every later frame both ways carries the
        compressed-body flag."""
        n = 0
        algo: "str | None" = None

        def cwrite(blob: bytes) -> None:
            # write_frame emits one whole frame per call; recompress
            # its body under the negotiated codec
            if algo is None or len(blob) <= 9:
                write(blob)
                return
            version, flags, stream, opcode, _ln = struct.unpack(
                ">BBhBi", blob[:9])
            body = _compress_body(algo, blob[9:])
            write(struct.pack(">BBhBi", version,
                              flags | FLAG_COMPRESSED, stream, opcode,
                              len(body)) + body)

        while True:
            frame = read_frame(read, compression=algo)
            if frame is None:
                return n
            version, stream, opcode, body = frame
            if version != REQUEST:
                raise CqlError(f"bad request version 0x{version:02x}")
            want_algo = None
            if opcode == OP_STARTUP:
                opts = _Reader(body).string_map()
                want_algo = opts.get("COMPRESSION")
                if want_algo is not None \
                        and want_algo not in SUPPORTED_COMPRESSIONS:
                    write_frame(write, RESPONSE, OP_ERROR,
                                struct.pack(">i", 0x000A)
                                + _string(f"unsupported compression "
                                          f"{want_algo!r}"),
                                stream=stream)
                    n += 1
                    continue
            self.handle(opcode, body, cwrite, stream)
            if opcode == OP_STARTUP:
                algo = want_algo
            n += 1


class CqlClient:
    def __init__(self, read, write,
                 auth: "tuple[str, str] | None" = None,
                 compression: "str | None" = None):
        if compression is not None \
                and compression not in SUPPORTED_COMPRESSIONS:
            raise CqlError(f"unsupported compression {compression!r}")
        self._read, self._write = read, write
        self._stream = 0
        self._compression: "str | None" = None
        opts = {"CQL_VERSION": "3.0.0"}
        if compression is not None:
            opts["COMPRESSION"] = compression
        rop, rbody = self._rpc(OP_STARTUP, _string_map(opts))
        # STARTUP itself is uncompressed; every later frame negotiates
        self._compression = compression
        if rop == OP_AUTHENTICATE:
            # server names its IAuthenticator class; answer with the
            # SASL PLAIN initial response \0user\0pass — what the Java
            # driver's PlainTextAuthProvider sends for the reference's
            # Username/Password properties
            if auth is None:
                raise CqlError(
                    "server requires authentication ("
                    + _Reader(rbody).string() + ") but no credentials")
            token = b"\x00" + auth[0].encode() + b"\x00" \
                + auth[1].encode()
            rop, rbody = self._rpc(OP_AUTH_RESPONSE, _bytes(token))
            if rop != OP_AUTH_SUCCESS:
                raise CqlError(f"auth refused: opcode {rop}")
        elif rop != OP_READY:
            raise CqlError(f"startup refused: opcode {rop}")

    def _rpc(self, opcode: int, body: bytes) -> tuple[int, bytes]:
        self._stream += 1
        write_frame(self._write, REQUEST, opcode, body,
                    stream=self._stream,
                    compression=self._compression)
        frame = read_frame(self._read, compression=self._compression)
        if frame is None:
            raise CqlError("server closed connection")
        version, stream, rop, rbody = frame
        if stream != self._stream:
            raise CqlError(f"stream {stream} != {self._stream}")
        if rop == OP_ERROR:
            r = _Reader(rbody)
            code = r.i32()
            raise CqlError(f"server error 0x{code:04x}: {r.string()}")
        return rop, rbody

    def query(self, cql: str, *, page_size: int = 0):
        """Execute + auto-page; returns (columns [(name, type_name)],
        rows [tuple])."""
        return self._paged(
            OP_QUERY,
            lambda params: _long_string(cql) + params,
            page_size=page_size)

    def prepare(self, cql: str) -> "PreparedStatement":
        """PREPARE; returns the statement handle + bind-column types
        parsed from the server's prepared metadata."""
        rop, rbody = self._rpc(OP_PREPARE, _long_string(cql))
        if rop != OP_RESULT:
            raise CqlError(f"unexpected opcode {rop}")
        r = _Reader(rbody)
        if r.i32() != KIND_PREPARED:
            raise CqlError("PREPARE did not return Prepared")
        pid = r.take(r.u16())
        mflags = r.i32()
        ncols = r.i32()
        r.i32()                                       # pk_count (v4)
        if mflags & _M_GLOBAL_SPEC and ncols:
            r.string(), r.string()                    # keyspace, table
        binds = []
        for _ in range(ncols):
            name = r.string()
            binds.append((name, _TYPE_NAMES[r.u16()]))
        return PreparedStatement(pid, binds)

    def execute(self, stmt: "PreparedStatement", values: tuple = (),
                *, page_size: int = 0):
        """EXECUTE a prepared statement with positional bind values
        (encoded with the types PREPARE reported) + auto-page."""
        if len(values) != len(stmt.binds):
            raise CqlError(
                f"expected {len(stmt.binds)} values, got {len(values)}")
        packed = b"".join(
            _bytes(encode_value(_NAME_TYPES[t], v))
            for (_n, t), v in zip(stmt.binds, values))
        vals = struct.pack(">H", len(values)) + packed
        head = struct.pack(">H", len(stmt.id)) + stmt.id

        def build(params: bytes) -> bytes:
            # splice the VALUES flag + payload into the params block
            # (params = consistency u16 + flags u8 + tail)
            cons, flags = params[:2], params[2]
            return (head + cons + bytes([flags | _Q_VALUES]) + vals
                    + params[3:])

        return self._paged(OP_EXECUTE, build, page_size=page_size)

    def _paged(self, opcode: int, build_body, *, page_size: int):
        cols: list[tuple[str, str]] = []
        rows: list[tuple] = []
        paging_state: "bytes | None" = None
        while True:
            flags = 0
            tail = b""
            if page_size:
                flags |= _Q_PAGE_SIZE
                tail += struct.pack(">i", page_size)
            if paging_state is not None:
                flags |= _Q_PAGING_STATE
                tail += _bytes(paging_state)
            params = (struct.pack(">H", CONSISTENCY_ONE)
                      + bytes([flags]) + tail)
            rop, rbody = self._rpc(opcode, build_body(params))
            if rop != OP_RESULT:
                raise CqlError(f"unexpected opcode {rop}")
            r = _Reader(rbody)
            kind = r.i32()
            if kind != KIND_ROWS:
                return cols, rows
            mflags = r.i32()
            ncols = r.i32()
            paging_state = (r.bytes_()
                            if mflags & _M_MORE_PAGES else None)
            if mflags & _M_GLOBAL_SPEC:
                r.string(), r.string()                # keyspace, table
            cols = []
            for _ in range(ncols):
                name = r.string()
                cols.append((name, _TYPE_NAMES[r.u16()]))
            nrows = r.i32()
            for _ in range(nrows):
                rows.append(tuple(
                    decode_value(_NAME_TYPES[t], r.bytes_())
                    for _n, t in cols))
            if paging_state is None:
                return cols, rows


class PreparedStatement:
    """Client-side handle from `CqlClient.prepare` — the statement id
    plus the bind columns' (name, type_name) in marker order."""

    def __init__(self, pid: bytes, binds: list[tuple[str, str]]):
        self.id = pid
        self.binds = binds


def put_cassandra_ql(client: CqlClient, statements: list[str]) -> int:
    """PutCassandraQL analog (nifi-cassandra-bundle
    PutCassandraQL.java): execute each CQL statement (the reference
    binds typed cql.args.N attributes into ?-markers first; callers
    here inline literals the same way). Raises CqlError on the first
    failed statement — the reference routes that flowfile to
    failure."""
    for cql in statements:
        client.query(cql)


def put_cassandra_prepared(client: CqlClient, cql: str,
                           rows: list[tuple]) -> int:
    """PutCassandraQL's prepared path: when the flowfile carries typed
    ``cql.args.N`` attributes the reference binds them into the
    ?-markers of one prepared statement (PutCassandraQL.java — the
    session prepares once, then binds per flowfile). Prepare once,
    EXECUTE per row; returns the number of rows applied."""
    stmt = client.prepare(cql)
    for row in rows:
        client.execute(stmt, tuple(row))
    return len(rows)
    return len(statements)


def cql_loopback(server: CqlServer):
    import socket
    import threading

    a, b = socket.socketpair()
    errs: list[BaseException] = []
    result: list[int] = []

    def run():
        try:
            result.append(server.serve(b.recv, b.sendall))
        except BaseException as exc:
            errs.append(exc)
        finally:
            b.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def join(timeout: float = 30.0) -> int:
        a.close()
        t.join(timeout)
        if errs:
            raise errs[0]
        if t.is_alive():
            raise TimeoutError("cql server did not finish")
        return result[0] if result else 0

    return a.recv, a.sendall, join


class QueryCassandraSource:
    """QueryCassandra → parquet spool: one row per result row, values
    carried as a JSON object keyed by column name (the reference's
    convertToJsonStream row shape), with the typed column list kept
    alongside."""

    _MAX_PER_BATCH = 1_000_000

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        pat = re.compile(r"batch_(\d{8})\.parquet$")
        ids = [int(m.group(1)) for f in os.listdir(spool_dir)
               if (m := pat.match(f))]
        self._next_batch = max(ids) + 1 if ids else 0

    def drain(self, client: CqlClient, cql: str, *,
              page_size: int = 0) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols, rows = client.query(cql, page_size=page_size)
        if not rows:
            return 0
        bid = self._next_batch
        names = [n for n, _t in cols]
        payloads = [json.dumps(dict(zip(names, r)), sort_keys=True,
                               separators=(",", ":")) for r in rows]
        table = pa.table({
            "batch_id": pa.array([bid] * len(rows), pa.int64()),
            "row_seq": pa.array(range(len(rows)), pa.int64()),
            "cql": pa.array([cql] * len(rows), pa.string()),
            "columns": pa.array([json.dumps(cols)] * len(rows),
                                pa.string()),
            "payload": pa.array(payloads, pa.string()),
        })
        final = os.path.join(self.spool_dir, f"batch_{bid:08d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.rename(tmp, final)
        self._next_batch = bid + 1
        return len(rows)

    def read(self, spark: SparkSession) -> DataFrame:
        return (spark.read.parquet(self.spool_dir)
                .withColumn("row_seq",
                            F.col("batch_id") * self._MAX_PER_BATCH
                            + F.col("row_seq")))
