"""ConsumeIMAP analog — an IMAP4rev1 fetch subset (client AND server)
draining a folder to parquet spool.

NiFi ancestor: ConsumeIMAP.java + AbstractEmailProcessor.java:94-151
(Folder property, Should Delete Messages → \\Deleted flag + expunge,
one FlowFile per fetched message). The reference rides
spring-integration/javax.mail; here the IMAP dialogue subset a
fetch-and-delete consumer needs is implemented: tagged commands with
untagged ``*`` responses, LOGIN, SELECT (EXISTS count + UIDVALIDITY/
UIDNEXT), FETCH n (RFC822) with the literal ``{n}\\r\\n`` syntax,
STORE +FLAGS (\\Deleted), EXPUNGE, LOGOUT — plus the UID command
family and SEARCH: ``UID FETCH/STORE`` address messages by the
expunge-stable uid (uid sets ``1,3:5,7:*`` parsed per RFC 3501 §9
sequence-set grammar), ``SEARCH``/``UID SEARCH`` evaluate an
AND-conjoined criteria subset (ALL, DELETED, UNDELETED, ``TEXT s``,
``HEADER field value``) over the selected folder. The uid-driven
fetch loop is what robust consumers actually run (sequence numbers
shift under concurrent expunge; uids don't). UIDVALIDITY is
per-session here, which RFC 3501 permits — clients discard cached
uids when it changes. Remaining boundary: IDLE and BODYSTRUCTURE
(push notification and MIME introspection — nothing in the
fetch-and-delete contract needs them).

Transport injectable as always; `imap_loopback` runs the server on a
socketpair thread.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_SPOOL_SCHEMA = ("batch_id bigint, msg_idx bigint, folder string, "
                 "content string")


class ImapError(IOError):
    pass


def _parse_uid_set(spec: str, max_uid: int) -> "list[int]":
    """RFC 3501 sequence-set: '1', '1:3', '1,3:5', '2:*' -> sorted
    uid list (bounded by max_uid; '*' = max_uid)."""
    out: set[int] = set()
    for part in spec.split(","):
        if ":" in part:
            a, b = part.split(":", 1)
            lo = max_uid if a == "*" else int(a)
            hi = max_uid if b == "*" else int(b)
            if lo > hi:
                lo, hi = hi, lo
            out.update(range(lo, hi + 1))
        else:
            out.add(max_uid if part == "*" else int(part))
    return sorted(u for u in out if 1 <= u <= max_uid)


def _tokenize_quoted(text: str) -> "list[str]":
    """Split on spaces, honoring double-quoted strings."""
    toks, buf, inq = [], [], False
    for ch in text:
        if inq:
            if ch == '"':
                inq = False
                toks.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        elif ch == '"':
            inq = True
        elif ch == " ":
            if buf:
                toks.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        toks.append("".join(buf))
    return toks


def _search_match(msg: bytes, idx: int, deleted: "set[int]",
                  criteria: "list[str]") -> bool:
    """AND-conjoined subset of RFC 3501 §6.4.4: ALL, DELETED,
    UNDELETED, TEXT <s>, HEADER <field> <value>."""
    k = 0
    while k < len(criteria):
        c = criteria[k].upper()
        if c == "ALL":
            k += 1
        elif c == "DELETED":
            if idx not in deleted:
                return False
            k += 1
        elif c == "UNDELETED":
            if idx in deleted:
                return False
            k += 1
        elif c == "TEXT":
            if k + 1 >= len(criteria):
                raise ImapError("TEXT needs an argument")
            if criteria[k + 1].encode() not in msg:
                return False
            k += 2
        elif c == "HEADER":
            if k + 2 >= len(criteria):
                raise ImapError("HEADER needs field + value")
            field, value = criteria[k + 1], criteria[k + 2]
            head = msg.split(b"\r\n\r\n", 1)[0]
            hit = False
            for ln in head.split(b"\r\n"):
                if b":" not in ln:
                    continue
                name, _, val = ln.partition(b":")
                if (name.decode("utf-8", "replace").strip().lower()
                        == field.lower()
                        and value.lower()
                        in val.decode("utf-8", "replace").lower()):
                    hit = True
                    break
            if not hit:
                return False
            k += 3
        else:
            raise ImapError(f"unsupported SEARCH key {c}")
    return True


# ----------------------------------------------------------- server


def serve_imap(read_line, write, *, user: str, password: str,
               folders: dict[str, list[bytes]]) -> list[int]:
    """Serve ONE session; `folders` maps folder name → message list
    (mutated: EXPUNGE removes \\Deleted-flagged messages). Returns the
    expunged indexes (0-based, pre-expunge) of the last SELECTed
    folder."""
    def untagged(text: str) -> None:
        write(f"* {text}\r\n".encode())

    def tagged(tag: str, text: str) -> None:
        write(f"{tag} {text}\r\n".encode())

    untagged("OK nifi-spark IMAP4rev1 ready")
    authed = False
    selected: "str | None" = None
    deleted: set[int] = set()
    expunged: list[int] = []
    uids: dict[str, list[int]] = {}
    uidnext: dict[str, int] = {}

    def emit_fetch(i: int, msg: bytes, *, with_uid: bool) -> None:
        uid_part = f"UID {uids[selected][i]} " if with_uid else ""
        write(f"* {i + 1} FETCH ({uid_part}RFC822 {{{len(msg)}}}\r\n"
              .encode())
        write(msg)
        write(b")\r\n")
    while True:
        line = read_line()
        if not line:
            return expunged
        parts = line.rstrip(b"\r\n").decode("utf-8",
                                            errors="replace").split(" ")
        if len(parts) < 2:
            continue
        tag, verb = parts[0], parts[1].upper()
        args = parts[2:]
        if verb == "LOGIN":
            if len(args) == 2 and args[0] == user and args[1] == password:
                authed = True
                tagged(tag, "OK LOGIN completed")
            else:
                tagged(tag, "NO LOGIN failed")
        elif verb == "LOGOUT":
            untagged("BYE nifi-spark closing")
            tagged(tag, "OK LOGOUT completed")
            return expunged
        elif not authed:
            tagged(tag, "NO not authenticated")
        elif verb == "SELECT":
            name = args[0].strip('"')
            if name not in folders:
                tagged(tag, "NO no such folder")
                continue
            selected = name
            deleted = set()
            if name not in uids:
                uids[name] = list(range(1, len(folders[name]) + 1))
                uidnext[name] = len(folders[name]) + 1
            untagged(f"{len(folders[name])} EXISTS")
            untagged("OK [UIDVALIDITY 1] UIDs valid")
            untagged(f"OK [UIDNEXT {uidnext[name]}] next uid")
            tagged(tag, "OK [READ-WRITE] SELECT completed")
        elif selected is None:
            tagged(tag, "NO no folder selected")
        elif verb == "FETCH":
            i = int(args[0]) - 1
            box = folders[selected]
            if not (0 <= i < len(box)):
                tagged(tag, "NO no such message")
                continue
            emit_fetch(i, box[i], with_uid=False)
            tagged(tag, "OK FETCH completed")
        elif verb == "STORE":
            i = int(args[0]) - 1
            if "+FLAGS" in [a.upper() for a in args] \
                    and any("\\Deleted" in a for a in args):
                deleted.add(i)
                untagged(f"{i + 1} FETCH (FLAGS (\\Deleted))")
            tagged(tag, "OK STORE completed")
        elif verb == "SEARCH":
            box = folders[selected]
            try:
                crit = _tokenize_quoted(" ".join(args)) or ["ALL"]
                hits = [str(i + 1) for i, m in enumerate(box)
                        if _search_match(m, i, deleted, crit)]
            except ImapError as exc:
                tagged(tag, f"BAD {exc}")
                continue
            untagged(("SEARCH " + " ".join(hits)).rstrip())
            tagged(tag, "OK SEARCH completed")
        elif verb == "UID" and args:
            sub = args[0].upper()
            box = folders[selected]
            fuids = uids[selected]
            if sub == "SEARCH":
                try:
                    crit = (_tokenize_quoted(" ".join(args[1:]))
                            or ["ALL"])
                    hits = [str(fuids[i]) for i, m in enumerate(box)
                            if _search_match(m, i, deleted, crit)]
                except ImapError as exc:
                    tagged(tag, f"BAD {exc}")
                    continue
                untagged(("SEARCH " + " ".join(hits)).rstrip())
                tagged(tag, "OK UID SEARCH completed")
            elif sub == "FETCH" and len(args) >= 2:
                want = set(_parse_uid_set(
                    args[1], uidnext[selected] - 1))
                for i, u in enumerate(fuids):
                    if u in want:
                        emit_fetch(i, box[i], with_uid=True)
                tagged(tag, "OK UID FETCH completed")
            elif sub == "STORE" and len(args) >= 2:
                want = set(_parse_uid_set(
                    args[1], uidnext[selected] - 1))
                rest = [a.upper() for a in args[2:]]
                if "+FLAGS" in rest and any("\\DELETED" in a
                                            for a in rest):
                    for i, u in enumerate(fuids):
                        if u in want:
                            deleted.add(i)
                            untagged(f"{i + 1} FETCH (UID {u} "
                                     "FLAGS (\\Deleted))")
                tagged(tag, "OK UID STORE completed")
            else:
                tagged(tag, "BAD unsupported UID subcommand")
        elif verb == "EXPUNGE":
            box = folders[selected]
            fuids = uids[selected]
            for i in sorted(deleted, reverse=True):
                if 0 <= i < len(box):
                    del box[i]
                    del fuids[i]
                    untagged(f"{i + 1} EXPUNGE")
            expunged = sorted(deleted)
            deleted = set()
            tagged(tag, "OK EXPUNGE completed")
        else:
            tagged(tag, "BAD unsupported command")


# ----------------------------------------------------------- client


def imap_fetch(read_line, write, *, user: str, password: str,
               folder: str = "INBOX", delete: bool = True,
               use_uid: bool = False) -> list[bytes]:
    """ConsumeIMAP's receive loop: LOGIN, SELECT folder, FETCH every
    message (RFC822 literal), with `delete` STORE +FLAGS (\\Deleted)
    + EXPUNGE (Should Delete Messages = true), LOGOUT.

    `use_uid=True` runs the robust variant real consumers prefer:
    UID SEARCH ALL enumerates expunge-stable uids, then UID FETCH /
    UID STORE address each message by uid — immune to sequence-number
    shifts under concurrent expunge."""
    seq = 0

    def send(cmd: str) -> str:
        nonlocal seq
        seq += 1
        tag = f"a{seq:03d}"
        write(f"{tag} {cmd}\r\n".encode())
        return tag

    def read_until_tagged(tag: str) -> list[bytes]:
        lines: list[bytes] = []
        while True:
            ln = read_line()
            if not ln:
                raise ImapError("connection dropped")
            if ln.startswith(tag.encode() + b" "):
                status = ln.decode().split(" ", 2)[1]
                if status != "OK":
                    raise ImapError(f"server said {ln.decode().strip()}")
                return lines
            lines.append(ln)

    greeting = read_line()
    if not greeting.startswith(b"* OK"):
        raise ImapError(f"bad greeting {greeting!r}")
    read_until_tagged(send(f"LOGIN {user} {password}"))
    exists = 0
    for ln in read_until_tagged(send(f'SELECT "{folder}"')):
        m = re.match(rb"\* (\d+) EXISTS", ln)
        if m:
            exists = int(m.group(1))
    if use_uid:
        handles: list[tuple[str, str]] = []
        for ln in read_until_tagged(send("UID SEARCH ALL")):
            m = re.match(rb"\* SEARCH(.*)", ln)
            if m:
                handles = [("UID ", u) for u in
                           m.group(1).decode().split()]
    else:
        handles = [("", str(i)) for i in range(1, exists + 1)]
    messages: list[bytes] = []
    for prefix, h in handles:
        tag = send(f"{prefix}FETCH {h} RFC822")
        # untagged FETCH with a literal: * i FETCH ([UID u ]RFC822 {n}
        ln = read_line()
        m = re.search(rb"\{(\d+)\}\r\n$", ln)
        if not m:
            raise ImapError(f"expected literal, got {ln!r}")
        n = int(m.group(1))
        body = b""
        while len(body) < n:
            chunk = read_line()
            if not chunk:
                raise ImapError("dropped mid-literal")
            body += chunk
        messages.append(body[:n])
        read_until_tagged(tag)           # the ')' line + tagged OK
        if delete:
            read_until_tagged(
                send(f"{prefix}STORE {h} +FLAGS (\\Deleted)"))
    if delete and handles:
        read_until_tagged(send("EXPUNGE"))
    read_until_tagged(send("LOGOUT"))
    return messages


def imap_loopback(*, user: str, password: str,
                  folders: dict[str, list[bytes]]):
    """serve_imap on a socketpair thread → (connect, join)."""
    import socket
    import threading

    a, b = socket.socketpair()
    result: list = []
    errs: list[BaseException] = []

    def run():
        try:
            f = b.makefile("rb")
            result.extend(serve_imap(f.readline, b.sendall, user=user,
                                     password=password, folders=folders))
        except BaseException as exc:
            errs.append(exc)
        finally:
            b.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def connect():
        f = a.makefile("rb")
        return f.readline, a.sendall

    def join(timeout: float = 30.0) -> list[int]:
        t.join(timeout)
        a.close()
        if errs:
            raise errs[0]
        if t.is_alive():
            raise TimeoutError("imap server did not finish")
        return result

    return connect, join


class ConsumeIMAPSource:
    """Drain-to-spool bridge (pop3.py pattern, folder-addressed)."""

    _MAX_PER_BATCH = 1_000_000

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        pat = re.compile(r"batch_(\d{8})\.parquet$")
        ids = [int(m.group(1)) for f in os.listdir(spool_dir)
               if (m := pat.match(f))]
        self._next_batch = max(ids) + 1 if ids else 0

    def drain(self, connect, *, user: str, password: str,
              folder: str = "INBOX", delete: bool = True,
              use_uid: bool = False) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        read_line, write = connect()
        msgs = imap_fetch(read_line, write, user=user,
                          password=password, folder=folder,
                          delete=delete, use_uid=use_uid)
        if not msgs:
            return 0
        bid = self._next_batch
        table = pa.table({
            "batch_id": pa.array([bid] * len(msgs), pa.int64()),
            "msg_idx": pa.array(range(len(msgs)), pa.int64()),
            "folder": pa.array([folder] * len(msgs), pa.string()),
            "content": pa.array([m.decode("utf-8", errors="replace")
                                 for m in msgs], pa.string()),
        })
        final = os.path.join(self.spool_dir, f"batch_{bid:08d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.rename(tmp, final)
        self._next_batch = bid + 1
        return len(msgs)

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.schema(_SPOOL_SCHEMA).parquet(self.spool_dir)
        return (df.withColumn("msg_seq",
                              F.col("batch_id") * self._MAX_PER_BATCH
                              + F.col("msg_idx"))
                .withColumn("mime_type", F.lit("message/rfc822")))
