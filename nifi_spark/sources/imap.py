"""ConsumeIMAP analog — an IMAP4rev1 fetch subset (client AND server)
draining a folder to parquet spool.

NiFi ancestor: ConsumeIMAP.java + AbstractEmailProcessor.java:94-151
(Folder property, Should Delete Messages → \\Deleted flag + expunge,
one FlowFile per fetched message). The reference rides
spring-integration/javax.mail; here the IMAP dialogue subset a
fetch-and-delete consumer needs is implemented: tagged commands with
untagged ``*`` responses, LOGIN, SELECT (EXISTS count), FETCH n
(RFC822) with the literal ``{n}\\r\\n`` syntax, STORE +FLAGS
(\\Deleted), EXPUNGE, LOGOUT. The rest of IMAP (IDLE, UID commands,
BODYSTRUCTURE, search) stays a declared boundary — POP3 (sources/
pop3.py) already covers the plain fetch contract; this closes the
folder-addressed one.

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
            untagged(f"{len(folders[name])} EXISTS")
            tagged(tag, "OK [READ-WRITE] SELECT completed")
        elif selected is None:
            tagged(tag, "NO no folder selected")
        elif verb == "FETCH":
            i = int(args[0]) - 1
            box = folders[selected]
            if not (0 <= i < len(box)):
                tagged(tag, "NO no such message")
                continue
            msg = box[i]
            write(f"* {i + 1} FETCH (RFC822 {{{len(msg)}}}\r\n"
                  .encode())
            write(msg)
            write(b")\r\n")
            tagged(tag, "OK FETCH completed")
        elif verb == "STORE":
            i = int(args[0]) - 1
            if "+FLAGS" in [a.upper() for a in args] \
                    and any("\\Deleted" in a for a in args):
                deleted.add(i)
                untagged(f"{i + 1} FETCH (FLAGS (\\Deleted))")
            tagged(tag, "OK STORE completed")
        elif verb == "EXPUNGE":
            box = folders[selected]
            for i in sorted(deleted, reverse=True):
                if 0 <= i < len(box):
                    del box[i]
                    untagged(f"{i + 1} EXPUNGE")
            expunged = sorted(deleted)
            deleted = set()
            tagged(tag, "OK EXPUNGE completed")
        else:
            tagged(tag, "BAD unsupported command")


# ----------------------------------------------------------- client


def imap_fetch(read_line, write, *, user: str, password: str,
               folder: str = "INBOX", delete: bool = True
               ) -> list[bytes]:
    """ConsumeIMAP's receive loop: LOGIN, SELECT folder, FETCH every
    message (RFC822 literal), with `delete` STORE +FLAGS (\\Deleted)
    + EXPUNGE (Should Delete Messages = true), LOGOUT."""
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
    messages: list[bytes] = []
    for i in range(1, exists + 1):
        tag = send(f"FETCH {i} RFC822")
        # untagged FETCH with a literal: * i FETCH (RFC822 {n}
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
            read_until_tagged(send(f"STORE {i} +FLAGS (\\Deleted)"))
    if delete and exists:
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
              folder: str = "INBOX", delete: bool = True) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        read_line, write = connect()
        msgs = imap_fetch(read_line, write, user=user,
                          password=password, folder=folder,
                          delete=delete)
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
