"""FTP family — GetFTP / PutFTP / FetchFTP / ListFTP analogs over a
real RFC 959 control + passive-data protocol implementation.

NiFi ancestors: GetFTP/PutFTP/FetchFTP/ListFTP
(nifi-standard-processors/.../GetFTP.java, PutFTP.java, FetchFTP.java,
ListFTP.java) all delegate to FTPTransfer
(nifi-standard-processors/.../util/FTPTransfer.java:120-520 — commons-net
FTPClient: login, binary type, passive mode, listFiles with
size/timestamp, retrieveFile, storeFile, rename, delete). Here both
sides of the wire are implemented from the RFC:

* ``FtpServer`` — threaded loopback server rooted at a real directory:
  USER/PASS auth, SYST/FEAT/TYPE, CWD/CDUP/PWD, PASV + EPSV (one
  ephemeral loopback listener per transfer, exactly the passive dance
  FTPTransfer configures via ``Connection Mode: Passive``), LIST (unix
  ls -l shape commons-net parses), NLST, RETR/STOR/APPE, DELE, MKD/RMD,
  RNFR/RNTO (PutFTP's dot-rename protection), SIZE/MDTM, REST for
  resumed RETR. Paths are jailed to the root.
* ``FtpClient`` — control-connection client: multiline reply parsing
  ("123-…" through "123 "), 227/229 passive-address parsing, binary
  transfers over the data channel.
* Bridges with the reference processors' semantics:
  - ``get_ftp``: GetFTP — list remote dir, download every match to the
    parquet-able spool, delete-after-fetch (``Delete Original``).
  - ``put_ftp``: PutFTP — upload with temp-dot-name then RNTO (the
    reference's ``Dot Rename`` conflict protection).
  - ``list_ftp``: ListFTP — MDTM-watermark listing reusing the
    AbstractListProcessor lag contract (no same-boundary emissions).
  - ``fetch_ftp``: FetchFTP — fetch ONE named remote file per input
    row; not-found routes like the reference's ``not.found``.

The SFTP siblings live in sources/sftp.py (SFTPv3 packet layer over an
injectable channel; the SSH transport itself is the declared seam).
"""

from __future__ import annotations

import io
import os
import posixpath
import socket
import threading
import time


class FtpError(IOError):
    def __init__(self, code: int, text: str):
        super().__init__(f"{code} {text}")
        self.code = code
        self.text = text


# --------------------------------------------------------------- server


def _ls_line(name: str, st: os.stat_result, is_dir: bool) -> str:
    kind = "d" if is_dir else "-"
    mt = time.strftime("%b %d %H:%M", time.gmtime(st.st_mtime))
    return (f"{kind}rw-r--r-- 1 ftp ftp {st.st_size:>12d} {mt} {name}")


class FtpServer:
    """Loopback RFC 959 server over a real directory. ``start()`` binds
    an ephemeral 127.0.0.1 port and serves each control connection on
    its own thread; every PASV opens a fresh ephemeral data listener
    (the per-transfer passive dance)."""

    def __init__(self, root: str, *, user: str = "ftp",
                 password: str = "ftp"):
        self.root = os.path.realpath(root)
        self.user, self.password = user, password
        self._sock: "socket.socket | None" = None
        self._threads: list[threading.Thread] = []
        self._stop = False

    # -- lifecycle
    def start(self) -> tuple[str, int]:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(8)
        s.settimeout(0.2)
        self._sock = s
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return s.getsockname()

    def stop(self) -> None:
        self._stop = True
        for t in self._threads:
            t.join(10.0)
        if self._sock is not None:
            self._sock.close()

    def _accept_loop(self) -> None:
        assert self._sock is not None
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._session, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    # -- path jail
    def _resolve(self, cwd: str, arg: str) -> str:
        virt = posixpath.normpath(posixpath.join(cwd, arg or "."))
        if not virt.startswith("/"):
            virt = "/" + virt
        real = os.path.realpath(
            os.path.join(self.root, virt.lstrip("/")))
        if real != self.root and not real.startswith(self.root + os.sep):
            raise FtpError(550, "path escapes root")
        return real

    @staticmethod
    def _virt(cwd: str, arg: str) -> str:
        v = posixpath.normpath(posixpath.join(cwd, arg or "."))
        return v if v.startswith("/") else "/" + v

    # -- one control session
    def _session(self, conn: socket.socket) -> None:
        f = conn.makefile("rwb")

        def reply(code: int, text: str) -> None:
            f.write(f"{code} {text}\r\n".encode())
            f.flush()

        reply(220, "nifi-spark FTP ready")
        cwd = "/"
        authed_user: "str | None" = None
        authed = False
        rnfr: "str | None" = None
        rest = 0
        pasv: "socket.socket | None" = None

        def data_conn() -> socket.socket:
            nonlocal pasv
            if pasv is None:
                raise FtpError(425, "use PASV first")
            pasv.settimeout(10.0)
            d, _ = pasv.accept()
            pasv.close()
            pasv = None
            return d

        try:
            while True:
                line = f.readline()
                if not line:
                    return
                parts = line.rstrip(b"\r\n").decode("utf-8",
                                                    "replace").split(" ", 1)
                verb = parts[0].upper()
                arg = parts[1] if len(parts) > 1 else ""
                try:
                    if verb == "USER":
                        authed_user, authed = arg, False
                        reply(331, "password required")
                    elif verb == "PASS":
                        if (authed_user == self.user
                                and arg == self.password):
                            authed = True
                            reply(230, "logged in")
                        else:
                            reply(530, "login incorrect")
                    elif verb == "QUIT":
                        reply(221, "bye")
                        return
                    elif not authed:
                        reply(530, "not logged in")
                    elif verb == "SYST":
                        reply(215, "UNIX Type: L8")
                    elif verb == "FEAT":
                        f.write(b"211-Features:\r\n SIZE\r\n MDTM\r\n"
                                b" EPSV\r\n REST STREAM\r\n211 End\r\n")
                        f.flush()
                    elif verb == "TYPE":
                        reply(200, f"type set to {arg.upper() or 'I'}")
                    elif verb == "NOOP":
                        reply(200, "ok")
                    elif verb == "PWD":
                        reply(257, f'"{cwd}" is cwd')
                    elif verb == "CWD":
                        real = self._resolve(cwd, arg)
                        if not os.path.isdir(real):
                            raise FtpError(550, "no such directory")
                        cwd = self._virt(cwd, arg)
                        reply(250, "cwd ok")
                    elif verb == "CDUP":
                        cwd = posixpath.dirname(cwd) or "/"
                        reply(250, "cdup ok")
                    elif verb in ("PASV", "EPSV"):
                        if pasv is not None:
                            pasv.close()
                        pasv = socket.socket()
                        pasv.bind(("127.0.0.1", 0))
                        pasv.listen(1)
                        host, port = pasv.getsockname()
                        if verb == "PASV":
                            h = host.replace(".", ",")
                            reply(227, f"entering passive mode "
                                  f"({h},{port >> 8},{port & 0xFF})")
                        else:
                            reply(229, f"entering extended passive "
                                  f"mode (|||{port}|)")
                    elif verb in ("LIST", "NLST"):
                        real = self._resolve(cwd, arg)
                        if not os.path.isdir(real):
                            raise FtpError(550, "no such directory")
                        names = sorted(os.listdir(real))
                        d = data_conn()
                        reply(150, "opening data connection")
                        buf = []
                        for n in names:
                            p = os.path.join(real, n)
                            if verb == "NLST":
                                buf.append(n)
                            else:
                                buf.append(_ls_line(n, os.stat(p),
                                                    os.path.isdir(p)))
                        d.sendall(("\r\n".join(buf)
                                   + ("\r\n" if buf else "")).encode())
                        d.close()
                        reply(226, "transfer complete")
                    elif verb == "SIZE":
                        real = self._resolve(cwd, arg)
                        if not os.path.isfile(real):
                            raise FtpError(550, "no such file")
                        reply(213, str(os.path.getsize(real)))
                    elif verb == "MDTM":
                        real = self._resolve(cwd, arg)
                        if not os.path.isfile(real):
                            raise FtpError(550, "no such file")
                        reply(213, time.strftime(
                            "%Y%m%d%H%M%S",
                            time.gmtime(os.stat(real).st_mtime)))
                    elif verb == "REST":
                        rest = int(arg)
                        reply(350, f"restarting at {rest}")
                    elif verb == "RETR":
                        real = self._resolve(cwd, arg)
                        if not os.path.isfile(real):
                            raise FtpError(550, "no such file")
                        d = data_conn()
                        reply(150, "opening data connection")
                        with open(real, "rb") as src:
                            src.seek(rest)
                            rest = 0
                            while True:
                                chunk = src.read(65536)
                                if not chunk:
                                    break
                                d.sendall(chunk)
                        d.close()
                        reply(226, "transfer complete")
                    elif verb in ("STOR", "APPE"):
                        real = self._resolve(cwd, arg)
                        d = data_conn()
                        reply(150, "opening data connection")
                        mode = "ab" if verb == "APPE" else "wb"
                        with open(real, mode) as dst:
                            while True:
                                chunk = d.recv(65536)
                                if not chunk:
                                    break
                                dst.write(chunk)
                        d.close()
                        reply(226, "transfer complete")
                    elif verb == "DELE":
                        real = self._resolve(cwd, arg)
                        if not os.path.isfile(real):
                            raise FtpError(550, "no such file")
                        os.unlink(real)
                        reply(250, "deleted")
                    elif verb == "MKD":
                        os.makedirs(self._resolve(cwd, arg),
                                    exist_ok=True)
                        reply(257, "created")
                    elif verb == "RMD":
                        real = self._resolve(cwd, arg)
                        if not os.path.isdir(real):
                            raise FtpError(550, "no such directory")
                        os.rmdir(real)
                        reply(250, "removed")
                    elif verb == "RNFR":
                        real = self._resolve(cwd, arg)
                        if not os.path.exists(real):
                            raise FtpError(550, "no such file")
                        rnfr = real
                        reply(350, "ready for RNTO")
                    elif verb == "RNTO":
                        if rnfr is None:
                            raise FtpError(503, "RNFR first")
                        os.replace(rnfr, self._resolve(cwd, arg))
                        rnfr = None
                        reply(250, "renamed")
                    else:
                        reply(502, f"{verb} not implemented")
                except FtpError as e:
                    reply(e.code, e.text)
        finally:
            if pasv is not None:
                pasv.close()
            f.close()
            conn.close()


# --------------------------------------------------------------- client


class FtpClient:
    """Minimal commons-net-shaped client: passive binary transfers."""

    def __init__(self, host: str, port: int, *, user: str = "ftp",
                 password: str = "ftp"):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._f = self._sock.makefile("rwb")
        self._expect(220)
        self._cmd(f"USER {user}", 331)
        self._cmd(f"PASS {password}", 230)
        self._cmd("TYPE I", 200)

    def close(self) -> None:
        try:
            self._cmd("QUIT", 221)
        except (FtpError, OSError):
            pass
        self._f.close()
        self._sock.close()

    # -- control plumbing
    def _expect(self, want: int) -> str:
        code, text = self._reply()
        if code != want:
            raise FtpError(code, text)
        return text

    def _reply(self) -> tuple[int, str]:
        line = self._f.readline().decode("utf-8", "replace")
        if not line:
            raise FtpError(421, "connection closed")
        code = int(line[:3])
        text = [line[4:].rstrip("\r\n")]
        if line[3:4] == "-":                       # multiline reply
            while True:
                ln = self._f.readline().decode("utf-8", "replace")
                text.append(ln.rstrip("\r\n"))
                if ln[:3] == line[:3] and ln[3:4] == " ":
                    break
        return code, "\n".join(text)

    def _cmd(self, cmd: str, want: int) -> str:
        self._f.write(cmd.encode() + b"\r\n")
        self._f.flush()
        return self._expect(want)

    def _pasv(self) -> socket.socket:
        text = self._cmd("PASV", 227)
        inside = text[text.index("(") + 1:text.index(")")]
        p = inside.split(",")
        host = ".".join(p[:4])
        port = (int(p[4]) << 8) | int(p[5])
        return socket.create_connection((host, port), timeout=30)

    # -- operations
    def nlst(self, path: str = "") -> list[str]:
        d = self._pasv()
        self._cmd(f"NLST {path}".strip(), 150)
        buf = io.BytesIO()
        while True:
            chunk = d.recv(65536)
            if not chunk:
                break
            buf.write(chunk)
        d.close()
        self._expect(226)
        return [ln for ln in buf.getvalue().decode().split("\r\n") if ln]

    def retr(self, path: str, *, rest: int = 0) -> bytes:
        d = self._pasv()
        if rest:
            self._cmd(f"REST {rest}", 350)
        self._cmd(f"RETR {path}", 150)
        buf = io.BytesIO()
        while True:
            chunk = d.recv(65536)
            if not chunk:
                break
            buf.write(chunk)
        d.close()
        self._expect(226)
        return buf.getvalue()

    def stor(self, path: str, data: bytes, *, append: bool = False) -> None:
        d = self._pasv()
        self._cmd(f"{'APPE' if append else 'STOR'} {path}", 150)
        d.sendall(data)
        d.close()
        self._expect(226)

    def dele(self, path: str) -> None:
        self._cmd(f"DELE {path}", 250)

    def mkd(self, path: str) -> None:
        self._cmd(f"MKD {path}", 257)

    def rmd(self, path: str) -> None:
        self._cmd(f"RMD {path}", 250)

    def cwd(self, path: str) -> None:
        self._cmd(f"CWD {path}", 250)

    def pwd(self) -> str:
        text = self._cmd("PWD", 257)
        return text.split('"')[1]

    def rename(self, frm: str, to: str) -> None:
        self._cmd(f"RNFR {frm}", 350)
        self._cmd(f"RNTO {to}", 250)

    def size(self, path: str) -> int:
        return int(self._cmd(f"SIZE {path}", 213))

    def mdtm(self, path: str) -> float:
        text = self._cmd(f"MDTM {path}", 213)
        import calendar
        return calendar.timegm(time.strptime(text, "%Y%m%d%H%M%S"))


# --------------------------------------------------------------- bridges


def put_ftp(client: FtpClient, files: list[tuple[str, bytes]],
            remote_dir: str = "", *, dot_rename: bool = True) -> int:
    """PutFTP: upload each (name, data); with dot_rename the data lands
    under ``.name`` then renames into place (PutFTP.java's
    ``Temporary Filename`` / dot-rename conflict protection)."""
    n = 0
    for name, data in files:
        target = posixpath.join(remote_dir, name) if remote_dir else name
        if dot_rename:
            tmp = posixpath.join(posixpath.dirname(target) or "",
                                 "." + posixpath.basename(target))
            client.stor(tmp, data)
            client.rename(tmp, target)
        else:
            client.stor(target, data)
        n += 1
    return n


def get_ftp(client: FtpClient, remote_dir: str = "", *,
            delete: bool = True,
            suffix: "str | None" = None) -> list[dict]:
    """GetFTP: drain a remote directory — list, download every match,
    delete originals when ``delete`` (the reference's default). Dot
    files (in-flight dot-renames) are skipped, matching FTPTransfer's
    ``Ignore Dotted Files`` default. Returns [{name, content, mtime}]."""
    out: list[dict] = []
    for name in client.nlst(remote_dir):
        if name.startswith("."):
            continue
        if suffix and not name.endswith(suffix):
            continue
        path = posixpath.join(remote_dir, name) if remote_dir else name
        out.append({"name": name, "content": client.retr(path),
                    "mtime": client.mdtm(path)})
        if delete:
            client.dele(path)
    out.sort(key=lambda e: e["name"])
    return out


def fetch_ftp(client: FtpClient, names: list[str],
              remote_dir: str = "") -> tuple[list[dict], list[str]]:
    """FetchFTP: fetch each named file; returns (found rows,
    not-found names) — the reference's success / not.found routing."""
    found: list[dict] = []
    missing: list[str] = []
    for name in names:
        path = posixpath.join(remote_dir, name) if remote_dir else name
        try:
            found.append({"name": name, "content": client.retr(path)})
        except FtpError as e:
            if e.code == 550:
                missing.append(name)
            else:
                raise
    return found, missing


def list_ftp(client: FtpClient, remote_dir: str,
             after_mtime: float, *, lag_seconds: float = 0.1,
             now: "float | None" = None) -> tuple[list[dict], float]:
    """ListFTP: MDTM-watermark listing under the AbstractListProcessor
    contract (emit once, exclude entries at/inside the lag boundary).
    Returns (entries, new_watermark) — commit the watermark only after
    the downstream batch commits."""
    boundary = (time.time() if now is None else now) - lag_seconds
    out: list[dict] = []
    wm = after_mtime
    for name in client.nlst(remote_dir):
        if name.startswith("."):
            continue
        path = posixpath.join(remote_dir, name) if remote_dir else name
        mt = client.mdtm(path)
        if mt > after_mtime and mt <= boundary:
            out.append({"name": name, "mtime": mt,
                        "size": client.size(path)})
            wm = max(wm, mt)
    out.sort(key=lambda e: (e["mtime"], e["name"]))
    return out, wm
