"""ListHDFS/GetHDFS/FetchHDFS/PutHDFS analog — the public WebHDFS REST
API (hadoop.apache.org WebHDFS.html), so the HDFS family works with no
Hadoop classpath and no filesystem driver.

NiFi ancestors: ListHDFS (nifi-hdfs-processors/.../ListHDFS.java:121,
238 — 100 ms listing lag so same-millisecond writers aren't split
across listings), FetchHDFS/GetHDFS (content fetch), PutHDFS (write).
Those use the Hadoop FileSystem API; the equivalent public protocol is
WebHDFS:

- ``GET  ?op=LISTSTATUS``     → FileStatuses.FileStatus[]
- ``GET  ?op=GETFILESTATUS``  → FileStatus
- ``GET  ?op=OPEN``           → 307 redirect to a datanode → bytes
- ``PUT  ?op=CREATE``         → 307 redirect → PUT body → 201
- ``PUT  ?op=MKDIRS``         → {"boolean": true}
- ``DELETE ?op=DELETE``       → {"boolean": true}
- errors                      → {"RemoteException": {...}}

The two-step 307 dance is load-bearing (namenode picks the datanode;
clients MUST re-issue against Location), so the client implements it
explicitly rather than trusting a transport's auto-redirect.

Transport is injectable: ``transport(method, url, body) → (status,
headers, body)``; production wraps urllib (redirects disabled), tests
use `fake_hdfs_transport` over an in-memory namespace. The listing
watermark reuses the repo's AbstractListProcessor contract (emit once,
lag guard on the boundary timestamp — sources/listing.py).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from urllib.parse import parse_qs, quote, unquote, urlparse

from nifi_spark.ledger import KVState

# transport(method, url, body) -> (status, headers, body)
Transport = Callable[[str, str, "bytes | None"],
                     "tuple[int, dict, bytes]"]


class WebHdfsError(IOError):
    def __init__(self, exception: str, message: str):
        super().__init__(f"{exception}: {message}")
        self.exception = exception


def _urllib_transport(method: str, url: str, body: "bytes | None"):
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(url, data=body, method=method)
    try:
        with opener.open(req, timeout=30) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:       # 307 lands here
        return e.code, dict(e.headers), e.read()


class WebHdfsClient:
    def __init__(self, base_url: str, *, user: "str | None" = None,
                 transport: "Transport | None" = None):
        self.base = base_url.rstrip("/")
        self.user = user
        self.transport = transport or _urllib_transport

    def _url(self, path: str, op: str, **params) -> str:
        qs = [f"op={op}"]
        if self.user:
            qs.append(f"user.name={self.user}")
        qs += [f"{k}={v}" for k, v in params.items() if v is not None]
        return (f"{self.base}/webhdfs/v1{quote(path)}?" + "&".join(qs))

    def _call(self, method: str, path: str, op: str,
              body: "bytes | None" = None, *, follow: bool = False,
              **params) -> "tuple[int, bytes]":
        status, headers, resp = self.transport(
            method, self._url(path, op, **params), None)
        if status == 307 and follow:
            loc = headers.get("Location") or headers.get("location")
            if not loc:
                raise WebHdfsError("ProtocolError", "307 without Location")
            status, headers, resp = self.transport(method, loc, body)
        if status >= 400:
            try:
                exc = json.loads(resp)["RemoteException"]
                raise WebHdfsError(exc.get("exception", "RemoteException"),
                                   exc.get("message", ""))
            except (ValueError, KeyError):
                raise WebHdfsError("HttpError", f"{status}") from None
        return status, resp

    # ---- namespace ops

    def list_status(self, path: str) -> "list[dict]":
        _s, body = self._call("GET", path, "LISTSTATUS")
        return json.loads(body)["FileStatuses"]["FileStatus"]

    def get_file_status(self, path: str) -> dict:
        _s, body = self._call("GET", path, "GETFILESTATUS")
        return json.loads(body)["FileStatus"]

    def open(self, path: str, *, offset: "int | None" = None,
             length: "int | None" = None) -> bytes:
        _s, body = self._call("GET", path, "OPEN", follow=True,
                              offset=offset, length=length)
        return body

    def create(self, path: str, data: bytes, *,
               overwrite: bool = False) -> None:
        s, _ = self._call("PUT", path, "CREATE", body=data, follow=True,
                          overwrite=str(overwrite).lower())
        if s != 201:
            raise WebHdfsError("ProtocolError", f"CREATE returned {s}")

    def mkdirs(self, path: str) -> bool:
        _s, body = self._call("PUT", path, "MKDIRS")
        return json.loads(body)["boolean"]

    def delete(self, path: str, *, recursive: bool = False) -> bool:
        _s, body = self._call("DELETE", path, "DELETE",
                              recursive=str(recursive).lower())
        return json.loads(body)["boolean"]


class ListHDFSSource:
    """Watermarked directory listing (ListHDFS): files with
    modificationTime > committed watermark, excluding the lag window
    (ListHDFS.java:121 — 100 ms), emitted exactly once. State commits
    via KVState AFTER the caller lands the batch
    (commit-then-checkpoint, like every source here)."""

    def __init__(self, client: WebHdfsClient, path: str, state: KVState,
                 *, key: "str | None" = None, lag_ms: int = 100,
                 now_ms: "Callable[[], int] | None" = None):
        self.client, self.path, self.state = client, path, state
        # keys become filenames in KVState — no path separators
        self.key = key or "webhdfs_" + path.strip("/").replace("/", "_")
        self.lag_ms = lag_ms
        self.now_ms = now_ms or (lambda: int(time.time() * 1000))

    def poll(self) -> "list[dict]":
        """→ new FILE entries (each with a full `path`), oldest first.
        Call `commit()` after landing them."""
        wm = int(self.state.get(self.key).get("mtime_ms", -1))
        boundary = self.now_ms() - self.lag_ms
        out = []
        for st in self.client.list_status(self.path):
            if st["type"] != "FILE":
                continue
            mt = int(st["modificationTime"])
            if wm < mt <= boundary:
                out.append({**st,
                            "path": f"{self.path.rstrip('/')}/"
                                    f"{st['pathSuffix']}"})
        out.sort(key=lambda e: (e["modificationTime"], e["path"]))
        self._pending_wm = max([wm] + [int(e["modificationTime"])
                                       for e in out])
        return out

    def commit(self) -> None:
        self.state.put(self.key, {"mtime_ms": self._pending_wm,
                                  "path": self.path})


# ------------------------------------------------------ fake transport


def fake_hdfs_transport(namespace: "dict[str, bytes | None]", *,
                        mtimes: "dict[str, int] | None" = None,
                        datanode: str = "http://dn1:9864"):
    """In-memory WebHDFS server as a transport function. `namespace`
    maps absolute paths → file bytes (None = directory); mutated by
    CREATE/DELETE. Directories are implicit from children too.
    Reproduces the two-step 307 dance: namenode OPEN/CREATE answer 307
    to `datanode`, which serves/accepts the bytes."""
    mtimes = mtimes if mtimes is not None else {}

    def _status(path: str) -> "dict | None":
        if path in namespace:
            data = namespace[path]
            is_dir = data is None
        elif any(p.startswith(path.rstrip("/") + "/")
                 for p in namespace):
            is_dir, data = True, None
        else:
            return None
        return {
            "pathSuffix": path.rsplit("/", 1)[-1],
            "type": "DIRECTORY" if is_dir else "FILE",
            "length": 0 if is_dir else len(data),
            "modificationTime": int(mtimes.get(path, 0)),
            "accessTime": 0, "blockSize": 134217728, "replication": 1,
            "owner": "hdfs", "group": "supergroup",
            "permission": "755" if is_dir else "644",
        }

    def _not_found(path: str):
        return 404, {}, json.dumps({"RemoteException": {
            "exception": "FileNotFoundException",
            "message": f"File does not exist: {path}"}}).encode()

    def transport(method: str, url: str, body: "bytes | None"):
        u = urlparse(url)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        op = q.get("op", "").upper()
        on_datanode = url.startswith(datanode)
        path = unquote(u.path)    # HTTP servers decode percent-escapes
        if path.startswith("/webhdfs/v1"):
            path = path[len("/webhdfs/v1"):] or "/"
        if method == "GET" and op == "LISTSTATUS":
            st = _status(path)
            if st is None:
                return _not_found(path)
            if st["type"] == "FILE":
                entries = [st]
            else:
                prefix = path.rstrip("/") + "/"
                names = sorted({p[len(prefix):].split("/", 1)[0]
                                for p in namespace
                                if p.startswith(prefix)})
                entries = [_status(prefix + n) for n in names]
            return 200, {}, json.dumps(
                {"FileStatuses": {"FileStatus": entries}}).encode()
        if method == "GET" and op == "GETFILESTATUS":
            st = _status(path)
            if st is None:
                return _not_found(path)
            return 200, {}, json.dumps({"FileStatus": st}).encode()
        if method == "GET" and op == "OPEN":
            if not on_datanode:
                return 307, {"Location": datanode + u.path + "?" +
                             u.query}, b""
            if namespace.get(path) is None:
                return _not_found(path)
            data = namespace[path]
            off = int(q.get("offset", 0))
            ln = int(q["length"]) if "length" in q else None
            end = off + ln if ln is not None else len(data)
            return 200, {}, data[off:end]
        if method == "PUT" and op == "CREATE":
            if not on_datanode:
                return 307, {"Location": datanode + u.path + "?" +
                             u.query}, b""
            if (path in namespace
                    and q.get("overwrite", "false") != "true"):
                return 403, {}, json.dumps({"RemoteException": {
                    "exception": "FileAlreadyExistsException",
                    "message": path}}).encode()
            namespace[path] = body or b""
            return 201, {"Location": f"webhdfs://{path}"}, b""
        if method == "PUT" and op == "MKDIRS":
            namespace.setdefault(path, None)
            return 200, {}, b'{"boolean": true}'
        if method == "DELETE" and op == "DELETE":
            if path not in namespace:
                return 200, {}, b'{"boolean": false}'
            del namespace[path]
            return 200, {}, b'{"boolean": true}'
        return 400, {}, json.dumps({"RemoteException": {
            "exception": "UnsupportedOperationException",
            "message": f"{method} {op}"}}).encode()

    return transport
