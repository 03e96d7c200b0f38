"""HTTP incremental pull — the GetHTTP ETag/Last-Modified ledger pattern.

NiFi ancestor: GetHTTP (standard/GetHTTP.java:117-118,229-233) persists
the last ETag + Last-Modified in processor state and sends
If-None-Match / If-Modified-Since on every poll, so an unchanged
resource costs one 304 and no transfer. Same pattern here, with the
state in a KVState file beside the offset ledger: the driver polls (a
singleton control-plane action, exactly like NiFi's primary-node-only
scheduling), and the fetched payload is then parallelized as a normal
DataFrame for the data plane.

The network call is injectable (`fetcher`) — the default uses urllib;
tests inject a fake, and sandboxed environments never need a socket.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from nifi_spark.ledger import KVState

# fetcher(url, etag, last_modified) -> (status, body, etag, last_modified)
Fetcher = Callable[[str, str | None, str | None],
                   tuple[int, bytes | None, str | None, str | None]]


def _urllib_fetcher(url: str, etag: str | None,
                    last_modified: str | None):
    import urllib.error
    import urllib.request
    req = urllib.request.Request(url)
    if etag:
        req.add_header("If-None-Match", etag)
    if last_modified:
        req.add_header("If-Modified-Since", last_modified)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return (resp.status, resp.read(),
                    resp.headers.get("ETag"),
                    resp.headers.get("Last-Modified"))
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return 304, None, etag, last_modified
        raise


class HttpIncrementalSource:
    """Conditional-GET poller with persisted ETag/Last-Modified state."""

    def __init__(self, url: str, state: KVState, key: str | None = None,
                 fetcher: Fetcher | None = None):
        self.url = url
        self.state = state
        # stable digest, NOT builtin hash(): hash(str) is randomized per
        # process (PYTHONHASHSEED), which would orphan the persisted
        # ETag/Last-Modified state on every driver restart and silently
        # defeat the conditional-GET pattern this class exists for.
        self.key = key or "http_" + hashlib.md5(url.encode()).hexdigest()
        self.fetcher = fetcher or _urllib_fetcher

    def poll(self) -> bytes | None:
        """One poll: returns the body when the resource changed, None on
        304/unchanged. State commits AFTER a successful fetch, so a
        crash mid-poll re-fetches (at-least-once, same as GetHTTP)."""
        st = self.state.get(self.key)
        status, body, etag, last_mod = self.fetcher(
            self.url, st.get("etag"), st.get("last_modified"))
        if status == 304:
            return None
        if status != 200:
            raise IOError(f"GET {self.url} -> {status}")
        self.state.put(self.key, {"etag": etag, "last_modified": last_mod,
                                  "url": self.url})
        return body
