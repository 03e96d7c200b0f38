"""PutIgniteCache / GetIgniteCache analogs (nifi-ignite-bundle).

NiFi ancestors:
- PutIgniteCache.java:200-320 — rows stream in batches (Batch Size
  default 250) through an IgniteDataStreamer with
  ``allowOverwrite(allow_override)`` (default false → an existing key
  is NOT replaced — streamer semantics, not an error); rows with an
  empty key or empty content route to failure WITH the reference's
  ``ignite.cache.batch.flow.file.*`` bookkeeping attributes
  (item number / total count / successful count / failed count).
- GetIgniteCache.java:85-120 — key from EL; empty key or a miss →
  failure, hit → content replaced by the cached bytes.

The cache itself is injectable — any dict-like store works, including
a MapCacheClient speaking the distributed-cache wire protocol
(sources/map_cache.py), which is exactly how a clustered deployment
would share it."""

from __future__ import annotations


class IgniteCache:
    """Minimal cache seam: dict semantics + streamer putIfAbsent."""

    def __init__(self):
        self.data: dict[str, bytes] = {}

    def stream(self, entries: "list[tuple[str, bytes]]",
               allow_override: bool) -> int:
        n = 0
        for k, v in entries:
            if allow_override or k not in self.data:
                self.data[k] = v
                n += 1
        return n

    def get(self, key: str) -> bytes | None:
        return self.data.get(key)


def put_ignite_cache(rows: "list[dict]", cache: IgniteCache, *,
                     key_field: str = "key",
                     content_field: str = "content",
                     batch_size: int = 250,
                     allow_override: bool = False):
    """Returns (successes, failures); failures carry the reference's
    batch bookkeeping attributes."""
    ok: list[dict] = []
    failed: list[dict] = []
    for start in range(0, len(rows), batch_size):
        batch = rows[start:start + batch_size]
        entries: list[tuple[str, bytes]] = []
        good: list[dict] = []
        for i, row in enumerate(batch):
            key = row.get(key_field)
            content = row.get(content_field)
            if isinstance(content, str):
                content = content.encode()
            if not key or not content:
                failed.append({
                    **row,
                    "ignite.cache.batch.flow.file.item.number": str(i),
                    "ignite.cache.batch.flow.file.total.count":
                        str(len(batch))})
                continue
            entries.append((str(key), content))
            good.append(row)
        cache.stream(entries, allow_override)
        for i, row in enumerate(good):
            ok.append({
                **row,
                "ignite.cache.batch.flow.file.successful.number": str(i),
                "ignite.cache.batch.flow.file.successful.count":
                    str(len(good)),
                "ignite.cache.batch.flow.file.failed.count":
                    str(len(batch) - len(good))})
    return ok, failed


def get_ignite_cache(rows: "list[dict]", cache: IgniteCache, *,
                     key_field: str = "key"):
    """Returns (hits, failures); hits get content replaced."""
    hits: list[dict] = []
    failed: list[dict] = []
    for row in rows:
        key = row.get(key_field)
        if not key:
            failed.append(row)
            continue
        value = cache.get(str(key))
        if value is None:
            failed.append(row)
        else:
            hits.append({**row, "content":
                         value.decode("utf-8", "surrogateescape")})
    return hits, failed
