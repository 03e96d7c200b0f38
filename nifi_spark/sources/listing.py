"""Timestamp-watermark file listing — the ListFile/ListHDFS analog.

Semantics contract from AbstractListProcessor (nifi-nar-bundles/
nifi-standard-bundle/nifi-standard-processors/src/main/java/org/apache/
nifi/processors/standard/AbstractListProcessor.java:64-92): emit each
entity exactly once, track the newest seen timestamp, and do NOT emit
entities carrying the boundary timestamp until a lag interval has passed
(:159-161, :384) — a same-millisecond writer could still be adding files.

The listing itself is driver-side os.scandir (sandbox stand-in); on a
real deployment the file inventory would come from a cloud listing API
or an Iceberg metadata table and flow through the identical watermark
logic.
"""

from __future__ import annotations

import os
import time


def list_new_files(root: str, after_mtime: float,
                   lag_seconds: float = 0.1,
                   suffix: str | None = None) -> tuple[list[dict], float]:
    """Files with mtime > after_mtime, excluding the lag window.

    Returns (entries, new_watermark); commit new_watermark to the ledger
    only after the downstream batch commits (commit-then-checkpoint).
    """
    now = time.time()
    boundary = now - lag_seconds
    out: list[dict] = []
    wm = after_mtime
    for dirpath, _, files in os.walk(root):
        for name in files:
            if suffix and not name.endswith(suffix):
                continue
            p = os.path.join(dirpath, name)
            st = os.stat(p)
            if st.st_mtime > after_mtime and st.st_mtime <= boundary:
                out.append({"path": p, "mtime": st.st_mtime,
                            "size": st.st_size})
                wm = max(wm, st.st_mtime)
    out.sort(key=lambda e: (e["mtime"], e["path"]))
    return out, wm
