"""Portable 60-bit hash — identical in Spark and DuckDB (and Python).

Spark's xxhash64/hash and DuckDB's hash() disagree, so any operator whose
OUTPUT contains hash values (MinHash signatures, SimHash fingerprints,
LSH band keys) uses this instead: the first 15 hex chars of md5, read as
an integer (60 bits < 2^63, no overflow anywhere).

  Spark : conv(substr(md5(x), 1, 15), 16, 10)  cast long
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
  Python: int(hashlib.md5(x).hexdigest()[:15], 16)

md5 is ~3× slower than xxhash64 but still JVM-side and vectorizable;
engine-internal hashing (bucketing, checksums) keeps using xxhash64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F


def portable_hash64(col: Column | str, seed: str = "") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: str = "") -> str:
    """The same hash as DuckDB SQL (for oracle_sql generation)."""
    inner = f"concat('{seed}', {expr})" if seed else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def portable_hash64_py(value: str, seed: str = "") -> int:
    return int(hashlib.md5((seed + value).encode()).hexdigest()[:15], 16)
