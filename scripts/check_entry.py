"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, then compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified). Exact
match required — floats must already be rounded/decimal'd upstream.

Usage: python scripts/check_entry.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import hashlib
import sys
import time
import functools
print = functools.partial(print, flush=True)  # noqa: A001 — driver may kill partial runs; keep every completed row on disk

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted("\x1f".join(norm_cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from nifi_spark.session import get_spark
    spark = get_spark("check-entry")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            fails.append(name)
            continue
        spark_sec = time.time() - t0
        if name not in oracles:
            print(f"okNO {name}: rows={len(sdf)} (no oracle, rows-only) "
                  f"[{spark_sec:.1f}s]")
            if len(sdf) == 0:
                fails.append(name)
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            fails.append(name)
            continue
        sn, sc, sh = table_hash(sdf)
        on, oc, oh = table_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: spark={sn} oracle={on} "
              f"cols={'=' if sc == oc else f'{sc} vs {oc}'} "
              f"hash={'=' if sh == oh else f'{sh} vs {oh}'} [{spark_sec:.1f}s]")
        if not ok:
            fails.append(name)
            if sn == on and sc == oc:
                m = sdf[sorted(sdf.columns)].copy()
                o = odf[sorted(odf.columns)].copy()
                ms = sorted(map(tuple, m.values.tolist()))
                os_ = sorted(map(tuple, o.values.tolist()))
                for a, b in zip(ms, os_):
                    if tuple(norm_cell(x) for x in a) != tuple(norm_cell(x) for x in b):
                        print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                        break
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
