"""Integer k-means (datalib/cluster.py): numpy reference, the DuckDB
twin, and clustering sanity on separable blobs."""

import numpy as np
import pandas as pd


def _np_kmeans_int8(X, k, iters):
    # quantize: floor(x / max|x| * 127 + 0.5)
    Q = []
    for row in X:
        s = np.abs(row).max()
        Q.append(np.zeros(len(row), dtype=np.int64) if s == 0 else
                 np.floor(row / s * 127 + 0.5).astype(np.int64))
    Q = np.stack(Q)
    cents = [Q[i].copy() for i in range(k)]  # ids are 0..n-1 in tests

    def trunc(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    assign = None
    for _ in range(iters):
        d = np.stack([((Q - c) ** 2).sum(axis=1) for c in cents], axis=1)
        assign = d.argmin(axis=1)          # argmin -> first (lowest) index
        dist = d.min(axis=1)
        for j in range(k):
            rows = Q[assign == j]
            if len(rows):
                s = rows.sum(axis=0)
                cents[j] = np.array([trunc(int(v), len(rows)) for v in s])
    return assign, dist, cents


def _blobs(n=90, dim=8, k=3, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, size=(k, dim))
    X, y = [], []
    for i in range(n):
        j = i % k
        X.append(centers[j] + rng.normal(0, 0.4, dim))
        y.append(j)
    return np.array(X, dtype=np.float32), np.array(y)


def test_kmeans_matches_numpy_reference(spark):
    from nifi_spark.datalib.cluster import kmeans_int8
    X, _ = _blobs()
    pdf = pd.DataFrame({"vec_id": range(len(X)),
                        "embedding": [r.tolist() for r in X]})
    got, cents = kmeans_int8(spark.createDataFrame(pdf), "vec_id",
                             "embedding", k=3, iters=3)
    rows = {r["vec_id"]: (r["cluster"], r["dist"]) for r in got.collect()}
    a, d, c = _np_kmeans_int8(X.astype(np.float64), 3, 3)
    for i in range(len(X)):
        assert rows[i] == (a[i], d[i]), i
    assert [list(cc) for cc in c] == [list(cc) for cc in cents]


def test_kmeans_recovers_blobs(spark):
    from nifi_spark.datalib.cluster import kmeans_int8
    X, y = _blobs(n=120, dim=8, k=3, seed=9)
    pdf = pd.DataFrame({"vec_id": range(len(X)),
                        "embedding": [r.tolist() for r in X]})
    got, _ = kmeans_int8(spark.createDataFrame(pdf), "vec_id",
                         "embedding", k=3, iters=4)
    rows = {r["vec_id"]: r["cluster"] for r in got.collect()}
    # cluster labels are a permutation of the true blob labels: purity
    from collections import Counter
    pure = 0
    for j in range(3):
        members = [rows[i] for i in range(len(X)) if y[i] == j]
        pure += Counter(members).most_common(1)[0][1]
    assert pure / len(X) >= 0.95


def test_kmeans_oracle_sql_replays_iterations(spark):
    import duckdb
    from nifi_spark.datalib.cluster import kmeans_int8, kmeans_oracle_sql
    X, _ = _blobs(n=60, dim=6, k=4, seed=17)
    pdf = pd.DataFrame({"vec_id": range(len(X)),
                        "embedding": [r.tolist() for r in X]})
    got, _ = kmeans_int8(spark.createDataFrame(pdf), "vec_id",
                         "embedding", k=4, iters=3)
    g = got.toPandas().sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM t", k=4, iters=3, dim=6)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (g["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()
    assert (g["dist"].to_numpy() == exp["dist"].to_numpy()).all()


def test_semantic_dedup_drops_planted_copies(spark):
    from nifi_spark.datalib.cluster import semantic_dedup
    X, _ = _blobs(n=60, dim=8, k=3)
    rows = [(i, r.tolist()) for i, r in enumerate(X)]
    # plant exact copies of every 5th vector at id+1000
    planted = [(i + 1000, v) for i, v in rows if i % 5 == 0]
    df = spark.createDataFrame(rows + planted,
                               "vec_id long, embedding array<float>")
    # blob-mates are directionally near-parallel (cos ~0.999), so use
    # threshold 1: only exactly-parallel quantized vectors (the planted
    # copies) are duplicates
    kept, dropped = semantic_dedup(df, "vec_id", "embedding", k=3,
                                   threshold_num=1, threshold_den=1,
                                   iters=2)
    dropped_ids = {r.vec_id for r in dropped.collect()}
    kept_ids = {r.vec_id for r in kept.collect()}
    assert {i + 1000 for i, _ in rows if i % 5 == 0} <= dropped_ids
    assert dropped_ids.isdisjoint(kept_ids)
    assert kept_ids | dropped_ids == {i for i, _ in rows + planted}
    # every original survives (copies carry the higher id)
    assert {i for i, _ in rows} <= kept_ids


def test_semantic_dedup_oracle_twin(spark, tmp_path):
    import duckdb

    from nifi_spark.datalib.cluster import (semantic_dedup,
                                            semantic_dedup_oracle_sql)
    X, _ = _blobs(n=45, dim=8, k=3, seed=9)
    rows = [(i, r.tolist()) for i, r in enumerate(X)]
    rows += [(i + 500, v) for i, v in rows if i % 7 == 0]
    pdf = pd.DataFrame({"vec_id": [i for i, _ in rows],
                        "embedding": [v for _, v in rows]})
    df = spark.createDataFrame(pdf)
    kept, _ = semantic_dedup(df, "vec_id", "embedding", k=3,
                             threshold_num=9, threshold_den=10, iters=2)
    got = sorted((r.vec_id, r.cluster) for r in kept.collect())
    con = duckdb.connect()
    con.register("vecs", pdf)
    sql = semantic_dedup_oracle_sql(
        "SELECT vec_id, embedding FROM vecs", k=3, iters=2, dim=8,
        threshold_num=9, threshold_den=10)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
