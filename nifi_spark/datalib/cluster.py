"""Integer-exact k-means over int8-quantized embeddings.

Semantic clustering is the grouping step of embedding-space curation
(cluster-then-sample diversity selection, semantic dedup at the cluster
level, IVF coarse quantizer training). Floating-point k-means is not
replayable across engines (sum order changes the means), so this runs in
the INT8 domain: vectors quantize through datalib.similarity.quantize_int8
(floor(+0.5) half-up, already oracle-exact), distances are integer
squared-L2, and centroid updates are truncating integer division of
per-dimension sums — every iteration is exact, so ``kmeans_oracle_sql``
generates an unrolled-CTE twin that replays the whole run (the
perceptron/pagerank/BPE pattern).

Scale shape per iteration: centroids (k × dim ints) travel as plan
literals — assignment is one argmin projection over k inline distance
folds (no join, no shuffle); the update is one (cluster, dim) hash-agg
with map-side combine collapsing to k·dim longs on the driver. Seeding is
deterministic: the k lowest-id vectors. Ties in assignment go to the
lowest cluster index; empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nifi_spark.datalib.similarity import quantize_int8


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — matches Spark's `div`
    and DuckDB's `//` (python's // floors, which differs on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _dist_expr(vec_col: str, centroid: list[int]) -> F.Column:
    arr = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def kmeans_int8(df: DataFrame, id_col: str, vec_col: str, k: int,
                iters: int = 3) -> tuple[DataFrame, list[list[int]]]:
    """Returns (assignments, centroids): assignments = (id, cluster,
    dist) after `iters` exact Lloyd iterations in the int8 domain;
    centroids = the final k integer centroid vectors."""
    q = quantize_int8(df, id_col, vec_col).select(id_col, "qvec")
    q = q.localCheckpoint()  # quantize once; iterations re-scan this

    seeds = q.orderBy(id_col).limit(k).collect()
    if len(seeds) < k:
        raise ValueError(
            f"kmeans_int8: need at least k={k} input vectors, "
            f"got {len(seeds)}")
    cents: list[list[int]] = [list(r["qvec"]) for r in seeds]

    assigned = None
    for _ in range(iters):
        dists = F.array(*[_dist_expr("qvec", c) for c in cents])
        # two-stage projection: HOF folds are CodegenFallback (no
        # subexpression elimination) — materialize the distance array
        # once, then argmin over the plain column
        staged = q.select(F.col(id_col), F.col("qvec"), dists.alias("_d"))
        assigned = staged.select(
            F.col(id_col), F.col("qvec"),
            (F.array_position("_d", F.array_min("_d")) - 1)
            .cast("int").alias("cluster"),
            F.array_min("_d").alias("dist"))
        sums = (assigned
                .select("cluster", F.posexplode("qvec").alias("i", "v"))
                .groupBy("cluster", "i")
                .agg(F.sum("v").cast("long").alias("s"),
                     F.count("*").alias("n"))
                .collect())
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["i"]] = \
                (int(r["s"]), int(r["n"]))
        cents = [
            [_trunc_div(*by_cluster[j][i]) for i in sorted(by_cluster[j])]
            if j in by_cluster else cents[j]          # empty cluster keeps
            for j in range(k)]
    return assigned.select(id_col, "cluster", "dist"), cents


def kmeans_oracle_sql(vec_sql: str, k: int, iters: int, dim: int,
                      id_col: str = "vec_id") -> str:
    """SQL twin of kmeans_int8 (generated): `vec_sql` must yield
    (id_col, embedding FLOAT[]). Returns (id_col, cluster, dist)."""
    zip_dist = (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"ii -> (q.qvec[ii] - c.cvec[ii])"
                f" * (q.qvec[ii] - c.cvec[ii])))")
    ctes = [f"""v AS ({vec_sql}),
q AS (
  SELECT {id_col}, CASE WHEN s = 0 THEN
           list_transform(embedding, x -> 0::BIGINT)
         ELSE list_transform(embedding,
                x -> floor(x::DOUBLE / s * 127 + 0.5)::BIGINT) END AS qvec
  FROM (SELECT {id_col}, embedding,
               list_max(list_transform(embedding,
                                       x -> abs(x::DOUBLE))) AS s
        FROM v)),
c0 AS (
  SELECT (row_number() OVER (ORDER BY {id_col}) - 1)::INT AS cl,
         qvec AS cvec
  FROM (SELECT * FROM q ORDER BY {id_col} LIMIT {k}))"""]
    for t in range(1, iters + 1):
        ctes.append(f"""a{t} AS (
  SELECT {id_col}, qvec, cl AS cluster, d AS dist FROM (
    SELECT q.{id_col}, q.qvec, c.cl, {zip_dist} AS d,
           row_number() OVER (PARTITION BY q.{id_col}
                              ORDER BY {zip_dist}, c.cl) AS rn
    FROM q CROSS JOIN c{t - 1} c) WHERE rn = 1)""")
        if t == iters:
            break
        ctes.append(f"""s{t} AS (
  SELECT cluster, i, sum(v)::BIGINT AS s, count(*)::BIGINT AS n
  FROM (SELECT cluster, unnest(range(1, {dim + 1})) AS i,
               unnest(qvec) AS v
        FROM a{t})
  GROUP BY cluster, i)""")
        ctes.append(f"""c{t} AS (
  SELECT p.cl,
         coalesce(list(s.s // s.n ORDER BY s.i)
                    FILTER (WHERE s.i IS NOT NULL), p.cvec) AS cvec
  FROM c{t - 1} p LEFT JOIN s{t} s ON s.cluster = p.cl
  GROUP BY p.cl, p.cvec)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT {id_col}, cluster, dist FROM a{iters}")
