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


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str, k: int,
                   threshold_num: int, threshold_den: int,
                   iters: int = 3
                   ) -> tuple[DataFrame, DataFrame]:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, then drop near-duplicates WITHIN each cluster —
    the trick that makes embedding dedup scale is that the pair join is
    an equi-join on cluster id (O(Σ|cluster|²) with k sized so clusters
    stay small), never an all-pairs product.

    Integer-exact in the int8 domain so the SQL twin replays
    bit-for-bit: with threshold t = num/den, a pair is a duplicate iff
    ``dot > 0 AND den²·dot² >= num²·|qi|²·|qj|²``  (⟺ cos >= t; the
    quantization scales cancel in cosine, the ann_topk_int8 argument).
    All products stay < 2^62 for dim ≤ 64 (dot ≤ 127²·64), ANSI-safe.
    The kept set is deterministic: the LOWEST id in a duplicate pair
    survives; any id that is the higher side of some duplicate pair
    drops (one pass — no transitive chasing, exactly the paper's
    keep-one-per-pair pruning).

    Returns (kept, dropped): kept = (id, cluster) rows that survive,
    dropped = distinct higher-side ids with their cluster."""
    assigned, _ = kmeans_int8(df, id_col, vec_col, k, iters)
    q = quantize_int8(df, id_col, vec_col).select(
        F.col(id_col), F.col("qvec"))
    withq = assigned.join(q, id_col).select(id_col, "cluster", "qvec")
    a = withq.select(F.col(id_col).alias("_i"),
                     F.col("cluster").alias("_ci"),
                     F.col("qvec").alias("_qi"))
    b = withq.select(F.col(id_col).alias("_j"),
                     F.col("cluster").alias("_cj"),
                     F.col("qvec").alias("_qj"))
    dot = F.aggregate(
        F.zip_with("_qi", "_qj", lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    norm = lambda c: F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    pairs = (a.join(b, (F.col("_ci") == F.col("_cj"))
                    & (F.col("_i") < F.col("_j")))
             .select("_i", "_j", "_cj", dot.alias("_dot"),
                     norm("_qi").alias("_ni"), norm("_qj").alias("_nj")))
    tn, td = threshold_num, threshold_den
    dup = pairs.filter(
        (F.col("_dot") > 0)
        & (F.lit(td * td) * F.col("_dot") * F.col("_dot")
           >= F.lit(tn * tn) * F.col("_ni") * F.col("_nj")))
    dropped = (dup.select(F.col("_j").alias(id_col),
                          F.col("_cj").alias("cluster")).distinct())
    kept = (withq.join(dropped.select(id_col), id_col, "left_anti")
            .select(id_col, "cluster"))
    return kept, dropped


def semantic_dedup_oracle_sql(vec_sql: str, k: int, iters: int, dim: int,
                              threshold_num: int, threshold_den: int,
                              id_col: str = "vec_id") -> str:
    """SQL twin of semantic_dedup: wraps the unrolled Lloyd CTEs as a
    subquery (the curate_diversity_sample pattern), re-derives qvec with
    the same quantization expression, and replays the in-cluster pair
    pruning. Returns (id_col, cluster) kept rows."""
    kmeans = kmeans_oracle_sql(vec_sql, k, iters, dim, id_col)
    dot = (f"list_sum(list_transform(range(1, {dim + 1}), "
           f"ii -> qi.qvec[ii] * qj.qvec[ii]))")
    nrm = (lambda t: f"list_sum(list_transform(range(1, {dim + 1}), "
                     f"ii -> {t}.qvec[ii] * {t}.qvec[ii]))")
    tn, td = threshold_num, threshold_den
    return f"""
WITH asg AS ({kmeans}),
vv AS ({vec_sql}),
qq AS (
  SELECT {id_col}, CASE WHEN s = 0 THEN
           list_transform(embedding, x -> 0::BIGINT)
         ELSE list_transform(embedding,
                x -> floor(x::DOUBLE / s * 127 + 0.5)::BIGINT) END AS qvec
  FROM (SELECT {id_col}, embedding,
               list_max(list_transform(embedding,
                                       x -> abs(x::DOUBLE))) AS s
        FROM vv)),
wq AS (SELECT a.{id_col}, a.cluster, q.qvec
       FROM asg a JOIN qq q USING ({id_col})),
dup AS (
  SELECT DISTINCT qj.{id_col}
  FROM wq qi JOIN wq qj
    ON qi.cluster = qj.cluster AND qi.{id_col} < qj.{id_col}
  WHERE {dot} > 0
    AND {td * td}::BIGINT * {dot} * {dot}
        >= {tn * tn}::BIGINT * {nrm('qi')} * {nrm('qj')})
SELECT {id_col}, cluster FROM wq
WHERE {id_col} NOT IN (SELECT {id_col} FROM dup)
"""
