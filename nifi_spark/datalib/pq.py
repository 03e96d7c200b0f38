"""Product quantization (PQ) ANN — compressed-domain similarity search.

Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split d-dim vectors into M subspaces, k-means
each subspace to K centroids, store each vector as M small codes, and
answer queries by Asymmetric Distance Computation (ADC) — the query's
M×K table of exact subspace distances is summed over each vector's
codes. Completes the engine's ANN ladder (brute cosine → LSH / IVF
candidates → int8 re-rank → PQ compressed scan): at d=64 the code
table is M=4 bytes/vector vs 256 bytes of floats — the shape whose
full scan stays cheap at 100 TB.

Spark contract (audited):
- `pq_train`: M independent integer Lloyd runs over SLICES of the
  int8-quantized corpus (quantize once, localCheckpoint, slice per
  subspace). Driver state is M·K·(d/M) ints — KBs. Same update rule
  as cluster.kmeans_int8 (truncating integer mean, empty cluster
  keeps its centroid, seeds = first K by id).
- `pq_encode`: three ZERO-EXCHANGE codegen projections (slice →
  per-subspace distance arrays → argmin codes). HOF folds are
  CodegenFallback (no subexpression elimination), hence the staging —
  the distance array is materialized once per subspace, never
  recomputed for the argmin pass.
- `pq_adc_topk`: the query distance table is computed driver-side
  (M·K integer cells per query) and BROADCAST-joined to the
  posexploded code column; per-(query, vector) sums shuffle only
  (query_id, id, partial) and the top-k cut is a per-query window.
  No cross join, no full-width rows.

Exactness: everything is integer (int8 values, squared L2, truncating
division), so `pq_train_encode_oracle_sql` replays the ENTIRE
training + encode in generated DuckDB SQL — one Lloyd CTE chain per
subspace — and the ADC gate replays scoring from a closed-form
codebook. Ties break identically everywhere: argmin takes the LOWEST
centroid index (array_position-of-min vs row_number ORDER BY d, j).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nifi_spark.datalib.cluster import _dist_expr, _trunc_div
from nifi_spark.datalib.similarity import quantize_int8


def _sub_slices(m: int, dim: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    return [(mi * sd + 1, sd) for mi in range(m)]


def pq_train(df: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", m: int = 4, k: int = 16,
             iters: int = 3, dim: "int | None" = None
             ) -> list[list[list[int]]]:
    """Train M subspace codebooks: int8-quantize the corpus once,
    then run `iters` exact integer Lloyd iterations per subspace
    slice. Returns codebooks[mi][j] = centroid (len d/M ints) AFTER
    the final update — the state `pq_encode` should be handed."""
    q = quantize_int8(df, id_col, vec_col).select(id_col, "qvec")
    q = q.localCheckpoint()      # quantize once; every Lloyd re-scans
    seeds = q.orderBy(id_col).limit(k).collect()
    if not seeds:
        raise ValueError("pq_train: empty input")
    if dim is None:
        dim = len(seeds[0]["qvec"])
    if len(seeds) < k:
        raise ValueError(f"pq_train: need at least k={k} vectors, "
                         f"got {len(seeds)}")
    slices = _sub_slices(m, dim)
    sd = dim // m
    # codebooks[mi][j]: seeded from the first k vectors' slices
    codebooks: list[list[list[int]]] = [
        [list(r["qvec"][start - 1:start - 1 + sd]) for r in seeds]
        for start, _ in slices]
    # all M subspace slices staged once; each Lloyd iteration is ONE
    # aggregation job grouped by (m, cluster, i) — the r4 review's
    # job-count fix (was M independent jobs per iteration)
    staged0 = q.select(
        F.col(id_col),
        *[F.slice("qvec", start, sdi).alias(f"_sub{mi}")
          for mi, (start, sdi) in enumerate(slices)])
    for _ in range(iters):
        dists = staged0.select(
            F.col(id_col),
            *[F.col(f"_sub{mi}") for mi in range(m)],
            *[F.array(*[_dist_expr(f"_sub{mi}", c)
                        for c in codebooks[mi]]).alias(f"_d{mi}")
              for mi in range(m)])
        per_m = F.array(*[
            F.struct(
                F.lit(mi).alias("m"),
                (F.array_position(f"_d{mi}", F.array_min(f"_d{mi}"))
                 - 1).cast("int").alias("cluster"),
                F.col(f"_sub{mi}").alias("sub"))
            for mi in range(m)])
        sums = (dists.select(F.explode(per_m).alias("t"))
                .select(F.col("t.m").alias("m"),
                        F.col("t.cluster").alias("cluster"),
                        F.posexplode("t.sub").alias("i", "v"))
                .groupBy("m", "cluster", "i")
                .agg(F.sum("v").cast("long").alias("s"),
                     F.count("*").alias("n"))
                .collect())
        by_m: list[dict[int, dict[int, tuple[int, int]]]] = \
            [{} for _ in range(m)]
        for r in sums:
            by_m[r["m"]].setdefault(r["cluster"], {})[r["i"]] = \
                (int(r["s"]), int(r["n"]))
        codebooks = [
            [[_trunc_div(*by_cl[j][i]) for i in sorted(by_cl[j])]
             if j in by_cl else codebooks[mi][j]
             for j in range(k)]
            for mi, by_cl in enumerate(by_m)]
    return codebooks


def pq_encode(qdf: DataFrame, codebooks: list[list[list[int]]],
              id_col: str = "vec_id", vec_col: str = "qvec",
              out_col: str = "codes") -> DataFrame:
    """Int8 vectors → M-code arrays against `codebooks`. Three
    zero-exchange projections; argmin ties take the lowest centroid
    index. Output: (id_col, out_col array<int>)."""
    m = len(codebooks)
    sd = len(codebooks[0][0])
    dim = m * sd
    staged = qdf.select(
        F.col(id_col),
        *[F.slice(vec_col, start, sdi).alias(f"_sub{mi}")
          for mi, (start, sdi) in enumerate(_sub_slices(m, dim))])
    dists = staged.select(
        F.col(id_col),
        *[F.array(*[_dist_expr(f"_sub{mi}", c)
                    for c in codebooks[mi]]).alias(f"_d{mi}")
          for mi in range(m)])
    return dists.select(
        F.col(id_col),
        F.array(*[(F.array_position(f"_d{mi}", F.array_min(f"_d{mi}"))
                   - 1).cast("int") for mi in range(m)])
        .alias(out_col))


def pq_distance_table(qvec: list[int],
                      codebooks: list[list[list[int]]]
                      ) -> list[tuple[int, int, int]]:
    """ADC table for ONE query vector: exact integer squared-L2 from
    each query subvector to each centroid → [(m, j, dist)]."""
    out: list[tuple[int, int, int]] = []
    sd = len(codebooks[0][0])
    for mi, cents in enumerate(codebooks):
        sub = qvec[mi * sd:(mi + 1) * sd]
        for j, c in enumerate(cents):
            out.append((mi, j,
                        sum((int(a) - int(b)) ** 2
                            for a, b in zip(sub, c))))
    return out


def pq_adc_topk(codes_df: DataFrame,
                queries: list[tuple[int, list[int]]],
                codebooks: list[list[list[int]]], topk: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric distance top-k: per query, sum its broadcast M×K
    distance table over each vector's codes, then window-cut to
    `topk` (ties by id). Output: (query_id, id_col, adist, rank)."""
    spark = codes_df.sparkSession
    rows = [(qid, mi, j, d) for qid, qvec in queries
            for mi, j, d in pq_distance_table(qvec, codebooks)]
    tbl = spark.createDataFrame(
        rows, "query_id bigint, m int, j int, dist bigint")
    ex = codes_df.select(F.col(id_col),
                         F.posexplode("codes").alias("m", "code"))
    scored = (ex.join(F.broadcast(tbl),
                      (ex["m"] == tbl["m"]) & (ex["code"] == tbl["j"]))
              .groupBy("query_id", id_col)
              .agg(F.sum("dist").cast("long").alias("adist")))
    w = Window.partitionBy("query_id").orderBy("adist", id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


def ivf_assign(qdf: DataFrame, centroids: list[list[int]],
               id_col: str = "vec_id", vec_col: str = "qvec",
               out_col: str = "cell") -> DataFrame:
    """Assign each int8 vector to its nearest inverted-file cell
    (integer squared L2, lowest-index ties) — two staged
    zero-exchange projections, centroids as literals."""
    staged = qdf.select(
        F.col(id_col), F.col(vec_col),
        F.array(*[_dist_expr(vec_col, c) for c in centroids])
        .alias("_d"))
    return staged.select(
        F.col(id_col), F.col(vec_col),
        (F.array_position("_d", F.array_min("_d")) - 1)
        .cast("int").alias(out_col))


def pq_ivf_topk(qdf: DataFrame, ivf_centroids: list[list[int]],
                codebooks: list[list[list[int]]],
                queries: list[tuple[int, list[int]]], *,
                nprobe: int = 4, topk: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "qvec") -> DataFrame:
    """IVF-PQ — the production ANN shape at scale (Jégou 2011 §V):
    vectors live in inverted-file cells; a query probes only its
    `nprobe` nearest cells and scores those candidates with the
    PQ ADC table. Probe pairs and distance tables are tiny driver
    lists broadcast into equi-joins; the corpus side is scanned once
    for assignment + encode (both zero-exchange) and candidates
    shuffle only as (query_id, id, partial-sum) tuples. Output:
    (query_id, id_col, adist, rank)."""
    spark = qdf.sparkSession
    assigned = ivf_assign(qdf, ivf_centroids, id_col, vec_col)
    codes = pq_encode(qdf, codebooks, id_col=id_col, vec_col=vec_col)
    base = assigned.select(id_col, "cell").join(codes, id_col)

    probe_rows = []
    for qid, qvec in queries:
        dists = sorted(
            (sum((int(a) - int(b)) ** 2 for a, b in zip(qvec, c)), j)
            for j, c in enumerate(ivf_centroids))
        for _, j in dists[:nprobe]:
            probe_rows.append((qid, j))
    probes = spark.createDataFrame(probe_rows,
                                   "query_id bigint, cell int")
    cands = base.join(F.broadcast(probes), "cell") \
                .select("query_id", id_col, "codes")

    trows = [(qid, mi, j, d) for qid, qvec in queries
             for mi, j, d in pq_distance_table(qvec, codebooks)]
    tbl = spark.createDataFrame(
        trows, "query_id bigint, m int, j int, dist bigint")
    ex = cands.select("query_id", id_col,
                      F.posexplode("codes").alias("m", "code"))
    scored = (ex.join(F.broadcast(tbl),
                      (ex["query_id"] == tbl["query_id"])
                      & (ex["m"] == tbl["m"]) & (ex["code"] == tbl["j"]))
              .groupBy(ex["query_id"], id_col)
              .agg(F.sum("dist").cast("long").alias("adist")))
    w = Window.partitionBy("query_id").orderBy("adist", id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


# ------------------------------------------------------------ oracles


_Q_CTE = """q AS (
  SELECT {id}, CASE WHEN s = 0 THEN
           list_transform(embedding, x -> 0::BIGINT)
         ELSE list_transform(embedding,
                x -> floor(x::DOUBLE / s * 127 + 0.5)::BIGINT) END AS qvec
  FROM (SELECT {id}, embedding,
               list_max(list_transform(embedding,
                                       x -> abs(x::DOUBLE))) AS s
        FROM v))"""


def pq_train_encode_oracle_sql(vec_sql: str, m: int, k: int,
                               iters: int, dim: int,
                               id_col: str = "vec_id") -> str:
    """Generated SQL twin of pq_train + pq_encode: one Lloyd CTE
    chain per subspace (seeds = first k by id, truncating `//` means,
    empty cluster keeps its centroid), encode = argmin against the
    post-final-update centroids. `vec_sql` must yield
    (id_col, embedding FLOAT[]). Returns (id_col, m, code)."""
    sd = dim // m
    if sd * m != dim:
        raise ValueError("dim not divisible by m")
    zd = (f"list_sum(list_transform(range(1, {sd + 1}), "
          f"ii -> (s.sub[ii] - c.cvec[ii])"
          f" * (s.sub[ii] - c.cvec[ii])))")
    ctes = [f"v AS ({vec_sql})", _Q_CTE.format(id=id_col)]
    encs = []
    for mi in range(m):
        a, b = mi * sd + 1, (mi + 1) * sd
        p = f"m{mi}"
        ctes.append(f"""{p}s AS (
  SELECT {id_col}, qvec[{a}:{b}] AS sub FROM q)""")
        ctes.append(f"""{p}c0 AS (
  SELECT (row_number() OVER (ORDER BY {id_col}) - 1)::INT AS cl,
         sub AS cvec
  FROM (SELECT * FROM {p}s ORDER BY {id_col} LIMIT {k}))""")
        for t in range(1, iters + 1):
            ctes.append(f"""{p}a{t} AS (
  SELECT {id_col}, sub, cl AS cluster FROM (
    SELECT s.{id_col}, s.sub, c.cl,
           row_number() OVER (PARTITION BY s.{id_col}
                              ORDER BY {zd}, c.cl) AS rn
    FROM {p}s s CROSS JOIN {p}c{t - 1} c) WHERE rn = 1)""")
            ctes.append(f"""{p}u{t} AS (
  SELECT cluster, i, sum(vv)::BIGINT AS sm, count(*)::BIGINT AS n
  FROM (SELECT cluster, unnest(range(1, {sd + 1})) AS i,
               unnest(sub) AS vv
        FROM {p}a{t})
  GROUP BY cluster, i)""")
            ctes.append(f"""{p}c{t} AS (
  SELECT pp.cl,
         coalesce(list(u.sm // u.n ORDER BY u.i)
                    FILTER (WHERE u.i IS NOT NULL), pp.cvec) AS cvec
  FROM {p}c{t - 1} pp LEFT JOIN {p}u{t} u ON u.cluster = pp.cl
  GROUP BY pp.cl, pp.cvec)""")
        ctes.append(f"""{p}e AS (
  SELECT {id_col}, {mi} AS m, cl AS code FROM (
    SELECT s.{id_col}, c.cl,
           row_number() OVER (PARTITION BY s.{id_col}
                              ORDER BY {zd}, c.cl) AS rn
    FROM {p}s s CROSS JOIN {p}c{iters} c) WHERE rn = 1)""")
        encs.append(f"SELECT * FROM {p}e")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(encs))
