"""Similarity search over embedding columns (array<float>).

* cosine_pairs / ann_topk — brute-force baselines. `exact=True` computes
  the dot/norm sums in DECIMAL so results are bit-identical to a DuckDB
  oracle (float addition is non-associative; decimal is exact); the
  default double path uses zip_with + aggregate (JVM-side fold, one pass,
  no explode) for throughput.
* lsh_ann_topk — the scale path: random-hyperplane LSH. Hyperplanes are
  derived from the portable hash (deterministic, no RNG state), each
  vector gets a `bits`-bit bucket signature; candidates share a bucket
  (multi-probe: exact bucket + optional 1-bit flips), then exact cosine
  re-ranks within buckets. At 10^9 vectors the bucket join replaces the
  O(n·q) cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nifi_spark.functions.portable_hash import portable_hash64_py


def _dot_double(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


_DEC = "decimal(38,18)"


def _dot_dec(a, b):
    """Decimal dot fold (JVM-side, no explode): products cast to
    decimal(38,18), accumulator re-cast each step (Spark's +-widening
    would drift the scale). Bit-parity with a DuckDB sum of the same
    decimal products holds to ~1e-17 — far inside the 1e-6 rounding all
    exact-mode cosines apply before comparison. Replaces the
    position-exploded join shape, whose 'pos' join key has only `dim`
    distinct values — a pathologically skewed shuffle that made the
    brute-force oracle paths ~10× slower than this zero-shuffle fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast(_DEC)),
                       F.lit(0).cast(_DEC),
                       lambda acc, x: (acc + x).cast(_DEC))


def _norm_double(a):
    return F.sqrt(_dot_double(a, a))


def cosine(a, b):
    return _dot_double(a, b) / (_norm_double(a) * _norm_double(b))


def cosine_pairs(df: DataFrame, id_col: str, vec_col: str,
                 threshold: float = 0.95, exact: bool = False) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (brute force)."""
    if not exact:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        va = F.transform(F.col("va"), lambda x: x.cast("double"))
        vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
        return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cosine", F.round(cosine(va, vb), 6))
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine"))
    # exact/decimal path: zero-shuffle crossJoin + decimal dot fold (see
    # _dot_dec) — numerically matches a DuckDB oracle summing the same
    # decimal products, without the skewed position-join shape.
    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    a = (df.select(F.col(id_col).alias("id_a"), dv(F.col(vec_col)).alias("va"))
         .withColumn("nsq_a", _dot_dec(F.col("va"), F.col("va"))))
    b = (df.select(F.col(id_col).alias("id_b"), dv(F.col(vec_col)).alias("vb"))
         .withColumn("nsq_b", _dot_dec(F.col("vb"), F.col("vb"))))
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine",
                        F.round(_dot_dec(F.col("va"), F.col("vb"))
                                .cast("double") /
                                (F.sqrt(F.col("nsq_a").cast("double")) *
                                 F.sqrt(F.col("nsq_b").cast("double"))), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ann_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 5,
             queries: DataFrame | None = None, exact: bool = False) -> DataFrame:
    """Top-k cosine neighbors per query vector (brute-force baseline).

    queries defaults to the full df (all-pairs top-k). Ties break on
    neighbor id ascending (deterministic).
    """
    q = queries if queries is not None else df
    if not exact:
        qq = q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
        cc = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
        vq = F.transform(F.col("vq"), lambda x: x.cast("double"))
        vc = F.transform(F.col("vc"), lambda x: x.cast("double"))
        scored = (F.broadcast(qq).crossJoin(cc)
                  .filter(F.col("query_id") != F.col("neighbor_id"))
                  .withColumn("cosine", F.round(cosine(vq, vc), 6)))
    else:
        dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
        qq = (q.select(F.col(id_col).alias("query_id"),
                       dv(F.col(vec_col)).alias("vq"))
              .withColumn("nsq_q", _dot_dec(F.col("vq"), F.col("vq"))))
        cc = (df.select(F.col(id_col).alias("neighbor_id"),
                        dv(F.col(vec_col)).alias("vc"))
              .withColumn("nsq_c", _dot_dec(F.col("vc"), F.col("vc"))))
        scored = (F.broadcast(qq).crossJoin(cc)
                  .filter(F.col("query_id") != F.col("neighbor_id"))
                  .withColumn("cosine",
                              F.round(_dot_dec(F.col("vq"), F.col("vc"))
                                      .cast("double") /
                                      (F.sqrt(F.col("nsq_q").cast("double")) *
                                       F.sqrt(F.col("nsq_c").cast("double"))), 6)))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def ivf_ann_topk(df: DataFrame, id_col: str, vec_col: str, k: int = 5,
                 sample_mod: int = 32, nprobe: int = 3,
                 queries: DataFrame | None = None,
                 exact: bool = False) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path next to
    hyperplane LSH: a coarse quantizer partitions the corpus into cells,
    queries probe only the nprobe nearest cells.

    Centroids are a DETERMINISTIC sample of the corpus's own vectors
    (ids where portable_hash('ivf:'||id) % sample_mod == 0, ~n/sample_mod
    cells) — no RNG state, reproducible in a SQL oracle, and in practice
    a random corpus sample is the standard k-means initialization anyway
    (one Lloyd refinement would sharpen cells but adds nothing to the
    plan shape). Assignment ranks by dot(v, c)/||c|| (the vector's own
    norm can't change its argmax). Plan: centroids broadcast →
    assignment is one narrow pass; candidate generation is a join on
    cell id (like the LSH bucket join); exact cosine re-ranks within
    probed cells. At 10^9 vectors pick sample_mod ≈ sqrt(n) for
    ~sqrt(n)-sized cells.

    exact=True does all sums in decimal (bit-stable vs DuckDB).
    """
    from nifi_spark.functions.portable_hash import portable_hash64
    DEC = "decimal(38,18)"

    def fold_dot(a, b):
        if exact:
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: (x * y).cast(DEC)),
                F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC))
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731

    cents = (df.filter(F.pmod(portable_hash64(
                 F.col(id_col).cast("string"), seed="ivf:"),
                 F.lit(sample_mod)) == 0)
             .select(F.col(id_col).alias("centroid_id"),
                     dv(F.col(vec_col)).alias("cvec"))
             .withColumn("cnorm", F.sqrt(fold_dot(F.col("cvec"),
                                                  F.col("cvec"))
                                         .cast("double"))))

    def cell_rank(src: DataFrame, out_id: str, n_keep: int) -> DataFrame:
        scored = (src.select(F.col(id_col).alias(out_id),
                             dv(F.col(vec_col)).alias("v"))
                  .crossJoin(F.broadcast(cents))
                  .select(out_id, "centroid_id",
                          F.round(fold_dot(F.col("v"), F.col("cvec"))
                                  .cast("double") / F.col("cnorm"), 6)
                          .alias("score")))
        w = Window.partitionBy(out_id).orderBy(F.col("score").desc(),
                                               F.col("centroid_id").asc())
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= n_keep)
                .select(out_id, "centroid_id", "_rn"))

    qsrc = queries if queries is not None else df
    if queries is None:
        # self-query: one centroid scan serves both the corpus
        # assignment (rank 1) and the query probes (rank <= nprobe)
        ranked = cell_rank(df, "query_id", max(1, nprobe)).localCheckpoint()
        assign = (ranked.filter(F.col("_rn") == 1)
                  .select(F.col("query_id").alias("neighbor_id"),
                          "centroid_id"))
        probe = ranked.select("query_id", "centroid_id")
    else:
        assign = cell_rank(df, "neighbor_id", 1).drop("_rn")
        probe = cell_rank(qsrc, "query_id", nprobe).drop("_rn")
    cand = (probe.join(assign, "centroid_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())

    # exact cosine re-rank within probed cells (decimal fold — see
    # _dot_dec; the position-exploded join shape was a skewed shuffle)
    if exact:
        qv = (qsrc.select(F.col(id_col).alias("query_id"),
                          dv(F.col(vec_col)).alias("vq"))
              .withColumn("nsq_q", _dot_dec(F.col("vq"), F.col("vq"))))
        cvv = (df.select(F.col(id_col).alias("neighbor_id"),
                         dv(F.col(vec_col)).alias("vc"))
               .withColumn("nsq_c", _dot_dec(F.col("vc"), F.col("vc"))))
        scored = (cand.join(qv, "query_id").join(cvv, "neighbor_id")
                  .select("query_id", "neighbor_id",
                          F.round(_dot_dec(F.col("vq"), F.col("vc"))
                                  .cast("double")
                                  / (F.sqrt(F.col("nsq_q").cast("double"))
                                     * F.sqrt(F.col("nsq_c")
                                              .cast("double"))), 6)
                          .alias("cosine")))
    else:
        qv = qsrc.select(F.col(id_col).alias("query_id"),
                         dv(F.col(vec_col)).alias("vq"))
        cv = df.select(F.col(id_col).alias("neighbor_id"),
                       dv(F.col(vec_col)).alias("vc"))
        scored = (cand.join(qv, "query_id").join(cv, "neighbor_id")
                  .select("query_id", "neighbor_id",
                          F.round(cosine(F.col("vq"), F.col("vc")), 6)
                          .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def _hyperplanes(dim: int, bits: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from the portable hash."""
    return [[1.0 if portable_hash64_py(f"hp:{b}:{i}") % 2 else -1.0
             for i in range(dim)] for b in range(bits)]


def _sig_expr(vec, planes, exact: bool):
    """len(planes)-bit hyperplane signature as an int column: bit b set
    iff dot(vec, planes[b]) >= 0. exact=True folds in decimal(38,18)
    (bit-stable vs a SQL oracle); the double fold is the throughput
    shape. Whole expression is one narrow JVM-side projection."""
    DEC = "decimal(38,18)"
    v = F.transform(vec, lambda x: x.cast("double"))
    bitcols = []
    for bi, hp in enumerate(planes):
        hp_arr = F.array(*[F.lit(c) for c in hp])
        if exact:
            # re-cast each step: decimal(38,18)+decimal(38,18) widens
            # to (38,17) under Spark's precision rules; every term
            # has <=18 dp so the cast is lossless
            dot = F.aggregate(
                F.zip_with(v, hp_arr, lambda x, h: (x * h).cast(DEC)),
                F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC))
            bitcols.append(F.when(dot >= F.lit(0).cast(DEC), 1 << bi)
                           .otherwise(0))
        else:
            dot = F.aggregate(
                F.zip_with(v, hp_arr, lambda x, h: x * h),
                F.lit(0.0), lambda acc, x: acc + x)
            bitcols.append(F.when(dot >= 0, 1 << bi).otherwise(0))
    s = bitcols[0].cast("long")
    for c in bitcols[1:]:
        s = s + c
    return s.cast("long")  # bigint: bit 31 overflows int when bits >= 32


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             dim: int, threshold: float = 0.9,
                             bands: int = 4, band_bits: int = 4,
                             exact: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale — the LSH sibling
    of the brute-force cosine_pairs (which cross-joins: fine as an
    oracle, quadratic in production).

    Banded OR-construction over random-hyperplane bits (the SimHash /
    MinHash-band pattern applied to embeddings): each vector gets
    bands·band_bits hyperplane bits; two vectors are CANDIDATES when at
    least one full band of bits matches; exact cosine then filters
    candidates to >= threshold, so precision is exact and only recall is
    approximate. Per-bit collision at angle θ is 1-θ/π, so recall ≈
    1-(1-(1-θ/π)^band_bits)^bands — at cosine 0.9 with 4×4 that's ~0.95,
    and rises toward 1 for the tighter thresholds dedup actually uses.

    Plan shape: one narrow projection computes the signature, explode to
    `bands` rows per vector, shuffle on (band, value) — the same
    linear-candidate bucket join as minhash_lsh_pairs; no cross product
    anywhere. Returns (id_a < id_b, cosine) undirected pairs; feed into
    near_dup_clusters(pairs=...) for keep/drop sets.
    """
    bits = bands * band_bits
    planes = _hyperplanes(dim, bits)
    mask = (1 << band_bits) - 1
    # TWO-STAGE: materialize the O(bits·dim) signature fold in its own
    # Project before slicing it into bands. HOF folds are CodegenFallback
    # (no subexpression elimination), so inlining `sig` into every band
    # struct would recompute the whole fold bands× per row — the same
    # trap documented at text.quality_classify. CollapseProject keeps the
    # stages apart because _sig is non-cheap and multiply referenced.
    sig_src = df.select(F.col(id_col).alias("_id"),
                        F.col(vec_col).alias("_v")) \
                .withColumn("_sig", _sig_expr(F.col("_v"), planes, exact))
    banded = sig_src.select("_id", "_v",
                            F.explode(F.array(*[
                                F.struct(
                                    F.lit(b).alias("b"),
                                    F.shiftright(F.col("_sig"), b * band_bits)
                                    .bitwiseAND(F.lit(mask)).alias("v"))
                                for b in range(bands)])).alias("_band"))
    a = banded.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                      "_band")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                      "_band")
    cand = (a.join(b, "_band").filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    if exact:
        va = (df.select(F.col(id_col).alias("id_a"),
                        dv(F.col(vec_col)).alias("va"))
              .withColumn("nsq_a", _dot_dec(F.col("va"), F.col("va"))))
        vb = (df.select(F.col(id_col).alias("id_b"),
                        dv(F.col(vec_col)).alias("vb"))
              .withColumn("nsq_b", _dot_dec(F.col("vb"), F.col("vb"))))
        scored = (cand.join(va, "id_a").join(vb, "id_b")
                  .withColumn("cosine",
                              F.round(_dot_dec(F.col("va"), F.col("vb"))
                                      .cast("double")
                                      / (F.sqrt(F.col("nsq_a").cast("double"))
                                         * F.sqrt(F.col("nsq_b")
                                                  .cast("double"))), 6)))
    else:
        va = df.select(F.col(id_col).alias("id_a"),
                       dv(F.col(vec_col)).alias("va"))
        vb = df.select(F.col(id_col).alias("id_b"),
                       dv(F.col(vec_col)).alias("vb"))
        scored = (cand.join(va, "id_a").join(vb, "id_b")
                  .withColumn("cosine",
                              F.round(cosine(F.col("va"), F.col("vb")), 6)))
    return (scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def lsh_candidate_pairs(df: DataFrame, id_col: str, vec_col: str,
                        dim: int, bits: int | None = None,
                        queries: DataFrame | None = None,
                        multiprobe: bool = True, exact: bool = False,
                        n_hint: int | None = None,
                        target_bucket: int = 1024) -> DataFrame:
    """Distinct (query_id, neighbor_id) candidate pairs from the
    random-hyperplane bucket join — the discovery stage shared by
    lsh_ann_topk and the composed production path
    `ann_topk_int8(candidates=lsh_candidate_pairs(...))` (4×-smaller
    integer re-rank over banded candidates; no full-width vectors or
    cosine folds anywhere in discovery).

    The bucket join moves ONLY (id, _sig): with multiprobe a pair can
    collide on up to bits+1 probes, so pairs are dedup'd HERE, before
    any scoring — scoring per duplicate wasted ~bits× fold work, and
    carrying vectors through the probe explode replicated each query
    vector bits+1× through the shuffle.
    """
    if bits is None:
        import math
        n = n_hint if n_hint is not None else df.count()
        bits = min(24, max(8, math.ceil(math.log2(max(n, 2) / target_bucket))))
    planes = _hyperplanes(dim, bits)

    def sig_col(vec):
        return _sig_expr(vec, planes, exact)

    q = (queries if queries is not None else df).withColumn(
        "_sig", sig_col(F.col(vec_col)))
    if multiprobe:
        probes = F.array(F.col("_sig"),
                         *[F.col("_sig").bitwiseXOR(F.lit(1 << i))
                           for i in range(bits)])
        q = q.select(F.col(id_col).alias("query_id"),
                     F.explode(probes).alias("_sig"))
    else:
        q = q.select(F.col(id_col).alias("query_id"), "_sig")
    c = (df.withColumn("_sig", sig_col(F.col(vec_col)))
         .select(F.col(id_col).alias("neighbor_id"), "_sig"))
    return (q.join(c, "_sig")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())


def lsh_ann_topk(df: DataFrame, id_col: str, vec_col: str, dim: int,
                 k: int = 5, bits: int | None = None,
                 queries: DataFrame | None = None,
                 multiprobe: bool = True, exact: bool = False,
                 n_hint: int | None = None,
                 target_bucket: int = 1024) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + cosine re-rank.

    Recall is tunable via `bits` (fewer bits → bigger buckets → higher
    recall, more compute) and `multiprobe` (also probe buckets at Hamming
    distance 1 from the query's signature).

    bits=None (default) sizes the signature to the corpus:
    bits = clamp(log2(n / target_bucket), 8, 24), so the expected bucket
    holds ~target_bucket vectors and the in-bucket re-rank stays
    O(n · target_bucket) instead of quadratic — at 10^9 vectors that's
    bits≈20, 10^6 buckets of ~1k. Pass `n_hint` to skip the count job
    (or an explicit `bits`).

    exact=True computes hyperplane dots and the re-rank cosine with
    decimal sums (order-independent, bit-identical in a DuckDB oracle);
    the default double path is the throughput shape.
    """
    cand_pairs = lsh_candidate_pairs(df, id_col, vec_col, dim, bits=bits,
                                     queries=queries, multiprobe=multiprobe,
                                     exact=exact, n_hint=n_hint,
                                     target_bucket=target_bucket)
    # query-side vectors/norms come from `queries` when given — a
    # separate query table must re-rank against ITS vectors, not df's
    exq_src = queries if queries is not None else df
    dvx = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    if exact:
        qv = (exq_src.select(F.col(id_col).alias("query_id"),
                             dvx(F.col(vec_col)).alias("vq"))
              .withColumn("nsq_q", _dot_dec(F.col("vq"), F.col("vq"))))
        cv = (df.select(F.col(id_col).alias("neighbor_id"),
                        dvx(F.col(vec_col)).alias("vc"))
              .withColumn("nsq_c", _dot_dec(F.col("vc"), F.col("vc"))))
        scored = (cand_pairs.join(qv, "query_id").join(cv, "neighbor_id")
                  .select("query_id", "neighbor_id",
                          F.round(_dot_dec(F.col("vq"), F.col("vc"))
                                  .cast("double")
                                  / (F.sqrt(F.col("nsq_q").cast("double"))
                                     * F.sqrt(F.col("nsq_c").cast("double"))),
                                  6).alias("cosine")))
    else:
        qv = exq_src.select(F.col(id_col).alias("query_id"),
                            dvx(F.col(vec_col)).alias("vq"))
        cv = df.select(F.col(id_col).alias("neighbor_id"),
                       dvx(F.col(vec_col)).alias("vc"))
        scored = (cand_pairs.join(qv, "query_id").join(cv, "neighbor_id")
                  .select("query_id", "neighbor_id",
                          F.round(cosine(F.col("vq"), F.col("vc")), 6)
                          .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def quantize_int8(df: DataFrame, id_col: str, vec_col: str,
                  out_col: str = "qvec",
                  scale_col: str = "qscale") -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column.

    q_i = floor(x_i / s * 127 + 0.5) with s = max(|x|) — 4× memory
    compression for ANN serving / shipping embeddings between stages
    (the dequantized value is q_i * s / 127, max abs error s/254).
    floor(+0.5) rather than round(): identical half-up tie-breaking in
    every engine, so the DuckDB oracle reproduces the integers exactly.
    Zero vectors quantize to all-zero with scale 0.

    Single narrow codegen'd projection — no shuffle, no Python; at
    100 TB this runs inside the scan stage of whatever consumes it.

    The scale rides along as a zip_with ARRAY OPERAND
    (array_repeat(s, d)) instead of a free variable inside the lambda:
    lambda subexpressions are not CSE'd, so `s` referenced in the lambda
    body would recompute array_max once PER ELEMENT (the quadratic trap
    documented at dedup.shingle); operands are evaluated once per row.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.array_max(F.transform(v, F.abs))
    sv = F.array_repeat(s, F.size(v))
    q = F.when(s == 0.0, F.transform(v, lambda x: F.lit(0))) \
         .otherwise(F.zip_with(
             v, sv, lambda x, sc: F.floor(x / sc * F.lit(127.0)
                                          + F.lit(0.5)).cast("int")))
    return df.select(F.col(id_col), q.alias(out_col),
                     s.cast("double").alias(scale_col))


def ann_topk_int8(df: DataFrame, id_col: str, vec_col: str, k: int = 5,
                  queries: DataFrame | None = None,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Top-k cosine neighbors scored on int8-quantized vectors.

    The per-vector quantization scales CANCEL in cosine —
    cos(qa·sa, qb·sb) = (qa·qb)/(|qa||qb|) — so scoring is an integer
    dot product over 4×-smaller vectors (SIMD-friendly, exact in BIGINT:
    127² · dim < 2^24 per pair at dim 4096) followed by one float
    divide. Quantization error perturbs ranking only between
    near-equal scores.

    Without `candidates` this is the brute-force baseline (documented
    crossJoin — verification scale, like cosine_pairs). At corpus scale
    pass `candidates` = (query_id, neighbor_id) pairs from
    lsh_ann_topk's buckets or ivf probes; then this is the cheap
    re-rank stage over banded candidates only.
    """
    qsrc = queries if queries is not None else df
    qq = (quantize_int8(qsrc, id_col, vec_col)
          .select(F.col(id_col).alias("query_id"), F.col("qvec").alias("va")))
    qc = (quantize_int8(df, id_col, vec_col)
          .select(F.col(id_col).alias("neighbor_id"),
                  F.col("qvec").alias("vb")))
    if candidates is not None:
        pairs = (candidates.select("query_id", "neighbor_id")
                 .join(qq, "query_id").join(qc, "neighbor_id"))
    else:
        pairs = qq.crossJoin(qc)
    pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("long") * y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    scored = pairs.select(
        "query_id", "neighbor_id",
        F.round(idot(F.col("va"), F.col("vb")).cast("double")
                / (F.sqrt(idot(F.col("va"), F.col("va")).cast("double"))
                   * F.sqrt(idot(F.col("vb"), F.col("vb")).cast("double"))),
                6).alias("qcosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("qcosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "qcosine", "rank"))
