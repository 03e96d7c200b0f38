"""Training-corpus curation: decontamination, splits, per-source quotas.

These extend the engine past NiFi's operator set toward what a large-scale
training-data pipeline needs (the dedup/similarity family lives in
dedup.py/similarity.py; this module is the selection layer on top):

- benchmark_contamination: flag corpus documents that share word n-grams
  with a benchmark/eval set, the standard train-test decontamination step.
- dataset_split: deterministic hash-bucket train/val/test assignment that
  is stable under re-runs, re-partitioning, and corpus growth.
- cap_per_group: per-source document quota (anti-domination sampling),
  the curation analog of NiFi's ControlRate per-group throttle
  (standard/ControlRate.java:70-111,134 — there a token bucket per
  grouping attribute; here a deterministic lottery per group key).

All three are pure column expressions / one window — no Python in the hot
path, and every hash that lands in output uses the portable md5 hash so
a DuckDB oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nifi_spark.datalib.dedup import shingle
from nifi_spark.functions.portable_hash import portable_hash64


def benchmark_contamination(docs: DataFrame, bench: DataFrame,
                            id_col: str, text_col: str, k: int = 8,
                            broadcast_bench: bool = True) -> DataFrame:
    """Documents sharing >= 1 word k-gram with the benchmark set.

    Returns (id, n_shared) where n_shared counts the document's DISTINCT
    shingles that also occur anywhere in `bench`. Docs with no overlap
    are absent (filter on an anti-join of the output to keep the clean
    set).

    Scale shape: the benchmark side collapses to its distinct shingle set
    — benchmarks are thousands of documents, so the set is broadcast-
    sized by construction and the corpus side joins map-side with no
    shuffle of the corpus (set broadcast_bench=False to let AQE decide
    if an unusually large benchmark is passed). The corpus is shingled
    once (k shifted slices + zip_with — see shingle() for why not the
    quadratic lambda form) and aggregated per document: one partial-agg
    shuffle of (id, count) pairs only.
    """
    d = shingle(docs, id_col, text_col, k=k)
    b = shingle(bench, id_col, text_col, k=k).select("shingle").distinct()
    if broadcast_bench:
        b = F.broadcast(b)
    return (d.join(b, "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared")))


def dataset_split(df: DataFrame, id_col: str,
                  weights: dict[str, int] | None = None,
                  out_col: str = "split", seed: str = "") -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket.

    weights maps split name -> integer proportion (default 98/1/1).
    bucket = portable_hash64(id) mod sum(weights); cumulative ranges
    assign the split. Properties that matter at 100 TB:

    - stateless and deterministic: no shuffle, no RNG, survives re-runs
      and re-partitioning; a document keeps its split forever, so
      incremental corpus growth never migrates documents across splits
      (sampling by rand() would).
    - exactly reproducible in any engine that has md5 (the DuckDB
      oracle shares the same bucket arithmetic).
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = F.pmod(portable_hash64(F.col(id_col).cast("string"), seed),
                    F.lit(total))
    expr = None
    acc = 0
    for name, wgt in weights.items():
        acc += wgt
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def cap_per_group(df: DataFrame, group_col: str, id_col: str, n: int,
                  seed: str = "", hot_threshold: int | None = None,
                  margin: float = 1.5) -> DataFrame:
    """Keep at most n rows per group, chosen by a deterministic lottery.

    Rows are ranked inside each group by (portable_hash64(id), id) — a
    stable pseudo-random order, so the kept subset is an unbiased sample
    that is identical on every run — and rows ranked past n are dropped.
    The anti-domination step of corpus curation: no source/domain
    contributes more than its quota.

    Scale shape: one hash-partitioned window (shuffle by group key). A
    single web-scale hot domain makes that window's task the straggler —
    pass `hot_threshold` (rows) to pre-shrink such groups BEFORE the
    shuffle: the rank key is a uniform 60-bit hash, so the rank-n
    cutoff inside a group of c rows concentrates tightly around
    2^60·n/c, and keeping hash < 2^60·margin·n/c (no extra data pass —
    the cutoff comes from the group's row count alone) passes every
    true top-n row through with probability 1 - exp(-Θ(n)); margin 1.5
    at n ≥ 100 puts the failure odds below 1e-9. Only the per-group
    counts of groups ABOVE the threshold reach the driver (hot groups
    are few by definition), the filter is a broadcast map literal, and
    the exact window afterwards sees ≤ margin·n rows per hot group
    instead of c.
    """
    rank_key = portable_hash64(F.col(id_col).cast("string"), seed)
    if hot_threshold is not None:
        hot = (df.groupBy(group_col)
               .agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > F.lit(max(hot_threshold,
                                              int(margin * n) + 1)))
               .collect())
        if hot:
            cut = {r[0]: min(1 << 60, int((1 << 60) * margin * n / r["c"]))
                   for r in hot}
            m = F.create_map(*[F.lit(x) for kv in sorted(cut.items())
                               for x in kv])
            df = df.filter(m[F.col(group_col)].isNull()
                           | (rank_key < m[F.col(group_col)]))
    w = Window.partitionBy(group_col).orderBy(rank_key.asc(),
                                              F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk"))


_TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src|mc_cid|mc_eid)(=|$)"


def canonical_url(url: F.Column | str) -> F.Column:
    """RFC-3986-style URL normalization as one column expression.

    The canonical form drives URL-level dedup of web corpora (the same
    page crawled via http/https, with/without `www.`, default ports,
    fragments, trailing slashes, shuffled or tracking query params —
    utm_*, fbclid, gclid, ... — is ONE document):

    - scheme and host lowercased; leading `www.` stripped
    - default port stripped (`:80` for http, `:443` for https)
    - fragment stripped; trailing slashes stripped from the path
    - query params: tracking params dropped, the rest sorted and
      rejoined (param ORDER never distinguishes two URLs)

    Pure regex/array built-ins — codegen'd, no shuffle, no Python, and
    reproducible verbatim in the DuckDB oracle.
    """
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([^:/?#]+)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    path = F.regexp_replace(
        F.regexp_extract(no_frag, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1),
        "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(no_frag, r"\?([^#]*)", 1), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE))
    q = F.array_join(F.array_sort(params), "&")
    return F.concat(scheme, F.lit("://"), host, path,
                    F.when(q != "", F.concat(F.lit("?"), q))
                    .otherwise(F.lit("")))


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Dedup rows whose URLs canonicalize identically: first id wins.

    Returns (canonical_url, id, dup_count) — the URL-level sibling of
    exact_dedup's content-hash grouping. Scale shape: one projection +
    one hash-agg on the canonical string, map-side combinable; at
    100 TB this is the cheapest dedup pass and runs before any
    content-based one.
    """
    return (df.select(F.col(id_col),
                      canonical_url(url_col).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


def token_budget_sample(df: DataFrame, group_col: str, id_col: str,
                        token_col: str, budgets: dict[str, int],
                        seed: str = "", n_buckets: int = 64) -> DataFrame:
    """Token-budget mixture sampling: build a training mix by capping
    each source at a TOKEN budget (not a row count — cap_per_group's
    sibling for mixtures specified in tokens, the unit that matters).

    Semantics: within each group, documents are ordered by the
    deterministic lottery (portable_hash64(id), id) and the maximal
    prefix whose cumulative token count stays <= budgets[group] is
    kept; groups absent from `budgets` are dropped. Deterministic,
    unbiased, and stable under re-runs and corpus growth (a kept doc
    only leaves the mix if new docs hash ahead of it).

    Scale shape: a naive per-group running sum is one window over EVERY
    row of the hottest source — a straggler at web scale. Instead the
    60-bit hash's top bits split each group into `n_buckets` equal-width
    rank ranges; per-(group,bucket) token sums (one narrow partial-agg
    shuffle) locate the single bucket where the budget boundary falls.
    Buckets wholly inside the budget pass through with NO window,
    buckets past it are dropped, and the exact running sum runs only
    inside the ~1/n_buckets boundary slice of each group. The kept set
    is provably identical to the naive window's (bucket order is the
    hash order's prefix).
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = 60 - (n_buckets.bit_length() - 1)
    bmap = F.create_map(*[F.lit(x) for kv in sorted(budgets.items())
                          for x in kv])
    d = (df.withColumn("_h", portable_hash64(F.col(id_col).cast("string"),
                                             seed))
         .withColumn("_budget", bmap[F.col(group_col)])
         .filter(F.col("_budget").isNotNull())
         .withColumn("_bkt", F.shiftright(F.col("_h"), shift)))

    wb = (Window.partitionBy(group_col).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    cls = (d.groupBy(group_col, "_bkt")
           .agg(F.sum(token_col).alias("_t"),
                F.first("_budget").alias("_b"))
           .withColumn("_before", F.coalesce(F.sum("_t").over(wb),
                                             F.lit(0)))
           .withColumn("_cls",
                       F.when(F.col("_before") + F.col("_t")
                              <= F.col("_b"), "all")
                       .when(F.col("_before") < F.col("_b"), "edge")
                       .otherwise("none"))
           .select(group_col, "_bkt", "_cls", "_before"))

    j = d.join(cls, [group_col, "_bkt"])
    helper = ["_h", "_budget", "_bkt", "_cls", "_before"]
    keep_all = j.filter(F.col("_cls") == "all").drop(*helper)
    we = (Window.partitionBy(group_col)
          .orderBy(F.col("_h").asc(), F.col(id_col).asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    edge = (j.filter(F.col("_cls") == "edge")
            .withColumn("_cum",
                        F.sum(token_col).over(we) + F.col("_before"))
            .filter(F.col("_cum") <= F.col("_budget"))
            .drop("_cum", *helper))
    return keep_all.unionByName(edge)


def stratified_sample(df: DataFrame, group_col: str, id_col: str,
                      fractions: dict[str, float],
                      default: float | None = None,
                      seed: str = "") -> DataFrame:
    """Deterministic per-stratum sampling: keep ≈``fractions[group]``
    of each group's rows by hash threshold — the downsampling step of
    mixture building when the spec is a RATE rather than a token
    budget (token_budget_sample's fixed-size sibling, sampleBy's
    deterministic replacement).

    A row is kept iff portable_hash64(id) < fraction · 2^60, so
    membership is a pure projection: zero shuffle, no RNG, identical
    on every run and engine, stable under corpus growth (new rows
    never evict old ones), and NESTED across rates — the 1% sample is
    a subset of the 10% sample, which makes staged experiments
    comparable. Groups absent from ``fractions`` keep ``default``
    (None drops them).
    """
    full = 1 << 60
    fmap = F.create_map(*[F.lit(x) for k, v in sorted(fractions.items())
                          for x in (k, int(v * full))])
    thr = fmap[F.col(group_col)]
    if default is not None:
        thr = F.coalesce(thr, F.lit(int(default * full)))
    h = portable_hash64(F.col(id_col).cast("string"), seed)
    return df.filter(thr.isNotNull() & (h < thr))


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   max_tokens: int = 2048, n_shards: int = 256,
                   sep: str = "\n\n") -> DataFrame:
    """Sequence packing: concatenate documents into fixed-token-budget
    training rows (the pre-tokenization packing step of an LLM data
    pipeline; same greedy-contiguous discipline as MergeContent's
    bin-packing thresholds, BinFiles.java:52-96, but in tokens).

    Deterministic and migration-free: each document hashes to one of
    ``n_shards`` shards (portable hash, so reruns and the SQL oracle
    agree), documents order by id within their shard, and a ROWS-frame
    running token sum opens a new pack whenever the budget boundary is
    crossed — every pack holds <= max_tokens + one document, and packs
    are contiguous in the shard order. The only shuffle is the
    shard/pack aggregation; the window partitions by shard (parallel
    across 256+ slices — never a global window).

    Tokens = whitespace tokens (compose with token_stats' BPE
    pre-tokenizer upstream for a model-accurate count). Output: one row
    per pack with the packed text, document count, and token total.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                           lambda t: t != ""))
    shard = F.pmod(portable_hash64(F.col(id_col).cast("string")),
                   F.lit(n_shards))
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(text_col).alias("_text"),
                     toks.alias("_tok"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.col("_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = F.sum("_tok").over(w) - F.col("_tok")
    packed = base.withColumn("pack_id",
                             (start / max_tokens).cast("long"))
    return (packed.groupBy("shard", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_tok").alias("total_tokens"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("_id"), F.col("_text")))),
                         lambda s: s["_text"]),
                     sep).alias("packed_text")))


# ---------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling", arXiv:2302.03169)
# ---------------------------------------------------------------------

def _ngram_instances(df: DataFrame, id_col: str, text_col: str,
                     max_n: int = 2):
    """Hashed-ngram feature INSTANCES (not distinct — DSIR is a
    bag-of-ngrams model): one row per unigram..max_n-gram occurrence.
    Same slice+zip_with shape as dedup.shingle (the transform(...) form
    re-tokenizes per gram — see that docstring)."""
    from nifi_spark.datalib.dedup import WORD_SPLIT
    w = F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                 lambda t: t != "")
    parts = []
    for n in range(1, max_n + 1):
        m = F.greatest(F.size(w) - (n - 1), F.lit(0))
        grams = F.slice(w, 1, m)
        for j in range(1, n):
            grams = F.zip_with(grams, F.slice(w, j + 1, m),
                               lambda a, b: F.concat(a, F.lit(" "), b))
        parts.append(grams)
    allgrams = parts[0]
    for p in parts[1:]:
        allgrams = F.concat(allgrams, p)
    return df.select(F.col(id_col), F.explode(allgrams).alias("gram"))


def _ilog2(c):
    """floor(log2(x)) for x >= 1 as pure integer/string ops — identical
    in Spark (length(bin(x))-1) and DuckDB (length(printf('%b',x))-1),
    so quantized log-ratios land in output without float drift."""
    return (F.length(F.bin(c)) - 1).cast("long")


def dsir_weights(docs: DataFrame, target: DataFrame, id_col: str,
                 text_col: str, n_buckets: int = 4096, max_n: int = 2,
                 seed: str = "") -> DataFrame:
    """Per-document importance weight against a target distribution.

    DSIR: featurize documents as hashed n-gram counts, fit unigram
    bucket models over the target (p) and raw (q) corpora, and weight
    each document by sum_b c_b * log(p_b / q_b). This implementation
    quantizes the log-ratio to integer bits — Q_b = ilog2(t_b + 1) -
    ilog2(r_b + 1), a floor-log2 with add-one smoothing — so the weight
    is an exact integer a SQL oracle reproduces bit-for-bit (the same
    trade the quality classifier makes with Rényi-2 instead of log
    entropy; swap a float log in on a real cluster if sub-bit ranking
    resolution matters — it changes no plan shape).

    Scale shape: two hash-agg passes produce the bucket table (<=
    n_buckets rows — driver/broadcast sized BY CONSTRUCTION), the
    corpus joins it map-side (broadcast equi-join on bucket), and one
    partial-agg shuffle of (id, weight) finishes. No windows, no
    self-joins; the target corpus is typically a small high-quality
    set and is never shuffled wholesale.

    Returns (id_col, weight) for EVERY input doc (empty docs weigh 0).
    """
    bucket = F.pmod(portable_hash64(F.col("gram"), seed),
                    F.lit(n_buckets)).alias("bucket")
    raw_b = (_ngram_instances(docs, id_col, text_col, max_n)
             .select(bucket).groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("r")))
    tgt_b = (_ngram_instances(target, id_col, text_col, max_n)
             .select(bucket).groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("t")))
    stats = (raw_b.join(tgt_b, "bucket", "full_outer")
             .select("bucket",
                     (_ilog2(F.coalesce(F.col("t"), F.lit(0)) + 1)
                      - _ilog2(F.coalesce(F.col("r"), F.lit(0)) + 1))
                     .alias("q")))
    inst = (_ngram_instances(docs, id_col, text_col, max_n)
            .select(F.col(id_col), bucket))
    w = (inst.join(F.broadcast(stats), "bucket")
         .groupBy(id_col).agg(F.sum("q").alias("weight")))
    return (docs.select(id_col).join(w, id_col, "left")
            .select(id_col, F.coalesce(F.col("weight"), F.lit(0))
                    .cast("long").alias("weight")))


def dsir_select(docs: DataFrame, target: DataFrame, id_col: str,
                text_col: str, budget: int, n_buckets: int = 4096,
                max_n: int = 2, seed: str = "") -> DataFrame:
    """Top-`budget` documents by DSIR weight (deterministic tiebreak:
    portable hash of the id, then the id). DSIR proper resamples with
    Gumbel noise; the deterministic rank keeps the selection replayable
    and oracle-checkable — inject Gumbel by adding it to `weight`
    upstream if sampling diversity matters more than replayability."""
    w = dsir_weights(docs, target, id_col, text_col, n_buckets, max_n, seed)
    tie = portable_hash64(F.col(id_col).cast("string"), seed)
    return (w.orderBy(F.col("weight").desc(), tie, F.col(id_col))
            .limit(budget))


def train_perceptron(df: DataFrame, feature_cols: list,
                     label_col: str = "y", iters: int = 3,
                     bias: bool = True) -> tuple[list[int], DataFrame]:
    """Distributed batch-perceptron trainer for quality-filter models
    (the fastText-style "train a tiny classifier over corpus stats, then
    filter" step of web-corpus curation — e.g. GPT-3/CCNet pipelines).

    INTEGER-exact by construction: features must be integer columns,
    labels +1/-1, weights start at 0 and every update is
    ``w += sum(y * x over rows with y * (w . x) <= 0)`` — one full-batch
    Rosenblatt step per iteration. No floats anywhere, so the whole
    training run (not just the scores) is replayable bit-for-bit by a
    declarative SQL oracle with one nested CTE per iteration.

    Scale shape: each iteration is ONE scan + map-side partial aggregate
    collapsing to d+1 longs on the driver (weights travel back as plan
    literals, never a shuffle of rows). At 100 TB that is `iters`
    sequential scans — the canonical distributed full-batch GD layout;
    cache/checkpoint the feature projection upstream to pay the scan
    once. Keep ``iters * rows * max|feature|`` under 2^62: ANSI mode
    makes any overflow loud, not silent.

    Returns (weights, scored) where scored = input ids + integer
    ``score`` (w . x), ``pred`` (+1 if score >= 0 else -1) and the label.
    """
    feats = [F.col(c) if isinstance(c, str) else c for c in feature_cols]
    if bias:
        feats = [F.lit(1)] + feats
    names = [f"x{j}" for j in range(len(feats))]
    y = F.col(label_col).cast("long")
    base = df.select(*[f.cast("long").alias(n) for f, n in zip(feats, names)],
                     y.alias("_y"),
                     *[c for c in df.columns if c != label_col])

    w = [0] * len(names)
    for _ in range(iters):
        margin = sum((F.lit(wj) * F.col(n) for wj, n in zip(w, names)),
                     F.lit(0))
        mis = (F.col("_y") * margin) <= 0
        upd = base.agg(*[
            F.sum(F.when(mis, F.col("_y") * F.col(n)).otherwise(0))
            .cast("long").alias(n) for n in names]).collect()[0]
        w = [wj + int(upd[n] or 0) for wj, n in zip(w, names)]

    score = sum((F.lit(wj) * F.col(n) for wj, n in zip(w, names)), F.lit(0))
    scored = base.withColumn("score", score.cast("long")) \
        .withColumn("pred", F.when(F.col("score") >= 0, 1).otherwise(-1)) \
        .withColumnRenamed("_y", label_col)
    return w, scored


def perceptron_oracle_sql(base_sql: str, n_features: int, iters: int,
                          id_col: str = "doc_id") -> str:
    """The SQL twin of train_perceptron, GENERATED from the same loop so
    the unrolled CTEs cannot drift from the implementation: `base_sql`
    must yield (id_col, y, x0..x{d-1}); each wN CTE replays Rosenblatt
    step N with the previous weights pulled in as scalar subqueries."""
    xs = [f"x{j}" for j in range(n_features)]

    def wref(t: int, j: int) -> str:
        return f"(SELECT s{j} FROM w{t})"

    ctes = [f"d AS ({base_sql})"]
    # step 1: w0 = 0 -> every row has margin 0 <= 0 (all misclassified)
    ctes.append("w1 AS (SELECT "
                + ", ".join(f"sum(y * {x})::BIGINT AS s{j}"
                            for j, x in enumerate(xs))
                + " FROM d)")
    for t in range(2, iters + 1):
        margin = " + ".join(f"{wref(t - 1, j)} * {x}"
                            for j, x in enumerate(xs))
        terms = ", ".join(
            f"{wref(t - 1, j)} + sum(CASE WHEN y * ({margin}) <= 0 "
            f"THEN y * {x} ELSE 0 END)::BIGINT AS s{j}"
            for j, x in enumerate(xs))
        ctes.append(f"w{t} AS (SELECT {terms} FROM d)")
    final_score = " + ".join(f"{wref(iters, j)} * {x}"
                             for j, x in enumerate(xs))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT {id_col}, ({final_score})::BIGINT AS score,\n"
            f"       CASE WHEN ({final_score}) >= 0 THEN 1 ELSE -1 END "
            f"AS pred, y\nFROM d")


def temperature_mix(df: DataFrame, source_col: str, id_col: str, *,
                    target_total: int, temperature: int = 2,
                    seed: str = "") -> DataFrame:
    """Temperature-weighted mixture sampling: downsample each source
    toward a budget of ``target_total`` docs with per-source share
    ∝ n_s^(1/T) — the standard way multilingual / multi-domain
    training mixes flatten head sources without starving the tail
    (T=1 reproduces natural proportions; larger T flattens).

    Everything is integer so the SQL twin replays the EXACT kept set:
    ``temperature`` must be a power of two and the T-th root is an
    iterated floor(sqrt(·)) (exact for counts < 2^52); the per-source
    budget is k_s = target_total·w_s // Σw, and a row is kept iff
    portable_hash64(id) % n_s < k_s — a deterministic uniform-rank
    cutoff (expected k_s kept, identical on every run/engine, new
    rows never evict old ones within a source of fixed size).

    Plan shape: one count hash-agg over (source), the Σw as a 1-row
    broadcast, and membership as a broadcast stats join + projection —
    no windows, no per-source jobs; scale-safe at any source count
    that fits a broadcast (thousands).
    """
    if temperature < 1 or temperature & (temperature - 1):
        raise ValueError("temperature must be a power of two")
    stats = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    w = F.col("_n")
    t = temperature
    while t > 1:
        w = F.floor(F.sqrt(w)).cast("long")
        t //= 2
    stats = stats.withColumn("_w", w)
    tot = stats.agg(F.sum("_w").cast("long").alias("_totw"))
    stats = stats.crossJoin(F.broadcast(tot)) \
        .withColumn("_k", F.expr(f"CAST({target_total} AS BIGINT) "
                                 "* _w div _totw")) \
        .select(source_col, "_n", "_w", "_k")
    h = portable_hash64(F.col(id_col).cast("string"), seed)
    return (df.join(F.broadcast(stats), source_col)
            .filter(F.pmod(h, F.col("_n")) < F.col("_k"))
            .drop("_n", "_w", "_k"))
