"""Distributed n-gram language model — count training + stupid-backoff
scoring (Brants et al. 2007, "Large Language Models in Machine
Translation": the distributed-LM recipe — sharded raw counts, no
normalization, score = count ratio with a fixed backoff factor α).

Why this shape at 100 TB: training is ONE hash-aggregation per order
(map-side combine collapses to distinct n-grams, ~10³× smaller than the
corpus); scoring is per-order LEFT equi-joins from exploded token
positions to the counts table — the classic "LM as a distributed
key-value lookup" — with no windows (the per-position context comes
from array slices of the per-doc token array, not lag()).

Integer-exact scoring so the SQL twin replays bit-for-bit: with
α = alpha_num/alpha_den and a fixed integer `scale`, a token whose
longest matching order backs off `level` times scores

    floor(scale · alpha_num^level · c  /  (alpha_den^level · d))

where c = count(context·token) and d = count(context) at the matched
order (d = total token count for unigrams). All-integer products; with
the default scale 10^6 and α=2/5 the bound is
scale · 2^(n-1) · c < 2^62 ⟺ c < ~1.15e12 tokens per n-gram — safe far
beyond any single n-gram's plausible count. Out-of-vocabulary tokens
score 0 at level = n (the stupid-backoff convention of giving up, not
smoothing — scores are relative rankings, not probabilities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEP = "\x1f"      # n-gram key joiner; never occurs in whitespace tokens
_WS = r"\s+"


def _tokens(text_col: str) -> F.Column:
    return F.filter(F.split(F.trim(F.col(text_col)), _WS),
                    lambda t: t != "")


def train_ngram_counts(df: DataFrame, text_col: str,
                       n: int = 3) -> DataFrame:
    """(order, gram, cnt) for every order 1..n: gram = SEP-joined
    tokens. One explode + one hash-agg per order, unioned — each order's
    partial aggregation combines map-side before the single shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = df.select(_tokens(text_col).alias("_t"))
    parts = []
    def _gram_fn(kk: int):
        # single-arg lambda on purpose: a 2-arg transform lambda gets
        # (element, index) from PySpark — a `kk=k` default would be
        # silently overwritten by the array index
        return lambda i: F.array_join(F.slice("_t", i + 1, kk), SEP)

    for k in range(1, n + 1):
        # guard: sequence(0, -1) would DESCEND in Spark, fabricating
        # grams for too-short docs
        grams = F.when(
            F.size("_t") >= k,
            F.transform(F.sequence(F.lit(0), F.size("_t") - k),
                        _gram_fn(k))
        ).otherwise(F.array().cast("array<string>"))
        parts.append(
            toks.select(F.explode(grams).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .select(F.lit(k).alias("order"), "gram", "cnt"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def score_ngram_lm(df: DataFrame, counts: DataFrame, id_col: str,
                   text_col: str, n: int = 3,
                   alpha_num: int = 2, alpha_den: int = 5,
                   scale: int = 1_000_000) -> DataFrame:
    """Per-document stupid-backoff aggregate:
    (id, n_tokens, sum_score, sum_backoff) where sum_score is the
    integer token-score sum above and sum_backoff counts total backoff
    levels taken (an OOV/novelty signal). Sequence positions come from
    posexplode over the per-doc token array; every count lookup is a
    LEFT equi-join on the gram string."""
    toks = df.select(F.col(id_col), _tokens(text_col).alias("_t"))
    pos = toks.select(
        id_col, F.size("_t").alias("_len"),
        F.posexplode("_t").alias("_p", "_w"),
        F.col("_t").alias("_arr"))
    # gram_k = tokens[p-k+1 .. p] (1-based slice), only where p+1 >= k
    sel = [F.col(id_col), F.col("_p"), F.col("_w")]
    for k in range(1, n + 1):
        gram = F.when(
            F.col("_p") + 1 >= k,
            F.array_join(F.slice("_arr", F.col("_p") + 2 - k, k), SEP))
        sel.append(gram.alias(f"_g{k}"))
        if k > 1:
            ctx = F.when(
                F.col("_p") + 1 >= k,
                F.array_join(F.slice("_arr", F.col("_p") + 2 - k, k - 1),
                             SEP))
            sel.append(ctx.alias(f"_c{k}"))
    grams = pos.select(*sel)
    total = counts.filter(F.col("order") == 1).agg(
        F.sum("cnt").cast("long").alias("_N"))
    grams = grams.crossJoin(F.broadcast(total))
    for k in range(1, n + 1):
        ck = (counts.filter(F.col("order") == k)
              .select(F.col("gram").alias(f"_g{k}"),
                      F.col("cnt").alias(f"_cnt{k}")))
        grams = grams.join(ck, f"_g{k}", "left")
        if k > 1:
            dk = (counts.filter(F.col("order") == k - 1)
                  .select(F.col("gram").alias(f"_c{k}"),
                          F.col("cnt").alias(f"_den{k}")))
            grams = grams.join(dk, f"_c{k}", "left")
    # longest matched order wins; each step down multiplies α
    score = F.lit(0).cast("long")
    level = F.lit(n).cast("int")
    for k in range(1, n + 1):
        lv = n - k
        num = alpha_num ** lv * scale
        den_col = F.col("_N") if k == 1 else F.col(f"_den{k}")
        hit = F.col(f"_cnt{k}").isNotNull() & den_col.isNotNull()
        # integral DIV keeps the floor exact (everything positive)
        tok_score = F.expr(
            f"CAST({num} * _cnt{k} AS BIGINT) DIV "
            f"(CAST({alpha_den ** lv} AS BIGINT) * "
            + ("_N" if k == 1 else f"_den{k}") + ")")
        score = F.when(hit, tok_score).otherwise(score)
        level = F.when(hit, F.lit(lv)).otherwise(level)
    scored = grams.select(F.col(id_col), score.alias("_s"),
                          level.alias("_lv"))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("_s").cast("long").alias("sum_score"),
                 F.sum("_lv").cast("long").alias("sum_backoff")))


def ngram_lm_oracle_sql(doc_sql: str, n: int = 3,
                        alpha_num: int = 2, alpha_den: int = 5,
                        scale: int = 1_000_000,
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of train+score on the same corpus: regenerates the
    counts and replays the integer floor arithmetic. `doc_sql` must
    yield (id_col, text)."""
    tok = (r"list_filter(string_split_regex(trim(text), '\s+'), "
           r"t -> t <> '')")
    ctes = [f"docs AS ({doc_sql})",
            f"toks AS (SELECT {id_col}, {tok} AS t FROM docs)"]
    for k in range(1, n + 1):
        ctes.append(f"""g{k} AS (
  SELECT gram, count(*)::BIGINT AS cnt FROM (
    SELECT array_to_string(t[i:i+{k - 1}], chr(31)) AS gram
    FROM toks, unnest(range(1, len(t) - {k - 2})) AS u(i)
    WHERE len(t) >= {k})
  GROUP BY gram)""")
    ctes.append("tot AS (SELECT sum(cnt)::BIGINT AS n FROM g1)")
    pos_cols = [f"array_to_string(t[i-{k - 1}:i], chr(31)) AS w{k}"
                for k in range(1, n + 1)]
    ctes.append(f"""pos AS (
  SELECT {id_col}, i, {', '.join(pos_cols)}
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i))""")
    joins, score_cases, level_cases = [], [], []
    for k in range(n, 0, -1):
        lv = n - k
        num = alpha_num ** lv * scale
        den = (f"d{k}.cnt" if k > 1 else "tot.n")
        cond = (f"c{k}.cnt IS NOT NULL"
                + (f" AND d{k}.cnt IS NOT NULL AND i >= {k}"
                   if k > 1 else ""))
        score_cases.append(
            f"WHEN {cond} THEN ({num}::BIGINT * c{k}.cnt) "
            f"// ({alpha_den ** lv}::BIGINT * {den})")
        level_cases.append(f"WHEN {cond} THEN {lv}")
        joins.append(f"LEFT JOIN g{k} c{k} ON c{k}.gram = pos.w{k}")
        if k > 1:
            joins.append(
                f"LEFT JOIN g{k - 1} d{k} ON d{k}.gram = "
                f"array_to_string(string_split(pos.w{k}, chr(31))"
                f"[1:{k - 1}], chr(31))")
    return f"""
WITH {', '.join(ctes)}
SELECT {id_col}, count(*)::BIGINT AS n_tokens,
       sum(CASE {' '.join(score_cases)} ELSE 0 END)::BIGINT AS sum_score,
       sum(CASE {' '.join(level_cases)} ELSE {n} END)::BIGINT
         AS sum_backoff
FROM pos {' '.join(joins)}, tot
GROUP BY {id_col}
"""


def ccnet_ppl_buckets(docs: DataFrame, lm_docs: DataFrame, id_col: str,
                      text_col: str, n: int = 2,
                      alpha_num: int = 2, alpha_den: int = 5,
                      scale: int = 1_000_000) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): train the
    LM on a clean reference corpus (`lm_docs` — CCNet uses Wikipedia),
    score every target document, and split the corpus into
    head/middle/tail terciles by per-token LM score (higher score =
    lower perplexity = cleaner). Returns
    (id_col, n_tokens, avg_score, bucket).

    avg_score = sum_score DIV n_tokens (integer floor). Tercile
    thresholds are VALUES at ranks ceil(N/3) and ceil(2N/3) of the
    avg_score multiset ordered descending — value-at-rank is
    tie-order-independent, so the rule `head: avg >= t1, middle:
    avg >= t2` is exact and SQL-replayable (CCNet's thresholds are
    value cutoffs too; ties can make head slightly larger than N/3,
    same as theirs). The two thresholds come back to the driver as
    bounded scalars (the kmeans-seed contract); everything else is the
    score_ngram_lm join pipeline. Documents with zero tokens don't
    score and are absent from the output (same as score_ngram_lm)."""
    counts = train_ngram_counts(lm_docs, text_col, n)
    scored = score_ngram_lm(docs, counts, id_col, text_col, n,
                            alpha_num, alpha_den, scale)
    scored = scored.withColumn(
        "avg_score",
        F.expr("sum_score DIV n_tokens").cast("long")).persist()
    n_docs = scored.count()
    if n_docs == 0:
        return scored.select(id_col, "n_tokens", "avg_score",
                             F.lit("tail").alias("bucket")).limit(0)
    k1 = (n_docs + 2) // 3
    k2 = (2 * n_docs + 2) // 3
    t1 = (scored.orderBy(F.desc("avg_score")).limit(k1)
          .agg(F.min("avg_score")).collect()[0][0])
    t2 = (scored.orderBy(F.desc("avg_score")).limit(k2)
          .agg(F.min("avg_score")).collect()[0][0])
    return scored.select(
        id_col, "n_tokens", "avg_score",
        F.when(F.col("avg_score") >= t1, "head")
         .when(F.col("avg_score") >= t2, "middle")
         .otherwise("tail").alias("bucket"))


def ccnet_oracle_sql(docs_sql: str, lm_sql: str, n: int = 2,
                     alpha_num: int = 2, alpha_den: int = 5,
                     scale: int = 1_000_000,
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of ccnet_ppl_buckets: trains the counts on `lm_sql`,
    scores `docs_sql`, replays the tercile value-at-rank thresholds.
    Both SQL args must yield (id_col, text)."""
    tok = (r"list_filter(string_split_regex(trim(text), '\s+'), "
           r"t -> t <> '')")
    ctes = [f"docs AS ({docs_sql})", f"lmdocs AS ({lm_sql})",
            f"toks AS (SELECT {id_col}, {tok} AS t FROM docs)",
            f"lmtoks AS (SELECT {tok} AS t FROM lmdocs)"]
    for k in range(1, n + 1):
        ctes.append(f"""g{k} AS MATERIALIZED (
  SELECT gram, count(*)::BIGINT AS cnt FROM (
    SELECT array_to_string(t[i:i+{k - 1}], chr(31)) AS gram
    FROM lmtoks, unnest(range(1, len(t) - {k - 2})) AS u(i)
    WHERE len(t) >= {k})
  GROUP BY gram)""")
    ctes.append("tot AS (SELECT sum(cnt)::BIGINT AS n FROM g1)")
    pos_cols = [f"array_to_string(t[i-{k - 1}:i], chr(31)) AS w{k}"
                for k in range(1, n + 1)]
    ctes.append(f"""pos AS (
  SELECT {id_col}, i, {', '.join(pos_cols)}
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i))""")
    joins, score_cases = [], []
    for k in range(n, 0, -1):
        lv = n - k
        num = alpha_num ** lv * scale
        den = (f"d{k}.cnt" if k > 1 else "tot.n")
        cond = (f"c{k}.cnt IS NOT NULL"
                + (f" AND d{k}.cnt IS NOT NULL AND i >= {k}"
                   if k > 1 else ""))
        score_cases.append(
            f"WHEN {cond} THEN ({num}::BIGINT * c{k}.cnt) "
            f"// ({alpha_den ** lv}::BIGINT * {den})")
        joins.append(f"LEFT JOIN g{k} c{k} ON c{k}.gram = pos.w{k}")
        if k > 1:
            joins.append(
                f"LEFT JOIN g{k - 1} d{k} ON d{k}.gram = "
                f"array_to_string(string_split(pos.w{k}, chr(31))"
                f"[1:{k - 1}], chr(31))")
    ctes.append(f"""scored AS MATERIALIZED (
  SELECT {id_col}, count(*)::BIGINT AS n_tokens,
         (sum(CASE {' '.join(score_cases)} ELSE 0 END)::BIGINT
          // count(*)::BIGINT) AS avg_score
  FROM pos {' '.join(joins)}, tot
  GROUP BY {id_col})""")
    ctes.append(f"""ranked AS MATERIALIZED (
  SELECT avg_score,
         row_number() OVER (ORDER BY avg_score DESC) AS rn
  FROM scored)""")
    ctes.append("""nn AS (SELECT count(*)::BIGINT AS c FROM scored),
t1 AS (SELECT avg_score AS v FROM ranked, nn
       WHERE rn = (c + 2) // 3),
t2 AS (SELECT avg_score AS v FROM ranked, nn
       WHERE rn = (2 * c + 2) // 3)""")
    return f"""
WITH {', '.join(ctes)}
SELECT {id_col}, n_tokens, avg_score,
       CASE WHEN avg_score >= (SELECT v FROM t1) THEN 'head'
            WHEN avg_score >= (SELECT v FROM t2) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored
"""
