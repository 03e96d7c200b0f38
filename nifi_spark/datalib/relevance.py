"""Corpus relevance scoring: integer-quantized TF-IDF / BM25 top-k.

Training-data pipelines use relevance scoring to mine domain-specific
subsets from a web corpus ("find documents like these seed queries" —
the retrieval step of data curation, and the batch twin of a search
index). Spark shape:

* one explode + (doc, term) hash-agg for term frequencies,
* one (term) hash-agg for document frequencies (joined back on term —
  a term dictionary is NOT driver-sized at web scale, so this stays a
  distributed equi-join, map-side combinable),
* queries are a BROADCAST dimension (seed queries are driver-sized by
  contract), so scoring is a map-side semi-join of the posting rows,
* per-query top-k through one window partitioned BY QUERY (parallel
  across queries; k rows per query survive).

All arithmetic is INTEGER: idf = bit_length(N div df) (a log2
quantization, same trick as curation._ilog2) and the BM25 saturation
term is cleared of fractions by multiplying through by 10·avgdl
(k1 = 1.2 and b = 0.75 become the rationals 12/10 and 3/4):

    score = Σ_t idf(t) · (22·tf·avgdl) div (10·tf·avgdl + 3·avgdl + 9·dl)

with avgdl = total_tokens div N floored once globally. Every division is
a floor div of nonnegative ints, so the DuckDB oracle reproduces scores
bit-for-bit — no float ranking drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from nifi_spark.functions.portable_hash import portable_hash64


def _terms(text_col: str) -> F.Column:
    """Lowercase whitespace tokens (the dedup-family split: SQL twin is
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")


def bm25_topk(docs: DataFrame, queries: list[tuple], id_col: str,
              text_col: str, k: int = 10) -> DataFrame:
    """Top-`k` documents per query by integer BM25. ``queries`` is a
    driver-side list of (query_id, query_text) — seed queries, broadcast.
    Returns (query_id, doc_id, score, rank) with a deterministic
    tiebreak (portable hash of the doc id, then the id)."""
    spark = docs.sparkSession

    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(_terms(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    # corpus scalars, floored once: N docs (with >=1 token), avg doc len
    tot = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
    n_docs, avgdl = int(tot["n"]), int(tot["s"]) // int(tot["n"])

    qrows = []
    for qid, qtext in queries:
        for t in dict.fromkeys(w for w in qtext.lower().split() if w):
            qrows.append((int(qid), t))
    qterms = spark.createDataFrame(qrows, "query_id long, term string")

    posts = (tf.join(F.broadcast(qterms), "term")
             .join(dfreq, "term")
             .join(dl, "doc_id"))
    scored = (posts.withColumn("contrib", F.expr(
        f"cast(length(bin({n_docs} div df)) * (22 * tf * {avgdl}) "
        f"div (10 * tf * {avgdl} + 3 * {avgdl} + 9 * dl) as long)"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("long").alias("score")))

    tie = portable_hash64(F.col("doc_id").cast("string"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), tie, F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def bm25_oracle_sql(docs_sql: str, queries: list[tuple], k: int = 10) -> str:
    """SQL twin of bm25_topk, generated from the same queries list.
    ``docs_sql`` must yield (doc_id, text)."""
    qvals = ", ".join(
        f"({int(qid)}, '" + t.replace("'", "''") + "')"
        for qid, qtext in queries
        for t in dict.fromkeys(w for w in qtext.lower().split() if w))
    return f"""
WITH d AS ({docs_sql}),
toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
  FROM d),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scal AS (SELECT count(*)::BIGINT AS n, (sum(dl) // count(*))::BIGINT
                AS avgdl FROM dl),
q(query_id, term) AS (VALUES {qvals}),
posts AS (
  SELECT q.query_id, tf.doc_id, tf.tf, dfreq.df, dl.dl, s.n, s.avgdl
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
          JOIN dl USING (doc_id) CROSS JOIN scal s),
contrib AS (
  SELECT query_id, doc_id,
         (length(bin(n // df)) * (22 * tf * avgdl)
          // (10 * tf * avgdl + 3 * avgdl + 9 * dl))::BIGINT AS c
  FROM posts),
scored AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score
           FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
           doc_id) AS rank
  FROM scored)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
"""
