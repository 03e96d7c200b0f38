"""Unigram-LM tokenizer (SentencePiece family, Kudo 2018): Viterbi
encoding + usage-prune training — integer-exact, SQL-twin replayable.

Completes the tokenizer triad next to bpe.py's BPE and WordPiece: where
BPE composes a vocabulary bottom-up by merging, the unigram model starts
from an OVER-complete seed (every frequent substring) and segments each
word into the maximum-score piece sequence by dynamic programming,
pruning the vocabulary by observed usage. The published algorithm scores
pieces with EM-estimated log-probs; this implementation quantizes them
to integers with the `curation._ilog2` trick: score = bit_length(count)
- (bit_length(total) + 1), i.e. ~log2(count/total) < 0 — negative like
a log-prob, so Viterbi's maximization genuinely prefers FEWER,
higher-frequency pieces (a positive frequency score would degenerate
into char-spam: more addends always wins). bit_length is
length(bin(x)) in Spark and length(printf('%b', x)) in DuckDB, so the
ENTIRE pipeline — seeding, Viterbi
segmentation incl. tie-breaks, usage counting, pruning — is exact
integer arithmetic that a generated SQL twin replays bit-for-bit: the
oracle unrolls the DP over word positions as chained CTEs (dp forward,
backpointer backtrace backward), the pagerank/perceptron pattern
stretched to a lattice.

Spark shapes (the 100 TB contract):
- `unigram_seed_vocab`: substring explode (bounded ×max_len·word_len) →
  ONE hash-agg with map-side combine. Nothing quadratic.
- `unigram_encode`: the word-cache shape real tokenizers use — Viterbi
  runs once per DISTINCT word (hash-agg, typically 10^3× smaller than
  the corpus), vocab rides to executors as a broadcast dict, and tokens
  join back to documents on the word (equi-join + one per-doc regroup).
  Python cost is O(len·max_len) per distinct word via Arrow-batched
  mapInPandas — never per corpus row.
- `unigram_train`: R pruning rounds over the SAME distinct-word cache;
  per round one usage hash-agg and a vocabulary-sized rank cut.

Viterbi tie-break contract (must match the SQL twin): maximize total
score; among equal-score splits of s[0:j] the SMALLEST split point i
wins (Python: update only on strictly-greater while i ascends; SQL:
min(i) FILTER (v = max(v))). Words longer than `max_word_len` are
dropped by encode/train on BOTH sides — the unrolled CTE twin is finite
and real tokenizers cap candidate length the same way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def _blen(c) -> Column:
    """bit_length(x) for x >= 1 (= ilog2(x) + 1) as pure string ops —
    Spark length(bin(x)), DuckDB length(printf('%b', x))."""
    return F.length(F.bin(c)).cast("long")


def _words_col(text_col: str, max_word_len: "int | None" = None) -> Column:
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda t: t != "")
    if max_word_len is not None:
        words = F.filter(words, lambda t: F.length(t) <= max_word_len)
    return words


def unigram_seed_vocab(docs: DataFrame, text_col: str,
                       max_len: int = 6, min_count: int = 4,
                       max_word_len: "int | None" = None) -> DataFrame:
    """Over-complete seed vocabulary: every substring of length
    1..max_len of the lowercase whitespace words with count >=
    min_count, PLUS every single character regardless of count (the
    fallback alphabet — Viterbi must always reach every position).
    Returns (piece, score) with score = bit_length(count) -
    (bit_length(total) + 1) <= -1, the integer log-prob quantization.
    One substring explode + one hash-agg (+ a 1-row total agg)."""
    w = F.col("w")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.transform(
            F.sequence(F.lit(1),
                       F.least(F.lit(max_len), F.length(w) - i + 1)),
            lambda L: w.substr(i, L))))
    kept = (docs
            .select(F.explode(_words_col(text_col, max_word_len))
                    .alias("w"))
            .select(F.explode(subs).alias("piece"))
            .groupBy("piece").agg(F.count(F.lit(1)).alias("c"))
            .filter((F.col("c") >= min_count)
                    | (F.length("piece") == 1)))
    total = kept.agg(F.sum("c").alias("tc"))
    return kept.crossJoin(total).select(
        "piece",
        (_blen(F.col("c")) - (_blen(F.col("tc")) + 1)).alias("score"))


def _viterbi(word: str, vocab: "dict[str, int]", max_len: int,
             unk: int) -> "list[str]":
    """Max-total-score segmentation (scores are negative log-prob
    quantizations, so fewer/higher-probability pieces win); ties ->
    smallest split point. Characters absent from the vocab segment as
    themselves at the `unk` score (never triggered when encoding the
    corpus the vocab was seeded from — the seed keeps every
    character)."""
    n = len(word)
    dp: "list[int | None]" = [None] * (n + 1)
    bp = [0] * (n + 1)
    dp[0] = 0
    for j in range(1, n + 1):
        best = None
        bi = 0
        for i in range(max(0, j - max_len), j):
            if dp[i] is None:
                continue
            s = vocab.get(word[i:j])
            if s is None:
                if j - i != 1:
                    continue
                s = unk
            cand = dp[i] + s
            if best is None or cand > best:
                best, bi = cand, i
        dp[j], bp[j] = best, bi
    out: "list[str]" = []
    j = n
    while j > 0:
        out.append(word[bp[j]:j])
        j = bp[j]
    out.reverse()
    return out


def _segment_distinct_words(wdf: DataFrame, vocab_rows: list,
                            max_len: int) -> DataFrame:
    """(w) -> (w, toks): Viterbi once per distinct word, Arrow-batched;
    the vocab travels in the task closure (vocabulary-sized contract,
    like bm25's broadcast query terms)."""
    vd = {p: int(s) for p, s in vocab_rows}
    unk = 2 * min(vd.values(), default=-1) - 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "w": pdf["w"],
                "toks": [_viterbi(w, vd, max_len, unk)
                         for w in pdf["w"]]})

    return wdf.select("w").mapInPandas(
        run, schema="w string, toks array<string>")


def unigram_encode(docs: DataFrame, id_col: str, text_col: str,
                   vocab: DataFrame, max_len: int = 6,
                   max_word_len: int = 16) -> DataFrame:
    """Tokenize with a learned (piece, score) vocabulary: returns
    (id_col, tokens array<string>, n_tokens). Words longer than
    `max_word_len` are dropped (documented contract shared with the
    SQL twin's unroll bound). Plan: distinct-word hash-agg → Viterbi →
    equi-join back → one per-doc regroup (order restored by position
    sort inside the aggregate — no window)."""
    vocab_rows = [(r["piece"], r["score"]) for r in vocab.collect()]
    dw = docs.select(
        F.col(id_col),
        F.posexplode(_words_col(text_col, max_word_len))
        .alias("pos", "w"))
    seg = _segment_distinct_words(
        dw.select("w").distinct(), vocab_rows, max_len)
    return (dw.join(seg, "w")
            .groupBy(id_col)
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                lambda x: x["toks"])).alias("tokens"))
            .withColumn("n_tokens", F.size("tokens")))


def unigram_train(docs: DataFrame, text_col: str, vocab_size: int,
                  max_len: int = 6, min_count: int = 4,
                  rounds: int = 2, max_word_len: int = 16) -> DataFrame:
    """Usage-prune training: seed over-complete, then `rounds` times
    (1) Viterbi-segment the distinct words with the current vocab,
    (2) usage(piece) = Σ_word count(word) · occurrences(piece, word),
    (3) keep every single character plus the top
    (vocab_size - n_chars) multi-char pieces by (usage DESC, piece ASC)
    with usage >= 1, re-scoring everything to ilog2(usage + 1).
    Returns the final (piece, score). The rank cut is a window over a
    vocabulary-sized table (not corpus-sized)."""
    from pyspark.sql import Window

    wcounts = (docs
               .select(F.explode(_words_col(text_col, max_word_len))
                       .alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("wc")))
    wcounts = wcounts.persist()
    vocab = unigram_seed_vocab(docs, text_col, max_len, min_count,
                               max_word_len)
    for _ in range(rounds):
        rows = [(r["piece"], r["score"]) for r in vocab.collect()]
        seg = _segment_distinct_words(wcounts, rows, max_len)
        usage = (seg.join(wcounts, "w")
                 .select(F.explode("toks").alias("piece"), "wc")
                 .groupBy("piece").agg(F.sum("wc").alias("usage")))
        # chars keep their alphabet slot at any usage; multi-char
        # pieces compete for the remaining budget
        chars = [(p, s) for p, s in rows if len(p) == 1]
        budget = max(0, vocab_size - len(chars))
        char_df = (vocab.filter(F.length("piece") == 1)
                   .select("piece")
                   .join(usage, "piece", "left")
                   .select("piece",
                           F.coalesce("usage", F.lit(0)).alias("usage")))
        multi = (usage.filter((F.length("piece") > 1)
                              & (F.col("usage") >= 1))
                 .withColumn("rk", F.row_number().over(
                     Window.orderBy(F.desc("usage"), F.asc("piece"))))
                 .filter(F.col("rk") <= budget)
                 .select("piece", "usage"))
        kept = char_df.unionByName(multi)
        tot = kept.agg(F.sum(F.col("usage") + 1).alias("tu"))
        vocab = kept.crossJoin(tot).select(
            "piece",
            (_blen(F.col("usage") + 1)
             - (_blen(F.col("tu")) + 1)).alias("score"))
    return vocab


# ------------------------------------------------------- SQL twins


def _sql_words(docs_sql: str, max_word_len: int) -> str:
    return f"""
docs AS MATERIALIZED ({docs_sql}),
allw AS MATERIALIZED (
  SELECT w FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '' AND length(x) <= {max_word_len}))
           AS w
    FROM docs)),
words AS MATERIALIZED (
  SELECT w, count(*) AS wc FROM allw GROUP BY w)"""


def _sql_seed(max_len: int, min_count: int) -> str:
    return f"""
subs AS (
  SELECT substring(a.w, i.i, L.L) AS piece
  FROM allw a,
       unnest(range(1, length(a.w) + 1)) AS i(i),
       unnest(range(1, {max_len} + 1)) AS L(L)
  WHERE i.i + L.L - 1 <= length(a.w)),
keptseed AS MATERIALIZED (
  SELECT piece, c
  FROM (SELECT piece, count(*) AS c FROM subs GROUP BY piece)
  WHERE c >= {min_count} OR length(piece) = 1),
vocab AS MATERIALIZED (
  SELECT piece,
         (length(printf('%b', c))
          - (SELECT length(printf('%b', sum(c)::BIGINT)) + 1 FROM keptseed)
         )::BIGINT AS score
  FROM keptseed)"""


def _sql_viterbi(vocab_cte: str, max_len: int, max_word_len: int,
                 tag: str) -> str:
    """The unrolled lattice: matches -> dp{j} forward (max score,
    min-i backpointer) -> backtrace -> seg{tag}(w, toks). Every CTE a
    later step references more than once is MATERIALIZED — DuckDB
    1.x inlines plain CTEs per reference, which turns a chained DP
    into exponential plan expansion."""
    parts = [f"""
m{tag} AS MATERIALIZED (
  SELECT ww.w, i.i - 1 AS i, i.i - 1 + L.L AS j, v.score
  FROM words ww,
       unnest(range(1, length(ww.w) + 1)) AS i(i),
       unnest(range(1, {max_len} + 1)) AS L(L)
       JOIN {vocab_cte} v
         ON v.piece = substring(ww.w, i.i, L.L)
  WHERE i.i + L.L - 1 <= length(ww.w)),
dp{tag}0 AS MATERIALIZED (
  SELECT w, 0::BIGINT AS dp FROM words)"""]
    for k in range(1, max_word_len + 1):
        lo = max(0, k - max_len)
        prev = " UNION ALL ".join(
            f"SELECT w, {j} AS j, dp FROM dp{tag}{j}"
            for j in range(lo, k))
        parts.append(f"""
c{tag}{k} AS MATERIALIZED (
  SELECT m.w, m.i, d.dp + m.score AS v
  FROM m{tag} m JOIN ({prev}) d
    ON d.w = m.w AND d.j = m.i
  WHERE m.j = {k}),
dp{tag}{k} AS MATERIALIZED (
  SELECT w, max(v) AS dp FROM c{tag}{k} GROUP BY w),
bp{tag}{k} AS (
  SELECT c.w, {k} AS j, min(c.i) AS bp
  FROM c{tag}{k} c JOIN dp{tag}{k} d ON c.w = d.w AND c.v = d.dp
  GROUP BY c.w)""")
    bpall = " UNION ALL ".join(
        f"SELECT * FROM bp{tag}{k}" for k in range(1, max_word_len + 1))
    parts.append(f"""
bpall{tag} AS MATERIALIZED ({bpall}),
p{tag}0 AS (SELECT w, length(w) AS pos, 0 AS k,
            CAST(NULL AS VARCHAR) AS piece FROM words)""")
    for s in range(1, max_word_len + 1):
        parts.append(f"""
p{tag}{s} AS MATERIALIZED (
  SELECT p.w, b.bp AS pos, {s} AS k,
         substring(p.w, b.bp + 1, p.pos - b.bp) AS piece
  FROM p{tag}{s - 1} p JOIN bpall{tag} b
    ON b.w = p.w AND b.j = p.pos
  WHERE p.pos > 0)""")
    pieces = " UNION ALL ".join(
        f"SELECT w, k, piece FROM p{tag}{s}"
        for s in range(1, max_word_len + 1))
    parts.append(f"""
pieces{tag} AS ({pieces}),
seg{tag} AS MATERIALIZED (
  SELECT w, list(piece ORDER BY k DESC) AS toks
  FROM pieces{tag} GROUP BY w)""")
    return ",".join(parts)


def unigram_encode_oracle_sql(docs_sql: str, max_len: int = 6,
                              min_count: int = 4,
                              max_word_len: int = 16,
                              id_col: str = "doc_id") -> str:
    """SQL twin of unigram_encode over a seed vocabulary regenerated
    from the SAME corpus: yields (id_col, n_tokens, tokens_md5) — the
    md5 hashes the space-joined per-document token stream, so every
    token and its order is checked."""
    return f"""
WITH {_sql_words(docs_sql, max_word_len)},
{_sql_seed(max_len, min_count)},
{_sql_viterbi('vocab', max_len, max_word_len, 'e')},
dlist AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '' AND length(x) <= {max_word_len})
           AS ws
  FROM docs),
dw AS (
  SELECT d.{id_col}, i.i AS pos, d.ws[i.i] AS w
  FROM dlist d, unnest(range(1, len(d.ws) + 1)) AS i(i)),
joined AS (
  SELECT dw.{id_col}, dw.pos, s.toks
  FROM dw JOIN sege s ON s.w = dw.w),
assembled AS (
  SELECT {id_col},
         flatten(list(toks ORDER BY pos)) AS tokens
  FROM joined GROUP BY {id_col})
SELECT {id_col}, len(tokens)::INT AS n_tokens,
       md5(array_to_string(tokens, ' ')) AS tokens_md5
FROM assembled
"""


def unigram_train_oracle_sql(docs_sql: str, vocab_size: int,
                             max_len: int = 6, min_count: int = 4,
                             rounds: int = 1,
                             max_word_len: int = 16) -> str:
    """SQL twin of unigram_train: replays seeding + `rounds` full
    Viterbi/usage/prune rounds, yielding the final (piece, score)."""
    blocks = [_sql_words(docs_sql, max_word_len), _sql_seed(max_len,
                                                            min_count)]
    cur = "vocab"
    for r in range(rounds):
        tag = f"r{r}"
        blocks.append(_sql_viterbi(cur, max_len, max_word_len, tag))
        blocks.append(f"""
usage{tag} AS (
  SELECT piece, sum(wc)::BIGINT AS usage
  FROM (SELECT s.w, unnest(s.toks) AS piece FROM seg{tag} s) t
       JOIN words USING (w)
  GROUP BY piece),
chars{tag} AS (
  SELECT v.piece, coalesce(u.usage, 0) AS usage
  FROM {cur} v LEFT JOIN usage{tag} u USING (piece)
  WHERE length(v.piece) = 1),
budget{tag} AS (
  SELECT greatest(0, {vocab_size} - count(*)) AS b FROM chars{tag}),
multi{tag} AS (
  SELECT piece, usage
  FROM (SELECT piece, usage,
               row_number() OVER (ORDER BY usage DESC, piece ASC) AS rk
        FROM usage{tag}
        WHERE length(piece) > 1 AND usage >= 1)
  WHERE rk <= (SELECT b FROM budget{tag})),
keptu{tag} AS MATERIALIZED (
  SELECT * FROM chars{tag} UNION ALL SELECT * FROM multi{tag}),
next{tag} AS MATERIALIZED (
  SELECT piece,
         (length(printf('%b', usage + 1))
          - (SELECT length(printf('%b', sum(usage + 1)::BIGINT)) + 1
             FROM keptu{tag}))::BIGINT AS score
  FROM keptu{tag})""")
        cur = f"next{tag}"
    body = ",".join(blocks)
    return f"WITH {body}\nSELECT piece, score FROM {cur}\n"
