"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

Training a byte-pair-encoding vocabulary IS a distributed aggregation
problem: each merge round counts adjacent-symbol pairs across the whole
corpus (one hash-agg with map-side combine), picks the most frequent pair
(deterministic tiebreak), and rewrites the corpus. This implementation
keeps the rewrite INSIDE the plan: the token sequence of each word is a
delimiter-wrapped string (``·a··b··c·``) and applying a merge is one
literal ``replace('·x··y·' -> '·xy·')`` — plain string replace is
left-to-right non-overlapping in every engine, which is exactly BPE's
greedy merge order, and the wrapping makes cross-token false matches
impossible. After M rounds the corpus column is just M nested replaces —
no materialization, no shuffle beyond the per-round pair-count agg.

Driver traffic per round: ONE row (the argmax pair). Every round is
integer counting with a lexicographic tiebreak, so ``bpe_oracle_sql``
generates an unrolled-CTE SQL twin that replays the entire training run
bit-for-bit (the perceptron/pagerank pattern). ``bpe_encode`` applies a
learned merge list as the same nested-replace chain.

Word pre-splitting is lowercase whitespace tokenization (the corpus
family's split); symbols start as characters. End-of-word markers are a
vocabulary convention, not a mechanics change — add '</w>' as a final
character upstream if desired.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SEP = "·"  # '·' — must not occur in the corpus alphabet


def _wrapped_words(text_col: str) -> Column:
    """words -> one wrapped symbol-sequence string per word:
    'ab' -> '·a··b·'.

    The SEP contract ("must not occur in the corpus alphabet") is enforced
    IN-PLAN: a word containing U+00B7 throws (ANSI assert_true) instead of
    silently corrupting pair counts — one substring scan per word, same
    cost class as the split beside it."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                     lambda t: t != "")
    wrap = lambda w: F.when(  # noqa: E731
        F.assert_true(~w.contains(SEP),
                      F.concat(F.lit("bpe: corpus word contains the "
                                     "SEP delimiter '" + SEP + "': "), w)
                      ).isNull(),
        F.concat(F.lit(SEP), F.array_join(F.split(w, ""), SEP + SEP),
                 F.lit(SEP)))
    return F.transform(words, wrap)


def _apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    for x, y in merges:
        col = F.replace(col, F.lit(f"{SEP}{x}{SEP}{SEP}{y}{SEP}"),
                        F.lit(f"{SEP}{x}{y}{SEP}"))
    return col


def _unwrap_tokens(col: Column) -> Column:
    """'·a··b·' -> ['a', 'b']."""
    return F.split(F.regexp_replace(col, f"^{SEP}|{SEP}$", ""), SEP + SEP)


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """seqs(seq string, cnt long) -> (x, y, n) adjacent-pair counts,
    weighted by cnt (the word-form frequency): a pair occurring inside a
    word form that appears cnt times in the corpus contributes cnt — the
    exact same totals as counting over the exploded corpus."""
    toks = _unwrap_tokens(F.col("seq"))
    return (seqs.select(toks.alias("toks"), "cnt")
            .where(F.size("toks") >= 2)
            .select(F.explode(F.expr(
                "transform(slice(toks, 1, size(toks) - 1), "
                "(t, i) -> struct(t AS x, toks[i + 1] AS y))")).alias("p"),
                "cnt")
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").cast("long").alias("n")))


def bpe_train(docs: DataFrame, text_col: str, n_merges: int,
              checkpoint_every: int = 16) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges over the corpus. Returns
    [(x, y, count)] in merge order. Winner per round = max count, ties by
    lexicographic (x, y) — fully deterministic.

    Scale shape (the Sennrich form): the corpus collapses to DISTINCT
    word forms with counts up front — one hash-agg; distinct forms are
    typically ~10^3x smaller than the corpus — and every later round
    counts pairs over the (form, cnt) table with cnt-weighted sums, so
    per-round work is O(distinct forms), independent of corpus size.
    Merges apply INCREMENTALLY: only the merges learned since the last
    checkpoint are replayed onto the checkpointed column (a full-chain
    replay from raw words would be O(M^2) replaces over M rounds), and
    the column re-checkpoints every `checkpoint_every` rounds to bound
    plan depth. Results are bit-identical to the exploded-corpus form:
    replace() is corpus-wide per merge in both shapes."""
    words = (docs.select(F.explode(_wrapped_words(text_col)).alias("seq"))
             .groupBy("seq")
             .agg(F.count("*").cast("long").alias("cnt")))
    words = words.localCheckpoint()  # pay the explode+agg once

    pending: list[tuple[str, str]] = []  # merges newer than the checkpoint
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        seqs = words.select(
            _apply_merges(F.col("seq"), pending).alias("seq"), "cnt")
        top = (_pair_counts(seqs)
               .orderBy(F.col("n").desc(), "x", "y").limit(1).collect())
        if not top:
            break
        r = top[0]
        pending.append((r["x"], r["y"]))
        out.append((r["x"], r["y"], int(r["n"])))
        if len(pending) >= checkpoint_every:
            # distinct char sequences stay distinct under the (pure
            # function) merge chain, so no re-grouping is needed
            words = words.select(
                _apply_merges(F.col("seq"), pending).alias("seq"),
                "cnt").localCheckpoint()
            pending = []
    return out


def bpe_encode(docs: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list: (id, tokens array<string>, n_tokens).
    The whole encode is ONE projection (nested replaces + split) — zero
    shuffles, codegen-friendly, exactly what a 100 TB tokenization pass
    should be."""
    seqs = F.transform(_wrapped_words(text_col),
                       lambda w: _apply_merges(w, merges))
    toks = F.flatten(F.transform(seqs, _unwrap_tokens))
    return docs.select(F.col(id_col),
                       toks.alias("tokens"),
                       F.size(toks).alias("n_tokens"))


def bpe_oracle_sql(docs_sql: str, n_merges: int) -> str:
    """SQL twin of bpe_train (generated — the unrolled-CTE pattern):
    `docs_sql` must yield (text). Returns (step, x, y, n) for the
    `n_merges` training rounds. INCREMENTAL: round t's corpus CTE is
    round t-1's with ONE replace applied, the winner row entering via a
    single-row CROSS JOIN (scalar subqueries inside replace() are
    re-evaluated per row by DuckDB — that shape was catastrophically
    slow; one-row cross joins are constant-folded)."""
    d = SEP
    ctes = [f"""q0 AS (
  SELECT '{d}' || array_to_string(string_split(w, ''), '{d}{d}') || '{d}'
         AS seq
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM ({docs_sql})))"""]
    for t in range(1, n_merges + 1):
        ctes.append(f"""p{t} AS (
  SELECT toks[i] AS x, toks[i + 1] AS y, count(*)::BIGINT AS n
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        FROM (SELECT string_split(trim(seq, '{d}'), '{d}{d}') AS toks
              FROM q{t - 1})
        WHERE len(toks) >= 2)
  GROUP BY toks[i], toks[i + 1])""")
        ctes.append(f"""m{t} AS (
  SELECT x, y, n FROM p{t} ORDER BY n DESC, x, y LIMIT 1)""")
        ctes.append(f"""q{t} AS (
  SELECT replace(q.seq, '{d}' || m.x || '{d}{d}' || m.y || '{d}',
                 '{d}' || m.x || m.y || '{d}') AS seq
  FROM q{t - 1} q CROSS JOIN m{t} m)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS step, x, y, n FROM m{t}"
        for t in range(1, n_merges + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def bpe_encode_oracle_sql(docs_sql: str, merges: list[tuple[str, str]],
                          id_col: str = "doc_id") -> str:
    """SQL twin of bpe_encode for a LITERAL merge list: yields
    (id_col, n_tokens, tokens_md5) where tokens_md5 hashes the
    space-joined token stream (word order preserved)."""
    d = SEP
    e = f"'{d}' || array_to_string(string_split(w, ''), '{d}{d}') || '{d}'"
    for x, y in merges:
        e = f"replace({e}, '{d}{x}{d}{d}{y}{d}', '{d}{x}{y}{d}')"
    per_word = f"string_split(trim({e}, '{d}'), '{d}{d}')"
    return f"""
WITH docs AS ({docs_sql}),
w AS (
  SELECT {id_col},
         flatten(list_transform(
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x <> ''),
           w -> {per_word})) AS toks
  FROM docs)
SELECT {id_col}, len(toks)::INT AS n_tokens,
       md5(array_to_string(toks, ' ')) AS tokens_md5
FROM w
"""


# ------------------------------------------------------- WordPiece


def wordpiece_train(docs: DataFrame, text_col: str, n_merges: int,
                    checkpoint_every: int = 16
                    ) -> list[tuple[str, str, int, int, int]]:
    """WordPiece-style merge learning (Schuster & Nakajima 2012; the
    BERT tokenizer family): per round the winner maximizes the
    LIKELIHOOD score ``count(xy) / (count(x) * count(y))`` instead of
    BPE's raw pair count. Returns [(x, y, n_pair, cx, cy)] in merge
    order; apply with `bpe_encode` (the merge-replay tokenizer the
    learned list defines — longest-match-first inference is the usual
    serving-time variant).

    The argmax is EXACT over integer fractions without quadratic work:
    an in-plan double approximation bounds the winner (every pair with
    approx score >= max_approx * (1 - 1e-9) survives — double's
    relative error is < 1e-15, so the true winner is provably in the
    survivor set), then the handful of survivors settle at the driver
    by integer cross-multiplication (n1*cx2*cy2 vs n2*cx1*cy1, Python
    bignums), ties by lexicographic (x, y). Driver traffic per round:
    the survivor rows (almost always 1). Same rewrite mechanics and
    checkpoint cadence as `bpe_train`."""
    words = (docs.select(F.explode(_wrapped_words(text_col)).alias("seq"))
             .groupBy("seq")
             .agg(F.count("*").cast("long").alias("cnt")))
    words = words.localCheckpoint()

    pending: list[tuple[str, str]] = []
    out: list[tuple[str, str, int, int, int]] = []
    for _ in range(n_merges):
        seqs = words.select(
            _apply_merges(F.col("seq"), pending).alias("seq"), "cnt")
        toks = seqs.select(
            F.explode(_unwrap_tokens(F.col("seq"))).alias("tok"), "cnt")
        uni = (toks.groupBy("tok")
               .agg(F.sum("cnt").cast("long").alias("c")))
        pairs = _pair_counts(seqs)
        scored = (pairs
                  .join(uni.select(F.col("tok").alias("x"),
                                   F.col("c").alias("cx")), "x")
                  .join(uni.select(F.col("tok").alias("y"),
                                   F.col("c").alias("cy")), "y")
                  .withColumn("s", F.col("n") / (F.col("cx") * F.col("cy"))))
        m = scored.agg(F.max("s").alias("m"))
        survivors = (scored.crossJoin(F.broadcast(m))
                     .where(F.col("s") >= F.col("m") * (1 - 1e-9))
                     .select("x", "y", "n", "cx", "cy").collect())
        if not survivors:
            break

        # exact fraction argmax: n/(cx*cy) desc, then (x, y) asc
        def beats(a, b):
            lhs = a["n"] * b["cx"] * b["cy"]
            rhs = b["n"] * a["cx"] * a["cy"]
            if lhs != rhs:
                return lhs > rhs
            return (a["x"], a["y"]) < (b["x"], b["y"])
        best = survivors[0]
        for r in survivors[1:]:
            if beats(r, best):
                best = r
        pending.append((best["x"], best["y"]))
        out.append((best["x"], best["y"], int(best["n"]),
                    int(best["cx"]), int(best["cy"])))
        if len(pending) >= checkpoint_every:
            words = words.select(
                _apply_merges(F.col("seq"), pending).alias("seq"),
                "cnt").localCheckpoint()
            pending = []
    return out


def wordpiece_oracle_sql(docs_sql: str, n_merges: int) -> str:
    """SQL twin of wordpiece_train (generated, incremental like
    bpe_oracle_sql): yields (step, x, y, n, cx, cy). The same
    two-stage argmax — double-approx prefilter (an independent
    conservative superset; the engines' candidate sets need not match,
    only the exact winner does) then HUGEINT cross-multiplication via
    NOT EXISTS over the tiny survivor set."""
    d = SEP
    ctes = [f"""q0 AS MATERIALIZED (
  SELECT '{d}' || array_to_string(string_split(w, ''), '{d}{d}') || '{d}'
         AS seq
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM ({docs_sql})))"""]
    for t in range(1, n_merges + 1):
        ctes.append(f"""tk{t} AS MATERIALIZED (
  SELECT string_split(trim(seq, '{d}'), '{d}{d}') AS toks FROM q{t - 1})""")
        ctes.append(f"""u{t} AS MATERIALIZED (
  SELECT tok, count(*)::BIGINT AS c
  FROM (SELECT unnest(toks) AS tok FROM tk{t}) GROUP BY tok)""")
        ctes.append(f"""p{t} AS MATERIALIZED (
  SELECT toks[i] AS x, toks[i + 1] AS y, count(*)::BIGINT AS n
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i
        FROM tk{t} WHERE len(toks) >= 2)
  GROUP BY toks[i], toks[i + 1])""")
        ctes.append(f"""c{t} AS MATERIALIZED (
  SELECT p.x, p.y, p.n, ux.c AS cx, uy.c AS cy,
         p.n / (ux.c * uy.c)::DOUBLE AS s
  FROM p{t} p JOIN u{t} ux ON ux.tok = p.x
              JOIN u{t} uy ON uy.tok = p.y)""")
        ctes.append(f"""v{t} AS MATERIALIZED (
  SELECT * FROM c{t}
  WHERE s >= (SELECT max(s) FROM c{t}) * (1 - 1e-9))""")
        ctes.append(f"""m{t} AS MATERIALIZED (
  SELECT x, y, n, cx, cy FROM v{t} s1
  WHERE NOT EXISTS (SELECT 1 FROM v{t} s2 WHERE
      s2.n::HUGEINT * s1.cx * s1.cy > s1.n::HUGEINT * s2.cx * s2.cy
      OR (s2.n::HUGEINT * s1.cx * s1.cy = s1.n::HUGEINT * s2.cx * s2.cy
          AND (s2.x < s1.x OR (s2.x = s1.x AND s2.y < s1.y))))
  LIMIT 1)""")
        ctes.append(f"""q{t} AS MATERIALIZED (
  SELECT replace(q.seq, '{d}' || m.x || '{d}{d}' || m.y || '{d}',
                 '{d}' || m.x || m.y || '{d}') AS seq
  FROM q{t - 1} q CROSS JOIN m{t} m)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS step, x, y, n, cx, cy FROM m{t}"
        for t in range(1, n_merges + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel
