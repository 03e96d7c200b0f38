"""Text analysis: token counting, quality scoring, language-ID, fingerprint.

All built-in column expressions — the whole module compiles to one
whole-stage-codegen'd projection per operator. Designed so each operator
has an exact DuckDB-SQL oracle (same split/replace semantics; regex kept
to the portable subset: \\s, \\W, character classes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# Top function words per language (standard public frequency lists).
# The driver-gate oracles are GENERATED from these lists
# (__spark_entry__._quality_sql/_lang_sql), so Spark and DuckDB always
# score against the same vocabulary.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "he", "was", "for", "on", "are", "with", "as", "his", "they",
           "at", "be", "this", "have", "from", "or"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "sie", "es",
           "ein", "er", "zu", "wir", "den", "mit", "sich", "auf", "war",
           "auch", "an", "werden", "aus", "wie", "einen", "dem"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "que", "est",
           "pas", "pour", "qui", "dans", "ce", "il", "au", "sur", "se",
           "plus", "par", "avec", "son", "ne", "je"],
    "es": ["el", "la", "los", "que", "de", "no", "y", "en", "un", "ser",
           "se", "las", "por", "para", "con", "una", "su", "al", "lo",
           "como", "pero", "sus", "me", "hay", "esta"],
}


def _ws_tokens(text_col):
    # split on whitespace; trailing empty strings removed to match
    # DuckDB's string_split_regex + list filtering
    return F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")


# GPT-2-style pre-tokenizer regex (contractions, letter runs, digit
# runs, symbol runs, whitespace runs — each match is one pre-token, the
# unit BPE merges operate inside). Kept to the syntax subset shared by
# Java regex (Spark) and RE2 (DuckDB): \p{L}/\p{N} classes, alternation,
# NO lookahead — the canonical pattern's `\s+(?!\S)` trailing-space
# branch is dropped (RE2 has no lookahead), which only changes how runs
# of spaces split, not the count semantics we expose.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars, whitespace-token count, distinct tokens, BPE-ish counts:
    n_pretokens = GPT-2-style pre-tokenizer regex matches (the real
    pre-BPE unit), n_subwords_est = chars/4 (the usual quick budget
    heuristic), punct count."""
    toks = _ws_tokens(text_col)
    n_punct = F.size(F.filter(F.split(F.col(text_col), ""),
                              lambda ch: ch.rlike("[^a-zA-Z0-9\\s]")))
    return df.withColumns({
        "n_chars": F.length(F.col(text_col)),
        "n_tokens": F.size(toks),
        "n_distinct_tokens": F.size(F.array_distinct(toks)),
        "n_punct": n_punct,
        "n_pretokens": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE),
                                 F.lit(0))),
        "n_subwords_est": F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("long"),
    })


def quality_score(df: DataFrame, text_col: str = "text",
                  lang: str = "en") -> DataFrame:
    """Heuristic quality: stopword ratio, mean token length, punct density
    → score in [0,1]. Mirrors the usual pretraining-corpus filters
    (C4/Gopher-style rules) with deterministic arithmetic."""
    toks = _ws_tokens(text_col)
    n_tok = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0,
                          (F.length(F.col(text_col)) - (n_tok - 1)) / n_tok
                          ).otherwise(F.lit(0.0))
    # score: reward stopword presence (natural language) and 3-10 char
    # mean token length; penalize degenerate repetition
    uniq_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok) \
        .otherwise(F.lit(0.0))
    score = (F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
             + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0)
                .otherwise(0.0) * 0.3
             + F.least(uniq_ratio * 2, F.lit(1.0)) * 0.3)
    return df.withColumns({
        "n_tokens": n_tok,
        "stopword_ratio": F.round(stop_ratio, 6),
        "mean_token_len": F.round(mean_tok_len, 6),
        "uniq_ratio": F.round(uniq_ratio, 6),
        "quality_score": F.round(score, 6),
    })


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID over {en,de,fr,es}; ties → first by count
    then language code order (deterministic)."""
    toks = F.transform(_ws_tokens(text_col), lambda t: F.lower(t))
    scores = {}
    for code, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores[code] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # argmax with deterministic tiebreak on language code order
    best = None
    for code in sorted(STOPWORDS):
        cond = None
        for other in sorted(STOPWORDS):
            if other == code:
                continue
            c = (scores[code] > scores[other]) if other < code else \
                (scores[code] >= scores[other])
            cond = c if cond is None else (cond & c)
        best = F.when(cond, code) if best is None else best.when(cond, code)
    return df.withColumn(out_col, best.otherwise("unknown")) \
             .withColumns({f"sw_{c}": scores[c] for c in sorted(STOPWORDS)})


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Degenerate-repetition signal (Gopher-style repetition filters):
    the most frequent token's share of the document. Computed per row as
    a single fold over the SORTED token array (longest equal-run) — the
    per-element filter-count shape would re-evaluate the token split per
    distinct token (the lambda-CSE trap); the sorted-run fold touches
    each token once."""
    toks = F.array_sort(F.transform(_ws_tokens(text_col),
                                    lambda t: F.lower(t)))
    # materialize the (cnt, top) fold ONCE in its own Project (same
    # two-stage shape as quality_classify): deriving three columns from
    # the fold expression directly re-evaluated the sort+fold per
    # column (HOFs are CodegenFallback — no subexpression elimination).
    stats = df.withColumn("_rs", _run_stats(toks))
    n, top = F.col("_rs")["cnt"], F.col("_rs")["top"]
    return (stats.withColumns({
        "n_tokens": n.cast("int"),
        "top_token_count": top.cast("int"),
        "repetition_ratio": F.round(
            F.when(n > 0, top / n).otherwise(F.lit(0.0)), 6),
    }).drop("_rs"))


def _run_stats(sorted_arr):
    """One-pass fold over a SORTED array returning
    struct(cnt = total elements, top = longest equal-run, ss = Σ run²).
    ss is the collision count of the element histogram (Σ cᵢ²) — the
    basis of Rényi-2 perplexity — computed without a groupBy and without
    the per-element-filter lambda-CSE trap (each element touched once).
    Empty-string sentinel is safe: callers pass arrays of non-empty
    elements."""
    zero = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0).cast("long").alias("top"),
                    F.lit(0).cast("long").alias("ss"),
                    F.lit(0).cast("long").alias("cnt"))

    def step(a, x):
        same = x == a["prev"]
        run = F.when(same, a["run"] + 1).otherwise(F.lit(1).cast("long"))
        ss = F.when(same, a["ss"]).otherwise(a["ss"] + a["run"] * a["run"])
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(a["top"], run).alias("top"),
                        ss.alias("ss"), (a["cnt"] + 1).alias("cnt"))

    return F.aggregate(
        sorted_arr, zero, step,
        lambda a: F.struct(a["cnt"].alias("cnt"),
                           a["top"].alias("top"),
                           (a["ss"] + a["run"] * a["run"]).alias("ss")))


def quality_classify(df: DataFrame, text_col: str = "text",
                     lang: str = "en") -> DataFrame:
    """Perplexity-proxy quality classifier: bucket documents into
    good / mediocre / junk (the CCNet head/middle/tail idea, Wenzek et
    al. 2020, combined with Gopher-style repetition/length rules, Rae et
    al. 2021).

    The perplexity proxy is Rényi-2 perplexity PPL₂ = n² / Σcᵢ² — the
    inverse collision probability of the char / token histogram. Like LM
    perplexity it measures the effective alphabet / vocabulary size of
    the document (degenerate text → small PPL₂), but it needs only
    integer counts + one IEEE division, so the DuckDB oracle reproduces
    it EXACTLY; a Shannon/log entropy would hash-mismatch on 1-ulp libm
    log differences between the JVM and DuckDB.

    Rules (evaluated in order; all arithmetic mirrored verbatim in the
    oracle SQL):
      junk     — n_tokens < 5, or top-token share > 0.3, or char PPL₂
                 < 10 (degenerate alphabet), or mean token length
                 outside [2, 12]
      good     — stopword_ratio ≥ 0.05 and token diversity
                 word_ppl / n_tokens ≥ 0.3
      mediocre — everything else
    """
    toks = F.transform(_ws_tokens(text_col), lambda t: F.lower(t))
    # strip whitespace first (ONE regex pass), then split — not a
    # per-character rlike filter (a regex invocation per char was ~3×
    # the cost for the same multiset of non-space chars). split('', '')
    # on an EMPTY string yields [''] (one phantom element), which would
    # give empty/whitespace-only docs char_ppl = 1.0 while the SQL
    # oracle (regexp_extract_all '\\S') gives 0.0 — filter it out, the
    # same guard _ws_tokens applies to its token array.
    chars = F.filter(
        F.split(F.regexp_replace(F.col(text_col), r"\s+", ""), ""),
        lambda c: c != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    # TWO-STAGE projection: the fold structs materialize in their own
    # Project and the derived columns below reference only cheap struct
    # fields. Higher-order-function folds are CodegenFallback, so a
    # single Project deriving 7 columns from the folds re-evaluates
    # them per column (no subexpression elimination there) — measured
    # ~5× the runtime of this shape. CollapseProject keeps the stages
    # apart because the fold aliases are non-cheap and multiply
    # referenced.
    stats = df.withColumns({
        "_tk": _run_stats(F.array_sort(toks)),
        "_ch": _run_stats(F.array_sort(chars)),
        "_nstop": F.size(F.filter(
            toks, lambda t: F.array_contains(sw, t))).cast("long"),
    })
    tk, ch = F.col("_tk"), F.col("_ch")
    n_tok, top, ss_w = tk["cnt"], tk["top"], tk["ss"]
    n_ch, ss_c = ch["cnt"], ch["ss"]
    char_ppl = F.when(ss_c > 0, (n_ch * n_ch) / ss_c).otherwise(F.lit(0.0))
    word_ppl = F.when(ss_w > 0, (n_tok * n_tok) / ss_w).otherwise(F.lit(0.0))
    rep = F.when(n_tok > 0, top / n_tok).otherwise(F.lit(0.0))
    n_stop = F.col("_nstop")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_len = F.when(n_tok > 0,
                      (F.length(F.col(text_col)) - (n_tok - 1)) / n_tok
                      ).otherwise(F.lit(0.0))
    junk = ((n_tok < 5) | (rep > 0.3) | (char_ppl < 10)
            | (mean_len < 2) | (mean_len > 12))
    good = (stop_ratio >= 0.05) & (F.when(n_tok > 0, word_ppl / n_tok)
                                   .otherwise(F.lit(0.0)) >= 0.3)
    return (stats.withColumns({
        "n_tokens": n_tok,
        "char_ppl": F.round(char_ppl, 6),
        "word_ppl": F.round(word_ppl, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "repetition_ratio": F.round(rep, 6),
        "mean_token_len": F.round(mean_len, 6),
        "quality_class": F.when(junk, "junk").when(good, "good")
                          .otherwise("mediocre"),
    }).drop("_tk", "_ch", "_nstop"))


# The Gopher quality-filter rule set (Rae et al. 2021, appendix A1.1 —
# public heuristics, since reused by MassiveText/RefinedWeb/Dolma).
# The driver-gate oracle is GENERATED from these constants so Spark and
# DuckDB always evaluate the same rule parameters.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN = 3, 10
GOPHER_BULLET_CHARS = ("•", "-", "*")


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher rule set as per-rule boolean columns + an overall
    ``gopher_keep``. Every ratio threshold is evaluated in INTEGER
    arithmetic (cross-multiplied), so the DuckDB oracle matches
    bit-for-bit with no float divides:

    - r_word_count:    50 <= words <= 100000
    - r_mean_word_len: 3 <= sum(len)/words <= 10
    - r_symbol_ratio:  (#'#' + #'...') / words <= 0.1
    - r_bullet_lines:  lines starting with a bullet <= 90%
    - r_ellipsis_lines: lines ending with '...' <= 30%
    - r_alpha_words:   words containing [A-Za-z] >= 80%
    - r_stopwords:     >= 2 distinct of the 8 Gopher stop words

    Empty-line and empty-token splits are filtered on both engines
    (the split('','') phantom-element trap). Line rules are vacuously
    true for line-less docs — such docs already fail r_word_count.
    Pure projection: zero exchanges, one codegen stage. The paper's
    repetition rules (dup-line/top-ngram fractions) live in
    repetition_stats."""
    t = F.col(text_col)
    toks = _ws_tokens(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: x != "")
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda a, tok: a + F.length(tok))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = ((F.length(t)
              - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
             ).cast("long")
    n_lines = F.size(lines).cast("long")
    bullets = F.array(*[F.lit(c) for c in GOPHER_BULLET_CHARS])
    n_bullet = F.size(F.filter(
        lines, lambda ln: F.array_contains(bullets, F.substring(ln, 1, 1)))
    ).cast("long")
    n_ell_lines = F.size(F.filter(
        lines, lambda ln: ln.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(
        toks, lambda tok: tok.rlike("[A-Za-z]"))).cast("long")
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_distinct(F.filter(
        toks, lambda tok: F.array_contains(sw, F.lower(tok)))))
    rules = {
        "r_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (n_words > 0)
        & (sum_len >= GOPHER_MIN_MEAN_LEN * n_words)
        & (sum_len <= GOPHER_MAX_MEAN_LEN * n_words),
        "r_symbol_ratio": 10 * (n_hash + n_ell) <= n_words,
        "r_bullet_lines": 10 * n_bullet <= 9 * n_lines,
        "r_ellipsis_lines": 10 * n_ell_lines <= 3 * n_lines,
        "r_alpha_words": 10 * n_alpha >= 8 * n_words,
        "r_stopwords": n_stop >= 2,
    }
    out = df.withColumns({
        "n_words": n_words, "n_lines": n_lines,
        "sum_word_len": sum_len,
        "n_symbol": (n_hash + n_ell).cast("long"),
        "n_bullet_lines": n_bullet, "n_ellipsis_lines": n_ell_lines,
        "n_alpha_words": n_alpha, "n_gopher_stopwords": n_stop,
        **rules,
    })
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def gopher_rules_oracle_columns(text_expr: str) -> str:
    """DuckDB SQL twin of gopher_rules, GENERATED from the same
    constants — returns the column list for a SELECT over one text
    expression."""
    sw = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    bullets = ", ".join(f"'{c}'" for c in GOPHER_BULLET_CHARS)
    t = text_expr
    return f"""
  len(list_filter(string_split_regex({t}, '\\s+'), x -> x != ''))::BIGINT AS n_words,
  len(list_filter(string_split({t}, chr(10)), x -> x != ''))::BIGINT AS n_lines,
  coalesce(list_sum(list_transform(list_filter(string_split_regex({t}, '\\s+'), x -> x != ''), x -> length(x))), 0)::BIGINT AS sum_word_len,
  ((length({t}) - length(replace({t}, '#', ''))) + (length({t}) - length(replace({t}, '...', ''))) // 3)::BIGINT AS n_symbol,
  len(list_filter(string_split({t}, chr(10)), x -> x != '' AND substr(x, 1, 1) IN ({bullets})))::BIGINT AS n_bullet_lines,
  len(list_filter(string_split({t}, chr(10)), x -> x != '' AND x LIKE '%...'))::BIGINT AS n_ellipsis_lines,
  len(list_filter(string_split_regex({t}, '\\s+'), x -> x != '' AND regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha_words,
  len(list_distinct(list_filter(string_split_regex({t}, '\\s+'), x -> lower(x) IN ({sw}))))::INT AS n_gopher_stopwords,
  (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS r_word_count,
  (n_words > 0 AND sum_word_len >= {GOPHER_MIN_MEAN_LEN} * n_words AND sum_word_len <= {GOPHER_MAX_MEAN_LEN} * n_words) AS r_mean_word_len,
  (10 * n_symbol <= n_words) AS r_symbol_ratio,
  (10 * n_bullet_lines <= 9 * n_lines) AS r_bullet_lines,
  (10 * n_ellipsis_lines <= 3 * n_lines) AS r_ellipsis_lines,
  (10 * n_alpha_words >= 8 * n_words) AS r_alpha_words,
  (n_gopher_stopwords >= 2) AS r_stopwords,
  (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
   AND r_ellipsis_lines AND r_alpha_words AND r_stopwords) AS gopher_keep
"""


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase word set (the classic 'key collision' fingerprint; detects
    shuffled/reformatted duplicates that exact hashing misses)."""
    words = F.array_sort(F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), "\\W+"), lambda t: t != "")))
    return df.withColumn(out_col, F.md5(F.array_join(words, " ")))


# Java-regex / RE2 compatible (no lookarounds): both Spark and the DuckDB
# oracle evaluate the identical patterns.
URL_RE = r"https?://[^\s]+"
URL_DOMAIN_RE = r"https?://([^/\s]+)"


def url_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document URL extraction stats: (id, n_urls, n_domains).

    The link-density signal of web-corpus filtering (boilerplate/nav
    pages are URL-dense) plus the domain fan-out used for per-domain
    quotas (compose with curation.cap_per_group on an exploded domain
    column). Single codegen'd projection — no shuffle, no Python.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
    domains = F.array_distinct(F.transform(
        urls, lambda u: F.regexp_extract(u, URL_DOMAIN_RE, 1)))
    return df.select(F.col(id_col),
                     F.size(urls).alias("n_urls"),
                     F.size(domains).alias("n_domains"))


def normalize_text(df: DataFrame, text_col: str = "text",
                   form: str = "NFC", strip_control: bool = True,
                   collapse_ws: bool = False,
                   out_col: str = "text_norm") -> DataFrame:
    """Unicode normalization for corpus text: NFC/NFD/NFKC/NFKD plus
    optional control-character stripping and whitespace collapsing —
    the canonical first pass before any hashing/dedup step (decomposed
    vs composed accents would otherwise defeat exact and MinHash dedup
    byte-for-byte).

    Spark has no built-in Unicode normalizer, so the normalization step
    is an Arrow-batched pandas UDF (pandas Series.str.normalize — the
    loop is CPython's C unicodedata, one call per Arrow batch, never
    per-row Python). Control stripping ([\\x00-\\x08\\x0B\\x0C\\x0E-
    \\x1F\\x7F] — tab/newline/CR survive) and whitespace collapsing
    stay JVM-side regexes around it. Order: strip -> normalize ->
    collapse, matching the DuckDB oracle (nfc_normalize).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    c = F.col(text_col)
    if strip_control:
        c = F.regexp_replace(
            c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    c = _norm(c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, "\\s+", " "))
    return df.withColumn(out_col, c)


# PII patterns — RE2-compatible (no backrefs/lookarounds) so the SAME
# strings run in Spark's JVM regex and the DuckDB oracle. Keys define
# replacement order; longer/more-specific first so e.g. an email isn't
# half-eaten by the phone pattern.
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "CARD": r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
    "PHONE": r"\b(?:\+?1[ .-])?(?:\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])"
             r"[0-9]{3}[ .-][0-9]{4}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              kinds: list[str] | None = None,
              out_col: str = "text_scrubbed",
              count: bool = True) -> DataFrame:
    """Redact PII spans (emails, IPv4s, SSNs, card numbers, phone
    numbers) to ``[KIND]`` placeholders — the standard scrub pass
    before training-corpus release. Adds ``out_col`` plus, with
    count=True, one ``n_<kind>`` column per pattern (the audit metric:
    how much was redacted where).

    Pure chained regexp_replace / regexp_count projections — one
    codegen'd pass, no shuffle, no Python; the patterns avoid
    backreferences and lookarounds so the DuckDB oracle runs the
    identical strings. Deliberately pattern-based (the reference's
    ScanContent/ReplaceText territory, not an ML NER pass): precision
    on structured identifiers, not free-text names.
    """
    kinds = kinds or list(PII_PATTERNS)
    scrubbed = F.col(text_col)
    counts = {}
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        if count:
            # count on the PROGRESSIVELY scrubbed text, so n_<kind> is
            # exactly the number of [KIND] placeholders in the output
            # (an IP inside an already-redacted email counts as the
            # email, not twice)
            counts[f"n_{kind.lower()}"] = F.regexp_count(scrubbed,
                                                         F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{kind}]")
    out = df.withColumn(out_col, scrubbed)
    return out.withColumns(counts) if counts else out


def chunk_text(df: DataFrame, id_col: str, text_col: str,
               window_tokens: int = 256, overlap: int = 32) -> DataFrame:
    """Overlapping context-window chunking (the embedding/RAG prep step
    of a training-data pipeline): each document splits into whitespace
    tokens, then into windows of ``window_tokens`` advancing by
    ``window_tokens - overlap``, so consecutive chunks share ``overlap``
    tokens. The final window is the remainder (never empty, never
    duplicated: a document shorter than one window yields exactly one
    chunk).

    Pure JVM column expressions — tokens via split+filter, window starts
    via sequence(), one posexplode, slice+array_join per chunk. Zero
    shuffle, embarrassingly parallel at any corpus size.

    Output: (id, chunk_index, n_chunks, chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < window_tokens:
        raise ValueError("need 0 <= overlap < window_tokens")
    step = window_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    # last window start: the largest multiple of step still leaving a
    # non-empty, non-fully-overlapped tail; ceil((n - window)/step) keeps
    # every token covered with the minimal window count
    n_chunks = F.when(n <= window_tokens, F.lit(1)).otherwise(
        F.ceil((n - window_tokens) / F.lit(step)).cast("int") + 1)
    starts = F.sequence(F.lit(0), (n_chunks - 1) * step, F.lit(step))
    out = base.withColumn("n_chunks", n_chunks) \
        .select(id_col, "_toks", "n_chunks",
                F.posexplode(starts).alias("chunk_index", "_start"))
    piece = F.slice(F.col("_toks"), F.col("_start") + 1,
                    F.lit(window_tokens))
    return out.select(
        id_col, "chunk_index", "n_chunks",
        F.size(piece).alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


# (pattern, replacement) chain — module constant so the DuckDB oracle is
# GENERATED from the same list (the scrub_pii strategy); every pattern is
# Java-regex/RE2 compatible (no lookbehind, no backrefs).
HTML_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),                          # comments
    (r"(?is)<script\b[^>]*>.*?</script>", " "),        # script blocks
    (r"(?is)<style\b[^>]*>.*?</style>", " "),          # style blocks
    # block-level tags become newlines so paragraphs survive
    (r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|"
     r"section|article|header|footer)\b[^>]*/?>", "\n"),
    (r"<[^>]+>", " "),                                 # any other tag
    (r"&nbsp;", " "), (r"&amp;", "&"), (r"&lt;", "<"),
    (r"&gt;", ">"), (r"&quot;", "\""), (r"&#39;", "'"),
    (r"[ \t]+", " "),                                  # collapse spaces
    (r" ?\n[ \n]*", "\n"),                             # collapse blanks
]


def html_to_text(df: DataFrame, text_col: str,
                 out_col: str = "text_plain") -> DataFrame:
    """HTML → plain text (the boilerplate-strip step of a web-corpus
    pipeline): drop comments/script/style, turn block tags into
    newlines, strip remaining tags, unescape the common entities,
    collapse whitespace. One chained regexp_replace projection — JVM
    whole-stage codegen, zero shuffle; the pattern chain is a module
    constant so the gate oracle replays the EXACT same rewrites."""
    c = F.col(text_col)
    for pat, rep in HTML_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return df.withColumn(out_col, F.trim(c))
