"""Unigram-LM tokenizer (datalib/unigram.py): Viterbi vs brute force,
encode invariants, usage-prune training, SQL-twin equivalence at test
scale."""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from nifi_spark.datalib.unigram import (_viterbi, unigram_encode,
                                        unigram_encode_oracle_sql,
                                        unigram_seed_vocab,
                                        unigram_train,
                                        unigram_train_oracle_sql)


def _brute_best(word, vocab, max_len, unk):
    """Exhaustive best segmentation under the same objective + the
    smallest-earlier-split tie rule (lexicographic on split points)."""
    n = len(word)
    best = None
    for bits in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        sc = 0
        ok = True
        for p in pieces:
            s = vocab.get(p)
            if s is None:
                if len(p) != 1:
                    ok = False
                    break
                s = unk
            sc += s
        if not ok:
            continue
        # tie rule: higher score wins; equal score -> the segmentation
        # whose split points are lexicographically SMALLEST from the
        # right (Viterbi keeps the smallest i per j, resolved from the
        # word end backwards)
        key = (sc, tuple(-c for c in reversed(cuts)))
        if best is None or key > best[0]:
            best = (key, pieces)
    return best[1]


def test_viterbi_matches_brute_force():
    vocab = {"a": -3, "b": -4, "c": -5, "ab": -4, "bc": -4,
             "abc": -6, "ca": -2, "aa": -3}
    unk = -11
    for n in range(1, 7):
        for word in ["".join(t) for t in
                     itertools.product("abc", repeat=n)][:40]:
            got = _viterbi(word, vocab, 3, unk)
            exp = _brute_best(word, vocab, 3, unk)
            assert got == exp, (word, got, exp)
            assert "".join(got) == word


def test_viterbi_prefers_fewer_pieces_and_unk_fallback():
    vocab = {"x": -2, "y": -2, "xy": -3}
    assert _viterbi("xy", vocab, 2, -9) == ["xy"]     # -3 beats -4
    assert _viterbi("xz", vocab, 2, -9) == ["x", "z"]  # z via unk
    # tie: same total -> smallest split point (earlier boundary)
    v2 = {"a": -2, "aa": -4, "aaa": -6}
    assert _viterbi("aaa", v2, 3, -9) == ["aaa"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog "
                "the quick brown fox " + f"tail{i % 3}")
            for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seed_vocab_keeps_chars_and_counts(spark, corpus):
    v = unigram_seed_vocab(corpus, "text", max_len=4, min_count=5)
    rows = {r["piece"]: r["score"] for r in v.collect()}
    for ch in "thequickbrownfxjmpsvlazydg":
        assert ch in rows
    assert "the" in rows                    # frequent substring kept
    assert all(s <= -1 for s in rows.values())
    # frequent pieces score higher (less negative) than rare ones
    assert rows["the"] > rows["lazy"]


def test_encode_concat_invariant_and_compression(spark, corpus):
    v = unigram_seed_vocab(corpus, "text", max_len=6, min_count=4,
                           max_word_len=12)
    enc = unigram_encode(corpus, "doc_id", "text", v, max_len=6,
                         max_word_len=12)
    out = enc.withColumn(
        "joined", F.concat_ws("", "tokens")).collect()
    assert len(out) == 30
    for r in out:
        assert r["n_tokens"] == len(r["tokens"])
    # concatenated tokens reproduce the de-whitespaced lowercase text
    exp = {r["doc_id"]: "".join(r["text"].lower().split())
           for r in corpus.collect()}
    for r in out:
        assert r["joined"] == exp[r["doc_id"]]
    # real compression: frequent words became single pieces
    toks = {t for r in out for t in r["tokens"]}
    assert "the" in toks


def test_encode_oracle_twin(spark, corpus):
    import duckdb
    v = unigram_seed_vocab(corpus, "text", max_len=5, min_count=4,
                           max_word_len=10)
    enc = unigram_encode(corpus, "doc_id", "text", v, max_len=5,
                         max_word_len=10)
    sdf = (enc.select("doc_id", F.md5(F.concat_ws(" ", "tokens"))
                      .alias("h"))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    osql = unigram_encode_oracle_sql(
        "SELECT doc_id, text FROM documents", 5, 4, 10)
    odf = (con.execute(osql).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(sdf["h"]) == list(odf["tokens_md5"])


def test_train_prunes_to_budget_and_matches_twin(spark, corpus):
    import duckdb
    v = unigram_train(corpus, "text", vocab_size=40, max_len=5,
                      min_count=4, rounds=1, max_word_len=10)
    rows = {r["piece"]: r["score"] for r in v.collect()}
    assert len(rows) <= 40 + 0  # chars never exceed budget here
    chars = {p for p in rows if len(p) == 1}
    multi = {p for p in rows if len(p) > 1}
    assert chars and multi
    assert len(multi) <= 40 - len(chars)
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    tsql = unigram_train_oracle_sql(
        "SELECT doc_id, text FROM documents", 40, 5, 4, 1, 10)
    odf = con.execute(tsql).df()
    orows = dict(zip(odf["piece"], odf["score"]))
    assert rows == {p: int(s) for p, s in orows.items()}


def test_train_two_rounds_stable(spark, corpus):
    v1 = unigram_train(corpus, "text", vocab_size=30, max_len=4,
                       min_count=4, rounds=2, max_word_len=10)
    rows = {r["piece"]: r["score"] for r in v1.collect()}
    assert all(len(p) == 1 or rows[p] >= min(rows.values())
               for p in rows)
    enc = unigram_encode(corpus, "doc_id", "text", v1, max_len=4,
                         max_word_len=10)
    assert enc.count() == 30
