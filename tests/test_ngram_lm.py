"""Distributed n-gram LM (datalib/ngram_lm.py): count training, stupid
backoff scoring vs a python reference, and the DuckDB oracle twin."""

from __future__ import annotations

from collections import Counter

import pytest

SEP = "\x1f"

_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
    (4, "the dog ate the cat"),
    (5, "   "),
    (6, "unseen wordsoup zzz the cat sat"),
]


def _py_counts(docs, n):
    c = Counter()
    for _, text in docs:
        t = text.split()
        for k in range(1, n + 1):
            for i in range(len(t) - k + 1):
                c[(k, SEP.join(t[i:i + k]))] += 1
    return c


def _py_score(docs, counts, n, an, ad, scale):
    total = sum(v for (k, _), v in counts.items() if k == 1)
    out = {}
    for doc_id, text in docs:
        t = text.split()
        if not t:
            continue
        s = b = 0
        for i, w in enumerate(t):
            matched = False
            for k in range(min(n, i + 1), 0, -1):
                gram = SEP.join(t[i - k + 1:i + 1])
                cnt = counts.get((k, gram))
                if not cnt:
                    continue
                den = (counts[(k - 1, SEP.join(t[i - k + 1:i]))]
                       if k > 1 else total)
                lv = n - k
                s += (an ** lv * scale * cnt) // (ad ** lv * den)
                b += lv
                matched = True
                break
            if not matched:
                b += n
        out[doc_id] = (len(t), s, b)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_train_counts_match_python(spark, docs_df):
    from nifi_spark.datalib import train_ngram_counts
    got = {(r["order"], r.gram): r.cnt
           for r in train_ngram_counts(docs_df, "text", n=3).collect()}
    assert got == dict(_py_counts(_DOCS, 3))
    # short/empty docs produce no phantom grams
    assert not any(g.startswith(SEP) or g.endswith(SEP) for _, g in got)


def test_score_matches_python_reference(spark, docs_df):
    from nifi_spark.datalib import score_ngram_lm, train_ngram_counts
    counts = train_ngram_counts(docs_df, "text", n=3)
    got = {r.doc_id: (r.n_tokens, r.sum_score, r.sum_backoff)
           for r in score_ngram_lm(docs_df, counts, "doc_id", "text",
                                   n=3).collect()}
    want = _py_score(_DOCS, _py_counts(_DOCS, 3), 3, 2, 5, 1_000_000)
    assert got == want
    # whitespace-only doc 5 yields no row on either side
    assert 5 not in got
    # scoring against counts NOT containing the doc: novel text backs
    # off to unigrams/OOV
    from nifi_spark.datalib import score_ngram_lm as _s, \
        train_ngram_counts as _t
    held_out = docs_df.filter("doc_id <> 6")
    counts2 = _t(held_out, "text", n=3)
    r6 = _s(docs_df.filter("doc_id = 6"), counts2, "doc_id", "text",
            n=3).collect()[0]
    want2 = _py_score([_DOCS[5]], _py_counts(_DOCS[:5], 3), 3, 2, 5,
                      1_000_000)[6]
    assert (r6.n_tokens, r6.sum_score, r6.sum_backoff) == want2
    assert r6.sum_backoff > got[1][2]     # truly-unseen text backs off


def test_oracle_twin(spark, docs_df):
    import duckdb
    import pandas as pd

    from nifi_spark.datalib import (ngram_lm_oracle_sql, score_ngram_lm,
                                    train_ngram_counts)
    counts = train_ngram_counts(docs_df, "text", n=3)
    got = sorted(
        (r.doc_id, r.n_tokens, r.sum_score, r.sum_backoff)
        for r in score_ngram_lm(docs_df, counts, "doc_id", "text",
                                n=3).collect())
    con = duckdb.connect()
    con.register("d", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    sql = ngram_lm_oracle_sql("SELECT doc_id, text FROM d", n=3)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_bigram_only(spark, docs_df):
    from nifi_spark.datalib import score_ngram_lm, train_ngram_counts
    counts = train_ngram_counts(docs_df, "text", n=2)
    got = {r.doc_id: (r.n_tokens, r.sum_score, r.sum_backoff)
           for r in score_ngram_lm(docs_df, counts, "doc_id", "text",
                                   n=2).collect()}
    want = _py_score(_DOCS, _py_counts(_DOCS, 2), 2, 2, 5, 1_000_000)
    assert got == want


def test_ccnet_ppl_buckets_terciles(spark):
    from nifi_spark.datalib.ngram_lm import ccnet_ppl_buckets
    rows = [(i, "clean common words repeat clean common words")
            for i in range(6)]
    rows += [(i, "zzq xq jw qqv zk wq yqx vq") for i in range(6, 12)]
    rows += [(i, "clean common zzq xq words") for i in range(12, 18)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = docs.filter("doc_id < 6 OR doc_id >= 12")
    out = ccnet_ppl_buckets(docs, lm, "doc_id", "text", n=2)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert len(got) == 18
    # docs 12-17 are fully deterministic under the LM (every bigram
    # continuation has p=1) -> head; the clean repeats branch after
    # 'words' (p=1/2) -> middle; gibberish (unigram backoff) -> tail
    assert all(got[i] == "middle" for i in range(6))
    assert all(got[i] == "tail" for i in range(6, 12))
    assert all(got[i] == "head" for i in range(12, 18))


def test_ccnet_matches_oracle_twin(spark):
    import duckdb
    from nifi_spark.datalib.ngram_lm import (ccnet_oracle_sql,
                                             ccnet_ppl_buckets)
    import random
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "qqz", "wwx"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 12))))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = docs.filter("doc_id % 3 = 0")
    out = (ccnet_ppl_buckets(docs, lm, "doc_id", "text", n=2)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    osql = ccnet_oracle_sql(
        "SELECT doc_id, text FROM documents",
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0", n=2)
    odf = (con.execute(osql).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["avg_score"]) == list(odf["avg_score"])
    assert list(out["bucket"]) == list(odf["bucket"])
    assert list(out["n_tokens"]) == list(odf["n_tokens"])
