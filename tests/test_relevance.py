"""Integer BM25 top-k (datalib/relevance.py): python reference parity,
the DuckDB twin, and ranking sanity."""

import hashlib
from collections import Counter

import pandas as pd


def _py_bm25(docs, queries, k):
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    toks = {d: ws for d, ws in toks.items() if ws}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) // n
    df = Counter()
    for ws in toks.values():
        df.update(set(ws))
    out = []
    for qid, qtext in queries:
        scores = {}
        qterms = dict.fromkeys(w for w in qtext.lower().split() if w)
        for d, ws in toks.items():
            tf = Counter(ws)
            s = 0
            for t in qterms:
                if t in tf:
                    idf = len(bin(n // df[t])[2:])
                    s += (idf * 22 * tf[t] * avgdl) // (
                        10 * tf[t] * avgdl + 3 * avgdl + 9 * len(ws))
            if s:
                scores[d] = s
        tie = lambda d: (int(hashlib.md5(str(d).encode()).hexdigest()[:15],
                             16), d)
        ranked = sorted(scores, key=lambda d: (-scores[d], *tie(d)))[:k]
        out += [(qid, d, scores[d], i + 1) for i, d in enumerate(ranked)]
    return set(out)


def _corpus():
    import numpy as np
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(60):
        nw = int(rng.integers(5, 40))
        docs.append((d, " ".join(vocab[int(i)]
                                 for i in rng.integers(0, 40, nw))))
    return docs


def test_bm25_matches_python_reference(spark):
    from nifi_spark.datalib.relevance import bm25_topk
    docs = _corpus()
    queries = [(1, "w3 w7 w19"), (2, "w0"), (3, "missingterm w5")]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {(r["query_id"], r["doc_id"], r["score"], r["rank"])
           for r in bm25_topk(df, queries, "doc_id", "text", k=5).collect()}
    assert got == _py_bm25(docs, queries, 5)


def test_bm25_oracle_sql_twin(spark):
    import duckdb
    from nifi_spark.datalib.relevance import bm25_oracle_sql, bm25_topk
    docs = _corpus()
    queries = [(1, "w3 w7 w19 w3"), (2, "w0 w1 w2 w3 w4")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = bm25_topk(spark.createDataFrame(pdf), queries,
                    "doc_id", "text", k=7).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(bm25_oracle_sql(
        "SELECT doc_id, text FROM t", queries, k=7)).df() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    for c in ["query_id", "doc_id", "score", "rank"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_bm25_ranking_sanity(spark):
    from nifi_spark.datalib.relevance import bm25_topk
    docs = [
        (0, "cat cat cat dog"),          # high tf for cat, short
        (1, "cat " + "filler " * 50),    # one cat in a long doc
        (2, "dog dog dog"),
        (3, "bird"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    rows = bm25_topk(df, [(1, "cat")], "doc_id", "text", k=4).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked[0] == 0            # tf-rich short doc wins
    assert set(ranked) == {0, 1}     # only docs containing 'cat' score
