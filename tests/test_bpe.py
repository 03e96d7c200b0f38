"""Distributed BPE training/encoding (datalib/bpe.py) vs a pure-python
reference trainer and the generated DuckDB twin."""

from collections import Counter

import pandas as pd


def _py_bpe_train(texts, n_merges):
    words = []
    for t in texts:
        words += [w for w in t.lower().split() if w]
    seqs = [list(w) for w in words]
    out = []
    for _ in range(n_merges):
        counts = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        out.append((best[0], best[1], counts[best]))
        merged = best[0] + best[1]
        new_seqs = []
        for s in seqs:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            new_seqs.append(ns)
        seqs = new_seqs
    return out


def _py_bpe_encode(text, merges):
    toks = []
    for w in [w for w in text.lower().split() if w]:
        s = list(w)
        for x, y in merges:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    ns.append(x + y)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        toks += s
    return toks


CORPUS = ["low lower lowest low low",
          "new newer newest new",
          "wide wider widest wide wide wide",
          "low new wide slow slower"]


def test_bpe_train_matches_python_reference(spark):
    from nifi_spark.datalib.bpe import bpe_train
    df = spark.createDataFrame(pd.DataFrame({"text": CORPUS}))
    got = bpe_train(df, "text", n_merges=8)
    assert got == _py_bpe_train(CORPUS, 8)


def test_bpe_encode_matches_python_reference(spark):
    from nifi_spark.datalib.bpe import bpe_encode, bpe_train
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(CORPUS)), "text": CORPUS}))
    merges = [(x, y) for x, y, _ in bpe_train(df, "text", n_merges=6)]
    rows = {r["id"]: r for r in
            bpe_encode(df, "id", "text", merges).collect()}
    for i, t in enumerate(CORPUS):
        exp = _py_bpe_encode(t, merges)
        assert rows[i]["tokens"] == exp, (i, rows[i]["tokens"], exp)
        assert rows[i]["n_tokens"] == len(exp)


def test_bpe_greedy_overlap_semantics(spark):
    # 'aaa' with merge (a,a): greedy left-to-right -> [aa, a], never [a, aa]
    from nifi_spark.datalib.bpe import bpe_encode
    df = spark.createDataFrame(pd.DataFrame({"id": [0], "text": ["aaa aaaa"]}))
    r = bpe_encode(df, "id", "text", [("a", "a"), ("aa", "aa")]).collect()[0]
    assert r["tokens"] == ["aa", "a", "aaaa"]


def test_bpe_oracle_sql_replays_training(spark):
    import duckdb
    from nifi_spark.datalib.bpe import bpe_oracle_sql, bpe_train
    pdf = pd.DataFrame({"text": CORPUS})
    got = bpe_train(spark.createDataFrame(pdf), "text", n_merges=5)
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(bpe_oracle_sql("SELECT text FROM t", 5)).df()
    exp = [(r.x, r.y, int(r.n)) for r in exp.sort_values("step").itertuples()]
    assert got == exp


def test_wordpiece_train_likelihood_winner(spark):
    """WordPiece picks the max-likelihood pair, not the max-count one:
    'ab' occurs 3x but a,b are common (score 3/(5*5)); 'xy' occurs 2x
    with rare symbols (score 2/(2*2)) -> xy must win round 1."""
    from nifi_spark.datalib.bpe import wordpiece_train
    docs = spark.createDataFrame(
        [("a b ab ab ab x",), ("xy xy b a",)], "text string")
    # after char split: words: ab->(a,b) x3 ... xy->(x,y) x2
    got = wordpiece_train(docs, "text", 1)
    assert len(got) == 1
    x, y, n, cx, cy = got[0]
    assert (x, y, n) == ("x", "y", 2)
    assert n * 5 * 5 > 3 * cx * cy  # beats (a,b) on the exact fraction


def test_wordpiece_tiebreak_lexicographic(spark):
    from nifi_spark.datalib.bpe import wordpiece_train
    # (c,d) and (e,f) have identical counts and unigrams -> lex tiebreak
    docs = spark.createDataFrame([("cd ef cd ef",)], "text string")
    got = wordpiece_train(docs, "text", 1)
    assert got[0][:2] == ("c", "d")


def test_wordpiece_oracle_twin(spark):
    import duckdb
    from nifi_spark.datalib.bpe import wordpiece_oracle_sql, wordpiece_train
    rows = [f"the quick fox fox f{i % 3}x jumps the the" for i in range(40)]
    docs = spark.createDataFrame([(t,) for t in rows], "text string")
    con = duckdb.connect()
    con.register("wp_docs", pd.DataFrame({"text": rows}))
    want = con.execute(
        wordpiece_oracle_sql("SELECT text FROM wp_docs", 4)).fetchall()
    got = [(i + 1, x, y, n, cx, cy) for i, (x, y, n, cx, cy)
           in enumerate(wordpiece_train(docs, "text", 4))]
    assert sorted(got) == sorted(tuple(r) for r in want)
