"""Product quantization: train/encode/ADC correctness, determinism,
and recall against exact int8 distances."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nifi_spark.datalib.pq import (pq_adc_topk, pq_distance_table,
                                   pq_encode, pq_train)
from nifi_spark.datalib.similarity import quantize_int8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def qvecs(spark, emb):
    q = quantize_int8(emb, "vec_id", "embedding") \
        .select("vec_id", "qvec").localCheckpoint()
    return q


def _formula_cbs(m=4, k=16, sd=16):
    return [[[((17 * j + 5 * t + 3 * mi) % 51) - 25
              for t in range(sd)] for j in range(k)]
            for mi in range(m)]


def test_encode_matches_python_argmin(qvecs):
    cbs = _formula_cbs()
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(qvecs, cbs).collect()}
    rows = qvecs.orderBy("vec_id").limit(20).collect()
    for r in rows:
        v = list(r["qvec"])
        want = []
        for mi, cents in enumerate(cbs):
            sub = v[mi * 16:(mi + 1) * 16]
            dists = [sum((a - b) ** 2 for a, b in zip(sub, c))
                     for c in cents]
            want.append(dists.index(min(dists)))   # lowest-index tie
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_train_shapes_and_determinism(emb):
    cbs1 = pq_train(emb, m=4, k=8, iters=2)
    cbs2 = pq_train(emb, m=4, k=8, iters=2)
    assert cbs1 == cbs2
    assert len(cbs1) == 4
    assert all(len(cb) == 8 for cb in cbs1)
    assert all(len(c) == 16 for cb in cbs1 for c in cb)
    assert all(-127 <= x <= 127 for cb in cbs1 for c in cb for x in c)


def test_train_needs_k_vectors(emb):
    with pytest.raises(ValueError, match="at least k"):
        pq_train(emb.limit(3), m=4, k=8, iters=1)


def test_adc_self_query_ranks_first_trained(emb, qvecs):
    """With a TRAINED codebook a query vector's own code word is its
    nearest reconstruction — the query itself must rank 1 (ties by
    id can only demote it if another vector shares all M codes AND
    a lower id, which the planted check rules out here)."""
    cbs = pq_train(emb, m=4, k=16, iters=2)
    codes = pq_encode(qvecs, cbs)
    queries = [(int(r["vec_id"]), list(r["qvec"]))
               for r in qvecs.where("vec_id % 200 = 11").collect()]
    top = pq_adc_topk(codes, queries, cbs, topk=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adist"]))
    for qid, rows in by_q.items():
        rows.sort()
        best_dist = rows[0][2]
        hit = [v for rk, v, d in rows if d == best_dist]
        assert qid in hit, (qid, rows)


def test_adc_equals_table_sum(qvecs):
    cbs = _formula_cbs()
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(qvecs, cbs).collect()}
    r0 = qvecs.where("vec_id = 5").collect()[0]
    queries = [(5, list(r0["qvec"]))]
    top = pq_adc_topk(pq_encode(qvecs, cbs), queries, cbs,
                      topk=500).collect()
    table = {(m, j): d
             for m, j, d in pq_distance_table(list(r0["qvec"]), cbs)}
    for r in top:
        want = sum(table[(m, c)]
                   for m, c in enumerate(codes[r["vec_id"]]))
        assert r["adist"] == want


def test_adc_recall_vs_exact_int8(qvecs):
    """PQ is lossy, but with a trained codebook the exact top-1 of the
    int8 distance must appear in the ADC top-10 for most queries."""
    emb = qvecs.sparkSession.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    cbs = pq_train(emb, m=4, k=16, iters=2)
    codes = pq_encode(qvecs, cbs)
    qrows = qvecs.where("vec_id % 100 = 7").collect()
    queries = [(int(r["vec_id"]), list(r["qvec"])) for r in qrows]
    top = pq_adc_topk(codes, queries, cbs, topk=10).collect()
    got = {}
    for r in top:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    all_rows = qvecs.collect()
    hits = 0
    for qid, qv in queries:
        qv = list(qv)
        exact = min(
            ((sum((int(a) - int(b)) ** 2 for a, b in
                  zip(qv, list(r["qvec"]))), r["vec_id"])
             for r in all_rows))
        hits += exact[1] in got[qid]
    assert hits >= len(queries) - 1, (hits, len(queries))


def _formula_ivf(k=16, dim=64):
    return [[((7 * j + 11 * t) % 41) - 20 for t in range(dim)]
            for j in range(k)]


def test_ivf_assign_matches_python(qvecs):
    from nifi_spark.datalib.pq import ivf_assign
    ivf = _formula_ivf()
    got = {r["vec_id"]: r["cell"]
           for r in ivf_assign(qvecs, ivf).collect()}
    for r in qvecs.orderBy("vec_id").limit(15).collect():
        v = list(r["qvec"])
        d = [sum((int(a) - int(b)) ** 2 for a, b in zip(v, c))
             for c in ivf]
        assert got[r["vec_id"]] == d.index(min(d))


def test_ivfpq_candidates_come_from_probed_cells(qvecs):
    from nifi_spark.datalib.pq import ivf_assign, pq_ivf_topk
    ivf = _formula_ivf()
    cbs = _formula_cbs()
    queries = [(int(r["vec_id"]), list(r["qvec"]))
               for r in qvecs.where("vec_id % 250 = 3").collect()]
    top = pq_ivf_topk(qvecs, ivf, cbs, queries, nprobe=3,
                      topk=50).collect()
    cells = {r["vec_id"]: r["cell"]
             for r in ivf_assign(qvecs, ivf).collect()}
    for qid, qvec in queries:
        d = sorted((sum((int(a) - int(b)) ** 2
                        for a, b in zip(qvec, c)), j)
                   for j, c in enumerate(ivf))
        probed = {j for _, j in d[:3]}
        hits = [r for r in top if r["query_id"] == qid]
        assert hits, qid
        assert all(cells[r["vec_id"]] in probed for r in hits)
        # the query lives in its own nearest cell -> self is a candidate
        assert any(r["vec_id"] == qid for r in hits) or \
            cells[qid] in probed
