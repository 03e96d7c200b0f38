"""Mergeable sketches (datalib/sketch.py): deterministic registers,
estimate quality, exact heavy hitters, and partition invariance."""

import pandas as pd
import pytest


def _tokens_df(spark, n_docs=200, parts=None):
    rows = []
    for i in range(n_docs):
        for j in range(1 + i % 5):
            rows.append((f"w{(i * 7 + j * 3) % 40}",))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["tok"]))
    return df.repartition(parts) if parts else df


def test_count_min_exactness_and_partition_invariance(spark):
    from collections import Counter
    from nifi_spark.datalib.sketch import cm_estimate, count_min_sketch
    truth = Counter()
    for i in range(200):
        for j in range(1 + i % 5):
            truth[f"w{(i * 7 + j * 3) % 40}"] += 1
    a = count_min_sketch(_tokens_df(spark), "tok", width=256, depth=4) \
        .collect()
    b = count_min_sketch(_tokens_df(spark, parts=13), "tok",
                         width=256, depth=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    for v, n in truth.items():
        est = cm_estimate(a, v, width=256, depth=4)
        assert est >= n                    # CM never underestimates
        assert est <= n + 40               # and is tight at this load
    assert cm_estimate(a, "absent-token", width=256, depth=4) <= 30


def test_hll_registers_deterministic_and_estimate(spark):
    from nifi_spark.datalib.sketch import hll_estimate, hll_registers
    df = spark.createDataFrame(
        pd.DataFrame({"v": [f"item{i % 500}" for i in range(5000)]}))
    regs = hll_registers(df, "v", b=10).collect()
    regs2 = hll_registers(df.repartition(17), "v", b=10).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, regs2))
    est = hll_estimate(regs, b=10)
    assert abs(est - 500) / 500 < 0.12     # ~3.2% stderr at m=1024


def test_hll_matches_duckdb_registers(spark):
    import duckdb
    from nifi_spark.datalib.sketch import hll_registers
    pdf = pd.DataFrame({"v": [f"x{i}" for i in range(800)]})
    got = hll_registers(spark.createDataFrame(pdf), "v", b=8).toPandas() \
        .sort_values("bucket").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute("""
WITH h AS (
  SELECT ('0x' || substr(md5(v), 1, 15))::BIGINT AS h FROM t),
r AS (
  SELECT (h // 4503599627370496)::INT AS bucket,      -- 2^52 (60-8 bits)
         CASE WHEN h % 4503599627370496 = 0 THEN 53
              ELSE 52 - (length(printf('%b', h % 4503599627370496)) - 1)
         END AS rho
  FROM h)
SELECT bucket, max(rho)::INT AS rho FROM r GROUP BY bucket
""").df().sort_values("bucket").reset_index(drop=True)
    assert (got["bucket"].to_numpy() == exp["bucket"].to_numpy()).all()
    assert (got["rho"].to_numpy() == exp["rho"].to_numpy()).all()


def test_heavy_hitters_exact(spark):
    from nifi_spark.datalib.sketch import heavy_hitters
    rows = [("a",)] * 9 + [("b",)] * 7 + [("c",)] * 7 + [("d",)] * 2
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["v"]))
    got = [(r["value"], r["n"], r["rank"])
           for r in sorted(heavy_hitters(df.repartition(5), "v", k=3)
                           .collect(), key=lambda r: r["rank"])]
    assert got == [("a", 9, 1), ("b", 7, 2), ("c", 7, 3)]  # tie: b < c


def test_histogram_sketch_and_quantile(spark):
    import numpy as np
    from nifi_spark.datalib.sketch import (histogram_quantile,
                                           histogram_sketch)
    rng = np.random.default_rng(8)
    vals = rng.uniform(0, 1000, 20_000)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    rows = histogram_sketch(df, "v", lo=0, hi=1000, bins=200).collect()
    rows2 = histogram_sketch(df.repartition(9), "v", lo=0, hi=1000,
                             bins=200).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    assert sum(r["n"] for r in rows) == 20_000
    for q in (0.1, 0.5, 0.9, 0.99):
        est = histogram_quantile(rows, q, lo=0, hi=1000, bins=200)
        true = float(np.quantile(vals, q))
        assert abs(est - true) <= 1000 / 200 + 1e-6  # within one bin


def test_histogram_overflow_bins(spark):
    from nifi_spark.datalib.sketch import histogram_quantile, histogram_sketch
    df = spark.createDataFrame(
        pd.DataFrame({"v": [-5.0, 0.0, 5.0, 9.99, 10.0, 50.0]}))
    rows = {r["bin"]: r["n"]
            for r in histogram_sketch(df, "v", 0, 10, bins=10).collect()}
    assert rows[-1] == 1 and rows[10] == 2     # under/overflow captured
    assert histogram_quantile(
        [{"bin": -1, "n": 4}], 0.5, 0, 10, bins=10) == 0
    with pytest.raises(ValueError):
        histogram_sketch(df, "v", 10, 0)


def test_bloom_no_false_negatives_and_merge(spark):
    from nifi_spark.datalib.sketch import bloom_bits, bloom_contains
    vals_a = [f"tok{i}" for i in range(200)]
    vals_b = [f"other{i}" for i in range(200)]
    dfa = spark.createDataFrame([(v,) for v in vals_a], "v string")
    dfb = spark.createDataFrame([(v,) for v in vals_b], "v string")
    rows_a = bloom_bits(dfa, "v").collect()
    rows_b = bloom_bits(dfb, "v").collect()
    assert all(bloom_contains(rows_a, v) for v in vals_a)
    # false-positive rate sane at this load factor (800 bits set of 16k)
    fp = sum(bloom_contains(rows_a, f"absent{i}") for i in range(500))
    assert fp < 25
    # union of filters == filter of union (bit_or word-wise)
    union = {}
    for r in rows_a + rows_b:
        union[r["word"]] = union.get(r["word"], 0) | r["bits"]
    rows_u = bloom_bits(dfa.unionByName(dfb), "v").collect()
    got = {r["word"]: r["bits"] for r in rows_u}
    assert got == union
    assert all(bloom_contains(rows_u, v) for v in vals_a + vals_b)


def test_bloom_masks_positive(spark):
    from nifi_spark.datalib.sketch import bloom_bits
    df = spark.createDataFrame([(f"x{i}",) for i in range(2000)],
                               "v string")
    rows = bloom_bits(df, "v", m_words=8, k=4).collect()
    assert all(r["bits"] > 0 for r in rows)     # sign bit never used
    assert len(rows) <= 8
