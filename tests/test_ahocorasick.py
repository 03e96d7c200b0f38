"""Aho-Corasick matcher + the automaton mode of scan_content."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nifi_spark.functions.ahocorasick import AhoCorasick


def test_classic_ushers_example():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert ac.search("ushers") == {"he", "she", "hers"}
    assert sorted(ac.finditer("ushers")) == [
        (4, "he"), (4, "she"), (6, "hers")]


def test_bytes_terms():
    ac = AhoCorasick([b"ab", b"bc", b"abc"])
    assert ac.search(b"zabcz") == {b"ab", b"bc", b"abc"}
    assert ac.search(b"zz") == set()


def test_overlapping_and_suffix_outputs():
    # a term that is a suffix of another must fire through fail links
    ac = AhoCorasick(["abcd", "cd", "d"])
    assert ac.search("xabcdx") == {"abcd", "cd", "d"}


def test_brute_force_equivalence_random():
    rng = random.Random(11)
    alpha = "abcde"
    terms = sorted({"".join(rng.choice(alpha)
                            for _ in range(rng.randint(1, 5)))
                    for _ in range(80)})
    ac = AhoCorasick(terms)
    for _ in range(500):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80)))
        assert ac.search(s) == {t for t in terms if t in s}


def test_validation():
    with pytest.raises(ValueError, match="at least one"):
        AhoCorasick([])
    with pytest.raises(ValueError, match="empty term"):
        AhoCorasick(["ok", ""])
    with pytest.raises(ValueError, match="all str or all bytes"):
        AhoCorasick(["a", b"b"])


def test_scan_content_automaton_equals_substring_mode(spark):
    from nifi_spark.operators import scan_content
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    terms = ["an", "er", "merg", "shuffl", "par", "zzqx", "ti"]
    dictionary = spark.createDataFrame([(t,) for t in terms],
                                       "term string")
    sub = scan_content(docs, "text", dictionary, mode="substring")
    auto = scan_content(docs, "text", dictionary, mode="automaton")
    a = {r["doc_id"]: (list(r["matched_terms"]), r["matched"])
         for r in sub.collect()}
    b = {r["doc_id"]: (list(r["matched_terms"]), r["matched"])
         for r in auto.collect()}
    assert a == b
