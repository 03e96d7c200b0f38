"""GeoEnrichIP / QueryDNS analogs (operators/enrich.py)."""

import random

from nifi_spark.operators.enrich import (cidr_to_range, flatten_ranges,
                                         geo_enrich_ip, ip_to_long,
                                         query_dns)


def test_cidr_to_range():
    assert cidr_to_range("10.0.0.0/8") == (10 << 24, (11 << 24) - 1)
    assert cidr_to_range("192.168.1.0/24") == (0xC0A80100, 0xC0A801FF)
    assert cidr_to_range("1.2.3.4/32") == (0x01020304, 0x01020304)
    assert cidr_to_range("1.2.3.4") == (0x01020304, 0x01020304)
    # base bits below the prefix are masked off
    assert cidr_to_range("10.0.0.77/24") == (0x0A000000, 0x0A0000FF)


def test_flatten_ranges_most_specific_wins_brute_force():
    rng = random.Random(4)
    for _ in range(50):
        n = rng.randint(1, 12)
        ranges = []
        for i in range(n):
            s = rng.randint(0, 120)
            e = s + rng.randint(0, 40)
            ranges.append((s, e, {"tag": i}))
        flat = flatten_ranges(ranges)
        # disjoint + sorted
        for (a, b, _), (c, d, _) in zip(flat, flat[1:]):
            assert b < c
        # every covered point maps to the smallest covering input range
        cover = {}
        for s, e, p in flat:
            for x in range(s, e + 1):
                cover[x] = p["tag"]
        for x in range(0, 170):
            best = None
            for i, (s, e, _) in enumerate(ranges):
                if s <= x <= e:
                    key = (e - s, i)
                    if best is None or key < best[0]:
                        best = (key, i)
            if best is None:
                assert x not in cover
            else:
                assert cover.get(x) == best[1], (x, ranges)


def test_geo_enrich_ip_broadcast_join(spark):
    ranges = [
        ("10.0.0.0/8", {"country": "A"}),
        ("10.1.2.0/24", {"country": "B"}),      # more specific, wins inside
        ((cidr_to_range("172.16.0.0/12")), {"country": "C"}),
    ]
    df = spark.createDataFrame(
        [("10.5.5.5",), ("10.1.2.77",), ("172.20.0.1",), ("8.8.8.8",),
         (None,)], "ip string")
    out = geo_enrich_ip(df, "ip", ranges, "country string")
    got = {r["ip"]: r["country"] for r in out.collect()}
    assert got == {"10.5.5.5": "A", "10.1.2.77": "B", "172.20.0.1": "C",
                   "8.8.8.8": None, None: None}
    # plan: broadcast equi-join, not a nested-loop cross product
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_enrich_bucket_spanning_range(spark):
    # a /8 spans 256 /16 buckets; ips at both ends must match
    ranges = [("42.0.0.0/8", {"country": "Z"})]
    df = spark.createDataFrame(
        [("42.0.0.1",), ("42.255.255.254",), ("43.0.0.0",)], "ip string")
    got = {r["ip"]: r["country"]
           for r in geo_enrich_ip(df, "ip", ranges, "country string").collect()}
    assert got == {"42.0.0.1": "Z", "42.255.255.254": "Z", "43.0.0.0": None}


def test_ip_to_long_column(spark):
    df = spark.createDataFrame([("1.2.3.4",), ("255.255.255.255",)],
                               "ip string")
    vals = [r[0] for r in df.select(ip_to_long("ip")).collect()]
    assert vals == [0x01020304, 0xFFFFFFFF]


def test_query_dns_routing(spark):
    def resolver(name, rtype):
        assert rtype == "PTR"
        if name.startswith("10."):
            return [f"host-{name.split('.')[-1]}.example"]
        if name == "boom":
            raise OSError("socket timeout")
        return []

    df = spark.createDataFrame(
        [("10.0.0.7",), ("8.8.8.8",), ("boom",), (None,)], "q string")
    rows = {r["q"]: (r["dns_answer"], r["relationship"])
            for r in query_dns(df, "q", resolver).collect()}
    assert rows["10.0.0.7"] == ("host-7.example", "found")
    assert rows["8.8.8.8"] == (None, "not found")
    assert rows["boom"] == (None, "not found")   # failures route, not fail
    assert rows[None] == (None, "not found")


def test_build_whois_query_dialects():
    from nifi_spark.operators.enrich import build_whois_query
    assert build_whois_query(["1.2.3.4"], "none") == "1.2.3.4\n"
    assert (build_whois_query(["a", "b"], "begin_end", "origin")
            == "begin origin \na\nb\nend")
    assert build_whois_query(["a"], "none", "origin") == "origin a\n"


def test_parse_whois_batch_split_java_semantics():
    from nifi_spark.operators.enrich import parse_whois_batch
    raw = "AS1 | k1 | x ||\nAS2 | k2 | y"
    rows = parse_whois_batch(raw, "split", r"\s*\|\s*", 2)
    # Java split drops trailing empties: group3 absent on line 1
    assert rows["k1"]["enrich.whois.record0.group0"] == "AS1"
    assert rows["k1"]["enrich.whois.record0.group2"] == "x"
    assert "enrich.whois.record0.group3" not in rows["k1"]
    assert rows["k2"]["enrich.whois.record0.group1"] == "k2"


def test_parse_whois_batch_regex():
    from nifi_spark.operators.enrich import parse_whois_batch
    raw = "origin=k9 asn=AS77\norigin=k10 asn=AS78"
    rows = parse_whois_batch(raw, "regex",
                             r"^origin=(\S+) asn=(\S+)$", 1)
    assert rows["k9"]["enrich.whois.record0.group2"] == "AS77"
    assert rows["k10"]["enrich.whois.record0.group0"] \
        == "origin=k10 asn=AS78"


def test_query_whois_bulk_routing(spark):
    from nifi_spark.operators.enrich import query_whois

    def lookup(q):
        # the fake REQUIRES the Begin/End dialect: a malformed bulk
        # query gets an empty response, so the found-routing below
        # proves the wire shape (closure state never returns from
        # executors, so assert via behavior, not capture)
        if not (q.startswith("begin origin \n") and q.endswith("end")):
            return ""
        out = []
        for ln in q.splitlines():
            ln = ln.strip()
            if not ln or ln.startswith("begin") or ln == "end":
                continue
            if ln != "miss":
                out.append(f"AS-{ln} | {ln}")
        return "\n".join(out)

    df = spark.createDataFrame([("k1",), ("miss",), ("k3",)],
                               "q string").coalesce(1)
    out = query_whois(df, "q", lookup, bulk="begin_end",
                      query_type="origin", parser="split",
                      parser_input=r"\s*\|\s*", key_group=2)
    rows = {r["q"]: r for r in out.collect()}
    assert rows["k1"]["relationship"] == "found"
    assert rows["k1"]["whois_attrs"]["enrich.whois.record0.group0"] \
        == "AS-k1"
    assert rows["miss"]["relationship"] == "not found"
    assert rows["miss"]["whois_attrs"] is None


def test_query_whois_lookup_failure_routes_not_found(spark):
    from nifi_spark.operators.enrich import query_whois

    def lookup(q):
        raise OSError("socket timeout")

    df = spark.createDataFrame([("k1",)], "q string")
    rows = query_whois(df, "q", lookup).collect()
    assert rows[0]["relationship"] == "not found"
