"""Enrichment lookups: GeoEnrichIP / QueryDNS analogs (SURVEY.md §2.6).

Reference: nifi-enrich-bundle — GeoEnrichIP.java (MaxMind city/country
lookup per flowfile attribute), QueryDNS.java (DNS query per row, found /
not-found routing). Both are per-row lookups against an external database
in NiFi; Spark-first they become:

* ``geo_enrich_ip`` — a BROADCAST range join. The range dimension
  (CIDR blocks → [start, end] + payload) is driver-sized by contract
  (a GeoIP database is ~3M rows, megabytes — the same contract as
  replace_text_with_mapping's dictionary). Overlapping ranges are
  flattened DRIVER-SIDE into disjoint intervals with most-specific-wins
  (MaxMind semantics), then exploded into /N prefix buckets so the join
  is a plain broadcast EQUI-join on ``ip >> (32-bits)`` plus a range
  filter — no BroadcastNestedLoopJoin, no post-join dedup shuffle: the
  fact side flows map-only even at 100 TB.
* ``query_dns`` — Arrow-batched ``mapInPandas`` with an INJECTABLE
  resolver (the invoke_http transport pattern: production wires a real
  socket resolver, tests/gates wire a deterministic fake), with the
  reference's found / not-found relationship routing.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame, functions as F


def ip_to_long(col: Column | str) -> Column:
    """Dotted-quad IPv4 string -> BIGINT (pure column arithmetic, exact
    SQL twin: same splits and casts)."""
    c = F.col(col) if isinstance(col, str) else col
    o = F.split(c, r"\.")
    return (o[0].cast("long") * 16777216 + o[1].cast("long") * 65536
            + o[2].cast("long") * 256 + o[3].cast("long"))


def long_to_ip(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(".", (c / 16777216).cast("long") % 256,
                       (c / 65536).cast("long") % 256,
                       (c / 256).cast("long") % 256, c % 256)


def cidr_to_range(cidr: str) -> tuple[int, int]:
    """'a.b.c.d/p' -> (start, end) as ints."""
    base, _, plen = cidr.partition("/")
    plen = int(plen) if plen else 32
    a, b, c, d = (int(x) for x in base.split("."))
    start = (a << 24 | b << 16 | c << 8 | d) & ~((1 << (32 - plen)) - 1)
    return start, start + (1 << (32 - plen)) - 1


def flatten_ranges(ranges: list[tuple[int, int, dict]]
                   ) -> list[tuple[int, int, dict]]:
    """Overlapping [start, end] ranges -> disjoint segments where the
    SMALLEST covering range's payload wins (most-specific match, ties by
    input order) — a boundary sweep, O(n log n) driver-side."""
    events: list[tuple[int, int, int]] = []
    for i, (s, e, _) in enumerate(ranges):
        if e < s:
            raise ValueError(f"range {i}: end < start")
        events.append((s, 0, i))          # open before close at same point
        events.append((e + 1, 1, i))
    events.sort()
    out: list[tuple[int, int, dict]] = []
    active: set[int] = set()
    prev = None

    def best() -> int | None:
        return min(active, key=lambda i: (ranges[i][1] - ranges[i][0], i)) \
            if active else None

    for pos, kind, i in events:
        if prev is not None and pos > prev and active:
            w = best()
            if out and out[-1][1] == prev - 1 and out[-1][2] is ranges[w][2]:
                out[-1] = (out[-1][0], pos - 1, ranges[w][2])
            else:
                out.append((prev, pos - 1, ranges[w][2]))
        if kind == 0:
            active.add(i)
        else:
            active.discard(i)
        prev = pos
    return out


def geo_enrich_ip(df: DataFrame, ip_col: str, ranges: list[tuple],
                  payload_schema: str, bucket_bits: int = 16,
                  max_dim: int = 4_000_000) -> DataFrame:
    """Left-enrich `df` with the payload of the most specific range
    covering ``ip_col`` (dotted-quad string). ``ranges`` is a driver-side
    list of (cidr | (start, end), payload dict); ``payload_schema`` names
    the payload columns, e.g. ``"country string, city string"``.

    Plan shape (asserted in plan_audit): flatten → explode each disjoint
    segment into its /``bucket_bits`` prefix buckets → broadcast →
    equi-join on the fact ip's bucket + between filter. One projection +
    one BroadcastHashJoin; the fact side never shuffles."""
    if len(ranges) > max_dim:
        raise ValueError(f"range dim {len(ranges)} exceeds max_dim "
                         f"{max_dim}: not a broadcastable dimension")
    norm: list[tuple[int, int, dict]] = []
    for spec, payload in ranges:
        s, e = cidr_to_range(spec) if isinstance(spec, str) else spec
        norm.append((s, e, payload))
    flat = flatten_ranges(norm)

    shift = 32 - bucket_bits
    names = [f.split()[0] for f in payload_schema.split(",")]
    rows = []
    for s, e, payload in flat:
        for b in range(s >> shift, (e >> shift) + 1):
            rows.append((b, s, e, *[payload.get(n) for n in names]))
    spark = df.sparkSession
    dim = spark.createDataFrame(
        rows, schema=("_bucket long, _ip_start long, _ip_end long, "
                      + payload_schema))

    ipn = ip_to_long(ip_col)
    fact = df.withColumn("_ipn", ipn).withColumn(
        "_bucket", F.shiftrightunsigned(F.col("_ipn"), shift))
    joined = fact.join(
        F.broadcast(dim),
        (fact["_bucket"] == dim["_bucket"])
        & (fact["_ipn"] >= dim["_ip_start"])
        & (fact["_ipn"] <= dim["_ip_end"]),
        "left")
    return joined.drop("_bucket", "_ipn", "_ip_start", "_ip_end")


def query_dns(df: DataFrame, query_col: str,
              resolver: Callable[[str, str], list[str]],
              record_type: str = "PTR") -> DataFrame:
    """QueryDNS analog: one lookup per row through the injectable
    ``resolver(name, record_type) -> [answers]``; adds ``dns_answer``
    (first answer or NULL) and ``relationship`` ('found' / 'not found' —
    the reference's routing, nifi-enrich-bundle QueryDNS.java). Arrow-
    batched so a production resolver amortizes sockets per batch."""
    import pandas as pd

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += ", dns_answer string, relationship string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            answers, rels = [], []
            for q in pdf[query_col]:
                try:
                    ans = resolver(str(q), record_type) if q is not None \
                        else []
                except Exception:  # noqa: BLE001 — lookup failure routes
                    ans = []
                answers.append(ans[0] if ans else None)
                rels.append("found" if ans else "not found")
            pdf = pdf.copy()
            pdf["dns_answer"] = answers
            pdf["relationship"] = rels
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# --------------------------------------------------------------- whois

def _java_split(line: str, regex: str) -> list[str]:
    """Java String.split semantics: trailing empty strings removed."""
    import re

    parts = re.split(regex, line)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def parse_whois_batch(raw: str, parser: str, parser_input: str,
                      key_group: int, schema: str = "whois"
                      ) -> dict[str, dict[str, str]]:
    """AbstractEnrichProcessor.parseBatchResponse analog
    (nifi-enrich-bundle/.../AbstractEnrichProcessor.java:191-236):
    split the bulk response into records keyed by the lookup value;
    each record's fields land as
    ``enrich.<schema>.record0.group<N>`` attributes (record0 is
    hardcoded in the reference for batched responses too).

    parser='split': each LINE splits on `parser_input` (Java split —
    trailing empties dropped); the key is column `key_group` (1-based).
    A line shorter than key_group raises, like the reference's
    unguarded ``splitResult[lookupKey - 1]``.
    parser='regex': `parser_input` compiled MULTILINE; the key is
    capture group `key_group`; groups 0..groupCount stored (the
    reference catches out-of-range groups per match and skips them).
    """
    import re

    rows: dict[str, dict[str, str]] = {}
    if parser == "split":
        for line in raw.splitlines():
            parts = _java_split(line, parser_input)
            if not parts:
                continue
            key = parts[key_group - 1]  # IndexError mirrors the reference
            d = rows.setdefault(key, {})
            for r, v in enumerate(parts):
                d[f"enrich.{schema}.record0.group{r}"] = v
    elif parser == "regex":
        p = re.compile(parser_input, re.MULTILINE)
        for m in p.finditer(raw):
            try:
                key = m.group(key_group)
            except IndexError:  # mirrors the reference's warn + skip
                continue
            d = rows.setdefault(key, {})
            for r in range((m.lastindex or 0) + 1):
                d[f"enrich.{schema}.record0.group{r}"] = m.group(r)
    else:
        raise ValueError(f"unknown whois parser {parser!r}")
    return rows


def build_whois_query(values: list[str], bulk: str = "none",
                      query_type: str | None = None) -> str:
    """QueryWhois.onTrigger's buildString, verbatim
    (QueryWhois.java:219-240): Begin/End bulk dialect wraps the values
    in ``begin``/``end`` pseudo-commands (the ShadowServer bulk form);
    the optional query type prefixes with a trailing space."""
    q = "begin " if bulk == "begin_end" else ""
    if query_type:
        q += query_type + " "
    if bulk == "begin_end":
        q += "\n"
    for v in values:
        q += v + "\n"
    if bulk == "begin_end":
        q += "end"
    return q


def query_whois(df: DataFrame, query_col: str,
                lookup: Callable[[str], str], *,
                bulk: str = "none", query_type: str | None = None,
                parser: str = "split", parser_input: str = r"\|",
                key_group: int = 1) -> DataFrame:
    """QueryWhois analog (nifi-enrich-bundle/.../QueryWhois.java:208-310):
    BULK whois enrichment. Each Arrow batch of rows builds ONE bulk
    query (`build_whois_query` — the reference batches
    ``session.get(batchSize)`` flowfiles per socket query; here the
    Arrow batch is the unit, so socket amortization scales with
    `spark.sql.execution.arrow.maxRecordsPerBatch`), sends it through
    the injectable ``lookup(query) -> raw response`` (production: a
    TCP/43 client; tests/gates: a deterministic fake — the query_dns /
    invoke_http transport pattern), parses the response with the
    reference's batch parser, and routes each row:

    * matched lookup value → relationship='found' +
      ``whois_attrs`` map column (the putAllAttributes analog,
      keys ``enrich.whois.record0.groupN``)
    * missing from the response / empty response / lookup error →
      relationship='not found', whois_attrs NULL.
    """
    import pandas as pd

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += ", whois_attrs map<string,string>, relationship string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = ["" if v is None else str(v) for v in pdf[query_col]]
            try:
                raw = lookup(build_whois_query(vals, bulk, query_type))
            except Exception:  # noqa: BLE001 — lookup failure → not found
                raw = ""
            rows = (parse_whois_batch(raw, parser, parser_input,
                                      key_group) if raw else {})
            attrs = [rows.get(v) for v in vals]
            rels = ["found" if a is not None else "not found"
                    for a in attrs]
            pdf = pdf.copy()
            pdf["whois_attrs"] = attrs
            pdf["relationship"] = rels
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
