"""TransformXml / EvaluateXQuery analogs.

TransformXml (standard/TransformXml.java:1-60) runs a full XSLT 1.0
stylesheet via javax.xml.transform; no XSLT engine exists in this
sandbox (no lxml/libxslt), so the operator here executes the
*declarative transform rules* that cover the overwhelming share of
real TransformXml usage — rename / drop / attribute-promotion /
re-rooting — with the stdlib ElementTree (expat) in one Arrow-batched
``mapInPandas`` pass. Passing an actual ``stylesheet=`` hits a declared
NotImplementedError seam (same pattern as the multimodal codec and
BinXML seams) marking where lxml's XSLT plugs in on a real cluster.

EvaluateXQuery (standard/EvaluateXQuery.java:1-80) evaluates XQuery 1.0
via net.sf.saxon. The path-expression core of XQuery — which is XPath —
maps to Spark's built-in ``xpath()`` family (JVM-side javax.xml, whole
result array per query, zero Python); FLWOR expressions
(for/let/where/order/return) need a real XQuery engine and raise at the
same declared seam.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_FLWOR = re.compile(r"^\s*(for|let)\s+\$|^\s*declare\s", re.IGNORECASE)


def transform_xml(df: DataFrame, content_col: str,
                  rules: list[dict] | None = None,
                  stylesheet: str | None = None,
                  out_col: str | None = None) -> DataFrame:
    """Apply declarative XML transform rules to a content column.

    Each rule is a dict applied in order to every document:
      {"op": "rename",  "match": <ElementTree path>, "to": tag}
      {"op": "drop",    "match": <path>}              (removes elements)
      {"op": "promote_attr", "match": <path>, "attr": a, "child": tag}
                                  (attribute becomes a child element)
      {"op": "set_attr", "match": <path>, "attr": a, "value": v}
      {"op": "wrap",    "tag": tag}                   (new root element)

    Paths use ElementTree's XPath subset ('.', './x', './/x', '[@a]').
    Malformed documents yield NULL output (route/quarantine upstream
    with validate_xml). Runs as one Arrow-batched mapInPandas pass —
    parallelism == partition count, no driver involvement.
    """
    if stylesheet is not None:
        raise NotImplementedError(
            "full XSLT needs lxml/libxslt — not in sandbox; plug the "
            "real transformer in here (TransformXml.java:1-60)")
    rules = rules or []
    out_col = out_col or content_col
    for r in rules:  # validate driver-side so typos fail fast
        if r.get("op") not in {"rename", "drop", "promote_attr",
                               "set_attr", "wrap"}:
            raise ValueError(f"unknown transform op: {r!r}")

    fields = [(n, "string" if n == out_col else t) for n, t in df.dtypes]
    if out_col not in [n for n, _ in fields]:
        fields.append((out_col, "string"))
    schema = ", ".join(f"`{n}` {t}" for n, t in fields)
    out_names = [n for n, _ in fields]

    def apply_rules(text):
        import xml.etree.ElementTree as ET
        if text is None:
            return None
        try:
            root = ET.fromstring(text)
        except ET.ParseError:
            return None
        for r in rules:
            if r["op"] == "wrap":
                new = ET.Element(r["tag"])
                new.append(root)
                root = new
                continue
            matched = ([root] if r["match"] == "." else
                       root.findall(r["match"]))
            if r["op"] == "rename":
                for el in matched:
                    el.tag = r["to"]
            elif r["op"] == "set_attr":
                for el in matched:
                    el.set(r["attr"], str(r["value"]))
            elif r["op"] == "promote_attr":
                for el in matched:
                    if r["attr"] in el.attrib:
                        child = ET.SubElement(el, r["child"])
                        child.text = el.attrib.pop(r["attr"])
            elif r["op"] == "drop":
                # ElementTree removal needs the parent: walk all nodes
                drop = set(id(el) for el in matched)
                for parent in root.iter():
                    for el in [c for c in list(parent) if id(c) in drop]:
                        parent.remove(el)
        return ET.tostring(root, encoding="unicode")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = pdf[content_col].map(apply_rules)
            yield out[out_names]

    return df.mapInPandas(run, schema=schema)


def evaluate_xquery(df: DataFrame, content_col: str,
                    queries: dict[str, str],
                    first_only: bool = False) -> DataFrame:
    """XQuery path-expression evaluation → one column per query.

    {out_col: query}. Path expressions run JVM-side via the built-in
    xpath() (all matches, array<string>; point queries at text() or
    @attribute nodes to get values) or xpath_string (first_only=True).
    xpath() requires NODE-SET expressions; scalar results (count(),
    string(), boolean()) must go through first_only=True, which coerces
    to string. FLWOR queries raise NotImplementedError — the declared
    engine seam (EvaluateXQuery.java uses Saxon for those).
    """
    for name, q in queries.items():
        if _FLWOR.search(q):
            raise NotImplementedError(
                f"query {name!r} is FLWOR XQuery — needs a real engine "
                "(Saxon in EvaluateXQuery.java); only path expressions "
                "are supported here")
    fn = F.xpath_string if first_only else F.xpath
    return df.withColumns({
        name: fn(F.col(content_col), F.lit(q))
        for name, q in queries.items()})
