"""TransformXml / EvaluateXQuery analogs.

TransformXml (standard/TransformXml.java:1-60) runs a full XSLT 1.0
stylesheet via javax.xml.transform. Two paths here:

- ``rules=``: the declarative rename / drop / attribute-promotion /
  re-rooting rules that cover the most common TransformXml usage, with
  the stdlib ElementTree (expat) in one Arrow-batched ``mapInPandas``
  pass;
- ``stylesheet=``: a real XSLT engine (operators/xslt.py — template
  rules + priorities/modes, apply/call-template, for-each/sort,
  if/choose, element/attribute/copy/copy-of, variables/params, AVTs,
  xsl:key/key(), xsl:number, xsl:import/include with import
  precedence, apply-imports, decimal-format + format-number(),
  namespace-alias, and the 2.0 pieces the reference's own tokens.xsl
  needs: xsl:function, xsl:analyze-string, tokenize/string-join)
  running the in-repo XPath 1.0 evaluator (functions/xpath1.py),
  compiled once and applied row-wise in the same ``mapInPandas``
  shape.

EvaluateXQuery (standard/EvaluateXQuery.java:1-80) evaluates XQuery 1.0
via net.sf.saxon. The path-expression core of XQuery — which is XPath —
maps to Spark's built-in ``xpath()`` family (JVM-side javax.xml, whole
result array per query, zero Python); FLWOR expressions
(for/let/where/order by/return, direct constructors with {expr} holes,
nested FLWOR, prologs with declare namespace/variable/function,
external variable bindings) evaluate through the in-repo engine
(operators/xquery.py) as an Arrow-batched column.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_FLWOR = re.compile(r"^\s*(for|let)\s+\$|^\s*declare\s"
                    r"|^\s*xquery\s+version\b", re.IGNORECASE)


def transform_xml(df: DataFrame, content_col: str,
                  rules: list[dict] | None = None,
                  stylesheet: str | None = None,
                  out_col: str | None = None,
                  resolver: dict | None = None,
                  stylesheet_params: dict | None = None) -> DataFrame:
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
        if rules:
            raise ValueError("pass rules= or stylesheet=, not both")
        from nifi_spark.operators.xslt import XsltStylesheet
        XsltStylesheet(stylesheet, resolver)  # compile driver: fail fast
        out_col = out_col or content_col
        fields = [(n, "string" if n == out_col else t)
                  for n, t in df.dtypes]
        if out_col not in [n for n, _ in fields]:
            fields.append((out_col, "string"))
        schema = ", ".join(f"`{n}` {t}" for n, t in fields)
        out_names = [n for n, _ in fields]

        def run_xslt(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
            from nifi_spark.operators.xslt import (XsltStylesheet,
                                                   xslt_transform)
            sheet = XsltStylesheet(stylesheet, resolver)
            for pdf in batches:
                out = pdf.copy()
                out[out_col] = pdf[content_col].map(
                    lambda t: None if t is None
                    else xslt_transform(t, sheet,
                                        params=stylesheet_params))
                yield out[out_names]

        return df.mapInPandas(run_xslt, schema=schema)
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
                    first_only: bool = False,
                    bindings: dict | None = None) -> DataFrame:
    """XQuery path-expression evaluation → one column per query.

    {out_col: query}. Path expressions run JVM-side via the built-in
    xpath() (all matches, array<string>; point queries at text() or
    @attribute nodes to get values) or xpath_string (first_only=True).
    xpath() requires NODE-SET expressions; scalar results (count(),
    string(), boolean()) must go through first_only=True, which coerces
    to string. FLWOR queries evaluate through the in-repo engine
    (operators/xquery.py) as an Arrow-batched mapInPandas column —
    array<string> of serialized return items (first item only under
    first_only=True). Malformed XML yields NULL for FLWOR columns.
    ``bindings`` supplies values for ``declare variable $v external;``
    prolog declarations — static per run, like Saxon's
    setExternalVariable in the reference (EvaluateXQuery.java binds
    flowfile attributes the same way).
    """
    flwor = {n: q for n, q in queries.items() if _FLWOR.search(q)}
    paths = {n: q for n, q in queries.items() if n not in flwor}
    if paths:
        fn = F.xpath_string if first_only else F.xpath
        df = df.withColumns({
            name: fn(F.col(content_col), F.lit(q))
            for name, q in paths.items()})
    if not flwor:
        return df
    from nifi_spark.operators.xquery import parse_flwor
    plans = {n: parse_flwor(q) for n, q in flwor.items()}  # fail fast
    del plans
    elem_t = "string" if first_only else "array<string>"
    fields = list(df.dtypes) + [(n, elem_t) for n in flwor]
    schema = ", ".join(f"`{n}` {t}" for n, t in fields)
    out_names = [n for n, _ in fields]

    def run_flwor(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        from xml.etree import ElementTree as ET

        from nifi_spark.operators.xquery import eval_flwor, parse_flwor
        compiled = {n: parse_flwor(q) for n, q in flwor.items()}
        for pdf in batches:
            out = pdf.copy()
            for name, plan in compiled.items():
                def one(text, plan=plan):
                    if text is None:
                        return None
                    try:
                        root = ET.fromstring(text)
                    except ET.ParseError:
                        return None
                    items = eval_flwor(plan, root, variables=bindings)
                    if first_only:
                        return items[0] if items else None
                    return items
                out[name] = pdf[content_col].map(one)
            yield out[out_names]

    return df.mapInPandas(run_flwor, schema=schema)
