"""XQuery FLWOR subset — EvaluateXQuery's non-path expressions.

The reference evaluates XQuery 1.0 via Saxon
(standard/EvaluateXQuery.java, 449 LoC). The path-expression core
already maps to Spark's JVM-side ``xpath()``; this module adds the
FLWOR form over the in-repo XPath 1.0 engine so for/let/where/order
by/return queries evaluate instead of raising:

  for $x in <path> (, $y in <path>)*     -- cartesian, clause order
  let $v := <expr>                        -- interleaved with for
  where <expr>
  order by <expr> [ascending|descending] (, ...)*
  return <expr-or-direct-constructor>

The return clause is either an XPath expression (items serialize to
strings: elements as XML, everything else as its string value) or a
direct element constructor with ``{expr}`` holes in attribute values
and content (nested literal elements allowed; nested FLWOR is not —
that raises, the remaining declared boundary).
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET

from nifi_spark.functions.xpath1 import (Context, Document, XPathError,
                                         evaluate, to_bool, to_number,
                                         to_string)


class XQueryError(ValueError):
    pass


_CLAUSE_RE = re.compile(
    r"\b(for|let|where|order\s+by|return)\b", re.IGNORECASE)
_FOR_BIND_RE = re.compile(
    r"^\s*\$([\w.-]+)\s+in\s+(.+?)\s*$", re.DOTALL)
_LET_BIND_RE = re.compile(
    r"^\s*\$([\w.-]+)\s*:=\s*(.+?)\s*$", re.DOTALL)


def _split_top_commas(src: str) -> list[str]:
    """Split on commas not inside (), [], quotes, or a constructor."""
    parts, buf = [], []
    depth = 0
    quote = None
    for ch in src:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([<{":
            depth += 1
        elif ch in ")]>}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def parse_flwor(src: str) -> dict:
    """Split a FLWOR expression into clauses (source text kept;
    sub-expressions compile lazily through the XPath cache)."""
    body = src.strip()
    if body.lower().startswith("declare"):
        raise XQueryError("prologs (declare ...) are not supported")
    hits = list(_CLAUSE_RE.finditer(body))
    if not hits or hits[0].start() != 0:
        raise XQueryError(f"not a FLWOR expression: {src[:40]!r}")
    clauses: list[tuple[str, str]] = []
    for i, m in enumerate(hits):
        end = hits[i + 1].start() if i + 1 < len(hits) else len(body)
        kw = re.sub(r"\s+", " ", m.group(1).lower())
        text = body[m.end():end].strip()
        clauses.append((kw, text))
        if kw == "return":
            # everything after the first return belongs to it
            clauses[-1] = (kw, body[m.end():].strip())
            break
    plan = {"binds": [], "where": None, "order": [], "return": None}
    for kw, text in clauses:
        if kw == "for":
            for part in _split_top_commas(text):
                m2 = _FOR_BIND_RE.match(part)
                if not m2:
                    raise XQueryError(f"bad for binding: {part!r}")
                plan["binds"].append(("for", m2.group(1), m2.group(2)))
        elif kw == "let":
            for part in _split_top_commas(text):
                m2 = _LET_BIND_RE.match(part)
                if not m2:
                    raise XQueryError(f"bad let binding: {part!r}")
                plan["binds"].append(("let", m2.group(1), m2.group(2)))
        elif kw == "where":
            plan["where"] = text
        elif kw == "order by":
            for part in _split_top_commas(text):
                desc = False
                p = part
                if re.search(r"\bdescending\s*$", p):
                    desc = True
                    p = re.sub(r"\bdescending\s*$", "", p).strip()
                else:
                    p = re.sub(r"\bascending\s*$", "", p).strip()
                plan["order"].append((p, desc))
        elif kw == "return":
            plan["return"] = text
    if plan["return"] is None:
        raise XQueryError("FLWOR without a return clause")
    if _CLAUSE_RE.match(plan["return"].lstrip("( ")):
        raise XQueryError("nested FLWOR in return is not supported "
                          "(needs a full XQuery engine — "
                          "EvaluateXQuery.java uses Saxon)")
    return plan


def _serialize_item(item) -> str:
    if isinstance(item, ET.Element):
        return ET.tostring(item, encoding="unicode")
    from nifi_spark.functions.xpath1 import string_value
    return string_value(item) if not isinstance(
        item, (str, float, bool)) else to_string(item)


def _serialize_value(v) -> str:
    if isinstance(v, list):
        if all(isinstance(x, ET.Element) for x in v):
            return "".join(_serialize_item(x) for x in v)
        return " ".join(_serialize_item(x) for x in v)
    return to_string(v)


def _atomize(v) -> str:
    """Attribute-context value: nodes atomize to string values
    (space-joined), never serialize as markup (XQuery 1.0 §3.7.1.1)."""
    if isinstance(v, list):
        from nifi_spark.functions.xpath1 import string_value
        return " ".join(string_value(x) if not isinstance(
            x, (str, float, bool)) else to_string(x) for x in v)
    return to_string(v)


def _instantiate_constructor(t: str, ctx: Context) -> str:
    """Substitute {expr} holes, atomizing inside attribute values and
    serializing in element content; {{ }} escape."""
    out: list[str] = []
    i, in_tag, quote = 0, False, None
    while i < len(t):
        ch = t[i]
        if ch in "{}" and i + 1 < len(t) and t[i + 1] == ch:
            out.append(ch)
            i += 2
            continue
        if ch == "{":
            j = t.index("}", i)
            v = evaluate(t[i + 1:j].strip(), ctx)
            out.append(_atomize(v) if quote else _serialize_value(v))
            i = j + 1
            continue
        if quote:
            if ch == quote:
                quote = None
        elif in_tag:
            if ch in "'\"":
                quote = ch
            elif ch == ">":
                in_tag = False
        elif ch == "<":
            in_tag = True
        out.append(ch)
        i += 1
    return "".join(out)


def _instantiate_return(text: str, ctx: Context) -> str:
    """Return-clause instantiation: direct constructor or expression."""
    t = text.strip()
    if t.startswith("("):
        t = t[1:-1].strip() if t.endswith(")") else t
    if t.startswith("<"):
        return _instantiate_constructor(t, ctx)
    return _serialize_value(evaluate(t, ctx))


def eval_flwor(plan: dict, root: ET.Element) -> list[str]:
    doc = Document(root)
    results: list[tuple[list, str]] = []

    def rec(i: int, variables: dict):
        if i == len(plan["binds"]):
            ctx = Context(doc, doc, variables=variables)
            if plan["where"] is not None and \
                    not to_bool(evaluate(plan["where"], ctx)):
                return
            keys = []
            for expr, desc in plan["order"]:
                v = evaluate(expr, ctx)
                num = to_number(v)
                k = (0, num, "") if num == num else (1, 0.0, to_string(v))
                keys.append((k, desc))
            results.append((keys, _instantiate_return(
                plan["return"], ctx)))
            return
        kind, name, expr = plan["binds"][i]
        ctx = Context(doc, doc, variables=variables)
        if kind == "let":
            nv = dict(variables)
            nv[name] = evaluate(expr, ctx)
            rec(i + 1, nv)
            return
        seq = evaluate(expr, ctx)
        if not isinstance(seq, list):
            seq = [seq]
        for item in seq:
            nv = dict(variables)
            nv[name] = [item] if not isinstance(
                item, (str, float, bool)) else item
            rec(i + 1, nv)

    rec(0, {})
    if plan["order"]:
        n_keys = len(plan["order"])
        for ki in reversed(range(n_keys)):
            desc = plan["order"][ki][1]
            results.sort(key=lambda r, ki=ki: r[0][ki][0], reverse=desc)
    return [s for _, s in results]
