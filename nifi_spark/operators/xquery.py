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
strings: elements as XML, everything else as its string value), a
direct element constructor with ``{expr}`` holes in attribute values
and content (nested literal elements allowed), or a nested FLWOR.
Nested FLWOR is also accepted inside constructor holes and —
parenthesized — in for/let bindings; a nested FLWOR's items arrive as
serialized strings (markup concatenates, atomics space-join).

Prologs: ``xquery version "...";``, ``declare namespace p = "uri";``
(recorded; names match lexically), ``declare variable $v := expr;``
(evaluated top-down before the body), and
``declare function local:f($a, $b) { body };`` (body = any expression
or FLWOR; recursion allowed to depth 64; ``as type`` annotations are
accepted and ignored). ``declare variable $v external;`` binds from the
``variables=`` argument of eval_flwor (the Saxon setExternalVariable
analog — evaluate_xquery exposes it as ``bindings=``); the XQuery 3.0
default form ``external := expr`` evaluates the default when unbound,
and a plain external with no binding raises.
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


_VERSION_RE = re.compile(r'^xquery\s+version\s+("[^"]*"|\'[^\']*\')'
                         r'(?:\s+encoding\s+("[^"]*"|\'[^\']*\'))?\s*;\s*',
                         re.IGNORECASE)
_NS_RE = re.compile(r'^declare\s+namespace\s+([\w.-]+)\s*=\s*'
                    r'("[^"]*"|\'[^\']*\')\s*;\s*', re.IGNORECASE)
_DEFAULT_NS_RE = re.compile(r'^declare\s+default\s+(?:element|function)\s+'
                            r'namespace\s+("[^"]*"|\'[^\']*\')\s*;\s*',
                            re.IGNORECASE)
_VAR_DECL_RE = re.compile(r'^declare\s+variable\s+'
                          r'\$([\w.-]+(?::[\w.-]+)?)'
                          r'(?:\s+as\s+[\w.:?*+-]+)?\s*', re.IGNORECASE)
_FUNC_DECL_RE = re.compile(r'^declare\s+function\s+([\w.-]+(?::[\w.-]+)?)'
                           r'\s*\(', re.IGNORECASE)
_PARAM_RE = re.compile(r'\$([\w.-]+(?::[\w.-]+)?)'
                       r'(?:\s+as\s+[\w.:?*+-]+)?\s*$')


def _scan_to(src: str, start: int, stop_chars: str) -> int:
    """Index of the first depth-0 occurrence of any stop char; depth
    counts (), [], {} and skips quoted strings."""
    depth, quote = 0, None
    for i in range(start, len(src)):
        ch = src[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif depth == 0 and ch in stop_chars:
            return i
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
    return -1


def _parse_prolog(body: str, plan: dict) -> str:
    """Strip and record prolog declarations; returns the FLWOR body."""
    while True:
        m = _VERSION_RE.match(body)
        if m:
            body = body[m.end():]
            continue
        m = _NS_RE.match(body) or _DEFAULT_NS_RE.match(body)
        if m:
            groups = m.groups()
            if len(groups) == 2:
                plan["namespaces"][groups[0]] = groups[1][1:-1]
            body = body[m.end():]
            continue
        m = _VAR_DECL_RE.match(body)
        if m:
            rest = body[m.end():]
            em = re.match(r"external\s*(;|:=)", rest, re.IGNORECASE)
            if em:
                if em.group(1) == ";":
                    plan["external_vars"].append((m.group(1), None))
                    body = rest[em.end():].lstrip()
                    continue
                # XQuery 3.0 default form: external := expr;
                end = _scan_to(rest, em.end(), ";")
                if end < 0:
                    raise XQueryError("unterminated external variable")
                plan["external_vars"].append(
                    (m.group(1), rest[em.end():end].strip()))
                body = rest[end + 1:].lstrip()
                continue
            if not rest.startswith(":="):
                raise XQueryError(f"bad variable declaration: {body[:40]!r}")
            end = _scan_to(rest, 2, ";")
            if end < 0:
                raise XQueryError("unterminated declare variable")
            plan["prolog_vars"].append((m.group(1), rest[2:end].strip()))
            body = rest[end + 1:].lstrip()
            continue
        m = _FUNC_DECL_RE.match(body)
        if m:
            close = _scan_to(body, m.end(), ")")
            if close < 0:
                raise XQueryError("unterminated function parameter list")
            params = []
            for part in _split_top_commas(body[m.end():close]):
                pm = _PARAM_RE.match(part.strip())
                if not pm:
                    raise XQueryError(f"bad function parameter: {part!r}")
                params.append(pm.group(1))
            rest = body[close + 1:].lstrip()
            rest = re.sub(r"^as\s+[\w.:?*+-]+\s*", "", rest,
                          flags=re.IGNORECASE)
            if not rest.startswith("{"):
                raise XQueryError("function declaration without a body")
            bend = _scan_to(rest, 1, "}")
            # _scan_to counts the opening { we skipped? No: start=1 is
            # inside the braces, so the matching } is at depth 0 there.
            if bend < 0:
                raise XQueryError("unterminated function body")
            after = rest[bend + 1:].lstrip()
            if not after.startswith(";"):
                raise XQueryError("function declaration must end with ';'")
            plan["functions"][m.group(1)] = (params, rest[1:bend].strip())
            body = after[1:].lstrip()
            continue
        if re.match(r"^declare\b", body, re.IGNORECASE):
            raise XQueryError(f"unsupported prolog declaration: "
                              f"{body[:40]!r}")
        return body


def _top_level_clause_hits(body: str) -> list[re.Match]:
    """FLWOR keyword matches at paren/bracket/brace/quote depth 0
    (so a parenthesized nested FLWOR inside a binding stays opaque)."""
    depth, quote = 0, None
    depths = []
    for ch in body:
        depths.append(depth if quote is None else -1)
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
    return [m for m in _CLAUSE_RE.finditer(body)
            if depths[m.start()] == 0]


def parse_flwor(src: str) -> dict:
    """Split an XQuery (optional prolog + FLWOR) into a plan dict
    (source text kept; sub-expressions compile lazily through the
    XPath cache)."""
    plan = {"binds": [], "where": None, "order": [], "return": None,
            "prolog_vars": [], "external_vars": [], "functions": {},
            "namespaces": {}}
    body = _parse_prolog(src.strip(), plan)
    hits = _top_level_clause_hits(body)
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
    return plan


def _serialize_item(item) -> str:
    if isinstance(item, ET.Element):
        return ET.tostring(item, encoding="unicode")
    from nifi_spark.functions.xpath1 import string_value
    return string_value(item) if not isinstance(
        item, (str, float, bool)) else to_string(item)


def _serialize_value(v) -> str:
    if isinstance(v, list):
        # markup-string items come from nested FLWOR results; they
        # concatenate like element sequences, atomics space-join
        if all(isinstance(x, ET.Element)
               or (isinstance(x, str) and x.lstrip().startswith("<"))
               for x in v):
            return "".join(_serialize_item(x) for x in v)
        return " ".join(_serialize_item(x) for x in v)
    return to_string(v)


_XQUERY_START_RE = re.compile(
    r"^\s*(?:for\s+\$|let\s+\$|declare\s|xquery\s+version)", re.IGNORECASE)


def _parse_cached(src: str) -> dict:
    if src not in _PLAN_CACHE:
        if len(_PLAN_CACHE) > 256:
            _PLAN_CACHE.clear()
        _PLAN_CACHE[src] = parse_flwor(src)
    return _PLAN_CACHE[src]


_PLAN_CACHE: dict[str, dict] = {}


def _strip_outer_parens(t: str) -> str:
    t = t.strip()
    while t.startswith("(") and t.endswith(")") and \
            _scan_to(t, 1, ")") == len(t) - 1:
        t = t[1:-1].strip()
    return t


_QUANT_RE = re.compile(r"^(some|every)\s+\$", re.IGNORECASE)
_SATISFIES_RE = re.compile(r"\bsatisfies\b", re.IGNORECASE)
_QBIND_RE = re.compile(r"^\s*\$([\w.-]+(?::[\w.-]+)?)\s+in\s+(.+)$",
                       re.DOTALL)


def _eval_quantified(t: str, ctx: Context) -> bool:
    """XQuery 1.0 §3.9 quantified expressions: ``some|every $v in E
    (, $v in E)* satisfies P`` — cartesian product over the binding
    sequences, effective-boolean P; empty sequences give the vacuous
    truth values (some → false, every → true)."""
    kw = t[:4].lower() if t[:4].lower() == "some" else "every"
    rest = t[len(kw):]
    hits = [m for m in _SATISFIES_RE.finditer(rest)
            if _depth0_at(rest, m.start())]
    if not hits:
        raise XQueryError(f"quantified expression without "
                          f"'satisfies': {t[:40]!r}")
    binds_src, pred = rest[:hits[0].start()], rest[hits[0].end():]
    binds = []
    for part in _split_top_commas(binds_src):
        bm = _QBIND_RE.match(part)
        if not bm:
            raise XQueryError(f"bad quantifier binding {part!r}")
        binds.append((bm.group(1), bm.group(2)))

    def rec(i: int, variables: dict) -> bool:
        c = Context(ctx.doc, ctx.doc, variables=variables,
                    functions=ctx.functions)
        if i == len(binds):
            return to_bool(_eval_expr(pred, c))
        name, expr = binds[i]
        seq = _eval_expr(expr, c)
        if not isinstance(seq, list):
            seq = [seq]
        found_all = True
        for item in seq:
            nv = dict(variables)
            nv[name] = [item] if not isinstance(
                item, (str, float, bool)) else item
            v = rec(i + 1, nv)
            if kw == "some" and v:
                return True
            found_all = found_all and v
        return False if kw == "some" else found_all

    return rec(0, dict(ctx.variables))


def _depth0_at(body: str, pos: int) -> bool:
    """True when `pos` sits at paren/bracket/brace/quote depth 0."""
    depth, quote = 0, None
    for i, ch in enumerate(body):
        if i == pos:
            return depth == 0 and quote is None
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
    return False


def _eval_expr(src: str, ctx: Context):
    """Evaluate an XPath expression, a quantified expression
    (some/every … satisfies), OR a (parenthesized) nested FLWOR — the
    latter inherits the caller's variables and declared functions and
    yields its items as serialized strings."""
    t = _strip_outer_parens(src)
    if _QUANT_RE.match(t):
        return _eval_quantified(t, ctx)
    if _XQUERY_START_RE.match(t):
        return eval_flwor(_parse_cached(t), None,
                          variables=ctx.variables,
                          functions=ctx.functions, doc=ctx.doc)
    return evaluate(src, ctx)


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
            j = _scan_to(t, i + 1, "}")     # depth-aware: holes may hold
            if j < 0:                       # constructors / nested FLWOR
                raise XQueryError(f"unbalanced {{ in constructor: {t!r}")
            v = _eval_expr(t[i + 1:j].strip(), ctx)
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
    """Return-clause instantiation: direct constructor, nested FLWOR
    (its items join into this binding's one result string), or
    expression."""
    t = _strip_outer_parens(text)   # balanced-aware: '(a) op (b)' keeps
    if t.startswith("<"):           # its parens (only enclosing pairs go)
        return _instantiate_constructor(t, ctx)
    if _XQUERY_START_RE.match(t):
        return _serialize_value(_eval_expr(t, ctx))
    return _serialize_value(evaluate(text.strip(), ctx))


def _build_functions(plan: dict, inherited: dict | None) -> dict:
    """Compile `declare function` bodies into closures the XPath
    engine dispatches through Context.functions; recursion is allowed
    to depth 64 (the body sees the full registry, including itself)."""
    funcs = dict(inherited or {})
    depth = {"d": 0}
    for qname, (params, body) in plan["functions"].items():
        def _call(ctx, args, qname=qname, params=params, body=body):
            if len(args) != len(params):
                raise XQueryError(f"{qname}() expects {len(params)} "
                                  f"argument(s), got {len(args)}")
            if depth["d"] >= 64:
                raise XQueryError(f"{qname}(): recursion deeper than 64")
            depth["d"] += 1
            try:
                return _eval_expr(body, Context(
                    ctx.doc, ctx.doc,
                    variables=dict(zip(params, args)), functions=funcs))
            finally:
                depth["d"] -= 1
        funcs[qname] = _call
    return funcs


def eval_flwor(plan: dict, root: ET.Element | None,
               variables: dict | None = None,
               functions: dict | None = None,
               doc: Document | None = None) -> list[str]:
    doc = doc if doc is not None else Document(root)
    funcs = _build_functions(plan, functions)
    vars0 = dict(variables or {})
    for name, default in plan.get("external_vars", ()):
        if name in vars0:
            continue
        if default is None:
            raise XQueryError(
                f"external variable ${name} not bound (pass it via "
                "variables= / evaluate_xquery(bindings=...))")
        vars0[name] = _eval_expr(
            default, Context(doc, doc, variables=vars0, functions=funcs))
    for name, expr in plan["prolog_vars"]:
        vars0[name] = _eval_expr(
            expr, Context(doc, doc, variables=vars0, functions=funcs))
    results: list[tuple[list, str]] = []

    def rec(i: int, variables: dict):
        if i == len(plan["binds"]):
            ctx = Context(doc, doc, variables=variables, functions=funcs)
            if plan["where"] is not None and \
                    not to_bool(_eval_expr(plan["where"], ctx)):
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
        ctx = Context(doc, doc, variables=variables, functions=funcs)
        if kind == "let":
            nv = dict(variables)
            nv[name] = _eval_expr(expr, ctx)
            rec(i + 1, nv)
            return
        seq = _eval_expr(expr, ctx)
        if not isinstance(seq, list):
            seq = [seq]
        for item in seq:
            nv = dict(variables)
            nv[name] = [item] if not isinstance(
                item, (str, float, bool)) else item
            rec(i + 1, nv)

    rec(0, vars0)
    if plan["order"]:
        n_keys = len(plan["order"])
        for ki in reversed(range(n_keys)):
            desc = plan["order"][ki][1]
            results.sort(key=lambda r, ki=ki: r[0][ki][0], reverse=desc)
    return [s for _, s in results]
