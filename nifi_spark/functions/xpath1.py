"""Compact XPath 1.0 evaluator over ElementTree documents.

The execution core shared by the XSLT-subset engine (operators/xslt.py
— TransformXml's stylesheet path, standard/TransformXml.java:81) and
the XQuery-FLWOR subset (operators/xml_transform.py — EvaluateXQuery,
standard/EvaluateXQuery.java). It runs driver-free inside Arrow-batched
``mapInPandas`` workers, so it deliberately has zero dependencies
beyond the stdlib.

Supported (the XPath 1.0 core):
- location paths: absolute/relative, abbreviated axes (``a/b``,
  ``//a``, ``@x``, ``.``, ``..``, ``*``, ``text()``, ``node()``),
  explicit ``child::`` / ``attribute::`` / ``descendant-or-self::`` /
  ``self::`` / ``parent::`` / ``ancestor::`` / ``following-sibling::``
  / ``preceding-sibling::`` axes, unions with ``|``
- predicates: positional (``[2]``, ``[last()]``), boolean, nested paths
- operators: ``or and = != < <= > >= + - * div mod`` and unary minus,
  with the XPath 1.0 node-set comparison semantics (existential)
- core function library: last position count id local-name name string
  concat starts-with contains substring-before substring-after
  substring string-length normalize-space translate boolean not true
  false number sum floor ceiling round
- variable references ``$name`` (bound by XSLT/XQuery scopes)

Not supported (raises XPathError — declared, not silent): namespace
axes and qualified-name tests, ``id()``/``key()`` across documents,
``lang()``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Any, Callable
from xml.etree import ElementTree as ET


class XPathError(ValueError):
    pass


# --------------------------------------------------------------------------
# Node model: ET elements, plus lightweight wrappers for the node kinds
# ElementTree doesn't reify (document root, attributes, text nodes).
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class AttrNode:
    owner: object          # ET.Element
    name: str
    value: str


@dataclass(frozen=True)
class TextNode:
    parent: object         # ET.Element
    value: str
    slot: int              # position among the parent's text chunks


class Document:
    """Root-node wrapper: parent map + exact document-order sort keys
    (a node's key is its path of child indexes from the root, so mixed
    element/text content orders correctly)."""

    def __init__(self, root: ET.Element):
        self.root = root
        self.parent: dict[int, Any] = {id(root): self}
        for el in root.iter():
            for c in el:
                self.parent[id(c)] = el
        self._skey: dict = {}

    def sort_key(self, node) -> tuple:
        if isinstance(node, Document):
            return ()
        if isinstance(node, AttrNode):
            return self.sort_key(node.owner) + ((0, node.name),)
        memo = (id(node.parent), "t", node.slot) \
            if isinstance(node, TextNode) else id(node)
        if memo in self._skey:
            return self._skey[memo]
        p = _parent_of(self, node)
        if p is None:
            return ((1, 0),)
        sibs = node_children(self, p)
        idx = len(sibs)
        for i, s in enumerate(sibs):
            if s is node or s == node:
                idx = i
                break
        key = self.sort_key(p) + ((1, idx),)
        self._skey[memo] = key
        return key


def node_children(doc: Document, node) -> list:
    """Element + text children in document order."""
    if isinstance(node, Document):
        return [node.root]
    if not isinstance(node, ET.Element):
        return []
    out: list = []
    slot = 0
    if node.text:
        out.append(TextNode(node, node.text, slot))
        slot += 1
    for c in node:
        out.append(c)
        if c.tail:
            out.append(TextNode(node, c.tail, slot))
            slot += 1
    return out


def string_value(node) -> str:
    if isinstance(node, Document):
        node = node.root
    if isinstance(node, AttrNode):
        return node.value
    if isinstance(node, TextNode):
        return node.value
    if isinstance(node, ET.Element):
        return "".join(node.itertext())
    return str(node)


def node_name(node) -> str:
    if isinstance(node, AttrNode):
        return node.name
    if isinstance(node, ET.Element):
        return node.tag
    return ""


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>\d+(?:\.\d+)?|\.\d+)
    | (?P<str>"(?:[^"]|"")*"|'(?:[^']|'')*')
    | (?P<var>\$[A-Za-z_][\w.-]*)
    | (?P<dslash>//)
    | (?P<axis>[A-Za-z-]+::)
    | (?P<name>[A-Za-z_][\w.-]*(?::[A-Za-z_][\w.-]*)?)
    | (?P<op><=|>=|!=|[()\[\]@,.|/*=<>+-])
    )""", re.VERBOSE)


def tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise XPathError(f"bad token at {src[pos:pos+12]!r} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "op" and val == "." and toks and toks[-1] == ("op", "."):
            toks[-1] = ("op", "..")
            continue
        toks.append((kind, val))
    return toks


# --------------------------------------------------------------------------
# Parser → expression tree (nested tuples)
# --------------------------------------------------------------------------

class _Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0
        self.src = src

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise XPathError(f"expected {val!r}, got {v!r} in {self.src!r}")

    def parse(self):
        e = self.or_expr()
        if self.i != len(self.toks):
            raise XPathError(f"trailing tokens in {self.src!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("name", "or"):
            self.next()
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.eq_expr()
        while self.peek() == ("name", "and"):
            self.next()
            e = ("and", e, self.eq_expr())
        return e

    def eq_expr(self):
        e = self.rel_expr()
        while self.peek()[1] in ("=", "!="):
            op = self.next()[1]
            e = ("cmp", op, e, self.rel_expr())
        return e

    def rel_expr(self):
        e = self.add_expr()
        while self.peek()[1] in ("<", "<=", ">", ">="):
            op = self.next()[1]
            e = ("cmp", op, e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ("arith", op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.unary_expr()
        while (self.peek()[1] == "*" or
               self.peek() in (("name", "div"), ("name", "mod"))):
            op = self.next()[1]
            e = ("arith", op, e, self.unary_expr())
        return e

    def unary_expr(self):
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.unary_expr())
        return self.union_expr()

    def union_expr(self):
        e = self.path_expr()
        while self.peek()[1] == "|":
            self.next()
            e = ("union", e, self.path_expr())
        return e

    # ---- paths ----------------------------------------------------------

    _NODE_TESTS = {"text", "node", "comment", "processing-instruction"}

    def _starts_path(self) -> bool:
        k, v = self.peek()
        if v in ("/", "//", ".", "..", "@", "*"):
            return True
        if k == "axis":
            return True
        if k == "name":
            if v in ("or", "and", "div", "mod"):
                return False
            # function call => not a step, unless it's a node test
            if self.peek(1)[1] == "(" and v not in self._NODE_TESTS:
                return False
            return True
        return False

    def path_expr(self):
        k, v = self.peek()
        primary = None
        if k in ("num", "str", "var") or v == "(" or \
                (k == "name" and self.peek(1)[1] == "(" and
                 v not in self._NODE_TESTS):
            primary = self.filter_expr()
            steps = []
            while self.peek()[1] in ("/", "//"):
                sep = self.next()[1]
                if sep == "//":
                    steps.append(("step", "descendant-or-self",
                                  ("node",), []))
                steps.append(self.step())
            return ("chain", primary, steps) if steps else primary
        steps = []
        absolute = False
        if self.peek()[1] == "/":
            self.next()
            absolute = True
            if not self._starts_path():
                return ("path", True, [])
        elif self.peek()[1] == "//":
            self.next()
            absolute = True
            steps.append(("step", "descendant-or-self", ("node",), []))
        steps += self.rel_path_steps()
        return ("path", absolute, steps)

    def rel_path_steps(self):
        steps = [self.step()]
        while self.peek()[1] in ("/", "//"):
            sep = self.next()[1]
            if sep == "//":
                steps.append(("step", "descendant-or-self", ("node",), []))
            steps.append(self.step())
        return steps

    def step(self):
        k, v = self.peek()
        if v == ".":
            self.next()
            return ("step", "self", ("node",), self.predicates())
        if v == "..":
            self.next()
            return ("step", "parent", ("node",), self.predicates())
        axis = "child"
        if v == "@":
            self.next()
            axis = "attribute"
        elif k == "axis":
            axis = self.next()[1][:-2]
        k, v = self.peek()
        if v == "*":
            self.next()
            test = ("*",)
        elif k == "name" and v in self._NODE_TESTS and \
                self.peek(1)[1] == "(":
            self.next()
            self.expect("(")
            self.expect(")")
            test = (v,)
        elif k == "name":
            self.next()
            test = ("name", v)
        else:
            raise XPathError(f"expected node test, got {v!r} in "
                             f"{self.src!r}")
        return ("step", axis, test, self.predicates())

    def predicates(self):
        preds = []
        while self.peek()[1] == "[":
            self.next()
            preds.append(self.or_expr())
            self.expect("]")
        return preds

    def filter_expr(self):
        k, v = self.next()
        if k == "num":
            e = ("num", float(v))
        elif k == "str":
            # XPath 2.0 literal escaping: doubled quotes inside the
            # matching delimiter collapse to one
            q = v[0]
            e = ("str", v[1:-1].replace(q + q, q))
        elif k == "var":
            e = ("var", v[1:])
        elif v == "(":
            e = self.or_expr()
            self.expect(")")
        elif k == "name":
            self.expect("(")
            args = []
            if self.peek()[1] != ")":
                args.append(self.or_expr())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.or_expr())
            self.expect(")")
            e = ("call", v, args)
        else:
            raise XPathError(f"unexpected {v!r} in {self.src!r}")
        for p in self.predicates_after_primary():
            e = ("filter", e, p)
        return e

    def predicates_after_primary(self):
        preds = []
        while self.peek()[1] == "[":
            self.next()
            preds.append(self.or_expr())
            self.expect("]")
        return preds


_CACHE: dict[str, tuple] = {}


def compile_xpath(src: str) -> tuple:
    if src not in _CACHE:
        _CACHE[src] = _Parser(src).parse()
    return _CACHE[src]


# --------------------------------------------------------------------------
# Evaluator
# --------------------------------------------------------------------------

@dataclass
class Context:
    doc: Document
    node: Any
    position: int = 1
    size: int = 1
    variables: dict[str, Any] = field(default_factory=dict)
    # user-declared functions (XQuery prolog): qname -> f(ctx, arg_values)
    functions: dict[str, Any] = field(default_factory=dict)

    def with_node(self, node, position, size):
        return Context(self.doc, node, position, size, self.variables,
                       self.functions)


def xpath_replacement(rep: str) -> str:
    """XPath replace() replacement string -> Python re.sub template:
    only ``$N`` and ``\\`` are special in XPath; Python's backslash
    escapes must not fire for literal text."""
    out = []
    i = 0
    while i < len(rep):
        ch = rep[i]
        if ch == "\\" and i + 1 < len(rep):
            nxt = rep[i + 1]
            out.append("\\\\" if nxt == "\\" else nxt if nxt == "$"
                       else "\\\\" + nxt)
            i += 2
        elif ch == "$" and i + 1 < len(rep) and rep[i + 1].isdigit():
            j = i + 1
            while j < len(rep) and rep[j].isdigit():
                j += 1
            out.append(f"\\g<{rep[i + 1:j]}>")
            i = j
        elif ch == "\\":
            out.append("\\\\")
            i += 1
        else:
            out.append(ch.replace("\\", "\\\\"))
            i += 1
    return "".join(out)


def to_string(v: Any) -> str:
    if isinstance(v, list):
        return string_value(v[0]) if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return repr(v)
    return str(v)


def to_number(v: Any) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    s = to_string(v).strip()
    try:
        return float(s)
    except ValueError:
        return float("nan")


def to_bool(v: Any) -> bool:
    if isinstance(v, list):
        return bool(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    return bool(str(v))


def _axis_nodes(ctx: Context, axis: str) -> list:
    n, doc = ctx.node, ctx.doc
    if axis == "child":
        return [c for c in node_children(doc, n)]
    if axis == "attribute":
        if isinstance(n, ET.Element):
            return [AttrNode(n, k, v) for k, v in n.attrib.items()]
        return []
    if axis == "self":
        return [n]
    if axis == "parent":
        p = _parent_of(doc, n)
        return [p] if p is not None else []
    if axis == "descendant-or-self":
        return _descendants(doc, n, include_self=True)
    if axis == "descendant":
        return _descendants(doc, n, include_self=False)
    if axis == "ancestor" or axis == "ancestor-or-self":
        out = [n] if axis == "ancestor-or-self" else []
        p = _parent_of(doc, n)
        while p is not None:
            out.append(p)
            p = _parent_of(doc, p)
        return out
    if axis in ("following-sibling", "preceding-sibling"):
        p = _parent_of(doc, n)
        if p is None:
            return []
        sibs = node_children(doc, p)
        idx = next((i for i, s in enumerate(sibs) if s is n or
                    (isinstance(s, TextNode) and s == n)), None)
        if idx is None:
            return []
        return sibs[idx + 1:] if axis == "following-sibling" \
            else list(reversed(sibs[:idx]))
    raise XPathError(f"unsupported axis {axis!r}")


def _parent_of(doc: Document, n):
    if isinstance(n, Document):
        return None
    if isinstance(n, AttrNode):
        return n.owner
    if isinstance(n, TextNode):
        return n.parent
    return doc.parent.get(id(n))


def _descendants(doc: Document, n, include_self: bool) -> list:
    out = [n] if include_self else []
    for c in node_children(doc, n):
        out.extend(_descendants(doc, c, include_self=True))
    return out


def _node_test(node, test) -> bool:
    kind = test[0]
    if kind == "node":
        return True
    if kind == "text":
        return isinstance(node, TextNode)
    if kind == "*":
        return isinstance(node, (ET.Element, AttrNode))
    if kind == "name":
        return node_name(node) == test[1]
    return False


def _apply_predicates(ctx: Context, nodes: list, preds: list) -> list:
    for p in preds:
        size = len(nodes)
        kept = []
        for i, nd in enumerate(nodes):
            v = _eval(ctx.with_node(nd, i + 1, size), p)
            ok = (to_number(v) == i + 1) if isinstance(v, float) \
                else to_bool(v)
            if ok:
                kept.append(nd)
        nodes = kept
    return nodes


def _eval_steps(ctx: Context, start: list, steps: list) -> list:
    current = start
    for _, axis, test, preds in steps:
        nxt, seen = [], set()
        for nd in current:
            cand = [c for c in _axis_nodes(ctx.with_node(nd, 1, 1), axis)
                    if _node_test(c, test)]
            cand = _apply_predicates(ctx, cand, preds)
            for c in cand:
                key = id(c) if isinstance(c, ET.Element) else (
                    (id(c.owner), c.name) if isinstance(c, AttrNode)
                    else (id(c.parent), "t", c.slot)
                    if isinstance(c, TextNode) else id(c))
                if key not in seen:
                    seen.add(key)
                    nxt.append(c)
        current = nxt
    current.sort(key=ctx.doc.sort_key)
    return current


def _eval(ctx: Context, e) -> Any:
    op = e[0]
    if op == "num":
        return e[1]
    if op == "str":
        return e[1]
    if op == "var":
        if e[1] not in ctx.variables:
            raise XPathError(f"unbound variable ${e[1]}")
        return ctx.variables[e[1]]
    if op == "path":
        _, absolute, steps = e
        start = [ctx.doc if absolute else ctx.node]
        return _eval_steps(ctx, start, steps)
    if op == "chain":
        base = _eval(ctx, e[1])
        if not isinstance(base, list):
            raise XPathError("path applied to non-node-set")
        return _eval_steps(ctx, base, e[2])
    if op == "filter":
        base = _eval(ctx, e[1])
        if not isinstance(base, list):
            raise XPathError("predicate applied to non-node-set")
        return _apply_predicates(ctx, base, [e[2]])
    if op == "union":
        a, b = _eval(ctx, e[1]), _eval(ctx, e[2])
        if not (isinstance(a, list) and isinstance(b, list)):
            raise XPathError("union of non-node-sets")
        out, seen = [], set()
        for nd in a + b:
            k = ctx.doc.sort_key(nd)
            if k not in seen:
                seen.add(k)
                out.append(nd)
        out.sort(key=ctx.doc.sort_key)
        return out
    if op == "or":
        return to_bool(_eval(ctx, e[1])) or to_bool(_eval(ctx, e[2]))
    if op == "and":
        return to_bool(_eval(ctx, e[1])) and to_bool(_eval(ctx, e[2]))
    if op == "neg":
        return -to_number(_eval(ctx, e[1]))
    if op == "arith":
        a = to_number(_eval(ctx, e[2]))
        b = to_number(_eval(ctx, e[3]))
        o = e[1]
        if o == "+":
            return a + b
        if o == "-":
            return a - b
        if o == "*":
            return a * b
        if o == "div":
            if b != 0:
                return a / b
            if a != a or a == 0:
                return float("nan")
            return math.copysign(math.inf, a)
        if o == "mod":
            return math.fmod(a, b) if b != 0 else float("nan")
    if op == "cmp":
        return _compare(ctx, e[1], _eval(ctx, e[2]), _eval(ctx, e[3]))
    if op == "call":
        return _call(ctx, e[1], e[2])
    raise XPathError(f"bad expression node {e!r}")


def _compare(ctx: Context, op: str, a: Any, b: Any) -> bool:
    # node-set comparisons are existential (XPath 1.0 §3.4)
    if isinstance(a, list) or isinstance(b, list):
        la = a if isinstance(a, list) else [a]
        lb = b if isinstance(b, list) else [b]
        for x in la:
            for y in lb:
                if _compare(ctx, op,
                            string_value(x) if isinstance(a, list) else x,
                            string_value(y) if isinstance(b, list) else y):
                    return True
        return False
    if op in ("=", "!="):
        if isinstance(a, bool) or isinstance(b, bool):
            r = to_bool(a) == to_bool(b)
        elif isinstance(a, float) or isinstance(b, float):
            r = to_number(a) == to_number(b)
        else:
            r = to_string(a) == to_string(b)
        return r if op == "=" else not r
    na, nb = to_number(a), to_number(b)
    return {"<": na < nb, "<=": na <= nb,
            ">": na > nb, ">=": na >= nb}[op]


def _call(ctx: Context, name: str, args: list) -> Any:
    def a(i):
        return _eval(ctx, args[i])

    n = len(args)
    if name == "last":
        return float(ctx.size)
    if name == "position":
        return float(ctx.position)
    if name == "count":
        v = a(0)
        if not isinstance(v, list):
            raise XPathError("count() needs a node-set")
        return float(len(v))
    if name in ("name", "local-name"):
        if n == 0:
            return node_name(ctx.node)
        v = a(0)
        return node_name(v[0]) if v else ""
    if name == "string":
        return to_string(a(0)) if n else string_value(ctx.node)
    if name == "concat":
        return "".join(to_string(a(i)) for i in range(n))
    if name == "starts-with":
        return to_string(a(0)).startswith(to_string(a(1)))
    if name == "contains":
        return to_string(a(1)) in to_string(a(0))
    if name == "substring-before":
        s, sep = to_string(a(0)), to_string(a(1))
        return s.split(sep, 1)[0] if sep in s else ""
    if name == "substring-after":
        s, sep = to_string(a(0)), to_string(a(1))
        return s.split(sep, 1)[1] if sep in s else ""
    if name == "substring":
        s = to_string(a(0))
        start = round(to_number(a(1)))
        if n >= 3:
            length = round(to_number(a(2)))
            lo = max(start, 1)
            hi = start + length
            return s[lo - 1:max(hi - 1, 0)]
        return s[max(start, 1) - 1:]
    if name == "string-length":
        return float(len(to_string(a(0)) if n else
                         string_value(ctx.node)))
    if name == "normalize-space":
        s = to_string(a(0)) if n else string_value(ctx.node)
        return " ".join(s.split())
    if name == "translate":
        s, frm, to = to_string(a(0)), to_string(a(1)), to_string(a(2))
        table = {}
        for i, c in enumerate(frm):
            if c not in table:
                table[c] = to[i] if i < len(to) else None
        return "".join(table.get(c, c) for c in s
                       if table.get(c, c) is not None)
    if name == "boolean":
        return to_bool(a(0))
    if name == "not":
        return not to_bool(a(0))
    if name == "true":
        return True
    if name == "false":
        return False
    if name == "number":
        return to_number(a(0)) if n else to_number(string_value(ctx.node))
    if name == "sum":
        v = a(0)
        if not isinstance(v, list):
            raise XPathError("sum() needs a node-set")
        return float(sum(to_number(string_value(x)) for x in v))
    if name == "floor":
        return math.floor(to_number(a(0))) * 1.0
    if name == "ceiling":
        return math.ceil(to_number(a(0))) * 1.0
    if name == "round":
        v = to_number(a(0))
        return math.floor(v + 0.5) * 1.0 if v == v else v
    # ---- XPath 2.0 subset (XSLT 2.0 stylesheets: tokens.xsl family) ----
    if name == "tokenize" and n == 2:
        s = to_string(a(0))
        return re.split(to_string(a(1)), s) if s else []
    if name == "remove" and n == 2:
        seq = a(0)
        seq = seq if isinstance(seq, list) else [seq]
        pos = int(to_number(a(1)))
        return [x for i, x in enumerate(seq, 1) if i != pos]
    if name == "replace" and n >= 3:
        return re.sub(to_string(a(1)), xpath_replacement(to_string(a(2))),
                      to_string(a(0)))
    if name == "matches" and n >= 2:
        return re.search(to_string(a(1)), to_string(a(0))) is not None
    if name == "regex-group" and n == 1:
        m = ctx.variables.get("__regex_match__")
        if m is None:
            return ""
        try:
            return m.group(int(to_number(a(0)))) or ""
        except (IndexError, re.error):
            return ""
    if name == "string-join" and n == 2:
        seq = a(0)
        seq = seq if isinstance(seq, list) else [seq]
        return to_string(a(1)).join(
            x if isinstance(x, str) else string_value(x) for x in seq)
    if name in ctx.functions:
        return ctx.functions[name](ctx, [_eval(ctx, arg) for arg in args])
    # document-scoped registrations (XSLT's key()) — with_node copies
    # Context.functions, but host engines build fresh Contexts at many
    # sites, so the document is the stable carrier there
    doc_fns = getattr(ctx.doc, "functions", None)
    if doc_fns and name in doc_fns:
        return doc_fns[name](ctx, [_eval(ctx, arg) for arg in args])
    raise XPathError(f"unsupported function {name}()")


def evaluate(src: str, ctx: Context) -> Any:
    """Evaluate an XPath 1.0 expression string in the given context."""
    return _eval(ctx, compile_xpath(src))


def evaluate_on(src: str, root: ET.Element,
                variables: dict[str, Any] | None = None) -> Any:
    doc = Document(root)
    return evaluate(src, Context(doc, doc, variables=variables or {}))
