"""XSLT 1.0 subset engine — TransformXml's stylesheet path.

The reference's TransformXml (standard/TransformXml.java:81, 286 LoC)
hands the whole transform to javax.xml.transform; this sandbox has no
libxslt/Saxon, so this module interprets the XSLT 1.0 core directly
over ElementTree with the in-repo XPath 1.0 evaluator
(functions/xpath1.py). It covers the template-rule model and the
instruction set that constitutes the overwhelming majority of real
stylesheets:

  xsl:template (match patterns incl. unions + predicates, named
  templates, modes, priorities), xsl:apply-templates (select, mode,
  with-param), xsl:call-template, xsl:value-of, xsl:for-each, xsl:if,
  xsl:choose/when/otherwise, xsl:element, xsl:attribute, xsl:text,
  xsl:copy, xsl:copy-of, xsl:variable, xsl:param / xsl:with-param,
  xsl:sort (text/number, ascending/descending), literal result
  elements with attribute value templates ({expr}), built-in template
  rules, and xsl:output method="xml|text".

Out of scope (raises XsltError with the instruction name — a declared
boundary, never a silent wrong answer): extension namespaces and
xsl:strip-space/attribute-set (accepted, ignored).
Supported beyond the round-2 subset: xsl:key + key() (per-document
index, doc-ordered results), xsl:number (value=, levels
single/any/multiple, count=/from= patterns, format tokens 1/01/a/A/i/I),
xsl:import/xsl:include through a resolver mapping hrefs to stylesheet
text (imports carry lower import precedence), xsl:apply-imports (the
next-best template strictly below the current template's import
precedence; built-in rules when none), xsl:decimal-format +
format-number() (JDK-DecimalFormat subset: #/0 digits, grouping,
min/max fraction, percent/per-mille, negative subpattern, character
overrides, HALF_EVEN), and xsl:namespace-alias (literal result
elements/attributes re-homed to the result namespace; prefix→uri maps
recovered lexically from the stylesheet source since ElementTree
resolves prefixes away).

Execution model on Spark: one stylesheet compiled once per executor
task, applied row-wise inside Arrow-batched ``mapInPandas`` — a pure
CPU map, embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any
from xml.etree import ElementTree as ET

from nifi_spark.functions.xpath1 import (AttrNode, Context, Document,
                                         TextNode, XPathError, evaluate,
                                         node_children, string_value,
                                         to_bool, to_number, to_string)

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_X = "{%s}" % XSL_NS


class _SeqVal:
    """xsl:sequence result carried through an output list unserialized
    (consumed by _run_function; in template context it stringifies)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


_XML_DECL_RE = re.compile(r"^\s*<\?xml[^>]*\?>\s*")


def _strip_xml_decl(text: str) -> str:
    """ET.fromstring rejects unicode strings carrying an encoding
    declaration; the declaration is advisory for already-decoded text."""
    return _XML_DECL_RE.sub("", text, count=1)


class XsltError(ValueError):
    pass


_AVT_RE = re.compile(r"\{([^{}]*)\}|\{\{|\}\}")


def _avt(text: str, ctx: Context) -> str:
    """Attribute value template: {expr} evaluates, {{ }} escape."""
    def sub(m):
        if m.group(0) == "{{":
            return "{"
        if m.group(0) == "}}":
            return "}"
        return to_string(evaluate(m.group(1), ctx))
    return _AVT_RE.sub(sub, text)


def _split_union(pattern: str) -> list[str]:
    parts, depth, buf, quote = [], 0, [], None
    for ch in pattern:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


@dataclass
class _Template:
    pattern: str | None     # None for purely named templates
    alts: list[str]         # union alternatives, root-anchored
    name: str | None
    mode: str | None
    priority: float
    pos: int                # document position (later wins ties)
    body: ET.Element        # the xsl:template element
    prec: int = 0           # import precedence (higher wins over
    #                         priority — the importing sheet's rules
    #                         beat anything it imports, XSLT 1.0 §5.5)


def _default_priority(alt: str) -> float:
    a = alt.strip()
    if "[" in a or "/" in a.strip("/"):
        return 0.5
    if a in ("*", "text()", "node()", "@*"):
        return -0.5
    return 0.0


def _anchor_alts(match: str) -> list[str]:
    alts = []
    for alt in _split_union(match):
        anchored = alt if alt.startswith("/") else "//" + alt
        if alt == "/":
            anchored = "/"
        alts.append(anchored)
    return alts


class XsltStylesheet:
    """Compiled stylesheet; ``apply(xml_text)`` returns the output.

    ``resolver`` maps an xsl:import/xsl:include href to its stylesheet
    text (a dict or a callable) — there is no filesystem contract in a
    distributed operator, so unresolved hrefs raise at compile time.
    Imported templates carry lower import precedence (the importing
    sheet wins regardless of priority, per XSLT 1.0 §5.5); included
    sheets splice at the including sheet's precedence.
    """

    def __init__(self, stylesheet: str,
                 resolver: dict | None = None):
        self.output_method = "xml"
        self.output_encoding: str | None = None
        self.output_indent = False
        self.functions2: dict[str, ET.Element] = {}  # xsl:function (2.0)
        self.templates: list[_Template] = []
        self.named: dict[str, _Template] = {}
        self.global_vars: list[ET.Element] = []
        self.keys: list[tuple[str, list[str], str]] = []
        self.decimal_formats: dict[str | None, dict] = {}
        self.ns_aliases: dict[str, str] = {}   # stylesheet-uri → result-uri
        self._tpl_stack: list[_Template] = []  # for xsl:apply-imports
        self._next_prec = 0
        self._next_pos = 0
        self._loading: set[str] = set()   # import/include cycle guard
        self._load(self._parse_sheet(stylesheet), resolver,
                   _ns_decls(stylesheet))

    @staticmethod
    def _parse_sheet(stylesheet: str) -> ET.Element:
        try:
            root = ET.fromstring(_strip_xml_decl(stylesheet))
        except ET.ParseError as e:
            raise XsltError(f"stylesheet is not well-formed: {e}") from e
        if root.tag not in (_X + "stylesheet", _X + "transform"):
            raise XsltError(f"not an XSLT stylesheet root: {root.tag}")
        return root

    def _resolve(self, resolver, href: str) -> tuple[ET.Element, dict]:
        if href in self._loading:
            raise XsltError(f"cyclic xsl:import/include via {href!r}")
        self._loading.add(href)
        text = None
        if callable(resolver):
            text = resolver(href)
        elif resolver is not None:
            text = resolver.get(href)
        if text is None:
            raise XsltError(f"unresolvable stylesheet href {href!r} "
                            "(pass resolver={href: text})")
        return self._parse_sheet(text), _ns_decls(text)

    def _load(self, root: ET.Element, resolver, nsmap: dict) -> None:
        # imports first: each imported sheet takes a LOWER precedence
        # number than this sheet (and later imports beat earlier ones)
        for child in root:
            if child.tag == _X + "import":
                sub, sub_ns = self._resolve(resolver, child.get("href"))
                self._load(sub, resolver, sub_ns)
        prec = self._next_prec
        self._next_prec += 1
        self._load_body(root, resolver, prec, nsmap)

    def _load_body(self, root: ET.Element, resolver, prec: int,
                   nsmap: dict) -> None:
        for child in root:
            if child.tag == _X + "import":
                continue  # handled by _load
            if child.tag == _X + "include":
                sub, sub_ns = self._resolve(resolver, child.get("href"))
                if any(c.tag == _X + "import" for c in sub):
                    raise XsltError("xsl:import inside an included "
                                    "sheet is not supported")
                self._load_body(sub, resolver, prec, sub_ns)
                continue
            self._add_top_level(child, prec, nsmap)

    def _add_top_level(self, child: ET.Element, prec: int,
                       nsmap: dict) -> None:
        i = self._next_pos
        self._next_pos += 1
        if child.tag == _X + "output":
            self.output_method = child.get("method", "xml")
            self.output_encoding = child.get("encoding",
                                             self.output_encoding)
            self.output_indent = child.get("indent") == "yes" \
                or self.output_indent
        elif child.tag == _X + "function":
            # XSLT 2.0 stylesheet function, registered by LEXICAL qname
            self.functions2[child.get("name")] = child
        elif child.tag == _X + "template":
            match = child.get("match")
            prio = child.get("priority")
            t = _Template(
                pattern=match,
                alts=_anchor_alts(match) if match is not None else [],
                name=child.get("name"), mode=child.get("mode"),
                priority=float(prio) if prio is not None else
                (max(_default_priority(a)
                     for a in _split_union(match)) if match else 0.0),
                pos=i, body=child, prec=prec)
            self.templates.append(t)
            if t.name:
                # loading order ends with the highest precedence, so a
                # plain overwrite implements importing-sheet-wins
                self.named[t.name] = t
        elif child.tag in (_X + "variable", _X + "param"):
            self.global_vars.append(child)
        elif child.tag == _X + "key":
            self.keys.append((child.get("name"),
                              _anchor_alts(child.get("match")),
                              child.get("use")))
        elif child.tag == _X + "decimal-format":
            # format-number() picks these up; None = the default format
            self.decimal_formats[child.get("name")] = dict(child.attrib)
        elif child.tag == _X + "namespace-alias":
            sp = child.get("stylesheet-prefix", "#default")
            rp = child.get("result-prefix", "#default")
            s_uri = nsmap.get("" if sp == "#default" else sp)
            r_uri = nsmap.get("" if rp == "#default" else rp)
            if s_uri is None or r_uri is None:
                raise XsltError(
                    f"namespace-alias prefix not declared on the "
                    f"stylesheet: {sp!r} / {rp!r}")
            self.ns_aliases[s_uri] = r_uri
        # strip-space/preserve-space/attribute-set: ignore

    # ---- pattern matching -------------------------------------------

    def _match_keys(self, doc: Document, alt: str,
                    variables: dict) -> set:
        """Identity-key set of the nodes a pattern matches, evaluated
        ONCE per document (XSLT 1.0 patterns can only reference global
        variables, which are fixed per document, so the cache is safe).
        Turns per-node template selection into set lookups."""
        cache = getattr(doc, "_xslt_pat", None)
        if cache is None:
            cache = doc._xslt_pat = {}
        if alt not in cache:
            ctx = Context(doc, doc, variables=variables)
            hits = [doc] if alt == "/" else evaluate(alt, ctx)
            if not isinstance(hits, list):
                hits = []
            cache[alt] = {_node_key(h) for h in hits}
        return cache[alt]

    def _find_template(self, doc: Document, node, mode: str | None,
                       variables: dict,
                       below_prec: int | None = None) -> _Template | None:
        """below_prec: only consider templates with import precedence
        strictly below it — the xsl:apply-imports selection rule."""
        best = None
        key = _node_key(node)
        for t in self.templates:
            if t.pattern is None or t.mode != mode:
                continue
            if below_prec is not None and t.prec >= below_prec:
                continue
            if best is not None and \
                    (t.prec, t.priority, t.pos) <= \
                    (best.prec, best.priority, best.pos):
                continue
            if any(key in self._match_keys(doc, alt, variables)
                   for alt in t.alts):
                best = t
        return best

    # ---- instantiation ----------------------------------------------

    def apply(self, xml_text: str,
              params: dict[str, Any] | None = None) -> str:
        """params: caller-supplied values for top-level xsl:param
        elements (TransformXml's dynamic properties — the reference
        passes flowfile attributes as stylesheet parameters,
        standard/TransformXml.java:150-160); a supplied value overrides
        the param's default, unnamed params fall back to it."""
        src = ET.fromstring(_strip_xml_decl(xml_text))
        doc = Document(src)
        doc.functions = {"format-number": self._format_number_fn}
        if self.keys:
            doc.functions["key"] = self._key_fn
        for fname, fel in self.functions2.items():
            doc.functions[fname] = \
                (lambda f: lambda c, args: self._run_function(f, c, args))(fel)
        params = params or {}
        variables: dict[str, Any] = {}
        for gv in self.global_vars:
            name = gv.get("name")
            if gv.tag == _X + "param" and name in params:
                variables[name] = params[name]
                continue
            ctx = Context(doc, doc, variables=dict(variables))
            variables[name] = self._var_value(gv, ctx)
        out: list = []
        self._apply_to(out, [doc], None,
                       Context(doc, doc, variables=variables), {})
        return self._serialize(out)

    # ---- xsl:key ------------------------------------------------------

    def _key_index(self, doc: Document) -> dict:
        """name -> use-value -> doc-ordered node list; built once per
        document on first key() call."""
        cache = getattr(doc, "_xslt_keyidx", None)
        if cache is None:
            cache = doc._xslt_keyidx = {}
            for name, alts, use in self.keys:
                idx = cache.setdefault(name, {})
                for alt in alts:
                    nodes = evaluate(alt, Context(doc, doc))
                    if not isinstance(nodes, list):
                        continue
                    for nd in nodes:
                        v = evaluate(use, Context(doc, nd))
                        vals = [string_value(x) for x in v] \
                            if isinstance(v, list) else [to_string(v)]
                        for s in vals:
                            idx.setdefault(s, []).append(nd)
        return cache

    def _key_fn(self, ctx: Context, args: list):
        if len(args) != 2:
            raise XsltError("key() takes (name, value)")
        idx = self._key_index(ctx.doc).get(to_string(args[0]), {})
        vals = [string_value(x) for x in args[1]] \
            if isinstance(args[1], list) else [to_string(args[1])]
        seen, out = set(), []
        for s in vals:
            for nd in idx.get(s, []):
                k = _node_key(nd)
                if k not in seen:
                    seen.add(k)
                    out.append(nd)
        out.sort(key=ctx.doc.sort_key)
        return out

    # ---- format-number() / xsl:decimal-format ---------------------------

    def _format_number_fn(self, ctx: Context, args: list):
        if len(args) not in (2, 3):
            raise XsltError("format-number() takes (number, pattern"
                            "[, decimal-format-name])")
        name = to_string(args[2]) if len(args) == 3 else None
        if name is not None and name not in self.decimal_formats:
            raise XsltError(f"undeclared decimal format {name!r}")
        fmt = self.decimal_formats.get(name, {})
        return _format_decimal(to_number(args[0]), to_string(args[1]), fmt)

    # ---- xsl:number ----------------------------------------------------

    def _sorted_match_keys(self, doc: Document, alt: str,
                           variables: dict) -> list:
        """Sorted doc-order sort keys of a pattern's matches, cached per
        (document, pattern) like _match_keys."""
        cache = getattr(doc, "_xslt_pat_sorted", None)
        if cache is None:
            cache = doc._xslt_pat_sorted = {}
        if alt not in cache:
            hits = evaluate(alt, Context(doc, doc, variables=variables))
            if not isinstance(hits, list):
                hits = []
            cache[alt] = sorted(doc.sort_key(h) for h in hits)
        return cache[alt]

    def _pat_matches(self, doc: Document, nd, alts: list[str],
                     variables: dict) -> bool:
        key = _node_key(nd)
        return any(key in self._match_keys(doc, alt, variables)
                   for alt in alts)

    def _number(self, el: ET.Element, ctx: Context) -> str:
        value = el.get("value")
        if value is not None:
            # XPath round() = floor(x + 0.5), NOT banker's rounding
            import math
            nums = [int(math.floor(to_number(evaluate(value, ctx)) + 0.5))]
            return _format_numbers(nums, el.get("format", "1"))
        doc = ctx.doc
        level = el.get("level", "single")
        count = el.get("count")
        if count is None:
            nd = ctx.node
            if not isinstance(nd, ET.Element):
                raise XsltError("xsl:number without count= needs an "
                                "element context node")
            count = nd.tag
        alts = _anchor_alts(count)
        from_alts = _anchor_alts(el.get("from")) if el.get("from") else None
        matches = lambda n: self._pat_matches(doc, n, alts, ctx.variables)  # noqa: E731
        from_match = (lambda n: self._pat_matches(
            doc, n, from_alts, ctx.variables)) if from_alts else None

        def sib_index(m) -> int:
            parent = doc.parent.get(id(m))
            sibs = [s for s in node_children(doc, parent)
                    if isinstance(s, ET.Element) and matches(s)]
            return next(i + 1 for i, s in enumerate(sibs) if s is m)

        def ancestry(n) -> list:
            chain = []
            cur = n
            while isinstance(cur, ET.Element):
                chain.append(cur)
                cur = doc.parent.get(id(cur))
            return chain  # innermost first

        if level == "single":
            nums = []
            for anc in ancestry(ctx.node):
                if from_match and from_match(anc):
                    break
                if matches(anc):
                    nums = [sib_index(anc)]
                    break
        elif level == "multiple":
            chain = ancestry(ctx.node)
            if from_match:
                kept = []
                for anc in chain:
                    if from_match(anc):
                        break
                    kept.append(anc)
                chain = kept
            nums = [sib_index(a) for a in reversed(chain) if matches(a)]
        elif level == "any":
            # per-doc sorted-key cache + bisect: numbering n nodes costs
            # O(n log n), not n full node-set re-evaluations
            import bisect
            me = doc.sort_key(ctx.node)
            lo = ()
            if from_match:
                # nearest from-match at or before the current node
                for alt in from_alts:
                    ks = self._sorted_match_keys(doc, alt, ctx.variables)
                    i = bisect.bisect_right(ks, me)
                    if i and lo < ks[i - 1] <= me:
                        lo = ks[i - 1]
            keys = set()
            for alt in alts:
                ks = self._sorted_match_keys(doc, alt, ctx.variables)
                a = bisect.bisect_right(ks, lo)
                b = bisect.bisect_right(ks, me)
                keys.update(ks[a:b])
            nums = [len(keys)] if keys else []
        else:
            raise XsltError(f"unsupported xsl:number level {level!r}")
        return _format_numbers(nums, el.get("format", "1"))

    def _run_function(self, fel: ET.Element, ctx: Context,
                      args: list) -> list:
        """Execute an xsl:function body: params bind positionally; the
        result is the SEQUENCE its xsl:sequence instructions (and any
        literal strings) produce."""
        scope = dict(ctx.variables)
        scope.pop("__regex_match__", None)
        pi = 0
        for child in fel:
            if child.tag == _X + "param":
                scope[child.get("name")] = args[pi] if pi < len(args) \
                    else ""
                pi += 1
        fctx = Context(ctx.doc, ctx.node, ctx.position, ctx.size, scope,
                       ctx.functions)
        items: list = []
        self._instantiate(items, fel, fctx, skip_params=True)
        result: list = []
        for it in items:
            if isinstance(it, _SeqVal):
                v = it.value
                result.extend(v if isinstance(v, list) else [v])
            else:
                result.append(it if isinstance(it, str)
                              else string_value(it))
        return result

    @staticmethod
    def _indent_tree(el: ET.Element, level: int = 0) -> None:
        """Xalan-style indent="yes": indent an element's children only
        when it has element children and no non-whitespace text
        (mixed/text content stays inline); three spaces per level."""
        if len(el) == 0 or (el.text or "").strip():
            return
        pad = "\n" + "   " * (level + 1)
        el.text = pad
        for i, c in enumerate(el):
            XsltStylesheet._indent_tree(c, level + 1)
            c.tail = pad if i < len(el) - 1 else "\n" + "   " * level

    def _serialize(self, items: list) -> str:
        if self.output_method == "text":
            return "".join(it if isinstance(it, str)
                           else "".join(it.itertext()) for it in items)
        parts = []
        if self.output_encoding:
            parts.append(f'<?xml version="1.0" '
                         f'encoding="{self.output_encoding}"?>\n')
        for it in items:
            if isinstance(it, str):
                parts.append(_xml_escape(it))
            else:
                if self.output_indent:
                    self._indent_tree(it)
                parts.append(ET.tostring(it, encoding="unicode"))
        if self.output_indent and parts and not parts[-1].endswith("\n"):
            parts.append("\n")      # Xalan ends an indented document
        return "".join(parts)

    def _var_value(self, el: ET.Element, ctx: Context):
        sel = el.get("select")
        if sel is not None:
            return evaluate(sel, ctx)
        items: list = []
        self._instantiate(items, el, ctx)
        # result tree fragment -> string (the common XSLT 1.0 use)
        return "".join(it if isinstance(it, str)
                       else "".join(it.itertext()) for it in items)

    def _sorted(self, nodes: list, sorts: list[ET.Element],
                ctx: Context) -> list:
        if not sorts:
            return nodes
        # stable multi-key sort honouring per-key direction: apply the
        # LAST sort key first, each pass stable.
        for s in reversed(sorts):
            rev = s.get("order", "ascending") == "descending"
            def one_key(nd, s=s):
                sctx = ctx.with_node(nd, 1, 1)
                v = to_string(evaluate(s.get("select", "."), sctx))
                if s.get("data-type", "text") == "number":
                    num = to_number(v)
                    return (0, num) if num == num else (1, v)
                return (0, v)
            nodes = sorted(nodes, key=one_key, reverse=rev)
        return nodes

    def _apply_to(self, out: list, nodes: list,
                  mode: str | None, ctx: Context, params: dict):
        doc = ctx.doc
        size = len(nodes)
        for i, nd in enumerate(nodes):
            t = self._find_template(doc, nd, mode, ctx.variables)
            nctx = ctx.with_node(nd, i + 1, size)
            if t is None:
                self._builtin(out, nd, mode, nctx)
            else:
                self._invoke(out, t, nctx, params)

    def _builtin(self, out: list, nd, mode, ctx: Context):
        if isinstance(nd, (TextNode, AttrNode)):
            out.append(string_value(nd))
        elif isinstance(nd, (Document, ET.Element)):
            kids = node_children(ctx.doc, nd)
            self._apply_to(out, kids, mode, ctx, {})

    def _invoke(self, out: list, t: _Template, ctx: Context,
                params: dict):
        scope = dict(ctx.variables)
        for child in t.body:
            if child.tag == _X + "param":
                name = child.get("name")
                scope[name] = params[name] if name in params else \
                    self._var_value(child, Context(
                        ctx.doc, ctx.node, ctx.position, ctx.size, scope))
        body_ctx = Context(ctx.doc, ctx.node, ctx.position, ctx.size,
                           scope)
        self._tpl_stack.append(t)   # xsl:apply-imports needs the current
        try:                        # template's precedence + mode
            self._instantiate(out, t.body, body_ctx, skip_params=True)
        finally:
            self._tpl_stack.pop()

    def _instantiate(self, out: list, parent: ET.Element, ctx: Context,
                     skip_params: bool = False,
                     owner: ET.Element | None = None):
        # literal text in template bodies is output (whitespace-only
        # text nodes are stripped, as XSLT does for stylesheets)
        if parent.text and parent.text.strip():
            out.append(parent.text)
        for child in parent:
            self._instruction(out, child, ctx, skip_params, owner)
            if child.tail and child.tail.strip():
                out.append(child.tail)

    def _instruction(self, out: list, el: ET.Element, ctx: Context,
                     skip_params: bool,
                     owner: ET.Element | None = None):
        tag = el.tag
        if not tag.startswith(_X):
            self._literal(out, el, ctx)
            return
        local = tag[len(_X):]
        if local == "param" and skip_params:
            return
        if local == "text":
            out.append(el.text or "")
        elif local == "value-of":
            out.append(to_string(evaluate(el.get("select"), ctx)))
        elif local == "apply-templates":
            sel = el.get("select")
            if sel is None:
                nodes = node_children(ctx.doc, ctx.node)
            else:
                v = evaluate(sel, ctx)
                if not isinstance(v, list):
                    raise XsltError("apply-templates select must be a "
                                    "node-set")
                nodes = v
            sorts = [c for c in el if c.tag == _X + "sort"]
            nodes = self._sorted(nodes, sorts, ctx)
            params = self._with_params(el, ctx)
            self._apply_to(out, nodes, el.get("mode"), ctx, params)
        elif local == "call-template":
            name = el.get("name")
            if name not in self.named:
                raise XsltError(f"no named template {name!r}")
            params = self._with_params(el, ctx)
            self._invoke(out, self.named[name], ctx, params)
        elif local == "for-each":
            v = evaluate(el.get("select"), ctx)
            if not isinstance(v, list):
                raise XsltError("for-each select must be a node-set")
            sorts = [c for c in el if c.tag == _X + "sort"]
            v = self._sorted(v, sorts, ctx)
            size = len(v)
            for i, nd in enumerate(v):
                self._instantiate(out, el, ctx.with_node(nd, i + 1, size))
        elif local == "if":
            if to_bool(evaluate(el.get("test"), ctx)):
                self._instantiate(out, el, ctx)
        elif local == "choose":
            for branch in el:
                if branch.tag == _X + "when":
                    if to_bool(evaluate(branch.get("test"), ctx)):
                        self._instantiate(out, branch, ctx)
                        return
                elif branch.tag == _X + "otherwise":
                    self._instantiate(out, branch, ctx)
                    return
        elif local == "element":
            name = _avt(el.get("name"), ctx)
            new = ET.Element(name)
            items: list = []
            self._instantiate(items, el, ctx, owner=new)
            _attach(new, items)
            out.append(new)
        elif local == "attribute":
            name = _avt(el.get("name"), ctx)
            items = []
            self._instantiate(items, el, ctx)
            value = "".join(it if isinstance(it, str)
                            else "".join(it.itertext()) for it in items)
            target = owner if owner is not None else next(
                (o for o in reversed(out)
                 if isinstance(o, ET.Element)), None)
            if target is None:
                raise XsltError("xsl:attribute with no open output "
                                "element")
            target.set(name, value)
        elif local == "copy":
            nd = ctx.node
            if isinstance(nd, ET.Element):
                new = ET.Element(nd.tag)
                items = []
                self._instantiate(items, el, ctx, owner=new)
                _attach(new, items)
                out.append(new)
            elif isinstance(nd, (TextNode, AttrNode)):
                out.append(string_value(nd))
            else:  # document node: just instantiate content
                self._instantiate(out, el, ctx)
        elif local == "copy-of":
            v = evaluate(el.get("select"), ctx)
            if isinstance(v, list):
                for nd in v:
                    if isinstance(nd, ET.Element):
                        out.append(_deep_copy(nd))
                    else:
                        out.append(string_value(nd))
            else:
                out.append(to_string(v))
        elif local == "apply-imports":
            if not self._tpl_stack:
                raise XsltError("xsl:apply-imports outside a template")
            cur = self._tpl_stack[-1]
            t = self._find_template(ctx.doc, ctx.node, cur.mode,
                                    ctx.variables, below_prec=cur.prec)
            if t is None:
                self._builtin(out, ctx.node, cur.mode, ctx)
            else:
                self._invoke(out, t, ctx, {})
        elif local == "sequence":
            out.append(_SeqVal(evaluate(el.get("select"), ctx)))
        elif local == "analyze-string":
            self._analyze_string(out, el, ctx)
        elif local == "function":
            pass  # top-level declaration, registered at load time
        elif local == "number":
            out.append(self._number(el, ctx))
        elif local == "variable":
            ctx.variables[el.get("name")] = self._var_value(el, ctx)
        elif local in ("sort", "with-param", "param"):
            pass  # handled by their parents
        elif local in ("comment", "processing-instruction", "message",
                       "fallback"):
            pass  # no-ops for this engine
        else:
            raise XsltError(f"unsupported instruction xsl:{local}")

    def _analyze_string(self, out: list, el: ET.Element,
                        ctx: Context) -> None:
        """xsl:analyze-string (XSLT 2.0): iterate regex matches over the
        select string; inside xsl:matching-substring the context item is
        the matched substring and regex-group(N) reads its groups."""
        s = to_string(evaluate(el.get("select"), ctx))
        pat = _avt(el.get("regex"), ctx)
        matching = el.find(_X + "matching-substring")
        nonmatching = el.find(_X + "non-matching-substring")

        def run(body, text, m, pos):
            if body is None:
                return
            scope = dict(ctx.variables)
            if m is not None:
                scope["__regex_match__"] = m
            else:
                scope.pop("__regex_match__", None)
            nctx = Context(ctx.doc, text, pos, 1, scope, ctx.functions)
            self._instantiate(out, body, nctx)

        pos = 0
        i = 0
        for m in re.finditer(pat, s):
            if m.start() > pos:
                i += 1
                run(nonmatching, s[pos:m.start()], None, i)
            i += 1
            run(matching, m.group(0), m, i)
            pos = m.end()
        if pos < len(s):
            run(nonmatching, s[pos:], None, i + 1)

    def _with_params(self, el: ET.Element, ctx: Context) -> dict:
        params = {}
        for c in el:
            if c.tag == _X + "with-param":
                params[c.get("name")] = self._var_value(c, ctx)
        return params

    def _alias_tag(self, tag: str) -> str:
        """xsl:namespace-alias: literal result elements/attributes in an
        aliased stylesheet namespace come out in the result namespace."""
        if self.ns_aliases and tag.startswith("{"):
            uri, local = tag[1:].split("}", 1)
            mapped = self.ns_aliases.get(uri)
            if mapped is not None:
                return local if mapped == "" else "{" + mapped + "}" + local
        return tag

    def _literal(self, out: list, el: ET.Element, ctx: Context):
        new = ET.Element(self._alias_tag(el.tag))
        for k, v in el.attrib.items():
            new.set(self._alias_tag(k), _avt(v, ctx))
        items: list = []
        if el.text and el.text.strip():
            items.append(el.text)
        for child in el:
            self._instruction(items, child, ctx, skip_params=False,
                              owner=new)
            if child.tail and child.tail.strip():
                items.append(child.tail)
        _attach(new, items)
        out.append(new)


_NS_DECL_RE = re.compile(r"xmlns(?::([\w.-]+))?\s*=\s*(\"[^\"]*\"|'[^']*')")


def _ns_decls(stylesheet_text: str) -> dict:
    """prefix → uri declarations from the stylesheet SOURCE text.
    ElementTree resolves prefixes away while parsing, but
    xsl:namespace-alias names prefixes — recover the map lexically
    ('' = the default namespace)."""
    return {m.group(1) or "": m.group(2)[1:-1]
            for m in _NS_DECL_RE.finditer(stylesheet_text)}


def _split_subpattern(sub: str, fmt: dict) -> tuple[str, str, str]:
    """A JDK-DecimalFormat subpattern → (prefix, numeric-body, suffix).
    Quoted sections ('...') in affixes are literal."""
    digit = fmt.get("digit", "#")
    zero = fmt.get("zero-digit", "0")
    dec = fmt.get("decimal-separator", ".")
    grp = fmt.get("grouping-separator", ",")
    numeric = {digit, zero, dec, grp}
    i, n = 0, len(sub)
    while i < n and sub[i] not in numeric:
        if sub[i] == "'":                     # quoted literal section
            close = sub.find("'", i + 1)
            if close < 0:
                raise XsltError(f"unterminated quote in pattern {sub!r}")
            i = close + 1
        else:
            i += 1
    j = i
    while j < n and sub[j] in numeric:
        j += 1
    return sub[:i], sub[i:j], sub[j:]


def _strip_quotes(affix: str) -> str:
    return affix.replace("''", "\x00").replace("'", "").replace("\x00", "'")


def _format_decimal(v: float, pattern: str, fmt: dict) -> str:
    """format-number(): the JDK DecimalFormat subset XSLT 1.0 specifies —
    #/0 digits, grouping, min/max fraction digits, percent/per-mille
    multipliers, a negative subpattern supplying prefix/suffix, and the
    xsl:decimal-format character overrides. Rounding is HALF_EVEN on the
    double's exact decimal expansion, as DecimalFormat does."""
    from decimal import ROUND_HALF_EVEN, Decimal

    if v != v:
        return fmt.get("NaN", "NaN")
    dec = fmt.get("decimal-separator", ".")
    grp = fmt.get("grouping-separator", ",")
    zero = fmt.get("zero-digit", "0")
    pat_sep = fmt.get("pattern-separator", ";")
    minus = fmt.get("minus-sign", "-")
    subs = pattern.split(pat_sep)
    pos_pre, body, pos_suf = _split_subpattern(subs[0], fmt)
    if v < 0 and len(subs) > 1:
        neg_pre, _, neg_suf = _split_subpattern(subs[1], fmt)
    elif v < 0:
        neg_pre, neg_suf = minus + pos_pre, pos_suf
    else:
        neg_pre, neg_suf = pos_pre, pos_suf
    prefix, suffix = (neg_pre, neg_suf) if v < 0 else (pos_pre, pos_suf)
    mult = 1
    percent, permille = fmt.get("percent", "%"), fmt.get("per-mille",
                                                         "‰")
    if percent in prefix + suffix:
        mult = 100
    elif permille in prefix + suffix:
        mult = 1000
    int_pat, _, frac_pat = body.partition(dec)
    min_int = int_pat.count(zero) or (0 if frac_pat else 1)
    min_frac = frac_pat.count(zero)
    max_frac = len(frac_pat)
    g = len(int_pat) - int_pat.rfind(grp) - 1 if grp in int_pat else 0
    if abs(v) == float("inf"):
        digits, frac = fmt.get("infinity", "Infinity"), ""
        return prefix + digits + suffix
    q = (Decimal(abs(v)) * mult).quantize(
        Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_EVEN)
    s = f"{q:f}"
    int_digits, _, frac_digits = s.partition(".")
    frac_digits = frac_digits[:max_frac].rstrip("0")
    frac_digits += "0" * (min_frac - len(frac_digits))
    int_digits = int_digits.rjust(min_int, "0")
    if g > 0 and len(int_digits) > g:
        chunks = []
        while len(int_digits) > g:
            chunks.append(int_digits[-g:])
            int_digits = int_digits[:-g]
        chunks.append(int_digits)
        int_digits = grp.join(reversed(chunks))
    if zero != "0":
        trans = str.maketrans("0123456789",
                              "".join(chr(ord(zero) + d)
                                      for d in range(10)))
        int_digits = int_digits.translate(trans)
        frac_digits = frac_digits.translate(trans)
    num = int_digits + (dec + frac_digits if frac_digits else "")
    return _strip_quotes(prefix) + num + _strip_quotes(suffix)


def _to_roman(n: int) -> str:
    pairs = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"),
             (100, "c"), (90, "xc"), (50, "l"), (40, "xl"), (10, "x"),
             (9, "ix"), (5, "v"), (4, "iv"), (1, "i")]
    out = []
    for v, s in pairs:
        while n >= v:
            out.append(s)
            n -= v
    return "".join(out) or "0"


def _to_alpha(n: int) -> str:
    out = []
    while n > 0:
        n, r = divmod(n - 1, 26)
        out.append(chr(ord("a") + r))
    return "".join(reversed(out)) or "0"


def _format_one(n: int, token: str) -> str:
    if token and token[-1] == "1":
        return str(n).rjust(len(token), "0")   # "01" zero-pads to width
    if token == "a":
        return _to_alpha(n)
    if token == "A":
        return _to_alpha(n).upper()
    if token == "i":
        return _to_roman(n)
    if token == "I":
        return _to_roman(n).upper()
    return str(n)


def _format_numbers(nums: list[int], fmt: str) -> str:
    """XSLT 1.0 §7.7 number formatting: the format string alternates
    separators and format tokens (1/01/a/A/i/I); extra numbers reuse
    the last token with the last separator (default '.')."""
    parts = re.findall(r"[0-9A-Za-z]+|[^0-9A-Za-z]+", fmt) or ["1"]
    prefix = parts.pop(0) if parts and not parts[0].isalnum() else ""
    suffix = parts.pop() if parts and not parts[-1].isalnum() else ""
    tokens = [p for p in parts if p.isalnum()]
    seps = [p for p in parts if not p.isalnum()]
    out = [prefix]
    for i, n in enumerate(nums):
        if i > 0:
            out.append(seps[i - 1] if i - 1 < len(seps)
                       else (seps[-1] if seps else "."))
        tok = tokens[i] if i < len(tokens) else (tokens[-1]
                                                 if tokens else "1")
        out.append(_format_one(n, tok))
    out.append(suffix)
    return "".join(out)


def _attach(parent: ET.Element, items: list):
    """Attach a mixed string/element item list as parent's content."""
    for it in items:
        if isinstance(it, _SeqVal):        # xsl:sequence in tree context
            it = to_string(it.value)
        if isinstance(it, ET.Element):
            parent.append(it)
        else:
            if len(parent):
                parent[-1].tail = (parent[-1].tail or "") + it
            else:
                parent.text = (parent.text or "") + it


def _deep_copy(el: ET.Element) -> ET.Element:
    new = ET.Element(el.tag, dict(el.attrib))
    new.text, new.tail = el.text, None
    for c in el:
        cc = _deep_copy(c)
        cc.tail = c.tail
        new.append(cc)
    return new


def _node_key(node):
    """Identity key matching xpath1's dedup convention: elements by
    id, attribute/text wrappers by (owner, name/slot) so equal
    wrapper instances compare equal."""
    if isinstance(node, AttrNode):
        return (id(node.owner), "a", node.name)
    if isinstance(node, TextNode):
        return (id(node.parent), "t", node.slot)
    return id(node)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def xslt_transform(xml_text: str, stylesheet: XsltStylesheet,
                   params: dict | None = None) -> str | None:
    """Apply a compiled stylesheet; malformed input -> None."""
    try:
        return stylesheet.apply(xml_text, params=params)
    except ET.ParseError:
        return None
