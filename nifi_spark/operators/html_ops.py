"""HTML element extraction/modification: Get/Modify/PutHTMLElement.

Reference: nifi-html-bundle — GetHTMLElement.java (CSS selector → one
flowfile per match, output = element HTML | text | a named attribute,
success / not-found routing), ModifyHTMLElement.java (set text or an
attribute on every match), PutHTMLElement.java (append markup inside the
match). The reference uses jsoup; here a tolerant stdlib
``html.parser.HTMLParser`` DOM plus a CSS selector subset that covers
the reference's own test surface:

    tag   *   #id   .class   tag.class   [attr]   [attr=value]
    descendant (``a b``), child (``a > b``), and comma groups.

All Spark entry points are Arrow-batched ``mapInPandas`` — the document
is the unit of parallelism (the codec-seam contract); selector syntax
errors raise driver-side at operator construction, matching the
reference's validator rather than its per-flowfile failure route.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

VOID_ELEMENTS = {"area", "base", "br", "col", "embed", "hr", "img",
                 "input", "link", "meta", "param", "source", "track",
                 "wbr"}


class HtmlNode:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []          # HtmlNode | str
        self.parent = parent

    # ---- accessors ---------------------------------------------------
    def text(self) -> str:
        out = []
        for c in self.children:
            out.append(c if isinstance(c, str) else c.text())
        return "".join(out)

    def inner_html(self) -> str:
        return "".join(escape(c, quote=False) if isinstance(c, str)
                       else c.outer_html() for c in self.children)

    def outer_html(self) -> str:
        attrs = "".join(f' {k}="{escape(v or "", quote=True)}"'
                        for k, v in self.attrs.items())
        if self.tag in VOID_ELEMENTS:
            return f"<{self.tag}{attrs}>"
        return f"<{self.tag}{attrs}>{self.inner_html()}</{self.tag}>"

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, HtmlNode):
                yield from c.iter()


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = HtmlNode("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = HtmlNode(tag, {k: (v if v is not None else "")
                              for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = HtmlNode(tag, {k: (v if v is not None else "")
                              for k, v in attrs}, self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:   # tolerant: pop to match
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> HtmlNode:
    b = _DomBuilder()
    b.feed(text)
    b.close()
    return b.root


# ------------------------------------------------------------- selectors

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[\w-]+|\*)?"
    r"(?P<id>#[\w.:-]+)?"
    r"(?P<cls>(?:\.[\w-]+)+)?"
    r"(?P<attr>\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\])?$")


def _parse_simple(sel: str):
    m = _SIMPLE_RE.match(sel)
    if not m or not sel:
        raise ValueError(f"unsupported CSS selector part {sel!r}")
    tag = m.group("tag")
    nid = m.group("id")[1:] if m.group("id") else None
    classes = m.group("cls")[1:].split(".") if m.group("cls") else []
    attr = None
    if m.group("attr"):
        body = m.group("attr")[1:-1]
        name, eq, val = body.partition("=")
        if eq:
            val = val.strip("\"'")
            attr = (name, val)
        else:
            attr = (name, None)
    return tag, nid, classes, attr


def _matches(node: HtmlNode, simple) -> bool:
    tag, nid, classes, attr = simple
    if tag and tag != "*" and node.tag != tag:
        return False
    if nid and node.attrs.get("id") != nid:
        return False
    for c in classes:
        if c not in (node.attrs.get("class") or "").split():
            return False
    if attr:
        name, val = attr
        if name not in node.attrs:
            return False
        if val is not None and node.attrs.get(name) != val:
            return False
    return True


def compile_selector(selector: str):
    """selector -> list of alternatives, each a list of
    (combinator, simple) with combinator in {' ', '>'}."""
    alts = []
    for group in selector.split(","):
        group = group.strip()
        if not group:
            raise ValueError("empty selector group")
        toks = re.split(r"\s*(>)\s*|\s+", group)
        chain = []
        comb = " "
        for t in toks:
            if t is None or t == "":
                continue
            if t == ">":
                comb = ">"
                continue
            chain.append((comb, _parse_simple(t)))
            comb = " "
        alts.append(chain)
    return alts


def _chain_matches(node: HtmlNode, chain) -> bool:
    """chain[i] = (combinator-to-the-left-of-simple-i, simple-i); the
    last simple must match `node`, earlier ones its ancestors."""
    if not _matches(node, chain[-1][1]):
        return False
    cur = node
    for i in range(len(chain) - 1, 0, -1):
        comb = chain[i][0]           # combinator between i-1 and i
        want = chain[i - 1][1]
        anc = cur.parent
        if comb == ">":
            if anc is None or anc.tag == "#root" or not _matches(anc, want):
                return False
            cur = anc
        else:                        # descendant: any matching ancestor
            while anc is not None and anc.tag != "#root" \
                    and not _matches(anc, want):
                anc = anc.parent
            if anc is None or anc.tag == "#root":
                return False
            cur = anc
    return True


def select(root: HtmlNode, selector) -> list[HtmlNode]:
    alts = compile_selector(selector) if isinstance(selector, str) \
        else selector
    out = []
    for node in root.iter():
        if node.tag == "#root":
            continue
        if any(_chain_matches(node, chain) for chain in alts):
            out.append(node)
    return out


# ------------------------------------------------------------- operators

def get_html_element(df: DataFrame, content_col: str, selector: str,
                     output: str = "html", attr: str | None = None,
                     id_col: str | None = None) -> DataFrame:
    """One row per CSS match: (id, relationship, match_idx, value).
    output: html | text | attr (with `attr` naming the attribute).
    Documents with no match emit one relationship='not_found' row."""
    compile_selector(selector)          # validate driver-side
    if output == "attr" and not attr:
        raise ValueError("output='attr' requires attr=")
    id_col = id_col or next(c for c in df.columns if c != content_col)
    cols = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(content_col).alias("_c"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for rid, txt in zip(pdf["id"], pdf["_c"]):
                rid = int(rid)
                nodes = select(parse_html(str(txt)), selector)
                if not nodes:
                    rows.append((rid, "not_found", None, None))
                    continue
                for i, n in enumerate(nodes):
                    v = (n.outer_html() if output == "html"
                         else n.text() if output == "text"
                         else n.attrs.get(attr))
                    rows.append((rid, "success", i, v))
            yield pd.DataFrame(rows, columns=["id", "relationship",
                                              "match_idx", "value"])

    return cols.mapInPandas(
        run, schema="id long, relationship string, match_idx int, "
                    "value string")


def modify_html_element(df: DataFrame, content_col: str, selector: str,
                        mod: str, value: str,
                        attr: str | None = None) -> DataFrame:
    """ModifyHTMLElement: for every match set the text (mod='text') or
    an attribute (mod='attr', with `attr`); returns df with the content
    column re-serialized."""
    compile_selector(selector)
    if mod == "attr" and not attr:
        raise ValueError("mod='attr' requires attr=")
    out_cols = df.columns

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            vals = []
            for txt in pdf[content_col]:
                root = parse_html(str(txt))
                for n in select(root, selector):
                    if mod == "text":
                        n.children = [value]
                    elif mod == "attr":
                        n.attrs[attr] = value
                    else:
                        raise ValueError(f"unknown mod {mod!r}")
                vals.append(root.inner_html())
            pdf = pdf.copy()
            pdf[content_col] = vals
            yield pdf[out_cols]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(run, schema=schema)


def put_html_element(df: DataFrame, content_col: str, selector: str,
                     markup: str) -> DataFrame:
    """PutHTMLElement: append the given markup inside every match."""
    compile_selector(selector)
    out_cols = df.columns

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            vals = []
            for txt in pdf[content_col]:
                root = parse_html(str(txt))
                for n in select(root, selector):
                    frag = parse_html(markup)
                    n.children.extend(frag.children)
                vals.append(root.inner_html())
            pdf = pdf.copy()
            pdf[content_col] = vals
            yield pdf[out_cols]

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    return df.mapInPandas(run, schema=schema)
