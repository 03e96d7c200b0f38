"""NiFi Expression Language STRING compiler → Catalyst Columns.

NiFi flows carry EL as strings in property values —
``${path:substringAfterLast('/'):toUpper()}`` — compiled once by
Query.compile (nifi-commons/nifi-expression-language/.../Query.java:224,
434; grammar in antlr3/.../AttributeExpressionParser.g) and evaluated
per FlowFile. This module is that front-end for the Spark engine: the
same strings compile ONCE (driver-side recursive descent, ~free) into
Column expression trees over the EL function namespace (el.py), so a
property value from a real NiFi flow definition drops in unchanged and
runs codegen'd/vectorized instead of interpreted per row.

Supported grammar (the overwhelmingly common subset):

  template   := (text | '$$' | expression)*      # $$ escapes a literal $
  expression := '${' subject (':' call)* '}'
  subject    := attrName | 'quoted attr name' | call   # call = subjectless
  call       := fnName '(' [arg (',' arg)*] ')'

  arg        := 'string' | "string" | number | true | false | expression

Function names resolve against EL (NiFi-spelled aliases included), so
every mapped function chains, and arguments may themselves be nested
expressions (``${a:equals(${b})}``) — the EL namespace passes Column
arguments through. Not implemented (raise cleanly): the multi-attribute
fold forms (anyAttribute/allMatchingAttributes — they need the
DataFrame, use the EL namespace directly).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from nifi_spark.functions.el import EL


class ELSyntaxError(ValueError):
    pass


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch: str):
        if self.peek() != ch:
            raise ELSyntaxError(
                f"expected {ch!r} at offset {self.i} in {self.s!r}")
        self.i += 1

    def ws(self):
        while self.peek().isspace():
            self.i += 1

    def ident(self) -> str:
        j = self.i
        # NB: the explicit truthiness guard matters — peek() returns ""
        # at end of input and `"" in "_.-"` is True (empty substring),
        # which would loop forever on truncated input like "${path"
        while self.peek() and (self.peek().isalnum()
                               or self.peek() in "_.-"):
            self.i += 1
        if j == self.i:
            raise ELSyntaxError(
                f"expected identifier at offset {j} in {self.s!r}")
        return self.s[j:self.i]

    def quoted(self) -> str:
        q = self.peek()
        self.eat(q)
        out = []
        while True:
            ch = self.peek()
            if ch == "":
                raise ELSyntaxError(f"unterminated string in {self.s!r}")
            self.i += 1
            if ch == "\\" and self.peek() in (q, "\\"):
                out.append(self.peek())
                self.i += 1
            elif ch == q:
                return "".join(out)
            else:
                out.append(ch)

    def literal_arg(self):
        self.ws()
        ch = self.peek()
        if ch in "'\"":
            return self.quoted()
        if self.s.startswith("${", self.i):
            # nested expression argument: ${a:equals(${b})} — the EL
            # namespace passes Column args through (F.lit is a
            # passthrough for Columns), so the compiled Column slots in
            # wherever a literal would
            return self.expression()
        j = self.i
        while self.peek() not in (",", ")", "") and not self.peek().isspace():
            self.i += 1
        tok = self.s[j:self.i]
        if tok == "true":
            return True
        if tok == "false":
            return False
        try:
            return int(tok)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            raise ELSyntaxError(
                f"unsupported argument {tok!r} in {self.s!r}")

    def call_args(self) -> list:
        self.eat("(")
        self.ws()
        args = []
        if self.peek() == ")":
            self.eat(")")
            return args
        while True:
            args.append(self.literal_arg())
            self.ws()
            if self.peek() == ",":
                self.eat(",")
                continue
            self.eat(")")
            return args

    def expression(self) -> Column:
        self.eat("$")
        self.eat("{")
        self.ws()
        if self.peek() in "'\"":
            col = _attr(self.quoted())
        else:
            name = self.ident()
            self.ws()
            if self.peek() == "(":           # subjectless: ${uuid()}
                col = _fn(name)(*self.call_args())
            else:
                col = _attr(name)
        self.ws()
        while self.peek() == ":":
            self.eat(":")
            self.ws()
            fn = self.ident()
            self.ws()
            args = self.call_args() if self.peek() == "(" else []
            col = _fn(fn)(col, *args)
            self.ws()
        self.eat("}")
        return col


def _attr(name: str) -> Column:
    """An EL subject is the attribute NAMED `name` — in NiFi,
    ``${http.remote.host}`` is one flat attribute, never nesting. Plain
    F.col treats dots as struct-field access, so names are
    backtick-quoted (doubled-backtick escape); for dot-free names the
    resulting expression tree is identical."""
    return F.col("`" + name.replace("`", "``") + "`")


_UNSUPPORTED = {"anyAttribute", "allAttributes", "anyMatchingAttribute",
                "allMatchingAttributes", "anyDelineatedValue",
                "allDelineatedValues"}


_KEYWORD_FNS = {"not": "not_", "and": "and_", "or": "or_"}


def _fn(name: str):
    name = _KEYWORD_FNS.get(name, name)
    if name in _UNSUPPORTED:
        raise ELSyntaxError(
            f"{name} needs the whole row/DataFrame — use the EL "
            "namespace directly (EL." + name + ")")
    f = getattr(EL, name, None)
    if f is None:
        raise ELSyntaxError(f"unknown EL function {name!r}")
    return f


def compile_el(expr: str) -> Column:
    """Compile one ``${...}`` expression string to a Column."""
    p = _P(expr.strip())
    col = p.expression()
    p.ws()
    if p.i != len(p.s):
        raise ELSyntaxError(f"trailing input at offset {p.i} in {expr!r}")
    return col


def compile_template(s: str) -> Column:
    """Compile a property value mixing text and expressions.

    A pure single expression keeps its native type; anything mixed
    concatenates as string (NiFi's behavior for composite values).
    ``$$`` produces a literal ``$``.
    """
    parts: list[tuple[str, object]] = []   # ("text", str) | ("expr", Column)
    buf: list[str] = []
    i = 0
    while i < len(s):
        if s.startswith("$$", i):
            buf.append("$")
            i += 2
        elif s.startswith("${", i):
            if buf:
                parts.append(("text", "".join(buf)))
                buf = []
            p = _P(s)
            p.i = i
            parts.append(("expr", p.expression()))
            i = p.i
        else:
            buf.append(s[i])
            i += 1
    if buf:
        parts.append(("text", "".join(buf)))
    if len(parts) == 1 and parts[0][0] == "expr":
        return parts[0][1]
    cols = [F.lit(v) if kind == "text" else v.cast("string")
            for kind, v in parts]
    return F.concat(*cols) if cols else F.lit("")
