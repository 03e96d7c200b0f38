"""NiFi Expression Language → Spark Column functions.

NiFi EL is an ANTLR3-compiled per-row expression interpreter over the
attribute map (nifi-commons/nifi-expression-language/src/main/antlr3/.../
AttributeExpressionLexer.g; Query.compile, Query.java:224,434; 64 function
evaluators under evaluation/functions/). In this engine the entire
subsystem is Catalyst: every EL function maps to a built-in
pyspark.sql.functions expression (parsed once, codegen'd, vectorized) —
see SURVEY.md §2.9 for the full lexer-line-cited table.

`EL` exposes the mapping as a namespace so pipelines written against NiFi
function names read naturally:  EL.substringAfterLast(c, '/').
"""

from __future__ import annotations

import re
from html.entities import codepoint2name

import pandas as pd  # module-level: future-annotations stringizes UDF hints

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# HTML entity tables (CharSequenceTranslatorEvaluator.java:42-66 →
# commons-lang3 StringEscapeUtils ESCAPE/UNESCAPE_HTML3/4). The stdlib
# html.entities table IS the HTML 4.01 set those translators use: 4 basic
# (quot/amp/lt/gt — no apos) + 96 ISO-8859-1 + 152 extended = 252.
# HTML3 = basic + ISO-8859-1 only; both unescapes also take numeric
# character references (&#d; / &#xH;, semicolon required, unknown names
# left intact — NumericEntityUnescaper defaults).
_HTML4_ESCAPE = {cp: f"&{name};" for cp, name in codepoint2name.items()}
_HTML3_ESCAPE = {cp: e for cp, e in _HTML4_ESCAPE.items()
                 if cp in (34, 38, 60, 62) or 160 <= cp <= 255}
_HTML4_NAMES = {name: chr(cp) for cp, name in codepoint2name.items()}
_HTML3_NAMES = {name: chr(cp) for cp, name in codepoint2name.items()
                if cp in (34, 38, 60, 62) or 160 <= cp <= 255}
_ENTITY_RE = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|[A-Za-z][A-Za-z0-9]*);")


def unescape_html(s: str, names: dict | None = None) -> str:
    """Single-pass HTML unescape (the lookup-translator contract: no
    re-scanning of produced text, so '&amp;lt;' → '&lt;', not '<')."""
    table = _HTML4_NAMES if names is None else names

    def rep(m):
        t = m.group(1)
        if t[0] == "#":
            v = int(t[2:], 16) if t[1] in "xX" else int(t[1:])
            return chr(v) if v <= 0x10FFFF else m.group(0)
        return table.get(t, m.group(0))

    return _ENTITY_RE.sub(rep, s)


def unescape_csv(s: str) -> str:
    """commons-lang3 CsvUnescaper: only a fully quoted value whose body
    contains a CSV special char (, \" CR LF) is unquoted + un-doubled;
    everything else returns unchanged."""
    if len(s) < 2 or s[0] != '"' or s[-1] != '"':
        return s
    inner = s[1:-1]
    if any(ch in inner for ch in ',"\r\n'):
        return inner.replace('""', '"')
    return s


_HTML_UDFS: dict = {}


def _html_udf(kind: str):
    """pandas_udf creation parses the return type against the ACTIVE
    session, so these are built lazily on first call, not at import."""
    if kind not in _HTML_UDFS:
        fns = {
            "esc4": lambda s: s.str.translate(_HTML4_ESCAPE),
            "esc3": lambda s: s.str.translate(_HTML3_ESCAPE),
            "un4": lambda s: s.map(
                lambda v: v if v is None else unescape_html(v, _HTML4_NAMES)),
            "un3": lambda s: s.map(
                lambda v: v if v is None else unescape_html(v, _HTML3_NAMES)),
            "uncsv": lambda s: s.map(
                lambda v: v if v is None else unescape_csv(v)),
        }
        fn = fns[kind]

        def _batch(s: pd.Series) -> pd.Series:
            return fn(s)

        _HTML_UDFS[kind] = F.pandas_udf(_batch, "string")
    return _HTML_UDFS[kind]


class EL:
    # string functions (AttributeExpressionLexer.g:112-151)
    @staticmethod
    def toUpper(c): return F.upper(_c(c))
    @staticmethod
    def toLower(c): return F.lower(_c(c))
    @staticmethod
    def trim(c): return F.trim(_c(c))
    @staticmethod
    def length(c): return F.length(_c(c))
    @staticmethod
    def substring(c, start, end=None):
        col = _c(c)
        return F.substring(col, start + 1, (end - start) if end else 1 << 30)
    @staticmethod
    def substringBefore(c, sep): return F.substring_index(_c(c), sep, 1)
    @staticmethod
    def substringAfter(c, sep):
        # NiFi parity: when the separator is absent the ORIGINAL subject is
        # returned (SubstringAfterEvaluator.java:48-50), matching
        # substringBefore's substring_index behavior.
        col = _c(c)
        pos = F.locate(sep, col)
        return F.when(pos > 0,
                      F.substring(col, pos + len(sep), 1 << 30)).otherwise(col)
    @staticmethod
    def substringAfterLast(c, sep): return F.substring_index(_c(c), sep, -1)
    @staticmethod
    def startsWith(c, s): return F.startswith(_c(c), F.lit(s))
    @staticmethod
    def endsWith(c, s): return F.endswith(_c(c), F.lit(s))
    @staticmethod
    def contains(c, s): return F.contains(_c(c), F.lit(s))
    @staticmethod
    def isIn(c, *vals): return _c(c).isin(*vals)

    @staticmethod
    def indexOf(c, s):
        # NiFi is 0-based with -1 absent; instr is 1-based with 0 absent
        return F.instr(_c(c), s) - 1
    @staticmethod
    def lastIndexOf(c, s):
        col = _c(c)
        pos = (F.length(col) - F.length(F.substring_index(col, s, -1))
               - len(s))
        return F.when(F.contains(col, F.lit(s)), pos).otherwise(-1)
    @staticmethod
    def append(c, s): return F.concat(_c(c), F.lit(s))
    @staticmethod
    def prepend(c, s): return F.concat(F.lit(s), _c(c))
    @staticmethod
    def padLeft(c, size, pad=" "): return F.lpad(_c(c), size, pad)
    @staticmethod
    def padRight(c, size, pad=" "): return F.rpad(_c(c), size, pad)

    # comparison (lexer :156-161)
    @staticmethod
    def equals(c, v): return _c(c) == v
    @staticmethod
    def equalsIgnoreCase(c, v):
        return F.lower(_c(c)) == F.lower(F.lit(v) if isinstance(v, str)
                                         else _c(v))
    @staticmethod
    def gt(c, v): return _c(c) > v
    @staticmethod
    def ge(c, v): return _c(c) >= v
    @staticmethod
    def lt(c, v): return _c(c) < v
    @staticmethod
    def le(c, v): return _c(c) <= v

    # arithmetic (lexer :120-121, 164-167)
    @staticmethod
    def plus(c, v): return _c(c) + v
    @staticmethod
    def minus(c, v): return _c(c) - v
    @staticmethod
    def multiply(c, v): return _c(c) * v
    @staticmethod
    def divide(c, v): return _c(c) / v

    # regex (lexer :154-155, 180-182)
    @staticmethod
    def matches(c, pattern): return _c(c).rlike(pattern)
    @staticmethod
    def find(c, pattern): return F.regexp_extract(_c(c), pattern, 0) != ""
    @staticmethod
    def replace(c, search, repl):
        return F.replace(_c(c), F.lit(search), F.lit(repl))
    @staticmethod
    def replaceFirst(c, pattern, repl):
        """First-occurrence regex replace with a LITERAL replacement
        (split-limit shape; capture-group references in `repl` are not
        supported — use replaceAll for those)."""
        col = _c(c)
        parts = F.split(col, pattern, 2)
        return F.when(F.size(parts) == 2,
                      F.concat(parts[0], F.lit(repl), parts[1])) \
                .otherwise(col)
    @staticmethod
    def replaceAll(c, pattern, repl): return F.regexp_replace(_c(c), pattern, repl)

    # escaping (lexer :122-134)
    @staticmethod
    def escapeJson(c):
        col = F.regexp_replace(_c(c), r"\\", r"\\\\")
        col = F.regexp_replace(col, '"', '\\\\"')
        col = F.regexp_replace(col, "\n", "\\\\n")
        col = F.regexp_replace(col, "\r", "\\\\r")
        return F.regexp_replace(col, "\t", "\\\\t")
    @staticmethod
    def unescapeJson(c):
        # a JSON-quoted string is valid JSON; let the JSON parser unescape
        return F.get_json_object(F.concat(F.lit('"'), _c(c), F.lit('"')),
                                 "$")
    @staticmethod
    def escapeXml(c):
        col = F.replace(_c(c), F.lit("&"), F.lit("&amp;"))
        col = F.replace(col, F.lit("<"), F.lit("&lt;"))
        col = F.replace(col, F.lit(">"), F.lit("&gt;"))
        col = F.replace(col, F.lit('"'), F.lit("&quot;"))
        return F.replace(col, F.lit("'"), F.lit("&apos;"))
    @staticmethod
    def unescapeXml(c):
        col = F.replace(_c(c), F.lit("&lt;"), F.lit("<"))
        col = F.replace(col, F.lit("&gt;"), F.lit(">"))
        col = F.replace(col, F.lit("&quot;"), F.lit('"'))
        col = F.replace(col, F.lit("&apos;"), F.lit("'"))
        return F.replace(col, F.lit("&amp;"), F.lit("&"))
    @staticmethod
    def escapeCsv(c):
        # CSV_SEARCH_CHARS = {',', '"', CR, LF} (commons CsvEscaper)
        col = _c(c)
        needs = (F.contains(col, F.lit(",")) | F.contains(col, F.lit('"'))
                 | F.contains(col, F.lit("\n")) | F.contains(col, F.lit("\r")))
        quoted = F.concat(F.lit('"'),
                          F.replace(col, F.lit('"'), F.lit('""')),
                          F.lit('"'))
        return F.when(needs, quoted).otherwise(col)

    # HTML 3.2/4.0 entity family (CharSequenceTranslatorEvaluator.java:
    # 42-66). The 252-entity table as a chained-replace Column would be a
    # 252-deep expression tree past the codegen method limit, so these
    # five are Arrow-batched pandas UDFs over the module-level tables —
    # the only EL functions not expressed as built-in Catalyst
    # expressions (same seam as datalib.text.normalize_text).
    @staticmethod
    def escapeHtml4(c): return _html_udf("esc4")(_c(c))
    @staticmethod
    def escapeHtml3(c): return _html_udf("esc3")(_c(c))
    @staticmethod
    def unescapeHtml4(c): return _html_udf("un4")(_c(c))
    @staticmethod
    def unescapeHtml3(c): return _html_udf("un3")(_c(c))
    @staticmethod
    def unescapeCsv(c): return _html_udf("uncsv")(_c(c))

    # delineated / multi-attribute folds (lexer :96-101, 174)
    @staticmethod
    def anyDelineatedValue(c, delim, pred):
        return F.exists(F.split(_c(c), delim), pred)
    @staticmethod
    def allDelineatedValues(c, delim, pred):
        return F.forall(F.split(_c(c), delim), pred)
    @staticmethod
    def anyAttribute(pred, *cols):
        out = None
        for c in cols:
            term = pred(_c(c))
            out = term if out is None else (out | term)
        return out
    @staticmethod
    def allAttributes(pred, *cols):
        out = None
        for c in cols:
            term = pred(_c(c))
            out = term if out is None else (out & term)
        return out

    # name-regex folds (AnyMatchingAttributeEvaluator.java /
    # AllMatchingAttributesEvaluator.java; lexer :98-99). NiFi resolves
    # the attribute-name regex against the FlowFile's attribute map at
    # eval time; our analog resolves it against df.columns at plan time,
    # then folds like any/allAttributes.
    @staticmethod
    def anyMatchingAttribute(df, name_regex, pred):
        cols = [c for c in df.columns if re.fullmatch(name_regex, c)]
        if not cols:
            return F.lit(False)
        return EL.anyAttribute(pred, *cols)

    @staticmethod
    def allMatchingAttributes(df, name_regex, pred):
        cols = [c for c in df.columns if re.fullmatch(name_regex, c)]
        if not cols:
            return F.lit(False)
        return EL.allAttributes(pred, *cols)

    # null handling (lexer :117-119, 152-153)
    @staticmethod
    def isNull(c): return _c(c).isNull()
    @staticmethod
    def notNull(c): return _c(c).isNotNull()
    @staticmethod
    def isEmpty(c): return F.coalesce(F.length(F.trim(_c(c))), F.lit(0)) == 0
    @staticmethod
    def replaceNull(c, v): return F.coalesce(_c(c), F.lit(v))
    @staticmethod
    def replaceEmpty(c, v):
        col = _c(c)
        return F.when(F.coalesce(F.length(F.trim(col)), F.lit(0)) == 0, v).otherwise(col)

    # numeric / radix (lexer :120-121, 164-171)
    @staticmethod
    def toNumber(c): return _c(c).cast("long")
    @staticmethod
    def toDecimal(c): return _c(c).cast("double")
    @staticmethod
    def mod(c, n): return _c(c) % n
    @staticmethod
    def toRadix(c, radix): return F.conv(_c(c).cast("string"), 10, radix)
    @staticmethod
    def fromRadix(c, radix): return F.conv(_c(c), radix, 10).cast("long")

    # date/time (lexer :108, 162-163)
    @staticmethod
    def formatDate(c, fmt): return F.date_format(_c(c), fmt)
    @staticmethod
    def toDate(c, fmt): return F.to_timestamp(_c(c), fmt)
    @staticmethod
    def now(): return F.current_timestamp()

    # json / delimited (lexer :174-176, 185)
    @staticmethod
    def jsonPath(c, path): return F.get_json_object(_c(c), path)
    @staticmethod
    def getDelimitedField(c, index, sep=","):
        return F.split(_c(c), sep).getItem(index - 1)  # EL is 1-based
    @staticmethod
    def join(sep, *cols): return F.concat_ws(sep, *[_c(c) for c in cols])

    # identity / misc (lexer :104-107, 125-126)
    @staticmethod
    def literal(v): return F.lit(v)
    @staticmethod
    def hostname():
        import socket
        return F.lit(socket.gethostname())
    @staticmethod
    def ip():
        import socket
        try:
            return F.lit(socket.gethostbyname(socket.gethostname()))
        except OSError:
            return F.lit("127.0.0.1")
    @staticmethod
    def nextInt(): return F.monotonically_increasing_id()
    @staticmethod
    def random(): return (F.rand() * (1 << 62)).cast("long")
    @staticmethod
    def uuid(): return F.uuid()
    @staticmethod
    def hash(c, alg="sha256"):
        return F.sha2(_c(c), 256) if alg == "sha256" else F.md5(_c(c))
    @staticmethod
    def urlEncode(c): return F.url_encode(_c(c))
    @staticmethod
    def urlDecode(c): return F.url_decode(_c(c))

    # boolean combinators (lexer :124,172-173; AndEvaluator/OrEvaluator/
    # NotEvaluator.java) — thin wrappers so EL-style call chains read as
    # EL.and_(a, b) without importing Column operators
    @staticmethod
    def and_(*preds):
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    @staticmethod
    def or_(*preds):
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out
    @staticmethod
    def not_(pred): return ~pred

    # attribute access + conversion (AttributeEvaluator.java,
    # ToStringEvaluator.java, NumberToDateEvaluator.java)
    @staticmethod
    def attribute(name): return F.col(name)
    @staticmethod
    def toString(c): return _c(c).cast("string")
    @staticmethod
    def numberToDate(c):
        # NiFi: epoch millis → Date (NumberToDateEvaluator.java)
        return F.timestamp_millis(_c(c).cast("long"))

    # base64 over attribute strings (Base64EncodeEvaluator/
    # Base64DecodeEvaluator.java; content-column codecs live in
    # operators/codec.py)
    @staticmethod
    def base64Encode(c): return F.base64(_c(c).cast("binary"))
    @staticmethod
    def base64Decode(c): return F.unbase64(_c(c)).cast("string")

    # substringBeforeLast (SubstringBeforeLastEvaluator.java:45-52:
    # whole subject when absent — substring_index already does that)
    @staticmethod
    def substringBeforeLast(c, sep):
        col = _c(c)
        pos = F.length(col) - F.length(F.substring_index(col, sep, -1))
        return F.when(pos > 0, col.substr(F.lit(1), pos - len(sep))
                      ).otherwise(col)

    # math("op") → java.lang.Math dispatch (MathEvaluator.java); the
    # Catalyst builtins cover the Math surface NiFi exposes
    _MATH = {"sqrt": F.sqrt, "abs": F.abs, "ceil": F.ceil,
             "floor": F.floor, "exp": F.exp, "log": F.log, "log10": F.log10,
             "sin": F.sin, "cos": F.cos, "tan": F.tan, "signum": F.signum,
             "cbrt": F.cbrt, "rint": F.rint, "toDegrees": F.degrees,
             "toRadians": F.radians}
    @staticmethod
    def math(op, c, arg=None):
        if op == "pow":
            return F.pow(_c(c), arg)
        if op == "max":
            return F.greatest(_c(c), F.lit(arg))
        if op == "min":
            return F.least(_c(c), F.lit(arg))
        fn = EL._MATH.get(op)
        if fn is None:
            raise ValueError(f"unsupported math op: {op!r}")
        return fn(_c(c))


# EL names that are Python keywords or differ from the evaluator class
# name, exposed under their NiFi spellings for grammar-level parity
# (AttributeExpressionLexer.g tokens `in`, `format`, `count`).
setattr(EL, "in", EL.isIn)
setattr(EL, "format", EL.formatDate)
EL.oneUpSequence = EL.nextInt            # OneUpSequenceEvaluator.java
EL.count = staticmethod(lambda c: F.count(_c(c)))  # CountEvaluator (agg)
