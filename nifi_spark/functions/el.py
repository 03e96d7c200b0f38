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

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


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

    # regex (lexer :154-155, 180-182)
    @staticmethod
    def matches(c, pattern): return _c(c).rlike(pattern)
    @staticmethod
    def find(c, pattern): return F.regexp_extract(_c(c), pattern, 0) != ""
    @staticmethod
    def replaceAll(c, pattern, repl): return F.regexp_replace(_c(c), pattern, repl)

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
    def uuid(): return F.uuid()
    @staticmethod
    def hash(c, alg="sha256"):
        return F.sha2(_c(c), 256) if alg == "sha256" else F.md5(_c(c))
    @staticmethod
    def urlEncode(c): return F.url_encode(_c(c))
    @staticmethod
    def urlDecode(c): return F.url_decode(_c(c))
