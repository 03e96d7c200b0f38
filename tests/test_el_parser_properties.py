"""EL ``${...}`` string-compiler property tests (hypothesis).

Every template-compiled flow runs through el_parser.py, so the parser
is hardened three ways:

1. render→parse structural equivalence — a random call chain rendered
   as a NiFi property string compiles to exactly the Column the EL
   namespace builds directly (argument quoting/escaping included);
2. template interleaving — random text/expression mixes (with ``$$``
   escapes) compile to the same concat the builder produces;
3. robustness fuzz — arbitrary input either compiles or raises
   ELSyntaxError; never another exception, never a hang (the
   truncated-input infinite loop was a real historical bug).

All three are driver-side (structural Column comparison via the
expression tree's string form) — no Spark jobs, so max_examples can be
high. Evaluation equivalence is pinned separately by the
el_string_compile gate row.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nifi_spark.functions import EL
from nifi_spark.functions.el_parser import (ELSyntaxError, _attr,
                                            compile_el,
                                            compile_template)

SET = settings(deadline=None, max_examples=150,
               suppress_health_check=list(HealthCheck))

# printable args incl. the characters that stress quoting
ARG = st.text(alphabet="abcXYZ 019_$'\"\\{}():,.-", min_size=0,
              max_size=8)
ATTR = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_.]{0,10}", fullmatch=True)

# (el name, number of string args) — chainable, total functions
_FNS = [("toUpper", 0), ("toLower", 0), ("trim", 0), ("length", 0),
        ("append", 1), ("prepend", 1), ("replace", 2),
        ("substringBefore", 1), ("substringAfter", 1),
        ("contains", 1), ("startsWith", 1), ("endsWith", 1),
        ("isEmpty", 0)]

CALL = st.tuples(st.sampled_from(_FNS), st.lists(ARG, min_size=2,
                                                 max_size=2))
CHAIN = st.lists(CALL, min_size=0, max_size=5)


def _quote(a: str) -> str:
    return "'" + a.replace("\\", "\\\\").replace("'", "\\'") + "'"


@SET
@given(ATTR, CHAIN)
def test_render_parse_structural_equivalence(spark, attr, chain):
    rendered = "${" + attr
    expected = _attr(attr)
    for (name, n_args), args in chain:
        args = args[:n_args]
        rendered += ":" + name + "(" + \
            ", ".join(_quote(a) for a in args) + ")"
        expected = getattr(EL, name)(expected, *args)
    rendered += "}"
    got = compile_el(rendered)
    assert str(got) == str(expected), rendered


@SET
@given(st.lists(
    st.one_of(
        st.tuples(st.just("text"),
                  st.text(alphabet="ab $'{}\\", min_size=1,
                          max_size=6)),
        st.tuples(st.just("expr"), ATTR)),
    min_size=0, max_size=6))
def test_template_interleaving(spark, parts):
    rendered = []
    builder_parts = []
    for kind, v in parts:
        if kind == "text":
            rendered.append(v.replace("$", "$$"))
            # adjacent text fragments merge in the builder
            if builder_parts and builder_parts[-1][0] == "text":
                builder_parts[-1] = ("text", builder_parts[-1][1] + v)
            else:
                builder_parts.append(("text", v))
        else:
            rendered.append("${" + v + "}")
            builder_parts.append(("expr", _attr(v)))
    got = compile_template("".join(rendered))
    if len(builder_parts) == 1 and builder_parts[0][0] == "expr":
        expected = builder_parts[0][1]
    else:
        cols = [F.lit(v) if k == "text" else v.cast("string")
                for k, v in builder_parts]
        expected = F.concat(*cols) if cols else F.lit("")
    assert str(got) == str(expected), rendered


@SET
@given(st.text(alphabet="${}():,'\"\\abc01 .-", min_size=0,
               max_size=40))
def test_fuzz_never_hangs_or_leaks_exceptions(spark, s):
    try:
        compile_template(s)
    except ELSyntaxError:
        pass


@SET
@given(st.text(max_size=40))
def test_fuzz_arbitrary_unicode(spark, s):
    try:
        compile_template(s)
    except ELSyntaxError:
        pass


def test_known_escaping_vectors(spark):
    """Fixed anchors for the generated cases above."""
    c = compile_el(r"${a:append('it\'s')}")
    assert str(c) == str(EL.append(F.col("a"), "it's"))
    c = compile_el(r"${a:replace('\\', '/')}")
    assert str(c) == str(EL.replace(F.col("a"), "\\", "/"))
    with pytest.raises(ELSyntaxError):
        compile_el("${a:nosuchfn()}")
    with pytest.raises(ELSyntaxError):
        compile_el("${a")          # the historical truncated-input loop
