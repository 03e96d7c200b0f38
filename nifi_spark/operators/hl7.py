"""HL7 v2 — pipe-delimited parser, the NiFi HL7 Query Language, and the
RouteHL7 / ExtractHL7Attributes processor analogs.

NiFi ancestors: nifi-commons/nifi-hl7-query-language (grammar
HL7QueryParser.g:74-117 — declare/select/where; HL7Query.java:200-262 —
alias cartesian product + per-assignment WHERE + distinct hit set) and
nifi-hl7-bundle's RouteHL7.java:146-196 (dynamic property name =
relationship, value = query; a COPY routes to every matching
relationship, the original to 'original', parse failures to 'failure')
and ExtractHL7Attributes.java:205-330 (attributes named
``<SegmentKey>.<FieldIndex>``, repeating segments keyed ``NAME_n``).

The data model mirrors nifi-hl7-query-language/src/main/java/.../model:
message → segments → fields → components → subcomponents, with field
values kept in ENCODED form (component/subcomponent separators intact),
exactly like HapiField.java:40 (PipeParser.encode). One documented
deviation: a repeating field (``A~B~C``) is ONE field slot holding the
repetition list — the evaluator's documented intent
(AbstractComparisonEvaluator.java:76-83's any-repetition-matches
comment) — where HapiSegment.java:38-50 flattens repetitions into the
field index space, shifting every later field. We follow the intent,
not the index-shift.

Reference-exact quirks preserved on purpose (each verified by the
reference's own TestHL7Query):

* ``NOT`` is null→true, otherwise IDENTITY (NotEvaluator.java:33-37
  returns ``subjectValue == null || TRUE.equals(subjectValue)``) — the
  reference's testCompareTwoFields asserts the resulting behavior, so a
  "fixed" NOT would diverge from the reference on its own tests.
* Comparing against a repetition list checks each element, but with the
  operand sides SWAPPED (AbstractComparisonEvaluator.java:96-103 calls
  ``compareRaw(rhsObject, lhsValue)``) — asymmetric operators invert.
* Numeric comparison only engages when BOTH sides fullmatch
  ``\\d+(\\.\\d+)?`` (AbstractNumericComparison.java:25 — no sign, no
  exponent); otherwise the comparison is false.
* ``LIKE`` / ``MATCHES REGEX`` exist in the reference LEXER only
  (HL7QueryLexer.g:92-93); the parser grammar's binaryOperator cannot
  reach them, so they are a parse error here too.

Scale notes: queries compile once driver-side; parsing + evaluation run
in Arrow-batched mapInPandas over the message column (one Python pass
computes every route flag — N queries do not mean N passes), and the
route outputs are plain filters over that one projection.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


class HL7ParseError(ValueError):
    pass


class HL7QueryError(ValueError):
    pass


# --------------------------------------------------------------- model


class HL7Field:
    """One field (or one repetition, or one component/subcomponent).
    `value` is the ENCODED text (separators intact), None when empty —
    HAPI's Primitive.getValue() null-for-empty contract."""

    __slots__ = ("value", "components")

    def __init__(self, value: "str | None",
                 components: "list[HL7Field] | None" = None):
        self.value = value if value else None
        self.components = components or []

    def __repr__(self):
        return f"HL7Field({self.value!r})"


class HL7Segment:
    """`fields[i]` is an HL7Field or, for a repeating field, a list of
    HL7Field (one per repetition)."""

    __slots__ = ("name", "fields")

    def __init__(self, name: str, fields: list):
        self.name = name
        self.fields = fields

    def __repr__(self):
        return f"HL7Segment({self.name}, {len(self.fields)} fields)"


class HL7Message:
    __slots__ = ("segments", "_by_name")

    def __init__(self, segments: list[HL7Segment]):
        self.segments = segments
        self._by_name: dict[str, list[HL7Segment]] = {}
        for s in segments:
            self._by_name.setdefault(s.name, []).append(s)

    def get_segments(self, name: str) -> list[HL7Segment]:
        return self._by_name.get(name, [])


_SEG_NAME = re.compile(r"^[A-Z][A-Z0-9]{2}$")


def _parse_component(text: str) -> HL7Field:
    """component: subcomponents on '&' (kept encoded in .value)."""
    if "&" in text:
        subs = [HL7Field(s) for s in text.split("&")]
        return HL7Field(text, subs)
    return HL7Field(text)


def _parse_rep(text: str) -> HL7Field:
    """one repetition: components on '^'."""
    if "^" in text:
        comps = [_parse_component(c) for c in text.split("^")]
        return HL7Field(text, comps)
    if "&" in text:
        return _parse_component(text)
    return HL7Field(text)


def _parse_field(text: str):
    """a field slot: repetitions on '~' → list, else a single field."""
    if "~" in text:
        return [_parse_rep(r) for r in text.split("~")]
    return _parse_rep(text)


def parse_hl7(text: str) -> HL7Message:
    """Pipe-delimited HL7 v2 → model. Segments split on CR/LF; MSH-1 is
    the field separator character itself and MSH-2 the encoding
    characters (never component-split), per the v2 framing rules HAPI's
    PipeParser implements."""
    lines = [ln for ln in re.split(r"\r\n|\r|\n", text) if ln.strip()]
    if not lines:
        raise HL7ParseError("empty message")
    segments: list[HL7Segment] = []
    for ln in lines:
        if len(ln) < 4 or not _SEG_NAME.match(ln[:3]):
            raise HL7ParseError(f"bad segment line {ln[:12]!r}")
        name = ln[:3]
        if name == "MSH":
            if ln[3] != "|":
                raise HL7ParseError("MSH-1 must be '|'")
            rest = ln[4:].split("|")
            fields = [HL7Field("|"), HL7Field(rest[0])]
            fields += [_parse_field(t) for t in rest[1:]]
        else:
            if ln[3] != "|":
                raise HL7ParseError(f"segment {name} missing '|'")
            fields = [_parse_field(t) for t in ln[4:].split("|")]
        segments.append(HL7Segment(name, fields))
    if segments[0].name != "MSH":
        raise HL7ParseError("first segment must be MSH")
    return HL7Message(segments)


# ------------------------------------------------------------ query AST

_TOKEN_RE = re.compile(r"""
    \s+
  | (?P<comment>\#[^\n]*\n)
  | (?P<op><=|>=|!=|=|<|>|\(|\)|,|\.)
  | (?P<str>'(?:\\.|[^'\\\n\r\t])*'|"(?:\\.|[^"\\\n\r\t])*")
  | (?P<num>[0-9]+)
  | (?P<word>[^(){}\[\]$,:;/*'\s.0-9][^(){}\[\]$,:;/*'\s.]*)
""", re.VERBOSE)

_KEYWORDS = {"SELECT", "DECLARE", "OPTIONAL", "REQUIRED", "AS", "WHERE",
             "MESSAGE"}
_ESC = {'"': '"', "'": "'", "r": "\r", "n": "\n", "t": "\t",
        "\\": "\\\\"}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append(_ESC.get(nxt, "\\\\" + nxt))  # lexer ESC rule
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise HL7QueryError(f"unrecognized token at {q[pos:pos+10]!r}")
        pos = m.end()
        if m.lastgroup is None or m.lastgroup == "comment":
            continue
        text = m.group()
        if m.lastgroup == "op":
            toks.append((text, text))
        elif m.lastgroup == "str":
            toks.append(("STRING", _unescape(text[1:-1])))
        elif m.lastgroup == "num":
            toks.append(("NUMBER", text))
        else:
            up = text.upper()
            # multi-word operators: IS NULL / NOT NULL (NOT alone is
            # the unary boolean)
            if up in _KEYWORDS and text in (text.upper(), text.lower()):
                toks.append((up, up))
            elif up in ("AND", "OR", "NOT", "IS", "NULL"):
                toks.append((up, up))
            elif _SEG_NAME.match(text):
                toks.append(("SEGNAME", text))
            else:
                toks.append(("IDENT", text))
    # fold IS NULL / NOT NULL
    folded: list[tuple[str, str]] = []
    i = 0
    while i < len(toks):
        if (toks[i][0] in ("IS", "NOT") and i + 1 < len(toks)
                and toks[i + 1][0] == "NULL"):
            folded.append(("IS_NULL" if toks[i][0] == "IS" else "NOT_NULL",
                           toks[i][1] + " NULL"))
            i += 2
        else:
            folded.append(toks[i])
            i += 1
    return folded


MESSAGE_KEY = "message"


class _Ref:
    """SEGMENT_NAME or declared IDENTIFIER (SegmentEvaluator.java /
    DeclaredReferenceEvaluator.java)."""

    def __init__(self, name: str, kind: str):
        self.name, self.kind = name, kind

    def evaluate(self, env: dict):
        if self.kind == "segment":
            msg: HL7Message = env[MESSAGE_KEY]
            return msg.get_segments(self.name)
        return env.get(self.name)


class _Message:
    def evaluate(self, env: dict):
        return env[MESSAGE_KEY]


class _Dot:
    """DotEvaluator.java:40-85 — 1-based child access; a collection on
    the left maps element-wise (None for misses)."""

    def __init__(self, lhs, idx: int):
        self.lhs, self.idx = lhs, idx

    def _get(self, obj):
        if isinstance(obj, HL7Message):
            lst = obj.segments
        elif isinstance(obj, HL7Segment):
            lst = obj.fields
        elif isinstance(obj, HL7Field):
            lst = obj.components
        else:
            return None
        if self.idx > len(lst):
            return None
        return lst[self.idx - 1]

    def evaluate(self, env: dict):
        v = self.lhs.evaluate(env)
        if v is None:
            return None
        if isinstance(v, list):
            return [self._get(o) for o in v]
        return self._get(v)


class _Literal:
    def __init__(self, value):
        self.value = value

    def evaluate(self, env: dict):
        return self.value


_NUMERIC = re.compile(r"\d+(\.\d+)?")


def _unwrap(v):
    return v.value if isinstance(v, HL7Field) else v


def _to_double(v):
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str) and _NUMERIC.fullmatch(v):
        return float(v)
    return None


def _str(v) -> str:
    # Java toString: integers print without decimal point
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _cmp_scalar(op: str, lhs, rhs) -> bool:
    if op == "=":
        return _str(lhs) == _str(rhs)
    if op == "!=":
        return _str(lhs) != _str(rhs)
    ld, rd = _to_double(lhs), _to_double(rhs)
    if ld is None or rd is None:
        return False
    return {"<": ld < rd, ">": ld > rd,
            "<=": ld <= rd, ">=": ld >= rd}[op]


def _compare_raw(op: str, lhs, rhs) -> bool:
    """AbstractComparisonEvaluator.compareRaw — incl. the side-swap on a
    right-hand collection (java:96-103)."""
    if lhs is None or rhs is None:
        return False
    lhs, rhs = _unwrap(lhs), _unwrap(rhs)
    if lhs is None or rhs is None:
        return False
    if isinstance(lhs, list) and isinstance(rhs, list):
        return False
    if isinstance(lhs, list):
        return any(_compare_raw(op, o, rhs) for o in lhs)
    if isinstance(rhs, list):
        return any(_compare_raw(op, o, lhs) for o in rhs)  # sides swap
    return _cmp_scalar(op, lhs, rhs)


class _Compare:
    def __init__(self, op: str, lhs, rhs):
        self.op, self.lhs, self.rhs = op, lhs, rhs

    def evaluate(self, env: dict) -> bool:
        lv = self.lhs.evaluate(env)
        if lv is None:
            return False
        rv = self.rhs.evaluate(env)
        if rv is None:
            return False
        return _compare_raw(self.op, lv, rv)


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, HL7Field):
        v = v.value
    if isinstance(v, list):
        return all(_is_null(o) for o in v)  # empty list → True
    return v is None


def _not_null(v) -> bool:
    if v is None:
        return False
    if isinstance(v, HL7Field):
        v = v.value
    if isinstance(v, list):
        return any(_not_null(o) for o in v)
    return v is not None


class _Unary:
    def __init__(self, op: str, subject):
        self.op, self.subject = op, subject

    def evaluate(self, env: dict) -> bool:
        v = self.subject.evaluate(env)
        return _is_null(v) if self.op == "IS_NULL" else _not_null(v)


class _Not:
    """NotEvaluator.java:33-37 — reference-exact: null→True, otherwise
    the value UNCHANGED (the reference's own testCompareTwoFields
    asserts this behavior)."""

    def __init__(self, subject):
        self.subject = subject

    def evaluate(self, env: dict) -> bool:
        v = self.subject.evaluate(env)
        return v is None or v is True


class _Logic:
    def __init__(self, op: str, lhs, rhs):
        self.op, self.lhs, self.rhs = op, lhs, rhs

    def evaluate(self, env: dict) -> bool:
        l_ = self.lhs.evaluate(env)
        if self.op == "AND":
            return bool(l_) and bool(self.rhs.evaluate(env))
        return bool(l_) or bool(self.rhs.evaluate(env))


# ------------------------------------------------------------- parser


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], declared: set[str]):
        self.toks, self.pos, self.declared = toks, 0, declared

    def peek(self):
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def next(self):
        if self.pos >= len(self.toks):
            raise HL7QueryError("unexpected end of query")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise HL7QueryError(f"expected {kind}, got {k} {v!r}")
        return v

    # conditions : condition ((AND|OR) condition)*
    def conditions(self):
        node = self.condition()
        while self.peek() in ("AND", "OR"):
            op = self.next()[0]
            node = _Logic(op, node, self.condition())
        return node

    def condition(self):
        if self.peek() == "NOT":
            self.next()
            return _Not(self.condition())
        if self.peek() == "(":
            # LPAREN conditions RPAREN — but '(expr)' is also legal in
            # evaluation position; try conditions, fall back to eval
            save = self.pos
            try:
                self.next()
                node = self.conditions()
                self.expect(")")
                if self.peek() in ("=", "!=", "<", ">", "<=", ">=",
                                  "IS_NULL", "NOT_NULL", "."):
                    raise HL7QueryError("parenthesized expression")
                return node
            except HL7QueryError:
                self.pos = save
        return self.evaluation()

    def evaluation(self):
        expr = self.expression()
        k = self.peek()
        if k in ("IS_NULL", "NOT_NULL"):
            self.next()
            return _Unary(k, expr)
        if k in ("=", "!=", "<", ">", "<=", ">="):
            op = self.next()[0]
            return _Compare(op, expr, self.expression())
        raise HL7QueryError(f"expected an operator after expression, "
                            f"got {k}")

    def expression(self):
        if self.peek() == "(":
            self.next()
            e = self.expr()
            self.expect(")")
            return e
        return self.expr()

    def expr(self):
        k, v = self.next()
        if k == "STRING":
            return _Literal(v)
        if k == "NUMBER":
            node: object = _Literal(int(v))
        elif k in ("SEGNAME", "IDENT", "MESSAGE"):
            if k == "MESSAGE":
                node = _Message()
            elif k == "IDENT" or v in self.declared:
                if v not in self.declared:
                    raise HL7QueryError(f"undeclared alias {v!r}")
                node = _Ref(v, "alias")
            else:
                node = _Ref(v, "segment")
        else:
            raise HL7QueryError(f"unexpected token {v!r}")
        while self.peek() == ".":
            self.next()
            node = _Dot(node, int(self.expect("NUMBER")))
        return node


class QueryResult:
    def __init__(self, labels: list[str], hits: list[dict]):
        self.labels = labels
        self.hits = hits

    @property
    def is_match(self) -> bool:
        return bool(self.hits)

    @property
    def hit_count(self) -> int:
        return len(self.hits)


class HL7Query:
    """compile() once, evaluate() per message — HL7Query.java:84-116
    (clause dispatch) + 200-262 (alias product evaluation)."""

    def __init__(self, declarations, selections, where):
        self.declarations = declarations    # [(alias, required, segname)]
        self.selections = selections        # [(label, evaluator)]
        self.where = where

    @staticmethod
    def compile(query: str) -> "HL7Query":
        toks = _tokenize(query)
        p = _Parser(toks, set())
        declarations: list[tuple[str, bool, str]] = []
        if p.peek() == "DECLARE":
            p.next()
            while True:
                k, alias = p.next()
                if k not in ("IDENT", "SEGNAME"):
                    raise HL7QueryError(f"bad declaration alias {alias!r}")
                p.expect("AS")
                req = p.next()
                if req[1] not in ("REQUIRED", "OPTIONAL"):
                    raise HL7QueryError("expected REQUIRED or OPTIONAL")
                seg = p.expect("SEGNAME")
                declarations.append((alias, req[1] == "REQUIRED", seg))
                p.declared.add(alias)
                if p.peek() == ",":
                    p.next()
                    continue
                break
        if p.next()[0] != "SELECT":
            raise HL7QueryError("expected SELECT")
        selections: list[tuple[str, object]] = []
        while True:
            if p.peek() == "MESSAGE":
                p.next()
                node: object = _Message()
                label = "MESSAGE"
            else:
                k, v = p.next()
                if k == "SEGNAME" and v not in p.declared:
                    node = _Ref(v, "segment")
                elif k in ("IDENT", "SEGNAME"):
                    if v not in p.declared:
                        raise HL7QueryError(f"undeclared alias {v!r}")
                    node = _Ref(v, "alias")
                else:
                    raise HL7QueryError(f"bad selectable {v!r}")
                label = v
                while p.peek() == ".":
                    p.next()
                    n = int(p.expect("NUMBER"))
                    node = _Dot(node, n)
                    label += f".{n}"
            if p.peek() == "AS":
                p.next()
                k, v = p.next()
                if k not in ("IDENT", "SEGNAME"):
                    raise HL7QueryError(f"bad selection alias {v!r}")
                label = v
            selections.append((label, node))
            if p.peek() == ",":
                p.next()
                continue
            break
        where = None
        if p.peek() == "WHERE":
            p.next()
            where = p.conditions()
        if p.peek() is not None:
            raise HL7QueryError(f"trailing tokens at {p.toks[p.pos]}")
        return HL7Query(declarations, selections, where)

    def evaluate(self, message: HL7Message) -> QueryResult:
        labels = [lb for lb, _ in self.selections]
        possible: list[tuple[str, list]] = []
        total = 1
        for alias, required, segname in self.declarations:
            values = message.get_segments(segname)
            if not values:
                if required:
                    return QueryResult(labels, [])
                values = [None]
            possible.append((alias, values))
            total *= len(values)
        seen: set = set()
        hits: list[dict] = []
        for i in range(total):
            env: dict = {MESSAGE_KEY: message}
            divisor = 1
            for alias, values in possible:     # assignAliases divisor walk
                env[alias] = values[(i // divisor) % len(values)]
                divisor *= len(values)
            if self.where is not None and self.where.evaluate(env) is not True:
                continue
            row = {lb: ev.evaluate(env) for lb, ev in self.selections}
            key = tuple((lb, id(v) if isinstance(v, (HL7Message, HL7Segment,
                                                     HL7Field, list))
                         else v) for lb, v in row.items())
            if key not in seen:
                seen.add(key)
                hits.append(row)
        return QueryResult(labels, hits)


# ------------------------------------------------- processor analogs

_HL7_UNESC = [("\\F\\", "|"), ("\\S\\", "^"), ("\\T\\", "&"),
              ("\\R\\", "~"), ("\\E\\", "\\")]


def _hl7_unescape(text: str) -> str:
    for esc, ch in _HL7_UNESC:
        text = text.replace(esc, ch)
    return text


# HL7 v2.3 field (name, type) dictionary for the segments the
# reference's TestExtractHL7Attributes exercises — the subset of
# HAPI's v2.3 schema that use-segment-names mode needs. Names are the
# published v2.3 long names; the attribute form is derived exactly as
# ExtractHL7Attributes.java:286 does (WordUtils.capitalize +
# strip \W+), see `_java_field_name`.
_V23_FIELDS: dict[str, list[tuple[str, str]]] = {
    "MSH": [
        ("Field Separator", "ST"), ("Encoding Characters", "ST"),
        ("Sending Application", "HD"), ("Sending Facility", "HD"),
        ("Receiving Application", "HD"), ("Receiving Facility", "HD"),
        ("Date / Time Of Message", "TS"), ("Security", "ST"),
        ("Message Type", "CM_MSG"), ("Message Control ID", "ST"),
        ("Processing ID", "PT"), ("Version ID", "ID"),
        ("Sequence Number", "NM"), ("Continuation Pointer", "ST"),
        ("Accept Acknowledgement Type", "ID"),
        ("Application Acknowledgement Type", "ID"),
        ("Country Code", "ID"), ("Character Set", "ID"),
        ("Principal Language Of Message", "CE"),
    ],
    "PID": [
        ("Set ID - Patient ID", "SI"),
        ("Patient ID (External ID)", "CX"),
        ("Patient ID (Internal ID)", "CX"),
        ("Alternate Patient ID", "CX"), ("Patient Name", "XPN"),
        ("Mother's Maiden Name", "XPN"), ("Date of Birth", "TS"),
        ("Sex", "IS"), ("Patient Alias", "XPN"), ("Race", "IS"),
        ("Patient Address", "XAD"), ("County Code", "IS"),
        ("Phone Number - Home", "XTN"),
        ("Phone Number - Business", "XTN"),
        ("Primary Language", "CE"), ("Marital Status", "IS"),
        ("Religion", "IS"), ("Patient Account Number", "CX"),
        ("SSN Number - Patient", "ST"),
        ("Driver's License Number", "DLN"),
        ("Mother's Identifier", "CX"), ("Ethnic Group", "IS"),
        ("Birth Place", "ST"), ("Multiple Birth Indicator", "ID"),
        ("Birth Order", "NM"), ("Citizenship", "IS"),
        ("Veterans Military Status", "CE"), ("Nationality", "CE"),
        ("Patient Death Date and Time", "TS"),
        ("Patient Death Indicator", "ID"),
    ],
    "PD1": [
        ("Living Dependency", "IS"), ("Living Arrangement", "IS"),
        ("Patient Primary Facility", "XON"),
        ("Patient Primary Care Provider Name & ID No.", "XCN"),
        ("Student Indicator", "IS"), ("Handicap", "IS"),
        ("Living Will", "IS"), ("Organ Donor", "IS"),
        ("Separate Bill", "ID"), ("Duplicate Patient", "CX"),
        ("Publicity Indicator", "CE"), ("Protection Indicator", "ID"),
    ],
    "ORC": [
        ("Order Control", "ID"), ("Placer Order Number", "EI"),
        ("Filler Order Number", "EI"), ("Placer Group Number", "EI"),
        ("Order Status", "ID"), ("Response Flag", "ID"),
        ("Quantity/Timing", "TQ"), ("Parent", "CM_EIP"),
        ("Date/Time of Transaction", "TS"), ("Entered By", "XCN"),
        ("Verified By", "XCN"), ("Ordering Provider", "XCN"),
        ("Enterer's Location", "PL"),
        ("Call Back Phone Number", "XTN"),
        ("Order Effective Date/Time", "TS"),
        ("Order Control Code Reason", "CE"),
        ("Entering Organization", "CE"), ("Entering Device", "CE"),
        ("Action By", "XCN"),
    ],
    "OBR": [
        ("Set ID - Observation Request", "SI"),
        ("Placer Order Number", "EI"), ("Filler Order Number", "EI"),
        ("Universal Service Identifier", "CE"), ("Priority", "ID"),
        ("Requested Date/Time", "TS"), ("Observation Date/Time", "TS"),
        ("Observation End Date/Time", "TS"),
        ("Collection Volume", "CQ"), ("Collector Identifier", "XCN"),
        ("Specimen Action Code", "ID"), ("Danger Code", "CE"),
        ("Relevant Clinical Information", "ST"),
        ("Specimen Received Date/Time", "TS"),
        ("Specimen Source", "CM_SPS"), ("Ordering Provider", "XCN"),
        ("Order Callback Phone Number", "XTN"),
        ("Placer Field 1", "ST"), ("Placer Field 2", "ST"),
        ("Filler Field 1", "ST"), ("Filler Field 2", "ST"),
        ("Results Rpt/Status Chng - Date/Time", "TS"),
        ("Charge To Practice", "CM_MOC"),
        ("Diagnostic Serv Sect ID", "ID"), ("Result Status", "ID"),
        ("Parent Result", "CM_PRL"), ("Quantity/Timing", "TQ"),
        ("Result Copies To", "XCN"), ("Parent Number", "CM_EIP"),
        ("Transportation Mode", "ID"), ("Reason For Study", "CE"),
        ("Principal Result Interpreter", "CM_NDL"),
        ("Assistant Result Interpreter", "CM_NDL"),
        ("Technician", "CM_NDL"), ("Transcriptionist", "CM_NDL"),
        ("Scheduled Date/Time", "TS"),
        ("Number Of Sample Containers", "NM"),
        ("Transport Logistics Of Collected Sample", "CE"),
        ("Collector's Comment", "CE"),
        ("Transport Arrangement Responsibility", "CE"),
        ("Transport Arranged", "ID"), ("Escort Required", "ID"),
        ("Planned Patient Transport Comment", "CE"),
    ],
    "OBX": [
        ("Set ID - OBX", "SI"), ("Value Type", "ID"),
        ("Observation Identifier", "CE"),
        ("Observation Sub-ID", "ST"), ("Observation Value", "varies"),
        ("Units", "CE"), ("References Range", "ST"),
        ("Abnormal Flags", "ID"), ("Probability", "NM"),
        ("Nature of Abnormal Test", "ID"),
        ("Observ Result Status", "ID"),
        ("Date Last Obs Normal Values", "TS"),
        ("User Defined Access Checks", "ST"),
        ("Date/Time of the Observation", "TS"),
        ("Producer's ID", "CE"), ("Responsible Observer", "XCN"),
        ("Observation Method", "CE"),
    ],
}

# types whose fields are never component-split in use-segment-names
# mode: HL7 primitives plus the reference's explicit isTimestamp
# suppression (ExtractHL7Attributes.java:328-332 — TS/DT/TM) and
# OBX-5's Varies wrapper (a Varies is not a HAPI Composite).
_HL7_PRIMITIVES = {"ST", "ID", "IS", "NM", "SI", "TX", "FT",
                   "DT", "TM", "TS", "varies"}


def _java_field_name(raw: str) -> str:
    """WordUtils.capitalize(name).replaceAll("\\\\W+", "") — capitalize
    the first letter of each whitespace-delimited word, then strip
    every non-word character ('Set ID - OBX' → 'SetIDOBX')."""
    cap = " ".join(w[0].upper() + w[1:] if w else w
                   for w in raw.split(" "))
    return re.sub(r"\W+", "", cap)


def extract_hl7_attributes(df: DataFrame, content_col: str,
                           id_cols: "list[str] | None" = None,
                           parse_fields: bool = True,
                           use_segment_names: bool = False,
                           group_repeating: "set[str] | None" = None
                           ) -> DataFrame:
    """ExtractHL7Attributes analog (ExtractHL7Attributes.java:205-330):
    one row per attribute, named ``SEG.i`` (repeating segments
    ``SEG_n.i``, n = 1-based occurrence), components ``SEG.i.j`` when
    `parse_fields` and the field is composite. Values are HL7-unescaped
    (\\F\\ → | etc.), empty fields skipped. Long format instead of the
    reference's per-FlowFile attribute map — the map varies per message,
    which a DataFrame can't type; pivot downstream if a wide shape is
    needed.

    `use_segment_names=True` is the reference's USE_SEGMENT_NAMES mode
    (ExtractHL7Attributes.java:280-292): field names come from the HL7
    v2.3 dictionary (`_V23_FIELDS`, WordUtils.capitalize + \\W+ strip,
    e.g. ``PID.PatientName``); with `parse_fields`, composite-typed
    fields split STRUCTURALLY into ``SEG.FieldName.TYPE.j`` (CM_* types
    shorten to CM exactly like the reference's CM_MSG special case,
    java:311-313), while primitive/TS/DT/TM-typed fields stay whole
    (the isTimestamp suppression, java:328-332) — even a composite with
    no separators emits its ``.1`` component, because the reference
    iterates Composite.getComponents(), not text. Segments absent from
    the dictionary fall back to numeric names.

    `group_repeating` marks segments that sit inside a repeating group
    of the message structure, so they get the ``_n`` suffix even with
    one occurrence — the reference derives this from HAPI's parsed
    group tree (isRepeating, java:334-345), e.g. ORC/OBR/OBX in
    ORU_R01; a structure-less parser needs it declared. Segments
    occurring more than once are suffixed regardless.

    Parse failures keep their id columns with attr_name='<parse_error>'.
    """
    id_cols = id_cols or []
    group_rep = group_repeating or set()
    seg_names = dict(_V23_FIELDS) if use_segment_names else {}
    cols = df.select(*id_cols, content_col)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*id_cols).schema.fields)
    out_schema += ", attr_name string, attr_value string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                *ids, content = tup
                try:
                    msg = parse_hl7(content)
                except HL7ParseError as exc:
                    rows.append((*ids, "<parse_error>", str(exc)))
                    continue
                counts: dict[str, int] = {}
                for seg in msg.segments:
                    counts[seg.name] = counts.get(seg.name, 0) + 1
                occurrence: dict[str, int] = {}
                for seg in msg.segments:
                    occurrence[seg.name] = occurrence.get(seg.name, 0) + 1
                    key = (f"{seg.name}_{occurrence[seg.name]}"
                           if (counts[seg.name] > 1
                               or seg.name in group_rep) else seg.name)
                    table = seg_names.get(seg.name)
                    for i, slot in enumerate(seg.fields, start=1):
                        # the reference reads getField(i, 0) — FIRST
                        # repetition only (ExtractHL7Attributes.java:281)
                        first = slot[0] if isinstance(slot, list) else slot
                        val = first.value or ""
                        if not val:
                            continue
                        if table is not None and i <= len(table):
                            raw_name, ftype = table[i - 1]
                            fname = _java_field_name(raw_name)
                            fk = f"{key}.{fname}"
                            if (parse_fields
                                    and ftype not in _HL7_PRIMITIVES):
                                label = ("CM" if ftype.startswith("CM")
                                         else ftype)
                                comps = (first.components
                                         if first.components else [first])
                                for j, comp in enumerate(comps, start=1):
                                    if comp.value:
                                        rows.append((
                                            *ids, f"{fk}.{label}.{j}",
                                            _hl7_unescape(comp.value)))
                            else:
                                rows.append((*ids, fk,
                                             _hl7_unescape(val)))
                            continue
                        if table is not None:
                            # beyond the v2.3 schema width — the
                            # reference iterates only numFields()
                            continue
                        fk = f"{key}.{i}"
                        if parse_fields and first.components:
                            for j, comp in enumerate(first.components,
                                                     start=1):
                                if comp.value:
                                    rows.append((*ids, f"{fk}.{j}",
                                                 _hl7_unescape(comp.value)))
                        else:
                            rows.append((*ids, fk, _hl7_unescape(val)))
            yield pd.DataFrame(rows, columns=[*pdf.columns[:-1],
                                              "attr_name", "attr_value"])

    return cols.mapInPandas(run, schema=out_schema)


def route_hl7(df: DataFrame, content_col: str,
              queries: dict[str, str]) -> dict[str, DataFrame]:
    """RouteHL7 analog (RouteHL7.java:146-196): each dict entry is a
    relationship (name → HL7 query); a message routes a COPY to every
    matching relationship, every parseable message to 'original', parse
    failures to 'failure'. Queries compile once driver-side; ONE
    Arrow-batched pass computes every match flag, and each relationship
    is a plain filter over that projection (N queries ≠ N Python
    passes)."""
    compiled = {name: HL7Query.compile(q) for name, q in queries.items()}
    reserved = {"original", "failure"}
    clash = reserved & set(compiled)
    if clash:
        raise HL7QueryError(f"relationship names {sorted(clash)} are "
                            "reserved (RouteHL7.java:89-96)")
    names = list(compiled)
    flag_cols = [f"_m_{i}" for i in range(len(names))]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += ", _hl7_ok boolean"
    out_schema += "".join(f", {c} boolean" for c in flag_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = [compiled[n] for n in names]
        for pdf in batches:
            flags: list[list[bool]] = []
            for content in pdf[content_col]:
                try:
                    msg = parse_hl7(content)
                except HL7ParseError:
                    flags.append([False] + [False] * len(qs))
                    continue
                flags.append([True] + [q.evaluate(msg).is_match
                                       for q in qs])
            fdf = pd.DataFrame(flags, columns=["_hl7_ok", *flag_cols],
                               index=pdf.index)
            yield pd.concat([pdf, fdf], axis=1)

    flagged = df.mapInPandas(run, schema=out_schema)
    routed = {name: flagged.filter(F.col(c)).drop("_hl7_ok", *flag_cols)
              for name, c in zip(names, flag_cols)}
    routed["original"] = flagged.filter(F.col("_hl7_ok")).drop(
        "_hl7_ok", *flag_cols)
    routed["failure"] = flagged.filter(~F.col("_hl7_ok")).drop(
        "_hl7_ok", *flag_cols)
    return routed
