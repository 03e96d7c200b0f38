"""Jolt JSON transforms — the full-spec analog of JoltTransformJSON.

Reference: nifi-nar-bundles/nifi-standard-bundle/nifi-standard-processors/
src/main/java/org/apache/nifi/processors/standard/JoltTransformJSON.java
(1-306) and the Jolt library semantics its golden-file tests exercise
(src/test/resources/TestJoltTransformJson/). NiFi accepts five spec
operations plus chainr; this module implements all five and chaining:

  shift       — move values: spec tree mirrors the INPUT, leaves are
                output paths. `*` matches any un-matched key, `&`/`&N`
                in an output path back-references the matched key N
                levels up, `path[]` appends to an output array, and two
                writes to one slot auto-promote it to a list (Jolt's
                rules). Unmatched input is dropped.
  default     — insert values where absent (recursing into present maps).
  remove      — delete keys; `*` wildcard; leaf "" marks removal.
  cardinality — "ONE" unwraps a list to its first element, "MANY" wraps
                a scalar into a list.
  sort        — alphabetize map keys recursively (Jolt sortr).

JSON tree rewriting is genuinely schema-less — Spark SQL expressions
need a fixed output struct — so the chain runs in an Arrow-batched
pandas UDF whose inner loop is the C-accelerated stdlib json codec
(the same declared-seam pattern as the codec family: NiFi runs the Java
Jolt library per FlowFile; this runs the equivalent per Arrow batch).
The flat shift+default+cast fast path that stays entirely JVM-side is
`content.reshape_json`.
"""

from __future__ import annotations

import json
import re
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_REF = re.compile(r"&(\d*)")

_OP_ALIASES = {
    "shift": "shift", "shiftr": "shift",
    "default": "default", "defaultr": "default",
    "remove": "remove", "removr": "remove",
    "cardinality": "cardinality",
    "sort": "sort", "sortr": "sort",
}


def _resolve_refs(path: str, matched: list[str]) -> str:
    # &  / &0 = the key matched at the leaf's level, &1 = one level up
    return _REF.sub(lambda m: matched[-1 - int(m.group(1) or 0)], path)


def _write_out(out: dict, path: str, value: Any) -> None:
    segs = path.split(".") if path else []
    if not segs:
        return
    node = out
    for seg in segs[:-1]:
        seg = seg[:-2] if seg.endswith("[]") else seg
        nxt = node.get(seg)
        if not isinstance(nxt, dict):
            nxt = {}
            node[seg] = nxt
        node = nxt
    last = segs[-1]
    append = last.endswith("[]")
    if append:
        last = last[:-2]
    cur = node.get(last)
    if append:
        if not isinstance(cur, list):
            cur = [] if cur is None else [cur]
        cur.append(value)
        node[last] = cur
    elif last in node:
        # second write to an occupied slot auto-promotes to a list
        node[last] = (cur + [value] if isinstance(cur, list)
                      else [cur, value])
    else:
        node[last] = value


def _shift_node(data: Any, spec: Any, matched: list[str], out: dict) -> None:
    if isinstance(spec, dict):
        # "$" / "$N" spec entries write the MATCHED KEY itself as a value
        # (Jolt's dollar operator): "$" = the key that matched this spec
        # level, "$1" = one level up, etc. They are directives, not data
        # matches, so they apply before the data-key walk.
        for skey, starget in spec.items():
            if skey == "$" or (skey.startswith("$") and skey[1:].isdigit()):
                n = int(skey[1:]) if len(skey) > 1 else 0
                if len(matched) > n:
                    keyval = matched[-1 - n]
                    # "$" is a LEAF of this spec node: its target's &N
                    # refs count from the leaf position, exactly like a
                    # sibling literal key ("max": "...&1...") — so the
                    # resolve stack gains one level (&1 = the key this
                    # node matched, per the reference's chainr golden)
                    for target in (starget if isinstance(starget, list)
                                   else [starget]):
                        _write_out(out,
                                   _resolve_refs(target,
                                                 matched + [keyval]),
                                   keyval)
        if isinstance(data, list):
            data = {str(i): v for i, v in enumerate(data)}
        if not isinstance(data, dict):
            return
        for key, val in data.items():
            sub = spec.get(key)
            if sub is None and "*" in spec:
                sub = spec["*"]
            if sub is None:
                continue
            _shift_node(val, sub, matched + [key], out)
    else:
        for target in (spec if isinstance(spec, list) else [spec]):
            _write_out(out, _resolve_refs(target, matched), data)


def _apply_shift(data: Any, spec: dict) -> dict:
    out: dict = {}
    _shift_node(data, spec, [], out)
    return out


def _default_from_spec(spec: Any) -> Any:
    if isinstance(spec, dict):
        return {k: _default_from_spec(v) for k, v in spec.items()
                if k != "*"}
    return spec


def _apply_default(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict) or not isinstance(spec, dict):
        return data
    for k, v in spec.items():
        if k == "*":
            if isinstance(v, dict):
                for dk in data:
                    data[dk] = _apply_default(data[dk], v)
            continue
        if k not in data or data[k] is None:
            data[k] = _default_from_spec(v)
        elif isinstance(v, dict):
            data[k] = _apply_default(data[k], v)
    return data


def _apply_remove(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict) or not isinstance(spec, dict):
        return data
    for k, v in spec.items():
        keys = list(data.keys()) if k == "*" else ([k] if k in data else [])
        for dk in keys:
            if isinstance(v, dict):
                _apply_remove(data[dk], v)
            else:
                data.pop(dk, None)
    return data


def _apply_cardinality(data: Any, spec: dict) -> Any:
    if not isinstance(data, dict) or not isinstance(spec, dict):
        return data
    for k, v in spec.items():
        keys = list(data.keys()) if k == "*" else ([k] if k in data else [])
        for dk in keys:
            if isinstance(v, dict):
                _apply_cardinality(data[dk], v)
            elif v == "ONE":
                if isinstance(data[dk], list):
                    data[dk] = data[dk][0] if data[dk] else None
            elif v == "MANY":
                if not isinstance(data[dk], list):
                    data[dk] = [data[dk]]
    return data


def _apply_sort(data: Any) -> Any:
    if isinstance(data, dict):
        return {k: _apply_sort(data[k]) for k in sorted(data)}
    if isinstance(data, list):
        return [_apply_sort(x) for x in data]
    return data


def jolt_apply(doc: str, chain: list[dict]) -> str | None:
    """Run a Jolt chainr spec list over one JSON document string.
    Returns None on unparseable input (NiFi routes those to failure)."""
    try:
        data = json.loads(doc)
    except (TypeError, ValueError):
        return None
    for step in chain:
        op = _OP_ALIASES.get(step["operation"])
        spec = step.get("spec")
        if op == "shift":
            data = _apply_shift(data, spec or {})
        elif op == "default":
            data = _apply_default(data, spec or {})
        elif op == "remove":
            data = _apply_remove(data, spec or {})
        elif op == "cardinality":
            data = _apply_cardinality(data, spec or {})
        elif op == "sort":
            data = _apply_sort(data)
        else:
            raise ValueError(f"unknown jolt operation: {step['operation']}")
    # compact separators — the same format Spark's to_json emits, so
    # chained/oracle comparisons are byte-stable
    return json.dumps(data, separators=(",", ":"), ensure_ascii=False)


def jolt_transform(df: DataFrame, content_col: str, chain: list[dict],
                   out_col: str | None = None) -> DataFrame:
    """Apply a Jolt chainr spec to a JSON string column (full-spec
    JoltTransformJSON analog; see module docstring for the seam
    rationale). Rows whose content fails to parse yield NULL — filter
    on isNull for the failure route, as the quarantine pattern does."""
    spec = [dict(s) for s in chain]  # defensive copy into the closure

    @F.pandas_udf("string")
    def _jolt(s: pd.Series) -> pd.Series:
        return s.map(lambda d: jolt_apply(d, spec))

    return df.withColumn(out_col or content_col, _jolt(F.col(content_col)))
