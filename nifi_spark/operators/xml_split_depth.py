"""Depth-based XML splitting with ancestor namespace reinjection.

Reference: SplitXml (standard/SplitXml.java + XmlSplitterSaxParser.java)
and its namespace goldens (TestXml/namespaceSplit{1,2}.xml): every
element at SPLIT_DEPTH becomes one fragment prefixed with the XML prolog,
with the xmlns declarations accumulated from its ANCESTORS injected onto
the fragment root (first-seen prefix order, nearer declarations
overwrite), text escaped with the reference's five-entity switch, and
inter-fragment whitespace dropped. Arrow-batched mapInPandas over expat
(namespace-UNaware so prefixes serialize verbatim) — the same per-doc
codec seam as validate_xml/parse_evtx.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

_PROLOG = '<?xml version="1.0" encoding="UTF-8"?>'


def _esc_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("'", "&apos;")
            .replace('"', "&quot;"))


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def split_xml_document(text: str, split_depth: int) -> list[str]:
    """Pure-python core: fragments for each element at `split_depth`
    (1 = children of the root)."""
    import xml.parsers.expat as expat

    frags: list[str] = []
    buf: list[str] = []
    in_split = 0          # depth inside the current fragment, 0 = outside
    depth = 0
    ns_frames: list[list[tuple[str, str]]] = []

    p = expat.ParserCreate()          # no namespace processing: raw names
    p.ordered_attributes = True
    p.buffer_text = True

    def start(name: str, attlist: list) -> None:
        nonlocal depth, in_split
        depth += 1
        pairs = [(attlist[i], attlist[i + 1])
                 for i in range(0, len(attlist), 2)]
        xmlns = [(n, v) for n, v in pairs
                 if n == "xmlns" or n.startswith("xmlns:")]
        plain = [(n, v) for n, v in pairs if (n, v) not in xmlns]
        ns_frames.append(xmlns)
        if in_split:
            in_split += 1
            buf.append(f"<{name}")
            for n, v in pairs:        # inner elements keep attrs verbatim
                buf.append(f' {n}="{_esc_attr(v)}"')
            buf.append(">")
        elif depth == split_depth + 1:
            in_split = 1
            buf.append(f"<{name}")
            seen: dict[str, int] = {}
            decls: list[tuple[str, str]] = []
            for frame in ns_frames:   # ancestors first; nearer overwrites
                for n, v in frame:
                    if n in seen:
                        decls[seen[n]] = (n, v)
                    else:
                        seen[n] = len(decls)
                        decls.append((n, v))
            for n, v in decls:
                buf.append(f' {n}="{_esc_attr(v)}"')
            for n, v in plain:
                buf.append(f' {n}="{_esc_attr(v)}"')
            buf.append(">")

    def end(name: str) -> None:
        nonlocal depth, in_split
        if in_split:
            buf.append(f"</{name}>")
            in_split -= 1
            if in_split == 0:
                frags.append(_PROLOG + "".join(buf))
                buf.clear()
        depth -= 1
        ns_frames.pop()

    def chars(data: str) -> None:
        if in_split:
            buf.append(_esc_text(data))

    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars
    p.Parse(text, True)
    return frags


def split_xml_depth(df: DataFrame, content_col: str, split_depth: int = 1,
                    id_cols: list[str] | None = None) -> DataFrame:
    """One row per depth-N element with the fragment contract; malformed
    documents route as relationship='failure' (quarantine row)."""
    import pandas as pd

    id_cols = id_cols or [c for c in df.columns if c != content_col]
    cols = df.select(*id_cols, F.col(content_col).alias("_content"))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.select(*id_cols).schema.fields)
    schema += (", relationship string, fragment string, "
               "fragment_index int, fragment_count int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                *ids, content = tup
                try:
                    frags = split_xml_document(str(content), split_depth)
                except Exception:  # noqa: BLE001 — malformed XML routes
                    rows.append((*ids, "failure", None, None, None))
                    continue
                for i, frag in enumerate(frags):
                    rows.append((*ids, "split", frag, i, len(frags)))
            yield pd.DataFrame(rows, columns=[*pdf.columns[:-1],
                                              "relationship", "fragment",
                                              "fragment_index",
                                              "fragment_count"])

    return cols.mapInPandas(run, schema=schema)
