"""NiFi template XML → Flow compiler.

NiFi exports flows as template XML (<template><snippet> with
<processors> carrying <type>/<config><properties> and <connections>
carrying source/destination ids + <selectedRelationships>; the
reference's own test template is
nifi-framework-core/src/test/resources/templates/template-0.7.0.xml).
This loader parses that format with stdlib ElementTree and compiles the
processor graph into a `plans.Flow` over this engine's operators — EL
property strings compile through functions.el_parser, so a template
exported from the reference runs on Spark unchanged.

Supported processor types (the standard-bundle transform core):
GenerateFlowFile (caller-supplied source), RouteOnAttribute,
RouteOnContent, UpdateAttribute, ReplaceText (EL in the replacement
included), ExtractText, SplitText, SegmentContent, ParseSyslog,
DetectDuplicate, EvaluateJsonPath, MergeContent (Defragment),
CompressContent, HashContent, AttributesToJSON, DistributeLoad
(weighted relationships), ControlRate, Base64EncodeContent,
ConvertCharacterSet, ScanAttribute (dictionary via `dictionaries=`),
IdentifyMimeType, SplitJson, EvaluateXPath,
LogAttribute (identity), FUNNEL nodes (union), ExecuteScript /
InvokeScriptedProcessor (python Script Body/File via plans.scripted;
`script_resolver=` loads node-local Script File paths), and any node
whose name or type matches a `plans.scripted.register_processor`-ed
ScriptedProcessor. Anything else raises TemplateError under
strict=True, or becomes an identity pass-through stage with a warning
entry otherwise (sinks like PutFile are usually what you want to pass
through — read the result off the Flow instead).

Scale note: compilation is driver-side and free; the resulting Flow is
exactly the hand-built one — every stage is the same Catalyst
expression the operators produce, so plans, pushdown, and broadcasts
are unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from nifi_spark.plans.flow import Flow


class TemplateError(ValueError):
    pass


@dataclass
class TProcessor:
    pid: str
    name: str
    ptype: str                       # short class name, e.g. RouteOnAttribute
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class TConnection:
    src: str
    dst: str
    relationships: list[str] = field(default_factory=list)


# static (descriptor) property names per type — everything else in
# <properties> is a dynamic property (route names, new attributes, ...)
_STATIC = {
    "RouteOnAttribute": {"Routing Strategy"},
    "UpdateAttribute": {"Delete Attributes Expression",
                        "Store State", "Stateful Variables Initial Value"},
    "ExtractText": {"Character Set", "Maximum Buffer Size",
                    "Maximum Capture Group Length",
                    "Enable Canonical Equivalence",
                    "Enable Case-insensitive Matching",
                    "Permit Whitespace and Comments in Pattern",
                    "Enable DOTALL Mode",
                    "Enable Literal Parsing of the Pattern",
                    "Enable Multiline Mode",
                    "Enable Unicode-aware Case Folding",
                    "Enable Unicode Predefined Character Classes",
                    "Enable Unix Lines Mode",
                    "Include Capture Group 0"},
}


def parse_template(xml_text: str) -> tuple[list[TProcessor],
                                           list[TConnection], str]:
    root = ET.fromstring(xml_text)
    if root.tag != "template":
        raise TemplateError(f"not a NiFi template (root <{root.tag}>)")
    tname = (root.findtext("name") or "template").strip()
    snippet = root.find("snippet")
    if snippet is None:
        raise TemplateError("template has no <snippet>")
    procs: list[TProcessor] = []
    for p in snippet.iter("processors"):
        props = {}
        cfg = p.find("config")
        if cfg is not None:
            for entry in cfg.findall("./properties/entry"):
                k = entry.findtext("key")
                v = entry.findtext("value")
                if k is not None and v is not None:
                    props[k] = v
        full_type = (p.findtext("type") or "").strip()
        procs.append(TProcessor(
            pid=(p.findtext("id") or "").strip(),
            name=(p.findtext("name") or "").strip(),
            ptype=full_type.rsplit(".", 1)[-1],
            properties=props))
    # funnels are join points: model each as an identity/union processor
    for fu in snippet.iter("funnels"):
        procs.append(TProcessor(pid=(fu.findtext("id") or "").strip(),
                                name="", ptype="FUNNEL"))
    # process-group input/output ports are identity pass-throughs too —
    # iter() already recursed into nested processGroups for processors
    # and connections, so ports are the only remaining connection
    # endpoints (an unfed input port is a source position: supply its
    # DataFrame via sources= by port name)
    for tag in ("inputPorts", "outputPorts"):
        for port in snippet.iter(tag):
            procs.append(TProcessor(
                pid=(port.findtext("id") or "").strip(),
                name=(port.findtext("name") or "").strip(),
                ptype="PORT"))
    conns: list[TConnection] = []
    for c in snippet.iter("connections"):
        src = c.findtext("./source/id")
        dst = c.findtext("./destination/id")
        rels = [r.text.strip() for r in c.findall("selectedRelationships")
                if r.text]
        if src and dst:
            conns.append(TConnection(src.strip(), dst.strip(), rels))
    return procs, conns, tname


def _dyn(proc: TProcessor) -> dict[str, str]:
    static = _STATIC.get(proc.ptype, set())
    return {k: v for k, v in proc.properties.items() if k not in static}


def _union(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def _build_stage(proc: TProcessor, content_col: str,
                 dictionaries: dict[str, DataFrame] | None = None,
                 script_resolver=None):
    """Returns fn(*input_dfs) -> DataFrame | dict[rel, DataFrame]."""
    p = proc.properties
    dictionaries = dictionaries or {}

    if proc.ptype == "RouteOnAttribute":
        from nifi_spark.operators import route_on_attribute
        strategy = {"Route to Property name": "all_matches",
                    "Route to 'matched' if all match": "all_match",
                    "Route to 'matched' if any matches": "any_match",
                    }.get(p.get("Routing Strategy",
                                "Route to Property name"), "all_matches")
        routes = _dyn(proc)

        def fn(*dfs):
            return route_on_attribute(_union(list(dfs)), dict(routes),
                                      strategy=strategy)
        return fn

    if proc.ptype == "UpdateAttribute":
        from nifi_spark.operators import update_columns
        updates = _dyn(proc)
        delete_re = p.get("Delete Attributes Expression")

        def fn(*dfs):
            import re as _re
            df = _union(list(dfs))
            delete = [c for c in df.columns
                      if delete_re and _re.fullmatch(delete_re, c)]
            return {"success": update_columns(df, dict(updates),
                                              delete=delete)}
        return fn

    if proc.ptype == "ReplaceText":
        from nifi_spark.operators import replace_text
        mode = {"Regex Replace": "regex", "Literal Replace": "literal",
                "Prepend": "prepend", "Append": "append",
                "Always Replace": "always",
                }.get(p.get("Replacement Strategy", "Regex Replace"))
        search = p.get("Regular Expression", "(?s)(^.*$)")
        repl = p.get("Replacement Value", "")
        line_mode = p.get("Evaluation Mode", "Entire text") == "Line-by-Line"

        def fn(*dfs):
            df = _union(list(dfs))
            if "${" in repl:
                # EL in the replacement (NiFi evaluates it per FlowFile
                # before substituting): regexp_replace with a Column
                # replacement; $1-style backrefs still work
                from nifi_spark.functions.el_parser import compile_template
                rcol = compile_template(repl).cast("string")
                if mode == "regex":
                    new = F.regexp_replace(F.col(content_col),
                                           F.lit(search), rcol)
                elif mode == "always":
                    new = rcol
                elif mode == "prepend":
                    new = F.concat(rcol, F.col(content_col))
                elif mode == "append":
                    new = F.concat(F.col(content_col), rcol)
                else:
                    new = F.replace(F.col(content_col), F.lit(search), rcol)
                return {"success": df.withColumn(content_col, new)}
            if line_mode:
                from nifi_spark.operators.content import \
                    replace_text_line_by_line
                return {"success": replace_text_line_by_line(
                    df, content_col, search, repl)}
            return {"success": replace_text(df, content_col, search, repl,
                                            mode=mode)}
        return fn

    if proc.ptype == "RouteOnContent":
        from nifi_spark.operators import route_on_content
        patterns = _dyn(proc)

        def fn(*dfs):
            return route_on_content(_union(list(dfs)), content_col,
                                    dict(patterns))
        return fn

    if proc.ptype == "SplitText":
        from nifi_spark.operators import split_text

        def fn(*dfs):
            df = _union(list(dfs))
            out = split_text(df, content_col, sep="\n")
            # downstream stages keep operating on the content column
            return {"splits": out.withColumnRenamed("fragment", content_col)}
        return fn

    if proc.ptype == "SegmentContent":
        from nifi_spark.operators import segment_content
        size = p.get("Segment Size", "1 KB").upper()
        num = float(size.split()[0])
        unit = {"B": 1, "KB": 1 << 10, "MB": 1 << 20}.get(
            size.split()[1] if " " in size else "B", 1)

        def fn(*dfs):
            out = segment_content(_union(list(dfs)), content_col,
                                  int(num * unit))
            return {"segments": out.withColumnRenamed("fragment",
                                                      content_col)}
        return fn

    if proc.ptype == "ParseSyslog":
        from nifi_spark.operators import parse_syslog

        def fn(*dfs):
            routed = parse_syslog(_union(list(dfs)), content_col)
            return {"success": routed["valid"],
                    "failure": routed["invalid"]}
        return fn

    if proc.ptype == "DetectDuplicate":
        key = p.get("Cache Entry Identifier", content_col)

        def fn(*dfs):
            from nifi_spark.operators import detect_duplicate
            df = _union(list(dfs))
            order = "lsn" if "lsn" in df.columns else df.columns[0]
            routed = detect_duplicate(df, [key], order)
            # NiFi spells the relationship with a hyphen
            return {"non-duplicate": routed["non_duplicate"],
                    "duplicate": routed["duplicate"]}
        return fn

    if proc.ptype == "ExtractText":
        from nifi_spark.operators import extract_text
        patterns = {k: (v, 1) for k, v in _dyn(proc).items()}

        def fn(*dfs):
            df = extract_text(_union(list(dfs)), content_col, patterns)
            matched = None
            for name in patterns:
                hit = F.col(name) != ""
                matched = hit if matched is None else (matched | hit)
            if matched is None:
                return {"matched": df, "unmatched": df.limit(0)}
            return {"matched": df.filter(matched),
                    "unmatched": df.filter(~matched)}
        return fn

    if proc.ptype == "HashContent":
        from nifi_spark.operators import hash_content
        out_col = p.get("Hash Attribute Name", "hash.value").replace(".", "_")
        alg = {"MD5": "md5", "SHA-256": "sha256"}.get(
            p.get("Hash Algorithm", "MD5"), "md5")

        def fn(*dfs):
            return {"success": hash_content(_union(list(dfs)), content_col,
                                            out_col=out_col, algorithm=alg)}
        return fn

    if proc.ptype == "AttributesToJSON":
        from nifi_spark.operators import attributes_to_json
        attrs = [a.strip() for a in
                 p.get("Attributes List", "").split(",") if a.strip()]

        def fn(*dfs):
            df = _union(list(dfs))
            return {"success": attributes_to_json(
                df, attrs or [c for c in df.columns if c != content_col])}
        return fn

    if proc.ptype == "EvaluateJsonPath":
        from nifi_spark.operators import evaluate_json_path
        paths = {k: v for k, v in _dyn(proc).items()
                 if v.startswith("$")}

        def fn(*dfs):
            df = evaluate_json_path(_union(list(dfs)), content_col, paths)
            matched = None
            for name in paths:
                hit = F.col(name).isNotNull()
                matched = hit if matched is None else (matched & hit)
            if matched is None:
                return {"matched": df, "unmatched": df.limit(0)}
            return {"matched": df.filter(matched),
                    "unmatched": df.filter(~F.coalesce(matched,
                                                       F.lit(False)))}
        return fn

    if proc.ptype == "MergeContent":
        from nifi_spark.operators import merge_defragment
        fmt = p.get("Merge Format", "Binary Concatenation")
        if fmt.startswith("FlowFile Stream"):
            # FlowFile Stream, v3 / v2: pack each correlation group into
            # one multi-package stream (MergeContent.java MERGE_FORMAT_*)
            from nifi_spark.operators import package_flowfiles
            version = 2 if fmt.rstrip().endswith("v2") else 3
            corr = p.get("Correlation Attribute Name")
            if not corr:
                return None  # size-based binning is sink-side

            def fn(*dfs):
                df = _union(list(dfs))
                attr_cols = [c for c in df.columns if c != content_col]
                for c in attr_cols:
                    df = df.withColumn(c, F.col(c).cast("string"))
                out = package_flowfiles(df, content_col, attr_cols,
                                        version=version,
                                        group_cols=[corr])
                return {"merged": out.withColumnRenamed("package",
                                                        content_col)}
            return fn
        if p.get("Merge Strategy", "Bin-Packing Algorithm") != "Defragment":
            return None  # bin-packing needs sink-side sizing; not a stage
        sep = p.get("Delimiter Strategy Text", "")

        def fn(*dfs):
            df = _union(list(dfs))
            frag_col = ("fragment" if "fragment" in df.columns
                        else content_col)
            out = merge_defragment(df, frag_col, sep=sep)
            return {"merged": out.withColumnRenamed("content", content_col)
                    if content_col != "content" else out}
        return fn

    if proc.ptype == "DuplicateFlowFile":
        from nifi_spark.operators import duplicate_flowfile
        copies = int(p.get("Number of Copies", "1"))

        def fn(*dfs):
            return {"success": duplicate_flowfile(_union(list(dfs)),
                                                  copies)}
        return fn

    if proc.ptype == "LogAttribute":
        # pure observability in the reference (LogAttribute.java) — the
        # dataflow is identity; lineage rides the Flow's provenance counts
        def fn(*dfs):
            return {"success": _union(list(dfs))}
        return fn

    if proc.ptype == "UnpackContent":
        # Packaging Format: flowfile-stream-v3 / flowfile-stream-v2 /
        # flowfile-tar-v1 / zip (UnpackContent.java PACKAGING_FORMAT)
        fmt = p.get("Packaging Format", "use mime.type attribute")
        if fmt.startswith("flowfile"):
            from nifi_spark.operators import unpack_flowfiles
            version = {"flowfile-stream-v3": 3, "flowfile-stream-v2": 2,
                       "flowfile-tar-v1": 1}.get(fmt)

            def fn(*dfs):
                df = _union(list(dfs))
                id_cols = [c for c in df.columns if c != content_col]
                out = unpack_flowfiles(df, content_col, id_cols,
                                       version=version)
                return {"success": out.withColumnRenamed("content",
                                                         content_col)}
            return fn
        if fmt == "zip":
            from nifi_spark.operators import unpack_content

            def fn(*dfs):
                df = _union(list(dfs))
                id_cols = [c for c in df.columns if c != content_col]
                out = unpack_content(df, content_col, id_cols)
                return {"success": out.withColumnRenamed("entry",
                                                         content_col)}
            return fn
        return None  # mime-driven dispatch needs per-row branching

    if proc.ptype == "CompressContent":
        from nifi_spark.operators import compress_content
        # codec names must match operators.codec._CODECS keys — the
        # old "bzip2" -> "bz2" mapping crashed at run time
        codec = {"gzip": "gzip", "bzip2": "bzip2", "xz-lzma2": "lzma",
                 "snappy": "snappy", "snappy framed": "snappy framed",
                 }.get(p.get("Compression Format", "gzip"), "gzip")
        mode = ("decompress" if p.get("Mode", "compress") == "decompress"
                else "compress")

        def fn(*dfs):
            df = _union(list(dfs))
            c = df.schema[content_col].dataType.simpleString()
            if c != "binary":
                df = df.withColumn(content_col,
                                   F.encode(F.col(content_col), "utf-8"))
            return {"success": compress_content(df, content_col, codec,
                                                mode=mode)}
        return fn

    if proc.ptype == "RouteText":
        # Matching Strategy applies each dynamic property's value to
        # every LINE; one output relationship per property plus
        # unmatched (RouteText.java line-oriented contract)
        from nifi_spark.operators.routing import route_text
        strat = p.get("Matching Strategy", "Contains")
        routes_src = _dyn(proc)

        def _cond(v: str):
            line = F.col("line")
            if strat == "Equals":
                return line == v
            if strat == "Starts With":
                return line.startswith(v)
            if strat == "Ends With":
                return line.endswith(v)
            if strat == "Matches Regular Expression":
                return line.rlike(f"^(?:{v})$")
            if strat == "Contains Regular Expression":
                return line.rlike(v)
            return line.contains(v)            # Contains (default)

        def fn(*dfs):
            routed = route_text(_union(list(dfs)), content_col,
                                {name: _cond(v)
                                 for name, v in routes_src.items()})
            out = {name: routed.filter(F.col("route") == name)
                   .drop("route") for name in routes_src}
            out["unmatched"] = routed.filter(
                F.col("route") == "unmatched").drop("route")
            return out
        return fn

    if proc.ptype == "JoltTransformJSON":
        # jolt-transform names the operation; jolt-spec is the inline
        # JSON spec (a full chain when jolt-transform-chain)
        import json as _json
        from nifi_spark.operators.jolt import jolt_transform
        spec = _json.loads(p.get("jolt-spec", "{}"))
        ttype = p.get("jolt-transform", "jolt-transform-chain")
        if ttype != "jolt-transform-chain":
            op = ttype.replace("jolt-transform-", "")
            op = {"cardinality": "cardinality", "shift": "shift",
                  "default": "default", "remove": "remove",
                  "sort": "sort"}.get(op, op)
            spec = [{"operation": op, "spec": spec}]                 if op != "sort" else [{"operation": "sort"}]

        def fn(*dfs):
            out = jolt_transform(_union(list(dfs)), content_col, spec)
            return {"success": out.filter(F.col(content_col).isNotNull()),
                    "failure": out.filter(F.col(content_col).isNull())}
        return fn

    if proc.ptype == "SplitXml":
        from nifi_spark.operators.xml_split_depth import split_xml_depth
        depth = int(p.get("Split Depth", "1"))

        def fn(*dfs):
            out = split_xml_depth(_union(list(dfs)), content_col,
                                  split_depth=depth)
            return {"split": out.filter(F.col("relationship") == "split")
                    .drop("relationship")
                    .withColumnRenamed("fragment", content_col),
                    "failure": out.filter(
                        F.col("relationship") == "failure")
                    .drop("relationship")
                    .withColumnRenamed("fragment", content_col)}
        return fn

    if proc.ptype == "ModifyBytes":
        from nifi_spark.operators import modify_bytes

        def _nbytes(v: str) -> int:
            v = v.strip()
            for suf, mul in (("GB", 1 << 30), ("MB", 1 << 20),
                             ("KB", 1 << 10), ("B", 1)):
                if v.upper().endswith(suf):
                    return int(float(v[:-len(suf)].strip()) * mul)
            return int(v)
        head = _nbytes(p.get("Start Offset", "0 B"))
        tail = _nbytes(p.get("End Offset", "0 B"))
        remove_all = p.get("Remove All Content", "false") == "true"

        def fn(*dfs):
            df = _union(list(dfs))
            c = df.schema[content_col].dataType.simpleString()
            if c != "binary":
                df = df.withColumn(content_col,
                                   F.encode(F.col(content_col), "utf-8"))
            if remove_all:
                out = df.withColumn(
                    content_col,
                    F.lit(b"").cast("binary"))
            else:
                out = modify_bytes(df, content_col, drop_head=head,
                                   drop_tail=tail)
            return {"success": out}
        return fn

    if proc.ptype == "ParseCEF":
        from nifi_spark.operators.content import parse_cef

        def fn(*dfs):
            return parse_cef(_union(list(dfs)), content_col)
        return fn

    if proc.ptype == "TransformXml":
        # "XSLT file name" resolves through the same resolver as
        # ExecuteScript's Script File
        from nifi_spark.operators import transform_xml
        fname = p.get("XSLT file name", "")
        if script_resolver is None:
            return None
        stylesheet = script_resolver(fname)

        def fn(*dfs):
            out = transform_xml(_union(list(dfs)), content_col,
                                stylesheet=stylesheet)
            return {"success": out}
        return fn

    if proc.ptype == "DistributeLoad":
        from nifi_spark.operators import distribute_load
        n = int(p.get("Number of Relationships", "1"))
        # dynamic properties name relationship weights ("3" -> "2");
        # unnamed relationships get DistributeLoad's default weight 1.
        # "Order Column" (an engine extension) makes the hash-slot
        # assignment deterministic on that column instead of row order.
        weights = {str(i): int(_dyn(proc).get(str(i), "1"))
                   for i in range(1, n + 1)}
        order = _dyn(proc).get("Order Column")

        def fn(*dfs):
            out = distribute_load(_union(list(dfs)), weights,
                                  order_col=order)
            return {rel: out.filter(F.col("destination") == rel)
                    .drop("destination") for rel in weights}
        return fn

    if proc.ptype == "ControlRate":
        from nifi_spark.operators import control_rate
        cap = int(p.get("Maximum Rate", "10000").replace(",", ""))
        group = p.get("Grouping Attribute") or None

        def fn(*dfs):
            df = _union(list(dfs))
            # batch order: NiFi takes queue order; the batch analog
            # orders by the first column (the flow's id column by the
            # fixtures' convention) unless an explicit Order Column
            # dynamic property names one
            order = _dyn(proc).get("Order Column", df.columns[0])
            return {"success": control_rate(df, order, rows_per_batch=cap,
                                            group_col=group)}
        return fn

    if proc.ptype == "Base64EncodeContent":
        from nifi_spark.operators import decode_content, encode_content
        decode = p.get("Mode", "Encode").lower() == "decode"

        def fn(*dfs):
            df = _union(list(dfs))
            out = (decode_content(df, content_col, "base64",
                                  charset="utf-8") if decode
                   else encode_content(df, content_col, "base64"))
            return {"success": out}
        return fn

    if proc.ptype == "ConvertCharacterSet":
        from nifi_spark.operators import convert_character_set
        to_cs = p.get("Output Character Set", "UTF-8")
        from_cs = p.get("Input Character Set") or None

        def fn(*dfs):
            df = _union(list(dfs))
            binary = dict(df.dtypes)[content_col] == "binary"
            return convert_character_set(
                df, content_col, to_cs,
                from_charset=from_cs if binary else None)
        return fn

    if proc.ptype == "ScanAttribute":
        from nifi_spark.operators import scan_attribute
        attr = p.get("Attribute Pattern", "")
        dict_source = dictionaries.get(proc.name) or \
            dictionaries.get(proc.pid)
        if dict_source is None:
            return None  # needs its Dictionary File — caller supplies it

        def fn(*dfs):
            df = _union(list(dfs))
            return {"matched": scan_attribute(df, attr, dict_source, "term",
                                              "matched"),
                    "unmatched": scan_attribute(df, attr, dict_source,
                                                "term", "unmatched")}
        return fn

    if proc.ptype == "IdentifyMimeType":
        from nifi_spark.operators import identify_mime_type

        def fn(*dfs):
            return {"success": identify_mime_type(_union(list(dfs)),
                                                  content_col)}
        return fn

    if proc.ptype == "SplitJson":
        from nifi_spark.operators import split_json_array
        schema = _dyn(proc).get("Element Schema")  # engine extension
        jp = p.get("JsonPath Expression", "$[*]")
        if jp not in ("$[*]", "$.*", "$"):
            raise TemplateError(
                f"SplitJson only splits top-level arrays; JsonPath "
                f"{jp!r} is not supported")

        def fn(*dfs):
            df = _union(list(dfs))
            ok = df.filter(F.col(content_col).rlike(r"^\s*\["))
            return {"split": split_json_array(ok, content_col, schema),
                    "failure": df.filter(
                        ~F.col(content_col).rlike(r"^\s*\["))}
        return fn

    if proc.ptype == "EvaluateXPath":
        from nifi_spark.operators.content import evaluate_xpath
        # NiFi serializes its STATIC properties alongside the dynamic
        # XPath entries; treating them as paths would add always-empty
        # columns and silently route everything to unmatched (the
        # EvaluateJsonPath branch filters on '$' for the same reason)
        static = {"Destination", "Return Type", "Validate Data"}
        paths = {k: v for k, v in _dyn(proc).items() if k not in static}

        def fn(*dfs):
            df = evaluate_xpath(_union(list(dfs)), content_col, paths)
            matched = None
            for name in paths:
                hit = F.col(name) != ""
                matched = hit if matched is None else (matched & hit)
            if matched is None:
                return {"matched": df, "unmatched": df.limit(0)}
            return {"matched": df.filter(matched),
                    "unmatched": df.filter(~F.coalesce(matched,
                                                       F.lit(False)))}
        return fn

    if proc.ptype in ("LogAttribute", "FUNNEL", "PORT"):
        def fn(*dfs):
            return _union(list(dfs))
        return fn

    if proc.ptype == "RouteHL7":
        # dynamic property name = relationship, value = HL7 query
        # (RouteHL7.java:75-77); static property = Character Encoding
        queries = {k: v for k, v in _dyn(proc).items()
                   if k != "Character Encoding"}

        def fn(*dfs):
            from nifi_spark.operators import route_hl7
            return route_hl7(_union(list(dfs)), content_col, queries)
        return fn

    if proc.ptype == "ExtractHL7Attributes":
        def fn(*dfs):
            from nifi_spark.operators import extract_hl7_attributes
            df = _union(list(dfs))
            ids = [c for c in df.columns if c != content_col]
            return {"success": extract_hl7_attributes(df, content_col,
                                                      id_cols=ids)}
        return fn

    if proc.ptype == "DebugFlow":
        # DebugFlow.java — iteration-counter relationship cycling;
        # the batch analog derives cycle position from an ordinal
        # column (default lsn), zero-shuffle
        order = p.get("Order Column", "lsn")
        iters = {rel: int(p.get(f"FlowFile {label} Iterations", d))
                 for rel, label, d in
                 [("success", "Success", "1"),
                  ("failure", "Failure", "0"),
                  ("rollback", "Rollback", "0"),
                  ("exception", "Exception", "0")]}

        def fn(*dfs):
            from nifi_spark.operators import debug_flow
            return debug_flow(_union(list(dfs)), order_col=order,
                              success_iterations=iters["success"],
                              failure_iterations=iters["failure"],
                              rollback_iterations=iters["rollback"],
                              exception_iterations=iters["exception"])
        return fn

    if proc.ptype in ("ExecuteScript", "InvokeScriptedProcessor"):
        from nifi_spark.plans.scripted import compile_script_properties
        sp = compile_script_properties(p, script_resolver=script_resolver)

        def fn(*dfs):
            return sp(_union(list(dfs)))
        return fn

    # unknown type: a registered ScriptedProcessor (by template node
    # name, falling back to the short type) compiles in — this is how
    # flows carrying custom processors template-compile
    from nifi_spark.plans.scripted import registered_processor
    reg = (registered_processor(proc.name)
           or registered_processor(proc.ptype))
    if reg is not None:
        def fn(*dfs):
            return reg(_union(list(dfs)))
        return fn

    return None


def load_template(xml_text: str, sources: dict[str, DataFrame],
                  content_col: str = "content",
                  strict: bool = True,
                  dictionaries: dict[str, DataFrame] | None = None,
                  script_resolver=None) -> Flow:
    """Compile template XML into a runnable Flow.

    `sources` maps source-processor NAME (or id) → input DataFrame for
    every 0-input processor (GenerateFlowFile/GetFile/... positions).
    `dictionaries` maps a ScanAttribute processor's NAME (or id) → a
    one-column `term` DataFrame standing in for its Dictionary File
    (which a template references by node-local path).
    Returns the Flow; run it with `.run()` and read outputs by stage
    name (`"<proc name>"` or `"<proc name>.<relationship>"`).
    """
    procs, conns, tname = parse_template(xml_text)
    return _assemble_flow(procs, conns, tname, sources, content_col,
                          strict, dictionaries, script_resolver)


def parse_flow_xml(src) -> tuple[list[TProcessor],
                                 list[TConnection], str]:
    """NiFi's LIVE-flow serialization (conf/flow.xml[.gz] — the
    flowController document a running instance persists, distinct from
    the template export format) → the same (processors, connections,
    name) triple parse_template yields: <processor> nodes with
    <class> + <property><name>/<value> children, <funnel>s,
    <inputPort>/<outputPort>s, and <connection> nodes carrying
    sourceId/destinationId/<relationship>s, recursing through nested
    <processGroup>s. Accepts str, raw XML bytes, or gzip bytes."""
    if isinstance(src, bytes):
        if src[:2] == b"\x1f\x8b":
            import gzip
            src = gzip.decompress(src)
        src = src.decode("utf-8")
    root = ET.fromstring(src)
    if root.tag != "flowController":
        raise TemplateError(f"not a NiFi flow.xml (root <{root.tag}>)")
    rg = root.find("rootGroup")
    if rg is None:
        raise TemplateError("flow.xml has no <rootGroup>")
    name = (rg.findtext("name") or "flow").strip()
    procs: list[TProcessor] = []
    for p in rg.iter("processor"):
        props = {}
        for pr in p.findall("property"):
            k, v = pr.findtext("name"), pr.findtext("value")
            if k is not None and v is not None:
                props[k] = v
        full = (p.findtext("class") or "").strip()
        procs.append(TProcessor(
            pid=(p.findtext("id") or "").strip(),
            name=(p.findtext("name") or "").strip(),
            ptype=full.rsplit(".", 1)[-1],
            properties=props))
    for fu in rg.iter("funnel"):
        procs.append(TProcessor(pid=(fu.findtext("id") or "").strip(),
                                name="", ptype="FUNNEL"))
    for tag in ("inputPort", "outputPort"):
        for port in rg.iter(tag):
            procs.append(TProcessor(
                pid=(port.findtext("id") or "").strip(),
                name=(port.findtext("name") or "").strip(),
                ptype="PORT"))
    conns: list[TConnection] = []
    for c in rg.iter("connection"):
        s = c.findtext("sourceId")
        d = c.findtext("destinationId")
        rels = [r.text.strip() for r in c.findall("relationship")
                if r.text and r.text.strip()]
        if s and d:
            conns.append(TConnection(s.strip(), d.strip(), rels))
    return procs, conns, name


def load_flow_xml(src, sources: dict[str, DataFrame],
                  content_col: str = "content",
                  strict: bool = True,
                  dictionaries: dict[str, DataFrame] | None = None,
                  script_resolver=None) -> Flow:
    """Compile a live-instance flow.xml / flow.xml.gz into a runnable
    Flow — the restore-a-whole-NiFi-deployment path; same contract as
    load_template."""
    procs, conns, tname = parse_flow_xml(src)
    return _assemble_flow(procs, conns, tname, sources, content_col,
                          strict, dictionaries, script_resolver)


def _assemble_flow(procs: list[TProcessor], conns: list[TConnection],
                   tname: str, sources: dict[str, DataFrame],
                   content_col: str, strict: bool,
                   dictionaries: dict[str, DataFrame] | None,
                   script_resolver) -> Flow:
    by_id = {pr.pid: pr for pr in procs}

    def stage_id(pr: TProcessor) -> str:
        base = (pr.name or pr.ptype or pr.pid).replace(".", "_")
        # disambiguate duplicate display names by id suffix
        if sum(1 for o in procs
               if (o.name or o.ptype or o.pid).replace(".", "_") == base) > 1:
            return f"{base}_{pr.pid[:8]}"
        return base

    incoming: dict[str, list[str]] = {pr.pid: [] for pr in procs}
    has_input = {c.dst for c in conns}
    for c in conns:
        if c.src not in by_id or c.dst not in by_id:
            raise TemplateError(f"connection references unknown processor "
                                f"({c.src} -> {c.dst})")
        src_stage = stage_id(by_id[c.src])
        # a source-position stage emits ONE unnamed output — its
        # connection's selected relationship (e.g. GenerateFlowFile's
        # "success") is the whole stream, not a routed subset
        rels = [""] if c.src not in has_input else (c.relationships
                                                    or [""])
        for rel in rels:
            ref = f"{src_stage}.{rel}" if rel else src_stage
            incoming[c.dst].append(ref)

    flow = Flow(tname)
    for pr in procs:
        sid = stage_id(pr)
        inputs = incoming[pr.pid]
        if not inputs:                       # source position
            src = sources.get(pr.name) or sources.get(pr.pid)
            if src is None:
                raise TemplateError(
                    f"source processor {pr.name or pr.pid!r} needs an "
                    f"entry in sources=")
            flow.source(sid, (lambda s: (lambda: s))(src))
            continue
        fn = _build_stage(pr, content_col, dictionaries,
                          script_resolver)
        if fn is None:
            if strict:
                raise TemplateError(
                    f"unsupported processor type {pr.ptype!r} "
                    f"({pr.name or pr.pid}); pass strict=False to treat "
                    "it as a pass-through")
            fn = lambda *dfs: _union(list(dfs))   # noqa: E731
        flow.add(sid, fn, inputs=inputs)
    return flow
