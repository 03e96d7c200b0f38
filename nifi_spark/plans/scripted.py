"""Scripted processors — ExecuteScript / InvokeScriptedProcessor analogs.

NiFi ancestors: ExecuteScript
(nifi-scripting-bundle/.../ExecuteScript.java:160-210 — Script Body or
Script File evaluated with bindings `session`/`context`/`REL_SUCCESS`/
`REL_FAILURE` plus one binding per dynamic property; exactly one of
Script File / Script Body must be set,
AbstractScriptProcessor.java:117-133) and InvokeScriptedProcessor
(InvokeScriptedProcessor.java:58-90 — the script assigns a `processor`
variable; its getRelationships() are surfaced as the host processor's
relationships).

Spark-honest analog: this engine's processor model is a Python callable
`DataFrame -> DataFrame | dict[relationship, DataFrame]`, so a "script"
is Python source compiled ONCE, driver-side, into such a callable. The
script manipulates the PLAN (builds Column expressions over the input
DataFrame), not rows — a scripted stage costs exactly what the
expressions it emits cost under Catalyst; nothing row-at-a-time runs in
Python unless the script itself opts into mapInPandas. `Script Engine`
values other than python raise (declared boundary: the reference's
Jython/Groovy/JS engines are JSR-223 plugins; here the engine IS
Python). Trust model matches the reference: script bodies are
operator-authored flow configuration, executed with full driver
privileges — never feed untrusted template XML to `strict` scripted
compilation.

Script forms:

* **ExecuteScript position** — the script defines ``process(df) ->
  DataFrame | dict``; dict keys must be within {success, failure} (the
  host processor's fixed relationships, AbstractScriptProcessor.java:67-75).
  A bare DataFrame return means `{"success": df}`.
* **InvokeScriptedProcessor position** — the script assigns
  ``processor = ScriptedProcessor(name=..., relationships=[...],
  fn=...)``; outputs are validated against the declared relationships,
  exactly the reference's dynamic-relationship surfacing.

The binding namespace holds ``F`` (pyspark.sql.functions), ``spark``
(when given), ``log``, every dynamic property as a str binding (the
reference binds each dynamic property as a PropertyValue,
ExecuteScript.java:188-193), and ``ScriptedProcessor`` itself.

`register_processor` adds a ScriptedProcessor to a process-wide
registry; the template loader resolves unknown processor types against
it by template node name or type, which is what lets flows carrying
custom processors template-compile.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


class ScriptError(ValueError):
    pass


class ScriptedProcessor:
    """A user-defined processor: callable with declared relationships.

    `fn(*input_dfs) -> DataFrame | dict[rel, DataFrame]`. Calling the
    processor validates that every emitted relationship was declared —
    the contract InvokeScriptedProcessor enforces by surfacing only the
    scripted processor's own getRelationships()."""

    def __init__(self, name: str, fn: Callable,
                 relationships: "list[str] | tuple[str, ...]" = ("success",),
                 properties: dict[str, str] | None = None):
        if not relationships:
            raise ScriptError("a processor needs >= 1 relationship")
        self.name = name
        self.fn = fn
        self.relationships = tuple(relationships)
        self.properties = dict(properties or {})

    def __call__(self, *dfs: DataFrame) -> dict[str, DataFrame]:
        out = self.fn(*dfs)
        if isinstance(out, DataFrame):
            out = {self.relationships[0]: out}
        if not isinstance(out, dict):
            raise ScriptError(
                f"processor {self.name!r} returned {type(out).__name__}, "
                "expected DataFrame or dict[relationship, DataFrame]")
        undeclared = set(out) - set(self.relationships)
        if undeclared:
            raise ScriptError(
                f"processor {self.name!r} emitted undeclared "
                f"relationship(s) {sorted(undeclared)}; declared: "
                f"{list(self.relationships)}")
        for rel, df in out.items():
            if not isinstance(df, DataFrame):
                raise ScriptError(
                    f"processor {self.name!r} relationship {rel!r} is "
                    f"{type(df).__name__}, not a DataFrame")
        return out


# process-wide registry: template node name/type -> processor
_REGISTRY: dict[str, ScriptedProcessor] = {}


def register_processor(proc: ScriptedProcessor) -> ScriptedProcessor:
    _REGISTRY[proc.name] = proc
    return proc


def registered_processor(name: str) -> "ScriptedProcessor | None":
    return _REGISTRY.get(name)


def clear_registry() -> None:
    _REGISTRY.clear()


_EXEC_RELS = ("success", "failure")  # AbstractScriptProcessor.java:67-75


def _bindings(properties: dict[str, str] | None, spark=None) -> dict:
    import logging
    ns: dict = {"F": F, "ScriptedProcessor": ScriptedProcessor,
                "log": logging.getLogger("nifi_spark.scripted")}
    if spark is not None:
        ns["spark"] = ns["session"] = spark
    ns.update(properties or {})
    return ns


def compile_script(script_body: str, *, engine: str = "python",
                   properties: dict[str, str] | None = None,
                   spark=None) -> ScriptedProcessor:
    """Compile a script body into a ScriptedProcessor (driver-side,
    once — not per batch, unlike the reference's per-trigger eval which
    re-binds but caches the compiled script).

    The script either defines ``process(df)`` (ExecuteScript form,
    relationships fixed to success/failure) or assigns ``processor =
    ScriptedProcessor(...)`` (InvokeScriptedProcessor form)."""
    eng = (engine or "python").strip().lower()
    if eng not in ("python", "jython"):   # jython scripts ARE python
        raise ScriptError(
            f"Script Engine {engine!r} is not supported — this engine "
            "executes python scripts (the reference's Groovy/JS/lua/ruby "
            "JSR-223 engines are a declared boundary)")
    ns = _bindings(properties, spark)
    try:
        exec(compile(script_body, "<script body>", "exec"), ns)  # noqa: S102
    except SyntaxError as exc:
        raise ScriptError(f"script body does not compile: {exc}") from exc
    proc = ns.get("processor")
    if proc is not None:
        if not isinstance(proc, ScriptedProcessor):
            raise ScriptError(
                "the 'processor' variable must be a ScriptedProcessor "
                f"instance, got {type(proc).__name__} "
                "(InvokeScriptedProcessor.java:58-63's Processor contract)")
        return proc
    fn = ns.get("process")
    if not callable(fn):
        raise ScriptError(
            "script must define process(df) or assign processor = "
            "ScriptedProcessor(...)")
    return ScriptedProcessor("ExecuteScript", fn, _EXEC_RELS,
                             properties=properties)


def compile_script_properties(
        properties: dict[str, str], *,
        static_keys: "set[str] | None" = None,
        script_resolver: "Callable[[str], str] | None" = None,
        spark=None) -> ScriptedProcessor:
    """Compile from a NiFi property map (the template-XML surface):
    Script Engine + exactly one of Script Body / Script File
    (AbstractScriptProcessor.java:117-133); every remaining dynamic
    property becomes a str binding in the script namespace. Script File
    paths resolve through `script_resolver` (injectable, like the XSLT
    import resolver — templates reference node-local paths)."""
    body = properties.get("Script Body")
    path = properties.get("Script File")
    if bool(body) == bool(path):
        raise ScriptError(
            "exactly one of Script File or Script Body must be set")
    if path:
        if script_resolver is None:
            raise ScriptError(
                f"Script File {path!r} needs a script_resolver= to load "
                "(templates carry node-local paths)")
        body = script_resolver(path)
    static = {"Script Engine", "Script Body", "Script File",
              "Module Directory"} | (static_keys or set())
    dyn = {k: v for k, v in properties.items() if k not in static}
    return compile_script(body, engine=properties.get("Script Engine",
                                                      "python"),
                          properties=dyn, spark=spark)
