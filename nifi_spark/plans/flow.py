"""Flow — a small DAG builder with NiFi's named-relationship contract.

A stage is `fn(*input_dfs) -> DataFrame | dict[str, DataFrame]`; a dict
models a multi-relationship processor (RouteOnAttribute's branches,
ValidateCsv's valid/invalid). Downstream stages reference either a stage
id (its sole output) or `"stage.relationship"`.

Everything stays lazy: building and wiring the flow constructs one
Catalyst plan per terminal output; nothing executes until a sink/action
runs. This is the structural win over the reference — NiFi's connections
are materialized queues between independently scheduled operators
(ContinuallyRunProcessorTask.java:86-137), so no optimization crosses a
connection; here the whole flow is a single logical plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class FlowError(ValueError):
    pass


class Flow:
    def __init__(self, name: str = "flow"):
        self.name = name
        self._stages: dict[str, tuple[Callable, list[str]]] = {}
        self._order: list[str] = []

    # ---------------- construction ----------------
    def source(self, stage_id: str, fn: Callable[[], DataFrame]) -> "Flow":
        """A 0-input stage (GetFile/QueryDatabaseTable position)."""
        return self.add(stage_id, lambda: fn(), inputs=[])

    def add(self, stage_id: str, fn: Callable, inputs: list[str] | str = ()) -> "Flow":
        if stage_id in self._stages:
            raise FlowError(f"duplicate stage id {stage_id!r}")
        if "." in stage_id:
            raise FlowError("stage ids must not contain '.'")
        if isinstance(inputs, str):
            inputs = [inputs]
        self._stages[stage_id] = (fn, list(inputs))
        self._order.append(stage_id)
        return self

    # ---------------- execution ----------------
    def run(self, provenance=None, batch_id: int = 0) -> dict[str, DataFrame]:
        """Resolve the DAG; returns every produced output keyed by
        'stage' (single output) and 'stage.relationship' (routed).

        With `provenance` (a ProvenanceWriter), every resolved output
        emits a ROUTE/TRANSFORM count record — the RouteOnAttribute
        provenance.route parity (standard/RouteOnAttribute.java:220-264).
        OPT-IN because each count forces a job per output; leave off in
        lazy pipelines and account at the sink instead."""
        outputs: dict[str, DataFrame] = {}
        resolved: set[str] = set()
        remaining = list(self._order)
        while remaining:
            progressed = False
            for sid in list(remaining):
                fn, inputs = self._stages[sid]
                if not all(self._available(i, outputs, resolved) for i in inputs):
                    continue
                args = [self._fetch(i, outputs) for i in inputs]
                out = fn(*args)
                if isinstance(out, dict):
                    for rel, df in out.items():
                        if not isinstance(df, DataFrame):
                            raise FlowError(
                                f"{sid}.{rel} is not a DataFrame")
                        outputs[f"{sid}.{rel}"] = df
                elif isinstance(out, DataFrame):
                    outputs[sid] = out
                else:
                    raise FlowError(f"stage {sid!r} returned {type(out).__name__}")
                if provenance is not None:
                    new_keys = ([f"{sid}.{r}" for r in out]
                                if isinstance(out, dict) else [sid])
                    for key in new_keys:
                        df = outputs[key]
                        provenance.emit_counts(
                            df.sparkSession,
                            "ROUTE" if "." in key else "TRANSFORM",
                            batch_id, key, df.count())
                resolved.add(sid)
                remaining.remove(sid)
                progressed = True
            if not progressed:
                raise FlowError(
                    f"unresolvable inputs (cycle or missing stage): {remaining}")
        return outputs

    def _available(self, ref: str, outputs: dict, resolved: set[str]) -> bool:
        sid = ref.split(".", 1)[0]
        if sid not in self._stages:
            raise FlowError(f"unknown input stage {sid!r}")
        return sid in resolved

    def _fetch(self, ref: str, outputs: dict) -> DataFrame:
        if ref in outputs:
            return outputs[ref]
        raise FlowError(
            f"stage output {ref!r} not produced (relationships available: "
            f"{sorted(k for k in outputs if k.split('.', 1)[0] == ref.split('.', 1)[0])})")
