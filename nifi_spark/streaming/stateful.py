"""Arbitrary stateful streaming operators — applyInPandasWithState.

NiFi processors hold per-key state across triggers through the
StateManager (nifi-api/.../state/StateManager.java:67-101); Spark's
analog for arbitrary (non-windowed) keyed state is
`applyInPandasWithState`: per-key GroupState persisted in the streaming
state store, Arrow-batched user logic, exactly-once with the checkpoint.

Two operators:
* `sessionize_stream` — running per-user session/event counters with an
  inactivity gap (the streaming twin of the batch `user_sessionization`
  gate query; sessions spanning micro-batch boundaries count ONCE
  because the last-event timestamp lives in state).
* `rate_limit_stream` — ControlRate's per-group form
  (standard/ControlRate.java:70-134 with a grouping attribute): at most
  `max_per_trigger` rows per key pass each micro-batch, the overflow is
  counted in state and dropped (a streaming sink can't hold NiFi's
  penalized queue; the suppressed count preserves the accounting).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = ("user_id long, n_sessions long, n_events long, "
                  "last_ts_us long")
_SESSION_STATE = "n_sessions long, n_events long, last_ts_us long"


def sessionize_stream(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts",
                      gap_sec: int = 1800) -> DataFrame:
    """Per-key running sessionization over a stream. Emits one row per
    key per micro-batch with cumulative (n_sessions, n_events); input
    `ts_col` must be a timestamp column."""
    gap_us = gap_sec * 1_000_000

    def run(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        n_sessions, n_events, last_ts = (state.get if state.exists
                                         else (0, 0, None))
        ts = pd.concat([p[ts_col] for p in pdfs]).sort_values()
        us = (ts.astype("int64")).to_numpy()  # ns -> handled below
        # pandas datetime64[ns/us] → integer epoch micros
        unit_div = 1000 if ts.dtype.kind == "M" and ts.dt.unit == "ns" else 1
        us = us // unit_div
        for t in us:
            if last_ts is None or t - last_ts > gap_us:
                n_sessions += 1
            last_ts = int(t)
            n_events += 1
        state.update((n_sessions, n_events, last_ts))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events],
                            "last_ts_us": [last_ts]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(run, SESSION_OUTPUT, _SESSION_STATE,
                                    "update", GroupStateTimeout.NoTimeout))


_RATE_STATE = "passed long, suppressed long"


def rate_limit_stream(df: DataFrame, key_col: str, value_col: str,
                      max_per_trigger: int = 1000) -> DataFrame:
    """Pass at most max_per_trigger rows per key per micro-batch; state
    accumulates total passed/suppressed per key. Output: one row per
    passed input row plus the key's running totals."""
    out_schema = (f"{key_col} string, {value_col} string, "
                  "passed_total long, suppressed_total long")

    def run(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        passed, suppressed = state.get if state.exists else (0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        take = rows.head(max_per_trigger)
        passed += len(take)
        suppressed += len(rows) - len(take)
        state.update((passed, suppressed))
        if len(take):
            yield pd.DataFrame({
                key_col: take[key_col].astype(str),
                value_col: take[value_col].astype(str),
                "passed_total": passed,
                "suppressed_total": suppressed,
            })

    return (df.groupBy(key_col)
            .applyInPandasWithState(run, out_schema, _RATE_STATE,
                                    "update", GroupStateTimeout.NoTimeout))


_DEDUP_STATE = "first_id long, n_seen long"


def detect_duplicate_stream(df: DataFrame, key_cols: list[str],
                            id_col: str = "event_id",
                            age_off_ms: int | None = None) -> DataFrame:
    """Streaming DetectDuplicate with the reference's routing semantics
    (standard/DetectDuplicate.java:58-96): the FIRST row per key routes
    non-duplicate, every later sighting routes duplicate, and the cache
    entry ages off after `age_off_ms` (the Age Off Duration property —
    here a ProcessingTime GroupState timeout; after expiry the next
    sighting is "first" again, exactly like the reference's
    DistributedMapCache TTL).

    Differences from `dedup_stream` (dropDuplicatesWithinWatermark):
    duplicates are EMITTED with is_duplicate=true + a running dup_count
    rather than dropped — NiFi routes them to a relationship, it never
    deletes data. Within a micro-batch rows are ordered by `id_col` so
    the surviving "first" is deterministic (min id), which is what lets
    the gate oracle replay this in SQL as a row_number() window.

    State per key: (first_id, n_seen) — 16 bytes; at 10^9 live keys the
    store shards across executors like any keyed state, and age-off
    bounds it to the active-key working set."""
    key_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{k} {key_fields[k]}" for k in key_cols]
                           + [f"{id_col} {key_fields[id_col]}",
                              "is_duplicate boolean", "dup_count long"])

    def run(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=list(key_cols) + [id_col, "is_duplicate", "dup_count"])
            return
        first_id, n_seen = (state.get if state.exists else (None, 0))
        pdf = pd.concat(list(pdfs)).sort_values(id_col)
        ids = pdf[id_col].to_list()
        rows = []
        for eid in ids:
            dup = first_id is not None
            if first_id is None:
                first_id = int(eid)
            rows.append(dict(zip(key_cols, key)) |
                        {id_col: eid, "is_duplicate": dup,
                         "dup_count": n_seen})
            n_seen += 1
        state.update((first_id, n_seen))
        if age_off_ms is not None:
            state.setTimeoutDuration(age_off_ms)
        yield pd.DataFrame(rows)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if age_off_ms
               else GroupStateTimeout.NoTimeout)
    return (df.groupBy(*key_cols)
            .applyInPandasWithState(run, out_schema, _DEDUP_STATE,
                                    "append", timeout))
