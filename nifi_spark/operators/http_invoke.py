"""InvokeHTTP — per-row HTTP exchange with NiFi's relationship routing.

Reference behavior (standard/InvokeHTTP.java:382-413,891-919): the
request row routes by response class — 2xx → ``original`` (+ a
``response`` row carrying the body), 5xx → ``retry``, 1xx/3xx/4xx →
``no_retry``, transport exception → ``failure`` — and the response
status rides as attributes (invokehttp.status.code / .message here as
``status_code`` / ``error`` columns).

Execution model: the exchange runs inside Arrow-batched ``mapInPandas``
on the executors (exactly where NiFi's onTrigger runs it — one
concurrent request per partition; compose with ``control_rate`` /
``repartition(n)`` to set the request-rate ceiling, NiFi's concurrent
tasks knob). The transport is injectable — tests and the correctness
gate use deterministic fakes; the default is a urllib GET/POST. No
driver involvement, no shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# transport(url, method, body|None) -> (status_code, response_body)
Transport = Callable[[str, str, bytes | None], tuple[int, bytes]]


def _urllib_transport(url: str, method: str, body: bytes | None
                      ) -> tuple[int, bytes]:
    import urllib.error
    import urllib.request
    req = urllib.request.Request(url, data=body, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:   # non-2xx still has a status
        return e.code, e.read()


def invoke_http(df: DataFrame, url_col: str, method: str = "GET",
                body_col: str | None = None,
                transport: Transport | None = None) -> DataFrame:
    """One HTTP exchange per row → original columns + ``status_code``
    (int, -1 on transport failure), ``response_body`` (binary, NULL on
    failure), ``error`` (string, NULL on success)."""
    transport = transport or _urllib_transport
    passthrough = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)
    schema = (f"{passthrough}, status_code int, response_body binary, "
              "error string")
    cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            status, bodies, errors = [], [], []
            for _, r in pdf.iterrows():
                body = None
                if body_col is not None and r[body_col] is not None:
                    v = r[body_col]
                    body = v.encode() if isinstance(v, str) else bytes(v)
                try:
                    code, resp = transport(str(r[url_col]), method, body)
                    status.append(code)
                    bodies.append(resp)
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — failure routing
                    status.append(-1)
                    bodies.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            out = pdf[cols].copy()
            out["status_code"] = pd.array(status, dtype="int32")
            out["response_body"] = bodies
            out["error"] = errors
            yield out

    return df.mapInPandas(run, schema=schema)


def route_http_response(df: DataFrame) -> dict[str, DataFrame]:
    """Split an invoke_http result by the reference's relationship rules
    (InvokeHTTP.java:891-919). Returns {original, response, retry,
    no_retry, failure} — ``response`` is the 2xx rows (body included),
    ``original`` the same rows as the request-side passthrough."""
    code = F.col("status_code")
    ok = df.filter((code >= 200) & (code < 300))
    return {
        "original": ok,
        "response": ok,
        "retry": df.filter(code >= 500),
        "no_retry": df.filter(((code >= 100) & (code < 200))
                              | ((code >= 300) & (code < 500))),
        "failure": df.filter(code == -1),
    }
