"""External-command content transform — the ExecuteStreamCommand analog.

NiFi streams each FlowFile's content through a spawned process
(nifi-nar-bundles/nifi-standard-bundle/nifi-standard-processors/src/main/
java/org/apache/nifi/processors/standard/ExecuteStreamCommand.java —
one process per FlowFile, stdin = content, stdout = result;
ExecuteProcess.java is the source-only sibling). One process per row
does not survive scale; here the default feeds a whole Arrow batch of
rows through ONE process invocation over newline-delimited stdin, so the
per-process cost amortizes across ~10^4 rows. The command must be
line-preserving 1:1 (sed/tr/awk/grep -c style filters); `mode="whole"`
is the NiFi-faithful one-process-per-row path for commands that consume
whole documents.

The command binary must exist on every executor (same contract as any
NiFi node). Content containing newlines is rejected in lines mode —
replace or strip them upstream (replace_text) first.
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def execute_stream_command(df: DataFrame, content_col: str,
                           argv: list[str], out_col: str = "stdout",
                           mode: str = "lines") -> DataFrame:
    """Pipe `content_col` through `argv`; stdout lands in `out_col`.

    mode="lines": one subprocess per Arrow batch, newline-framed 1:1.
    mode="whole": one subprocess per row (content may contain anything).
    """
    if mode not in ("lines", "whole"):
        raise ValueError(f"unknown mode {mode!r}")
    schema = T.StructType(df.schema.fields
                          + [T.StructField(out_col, T.StringType())])
    idx = [f.name for f in df.schema.fields].index(content_col)

    def run_lines(batches):
        for pdf in batches:
            vals = pdf.iloc[:, idx].astype(str)
            if vals.str.contains("\n").any():
                raise ValueError(
                    "execute_stream_command(mode='lines'): content "
                    "contains newlines; strip them upstream or use "
                    "mode='whole'")
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            inp = ("\n".join(vals) + "\n").encode()
            proc = subprocess.run(argv, input=inp, capture_output=True,
                                  check=True)
            lines = proc.stdout.decode().split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            if len(lines) != len(pdf):
                raise ValueError(
                    f"command {argv!r} returned {len(lines)} lines for "
                    f"{len(pdf)} input rows — not line-preserving; use "
                    "mode='whole'")
            out = pdf.copy()
            out[out_col] = lines
            yield out

    def run_whole(batches):
        for pdf in batches:
            res = [subprocess.run(argv, input=str(v).encode(),
                                  capture_output=True, check=True)
                   .stdout.decode()
                   for v in pdf.iloc[:, idx]]
            out = pdf.copy()
            out[out_col] = res
            yield out

    return df.mapInPandas(run_lines if mode == "lines" else run_whole,
                          schema)


def execute_process(spark, argv: list[str],
                    batch_duration_rows: int | None = None,
                    content_col: str = "content",
                    encoding: str = "utf-8") -> DataFrame:
    """Source-mode external command — the ExecuteProcess analog
    (standard/ExecuteProcess.java:1-502: no incoming FlowFiles, spawn
    the command, capture stdout, emit it as content; 'Batch Duration'
    optionally splits the stream into multiple FlowFiles).

    Runs the process ONCE on the driver (the reference runs it once on
    one node — a source command is inherently single-instance; its
    OUTPUT is then parallelized into a DataFrame for everything
    downstream). Without batch_duration_rows the whole stdout is one
    row, like the reference without Batch Duration; with it, stdout is
    split into newline-framed groups of that many lines — the row-count
    analog of the reference's time-based batching, which has no meaning
    in batch execution. Rows carry (part, content). Non-zero exit
    raises (the reference penalizes and yields)."""
    proc = subprocess.run(argv, capture_output=True, check=True)
    text = proc.stdout.decode(encoding)
    if batch_duration_rows is None:
        rows = [(0, text)]
    else:
        lines = text.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        n = max(1, batch_duration_rows)
        rows = [(i // n, "\n".join(lines[i:i + n]))
                for i in range(0, len(lines), n)] or [(0, "")]
    return spark.createDataFrame(rows, f"part long, {content_col} string")
