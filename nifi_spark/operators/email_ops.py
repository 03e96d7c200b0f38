"""Email parsing: ExtractEmailHeaders / ExtractEmailAttachments analogs.

Reference: nifi-email-bundle — ExtractEmailHeaders.java (RFC-822 headers
to ``email.headers.*`` attributes), ExtractEmailAttachments.java (one
flowfile per MIME attachment, carrying filename + parent id). Mail
archives are a real corpus source (and the reference's own test strategy
builds messages with javax.mail); here the stdlib ``email`` package does
the MIME heavy lifting inside an Arrow-batched ``mapInPandas`` — the
message is the unit of parallelism, zero shuffles, malformed messages
route as error rows (the WARC/codec seam contract).

Fixtures (``synthesize_email``) build real multipart messages through
``email.mime`` with DETERMINISTIC boundaries, so the driver gate's DuckDB
oracle regenerates every header and attachment digest from closed-form
formulas.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F


def parse_email_message(raw: bytes) -> dict:
    """One RFC-822/MIME message -> headers + text body + attachments."""
    import email
    from email import policy

    msg = email.message_from_bytes(raw, policy=policy.default)
    headers = {k.lower(): str(v) for k, v in msg.items()}
    body_parts: list[str] = []
    attachments: list[dict] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        fname = part.get_filename()
        payload = part.get_payload(decode=True) or b""
        if fname or "attachment" in str(part.get("Content-Disposition", "")):
            attachments.append({
                "filename": fname,
                "mime": part.get_content_type(),
                "payload": payload,
            })
        elif part.get_content_type() == "text/plain":
            body_parts.append(payload.decode(
                part.get_content_charset() or "utf-8", "replace"))
    return {"headers": headers, "body": "\n".join(body_parts),
            "attachments": attachments}


_HEADERS_SCHEMA = ("id long, relationship string, subject string, "
                   "sender string, recipients string, message_id string, "
                   "n_attachments int, body string")


def extract_email_headers(df: DataFrame, content_col: str = "payload",
                          id_col: str = "id") -> DataFrame:
    """One row per message with the reference's core header set
    (ExtractEmailHeaders.java: subject / from / to / message-id) plus
    the text body and attachment count."""
    import pandas as pd

    cols = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(content_col).alias("_raw"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["_raw"]):
                rid = int(rid)
                try:
                    m = parse_email_message(bytes(raw))
                    h = m["headers"]
                    rows.append((rid, "success", h.get("subject"),
                                 h.get("from"), h.get("to"),
                                 h.get("message-id"),
                                 len(m["attachments"]), m["body"]))
                except Exception:  # noqa: BLE001 — malformed routes
                    rows.append((rid, "failure", None, None, None, None,
                                 None, None))
            yield pd.DataFrame(rows, columns=[
                "id", "relationship", "subject", "sender", "recipients",
                "message_id", "n_attachments", "body"])

    return cols.mapInPandas(run, schema=_HEADERS_SCHEMA)


_ATTACH_SCHEMA = ("id long, attach_idx int, filename string, mime string, "
                  "size int, payload_md5 string, payload binary")


def extract_email_attachments(df: DataFrame, content_col: str = "payload",
                              id_col: str = "id") -> DataFrame:
    """One row per MIME attachment (ExtractEmailAttachments.java:
    filename + parent correlation; here parent id + index + digest)."""
    import pandas as pd

    cols = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(content_col).alias("_raw"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf["id"], pdf["_raw"]):
                rid = int(rid)
                try:
                    m = parse_email_message(bytes(raw))
                except Exception:  # noqa: BLE001
                    continue
                for i, a in enumerate(m["attachments"]):
                    rows.append((rid, i, a["filename"], a["mime"],
                                 len(a["payload"]),
                                 hashlib.md5(a["payload"]).hexdigest(),
                                 a["payload"]))
            yield pd.DataFrame(rows, columns=[
                "id", "attach_idx", "filename", "mime", "size",
                "payload_md5", "payload"])

    return cols.mapInPandas(run, schema=_ATTACH_SCHEMA)


# ------------------------------------------------------------- fixtures

def _synth_email(i: int) -> bytes:
    """Deterministic multipart message: text body + (i % 3) attachments.
    Formula contract (the gate oracle's SQL twin):
      subject  = 'Report ' || (i % 20)
      from     = 'user' || (i % 7) || '@siteA'
      to       = 'list' || (i % 5) || '@siteB'
      msg-id   = '<m' || i || '@siteA>'
      body     = 'body w' || (i * 13 % 101) || ' w' || (i * 29 % 101)
      attachment j: name 'f{i}_{j}.bin', bytes = (i*7 + j*11 + t) % 256
                    for t in range(16 + (i + j) % 9)
    """
    from email.mime.application import MIMEApplication
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    k = i % 3
    body = f"body w{i * 13 % 101} w{i * 29 % 101}"
    if k == 0:
        msg = MIMEText(body)
    else:
        msg = MIMEMultipart()
        msg.set_boundary(f"----=_b{i}")          # determinism: no random
        msg.attach(MIMEText(body))
        for j in range(k):
            blob = bytes((i * 7 + j * 11 + t) % 256
                         for t in range(16 + (i + j) % 9))
            part = MIMEApplication(blob, "octet-stream")
            part.add_header("Content-Disposition", "attachment",
                            filename=f"f{i}_{j}.bin")
            msg.attach(part)
    msg["Subject"] = f"Report {i % 20}"
    msg["From"] = f"user{i % 7}@siteA"
    msg["To"] = f"list{i % 5}@siteB"
    msg["Message-ID"] = f"<m{i}@siteA>"
    return msg.as_bytes()


def synthesize_email(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Fixture source: real RFC-822/MIME messages through the stdlib
    encoder, deterministic boundaries; formula contract at _synth_email."""
    import pandas as pd

    ids = df.select(F.col(id_col).cast("long").alias("id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(int(i), _synth_email(int(i))) for i in pdf["id"]],
                columns=["id", "payload"])

    return ids.mapInPandas(gen, schema="id long, payload binary")
