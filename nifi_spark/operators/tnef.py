"""TNEF (winmail.dat) — ExtractTNEFAttachments analog, pure stdlib.

NiFi ancestor: ExtractTNEFAttachments
(nifi-email-bundle/.../ExtractTNEFAttachments.java — poi-hsmf
HMEFMessage; one FlowFile per attachment with `filename`, original to
'original', unparseable to 'failure'). The wire format is MS-OXTNEF:
LE u32 signature 0x223E9F78, u16 attach key, then attribute records
``u8 level (1=message, 2=attachment) | u16 id | u16 type | u32 length |
data | u16 checksum`` where checksum = sum(data bytes) mod 2^16 —
validated here record-by-record (a bad checksum routes the whole file
to 'failure', matching the reference's parse-failure contract).

Attachment boundaries follow attAttachRendData (0x9002); data =
attAttachData (0x800F); the reported `filename` is attAttachTitle
(0x8010, the 8.3 name) — REFERENCE-EXACT: the fixtures carry long
names in the attAttachment (0x9005) MAPI property stream
(PR_ATTACH_LONG_FILENAME 0x3707), but the reference's own test expects
the title (``MINIFI~1.PNG``), so the title is the primary name and the
MAPI long filename is surfaced separately as `long_filename`.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

TNEF_SIGNATURE = 0x223E9F78

ATT_ATTACH_REND_DATA = 0x9002
ATT_ATTACH_DATA = 0x800F
ATT_ATTACH_TITLE = 0x8010
ATT_ATTACHMENT = 0x9005          # MAPI property stream
ATT_MESSAGE_CLASS = 0x8008
ATT_TNEF_VERSION = 0x9006

PR_ATTACH_LONG_FILENAME = 0x3707

_VARIABLE_TYPES = {0x001E, 0x001F, 0x0102, 0x000D}
_FIXED_SIZES = {0x0002: 4, 0x0003: 4, 0x0004: 4, 0x0005: 8, 0x0006: 8,
                0x0007: 8, 0x000A: 4, 0x000B: 4, 0x0014: 8, 0x0040: 8,
                0x0048: 16}


class TnefError(ValueError):
    pass


def _mapi_props(data: bytes) -> dict[int, object]:
    """Minimal MAPI property-stream walk: returns {prop_id: first
    value} for string/binary props; stops quietly at anything outside
    the implemented subset (named props, unknown types)."""
    out: dict[int, object] = {}
    try:
        (count,) = struct.unpack_from("<I", data, 0)
        pos = 4
        for _ in range(count):
            ptype, pid = struct.unpack_from("<HH", data, pos)
            pos += 4
            if pid >= 0x8000:          # named property: GUID + kind
                guid_kind = struct.unpack_from("<16sI", data, pos)
                pos += 20
                if guid_kind[1] == 1:  # string-named: length + padded
                    (nlen,) = struct.unpack_from("<I", data, pos)
                    pos += 4 + (nlen + 3) // 4 * 4
                else:
                    pos += 4
            multi = bool(ptype & 0x1000)
            base = ptype & 0x0FFF
            if base in _VARIABLE_TYPES:
                (nvals,) = struct.unpack_from("<I", data, pos)
                pos += 4
                vals = []
                for _v in range(nvals):
                    (vlen,) = struct.unpack_from("<I", data, pos)
                    pos += 4
                    vals.append(data[pos:pos + vlen])
                    pos += (vlen + 3) // 4 * 4
                if vals and pid not in out:
                    v = vals[0]
                    if base == 0x001E:
                        out[pid] = v.rstrip(b"\x00").decode(
                            "latin-1", errors="replace")
                    elif base == 0x001F:
                        out[pid] = v.decode("utf-16-le",
                                            errors="replace").rstrip("\x00")
                    else:
                        out[pid] = v
            elif base in _FIXED_SIZES:
                size = _FIXED_SIZES[base]
                if multi:
                    (nvals,) = struct.unpack_from("<I", data, pos)
                    pos += 4 + nvals * size
                else:
                    out.setdefault(
                        pid, struct.unpack_from(
                            "<q" if size == 8 else "<i" if size == 4
                            else "<h", data, pos)[0]
                        if size in (2, 4, 8) else data[pos:pos + size])
                    pos += max(size, 4)
            else:
                break                    # unknown type: stop the walk
    except struct.error:
        pass
    return out


def parse_tnef(blob: bytes) -> dict:
    """→ {message_class, body?, attachments: [{title, long_filename,
    data}]}. Raises TnefError on bad signature/framing/checksum."""
    if len(blob) < 6:
        raise TnefError("too short for a TNEF stream")
    sig, _key = struct.unpack_from("<IH", blob, 0)
    if sig != TNEF_SIGNATURE:
        raise TnefError(f"bad TNEF signature {sig:#010x}")
    pos = 6
    message_class = ""
    attachments: list[dict] = []
    cur: "dict | None" = None
    while pos < len(blob):
        if pos + 9 > len(blob):
            raise TnefError("truncated attribute header")
        level = blob[pos]
        aid, _atype, ln = struct.unpack_from("<HHI", blob, pos + 1)
        data = blob[pos + 9:pos + 9 + ln]
        if len(data) != ln or pos + 11 + ln > len(blob):
            raise TnefError("truncated attribute data")
        (ck,) = struct.unpack_from("<H", blob, pos + 9 + ln)
        if (sum(data) & 0xFFFF) != ck:
            raise TnefError(f"checksum mismatch on attribute {aid:#06x}")
        pos += 11 + ln
        if level == 1:
            if aid == ATT_MESSAGE_CLASS:
                message_class = data.rstrip(b"\x00").decode(
                    "latin-1", errors="replace")
            continue
        if level != 2:
            raise TnefError(f"bad attribute level {level}")
        if aid == ATT_ATTACH_REND_DATA:
            cur = {"title": "", "long_filename": None, "data": b""}
            attachments.append(cur)
        elif cur is not None:
            if aid == ATT_ATTACH_DATA:
                cur["data"] = data
            elif aid == ATT_ATTACH_TITLE:
                cur["title"] = data.rstrip(b"\x00").decode(
                    "latin-1", errors="replace")
            elif aid == ATT_ATTACHMENT:
                lf = _mapi_props(data).get(PR_ATTACH_LONG_FILENAME)
                if isinstance(lf, str):
                    cur["long_filename"] = lf
    return {"message_class": message_class, "attachments": attachments}


def build_tnef(attachments: list[tuple[str, bytes]],
               message_class: str = "IPM.Microsoft Mail.Note") -> bytes:
    """Encoder mirror (fixture synthesis): message class + one
    (title, data) record pair per attachment, checksums computed the
    same way the parser validates them."""
    def rec(level: int, aid: int, atype: int, data: bytes) -> bytes:
        return (struct.pack("<BHHI", level, aid, atype, len(data))
                + data + struct.pack("<H", sum(data) & 0xFFFF))

    out = bytearray(struct.pack("<IH", TNEF_SIGNATURE, 0x0F12))
    out += rec(1, ATT_TNEF_VERSION, 0x0008, struct.pack("<I", 0x00010000))
    out += rec(1, ATT_MESSAGE_CLASS, 0x0007,
               message_class.encode() + b"\x00")
    for title, data in attachments:
        out += rec(2, ATT_ATTACH_REND_DATA, 0x0006, b"\x01\x00" + b"\x00" * 12)
        out += rec(2, ATT_ATTACH_DATA, 0x0006, data)
        out += rec(2, ATT_ATTACH_TITLE, 0x0001, title.encode() + b"\x00")
    return bytes(out)


_SCHEMA_SUFFIX = (", relationship string, attach_idx int, "
                  "filename string, long_filename string, size int, "
                  "payload_hexmd5 string")


def extract_tnef_attachments(df: DataFrame, content_col: str,
                             id_cols: "list[str] | None" = None
                             ) -> DataFrame:
    """Long-format extraction with the reference's routing: one row per
    attachment (relationship='attachments'), one 'original' row per
    parseable file (attach_idx NULL), 'failure' rows for bad streams.
    payload_hexmd5 = md5 of the UPPER-hex payload (the email_ops oracle
    convention — DuckDB md5 is VARCHAR-only)."""
    import hashlib

    id_cols = id_cols or []
    cols = df.select(*id_cols, content_col)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.select(*id_cols).schema.fields)
    out_schema += _SCHEMA_SUFFIX

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                *ids, content = tup
                try:
                    msg = parse_tnef(bytes(content))
                except TnefError as exc:
                    rows.append((*ids, "failure", None, str(exc), None,
                                 None, None))
                    continue
                rows.append((*ids, "original", None,
                             msg["message_class"], None, None, None))
                for i, att in enumerate(msg["attachments"]):
                    hexmd5 = hashlib.md5(
                        att["data"].hex().upper().encode()).hexdigest()
                    rows.append((*ids, "attachments", i, att["title"],
                                 att["long_filename"],
                                 len(att["data"]), hexmd5))
            yield pd.DataFrame(rows, columns=[
                *pdf.columns[:-1], "relationship", "attach_idx",
                "filename", "long_filename", "size", "payload_hexmd5"])

    return cols.mapInPandas(run, schema=out_schema)


__all__ = ["TnefError", "build_tnef", "extract_tnef_attachments",
           "parse_tnef"]
