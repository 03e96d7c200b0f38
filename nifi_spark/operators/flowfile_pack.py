"""FlowFile packaging formats v1/v2/v3 — MergeContent's FlowFileStream
output formats and UnpackContent's flowfile-v* input formats.

Reference parity (format studied from behavior/spec, implemented fresh):
* v3 — magic ``NiFiFF3``, then attribute count, (key,value) string pairs,
  an 8-byte big-endian content length, and the raw content; packages
  concatenate back-to-back in one stream
  (nifi-commons/nifi-flowfile-packager/.../FlowFilePackagerV3.java:31-46,
  FlowFileUnpackagerV3.java). Length fields are 2 bytes big-endian, with
  0xFFFF escaping to a 4-byte length (values >= 65535).
* v2 — the same attribute/content layout without the magic header
  (FlowFilePackagerV2.java:25-59).
* v1 — a TAR archive holding ``flowfile.attributes`` (Java properties
  XML) + ``flowfile.content`` (FlowFilePackagerV1.java:31-80); stdlib
  tarfile both ways, attributes escaped/parsed with ElementTree.

Spark surface: ``package_flowfiles`` packs one package per row (or one
multi-package stream per group — the MergeContent FlowFileStream merge
format), ``unpack_flowfiles`` explodes a packed stream back to rows with
an attributes map + content. Both are Arrow-batched mapInPandas passes —
the codec is pure bytes→bytes, parallelism == partition count.
"""

from __future__ import annotations

import io
import struct
import tarfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame

MAGIC_V3 = b"NiFiFF3"


# ---------------------------------------------------------------- lengths

def _write_len(out: bytearray, n: int) -> None:
    if n < 0xFFFF:
        out += struct.pack(">H", n)
    else:
        out += b"\xff\xff" + struct.pack(">I", n)


def _read_len(buf: bytes, pos: int) -> tuple[int, int]:
    (n,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    if n == 0xFFFF:
        (n,) = struct.unpack_from(">I", buf, pos)
        pos += 4
    return n, pos


# ---------------------------------------------------------------- v2 / v3

def _pack_binary(attrs: dict, content: bytes, magic: bytes) -> bytes:
    out = bytearray(magic)
    _write_len(out, len(attrs))
    for k, v in attrs.items():
        kb, vb = str(k).encode(), str(v).encode()
        _write_len(out, len(kb))
        out += kb
        _write_len(out, len(vb))
        out += vb
    out += struct.pack(">Q", len(content))
    out += content
    return bytes(out)


def pack_v3(attrs: dict, content: bytes) -> bytes:
    return _pack_binary(attrs, content, MAGIC_V3)


def pack_v2(attrs: dict, content: bytes) -> bytes:
    return _pack_binary(attrs, content, b"")


def _unpack_binary(blob: bytes, magic: bytes) -> list[tuple[dict, bytes]]:
    """Consecutive packages in one stream → [(attrs, content), ...]."""
    out, pos = [], 0
    while pos < len(blob):
        if magic:
            if blob[pos:pos + len(magic)] != magic:
                raise ValueError(
                    f"not a FlowFile v3 stream at offset {pos}")
            pos += len(magic)
        n_attrs, pos = _read_len(blob, pos)
        attrs = {}
        for _ in range(n_attrs):
            klen, pos = _read_len(blob, pos)
            k = blob[pos:pos + klen].decode()
            pos += klen
            vlen, pos = _read_len(blob, pos)
            attrs[k] = blob[pos:pos + vlen].decode()
            pos += vlen
        (clen,) = struct.unpack_from(">Q", blob, pos)
        pos += 8
        out.append((attrs, blob[pos:pos + clen]))
        pos += clen
    return out


def unpack_v3(blob: bytes) -> list[tuple[dict, bytes]]:
    return _unpack_binary(blob, MAGIC_V3)


def unpack_v2(blob: bytes) -> list[tuple[dict, bytes]]:
    return _unpack_binary(blob, b"")


# ---------------------------------------------------------------- v1 (TAR)

def pack_v1(attrs: dict, content: bytes) -> bytes:
    props = ET.Element("properties")
    for k, v in attrs.items():
        e = ET.SubElement(props, "entry", key=str(k))
        e.text = str(v)
    meta = (b'<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE properties\n'
            b'  SYSTEM "http://java.sun.com/dtd/properties.dtd">\n'
            + ET.tostring(props))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in (("flowfile.attributes", meta),
                           ("flowfile.content", content)):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mode = 0o644
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def unpack_v1(blob: bytes) -> list[tuple[dict, bytes]]:
    with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
        meta = tar.extractfile("flowfile.attributes").read()
        content = tar.extractfile("flowfile.content").read()
    root = ET.fromstring(meta)
    attrs = {e.get("key"): (e.text or "") for e in root.iter("entry")}
    return [(attrs, content)]


_PACKERS = {1: pack_v1, 2: pack_v2, 3: pack_v3}
_UNPACKERS = {1: unpack_v1, 2: unpack_v2, 3: unpack_v3}


def sniff_package(blob: bytes) -> int | None:
    """Best-effort version sniff: v3 magic, v1 TAR entry name, else v2
    (v2 is headerless, so it is the fallback, like the reference's
    UnpackContent property which names the format explicitly)."""
    if blob[:7] == MAGIC_V3:
        return 3
    if b"flowfile.attributes" in blob[:512]:
        return 1
    return 2


# ---------------------------------------------------------------- Spark

def package_flowfiles(df: DataFrame, content_col: str,
                      attr_cols: list[str], version: int = 3,
                      group_cols: list[str] | None = None) -> DataFrame:
    """Pack rows into FlowFile packages.

    Without group_cols: one package per row → (attr_cols..., package).
    With group_cols: rows sort by attr_cols within each group and pack
    back-to-back into ONE stream per group (the MergeContent
    FlowFileStream merge format; v1 streams are per-row only, as TAR
    members do not concatenate).
    """
    packer = _PACKERS[version]
    if group_cols and version == 1:
        raise ValueError("v1 (TAR) packages do not concatenate; "
                         "use version 2 or 3 for merged streams")
    cols = list(dict.fromkeys((group_cols or []) + attr_cols
                              + [content_col]))
    src = df.select(*cols)

    def pack_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            packages = [
                packer({c: r[c] for c in attr_cols},
                       bytes(r[content_col]) if not isinstance(
                           r[content_col], str)
                       else r[content_col].encode())
                for _, r in pdf.iterrows()]
            out = pdf[attr_cols].copy()
            out["package"] = packages
            yield out

    dtypes = dict(df.dtypes)
    if not group_cols:
        # schema columns in attr_cols order — the order the pandas
        # frames are emitted in (mapInPandas aligns positionally)
        schema = ", ".join(f"`{n}` {dtypes[n]}" for n in attr_cols) \
            + ", package binary"
        return src.mapInPandas(pack_rows, schema=schema)

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(attr_cols, kind="mergesort")
        stream = b"".join(
            packer({c: r[c] for c in attr_cols},
                   bytes(r[content_col]) if not isinstance(
                       r[content_col], str)
                   else r[content_col].encode())
            for _, r in pdf.iterrows())
        first = pdf.iloc[0]
        return pd.DataFrame([
            tuple(first[c] for c in group_cols) + (len(pdf), stream)],
            columns=group_cols + ["n_packages", "package"])

    gschema = ", ".join(f"`{n}` {dtypes[n]}" for n in group_cols) \
        + ", n_packages int, package binary"
    return src.groupBy(*group_cols).applyInPandas(pack_group, gschema)


def unpack_flowfiles(df: DataFrame, content_col: str,
                     id_cols: list[str],
                     version: int | None = None) -> DataFrame:
    """Packed stream → one row per package: (id_cols..., package_index,
    attributes map<string,string>, content binary). version=None sniffs
    per blob (v2 as fallback, it being headerless)."""
    dtypes = dict(df.dtypes)
    passthrough = ", ".join(f"`{n}` {dtypes[n]}" for n in id_cols)
    schema = (f"{passthrough}, package_index int, "
              "attributes map<string,string>, content binary")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = bytes(r[content_col])
                v = version if version is not None else sniff_package(blob)
                for i, (attrs, content) in enumerate(_UNPACKERS[v](blob)):
                    rows.append(tuple(r[c] for c in id_cols)
                                + (i, attrs, content))
            yield pd.DataFrame(
                rows, columns=id_cols + ["package_index", "attributes",
                                         "content"])

    return df.select(*id_cols, content_col).mapInPandas(run, schema=schema)
