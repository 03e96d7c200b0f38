"""Hadoop SequenceFile codec + CreateHadoopSequenceFile /
GetHDFSSequenceFile analogs — the on-disk format (version 6) written
and read from the public format description (SequenceFile's own
header/record/sync layout and WritableUtils' VInt encoding), pure
stdlib (zlib for DefaultCodec DEFLATE).

NiFi ancestors (nifi-hadoop-bundle):
- CreateHadoopSequenceFile.java + SequenceFileWriterImpl.java:20-48 —
  each FlowFile becomes one record: key = Text(filename), value =
  BytesWritable(content) (the reference streams via a fake
  InputStreamWritable whose class name it byte-patches to
  BytesWritable — the LANDED bytes are a BytesWritable record, which
  is what this codec writes directly).
- GetHDFSSequenceFile.java + KeyValueReader.java:20-60 / ValueReader —
  one FlowFile per record; a key that looks like a filename
  (``^[\\w/].*``) becomes the output filename with any directory
  prefix stripped, otherwise a counter name is used.

Format (version 6, from the public layout):
- header: ``SEQ`` + version byte + key/value class names (Text:
  VInt length + UTF-8) + compression flag + block-compression flag +
  [codec class if compressed] + metadata (4-byte BE count + Text
  pairs) + 16-byte sync marker.
- uncompressed / record-compressed records: 4-byte BE record length,
  4-byte BE key length, key bytes, value bytes (DEFLATE-compressed
  per record in record mode); ``-1`` int + the sync marker re-appears
  every ~SYNC_INTERVAL bytes.
- block-compressed: sync before every block, then VInt record count +
  four DEFLATE buffers (key lengths, keys, value lengths, values),
  each preceded by its VInt compressed size.

Writables: Text = VInt byte-length + UTF-8; BytesWritable = 4-byte BE
length + bytes. VInt/VLong use the WritableUtils variable-length
scheme (single byte for [-112,127], else a length-tag byte followed
by big-endian magnitude bytes).
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

SEQ_MAGIC = b"SEQ"
SEQ_VERSION = 6
TEXT_CLASS = "org.apache.hadoop.io.Text"
BYTES_CLASS = "org.apache.hadoop.io.BytesWritable"
DEFAULT_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"
SYNC_INTERVAL = 100 * 20  # bytes between sync markers (writer policy)


# ------------------------------------------------------------- VInts


def write_vlong(out: io.BytesIO, i: int) -> None:
    """WritableUtils.writeVLong — the documented variable-length
    scheme (sign folded into the length-tag byte)."""
    if -112 <= i <= 127:
        out.write(struct.pack("b", i))
        return
    length = -112
    if i < 0:
        i ^= -1
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    out.write(struct.pack("b", length))
    n = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(n, 0, -1):
        out.write(bytes([(i >> ((idx - 1) * 8)) & 0xFF]))


def read_vlong(inp: io.BytesIO) -> int:
    first = struct.unpack("b", inp.read(1))[0]
    if first >= -112:
        return first
    negative = first < -120
    n = -(first + 120) if negative else -(first + 112)
    i = 0
    for _ in range(n):
        i = (i << 8) | inp.read(1)[0]
    return i ^ -1 if negative else i


def _write_text(out: io.BytesIO, s: str) -> None:
    b = s.encode("utf-8")
    write_vlong(out, len(b))
    out.write(b)


def _read_text(inp: io.BytesIO) -> str:
    n = read_vlong(inp)
    return inp.read(n).decode("utf-8")


def text_bytes(s: str) -> bytes:
    out = io.BytesIO()
    _write_text(out, s)
    return out.getvalue()


def bytes_writable(b: bytes) -> bytes:
    return struct.pack(">i", len(b)) + b


def _sync_marker(seed: str) -> bytes:
    return hashlib.md5(seed.encode()).digest()


# ------------------------------------------------------------- write


def write_sequence_file(entries: list[tuple[str, bytes]], *,
                        compression: str = "none",
                        sync_seed: str = "nifi_spark.seqfile",
                        metadata: dict[str, str] | None = None) -> bytes:
    """Serialize (filename, content) entries exactly as
    CreateHadoopSequenceFile lands them: Text key, BytesWritable
    value. compression ∈ {'none', 'record', 'block'}."""
    if compression not in ("none", "record", "block"):
        raise ValueError(f"unknown compression {compression!r}")
    sync = _sync_marker(sync_seed)
    out = io.BytesIO()
    out.write(SEQ_MAGIC + bytes([SEQ_VERSION]))
    _write_text(out, TEXT_CLASS)
    _write_text(out, BYTES_CLASS)
    out.write(b"\x01" if compression != "none" else b"\x00")
    out.write(b"\x01" if compression == "block" else b"\x00")
    if compression != "none":
        _write_text(out, DEFAULT_CODEC)
    md = metadata or {}
    out.write(struct.pack(">i", len(md)))
    for k, v in md.items():
        _write_text(out, k)
        _write_text(out, v)
    out.write(sync)

    if compression == "block":
        _write_block(out, entries, sync)
        return out.getvalue()

    last_sync = out.tell()
    for name, content in entries:
        if out.tell() - last_sync >= SYNC_INTERVAL:
            out.write(struct.pack(">i", -1))
            out.write(sync)
            last_sync = out.tell()
        key = text_bytes(name)
        value = bytes_writable(content)
        if compression == "record":
            value = zlib.compress(value)
        out.write(struct.pack(">ii", len(key) + len(value), len(key)))
        out.write(key)
        out.write(value)
    return out.getvalue()


def _write_block(out: io.BytesIO, entries, sync: bytes) -> None:
    keys, key_lens = io.BytesIO(), io.BytesIO()
    vals, val_lens = io.BytesIO(), io.BytesIO()
    for name, content in entries:
        k = text_bytes(name)
        v = bytes_writable(content)
        write_vlong(key_lens, len(k))
        keys.write(k)
        write_vlong(val_lens, len(v))
        vals.write(v)
    out.write(struct.pack(">i", -1))
    out.write(sync)
    write_vlong(out, len(entries))
    for buf in (key_lens, keys, val_lens, vals):
        z = zlib.compress(buf.getvalue())
        write_vlong(out, len(z))
        out.write(z)


# -------------------------------------------------------------- read


def read_sequence_file(data: bytes) -> tuple[dict, list[tuple[str, bytes]]]:
    """Parse a SequenceFile → (header info, [(key_text, value_bytes)]).
    Verifies every sync marker against the header's."""
    inp = io.BytesIO(data)
    if inp.read(3) != SEQ_MAGIC:
        raise ValueError("not a SequenceFile (bad magic)")
    version = inp.read(1)[0]
    if version < 5:
        raise ValueError(f"unsupported SequenceFile version {version}")
    key_class = _read_text(inp)
    value_class = _read_text(inp)
    compressed = inp.read(1) == b"\x01"
    block = inp.read(1) == b"\x01"
    codec = _read_text(inp) if compressed else None
    n_meta = struct.unpack(">i", inp.read(4))[0]
    meta = {}
    for _ in range(n_meta):
        k = _read_text(inp)
        meta[k] = _read_text(inp)
    sync = inp.read(16)
    header = {"version": version, "key_class": key_class,
              "value_class": value_class, "codec": codec,
              "block": block, "metadata": meta}
    entries: list[tuple[str, bytes]] = []
    total = len(data)
    while inp.tell() < total:
        if block:
            _expect_sync(inp, sync)
            if inp.tell() >= total:
                break
            n_rec = read_vlong(inp)
            bufs = []
            for _ in range(4):
                zlen = read_vlong(inp)
                bufs.append(io.BytesIO(zlib.decompress(inp.read(zlen))))
            key_lens, keys, val_lens, vals = bufs
            for _ in range(n_rec):
                k = keys.read(read_vlong(key_lens))
                v = vals.read(read_vlong(val_lens))
                entries.append((_decode_key(k, key_class),
                                _unwrap_value(v, value_class)))
            continue
        rec_len = struct.unpack(">i", inp.read(4))[0]
        if rec_len == -1:          # sync escape
            marker = inp.read(16)
            if marker != sync:
                raise ValueError("sync marker mismatch")
            continue
        key_len = struct.unpack(">i", inp.read(4))[0]
        k = inp.read(key_len)
        v = inp.read(rec_len - key_len)
        if compressed:
            v = zlib.decompress(v)
        entries.append((_decode_key(k, key_class),
                        _unwrap_value(v, value_class)))
    return header, entries


def _expect_sync(inp: io.BytesIO, sync: bytes) -> None:
    pos = inp.tell()
    esc = inp.read(4)
    if len(esc) < 4:
        inp.seek(pos)
        inp.read()          # consume to EOF
        return
    if struct.unpack(">i", esc)[0] != -1:
        raise ValueError("expected block sync escape")
    if inp.read(16) != sync:
        raise ValueError("sync marker mismatch")


def _decode_key(k: bytes, key_class: str) -> str:
    if key_class == TEXT_CLASS:
        return _read_text(io.BytesIO(k))
    return k.hex()


def _unwrap_value(v: bytes, value_class: str) -> bytes:
    if value_class == BYTES_CLASS:
        n = struct.unpack(">i", v[:4])[0]
        return v[4:4 + n]
    return v


def reader_filename(key: str, input_name: str, counter: int) -> str:
    """KeyValueReader.java:20-35 — filename-looking keys keep their
    basename; others get '<input>.<counter>' (the reference appends
    System.nanoTime(), elided here for determinism)."""
    first = key[:1]
    if first and (first.isalnum() or first in "_/"):
        return key.rsplit("/", 1)[-1]
    return f"{input_name}.{counter}"


# -------------------------------------------------- Spark operators


def create_hadoop_sequence_file(df: DataFrame, *, group_col: str,
                                name_col: str = "filename",
                                content_col: str = "content",
                                compression: str = "none") -> DataFrame:
    """CreateHadoopSequenceFile analog: one SequenceFile per group
    (the reference's one-file-per-FlowFile is group=filename).
    Entries are ordered by name within the group for determinism.
    Plan: one hash-partition shuffle on the group key, encode is a
    per-group Arrow batch — no other exchange."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(name_col)
        entries = [(str(n), bytes(c) if not isinstance(c, str)
                    else c.encode())
                   for n, c in zip(pdf[name_col], pdf[content_col])]
        grp = pdf[group_col].iloc[0]
        blob = write_sequence_file(entries, compression=compression,
                                   sync_seed=f"seq:{grp}")
        return pd.DataFrame({group_col: [grp],
                             "n_entries": [len(entries)],
                             "seqfile": [blob]})

    return (df.select(group_col, name_col, content_col)
            .groupBy(group_col)
            .applyInPandas(_pack,
                           f"{group_col} string, n_entries int, "
                           "seqfile binary"))


def get_hdfs_sequence_file(df: DataFrame, *, content_col: str = "seqfile",
                           keep_cols: list[str] | None = None,
                           flowfile_content: bool = True) -> DataFrame:
    """GetHDFSSequenceFile analog: explode each SequenceFile blob into
    one row per record (KeyValueReader when flowfile_content, else
    ValueReader drops keys). Zero-exchange mapInPandas."""
    keep = keep_cols or []
    schema = (", ".join(f"{c} string" for c in keep) +
              (", " if keep else "") +
              "key string, filename string, value binary")

    def _unpack(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                _, entries = read_sequence_file(bytes(r[content_col]))
                for idx, (key, val) in enumerate(entries, start=1):
                    fname = (reader_filename(key, "seq", idx)
                             if flowfile_content else f"seq.{idx}")
                    rows.append([*(r[c] for c in keep), key, fname,
                                 val])
            yield pd.DataFrame(
                rows, columns=[*keep, "key", "filename", "value"])

    return df.mapInPandas(_unpack, schema)


__all__ = ["bytes_writable", "create_hadoop_sequence_file",
           "get_hdfs_sequence_file", "read_sequence_file",
           "read_vlong", "reader_filename", "text_bytes",
           "write_sequence_file", "write_vlong"]
