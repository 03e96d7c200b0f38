"""Hadoop SequenceFile codec + Create/GetHDFSSequenceFile analogs."""

from __future__ import annotations

import io
import struct

import pytest

from nifi_spark.operators.seqfile import (bytes_writable,
                                          create_hadoop_sequence_file,
                                          get_hdfs_sequence_file,
                                          read_sequence_file,
                                          read_vlong, reader_filename,
                                          write_sequence_file,
                                          write_vlong)


@pytest.mark.parametrize("v", [0, 1, -1, 127, -112, 128, -113, 255,
                               256, 65535, 1 << 20, -(1 << 20),
                               (1 << 60), -(1 << 60)])
def test_vlong_roundtrip(v):
    out = io.BytesIO()
    write_vlong(out, v)
    assert read_vlong(io.BytesIO(out.getvalue())) == v


def test_vlong_single_byte_range():
    for v in (-112, 0, 127):
        out = io.BytesIO()
        write_vlong(out, v)
        assert len(out.getvalue()) == 1


ENTRIES = [(f"dir/f{i}.txt", (f"file {i} " + "b" * (i % 9)).encode())
           for i in range(40)]


@pytest.mark.parametrize("comp", ["none", "record", "block"])
def test_seqfile_roundtrip(comp):
    blob = write_sequence_file(ENTRIES, compression=comp)
    header, got = read_sequence_file(blob)
    assert got == ENTRIES
    assert header["key_class"].endswith(".Text")
    assert header["value_class"].endswith(".BytesWritable")
    assert header["block"] == (comp == "block")
    assert (header["codec"] is None) == (comp == "none")


def test_seqfile_header_and_magic():
    blob = write_sequence_file(ENTRIES[:2], metadata={"who": "test"})
    assert blob[:4] == b"SEQ\x06"
    header, _ = read_sequence_file(blob)
    assert header["metadata"] == {"who": "test"}
    with pytest.raises(ValueError):
        read_sequence_file(b"NOTASEQFILE")


def test_seqfile_sync_markers_emitted_and_verified():
    big = [(f"k{i}", b"x" * 300) for i in range(30)]
    blob = write_sequence_file(big)
    # sync escape (-1 int) must appear in the record stream
    assert struct.pack(">i", -1) in blob[200:]
    _, got = read_sequence_file(blob)
    assert got == big
    # corrupt one sync marker byte → loud failure
    idx = blob.index(struct.pack(">i", -1), 200) + 4
    bad = blob[:idx] + bytes([blob[idx] ^ 0xFF]) + blob[idx + 1:]
    with pytest.raises(ValueError, match="sync"):
        read_sequence_file(bad)


def test_reader_filename_contract():
    assert reader_filename("dir/sub/a.txt", "in.sf", 3) == "a.txt"
    assert reader_filename("plain.bin", "in.sf", 3) == "plain.bin"
    assert reader_filename("\x01weird", "in.sf", 3) == "in.sf.3"
    assert reader_filename("", "in.sf", 7) == "in.sf.7"


def test_spark_pack_unpack_roundtrip(spark):
    rows = [(f"g{i % 3}", f"dir/f{i}.txt", f"c{i}" + "y" * (i % 5))
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "grp string, filename string, content string")
    packed = create_hadoop_sequence_file(
        df, group_col="grp", compression="block")
    assert packed.count() == 3
    unpacked = get_hdfs_sequence_file(packed, keep_cols=["grp"])
    got = {(r["grp"], r["key"]): bytes(r["value"]).decode()
           for r in unpacked.collect()}
    assert len(got) == 30
    for i in range(30):
        assert got[(f"g{i % 3}", f"dir/f{i}.txt")] == \
            f"c{i}" + "y" * (i % 5)
    fns = {r["filename"] for r in unpacked.collect()}
    assert f"f7.txt" in fns  # basename stripping
