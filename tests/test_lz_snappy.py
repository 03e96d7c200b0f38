"""Pure-Python LZ4 block + snappy codecs: spec vectors, roundtrips,
property tests, CompressContent wiring, and CQL frame compression."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from nifi_spark.functions.lz4_codec import (Lz4Error,
                                            lz4_block_compress,
                                            lz4_block_decompress)
from nifi_spark.functions.snappy_codec import (
    SnappyError, crc32c, snappy_compress, snappy_decompress,
    snappy_framed_compress, snappy_framed_decompress,
    snappy_java_stream_compress, snappy_java_stream_decompress)


def test_crc32c_check_value():
    # the canonical CRC-32C test vector (RFC 3720 appendix / Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_snappy_handcrafted_spec_vector():
    # varint(10), literal 'a' (tag 00 len 1), copy tag-10 len 9 off 1
    assert snappy_decompress(b"\x0a\x00a\x22\x01\x00") == b"a" * 10
    # tag-01 copy: len 7, 11-bit offset 1 -> 'a' + 7 copies
    assert snappy_decompress(b"\x08\x00a\x0d\x01") == b"a" * 8


def test_snappy_overlapping_copy_rle():
    blob = snappy_compress(b"ab" * 5000)
    assert len(blob) < 600          # 64-byte copy elements, ~3 B each
    assert snappy_decompress(blob) == b"ab" * 5000


def test_lz4_handcrafted_spec_vector():
    # token (ll=1, ml=10+4), 'a', offset 1 -> 15 a's
    assert lz4_block_decompress(b"\x1aa\x01\x00") == b"a" * 15


def test_lz4_end_rules():
    # last 5 bytes must be literals; encoder must still roundtrip
    data = b"x" * 100 + b"tail!"
    blob = lz4_block_compress(data)
    assert lz4_block_decompress(blob) == data
    # a block ending mid-sequence raises, not crashes
    with pytest.raises(Lz4Error):
        lz4_block_decompress(b"\xf0")


def test_snappy_bad_offset_raises():
    with pytest.raises(SnappyError):
        snappy_decompress(b"\x05\x00a\x22\x09\x00")  # offset 9 > out


def test_framed_crc_enforced():
    blob = bytearray(snappy_framed_compress(b"hello world" * 100))
    blob[-1] ^= 0xFF
    with pytest.raises(SnappyError, match="CRC|offset|length"):
        snappy_framed_decompress(bytes(blob))


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096))
def test_snappy_roundtrip_property(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096))
def test_lz4_roundtrip_property(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.binary(max_size=2048),
       st.sampled_from([1, 7, 100, 65536]))
def test_stream_formats_roundtrip_property(data, block):
    assert snappy_java_stream_decompress(
        snappy_java_stream_compress(data, block_size=block)) == data
    assert snappy_framed_decompress(
        snappy_framed_compress(data, block_size=block)) == data


# ------------------------------------------------ CompressContent wire


def test_compress_content_snappy_modes(spark):
    from nifi_spark.operators.codec import compress_content
    df = spark.createDataFrame(
        [(i, (f"row {i} " * 20).encode()) for i in range(10)],
        "id long, content binary")
    for codec in ("snappy", "snappy framed"):
        comp = compress_content(df, "content", codec=codec)
        back = compress_content(comp, "content", codec=codec,
                                mode="decompress")
        rows = {r["id"]: bytes(r["content"]) for r in back.collect()}
        assert rows == {i: (f"row {i} " * 20).encode()
                        for i in range(10)}
    # the two stream formats carry their magic
    one = compress_content(df, "content", codec="snappy").collect()[0]
    assert bytes(one["content"]).startswith(b"\x82SNAPPY\x00")
    one = compress_content(df, "content",
                           codec="snappy framed").collect()[0]
    assert bytes(one["content"]).startswith(b"\xff\x06\x00\x00sNaPpY")


# ------------------------------------------------- CQL frame compression


def _capture(write):
    frames = []

    def w(blob):
        frames.append(bytes(blob))
        write(blob)
    return frames, w


@pytest.mark.parametrize("algo", ["lz4", "snappy"])
def test_cql_compressed_session(algo):
    from nifi_spark.sources.cql import CqlClient, CqlServer, cql_loopback
    srv = CqlServer()
    srv.add_table("t", [("id", "int"), ("name", "varchar")],
                  [(i, f"n{i}") for i in range(300)])
    r, w, join = cql_loopback(srv)
    sent, cw = _capture(w)
    c = CqlClient(r, cw, compression=algo)
    cols, rows = c.query("SELECT id, name FROM ks.t WHERE id < 250",
                         page_size=64)
    join()
    assert cols == [("id", "int"), ("name", "varchar")]
    assert rows == [(i, f"n{i}") for i in range(250)]
    # STARTUP (first frame) uncompressed; later request frames flagged
    assert sent[0][1] == 0
    assert all(f[1] & 0x01 for f in sent[1:])


def test_cql_unsupported_compression_refused():
    from nifi_spark.sources.cql import (CqlClient, CqlError, CqlServer,
                                        cql_loopback, read_frame,
                                        write_frame, REQUEST,
                                        OP_STARTUP, _string_map)
    srv = CqlServer()
    r, w, join = cql_loopback(srv)
    with pytest.raises(CqlError, match="unsupported compression"):
        CqlClient(r, w, compression="zstd")
    # a raw STARTUP asking for an unknown codec gets a protocol error
    write_frame(w, REQUEST, OP_STARTUP,
                _string_map({"CQL_VERSION": "3.0.0",
                             "COMPRESSION": "zstd"}), stream=1)
    ver, stream, op, body = read_frame(r)
    assert op == 0x00                       # OP_ERROR
    join()
