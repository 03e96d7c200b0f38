"""Snappy — pure-Python codec: raw block format plus BOTH stream
framings the reference uses.

NiFi 1.1.2 CompressContent.java:90-91 offers "snappy"
(org.xerial.snappy SnappyOutputStream — snappy-java's own stream
header + 4-byte-length chunks) and "snappy framed"
(SnappyFramedOutputStream — the official framing format with the
sNaPpY stream identifier and masked CRC-32C per chunk). Both are
implemented here from the published formats (google/snappy
format_description.txt and framing_format.txt; snappy-java
SnappyOutputStream header layout), over a from-scratch raw-block
codec:

* raw block — varint uncompressed length preamble, then literal
  elements (tag 00, lengths 1..60 inline / 61..64 length-bytes) and
  copy elements (tag 01 = 4..11-byte copy with 11-bit offset, tag 10
  = 1..64-byte copy with 16-bit LE offset, tag 11 = 32-bit offset —
  decoder handles all four, the encoder emits 00/10 which every
  conformant decoder accepts). Overlapping copies replay byte-at-a-
  time exactly as the spec requires (offset < length runs).
* compression is greedy with a 4-byte hash table — deterministic,
  format-valid output (the spec fixes the DEcoder, not the encoder's
  match choices).
* CRC-32C (Castagnoli, reflected poly 0x82F63B78) with the framing
  format's mask ((crc >> 15 | crc << 17) + 0xa282ead8).
"""

from __future__ import annotations

import struct


class SnappyError(ValueError):
    pass


# ----------------------------------------------------------- crc32c

_CRC32C_TABLE: list[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- raw blocks


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise SnappyError("varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    else:
        nb = ((n - 1).bit_length() + 7) // 8
        out.append((59 + nb) << 2)
        out += (n - 1).to_bytes(nb, "little")
    out += lit


def snappy_compress(data: bytes) -> bytes:
    """Raw snappy block (varint preamble + elements): greedy 4-byte
    hash matching, copies emitted as tag-10 (16-bit offset) runs of
    up to 64 bytes."""
    out = bytearray(_write_varint(len(data)))
    n = len(data)
    if n < 4:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend the match
            m = 4
            while i + m < n and data[cand + m] == data[i + m]:
                m += 1
            _emit_literal(out, data[lit_start:i])
            off = i - cand
            rem = m
            while rem > 0:
                chunk = min(rem, 64)   # tag-10 lengths are 1..64
                out.append(0b10 | ((chunk - 1) << 2))
                out += struct.pack("<H", off)
                rem -= chunk
            i += m
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    want, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:                              # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise SnappyError("truncated literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:                              # 11-bit offset copy
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise SnappyError("truncated copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:                            # 16-bit offset copy
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy")
            (off,) = struct.unpack_from("<H", data, pos)
            pos += 2
        else:                                      # 32-bit offset copy
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy")
            (off,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if off == 0 or off > len(out):
            raise SnappyError(f"bad copy offset {off} at {len(out)}")
        # overlapping copies replay byte-at-a-time per the spec
        for _ in range(ln):
            out.append(out[-off])
    if len(out) != want:
        raise SnappyError(f"length mismatch: {len(out)} != {want}")
    return bytes(out)


# -------------------------------------- snappy-java stream ("snappy")

_SJ_MAGIC = b"\x82SNAPPY\x00"


def snappy_java_stream_compress(data: bytes,
                                block_size: int = 32768) -> bytes:
    """snappy-java SnappyOutputStream: magic + version(1)/compat(1)
    ints, then [4-byte BE length][raw block] chunks."""
    out = bytearray(_SJ_MAGIC + struct.pack(">II", 1, 1))
    for off in range(0, len(data), block_size):
        blk = snappy_compress(data[off:off + block_size])
        out += struct.pack(">I", len(blk)) + blk
    return bytes(out)


def snappy_java_stream_decompress(data: bytes) -> bytes:
    if data[:8] != _SJ_MAGIC:
        raise SnappyError("not a snappy-java stream")
    pos = 16
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise SnappyError("truncated chunk length")
        (ln,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + ln > len(data):
            raise SnappyError("truncated chunk")
        out += snappy_decompress(data[pos:pos + ln])
        pos += ln
    return bytes(out)


# ------------------------------- framing format ("snappy framed")

_FRAMED_ID = b"\xff\x06\x00\x00sNaPpY"


def snappy_framed_compress(data: bytes,
                           block_size: int = 65536) -> bytes:
    """Official framing format: stream-identifier chunk, then per
    block a compressed (0x00) or uncompressed (0x01) chunk — whichever
    is smaller — each carrying the masked CRC-32C of the UNCOMPRESSED
    bytes."""
    out = bytearray(_FRAMED_ID)
    for off in range(0, len(data), block_size) or [0]:
        blk = data[off:off + block_size]
        crc = struct.pack("<I", _mask_crc(crc32c(blk)))
        comp = snappy_compress(blk)
        if len(comp) < len(blk):
            payload = crc + comp
            ctype = 0x00
        else:
            payload = crc + blk
            ctype = 0x01
        out += bytes([ctype]) + len(payload).to_bytes(3, "little")
        out += payload
    return bytes(out)


def snappy_framed_decompress(data: bytes) -> bytes:
    if data[:10] != _FRAMED_ID:
        raise SnappyError("missing sNaPpY stream identifier")
    pos = 10
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise SnappyError("truncated chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            raise SnappyError("truncated chunk")
        chunk = data[pos:pos + ln]
        pos += ln
        if ctype in (0x00, 0x01):
            (want_crc,) = struct.unpack_from("<I", chunk, 0)
            body = chunk[4:]
            raw = snappy_decompress(body) if ctype == 0x00 else body
            if _mask_crc(crc32c(raw)) != want_crc:
                raise SnappyError("chunk CRC mismatch")
            out += raw
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue                    # padding / skippable chunks
        elif ctype == 0xFF:
            if chunk != b"sNaPpY":
                raise SnappyError("bad repeated stream identifier")
        else:
            raise SnappyError(f"unskippable chunk type {ctype:#x}")
    return bytes(out)
