"""LZ4 block format — pure-Python compress + decompress.

Implements the published LZ4 block specification (lz4_Block_format.md):
sequences of [token][literal-length ext][literals][2-byte LE offset]
[match-length ext], 4-bit fields extended by 255-continuation bytes,
minimum match 4 (match length field stores len-4). End-of-block rules
honored by the encoder: the last sequence is literals-only, the final
5 bytes are always literals, and no match starts within the last 12
bytes (the spec's mflimit). The decoder copies matches byte-at-a-time
so overlapping offsets (RLE-style offset < length) replay exactly.

Used as the CQL binary-protocol body compression (the `lz4` STARTUP
option — Cassandra prefixes the compressed body with a 4-byte
big-endian uncompressed length, reproduced in sources/cql.py).
Compression is greedy over a 4-byte hash table — deterministic, and
format-valid for any conformant decoder (the spec fixes decoding,
not the encoder's match choices).
"""

from __future__ import annotations

import struct


class Lz4Error(ValueError):
    pass


_MFLIMIT = 12       # no match may start within the last 12 bytes
_LASTLITERALS = 5   # the last 5 bytes are always literals


def _ext_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def lz4_block_compress(data: bytes) -> bytes:
    n = len(data)
    out = bytearray()

    def emit(lit: bytes, mlen: int = 0, off: int = 0) -> None:
        nonlocal out
        ll = len(lit)
        token_l = min(ll, 15)
        token_m = min(mlen - 4, 15) if mlen else 0
        out.append((token_l << 4) | token_m)
        if ll >= 15:
            _ext_len(out, ll - 15)
        out += lit
        if mlen:
            out += struct.pack("<H", off)
            if mlen - 4 >= 15:
                _ext_len(out, mlen - 4 - 15)

    if n < _MFLIMIT + 1:
        emit(data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    limit = n - _MFLIMIT
    while i <= limit:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF \
                and data[cand:cand + 4] == key:
            m = 4
            # matches may run up to (but not into) the last 5 bytes
            mmax = n - _LASTLITERALS - i
            while m < mmax and data[cand + m] == data[i + m]:
                m += 1
            emit(data[lit_start:i], m, i - cand)
            i += m
            lit_start = i
        else:
            i += 1
    emit(data[lit_start:])                     # literals-only tail
    return bytes(out)


def lz4_block_decompress(data: bytes,
                         max_size: int = 1 << 30) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("truncated literal length")
                b = data[pos]
                pos += 1
                ll += b
                if b != 255:
                    break
        if pos + ll > n:
            raise Lz4Error("truncated literals")
        out += data[pos:pos + ll]
        pos += ll
        if pos == n:
            break                              # last sequence
        if pos + 2 > n:
            raise Lz4Error("truncated offset")
        (off,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if off == 0 or off > len(out):
            raise Lz4Error(f"bad offset {off} at {len(out)}")
        ml = token & 0xF
        if ml == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        if len(out) + ml > max_size:
            raise Lz4Error("output exceeds max_size")
        for _ in range(ml):                    # overlap-safe copy
            out.append(out[-off])
    return bytes(out)


# ------------------------------------------------------------ xxHash32

_XP1, _XP2, _XP3, _XP4, _XP5 = (2654435761, 2246822519, 3266489917,
                                668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (Collet's public xxHash spec) — the frame-format
    header/content checksum."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _XP1 + _XP2) & _M32
        v2 = (seed + _XP2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XP1) & _M32
        while pos + 16 <= n:
            (a, b, c, d) = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + a * _XP2) & _M32, 13) * _XP1) & _M32
            v2 = (_rotl32((v2 + b * _XP2) & _M32, 13) * _XP1) & _M32
            v3 = (_rotl32((v3 + c * _XP2) & _M32, 13) * _XP1) & _M32
            v4 = (_rotl32((v4 + d * _XP2) & _M32, 13) * _XP1) & _M32
            pos += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _XP5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (w,) = struct.unpack_from("<I", data, pos)
        h = (_rotl32((h + w * _XP3) & _M32, 17) * _XP4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _XP5) & _M32, 11) * _XP1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _XP2) & _M32
    h ^= h >> 13
    h = (h * _XP3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------- LZ4 frame

_LZ4F_MAGIC = 0x184D2204


def lz4_frame_compress(data: bytes, block_size: int = 65536,
                       content_checksum: bool = True) -> bytes:
    """LZ4 frame format (lz4_Frame_format.md): magic, FLG/BD with the
    xxh32 header-checksum byte, independent compressed blocks (stored
    uncompressed when compression does not shrink them), EndMark, and
    an optional whole-content xxh32."""
    flg = (1 << 6) | (1 << 5) | ((1 << 2) if content_checksum else 0)
    bd = 4 << 4                                # 64 KB max block size
    hdr = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _LZ4F_MAGIC))
    out += hdr
    out.append((xxh32(hdr) >> 8) & 0xFF)
    for off in range(0, len(data), block_size):
        blk = data[off:off + block_size]
        comp = lz4_block_compress(blk)
        if len(comp) < len(blk):
            out += struct.pack("<I", len(comp)) + comp
        else:
            out += struct.pack("<I", len(blk) | 0x80000000) + blk
    out += struct.pack("<I", 0)                # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _LZ4F_MAGIC:
        raise Lz4Error("not an LZ4 frame")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 1:
        raise Lz4Error(f"unsupported frame version {flg >> 6}")
    has_bsum = bool(flg & (1 << 4))
    has_csize = bool(flg & (1 << 3))
    has_csum = bool(flg & (1 << 2))
    pos = 6
    if has_csize:
        pos += 8
    want_hc = data[pos]
    hdr = data[4:pos]
    # legacy Kafka v0 producers hashed magic+descriptor (KAFKA-3160);
    # accept both the spec HC and that variant
    ok_spec = (xxh32(hdr) >> 8) & 0xFF == want_hc
    ok_legacy = (xxh32(data[0:pos]) >> 8) & 0xFF == want_hc
    if not (ok_spec or ok_legacy):
        raise Lz4Error("frame header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise Lz4Error("truncated block size")
        (bsz,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsz == 0:                           # EndMark
            break
        stored = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        if pos + bsz > len(data):
            raise Lz4Error("truncated block")
        blk = data[pos:pos + bsz]
        pos += bsz
        if has_bsum:
            if pos + 4 > len(data):
                raise Lz4Error("truncated block checksum")
            (bs,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(blk) != bs:
                raise Lz4Error("block checksum mismatch")
        out += blk if stored else lz4_block_decompress(blk)
    if has_csum:
        if pos + 4 > len(data):
            raise Lz4Error("truncated content checksum")
        (cs,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != cs:
            raise Lz4Error("content checksum mismatch")
    return bytes(out)
