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
