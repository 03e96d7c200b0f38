"""Pure-stdlib DES and AES-128 block ciphers + the two modes SNMPv3
privacy needs (DES-CBC per RFC 3414 §8, AES-128-CFB per RFC 3826).

Both algorithms are implemented straight from their public
specifications — FIPS 46-3 (DES tables and Feistel schedule) and
FIPS-197 (AES; the S-box is *generated* from the GF(2^8) inverse +
affine map rather than typed in). Python-side speed is irrelevant
here: these encrypt single scoped-PDU blobs on the driver/test
transport path, never row data (row-level crypto stays in
operators/codec.py which is stdlib-hash based).

Known-answer tests pin both ciphers to the published vectors
(FIPS 46-3 example key 133457799BBCDFF1 and FIPS-197 appendix B)
in tests/test_snmp.py.
"""
from __future__ import annotations

# --------------------------------------------------------------- DES
# FIPS 46-3 tables (1-indexed bit positions, MSB = bit 1).

_IP = (58, 50, 42, 34, 26, 18, 10, 2, 60, 52, 44, 36, 28, 20, 12, 4,
       62, 54, 46, 38, 30, 22, 14, 6, 64, 56, 48, 40, 32, 24, 16, 8,
       57, 49, 41, 33, 25, 17, 9, 1, 59, 51, 43, 35, 27, 19, 11, 3,
       61, 53, 45, 37, 29, 21, 13, 5, 63, 55, 47, 39, 31, 23, 15, 7)
_FP = (40, 8, 48, 16, 56, 24, 64, 32, 39, 7, 47, 15, 55, 23, 63, 31,
       38, 6, 46, 14, 54, 22, 62, 30, 37, 5, 45, 13, 53, 21, 61, 29,
       36, 4, 44, 12, 52, 20, 60, 28, 35, 3, 43, 11, 51, 19, 59, 27,
       34, 2, 42, 10, 50, 18, 58, 26, 33, 1, 41, 9, 49, 17, 57, 25)
_E = (32, 1, 2, 3, 4, 5, 4, 5, 6, 7, 8, 9,
      8, 9, 10, 11, 12, 13, 12, 13, 14, 15, 16, 17,
      16, 17, 18, 19, 20, 21, 20, 21, 22, 23, 24, 25,
      24, 25, 26, 27, 28, 29, 28, 29, 30, 31, 32, 1)
_P = (16, 7, 20, 21, 29, 12, 28, 17, 1, 15, 23, 26, 5, 18, 31, 10,
      2, 8, 24, 14, 32, 27, 3, 9, 19, 13, 30, 6, 22, 11, 4, 25)
_PC1 = (57, 49, 41, 33, 25, 17, 9, 1, 58, 50, 42, 34, 26, 18,
        10, 2, 59, 51, 43, 35, 27, 19, 11, 3, 60, 52, 44, 36,
        63, 55, 47, 39, 31, 23, 15, 7, 62, 54, 46, 38, 30, 22,
        14, 6, 61, 53, 45, 37, 29, 21, 13, 5, 28, 20, 12, 4)
_PC2 = (14, 17, 11, 24, 1, 5, 3, 28, 15, 6, 21, 10,
        23, 19, 12, 4, 26, 8, 16, 7, 27, 20, 13, 2,
        41, 52, 31, 37, 47, 55, 30, 40, 51, 45, 33, 48,
        44, 49, 39, 56, 34, 53, 46, 42, 50, 36, 29, 32)
_SHIFTS = (1, 1, 2, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 2, 2, 1)
_SBOX = (
    (14, 4, 13, 1, 2, 15, 11, 8, 3, 10, 6, 12, 5, 9, 0, 7,
     0, 15, 7, 4, 14, 2, 13, 1, 10, 6, 12, 11, 9, 5, 3, 8,
     4, 1, 14, 8, 13, 6, 2, 11, 15, 12, 9, 7, 3, 10, 5, 0,
     15, 12, 8, 2, 4, 9, 1, 7, 5, 11, 3, 14, 10, 0, 6, 13),
    (15, 1, 8, 14, 6, 11, 3, 4, 9, 7, 2, 13, 12, 0, 5, 10,
     3, 13, 4, 7, 15, 2, 8, 14, 12, 0, 1, 10, 6, 9, 11, 5,
     0, 14, 7, 11, 10, 4, 13, 1, 5, 8, 12, 6, 9, 3, 2, 15,
     13, 8, 10, 1, 3, 15, 4, 2, 11, 6, 7, 12, 0, 5, 14, 9),
    (10, 0, 9, 14, 6, 3, 15, 5, 1, 13, 12, 7, 11, 4, 2, 8,
     13, 7, 0, 9, 3, 4, 6, 10, 2, 8, 5, 14, 12, 11, 15, 1,
     13, 6, 4, 9, 8, 15, 3, 0, 11, 1, 2, 12, 5, 10, 14, 7,
     1, 10, 13, 0, 6, 9, 8, 7, 4, 15, 14, 3, 11, 5, 2, 12),
    (7, 13, 14, 3, 0, 6, 9, 10, 1, 2, 8, 5, 11, 12, 4, 15,
     13, 8, 11, 5, 6, 15, 0, 3, 4, 7, 2, 12, 1, 10, 14, 9,
     10, 6, 9, 0, 12, 11, 7, 13, 15, 1, 3, 14, 5, 2, 8, 4,
     3, 15, 0, 6, 10, 1, 13, 8, 9, 4, 5, 11, 12, 7, 2, 14),
    (2, 12, 4, 1, 7, 10, 11, 6, 8, 5, 3, 15, 13, 0, 14, 9,
     14, 11, 2, 12, 4, 7, 13, 1, 5, 0, 15, 10, 3, 9, 8, 6,
     4, 2, 1, 11, 10, 13, 7, 8, 15, 9, 12, 5, 6, 3, 0, 14,
     11, 8, 12, 7, 1, 14, 2, 13, 6, 15, 0, 9, 10, 4, 5, 3),
    (12, 1, 10, 15, 9, 2, 6, 8, 0, 13, 3, 4, 14, 7, 5, 11,
     10, 15, 4, 2, 7, 12, 9, 5, 6, 1, 13, 14, 0, 11, 3, 8,
     9, 14, 15, 5, 2, 8, 12, 3, 7, 0, 4, 10, 1, 13, 11, 6,
     4, 3, 2, 12, 9, 5, 15, 10, 11, 14, 1, 7, 6, 0, 8, 13),
    (4, 11, 2, 14, 15, 0, 8, 13, 3, 12, 9, 7, 5, 10, 6, 1,
     13, 0, 11, 7, 4, 9, 1, 10, 14, 3, 5, 12, 2, 15, 8, 6,
     1, 4, 11, 13, 12, 3, 7, 14, 10, 15, 6, 8, 0, 5, 9, 2,
     6, 11, 13, 8, 1, 4, 10, 7, 9, 5, 0, 15, 14, 2, 3, 12),
    (13, 2, 8, 4, 6, 15, 11, 1, 10, 9, 3, 14, 5, 0, 12, 7,
     1, 15, 13, 8, 10, 3, 7, 4, 12, 5, 6, 11, 0, 14, 9, 2,
     7, 11, 4, 1, 9, 12, 14, 2, 0, 6, 10, 13, 15, 3, 5, 8,
     2, 1, 14, 7, 4, 10, 8, 13, 15, 12, 9, 0, 3, 5, 6, 11))


def _permute(block: int, table: tuple, width: int) -> int:
    out = 0
    for pos in table:
        out = (out << 1) | ((block >> (width - pos)) & 1)
    return out


def des_key_schedule(key: bytes) -> list[int]:
    """16 48-bit round keys from an 8-byte key (parity bits dropped
    by PC-1, per FIPS 46-3)."""
    if len(key) != 8:
        raise ValueError("DES key must be 8 bytes")
    k56 = _permute(int.from_bytes(key, "big"), _PC1, 64)
    c, d = k56 >> 28, k56 & 0xFFFFFFF
    subkeys = []
    for sh in _SHIFTS:
        c = ((c << sh) | (c >> (28 - sh))) & 0xFFFFFFF
        d = ((d << sh) | (d >> (28 - sh))) & 0xFFFFFFF
        subkeys.append(_permute((c << 28) | d, _PC2, 56))
    return subkeys


def _des_f(r: int, k: int) -> int:
    x = _permute(r, _E, 32) ^ k
    out = 0
    for i in range(8):
        six = (x >> (42 - 6 * i)) & 0x3F
        row = ((six >> 4) & 2) | (six & 1)
        col = (six >> 1) & 0xF
        out = (out << 4) | _SBOX[i][row * 16 + col]
    return _permute(out, _P, 32)


def des_block(block: bytes, subkeys: list[int]) -> bytes:
    """One DES block through the given round-key order (reverse the
    list to decrypt)."""
    v = _permute(int.from_bytes(block, "big"), _IP, 64)
    left, right = v >> 32, v & 0xFFFFFFFF
    for k in subkeys:
        left, right = right, left ^ _des_f(right, k)
    return _permute((right << 32) | left, _FP, 64).to_bytes(8, "big")


def des_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """DES-CBC; input must already be padded to 8-byte blocks (the
    SNMP layer zero-pads — BER lengths delimit the plaintext)."""
    if len(data) % 8:
        raise ValueError("DES-CBC input must be a multiple of 8 bytes")
    ks = des_key_schedule(key)
    out, prev = bytearray(), iv
    for i in range(0, len(data), 8):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 8], prev))
        prev = des_block(blk, ks)
        out += prev
    return bytes(out)


def des_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 8:
        raise ValueError("DES-CBC input must be a multiple of 8 bytes")
    ks = des_key_schedule(key)[::-1]
    out, prev = bytearray(), iv
    for i in range(0, len(data), 8):
        ct = data[i:i + 8]
        out += bytes(a ^ b for a, b in zip(des_block(ct, ks), prev))
        prev = ct
    return bytes(out)


# --------------------------------------------------------------- AES
# FIPS-197. The S-box is generated: s(x) = affine(inverse(x)) over
# GF(2^8) mod x^8+x^4+x^3+x+1.

def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = []
    for x in range(256):
        b = inv[x]
        s = 0x63
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))) & 1
            s ^= bit << i
        sbox.append(s)
    return tuple(sbox)


_AES_SBOX = _build_sbox()
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def aes128_key_schedule(key: bytes) -> list[list[int]]:
    if len(key) != 16:
        raise ValueError("AES-128 key must be 16 bytes")
    w = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_AES_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(11)]


def aes128_encrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    # state is column-major: state[r][c] = block[4c + r]
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_rk(rk):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= rk[4 * c + r]

    add_rk(round_keys[0])
    for rnd in range(1, 11):
        for r in range(4):
            for c in range(4):
                s[r][c] = _AES_SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < 10:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3)
                s[3][c] = _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2)
        add_rk(round_keys[rnd])
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes128_cfb_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CFB-128 (full-block feedback); no padding — the final partial
    block XORs against the leading keystream bytes, exactly the RFC
    3826 §3.1.3 construction."""
    rks = aes128_key_schedule(key)
    out, feedback = bytearray(), iv
    for i in range(0, len(data), 16):
        ks = aes128_encrypt_block(feedback, rks)
        chunk = data[i:i + 16]
        ct = bytes(a ^ b for a, b in zip(chunk, ks))
        out += ct
        feedback = ct if len(ct) == 16 else feedback  # last partial: done
    return bytes(out)


def aes128_cfb_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rks = aes128_key_schedule(key)
    out, feedback = bytearray(), iv
    for i in range(0, len(data), 16):
        ks = aes128_encrypt_block(feedback, rks)
        chunk = data[i:i + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
        feedback = chunk if len(chunk) == 16 else feedback
    return bytes(out)


# ------------------------------------------------------------------
# Generalized AES (FIPS 197): 128/192/256-bit keys, forward + INVERSE
# cipher, CBC mode with PKCS#7 — the pieces EncryptContent's
# OpenSSL-compatible PBE path needs (the SNMP CFB path above only ever
# runs the forward cipher). Pinned to the FIPS-197 Appendix C known-
# answer vectors in tests.

_AES_INV_SBOX = tuple(
    _AES_SBOX.index(x) for x in range(256))
_MUL = {m: tuple(_gf_mul(x, m) for x in range(256))
        for m in (2, 3, 9, 11, 13, 14)}


def aes_key_schedule(key: bytes) -> tuple[list[list[int]], int]:
    """Key expansion for Nk in {4, 6, 8} → (round_keys, n_rounds)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_AES_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_AES_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)], nr


def aes_encrypt_block(block: bytes, rks: list[list[int]],
                      nr: int) -> bytes:
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_rk(rk):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= rk[4 * c + r]

    add_rk(rks[0])
    m2, m3 = _MUL[2], _MUL[3]
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                s[r][c] = _AES_SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < nr:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = m2[a[0]] ^ m3[a[1]] ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ m2[a[1]] ^ m3[a[2]] ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ m2[a[2]] ^ m3[a[3]]
                s[3][c] = m3[a[0]] ^ a[1] ^ a[2] ^ m2[a[3]]
        add_rk(rks[rnd])
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes_decrypt_block(block: bytes, rks: list[list[int]],
                      nr: int) -> bytes:
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_rk(rk):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= rk[4 * c + r]

    add_rk(rks[nr])
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(nr - 1, -1, -1):
        for r in range(1, 4):                  # InvShiftRows
            s[r] = s[r][-r:] + s[r][:-r]
        for r in range(4):
            for c in range(4):
                s[r][c] = _AES_INV_SBOX[s[r][c]]
        add_rk(rks[rnd])
        if rnd > 0:                            # InvMixColumns
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = m14[a[0]] ^ m11[a[1]] ^ m13[a[2]] ^ m9[a[3]]
                s[1][c] = m9[a[0]] ^ m14[a[1]] ^ m11[a[2]] ^ m13[a[3]]
                s[2][c] = m13[a[0]] ^ m9[a[1]] ^ m14[a[2]] ^ m11[a[3]]
                s[3][c] = m11[a[0]] ^ m13[a[1]] ^ m9[a[2]] ^ m14[a[3]]
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with PKCS#7 padding (always pads, 1..16 bytes)."""
    rks, nr = aes_key_schedule(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        ct = aes_encrypt_block(blk, rks, nr)
        out += ct
        prev = ct
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16 or not data:
        raise ValueError("ciphertext length not a multiple of 16")
    rks, nr = aes_key_schedule(key)
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        ct = data[i:i + 16]
        pt = aes_decrypt_block(ct, rks, nr)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = ct
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])
