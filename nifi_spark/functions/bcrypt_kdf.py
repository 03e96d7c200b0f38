"""bcrypt (OpenBSD $2a$) — pure Python, for EncryptContent's BCRYPT
key-derivation function.

NiFi ancestor: BcryptCipherProvider.java:115-150 — BCrypt.hashpw
(the bundled jBCrypt) over the "$2a$cost$salt22" salt string, then
dk = SHA-512(full hash string)[:keyLength/8] feeds AES. The cost
loop, null-terminated password cycling, and the 23-byte/radix-64
output follow the published OpenBSD algorithm; the whole chain is
pinned by the REFERENCE'S OWN embedded vector
(BcryptCipherProviderGroovyTest.testHashPWShouldMatchTestVectors).

The Blowfish P/S boxes are not embedded as literals: they are the
leading hexadecimal digits of π, generated here at import from a
Chudnovsky big-integer computation and self-checked against the
published first words (P[0] = 0x243F6A88, P[1] = 0x85A308D3).
"""

from __future__ import annotations

import math

_M32 = 0xFFFFFFFF


def _pi_hex_words(n_words: int) -> list[int]:
    """First n_words 32-bit words of the fractional hex expansion of
    π, via Chudnovsky with integer arithmetic."""
    hex_digits = n_words * 8 + 16
    prec = int(hex_digits * 4 * 1.1) + 64          # bits
    one = 1 << prec
    # Chudnovsky: 1/pi = 12/640320^1.5 * sum_k (-1)^k (6k)!(13591409
    #             + 545140134k) / ((3k)!(k!)^3 640320^(3k))
    c3 = 640320 ** 3
    total = 0
    a, b = 13591409, 545140134
    num = one                                       # (6k)!/((3k)!(k!)^3)
    denom_pow = 1
    k = 0
    while True:
        term = num * (a + b * k) // denom_pow
        if term == 0:
            break
        total += -term if k & 1 else term
        k += 1
        # ratio (6k)!/((3k)!k!^3) step: *(6k-5)(6k-4)...(6k)/((3k-2)(3k-1)(3k) k^3)
        num = num * (6 * k - 5) * (6 * k - 4) * (6 * k - 3) \
            * (6 * k - 2) * (6 * k - 1) * (6 * k)
        num //= (3 * k - 2) * (3 * k - 1) * (3 * k) * k * k * k
        denom_pow *= c3
    sqrt_c = math.isqrt(10005 * (one * one))
    pi = 426880 * sqrt_c * one // total
    frac = pi - 3 * one                             # 0.1415926...
    out = []
    for _ in range(n_words):
        frac <<= 32
        out.append(frac >> prec)
        frac &= one - 1
    return out


_PI_WORDS = _pi_hex_words(18 + 4 * 256)
assert _PI_WORDS[0] == 0x243F6A88 and _PI_WORDS[1] == 0x85A308D3, \
    "pi generation self-check failed"

_P_INIT = tuple(_PI_WORDS[:18])
_S_INIT = tuple(tuple(_PI_WORDS[18 + 256 * i:18 + 256 * (i + 1)])
                for i in range(4))

_B64_ALPHABET = ("./ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                 "abcdefghijklmnopqrstuvwxyz0123456789")
_B64_INDEX = {c: i for i, c in enumerate(_B64_ALPHABET)}


def bcrypt_b64_encode(data: bytes) -> str:
    out = []
    i = 0
    while i < len(data):
        c1 = data[i]
        i += 1
        out.append(_B64_ALPHABET[c1 >> 2])
        c1 = (c1 & 0x03) << 4
        if i >= len(data):
            out.append(_B64_ALPHABET[c1])
            break
        c2 = data[i]
        i += 1
        c1 |= c2 >> 4
        out.append(_B64_ALPHABET[c1])
        c1 = (c2 & 0x0F) << 2
        if i >= len(data):
            out.append(_B64_ALPHABET[c1])
            break
        c2 = data[i]
        i += 1
        c1 |= c2 >> 6
        out.append(_B64_ALPHABET[c1])
        out.append(_B64_ALPHABET[c2 & 0x3F])
    return "".join(out)


def bcrypt_b64_decode(s: str, max_len: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s) - 1 and len(out) < max_len:
        c1 = _B64_INDEX[s[i]]
        c2 = _B64_INDEX[s[i + 1]]
        i += 2
        out.append(((c1 << 2) | (c2 >> 4)) & 0xFF)
        if len(out) >= max_len or i >= len(s):
            break
        c3 = _B64_INDEX[s[i]]
        i += 1
        out.append(((c2 << 4) | (c3 >> 2)) & 0xFF)
        if len(out) >= max_len or i >= len(s):
            break
        c4 = _B64_INDEX[s[i]]
        i += 1
        out.append(((c3 << 6) | c4) & 0xFF)
    return bytes(out)


class _Blowfish:
    def __init__(self):
        self.p = list(_P_INIT)
        self.s = [list(t) for t in _S_INIT]

    def encipher(self, xl: int, xr: int) -> tuple[int, int]:
        p = self.p
        s0, s1, s2, s3 = self.s
        for i in range(16):
            xl ^= p[i]
            xr ^= (((s0[xl >> 24] + s1[(xl >> 16) & 0xFF]) & _M32
                    ^ s2[(xl >> 8) & 0xFF]) + s3[xl & 0xFF]) & _M32
            xl, xr = xr, xl
        xl, xr = xr, xl
        xr ^= p[16]
        xl ^= p[17]
        return xl, xr

    @staticmethod
    def _cyclic32(data: bytes, off: int) -> tuple[int, int]:
        w = 0
        for _ in range(4):
            w = ((w << 8) | data[off % len(data)]) & _M32
            off += 1
        return w, off

    def expand_key(self, data: bytes, key: bytes) -> None:
        off = 0
        for i in range(18):
            w, off = self._cyclic32(key, off)
            self.p[i] ^= w
        xl = xr = 0
        doff = 0
        for i in range(0, 18, 2):
            if data:
                w, doff = self._cyclic32(data, doff)
                xl ^= w
                w, doff = self._cyclic32(data, doff)
                xr ^= w
            xl, xr = self.encipher(xl, xr)
            self.p[i], self.p[i + 1] = xl, xr
        for box in self.s:
            for j in range(0, 256, 2):
                if data:
                    w, doff = self._cyclic32(data, doff)
                    xl ^= w
                    w, doff = self._cyclic32(data, doff)
                    xr ^= w
                xl, xr = self.encipher(xl, xr)
                box[j], box[j + 1] = xl, xr


_BCRYPT_CTEXT = b"OrpheanBeholderScryDoubt"


def bcrypt_raw(password: bytes, salt16: bytes, cost: int) -> bytes:
    """EksBlowfish + 64× ECB over the magic string → 23 output bytes
    (the $2a$ truncation)."""
    if len(salt16) != 16:
        raise ValueError("bcrypt salt must be 16 bytes")
    if not 4 <= cost <= 31:
        raise ValueError("cost must be 4..31")
    key = password + b"\x00"                        # $2a$ null terminator
    bf = _Blowfish()
    bf.expand_key(salt16, key)
    for _ in range(1 << cost):
        bf.expand_key(b"", key)
        bf.expand_key(b"", salt16)
    words = [int.from_bytes(_BCRYPT_CTEXT[i:i + 4], "big")
             for i in range(0, 24, 4)]
    for _ in range(64):
        for i in range(0, 6, 2):
            words[i], words[i + 1] = bf.encipher(words[i], words[i + 1])
    out = b"".join(w.to_bytes(4, "big") for w in words)
    return out[:23]


def bcrypt_hashpw(password: str, salt: str) -> str:
    """jBCrypt-compatible: salt = "$2a$NN$<22-char radix64>" →
    full "$2a$NN$<salt22><hash31>" string."""
    if not salt.startswith("$2a$") or len(salt) < 28 or salt[6] != "$":
        raise ValueError(f"bad bcrypt salt {salt!r}")
    cost = int(salt[4:6])
    raw_salt = bcrypt_b64_decode(salt[7:29], 16)
    digest = bcrypt_raw(password.encode(), raw_salt, cost)
    return salt[:29] + bcrypt_b64_encode(digest)


def bcrypt_format_salt(raw_salt: bytes, cost: int) -> str:
    return f"$2a${cost:02d}$" + bcrypt_b64_encode(raw_salt)
