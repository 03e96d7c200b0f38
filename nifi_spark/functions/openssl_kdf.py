"""OpenSSL-compatible password-based encryption — the reference's
EncryptContent PBE path.

NiFi ancestors: EncryptContent.java with KeyDerivationFunction
OPENSSL_EVP_BYTES_TO_KEY + EncryptionMethod
PBEWITHMD5AND{128,256}BITAES-CBC-OPENSSL
(standard/util/crypto/OpenSSLPKCS5CipherProvider.java — a single-
iteration MD5 EVP_BytesToKey, PKCS#5 v1.5-compatible). The wire form
is OpenSSL's `enc` layout: the literal ``Salted__`` magic + 8-byte
salt + AES-CBC ciphertext with PKCS#7 padding; the unsalted variant
has no header and derives with an empty salt.

Key derivation (EVP_BytesToKey with MD5, count=1):
    D_1 = MD5(password || salt); D_i = MD5(D_{i-1} || password || salt)
    key = leading key_len bytes of D_1 || D_2 || …, iv = next 16.

Wire parity is pinned by the reference's own TestEncryptContent
fixtures (salted_raw.enc / unsalted_raw.enc and the *_128 pair,
password "thisIsABadPassword") in tests/test_openssl_pbe.py, and the
AES core by the FIPS-197 Appendix C known-answer vectors.
"""

from __future__ import annotations

import hashlib

from nifi_spark.functions.blockciphers import (aes_cbc_decrypt,
                                               aes_cbc_encrypt)

SALTED_MAGIC = b"Salted__"


def evp_bytes_to_key(password: bytes, salt: bytes, key_len: int,
                     iv_len: int = 16) -> tuple[bytes, bytes]:
    """Single-iteration MD5 EVP_BytesToKey → (key, iv)."""
    d = b""
    prev = b""
    while len(d) < key_len + iv_len:
        prev = hashlib.md5(prev + password + salt).digest()
        d += prev
    return d[:key_len], d[key_len:key_len + iv_len]


def openssl_pbe_encrypt(data: bytes, password: str, *,
                        key_bits: int = 256,
                        salt: "bytes | None" = None) -> bytes:
    """Encrypt in OpenSSL `enc` layout. ``salt`` must be 8 bytes (the
    caller supplies it — deterministic fixtures inject one; a real
    deployment passes os.urandom(8)); ``salt=b""`` produces the
    UNSALTED legacy form with no header."""
    if key_bits not in (128, 192, 256):
        raise ValueError("key_bits must be 128/192/256")
    if salt is None:
        raise ValueError("pass salt=os.urandom(8) (or b'' for the "
                         "legacy unsalted form)")
    if salt and len(salt) != 8:
        raise ValueError("salt must be 8 bytes (or empty)")
    key, iv = evp_bytes_to_key(password.encode(), salt, key_bits // 8)
    body = aes_cbc_encrypt(key, iv, data)
    if salt:
        return SALTED_MAGIC + salt + body
    return body


def openssl_pbe_decrypt(data: bytes, password: str, *,
                        key_bits: int = 256) -> bytes:
    """Decrypt either layout: ``Salted__`` + salt + body, or the
    headerless unsalted form (empty salt)."""
    if data.startswith(SALTED_MAGIC):
        salt, body = data[8:16], data[16:]
    else:
        salt, body = b"", data
    key, iv = evp_bytes_to_key(password.encode(), salt, key_bits // 8)
    return aes_cbc_decrypt(key, iv, body)


# ------------------------------------------------------------------
# NiFi's strong-KDF PBE forms (RandomIVPBECipherProvider wire layout):
#   salt-field || "NiFiSALT" || iv || "NiFiIV" || AES-CBC ciphertext
# PBKDF2CipherProvider: raw 16-byte salt, PRF SHA-512, >=160k
# iterations (defaults mirrored). ScryptCipherProvider: the salt
# field is the modified-mcrypt STRING "$s0$<hex(log2N<<16|r<<8|p)>$
# <b64salt-nopad>" (Scrypt.java formatSalt), so N/r/p travel with the
# stream and decrypt needs no parameters. Key derivation itself is
# hashlib.pbkdf2_hmac / hashlib.scrypt (OpenSSL-backed, RFC
# 2898/7914). BcryptCipherProvider: the salt field is the
# "$2a$cost$salt22" string itself (cost rides the stream) and the key
# is SHA-512(full bcrypt hash string) truncated — the bcrypt core is
# the from-scratch functions/bcrypt_kdf.py, pinned to the reference's
# own embedded vector. NIFI_LEGACY is implemented below too (raw
# 16-byte salt prefix; BC's OPENSSL PBE generator is single-iteration
# EVP_BytesToKey regardless of the requested 1000 count) — the KDF
# census carries no declared boundary.

import base64 as _b64

SALT_DELIMITER = b"NiFiSALT"
IV_DELIMITER = b"NiFiIV"


def scrypt_format_salt(salt: bytes, n: int, r: int, p: int) -> str:
    params = format((n.bit_length() - 1) << 16 | r << 8 | p, "x")
    b64 = _b64.b64encode(salt).decode().rstrip("=")
    return f"$s0${params}${b64}"


def scrypt_parse_salt(field: str) -> tuple[bytes, int, int, int]:
    parts = field.split("$")
    if len(parts) < 4 or parts[1] != "s0":
        raise ValueError(f"not an scrypt salt: {field!r}")
    params = int(parts[2], 16)
    n = 2 ** (params >> 16 & 0xFFFF)
    r = params >> 8 & 0xFF
    p = params & 0xFF
    pad = "=" * (-len(parts[3]) % 4)
    return _b64.b64decode(parts[3] + pad), n, r, p


def nifi_pbe_encrypt(data: bytes, password: str, *, kdf: str,
                     key_bits: int = 256, salt: bytes = b"",
                     iv: bytes = b"", iterations: int = 160_000,
                     prf: str = "sha512", n: int = 2 ** 14, r: int = 8,
                     p: int = 1, cost: int = 12) -> bytes:
    if len(salt) != 16 or len(iv) != 16:
        raise ValueError("salt and iv must be 16 bytes")
    if kdf == "pbkdf2":
        key = hashlib.pbkdf2_hmac(prf, password.encode(), salt,
                                  iterations, key_bits // 8)
        field = salt
    elif kdf == "scrypt":
        key = hashlib.scrypt(password.encode(), salt=salt, n=n, r=r,
                             p=p, dklen=key_bits // 8,
                             maxmem=256 * 1024 * 1024)
        field = scrypt_format_salt(salt, n, r, p).encode()
    elif kdf == "bcrypt":
        from nifi_spark.functions.bcrypt_kdf import (bcrypt_format_salt,
                                                     bcrypt_hashpw)
        sfield = bcrypt_format_salt(salt, cost)
        h = bcrypt_hashpw(password, sfield)
        key = hashlib.sha512(h.encode()).digest()[:key_bits // 8]
        field = sfield.encode()
    else:
        raise ValueError(f"unknown kdf {kdf!r}")
    return (field + SALT_DELIMITER + iv + IV_DELIMITER
            + aes_cbc_encrypt(key, iv, data))


def nifi_pbe_decrypt(data: bytes, password: str, *, kdf: str,
                     key_bits: int = 256, iterations: int = 160_000,
                     prf: str = "sha512") -> bytes:
    i = data.find(SALT_DELIMITER)
    if i < 0:
        raise ValueError("missing NiFiSALT delimiter")
    field = data[:i]
    rest = data[i + len(SALT_DELIMITER):]
    j = rest.find(IV_DELIMITER)
    if j != 16:
        raise ValueError("missing/misplaced NiFiIV delimiter")
    iv = rest[:16]
    body = rest[16 + len(IV_DELIMITER):]
    if kdf == "pbkdf2":
        key = hashlib.pbkdf2_hmac(prf, password.encode(), field,
                                  iterations, key_bits // 8)
    elif kdf == "scrypt":
        salt, n, r, p = scrypt_parse_salt(field.decode())
        key = hashlib.scrypt(password.encode(), salt=salt, n=n, r=r,
                             p=p, dklen=key_bits // 8,
                             maxmem=256 * 1024 * 1024)
    elif kdf == "bcrypt":
        from nifi_spark.functions.bcrypt_kdf import bcrypt_hashpw
        h = bcrypt_hashpw(password, field.decode())
        key = hashlib.sha512(h.encode()).digest()[:key_bits // 8]
    else:
        raise ValueError(f"unknown kdf {kdf!r}")
    return aes_cbc_decrypt(key, iv, body)


# ------------------------------------------------------------------
# NIFI_LEGACY (NiFiLegacyCipherProvider): the original NiFi PBE wire
# form — a RAW cipher-block-size salt (16 bytes for AES, no Salted__
# magic, no delimiters) prefixed to the ciphertext, key+IV from the
# same BouncyCastle *-OPENSSL PBE algorithms the OpenSSL provider
# uses. The provider passes iterationCount=1000, but BC's
# OpenSSLPBEParametersGenerator derives with a SINGLE MD5 iteration
# regardless (its EVP_BytesToKey port takes no count) — the identical
# derivation that decodes the reference's own .enc goldens here — so
# the legacy form is EVP_BytesToKey over the 16-byte salt.


def nifi_legacy_encrypt(data: bytes, password: str, *,
                        key_bits: int = 128,
                        salt: bytes = b"") -> bytes:
    if len(salt) != 16:
        raise ValueError("legacy salt must be 16 bytes (AES block)")
    key, iv = evp_bytes_to_key(password.encode(), salt, key_bits // 8)
    return salt + aes_cbc_encrypt(key, iv, data)


def nifi_legacy_decrypt(data: bytes, password: str, *,
                        key_bits: int = 128) -> bytes:
    if len(data) < 16:
        raise ValueError("stream too small to contain the salt")
    salt, body = data[:16], data[16:]
    key, iv = evp_bytes_to_key(password.encode(), salt, key_bits // 8)
    return aes_cbc_decrypt(key, iv, body)
