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
