"""OpenSSL-compatible PBE (EncryptContent OPENSSL_EVP_BYTES_TO_KEY):
FIPS-197 AES vectors, EVP_BytesToKey, both wire layouts, reference
golden .enc fixtures, and the operator."""

from __future__ import annotations

import os

import pytest

from nifi_spark.functions.blockciphers import (aes_decrypt_block,
                                               aes_encrypt_block,
                                               aes_key_schedule)
from nifi_spark.functions.openssl_kdf import (evp_bytes_to_key,
                                              openssl_pbe_decrypt,
                                              openssl_pbe_encrypt)

_REF = ("/root/reference/nifi-nar-bundles/nifi-standard-bundle/"
        "nifi-standard-processors/src/test/resources/TestEncryptContent/")

_FIPS = [
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),
    ("000102030405060708090a0b0c0d0e0f10111213141516171819"
     "1a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key_hex,ct_hex", _FIPS)
def test_fips197_appendix_c_vectors(key_hex, ct_hex):
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    key = bytes.fromhex(key_hex)
    rks, nr = aes_key_schedule(key)
    ct = aes_encrypt_block(pt, rks, nr)
    assert ct.hex() == ct_hex
    assert aes_decrypt_block(ct, rks, nr) == pt


def test_evp_bytes_to_key_chains_md5():
    import hashlib
    key, iv = evp_bytes_to_key(b"pw", b"saltsalt", 32, 16)
    d1 = hashlib.md5(b"pw" + b"saltsalt").digest()
    d2 = hashlib.md5(d1 + b"pw" + b"saltsalt").digest()
    d3 = hashlib.md5(d2 + b"pw" + b"saltsalt").digest()
    assert key == (d1 + d2)[:32]
    assert iv == (d2 + d3)[32 - 16:32] or iv == d3[:16]
    assert key + iv == (d1 + d2 + d3)[:48]


def test_roundtrip_salted_and_unsalted_layouts():
    for bits in (128, 192, 256):
        for salt in (b"12345678", b""):
            data = b"payload bytes \x00\xff" * 33
            ct = openssl_pbe_encrypt(data, "pw", key_bits=bits,
                                     salt=salt)
            if salt:
                assert ct.startswith(b"Salted__" + salt)
            else:
                assert not ct.startswith(b"Salted__")
            assert openssl_pbe_decrypt(ct, "pw", key_bits=bits) == data


def test_wrong_password_fails_padding():
    ct = openssl_pbe_encrypt(b"secret", "right", key_bits=256,
                             salt=b"abcdefgh")
    with pytest.raises(ValueError):
        openssl_pbe_decrypt(ct, "wrong", key_bits=256)


def test_salt_validation():
    with pytest.raises(ValueError, match="salt"):
        openssl_pbe_encrypt(b"x", "pw", salt=b"short")
    with pytest.raises(ValueError, match="salt=os.urandom"):
        openssl_pbe_encrypt(b"x", "pw")


@pytest.mark.skipif(not os.path.isdir(_REF),
                    reason="reference artifacts not present")
@pytest.mark.parametrize("fname,bits", [
    ("salted_raw.enc", 256), ("unsalted_raw.enc", 256),
    ("salted_128_raw.enc", 128), ("unsalted_128_raw.enc", 128)])
def test_reference_golden_enc_fixtures(fname, bits):
    """The reference's own TestEncryptContent artifacts decrypt
    byte-exactly with its documented password."""
    with open(_REF + fname, "rb") as fh:
        ct = fh.read()
    with open(_REF + "plain.txt", "rb") as fh:
        plain = fh.read()
    assert openssl_pbe_decrypt(ct, "thisIsABadPassword",
                               key_bits=bits) == plain


def test_operator_roundtrip_deterministic_salt(spark):
    from nifi_spark.operators import encrypt_content_pbe
    df = spark.createDataFrame(
        [(i, f"doc {i} " * 5) for i in range(12)],
        "id long, content string")
    enc = encrypt_content_pbe(df, "content", "pw", key_bits=256,
                              salt_col="id")
    enc2 = encrypt_content_pbe(df, "content", "pw", key_bits=256,
                               salt_col="id")
    a = {r["id"]: bytes(r["content"]) for r in enc.collect()}
    b = {r["id"]: bytes(r["content"]) for r in enc2.collect()}
    assert a == b                        # salt from md5(id) → stable
    assert all(v.startswith(b"Salted__") for v in a.values())
    dec = encrypt_content_pbe(enc, "content", "pw", key_bits=256,
                              mode="decrypt")
    back = {r["id"]: bytes(r["content"]).decode()
            for r in dec.collect()}
    assert back == {i: f"doc {i} " * 5 for i in range(12)}


# ----------------------------------------- strong-KDF framed layouts


def test_scrypt_rfc7914_vector():
    import hashlib
    got = hashlib.scrypt(b"password", salt=b"NaCl", n=1024, r=8, p=16,
                         dklen=64, maxmem=256 * 1024 * 1024)
    assert got.hex().startswith("fdbabe1c9d3472007856e7190d01e9fe")


def test_scrypt_salt_mcrypt_format():
    from nifi_spark.functions.openssl_kdf import (scrypt_format_salt,
                                                  scrypt_parse_salt)
    s = scrypt_format_salt(bytes(range(16)), 2 ** 14, 8, 1)
    assert s.startswith("$s0$e0801$")       # NiFi's documented form
    assert scrypt_parse_salt(s) == (bytes(range(16)), 16384, 8, 1)


@pytest.mark.parametrize("kdf", ["pbkdf2", "scrypt"])
def test_nifi_framed_layout_roundtrip(kdf):
    from nifi_spark.functions.openssl_kdf import (nifi_pbe_decrypt,
                                                  nifi_pbe_encrypt)
    data = b"framed payload \x00" * 21
    ct = nifi_pbe_encrypt(data, "pw", kdf=kdf, salt=b"s" * 16,
                          iv=b"i" * 16, iterations=1000, n=2 ** 10)
    # wire layout: salt-field || NiFiSALT || iv || NiFiIV || body
    i = ct.find(b"NiFiSALT")
    assert i > 0 and ct[i + 8:i + 8 + 16] == b"i" * 16
    assert ct[i + 24:i + 30] == b"NiFiIV"
    if kdf == "scrypt":
        assert ct.startswith(b"$s0$")       # params ride the stream
    else:
        assert ct[:16] == b"s" * 16
    assert nifi_pbe_decrypt(ct, "pw", kdf=kdf,
                            iterations=1000) == data
    with pytest.raises(ValueError):
        nifi_pbe_decrypt(ct, "wrong", kdf=kdf, iterations=1000)


def test_operator_strong_kdfs(spark):
    from nifi_spark.operators import encrypt_content_pbe
    df = spark.createDataFrame([(i, f"m{i}") for i in range(6)],
                               "id long, content string")
    for kdf in ("pbkdf2", "scrypt"):
        enc = encrypt_content_pbe(df, "content", "pw", kdf=kdf,
                                  iterations=1000, salt_col="id",
                                  out_col="ct")
        dec = encrypt_content_pbe(enc, "ct", "pw", kdf=kdf,
                                  iterations=1000, mode="decrypt",
                                  out_col="pt")
        back = {r["id"]: bytes(r["pt"]).decode() for r in dec.collect()}
        assert back == {i: f"m{i}" for i in range(6)}, kdf


# --------------------------------------------------------- bcrypt KDF


def test_bcrypt_reference_embedded_vector():
    """The exact vector BcryptCipherProviderGroovyTest pins (jBCrypt
    compatibility), over the from-scratch Blowfish/pi-box bcrypt."""
    from nifi_spark.functions.bcrypt_kdf import bcrypt_hashpw
    got = bcrypt_hashpw("abcdefghijklmnopqrstuvwxyz",
                        "$2a$10$fVH8e28OQRj9tqiDXs1e1u")
    assert got == ("$2a$10$fVH8e28OQRj9tqiDXs1e1u"
                   "xpsjN0c7II7YPKXua2NAKYvM6iQk7dq")


def test_bcrypt_pi_boxes_and_radix64():
    from nifi_spark.functions.bcrypt_kdf import (_P_INIT,
                                                 bcrypt_b64_decode,
                                                 bcrypt_b64_encode)
    assert _P_INIT[0] == 0x243F6A88 and _P_INIT[17] == 0x8979FB1B
    raw = bytes(range(16))
    assert bcrypt_b64_decode(bcrypt_b64_encode(raw), 16) == raw


def test_bcrypt_framed_layout_roundtrip():
    from nifi_spark.functions.openssl_kdf import (nifi_pbe_decrypt,
                                                  nifi_pbe_encrypt)
    data = b"cost rides the salt string" * 3
    ct = nifi_pbe_encrypt(data, "pw", kdf="bcrypt", salt=b"s" * 16,
                          iv=b"i" * 16, cost=4)
    assert ct.startswith(b"$2a$04$")     # cost travels with the stream
    assert nifi_pbe_decrypt(ct, "pw", kdf="bcrypt") == data
    with pytest.raises(ValueError):
        nifi_pbe_decrypt(ct, "nope", kdf="bcrypt")


def test_nifi_legacy_raw_salt_layout():
    from nifi_spark.functions.openssl_kdf import (evp_bytes_to_key,
                                                  nifi_legacy_decrypt,
                                                  nifi_legacy_encrypt)
    data = b"legacy payload" * 7
    ct = nifi_legacy_encrypt(data, "pw", key_bits=128, salt=b"s" * 16)
    assert ct[:16] == b"s" * 16           # raw salt, no Salted__ magic
    assert nifi_legacy_decrypt(ct, "pw", key_bits=128) == data
    # derivation is the single-iteration EVP scheme over the 16B salt
    key, iv = evp_bytes_to_key(b"pw", b"s" * 16, 16)
    from nifi_spark.functions.blockciphers import aes_cbc_decrypt
    assert aes_cbc_decrypt(key, iv, ct[16:]) == data


def test_operator_nifi_legacy(spark):
    from nifi_spark.operators import encrypt_content_pbe
    df = spark.createDataFrame([(i, f"v{i}") for i in range(4)],
                               "id long, content string")
    enc = encrypt_content_pbe(df, "content", "pw", kdf="nifi_legacy",
                              key_bits=128, salt_col="id",
                              out_col="ct")
    dec = encrypt_content_pbe(enc, "ct", "pw", kdf="nifi_legacy",
                              key_bits=128, mode="decrypt",
                              out_col="pt")
    assert {r["id"]: bytes(r["pt"]).decode() for r in dec.collect()} \
        == {i: f"v{i}" for i in range(4)}
