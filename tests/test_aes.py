"""AES-128 tests (extract/aes.py) — pinned to the PUBLIC known-answer
vectors (FIPS-197 Appendix C.1, NIST SP 800-38A F.1/F.2), which makes
the decrypt path an absolute oracle rather than a self-round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from receipt_scanner_spark.extract.aes import (
    aes128_cbc_decrypt,
    aes128_decrypt_blocks,
    aes128_encrypt_blocks,
    expand_key_128,
)


class TestKnownAnswer:
    def test_fips197_c1(self):
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        assert aes128_encrypt_blocks(key, pt) == ct
        assert aes128_decrypt_blocks(key, ct) == pt

    def test_sp800_38a_ecb(self):
        # F.1.1 ECB-AES128.Encrypt, all four blocks
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        pt = bytes.fromhex(
            "6bc1bee22e409f96e93d7e117393172a"
            "ae2d8a571e03ac9c9eb76fac45af8e51"
            "30c81c46a35ce411e5fbc1191a0a52ef"
            "f69f2445df4f9b17ad2b417be66c3710"
        )
        ct = bytes.fromhex(
            "3ad77bb40d7a3660a89ecaf32466ef97"
            "f5d3d58503b9699de785895a96fdbaaf"
            "43b1cd7f598ece23881b00e3ed030688"
            "7b0c785e27e8ad3f8223207104725dd4"
        )
        assert aes128_encrypt_blocks(key, pt) == ct
        assert aes128_decrypt_blocks(key, ct) == pt

    def test_sp800_38a_cbc_chain(self):
        # F.2.2 CBC-AES128.Decrypt: full 4-block chain, via the padded
        # CBC API (append one pad block encrypted under the chain)
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex(
            "6bc1bee22e409f96e93d7e117393172a"
            "ae2d8a571e03ac9c9eb76fac45af8e51"
            "30c81c46a35ce411e5fbc1191a0a52ef"
            "f69f2445df4f9b17ad2b417be66c3710"
        )
        ct = bytes.fromhex(
            "7649abac8119b246cee98e9b12e9197d"
            "5086cb9b507219ee95db113a917678b2"
            "73bed6b8e3c1743b7116e69e22229516"
            "3ff1caa1681fac09120eca307586e1a7"
        )
        pad_pt = bytes([16]) * 16
        last = aes128_encrypt_blocks(
            key, bytes(a ^ b for a, b in zip(pad_pt, ct[-16:]))
        )
        assert aes128_cbc_decrypt(key, iv + ct + last) == pt

    def test_fips197_c3_aes256(self):
        from receipt_scanner_spark.extract.aes import (
            aes_decrypt_blocks,
            aes_encrypt_blocks,
        )

        key = bytes.fromhex(
            "000102030405060708090a0b0c0d0e0f"
            "101112131415161718191a1b1c1d1e1f"
        )
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
        assert aes_encrypt_blocks(key, pt) == ct
        assert aes_decrypt_blocks(key, ct) == pt

    def test_key_expansion_fips_a1(self):
        # FIPS-197 A.1: last round key of the 2b7e... cipher key
        rk = expand_key_128(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
        assert rk[10].tobytes().hex() == "d014f9a8c9ee2589e13f0cc8b6630ca6"


class TestRobustness:
    def test_round_trip_random(self):
        rng = np.random.default_rng(5)
        key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        pt = bytes(rng.integers(0, 256, 16 * 40, dtype=np.uint8))
        assert aes128_decrypt_blocks(key, aes128_encrypt_blocks(key, pt)) == pt

    def test_misaligned_raises(self):
        with pytest.raises(ValueError):
            aes128_decrypt_blocks(b"k" * 16, b"short")
        with pytest.raises(ValueError):
            aes128_cbc_decrypt(b"k" * 16, b"x" * 31)

    def test_bad_padding_raises(self):
        key = b"k" * 16
        iv = b"\x00" * 16
        block = aes128_encrypt_blocks(key, b"\x00" * 16)  # pad byte 0
        with pytest.raises(ValueError):
            aes128_cbc_decrypt(key, iv + block)

    def test_bad_key_length_raises(self):
        with pytest.raises(ValueError):
            expand_key_128(b"too short")
