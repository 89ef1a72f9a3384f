"""AES-128 decryption (FIPS-197) — numpy-vectorized, for PDF /AESV2
document decryption (extract/pdfcrypt.py).  Decrypt-only on the
library path; the test suite carries an independent forward cipher and
both directions are pinned to the FIPS-197 / SP 800-38A public
known-answer vectors.

Tables are DERIVED from the spec's GF(2^8) definitions at import time
(exp/log over generator 0x03, the S-box affine transform) rather than
transcribed, so a single-constant typo is structurally impossible.

CBC decryption vectorizes fully: all blocks ECB-decrypt in ten
table-lookup rounds over an (n, 16) array, then one shifted XOR
applies the chaining — no per-block Python loop.
"""

from __future__ import annotations

import numpy as np

# --- GF(2^8) tables from the spec's definitions -----------------------


def _build_tables():
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 0x03 = x * 2 ^ x
        x ^= ((x << 1) ^ (0x1B if x & 0x80 else 0)) & 0xFF
    exp[255] = exp[0]

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[(log[a] + log[b]) % 255]

    sbox = [0] * 256
    for b in range(256):
        inv = exp[255 - log[b]] if b else 0
        s = inv
        for shift in (1, 2, 3, 4):
            s ^= ((inv << shift) | (inv >> (8 - shift))) & 0xFF
        sbox[b] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i

    mul = {
        c: np.array([gmul(c, b) for b in range(256)], dtype=np.uint8)
        for c in (2, 3, 9, 11, 13, 14)
    }
    return (
        np.array(sbox, dtype=np.uint8),
        np.array(inv_sbox, dtype=np.uint8),
        mul,
    )


_SBOX, _INV_SBOX, _MUL = _build_tables()

# flat state layout: byte j of a block sits at row j%4, column j//4,
# i.e. columns are contiguous 4-byte groups
def _shift_idx(inverse: bool) -> np.ndarray:
    idx = np.empty(16, dtype=np.intp)
    for c in range(4):
        for r in range(4):
            src_c = (c - r) % 4 if inverse else (c + r) % 4
            idx[4 * c + r] = 4 * src_c + r
    return idx


_INV_SHIFT = _shift_idx(inverse=True)
_FWD_SHIFT = _shift_idx(inverse=False)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def expand_key(key: bytes) -> np.ndarray:
    """(rounds+1, 16) uint8 round keys (words are state columns) for
    AES-128 (11) or AES-256 (15)."""
    nk = len(key) // 4
    if len(key) not in (16, 32):
        raise ValueError("AES needs a 16- or 32-byte key")
    n_rounds = 10 if nk == 4 else 14
    words = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (n_rounds + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return np.array(
        [b for w in words for b in w], dtype=np.uint8
    ).reshape(n_rounds + 1, 16)


def expand_key_128(key: bytes) -> np.ndarray:
    if len(key) != 16:
        raise ValueError("AES-128 needs a 16-byte key")
    return expand_key(key)


def _inv_mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)  # (n, column, row)
    a0, a1, a2, a3 = (v[:, :, r] for r in range(4))
    m = _MUL
    r0 = m[14][a0] ^ m[11][a1] ^ m[13][a2] ^ m[9][a3]
    r1 = m[9][a0] ^ m[14][a1] ^ m[11][a2] ^ m[13][a3]
    r2 = m[13][a0] ^ m[9][a1] ^ m[14][a2] ^ m[11][a3]
    r3 = m[11][a0] ^ m[13][a1] ^ m[9][a2] ^ m[14][a3]
    return np.stack([r0, r1, r2, r3], axis=2).reshape(-1, 16)


def _mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)
    a0, a1, a2, a3 = (v[:, :, r] for r in range(4))
    m = _MUL
    r0 = m[2][a0] ^ m[3][a1] ^ a2 ^ a3
    r1 = a0 ^ m[2][a1] ^ m[3][a2] ^ a3
    r2 = a0 ^ a1 ^ m[2][a2] ^ m[3][a3]
    r3 = m[3][a0] ^ a1 ^ a2 ^ m[2][a3]
    return np.stack([r0, r1, r2, r3], axis=2).reshape(-1, 16)


def aes_decrypt_blocks(key: bytes, ct: bytes) -> bytes:
    """ECB-decrypt every 16-byte block (vectorized; AES-128/256)."""
    if len(ct) % 16:
        raise ValueError("AES ciphertext not block-aligned")
    if not ct:
        return b""
    rk = expand_key(key)
    last = len(rk) - 1
    s = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16) ^ rk[last]
    for rnd in range(last - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]]
        s = s ^ rk[rnd]
        s = _inv_mix_columns(s)
    s = _INV_SBOX[s[:, _INV_SHIFT]] ^ rk[0]
    return s.tobytes()


def aes_encrypt_blocks(key: bytes, pt: bytes) -> bytes:
    """ECB-encrypt (tests, KAT self-checks, and the R6 2.B hash)."""
    if len(pt) % 16:
        raise ValueError("AES plaintext not block-aligned")
    if not pt:
        return b""
    rk = expand_key(key)
    last = len(rk) - 1
    s = np.frombuffer(pt, dtype=np.uint8).reshape(-1, 16) ^ rk[0]
    for rnd in range(1, last):
        s = _SBOX[s][:, _FWD_SHIFT]
        s = _mix_columns(s)
        s = s ^ rk[rnd]
    s = _SBOX[s][:, _FWD_SHIFT] ^ rk[last]
    return s.tobytes()


# 128-bit aliases (the AESV2 call sites and historical tests)
aes128_decrypt_blocks = aes_decrypt_blocks
aes128_encrypt_blocks = aes_encrypt_blocks


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, pt: bytes) -> bytes:
    """CBC encrypt without padding (the R6 2.B hash primitive)."""
    if len(pt) % 16:
        raise ValueError("CBC-nopad needs block-aligned input")
    prev = iv
    out = bytearray()
    for i in range(0, len(pt), 16):
        x = bytes(a ^ b for a, b in zip(pt[i : i + 16], prev))
        prev = aes_encrypt_blocks(key, x)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, ct: bytes) -> bytes:
    """CBC decrypt without padding (R6 /UE and /Perms payloads)."""
    if len(ct) % 16:
        raise ValueError("CBC-nopad needs block-aligned input")
    pt = np.frombuffer(aes_decrypt_blocks(key, ct), dtype=np.uint8)
    prev = np.frombuffer(iv + ct[:-16], dtype=np.uint8)
    return (pt ^ prev).tobytes()


def aes128_cbc_decrypt(key: bytes, iv_ct: bytes) -> bytes:
    """PDF-shaped CBC: first 16 bytes are the IV; PKCS#7 padding is
    stripped (ValueError on malformed padding/length).  Despite the
    name the key may be 16 or 32 bytes (AESV2/AESV3 share the
    stream layout)."""
    if len(iv_ct) < 32 or (len(iv_ct) - 16) % 16:
        raise ValueError("bad AES-CBC payload length")
    iv, ct = iv_ct[:16], iv_ct[16:]
    out = aes_cbc_decrypt_nopad(key, iv, ct)
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding")
    return out[:-pad]
