"""PDF standard security handler — empty-user-password decrypt.

A large share of real-world "protected" invoices/receipts are
encrypted with an OWNER password only: the user password is empty, and
every conforming reader (pdftotext included) decrypts them silently
via PDF 32000-1 §7.6.3's algorithms.  This module implements the
Standard handler for V=1/R=2 (RC4-40), V=2/R=3 (RC4 up to 128-bit)
V=4/R=4 with the /AESV2 crypt filter (AES-128-CBC via
extract/aes.py, FIPS-KAT-pinned), and V=5/R=6 (PDF 2.0 AES-256 with
the Algorithm 2.B SHA-2/AES iterated hash): key derivation
(Algorithm 2, incl. the R4 /EncryptMetadata bytes), O/U computation
(3, 4, 5), empty-user-password verification (6 / 2.A), per-object
keys (Algorithm 1, with the AES 'sAlT' suffix), and the R6 /UE file-
key unwrap.  Evidence note: the AES cores are pinned to public FIPS/
NIST vectors; Algorithm 2.B has no public offline KAT in this
container, so its coverage is a faithful spec transcription +
structural tests + self round-trip — the weakest link is the hash
loop, not the cipher.

Other handlers raise NotImplementedError — error-as-value upstream
(the document flows to the unsupported path exactly like a
wrong-password file).

The ciphers here are the public textbook algorithms; they appear
strictly for DECRYPTING documents the user already possesses.
"""

from __future__ import annotations

import hashlib
import struct

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


def compute_key(
    password: bytes,
    o_value: bytes,
    p_value: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_value[:32])
    # /P is "a 32-bit integer, interpreted as a signed two's-complement
    # value" — but some writers store it unsigned (e.g. 4294967292 for
    # -4); mask to the bit pattern, which is identical either way, so
    # both encodings hash the same 4 bytes (ADVICE r3).
    h.update(struct.pack("<I", p_value & 0xFFFFFFFF))
    h.update(id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_len]).digest()
    return digest[:key_len]


def compute_o(owner_pw: bytes, user_pw: bytes, revision: int,
              key_len: int) -> bytes:
    """Algorithm 3: the /O value (used by the in-test encryptor and
    for owner-password checks)."""
    digest = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_len]
    o = rc4(key, _pad_password(user_pw))
    if revision >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U value."""
    if revision == 2:
        return rc4(key, _PAD)
    digest = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, digest)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def verify_user_password(
    password: bytes,
    o_value: bytes,
    u_value: bytes,
    p_value: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6: returns the file key when ``password`` is the user
    password, else None."""
    key = compute_key(
        password, o_value, p_value, id0, revision, key_len,
        encrypt_metadata,
    )
    expect = compute_u(key, id0, revision)
    got = u_value[:16] if revision >= 3 else u_value[:32]
    want = expect[:16] if revision >= 3 else expect[:32]
    return key if got == want else None


def object_key(file_key: bytes, num: int, gen: int,
               aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key (AES appends the 'sAlT'
    constant to the MD5 input)."""
    h = hashlib.md5(
        file_key
        + struct.pack("<I", num)[:3]
        + struct.pack("<I", gen)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash): SHA-256 seeded,
    then ≥64 rounds of AES-128-CBC over the 64x-repeated input with
    the digest family chosen by the ciphertext mod 3."""
    from .aes import aes_cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def verify_user_password_r6(
    password: bytes, u_value: bytes, ue_value: bytes
) -> bytes | None:
    """Algorithms 2.A/8 (R6): validate against /U (48 bytes: hash +
    validation salt + key salt) and unwrap the 256-bit file key from
    /UE.  Returns the file key or None."""
    if len(u_value) < 48 or len(ue_value) < 32:
        return None
    vsalt = u_value[32:40]
    ksalt = u_value[40:48]
    if hash_2b(password, vsalt) != u_value[:32]:
        return None
    from .aes import aes_cbc_decrypt_nopad

    ikey = hash_2b(password, ksalt)
    return aes_cbc_decrypt_nopad(ikey, b"\x00" * 16, ue_value[:32])


class StandardDecryptor:
    """Holds the verified file key; decrypts per-object payloads
    (``mode``: 'rc4', 'aes' — AESV2 per-object keys — or 'aes256' —
    AESV3, the file key used directly)."""

    __slots__ = ("key", "mode")

    def __init__(self, key: bytes, mode: str = "rc4"):
        self.key = key
        self.mode = mode

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.mode == "aes256":
            from .aes import aes128_cbc_decrypt

            return aes128_cbc_decrypt(self.key, data)
        if self.mode == "aes":
            from .aes import aes128_cbc_decrypt

            return aes128_cbc_decrypt(
                object_key(self.key, num, gen, aes=True), data
            )
        return rc4(object_key(self.key, num, gen), data)


def build_decryptor(encrypt: dict, id0: bytes) -> StandardDecryptor:
    """From a parsed /Encrypt dict (+ first /ID string): verify the
    EMPTY user password and return a decryptor.  Handles RC4 (V=1/2,
    R=2/3) and AES-128 (V=4/R=4 with /CFM /AESV2).  Raises ValueError
    for wrong passwords / malformed dicts, NotImplementedError for
    other handlers (AESV3/R6 needs SHA-2 machinery + 256-bit AES)."""
    if str(encrypt.get("Filter", "")) != "Standard":
        raise NotImplementedError("non-Standard security handler")
    v = int(encrypt.get("V", 0) or 0)
    r = int(encrypt.get("R", 0) or 0)
    mode = "rc4"
    encrypt_metadata = encrypt.get("EncryptMetadata", True) is not False
    if v == 5 and r == 6:
        # PDF 2.0: AES-256 with SHA-2 validation (AESV3)
        u = encrypt.get("U")
        ue = encrypt.get("UE")
        if not isinstance(u, bytes) or not isinstance(ue, bytes):
            raise ValueError("R6 Encrypt dict missing U/UE strings")
        key = verify_user_password_r6(b"", u, ue)
        if key is None:
            raise ValueError("PDF requires a user password")
        return StandardDecryptor(key, "aes256")
    if v == 4 and r == 4:
        cf = encrypt.get("CF")
        stdcf = cf.get("StdCF") if isinstance(cf, dict) else None
        cfm = str(stdcf.get("CFM", "")) if isinstance(stdcf, dict) else ""
        if cfm == "AESV2":
            mode = "aes"
        elif cfm != "V2":  # V2 = RC4 under crypt filters
            raise NotImplementedError(f"crypt filter {cfm or '?'}")
    elif v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(f"encryption V={v} R={r} unsupported")
    o = encrypt.get("O")
    u = encrypt.get("U")
    if not isinstance(o, bytes) or not isinstance(u, bytes):
        raise ValueError("Encrypt dict missing O/U strings")
    p = int(encrypt.get("P", -1))
    key_len = (
        int(encrypt.get("Length", 40) or 40) // 8 if v >= 2 else 5
    )
    if mode == "aes":
        key_len = 16  # AESV2 is AES-128 regardless of /Length quirks
    if not 5 <= key_len <= 16:
        raise ValueError("bad encryption key length")
    key = verify_user_password(
        b"", o, u, p, id0, r, key_len, encrypt_metadata
    )
    if key is None:
        raise ValueError("PDF requires a user password")
    return StandardDecryptor(key, mode)
