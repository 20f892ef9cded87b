"""Archive encryption: AES-256-CTR over compressed section payloads.

Reference parity: src/crypt.c (crypt_do :118) / src/aes.c — per-section
encryption with a password-derived key and a password test block. Here: key =
PBKDF2-HMAC-SHA256(password, salt, 200k); the plaintext FILE_HEADER carries
the salt + an 8-byte key-verification tag; every other section's compressed
payload is CTR-encrypted with counter0 = salt[:8] || section_offset (unique
per section since offsets are strictly increasing by more than the block
count). Section adler is over the *plaintext* compressed bytes, so a wrong
key fails cleanly at the digest check.
"""

import hashlib
import os

from . import native

FLAG_ENCRYPTED = 2


def derive_key(password: str, salt: bytes) -> bytes:
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt, 200_000)


def key_tag(key: bytes) -> str:
    return hashlib.sha256(b"gxz-verify" + key).hexdigest()[:16]


def new_salt() -> bytes:
    return os.urandom(16)


def counter0(salt: bytes, offset: int) -> bytes:
    return salt[:8] + offset.to_bytes(8, "little")


def _aes256_ctr_py(key: bytes, ctr0: bytes, data: bytes) -> bytes:
    """Host-library AES-256-CTR fallback (same keystream as the native
    kernel): used when the native runtime is unavailable so encryption
    degrades in speed, never in availability."""
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    enc = Cipher(algorithms.AES(key), modes.CTR(ctr0)).encryptor()
    return enc.update(data) + enc.finalize()


def crypt_payload(key: bytes, salt: bytes, offset: int, data: bytes) -> bytes:
    c0 = counter0(salt, offset)
    if native.available():
        return native.aes256_ctr(key, c0, data)
    return _aes256_ctr_py(key, c0, data)
