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


def crypt_payload(key: bytes, salt: bytes, offset: int, data: bytes) -> bytes:
    assert native.available(), "encryption requires the native runtime"
    return native.aes256_ctr(key, counter0(salt, offset), data)
