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
    try:
        from cryptography.hazmat.primitives.ciphers import (Cipher,
                                                            algorithms, modes)
    except ImportError:
        return _aes256_ctr_pure(key, ctr0, data)
    enc = Cipher(algorithms.AES(key), modes.CTR(ctr0)).encryptor()
    return enc.update(data) + enc.finalize()


# --- pure-python AES-256 (FIPS-197) — last-resort tier so an archive can
# always be written/read, even on a host with neither g++ nor the
# `cryptography` package.  ~100 KB/s; correctness over speed. ---

_SBOX = None


def _aes_tables():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # generate the S-box from GF(2^8) inverses (no table literal needed)
    p, q, sbox = 1, 1, [0] * 256
    while True:
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) ^ \
            ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = x & 0xFF ^ 0x63
        if p == 1:
            break
    sbox[0] = 0x63
    _SBOX = sbox
    return sbox


def _xtime(a):
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _expand_key256(key: bytes):
    sbox = _aes_tables()
    w = [list(key[i:i + 4]) for i in range(0, 32, 4)]
    rcon = 1
    for i in range(8, 60):
        t = list(w[i - 1])
        if i % 8 == 0:
            t = t[1:] + t[:1]
            t = [sbox[b] for b in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif i % 8 == 4:
            t = [sbox[b] for b in t]
        w.append([w[i - 8][j] ^ t[j] for j in range(4)])
    return [sum(w[4 * r:4 * r + 4], []) for r in range(15)]


def _aes256_block(rk, blk):
    sbox = _aes_tables()
    s = [blk[i] ^ rk[0][i] for i in range(16)]
    for rnd in range(1, 15):
        s = [sbox[b] for b in s]
        # ShiftRows on column-major state: byte i sits at row i%4, col i//4
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < 14:
            t = []
            for c in range(4):
                a = s[4 * c:4 * c + 4]
                t += [
                    _xtime(a[0]) ^ _xtime(a[1]) ^ a[1] ^ a[2] ^ a[3],
                    a[0] ^ _xtime(a[1]) ^ _xtime(a[2]) ^ a[2] ^ a[3],
                    a[0] ^ a[1] ^ _xtime(a[2]) ^ _xtime(a[3]) ^ a[3],
                    _xtime(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xtime(a[3]),
                ]
            s = [b & 0xFF for b in t]
        s = [s[i] ^ rk[rnd][i] for i in range(16)]
    return bytes(s)


def _aes256_ctr_pure(key: bytes, ctr0: bytes, data: bytes) -> bytes:
    rk = _expand_key256(key)
    ctr = int.from_bytes(ctr0, "big")
    out = bytearray(len(data))
    for off in range(0, len(data), 16):
        ks = _aes256_block(rk, ((ctr + off // 16) % (1 << 128))
                           .to_bytes(16, "big"))
        chunk = data[off:off + 16]
        out[off:off + len(chunk)] = bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


def crypt_payload(key: bytes, salt: bytes, offset: int, data: bytes) -> bytes:
    c0 = counter0(salt, offset)
    if native.available():
        return native.aes256_ctr(key, c0, data)
    return _aes256_ctr_py(key, c0, data)
