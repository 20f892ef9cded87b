"""BGZF block-gzip writer (reference parity: src/mgzip.c BGZF re-compression
on PIZ output; the isize-exact re-emission mode is a later milestone — this
emits standard 64KB BGZF blocks + EOF marker, htslib-compatible)."""

import struct
import zlib

BLOCK = 65280  # uncompressed payload per BGZF block (htslib convention)

EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def _one_block(payload: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = len(comp) + 25 + 1
    hdr = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 8, 4,       # magic, deflate, FEXTRA
        0, 0, 0xFF,             # mtime, xfl, os
        6,                      # xlen
        0x42, 0x43, 2,          # 'B','C', slen
        bsize - 1)
    return hdr + comp + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                                    len(payload))


class BgzfWriter:
    def __init__(self, fileobj, level: int = 6):
        self.f = fileobj
        self.level = level
        self.buf = bytearray()

    def write(self, data: bytes):
        self.buf += data
        while len(self.buf) >= BLOCK:
            self.f.write(_one_block(bytes(self.buf[:BLOCK]), self.level))
            del self.buf[:BLOCK]

    def close(self):
        if self.buf:
            self.f.write(_one_block(bytes(self.buf), self.level))
            self.buf.clear()
        self.f.write(EOF_BLOCK)
        self.f.close()


def open_bgzf(path: str, level: int = 6) -> BgzfWriter:
    return BgzfWriter(open(path, "wb"), level)
