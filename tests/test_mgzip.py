"""Non-BGZF multi-member gz dialect matrix (reference src/mgzip.h:14-33:
IL1M/IL4M/MGZF/MGSP/EMFL/EMVL/GZBL): discovery, classification, and
byte-exact re-emission through zip -> unzip."""

import os
import struct
import zlib

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file, PizReader

RNG = np.random.default_rng(33)


def fastq_text(n=4000):
    rows = []
    for i in range(n):
        s = RNG.choice(np.frombuffer(b"ACGT", np.uint8), 100).tobytes()
        rows.append(b"@m%d\n%s\n+\n%s\n" % (i, s, b"F" * 100))
    return b"".join(rows)


def gz_member(payload: bytes, header: bytes, level=6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    return header + comp + struct.pack(
        "<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload) & 0xFFFFFFFF)


IL_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x04\x03"          # ILxM style
MGSP_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
MGZF_HEADER = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
               b"\x08\x00IG\x04\x00\x00\x00\x00\x00")            # IG subfield


def build(path, data, header, member_size, first_empty=False):
    with open(path, "wb") as f:
        if first_empty:
            f.write(gz_member(b"", header))
        for off in range(0, len(data), member_size):
            f.write(gz_member(data[off:off + member_size], header))


@pytest.mark.parametrize("name,header,msize,empty0,expect_kind", [
    ("il1m", IL_HEADER, 1 << 20, False, "il1m"),
    ("emfl", IL_HEADER, 256 << 10, False, "emfl"),
    ("emvl", IL_HEADER, 200 << 10, True, "emvl"),
    ("mgsp", MGSP_HEADER, 128 << 10, False, "mgsp"),
    ("mgzf", MGZF_HEADER, 300 << 10, False, "mgzf"),
])
def test_dialect_roundtrip(tmp_path, name, header, msize, empty0,
                           expect_kind):
    data = fastq_text(25000 if name == "il1m" else 4000)
    src = os.path.join(str(tmp_path), name + ".fastq.gz")
    build(src, data, header, msize, first_empty=empty0)
    orig = open(src, "rb").read()
    z = src + ".gxz"
    zip_file(src, z)
    pr = PizReader(z)
    mg = pr.file_hdr["mgzip"]
    pr.close()
    assert mg["kind"] == expect_kind, mg
    assert mg["exact"], mg
    out = os.path.join(str(tmp_path), "out.fastq.gz")
    piz_file(z, out)
    assert open(out, "rb").read() == orig, "not byte-exact"


def test_variable_members_gzbl(tmp_path):
    data = fastq_text(3000)
    src = os.path.join(str(tmp_path), "v.fastq.gz")
    with open(src, "wb") as f:
        off = 0
        k = 0
        while off < len(data):
            sz = int(RNG.integers(30_000, 200_000))
            f.write(gz_member(data[off:off + sz], IL_HEADER))
            off += sz
            k += 1
    orig = open(src, "rb").read()
    z = src + ".gxz"
    zip_file(src, z)
    pr = PizReader(z)
    assert pr.file_hdr["mgzip"]["kind"] == "gzbl"
    pr.close()
    out = src + ".out.gz"
    piz_file(z, out)
    assert open(out, "rb").read() == orig
