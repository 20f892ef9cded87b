"""N-way dispatcher fan-out (reference src/dispatcher.c:544): concurrent
seg workers with in-VB-order merge must produce byte-identical archives
to the sequential path, and round-trip losslessly."""

import os

import numpy as np

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file

RNG = np.random.default_rng(7)


def _fastq(n_reads=4000):
    out = []
    for i in range(n_reads):
        rl = int(RNG.integers(60, 140))
        seq = RNG.choice(np.frombuffer(b"ACGT", np.uint8), rl)
        qual = RNG.choice(np.frombuffer(b"FFFF:F,#", np.uint8), rl)
        out.append(b"@SIM:1:FCX:1:15:6329:%d 1:N:0:ATCACG\n" % (1000 + i))
        out.append(seq.tobytes() + b"\n+\n" + qual.tobytes() + b"\n")
    return b"".join(out)


def test_fanout_deterministic(tmp_path):
    """threads=1 and threads=4 archives are byte-identical (dict merge is
    in VB order regardless of seg completion order)."""
    data = _fastq()
    src = os.path.join(str(tmp_path), "t.fastq")
    with open(src, "wb") as f:
        f.write(data)
    z1, z4 = src + ".t1.gxz", src + ".t4.gxz"
    zip_file(src, z1, vb_size=64 << 10, threads=1)
    zip_file(src, z4, vb_size=64 << 10, threads=4)
    b1 = open(z1, "rb").read()
    b4 = open(z4, "rb").read()
    assert b1 == b4

    out = src + ".out"
    piz_file(z4, out)
    assert open(out, "rb").read() == data


def test_fanout_many_vbs_roundtrip(tmp_path):
    """Small VBs force >workers in-flight submissions through the deque."""
    data = _fastq(n_reads=1500)
    src = os.path.join(str(tmp_path), "m.fastq")
    with open(src, "wb") as f:
        f.write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=16 << 10, threads=3)
    out = src + ".out"
    piz_file(z, out)
    assert open(out, "rb").read() == data
