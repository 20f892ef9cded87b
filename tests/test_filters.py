"""genocat-equivalent filters: --head/--tail/--grep/--downsample/--regions
(reference src/test.sh test_count_genocat_lines pattern)."""

import io
import os

import numpy as np

from genozip_tpu.cli import main
from genozip_tpu.zip_pipeline import zip_file
from tests.test_roundtrip import synth_fastq, synth_vcf


class Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getattr__(self, k):
        return None


def cat(z, **kw):
    from genozip_tpu.filters import cat_filtered
    buf = io.BytesIO()
    cat_filtered(Args(input=z, **kw), buf)
    return buf.getvalue()


def test_head_tail_downsample(tmp_path):
    data = synth_fastq(n_reads=100)
    src = os.path.join(str(tmp_path), "f.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    out = cat(z, head=10)
    assert out.count(b"\n") == 40
    out = cat(z, tail=5)
    assert out.count(b"\n") == 20
    assert out.endswith(data[-20:])
    out = cat(z, downsample=10)
    assert out.count(b"\n") == 40


def test_grep(tmp_path):
    data = synth_fastq(n_reads=50)
    src = os.path.join(str(tmp_path), "g.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    needle = data.split(b"\n")[0][1:].decode()  # full first qname (unique pos)
    out = cat(z, grep=needle)
    assert out.count(b"\n") == 4


def test_regions_vcf(tmp_path):
    data = synth_vcf(n=2000, samples=2)
    src = os.path.join(str(tmp_path), "r.vcf")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=100 * 1024)

    # pick a mid-file position window
    lines = [l for l in data.split(b"\n") if l and not l.startswith(b"#")]
    pos = [int(l.split(b"\t")[1]) for l in lines]
    lo, hi = pos[500], pos[900]
    out = cat(z, regions=f"chr21:{lo}-{hi}", no_header=True)
    got = [l for l in out.split(b"\n") if l]
    expect = [l for l, p in zip(lines, pos) if lo <= p <= hi]
    assert got == expect

    out = cat(z, regions="chrNOPE", no_header=True)
    assert out == b""
