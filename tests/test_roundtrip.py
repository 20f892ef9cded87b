"""End-to-end lossless round-trip tests — the correctness bar of the whole
framework (reference src/test.sh cmp_2_files: genozip → genounzip → md5)."""

import os

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file

RNG = np.random.default_rng(42)


def synth_fastq(n_reads=2000, read_len=100, varied=False):
    out = []
    pos = 10000
    for i in range(n_reads):
        pos += int(RNG.integers(1, 50))
        rl = read_len if not varied else int(RNG.integers(50, 150))
        seq = RNG.choice(np.frombuffer(b"ACGT", np.uint8), rl)
        if RNG.random() < 0.01:
            seq[RNG.integers(0, rl)] = ord("N")
        qual = RNG.choice(np.frombuffer(b"FFFF:F,#", np.uint8), rl)
        out.append(b"@SIM:1:FCX:1:15:6329:%d 1:N:0:ATCACG\n" % pos)
        out.append(seq.tobytes() + b"\n+\n" + qual.tobytes() + b"\n")
    return b"".join(out)


def synth_fasta(n_contigs=3, clen=50000, width=70):
    out = []
    for i in range(n_contigs):
        out.append(b">chr%d synthetic test contig\n" % (i + 1))
        seq = RNG.choice(np.frombuffer(b"ACGT", np.uint8), clen).tobytes()
        for j in range(0, clen, width):
            out.append(seq[j:j + width] + b"\n")
    return b"".join(out)


def roundtrip(tmp_path, name, data, dt_name=None, vb_size=1 << 20):
    src = os.path.join(tmp_path, name)
    with open(src, "wb") as f:
        f.write(data)
    z = src + ".gxz"
    out = src + ".out"
    zip_file(src, z, dt_name=dt_name, vb_size=vb_size)
    piz_file(z, out)
    got = open(out, "rb").read()
    assert got == data, f"round-trip mismatch for {name}"
    return os.path.getsize(z)


def test_fastq_roundtrip(tmp_path):
    data = synth_fastq()
    zsize = roundtrip(str(tmp_path), "t.fastq", data)
    assert zsize < len(data) * 0.55


def test_fastq_varied_lens(tmp_path):
    data = synth_fastq(varied=True, n_reads=500)
    roundtrip(str(tmp_path), "tv.fastq", data)


def test_fastq_multi_vb(tmp_path):
    data = synth_fastq(n_reads=4000)
    roundtrip(str(tmp_path), "tm.fastq", data, vb_size=100 * 1024)


def test_fastq_no_final_newline(tmp_path):
    data = synth_fastq(n_reads=50)[:-1]
    roundtrip(str(tmp_path), "tn.fastq", data)


def test_fasta_roundtrip(tmp_path):
    data = synth_fasta()
    zsize = roundtrip(str(tmp_path), "t.fa", data)
    assert zsize < len(data) * 0.5  # 2-bit pack bound-ish


def test_fasta_edge_cases(tmp_path):
    data = b">empty\n\n>x\nACGT\nNNNN\n;comment line\n>y desc 123\nGGGGCCCC"
    roundtrip(str(tmp_path), "edge.fa", data)


def test_generic_roundtrip(tmp_path):
    data = bytes(RNG.integers(0, 256, 100000).astype(np.uint8))
    roundtrip(str(tmp_path), "t.bin", data, dt_name="generic")


def test_empty_file(tmp_path):
    roundtrip(str(tmp_path), "empty.fastq", b"", dt_name="fastq")


def synth_vcf(n=3000, samples=4):
    hdr = (b"##fileformat=VCFv4.2\n"
           b"##contig=<ID=chr21,length=46709983>\n"
           b'##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
           b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
           b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
           b"".join(b"\tS%d" % i for i in range(samples)) + b"\n")
    out = [hdr]
    pos = 5000000
    bases = b"ACGT"
    for i in range(n):
        pos += int(RNG.integers(1, 300))
        ref = bases[RNG.integers(0, 4):][:1]
        alt = bases[RNG.integers(0, 4):][:1]
        rid = b"rs%d" % (100000 + i * 3) if RNG.random() < 0.7 else b"."
        qual = b"%d.%02d" % (RNG.integers(20, 90), RNG.integers(0, 99))
        info = b"DP=%d;AF=0.%03d" % (RNG.integers(5, 90), RNG.integers(0, 999))
        gts = b"\t".join(b"%d/%d:%d" % (RNG.integers(0, 2), RNG.integers(0, 2),
                                        RNG.integers(1, 99))
                         for _ in range(samples))
        out.append(b"chr21\t%d\t%s\t%s\t%s\t%s\tPASS\t%s\tGT:DP\t%s\n"
                   % (pos, rid, ref, alt, qual, info, gts))
    return b"".join(out)


def test_vcf_roundtrip(tmp_path):
    data = synth_vcf()
    zsize = roundtrip(str(tmp_path), "t.vcf", data)
    assert zsize < len(data) * 0.25


def test_vcf_no_samples(tmp_path):
    data = synth_vcf(n=200, samples=0).replace(b"\tGT:DP", b"")
    # remove FORMAT column for sample-less VCF
    lines = data.split(b"\n")
    fixed = []
    for ln in lines:
        if ln.startswith(b"#") or not ln:
            fixed.append(ln)
        else:
            fixed.append(b"\t".join(ln.split(b"\t")[:8]))
    roundtrip(str(tmp_path), "ns.vcf", b"\n".join(fixed))


def test_vcf_ragged_rows(tmp_path):
    data = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            b"chr1\t100\t.\tA\tG\t50\tPASS\tDP=3\n"
            b"weird line without tabs\n"
            b"chr1\t200\t.\tC\tT\t99\tPASS\tDP=4\n")
    roundtrip(str(tmp_path), "rag.vcf", data, dt_name="vcf")
