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


def test_bam_to_sam_translation(tmp_path):
    import gzip
    from tests.test_bam import synth_bam
    from genozip_tpu import native
    if not native.available():
        return
    raw = synth_bam(300)
    src = os.path.join(str(tmp_path), "t.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    zip_file(src, z)
    buf = io.BytesIO()
    from genozip_tpu.filters import cat_translated_sam
    cat_translated_sam(Args(input=z), buf)
    sam = buf.getvalue()
    lines = [l for l in sam.split(b"\n") if l and not l.startswith(b"@")]
    assert len(lines) == 300
    f0 = lines[0].split(b"\t")
    assert f0[2] == b"chr21" and f0[5].endswith(b"M")
    assert b"NM:i:" in lines[0] and b"AS:i:" in lines[0]
    # SEQ/QUAL lengths agree
    assert len(f0[9]) == len(f0[10])


def test_pair_interleave(tmp_path):
    from genozip_tpu.zip_pipeline import zip_pair
    d1 = b"".join(b"@X%d/1\nACGTACGT\n+\nFFFFFFFF\n" % i for i in range(30))
    d2 = b"".join(b"@X%d/2\nTTTTACGT\n+\nFFFF::FF\n" % i for i in range(30))
    p1 = os.path.join(str(tmp_path), "i1.fastq")
    p2 = os.path.join(str(tmp_path), "i2.fastq")
    open(p1, "wb").write(d1)
    open(p2, "wb").write(d2)
    z = os.path.join(str(tmp_path), "i.gxz")
    zip_pair(p1, p2, z)
    from genozip_tpu.filters import cat_interleaved
    buf = io.BytesIO()
    cat_interleaved(Args(input=z), buf)
    lines = buf.getvalue().split(b"\n")
    assert lines[0] == b"@X0/1" and lines[4] == b"@X0/2" and lines[8] == b"@X1/1"


def test_md5_tar_biopsy_coverage(tmp_path):
    import subprocess, tarfile
    from genozip_tpu.cli import main
    from tests.test_datatypes2 import synth_sam
    d = str(tmp_path)
    fq = os.path.join(d, "a.fastq")
    open(fq, "wb").write(synth_fastq(n_reads=200))
    sm = os.path.join(d, "b.sam")
    open(sm, "wb").write(synth_sam(300))
    # md5
    z = os.path.join(d, "a.gxz")
    main(["zip", fq, "-o", z, "--md5", "--test"])
    # tar
    tarp = os.path.join(d, "x.tar")
    main(["zip", fq, sm, "--tar", tarp])
    with tarfile.open(tarp) as tf:
        assert len(tf.getnames()) == 2
    # biopsy
    main(["zip", fq, "--biopsy", "1"])
    assert os.path.exists(fq + ".vb1")
    assert open(fq + ".vb1", "rb").read() == open(fq, "rb").read()
    # coverage/idxstats
    zs = os.path.join(d, "b.gxz")
    main(["zip", sm, "-o", zs])
    import io as _io
    from genozip_tpu.coverage import show_coverage
    buf = _io.StringIO()
    show_coverage(Args(input=zs, coverage=True), buf)
    assert "chr21" in buf.getvalue()
    buf = _io.StringIO()
    show_coverage(Args(input=zs, idxstats=True), buf)
    assert buf.getvalue().startswith("chr21\t")


def test_fast_best_modes(tmp_path):
    from genozip_tpu.codecs import assign as _assign
    d = str(tmp_path)
    fq = os.path.join(d, "fb.fastq")
    open(fq, "wb").write(synth_fastq(n_reads=300))
    try:
        for mode in ("fast", "best"):
            _assign.set_mode(mode)
            z = os.path.join(d, f"{mode}.gxz")
            zip_file(fq, z)
            from genozip_tpu.piz_pipeline import piz_file
            piz_file(z, None)
    finally:
        _assign.set_mode("normal")


def test_me23_to_vcf_translation(tmp_path):
    from genozip_tpu.ref import refstore
    from tests.test_aligner import synth_genome
    from genozip_tpu.ops import pack as packops
    import numpy as np
    d = str(tmp_path)
    fa = synth_genome(50000, 1)  # contig name ctg0
    fa_path = os.path.join(d, "m.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(d, "m.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)
    rng = np.random.default_rng(2)
    rows = [b"# 23andMe style header\n"]
    expect_alt = 0
    for i in range(300):
        pos = int(rng.integers(1, 50000))
        rb = packops.ACGT[ref.codes[pos - 1]]
        if rng.random() < 0.5:
            g = bytes([rb, rb])
        else:
            alt = packops.ACGT[(int(ref.codes[pos - 1]) + 1) % 4]
            g = bytes([rb, alt])
            expect_alt += 1
        rows.append(b"rs%d\tctg0\t%d\t%s\n" % (i, pos, g))
    rows.append(b"rsD\tctg0\t10\tDD\n")  # non-SNP -> dropped
    data = b"".join(rows)
    src = os.path.join(d, "g.txt")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, dt_name="me23")
    buf = io.BytesIO()
    from genozip_tpu.filters import cat_translated_vcf
    cat_translated_vcf(Args(input=z, reference=ref_path), buf)
    vcf = buf.getvalue()
    lines = [l for l in vcf.split(b"\n") if l and not l.startswith(b"#")]
    assert len(lines) == 300  # DD row dropped
    f = lines[0].split(b"\t")
    assert len(f) == 10 and f[8] == b"GT"
    nalt = sum(1 for l in lines if l.split(b"\t")[4] != b".")
    assert nalt == expect_alt


def test_vcf_ref_vs_genome(tmp_path):
    from genozip_tpu.ref import refstore
    from tests.test_aligner import synth_genome
    from genozip_tpu.ops import pack as packops
    from genozip_tpu.piz_pipeline import piz_file
    import numpy as np
    d = str(tmp_path)
    open(os.path.join(d, "v.fa"), "wb").write(synth_genome(60000, 1))
    ref_path = os.path.join(d, "v.ref.gxz")
    refstore.make_reference(os.path.join(d, "v.fa"), ref_path)
    ref = refstore.load_ref_file(ref_path)
    rng = np.random.default_rng(3)
    rows = [b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"]
    pos = 100
    for i in range(1500):
        pos += int(rng.integers(1, 30))
        rb = packops.ACGT[ref.codes[pos - 1]]
        refs = bytes([rb]) if rng.random() < 0.95 else b"ACG"  # some indels
        alt = packops.ACGT[(int(ref.codes[pos - 1]) + 1) % 4]
        rows.append(b"ctg0\t%d\t.\t%s\t%c\t50\tPASS\tDP=9\n" % (pos, refs, alt))
    data = b"".join(rows)
    src = os.path.join(d, "rv.vcf")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    out = src + ".out"
    piz_file(z, out, reference=ref_path)
    assert open(out, "rb").read() == data


def test_bases_and_count_filters(tmp_path):
    """--bases IUPAC filtering and --count (reference src/bases_filter.c,
    genocat --count)."""
    import io
    from types import SimpleNamespace
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.filters import cat_filtered
    rows = []
    for i in range(60):
        seq = b"ACGTACGTAC" if i % 3 else b"ACGTNNGTAC"
        rows.append(b"@r%d\n%s\n+\nFFFFFFFFFF\n" % (i, seq))
    data = b"".join(rows)
    src = f"{tmp_path}/b.fastq"
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)

    def run(**kw):
        buf = io.BytesIO()
        base = dict(input=z, grep=None, head=None, tail=None,
                    downsample=None, regions=None, no_header=False,
                    reference=None, count=False, bases=None)
        base.update(kw)
        cat_filtered(SimpleNamespace(**base), buf)
        return buf.getvalue()

    only_acgt = run(bases="ACGT")
    assert b"N" not in only_acgt.split(b"\n")[1]
    assert only_acgt.count(b"@r") == 40
    with_n = run(bases="^ACGT")
    assert with_n.count(b"@r") == 20
    assert run(count=True) == b"60\n"
    assert run(count=True, bases="ACGT") == b"40\n"


def test_qnames_and_lines_filters(tmp_path):
    """--qnames (qname_filter.c analog) and --lines range output."""
    import io
    from types import SimpleNamespace
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.filters import cat_filtered
    rows = []
    for i in range(50):
        rows.append(b"@read%d some desc\nACGTACGTAC\n+\nFFFFFFFFFF\n" % i)
    data = b"".join(rows)
    src = f"{tmp_path}/q.fastq"
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)

    def run(**kw):
        buf = io.BytesIO()
        base = dict(input=z, grep=None, head=None, tail=None,
                    downsample=None, regions=None, no_header=False,
                    reference=None, count=False, bases=None, lines=None,
                    qnames=None)
        base.update(kw)
        cat_filtered(SimpleNamespace(**base), buf)
        return buf.getvalue()

    got = run(qnames="read3,read7")
    assert got.count(b"@read") == 2 and b"@read3 " in got and b"@read7 " in got
    qf = f"{tmp_path}/names.txt"
    open(qf, "w").write("read10\nread11\n")
    assert run(qnames="@" + qf).count(b"@read") == 2
    got = run(lines="5-8")
    assert got.count(b"@read") == 4 and b"@read4 " in got and b"@read7 " in got
    assert run(lines="49-") .count(b"@read") == 2


def test_cat_projections_and_one_vb(tmp_path):
    """genocat --seq-only / --qual-only / --header-only / --one-vb
    (flags.h projection options)."""
    import io
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.filters import cat_filtered
    rng = np.random.default_rng(4)
    rows = []
    for i in range(600):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 50)
        q = (rng.integers(5, 40, 50) + 33).astype(np.uint8)
        rows.append(b"@p%d\n%s\n+\n%s\n" % (i, s.tobytes(), q.tobytes()))
    src = os.path.join(str(tmp_path), "p.fastq")
    open(src, "wb").write(b"".join(rows))
    z = src + ".gxz"
    zip_file(src, z, vb_size=16 * 1024)

    class A:
        input = z
        head = tail = grep = downsample = lines = qnames = bases = None
        regions = None
        count = False
        no_header = False
        header_only = seq_only = qual_only = False
        one_vb = None
    a = A()
    a.seq_only = True
    buf = io.BytesIO()
    cat_filtered(a, buf)
    seqs = buf.getvalue().split(b"\n")[:-1]
    assert len(seqs) == 600 and all(len(s) == 50 for s in seqs)
    assert seqs[0] == rows[0].split(b"\n")[1]
    a2 = A()
    a2.qual_only = True
    buf = io.BytesIO()
    cat_filtered(a2, buf)
    quals = buf.getvalue().split(b"\n")[:-1]
    assert quals[5] == rows[5].split(b"\n")[3]
    a3 = A()
    a3.one_vb = 1
    a3.count = True
    buf = io.BytesIO()
    cat_filtered(a3, buf)   # count path: just must not crash, VB subset
