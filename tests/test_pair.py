"""--pair R1/R2 co-compression tests (reference src/fastq.c:224-245:
pair-identical section dropping + pair-assisted GPOS)."""

import os

import numpy as np

from genozip_tpu.ref import refstore
from genozip_tpu.zip_pipeline import zip_file, zip_pair
from genozip_tpu.piz_pipeline import piz_file
from genozip_tpu.ops import pack as packops
from tests.test_aligner import synth_genome

RNG = np.random.default_rng(99)
BASES = np.frombuffer(b"ACGT", np.uint8)


def synth_pair(ref, n=1500, read_len=100, insert=250):
    """Proper read pairs: R1 fwd at p, R2 revcomp at p+insert-read_len."""
    r1, r2 = [], []
    G = ref.length
    for i in range(n):
        p = int(RNG.integers(0, G - insert))
        c1 = ref.codes[p:p + read_len]
        p2 = p + insert - read_len
        c2 = ref.codes[p2:p2 + read_len]
        seq1 = packops.ACGT[c1]
        seq2 = packops.ACGT[(c2 ^ 3)[::-1]]  # revcomp
        q = RNG.choice(np.frombuffer(b"FFFF:F,#", np.uint8), read_len)
        r1.append(b"@PAIR.%d/1\n" % i + seq1.tobytes() + b"\n+\n" + q.tobytes() + b"\n")
        q2 = RNG.choice(np.frombuffer(b"FFFF:F,#", np.uint8), read_len)
        r2.append(b"@PAIR.%d/2\n" % i + seq2.tobytes() + b"\n+\n" + q2.tobytes() + b"\n")
    return b"".join(r1), b"".join(r2)


def test_pair_roundtrip(tmp_path):
    fa = synth_genome(200000, 1)
    fa_path = os.path.join(str(tmp_path), "g.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "g.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    d1, d2 = synth_pair(ref)
    p1 = os.path.join(str(tmp_path), "r1.fastq")
    p2 = os.path.join(str(tmp_path), "r2.fastq")
    open(p1, "wb").write(d1)
    open(p2, "wb").write(d2)

    z = os.path.join(str(tmp_path), "pair.gxz")
    zip_pair(p1, p2, z, reference=ref_path)
    out = os.path.join(str(tmp_path), "out.fastq")
    piz_file(z, out, reference=ref_path)
    assert open(out + ".1", "rb").read() == d1
    assert open(out + ".2", "rb").read() == d2

    # paired must beat two separate archives (pair-identical + GPOS delta)
    za = os.path.join(str(tmp_path), "a.gxz")
    zb = os.path.join(str(tmp_path), "b.gxz")
    zip_file(p1, za, reference=ref_path)
    zip_file(p2, zb, reference=ref_path)
    assert os.path.getsize(z) < (os.path.getsize(za) + os.path.getsize(zb))


def test_pair_no_reference(tmp_path):
    d1 = b"".join(b"@X%d/1\nACGTACGT\n+\nFFFFFFFF\n" % i for i in range(300))
    d2 = b"".join(b"@X%d/2\nTTTTACGT\n+\nFFFF::FF\n" % i for i in range(300))
    p1 = os.path.join(str(tmp_path), "n1.fastq")
    p2 = os.path.join(str(tmp_path), "n2.fastq")
    open(p1, "wb").write(d1)
    open(p2, "wb").write(d2)
    z = os.path.join(str(tmp_path), "p.gxz")
    zip_pair(p1, p2, z)
    out = os.path.join(str(tmp_path), "o.fastq")
    piz_file(z, out)
    assert open(out + ".1", "rb").read() == d1
    assert open(out + ".2", "rb").read() == d2


def test_cat_r1_r2_components(tmp_path):
    """genocat --R1/--R2 (flags.h): emit one component of a pair archive."""
    import io
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_pair
    from genozip_tpu.filters import cat_filtered
    rng = np.random.default_rng(8)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    r1rows, r2rows = [], []
    for i in range(500):
        s1 = rng.choice(acgt, 80).tobytes()
        s2 = rng.choice(acgt, 80).tobytes()
        q = (rng.integers(5, 40, 80) + 33).astype(np.uint8).tobytes()
        r1rows.append(b"@pr%d/1\n%s\n+\n%s\n" % (i, s1, q))
        r2rows.append(b"@pr%d/2\n%s\n+\n%s\n" % (i, s2, q))
    p1 = os.path.join(str(tmp_path), "r1.fastq")
    p2 = os.path.join(str(tmp_path), "r2.fastq")
    open(p1, "wb").write(b"".join(r1rows))
    open(p2, "wb").write(b"".join(r2rows))
    z = os.path.join(str(tmp_path), "pp.gxz")
    zip_pair(p1, p2, z, vb_size=32 * 1024)

    class A:
        input = z
        head = tail = grep = downsample = lines = qnames = bases = None
        regions = None
        count = no_header = header_only = seq_only = qual_only = False
        one_vb = None
        reference = None
        r1 = r2 = False
    a = A(); a.r1 = True
    buf = io.BytesIO(); cat_filtered(a, buf)
    assert buf.getvalue() == b"".join(r1rows)
    b = A(); b.r2 = True
    buf = io.BytesIO(); cat_filtered(b, buf)
    assert buf.getvalue() == b"".join(r2rows)
