"""Deep (BAM+FASTQ co-compression) tests."""

import gzip
import os

import numpy as np
import pytest

from genozip_tpu import native
from genozip_tpu.zip_pipeline import zip_deep, zip_file
from genozip_tpu.piz_pipeline import piz_file
from tests.test_bam import synth_bam, SEQ_NIBBLES

RNG = np.random.default_rng(123)


def fastq_from_bam(raw_bam, frac_match=0.9):
    """Build a FASTQ whose reads mostly come from the BAM's alignments."""
    import struct
    from genozip_tpu.deep import DeepIndex
    idx = DeepIndex()
    # skip header
    l_text = int.from_bytes(raw_bam[4:8], "little")
    off = 8 + l_text
    n_ref = int.from_bytes(raw_bam[off:off + 4], "little")
    off += 4
    for _ in range(n_ref):
        ln = int.from_bytes(raw_bam[off:off + 4], "little")
        off += 8 + ln
    idx.add_bam_records(raw_bam[off:])
    seq, qual, rev = idx._build()
    names = sorted(idx.qname2row.items(), key=lambda kv: kv[1])
    out = []
    for qname, row in names:
        s = seq.row(row)
        q = qual.row(row)
        if RNG.random() > frac_match:
            s = s[:-1] + b"A"  # break the match
        out.append(b"@" + qname + b" extra:stuff\n" + s + b"\n+\n" + q + b"\n")
    return b"".join(out)


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_deep_roundtrip(tmp_path):
    d = str(tmp_path)
    raw = synth_bam(800)
    bam = os.path.join(d, "a.bam")
    with gzip.open(bam, "wb") as f:
        f.write(raw)
    fq_data = fastq_from_bam(raw)
    fq = os.path.join(d, "a.fastq")
    open(fq, "wb").write(fq_data)

    z = os.path.join(d, "deep.gxz")
    zip_deep(bam, [fq], z)
    out = os.path.join(d, "out")
    piz_file(z, out)
    assert open(out + ".1", "rb").read() == raw  # .1 has no .bam ext -> raw
    assert open(out + ".2", "rb").read() == fq_data

    # deep must beat separate compression (SEQ+QUAL stored once)
    za = os.path.join(d, "a.bam.gxz")
    zb = os.path.join(d, "a.fastq.gxz")
    zip_file(bam, za)
    zip_file(fq, zb)
    # margin is modest: standalone BAM now gets REF_INTERNAL too, so the
    # duplicated-SEQ saving deep eliminates is smaller in relative terms
    assert os.path.getsize(z) < (os.path.getsize(za) + os.path.getsize(zb)) * 0.95


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bamass_roundtrip(tmp_path):
    """--bamass: BAM placements assist FASTQ SEQ; PIZ needs only the ref."""
    import struct
    from tests.test_aligner import synth_genome
    from genozip_tpu.ref import refstore
    from genozip_tpu.ops import pack as packops

    d = str(tmp_path)
    fa = synth_genome(150000, 1)
    fa_path = os.path.join(d, "ba.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(d, "ba.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    # BAM whose reads come from the genome (contig name must match: ctg0)
    sam_hdr = b"@SQ\tSN:ctg0\tLN:150000\n"
    out = [b"BAM\x01", struct.pack("<i", len(sam_hdr)), sam_hdr,
           struct.pack("<i", 1), struct.pack("<i", 5), b"ctg0\x00",
           struct.pack("<i", 150000)]
    fq = []
    for i in range(500):
        p = int(RNG.integers(0, ref.length - 100))
        codes = ref.codes[p:p + 100].copy()
        mut = RNG.integers(0, 100, 2)
        codes[mut] = (codes[mut] + 1) % 4
        seq = packops.ACGT[codes]
        qname = b"BA.%d" % i
        packed = bytearray(50)
        n2c = {65: 1, 67: 2, 71: 4, 84: 8}
        for j, ch in enumerate(seq):
            packed[j // 2] |= n2c[int(ch)] << (4 if j % 2 == 0 else 0)
        qual = RNG.integers(20, 40, 100).astype(np.uint8)
        rec = struct.pack("<iiBBHHHiiii", 0, p, len(qname) + 1, 60, 4680, 1,
                          0, 100, -1, -1, 0)
        rec += qname + b"\x00" + struct.pack("<I", (100 << 4) | 0)
        rec += bytes(packed) + qual.tobytes()
        out.append(struct.pack("<I", len(rec)) + rec)
        q2 = RNG.choice(np.frombuffer(b"FFF:,#", np.uint8), 100)
        fq.append(b"@BA.%d\n" % i + seq.tobytes() + b"\n+\n" + q2.tobytes() + b"\n")
    bam = os.path.join(d, "a.bam")
    with gzip.open(bam, "wb") as f:
        f.write(b"".join(out))
    fq_path = os.path.join(d, "r.fastq")
    fq_data = b"".join(fq)
    open(fq_path, "wb").write(fq_data)

    z = os.path.join(d, "ba.gxz")
    zip_file(fq_path, z, reference=ref_path, bamass=bam)
    o = os.path.join(d, "ba.out")
    piz_file(z, o, reference=ref_path)   # note: NO bam needed at PIZ
    assert open(o, "rb").read() == fq_data
