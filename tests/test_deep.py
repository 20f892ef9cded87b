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
    assert os.path.getsize(z) < (os.path.getsize(za) + os.path.getsize(zb)) * 0.85
