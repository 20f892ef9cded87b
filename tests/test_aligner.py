"""Reference store + seed-hash aligner tests: make-reference round-trip,
batch alignment correctness, and reference-based FASTQ compression."""

import os

import numpy as np
import pytest

from genozip_tpu.ref import refstore, aligner
from genozip_tpu.ops import pack as packops

RNG = np.random.default_rng(77)
BASES = np.frombuffer(b"ACGT", np.uint8)


def synth_genome(n=200000, n_contigs=2):
    parts = []
    for i in range(n_contigs):
        seq = RNG.choice(BASES, n // n_contigs).tobytes()
        lines = [b">ctg%d test\n" % i]
        for j in range(0, len(seq), 70):
            lines.append(seq[j:j + 70] + b"\n")
        parts.append(b"".join(lines))
    return b"".join(parts)


def sample_reads(ref, n_reads=300, read_len=100, mut_rate=0.01):
    reads = []
    G = ref.length
    for i in range(n_reads):
        p = int(RNG.integers(0, G - read_len))
        codes = ref.codes[p:p + read_len].copy()
        nmut = RNG.binomial(read_len, mut_rate)
        if nmut:
            mp = RNG.integers(0, read_len, nmut)
            codes[mp] = (codes[mp] + RNG.integers(1, 4, nmut)) % 4
        seq = packops.ACGT[codes]
        if RNG.random() < 0.5:
            comp = codes ^ 3
            seq = packops.ACGT[comp[::-1]]
        if RNG.random() < 0.05:
            seq = seq.copy()
            seq[RNG.integers(0, read_len)] = ord("N")
        reads.append(seq.tobytes())
    return reads


def test_ref_file_roundtrip(tmp_path):
    fa = synth_genome()
    fa_path = os.path.join(str(tmp_path), "g.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "g.ref.gxz")
    ref = refstore.make_reference(fa_path, ref_path)
    ref2 = refstore.load_ref_file(ref_path)
    assert (ref.codes == ref2.codes).all()
    assert (ref.refhash == ref2.refhash).all()
    assert ref.contigs == ref2.contigs


def test_align_batch():
    fa = synth_genome()
    ref = refstore.fasta_to_genome(fa)
    reads = sample_reads(ref)
    from genozip_tpu.utils.ragged import Col
    from genozip_tpu.utils import ragged as rg
    col = Col.from_list(reads)
    mat, lens = rg.to_matrix(col)
    codes = packops.BASE2BIT[mat]
    res = aligner.align_batch(ref, codes, lens)
    # nearly all reads must align (sampled from the genome)
    assert res["aligned"].mean() > 0.95
    # round-trip via mismatch lists
    ridx, mpos, mbase = aligner.mismatch_lists(
        ref, mat, codes, lens, res["gpos"], res["is_fwd"], res["aligned"])
    a = res["aligned"]
    nm = np.bincount(ridx, minlength=len(reads))[a]
    mm_ridx = np.repeat(np.arange(int(a.sum())), nm)
    out = aligner.reconstruct_batch(ref, res["gpos"][a], lens[a],
                                    res["is_fwd"][a], mm_ridx, mpos, mbase)
    recon = rg.from_matrix(out, lens[a])
    orig = rg.take(col, np.nonzero(a)[0])
    assert recon.to_list() == orig.to_list()


def test_fastq_with_reference_roundtrip(tmp_path):
    fa = synth_genome(300000, 1)
    fa_path = os.path.join(str(tmp_path), "g.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "g.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    reads = sample_reads(ref, n_reads=2000, read_len=100)
    out = []
    for i, r in enumerate(reads):
        qual = RNG.choice(np.frombuffer(b"FFFF:F,#", np.uint8), len(r))
        out.append(b"@R%d/1\n" % i + r + b"\n+\n" + qual.tobytes() + b"\n")
    data = b"".join(out)
    src = os.path.join(str(tmp_path), "r.fastq")
    open(src, "wb").write(data)

    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data

    # the aligner path must beat verbatim SEQ compression clearly
    z2 = src + ".noref.gxz"
    zip_file(src, z2)
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.75


def test_sam_with_reference_roundtrip(tmp_path):
    fa = synth_genome(200000, 1)
    fa_path = os.path.join(str(tmp_path), "sg.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "sg.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    out = [b"@HD\tVN:1.6\n@SQ\tSN:ctg0\tLN:200000\n"]
    quals = np.frombuffer(b"FFFF:F,#", np.uint8)
    pos = 1
    for i in range(1200):
        pos += int(RNG.integers(0, 100))
        rl = 100
        p = min(pos, ref.length - rl)
        codes = ref.codes[p:p + rl].copy()
        nmut = int(RNG.binomial(rl, 0.01))
        if nmut:
            mp = RNG.integers(0, rl, nmut)
            codes[mp] = (codes[mp] + 1) % 4
        seq = packops.ACGT[codes].tobytes()
        q = RNG.choice(quals, rl).tobytes()
        cig = b"100M" if i % 10 else b"50M2I48M"  # some non-simple CIGARs
        out.append(b"READ.%d\t0\tctg0\t%d\t60\t%s\t*\t0\t0\t%s\t%s\tNM:i:%d\n"
                   % (i, p + 1, cig, seq, q, nmut))
    data = b"".join(out)
    src = os.path.join(str(tmp_path), "t.sam")
    open(src, "wb").write(data)

    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data

    z2 = src + ".noref.gxz"
    zip_file(src, z2)
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.85


def test_sam_indel_cigars_vs_ref(tmp_path):
    """Indel/softclip CIGARs must round-trip through the by-ref path."""
    fa = synth_genome(100000, 1)
    fa_path = os.path.join(str(tmp_path), "ig.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "ig.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    out = [b"@SQ\tSN:ctg0\tLN:100000\n"]
    for i in range(600):
        p = int(RNG.integers(0, ref.length - 300))
        m1, ins, m2, dl = 40, 5, 35, 3
        seg1 = packops.ACGT[ref.codes[p:p + m1]].tobytes()
        insertion = RNG.choice(np.frombuffer(b"ACGT", np.uint8), ins).tobytes()
        seg2 = packops.ACGT[ref.codes[p + m1 + dl: p + m1 + dl + m2]].tobytes()
        clip = RNG.choice(np.frombuffer(b"ACGT", np.uint8), 4).tobytes()
        seq = clip + seg1 + insertion + seg2
        cig = b"4S40M5I3D35M"
        q = RNG.choice(np.frombuffer(b"FF:,#", np.uint8), len(seq)).tobytes()
        out.append(b"I%d\t0\tctg0\t%d\t60\t%s\t*\t0\t0\t%s\t%s\n"
                   % (i, p + 1, cig, seq, q))
    data = b"".join(out)
    src = os.path.join(str(tmp_path), "i.sam")
    open(src, "wb").write(data)
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data
    # by-ref must engage: matched bases should not be stored verbatim
    z2 = src + ".noref.gxz"
    zip_file(src, z2)
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.90


def test_ref_cache_roundtrip(tmp_path):
    """mmap sidecar cache (ref_cache.c analog) must load identically."""
    import os
    fa = synth_genome(60000, 2)
    fa_path = os.path.join(str(tmp_path), "c.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "c.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    r1 = refstore.load_ref_file(ref_path, cache=False)
    r2 = refstore.load_ref_file(ref_path)          # creates the cache
    assert os.path.exists(ref_path + ".cache")
    r3 = refstore.load_ref_file(ref_path)          # loads FROM the cache
    for r in (r2, r3):
        assert np.array_equal(np.asarray(r.codes), r1.codes)
        assert np.array_equal(np.asarray(r.refhash), r1.refhash)
        assert r.contigs == r1.contigs
        assert np.array_equal(np.asarray(r.iupac_pos), r1.iupac_pos)


def test_ref_cache_staleness(tmp_path):
    """A rebuilt .ref.gxz invalidates its sidecar cache (mtime check)."""
    import os
    import time
    fa1 = synth_genome(30000, 1)
    fa_path = os.path.join(str(tmp_path), "s.fa")
    open(fa_path, "wb").write(fa1)
    ref_path = os.path.join(str(tmp_path), "s.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    r1 = refstore.load_ref_file(ref_path)   # creates cache
    time.sleep(0.05)
    fa2 = synth_genome(31000, 1)            # different genome
    open(fa_path, "wb").write(fa2)
    refstore.make_reference(fa_path, ref_path)
    os.utime(ref_path)                      # ensure newer mtime
    r2 = refstore.load_ref_file(ref_path)   # must NOT serve the stale cache
    assert r2.length == 31000 and r1.length == 30000


def test_spliced_alignment(tmp_path):
    """RNA-style junction reads (prefix at gpos1, suffix at gpos1+gap) must
    align via the 2-segment splice search (reference aligner.c:514-586) and
    round-trip byte-exact through the FASTQ archive."""
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file

    fa = synth_genome(300000, 1)
    fa_path = os.path.join(str(tmp_path), "rna.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "rna.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    L, half = 120, 60
    reads, codes_rows = [], []
    n_spliced = 0
    for i in range(400):
        p = int(RNG.integers(0, ref.length - 80000))
        if i % 2 == 0:           # spliced read: 60 + intron-gap + 60
            gap = int(RNG.integers(200, 20000))
            c = np.concatenate([ref.codes[p:p + half],
                                ref.codes[p + gap + half:p + gap + L]])
            n_spliced += 1
        else:                    # plain read
            c = ref.codes[p:p + L].copy()
        codes_rows.append(c)
        reads.append(b"@sp%d\n%s\n+\n%s\n"
                     % (i, packops.ACGT[c].tobytes(), b"F" * L))

    codes_mat = np.stack(codes_rows)
    lens = np.full(400, L, np.int64)
    res = aligner.align_batch(ref, codes_mat, lens, splice=True)
    spl = res["aligned"] & (res["junction"] < lens)
    assert res["aligned"].mean() > 0.95, res["aligned"].mean()
    assert spl.sum() >= n_spliced * 0.8, (int(spl.sum()), n_spliced)
    # spliced placements must be near-exact (the junction search found it)
    assert res["nmm"][spl].mean() < 3

    data = b"".join(reads)
    src = os.path.join(str(tmp_path), "rna.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    piz_file(z, src + ".out", reference=ref_path)
    assert open(src + ".out", "rb").read() == data
    # and the splice contexts must actually engage in the archive
    from genozip_tpu.piz_pipeline import PizReader
    pr = PizReader(z, reference=ref_path)
    assert "SPLICED" in pr.load_vb(1)[0]["ctxs"]
    pr.close()


def test_pair_gpos_penalty_prefers_near_mate():
    """A read whose best-scoring placement (2 mismatches) is far from its
    R1 mate must lose to a near-mate placement (4 mismatches) once the
    NON_PAIR_PENALTY (=13) applies (aligner.c:26-27, 210-216)."""
    read = RNG.choice(BASES, 80)
    x = read.copy()                     # site X: 2 edits in the tail
    for p in (62, 71):
        x[p] = BASES[(np.nonzero(BASES == x[p])[0][0] + 1) % 4]
    y = read.copy()                     # site Y: 4 edits in the head
    for p in (2, 7, 12, 17):
        y[p] = BASES[(np.nonzero(BASES == y[p])[0][0] + 1) % 4]
    g = RNG.choice(BASES, 150000)
    siteX, siteY = 20000, 120000
    g[siteX:siteX + 80] = x
    g[siteY:siteY + 80] = y
    lines = [b">c0\n"]
    gb = g.tobytes()
    for j in range(0, len(gb), 70):
        lines.append(gb[j:j + 70] + b"\n")
    ref = refstore.fasta_to_genome(b"".join(lines), hash_bits=18)

    codes = packops.BASE2BIT[read][None, :]
    lens = np.full(1, 80, np.int64)
    res0 = aligner.align_batch(ref, codes, lens)
    assert int(res0["gpos"][0]) == siteX and int(res0["nmm"][0]) == 2
    pair = np.array([siteY - 100], np.int64)
    res = aligner.align_batch(ref, codes, lens, pair_gpos=pair)
    assert int(res["gpos"][0]) == siteY, int(res["gpos"][0])
    assert int(res["nmm"][0]) == 4


def test_refhash_layered_second_locus():
    """Layered refhash (refhash_make.c occupancy layers): a genome built as
    LEFT + LEFT (exact repeat) keeps BOTH loci; reads from the second copy
    still align (layer-1 candidates), where a single-layer table only knows
    the first copy."""
    from genozip_tpu.ref import refstore, aligner as al
    rng = np.random.default_rng(123)
    left = rng.choice(BASES, 30000)
    fa = b">c0\n" + left.tobytes() + left.tobytes() + b"\n"
    ref = refstore.fasta_to_genome(fa, hash_bits=18)
    size = 1 << ref.hash_bits
    assert ref.refhash.shape[0] == 2 * size          # two layers
    l1_hits = (ref.refhash[size:] != refstore.NO_GPOS).sum()
    assert l1_hits > 10000                           # repeats landed in l1
    # roundtrippable alignment of reads drawn from BOTH copies
    codes = refstore.fasta_to_genome(fa).codes
    L = 100
    starts = np.concatenate([rng.integers(0, 29000, 50),
                             rng.integers(30000, 59000, 50)])
    mat = np.stack([codes[s:s + L] for s in starts])
    res = al.align_batch(ref, mat, np.full(100, L, np.int64))
    assert res["aligned"].mean() > 0.95
    # reconstruction must be exact wherever the aligner placed the read
    mm = res["nmm"][res["aligned"]]
    assert (mm == 0).all()
