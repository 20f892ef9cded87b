"""BAM round-trip: byte-exact on the uncompressed BAM stream."""

import gzip
import os
import struct

import numpy as np
import pytest

from genozip_tpu import native
from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file

RNG = np.random.default_rng(11)

SEQ_NIBBLES = b"=ACMGRSVTWYHKDBN"


def synth_bam(n=1500):
    sam_hdr = b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr21\tLN:46709983\n"
    refs = [(b"chr21", 46709983)]
    out = [b"BAM\x01", struct.pack("<i", len(sam_hdr)), sam_hdr,
           struct.pack("<i", len(refs))]
    for name, ln in refs:
        out.append(struct.pack("<i", len(name) + 1))
        out.append(name + b"\x00")
        out.append(struct.pack("<i", ln))
    pos = 100000
    for i in range(n):
        pos += int(RNG.integers(0, 100))
        qname = b"SIM.%d" % (5000000 + i)
        l_seq = int(RNG.integers(80, 121))
        cigar = [(l_seq << 4) | 0]  # <l_seq>M
        seq_codes = RNG.integers(0, 16, l_seq).astype(np.uint8)
        packed = bytearray((l_seq + 1) // 2)
        for j, c in enumerate(seq_codes):
            packed[j // 2] |= (int(c) << (4 if j % 2 == 0 else 0))
        qual = RNG.integers(20, 40, l_seq).astype(np.uint8).tobytes()
        aux = b"NMC" + bytes([int(RNG.integers(0, 5))]) + b"ASC" + bytes([int(RNG.integers(50, 100))])
        rec = struct.pack("<iiBBHHHiiii", 0, pos, len(qname) + 1,
                          int(RNG.integers(0, 61)), 4680, len(cigar),
                          int(RNG.choice([99, 147, 83, 163])), l_seq, 0,
                          pos + 50, 150)
        rec += qname + b"\x00"
        rec += b"".join(struct.pack("<I", c) for c in cigar)
        rec += bytes(packed) + qual + aux
        out.append(struct.pack("<I", len(rec)) + rec)
    return b"".join(out)


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bam_roundtrip(tmp_path):
    raw = synth_bam()
    src = os.path.join(str(tmp_path), "t.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    out = os.path.join(str(tmp_path), "out.bam")
    zip_file(src, z)
    piz_file(z, out)
    got = gzip.open(out, "rb").read()
    assert got == raw
    assert os.path.getsize(z) < len(raw) * 0.75


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bam_multi_vb(tmp_path):
    raw = synth_bam(3000)
    src = os.path.join(str(tmp_path), "m.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    zip_file(src, z, vb_size=100 * 1024)
    piz_file(z, None)  # digest-verify only


def test_bgzf_exact_roundtrip(tmp_path):
    """A BGZF input written by our own writer must re-emit byte-exactly
    (reference --bgzf=exact, src/mgzip.c)."""
    from genozip_tpu.utils.bgzf import open_bgzf
    import numpy as np
    rng = np.random.default_rng(5)
    reads = []
    for i in range(2000):
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 100)
        q = rng.choice(np.frombuffer(b"FF:,#", np.uint8), 100)
        reads.append(b"@bg%d\n" % i + seq.tobytes() + b"\n+\n" + q.tobytes() + b"\n")
    plain = b"".join(reads)
    src = os.path.join(str(tmp_path), "x.fastq.gz")
    w = open_bgzf(src)
    w.write(plain)
    w.close()
    orig_bytes = open(src, "rb").read()

    z = src + ".gxz"
    zip_file(src, z)
    out = os.path.join(str(tmp_path), "y.fastq.gz")
    piz_file(z, out)
    assert open(out, "rb").read() == orig_bytes  # compressed-byte identical


def test_bam_seq_vs_reference(tmp_path):
    """BAM SEQ goes through the by-reference path (nibbles -> ASCII ->
    CIGAR walk) and re-nibbles byte-exactly at PIZ."""
    import os
    from genozip_tpu.ref import refstore
    from genozip_tpu.ops import pack as packops
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from tests.test_aligner import synth_genome

    fa = synth_genome(120000, 1)
    fa_path = os.path.join(str(tmp_path), "bg.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "bg.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    rng = np.random.default_rng(12)
    nib_of = {65: 1, 67: 2, 71: 4, 84: 8, 78: 15}
    recs = []
    for i in range(800):
        p = int(rng.integers(0, ref.length - 150))
        codes = ref.codes[p:p + 100].copy()
        nm = int(rng.binomial(100, 0.01))
        if nm:
            mp = rng.integers(0, 100, nm)
            codes[mp] = (codes[mp] + 1) % 4
        seq = packops.ACGT[codes].tobytes().decode()
        if i % 40 == 0:
            seq = seq[:50] + "N" + seq[51:]
        qname = b"B%d" % i
        qual = bytes((rng.integers(20, 40, 100)).astype(np.uint8))
        cig = [(100, 0)]
        nib = bytearray()
        for j in range(0, 100, 2):
            nib.append((nib_of[ord(seq[j])] << 4) | nib_of[ord(seq[j + 1])])
        rec = struct.pack("<iiBBHHHiiii", 0, p, len(qname) + 1, 60,
                          4680, len(cig), 0, 100, -1, -1, 0)
        rec += qname + b"\0"
        for ln, op in cig:
            rec += struct.pack("<I", (ln << 4) | op)
        rec += bytes(nib) + qual + b"NMC" + bytes([min(nm, 255)])
        recs.append(struct.pack("<i", len(rec)) + rec)
    hdr_text = b"@HD\tVN:1.6\n@SQ\tSN:ctg0\tLN:120000\n"
    from genozip_tpu.utils.bgzf import open_bgzf
    src = os.path.join(str(tmp_path), "r.bam")
    f = open_bgzf(src)
    f.write(b"BAM\x01" + struct.pack("<i", len(hdr_text)) + hdr_text
            + struct.pack("<i", 1) + struct.pack("<i", 5) + b"ctg0\0"
            + struct.pack("<i", 120000))
    for r in recs:
        f.write(r)
    f.close()

    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out.bam"
    piz_file(z, o, reference=ref_path)
    import gzip
    assert gzip.open(o, "rb").read() == gzip.open(src, "rb").read()

    z2 = src + ".noref.gxz"
    zip_file(src, z2)
    piz_file(z2, src + ".out2.bam")
    assert gzip.open(src + ".out2.bam", "rb").read() == \
        gzip.open(src, "rb").read()
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.85, \
        (os.path.getsize(z), os.path.getsize(z2))


def test_bam_binary_aux_per_tag(tmp_path):
    """Binary aux tags (ints, float, Z strings, B arrays) split into per-tag
    contexts and round-trip; malformed aux rides AUXEXC."""
    import os
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from genozip_tpu.utils.bgzf import open_bgzf

    rng = np.random.default_rng(5)
    recs = []
    for i in range(500):
        qname = b"T%d" % i
        seq = b""
        qual = b""
        aux = (b"NMC" + bytes([i % 5])
               + b"ASs" + struct.pack("<h", -100 + i % 200)
               + b"XFf" + struct.pack("<f", 1.5 * (i % 7))
               + b"RGZ" + b"grp%d\0" % (i % 3)
               + b"XBB" + b"i" + struct.pack("<i", 3)
               + struct.pack("<iii", i, i * 2, -i))
        if i % 97 == 0:
            aux = b"\xffbroken"          # malformed -> AUXEXC
        rec = struct.pack("<iiBBHHHiiii", -1, -1, len(qname) + 1, 0,
                          4680, 0, 4, 0, -1, -1, 0)
        rec += qname + b"\0" + aux
        recs.append(struct.pack("<i", len(rec)) + rec)
    hdr_text = b"@HD\tVN:1.6\n"
    src = os.path.join(str(tmp_path), "aux.bam")
    f = open_bgzf(src)
    f.write(b"BAM\x01" + struct.pack("<i", len(hdr_text)) + hdr_text
            + struct.pack("<i", 0))
    for r in recs:
        f.write(r)
    f.close()
    z = src + ".gxz"
    zip_file(src, z)
    o = src + ".out.bam"
    piz_file(z, o)
    import gzip
    assert gzip.open(o, "rb").read() == gzip.open(src, "rb").read()

    # per-tag contexts engaged
    from genozip_tpu.piz_pipeline import PizReader
    pr = PizReader(z)
    loaded = pr.load_vb(1, 0)
    cm = loaded[0]["ctxs"]
    assert "AUXL" in cm and "AXNMC" in cm and "AXASs" in cm \
        and "AXXFf" in cm and "AXXBB" in cm and "AUXEXC" in cm
    pr.close()


def test_sam_to_bam_translation_and_bai(tmp_path):
    """SAM archive -> BAM via cat --bam (data_types.h:253-259 SAM2BAM
    translators): BAM->SAM back-translation must equal the original body;
    .bai (src/bai.c analog) structurally valid; and the produced BAM must
    round-trip byte-exact through the BAM datatype."""
    import gzip
    import struct
    import types
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from genozip_tpu.filters import cat_translated_bam
    from genozip_tpu.translate import bam_header_to_sam, bam_vb_to_sam

    rng = np.random.default_rng(21)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"]
    for i in range(500):
        L = 80
        seq = rng.choice(ACGT, L).tobytes()
        q = (rng.integers(30, 40, L).astype(np.uint8) + 33).tobytes()
        chrom = b"chr1" if i % 3 else b"chr2"
        pos = 100 + i * 37
        cig = b"40M2I38M" if i % 5 == 0 else b"%dM" % L
        rows.append(b"r%d\t%d\t%s\t%d\t60\t%s\t=\t%d\t160\t%s\t%s\t"
                    b"NM:i:%d\tXS:A:+\tZZ:Z:h%d\tBC:B:c,1,-2,3\n"
                    % (i, 99 if i % 2 else 163, chrom, pos, cig, pos + 80,
                       seq, q, i % 4, i))
    rows.append(b"u1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tFFFF\n")
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "t.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    bam_path = src + ".bam"
    cat_translated_bam(types.SimpleNamespace(
        input=z, reference=None, password=None, index=True), bam_path)

    raw = gzip.decompress(open(bam_path, "rb").read())
    sam_hdr, ref_names = bam_header_to_sam(raw)
    assert ref_names == ["chr1", "chr2"]
    l_text = int.from_bytes(raw[4:8], "little")
    off = 8 + l_text + 4
    for _ in range(2):
        ln = int.from_bytes(raw[off:off + 4], "little")
        off += 8 + ln
    back = bam_vb_to_sam(raw[off:], ref_names)
    assert back == b"".join(r for r in rows if not r.startswith(b"@"))

    bai = open(bam_path + ".bai", "rb").read()
    assert bai[:4] == b"BAI\x01"
    assert struct.unpack("<i", bai[4:8])[0] == 2

    z2 = bam_path + ".gxz"
    zip_file(bam_path, z2)
    out2 = os.path.join(str(tmp_path), "back.bam")
    piz_file(z2, out2)
    assert open(out2, "rb").read() == open(bam_path, "rb").read()


def test_bam_xa_predictor(tmp_path):
    """BWA XA:Z in binary aux rides the per-alt sub-context path shared
    with SAM (sam_tags.xa_seg, src/sam_bwa.c role) — byte-exact round
    trip including malformed XA values on the exception stream."""
    import gzip
    import numpy as np
    from genozip_tpu.translate import sam_header_to_bam, sam_vb_to_bam
    from genozip_tpu.utils.bgzf import BgzfWriter
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    hdr = b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"
    bam_hdr, name2id = sam_header_to_bam(hdr)
    rng = np.random.default_rng(5)
    rows = []
    for i in range(400):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 50).tobytes()
        q = bytes((rng.integers(0, 40, 50) + 33).astype(np.uint8))
        pos = 100 + i * 7
        xa = b"c1,+%d,50M,%d;" % (pos + 40 + i % 9, i % 3)
        if i % 23 == 7:
            xa = b"not-an-xa-value"       # exception path
        rows.append(b"x%d\t0\tc1\t%d\t60\t50M\t*\t0\t0\t%s\t%s\t"
                    b"NM:i:0\tXA:Z:%s\n" % (i, pos, s, q, xa))
    blob = sam_vb_to_bam(b"".join(rows), name2id)
    recs = blob[0] if isinstance(blob, tuple) else blob
    p = os.path.join(str(tmp_path), "xa.bam")
    f = open(p, "wb")
    w = BgzfWriter(f)
    w.write(bam_hdr)
    w.write(recs)
    w.close()
    zip_file(p, p + ".gxz")
    piz_file(p + ".gxz", p + ".out")
    assert open(p + ".out", "rb").read() == gzip.open(p, "rb").read()


# ---------------------------------------------------------------------------
# BAM gencomp: binary DEPN/PRIM deportation + SAG elision
# (reference src/gencomp_zip.c:587, src/sam_sag_ingest.c on the BAM layout)
# ---------------------------------------------------------------------------

_NIBOF = {65: 1, 67: 2, 71: 4, 84: 8}


def _gc_rec(qname, flag, pos, mapq, cigar_ops, seq, qual, aux):
    packed = bytearray((len(seq) + 1) // 2)
    for j, ch in enumerate(seq):
        packed[j // 2] |= _NIBOF[ch] << (4 if j % 2 == 0 else 0)
    r = struct.pack("<iiBBHHHiiii", 0, pos, len(qname) + 1, mapq, 4680,
                    len(cigar_ops), flag, len(seq), -1, -1, 0)
    r += qname + b"\x00"
    r += b"".join(struct.pack("<I", c) for c in cigar_ops)
    r += bytes(packed) + qual + aux
    return struct.pack("<I", len(r)) + r


def synth_sorted_bam_with_supps(n=1200, rev_frac=0.3):
    """Coordinate-sorted BAM where every 4th read has a supplementary whose
    SEQ/QUAL are the hard-clip slice of its primary and whose
    RNAME/POS/MAPQ/CIGAR match the primary's first SA:Z entry."""
    rng = np.random.default_rng(77)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    sam_hdr = b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr21\tLN:46709983\n"
    out = [b"BAM\x01", struct.pack("<i", len(sam_hdr)), sam_hdr,
           struct.pack("<i", 1), struct.pack("<i", 6), b"chr21\x00",
           struct.pack("<i", 46709983)]
    pos = 100000
    recs = []
    for i in range(n):
        pos += int(rng.integers(0, 100))
        qname = b"SIM.%d" % (5000000 + i)
        L = 100
        seq = rng.choice(acgt, L).tobytes()
        qual = rng.integers(20, 40, L).astype(np.uint8).tobytes()
        if i % 4 == 0:
            revd = rng.random() < rev_frac
            spos = pos + 1000
            strand = b"-" if revd else b"+"
            sa = b"SAZchr21,%d,%s,40H60M,60,0;\x00" % (spos + 1, strand)
            recs.append((pos, _gc_rec(qname, 0, pos, 60, [(L << 4) | 0],
                                      seq, qual, b"NMC\x00" + sa)))
            if revd:
                sseq = bytes(comp[b] for b in reversed(seq))[40:]
                squal = qual[::-1][40:]
                sflag = 0x800 | 0x10
            else:
                sseq, squal, sflag = seq[40:], qual[40:], 0x800
            sa2 = b"SAZchr21,%d,+,100M,60,0;\x00" % (pos + 1)
            recs.append((spos, _gc_rec(qname, sflag, spos, 60,
                                       [(40 << 4) | 5, (60 << 4) | 0],
                                       sseq, squal, b"NMC\x00" + sa2)))
        else:
            recs.append((pos, _gc_rec(qname, 0, pos, 60, [(L << 4) | 0],
                                      seq, qual, b"NMC\x00")))
    recs.sort(key=lambda t: t[0])
    out.extend(r for _, r in recs)
    return b"".join(out)


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bam_gencomp_roundtrip_and_elision(tmp_path):
    raw = synth_sorted_bam_with_supps()
    src = os.path.join(str(tmp_path), "gc.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    from genozip_tpu.piz_pipeline import PizReader
    zip_file(src, z, vb_size=256 * 1024)
    pr = PizReader(z)
    gc = (pr.file_hdr or {}).get("gencomp")
    assert gc and gc.get("prim_vbs", 0) > 0 and gc.get("depn_vbs", 0) > 0
    out = os.path.join(str(tmp_path), "gc.out.bam")
    piz_file(z, out)
    assert gzip.open(out, "rb").read() == raw
    # SAG elision engaged: most DEPN rows predict SEQ+QUAL from the store
    pr2 = PizReader(z)
    pr2.ensure_gencomp()
    loaded = pr2.load_vb(1, 2)
    _o, pctxs = pr2.recon_loaded_vb(loaded, 1, 2, want_pctxs=True)
    assert pctxs["SAGSEQ"].nums().mean() > 0.9
    assert pctxs["SAGQUL"].nums().mean() > 0.9
    assert pctxs["SAGF"].nums().min() >= 0


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bam_gencomp_dp_piz_identity(tmp_path):
    raw = synth_sorted_bam_with_supps(800)
    src = os.path.join(str(tmp_path), "gd.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    zip_file(src, z, vb_size=128 * 1024)
    from genozip_tpu.parallel.piz_sharded import piz_file_dp
    assert piz_file_dp(z, dp=3) == raw


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_bam_gencomp_mismatched_sa_falls_back(tmp_path):
    """Supplementaries whose SA entry contradicts the record (wrong pos,
    foreign seq) must fall back per-row, never corrupt."""
    raw_rec = []
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    sam_hdr = b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:1000000\n"
    out = [b"BAM\x01", struct.pack("<i", len(sam_hdr)), sam_hdr,
           struct.pack("<i", 1), struct.pack("<i", 3), b"c1\x00",
           struct.pack("<i", 1000000)]
    pos = 1000
    for i in range(300):
        pos += 13
        qn = b"q%04d" % i
        seq = rng.choice(acgt, 60).tobytes()
        qual = rng.integers(10, 41, 60).astype(np.uint8).tobytes()
        sa = b"SAZc1,%d,+,20H40M,60,0;\x00" % (pos + 500 + 1)
        out.append(_gc_rec(qn, 0, pos, 60, [(60 << 4) | 0], seq, qual,
                           b"NMC\x00" + sa))
        # wrong pos (off by 3), unrelated seq -> SAGF pos bit off, SAGSEQ 0
        bad_seq = rng.choice(acgt, 40).tobytes()
        out.append(_gc_rec(qn, 0x800, pos + 503, 55, [(20 << 4) | 5,
                                                      (40 << 4) | 0],
                           bad_seq, qual[20:], b"NMC\x00"))
    raw = b"".join(out)
    src = os.path.join(str(tmp_path), "bad.bam")
    with gzip.open(src, "wb") as f:
        f.write(raw)
    z = src + ".gxz"
    zip_file(src, z)
    outp = os.path.join(str(tmp_path), "bad.out.bam")
    piz_file(z, outp)
    assert gzip.open(outp, "rb").read() == raw
