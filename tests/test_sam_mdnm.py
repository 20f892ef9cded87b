"""MD:Z / NM:i prediction from the SEQ-vs-reference walk (reference
src/sam_md.c, src/sam_nm.c) and per-tag AUX contexts (src/sam_fields.c)."""

import os

import numpy as np

from genozip_tpu.ref import refstore
from genozip_tpu.ops import pack as packops
from genozip_tpu.utils.ragged import Col
from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file
from tests.test_aligner import synth_genome

RNG = np.random.default_rng(77)


def _true_md(ref_codes, p, segs):
    """Independent scalar MD generator. segs = list of (op, length)."""
    md = []
    run = 0
    g = p
    for op, L in segs:
        if op == "M":
            for i in range(L):
                # caller guarantees read bases: mismatch iff marked
                run += 1
                g += 1
        elif op == "D":
            md.append(str(run))
            md.append("^" + packops.ACGT[ref_codes[g:g + L]].tobytes().decode())
            run = 0
            g += L
        elif op in ("I", "S"):
            pass
    md.append(str(run))
    return "".join(md)


def make_sam(ref, n=1500):
    out = [b"@HD\tVN:1.6\n@SQ\tSN:ctg0\tLN:%d\n" % ref.length]
    quals = np.frombuffer(b"FFFF:F,#", np.uint8)
    ACGT = packops.ACGT
    for i in range(n):
        p = int(RNG.integers(0, ref.length - 300))
        kind = i % 5
        if kind < 3:  # plain 100M with mismatches
            rl = 100
            codes = ref.codes[p:p + rl].copy()
            nmut = int(RNG.binomial(rl, 0.02))
            mposs = np.unique(RNG.integers(0, rl, nmut)) if nmut else \
                np.zeros(0, np.int64)
            codes[mposs] = (codes[mposs] + 1) % 4
            seq = ACGT[codes].tobytes()
            cig = b"100M"
            # MD: runs between mismatches with ref base letters
            md, run, prev = [], 0, 0
            for mp_ in mposs:
                md.append(str(int(mp_) - prev))
                md.append(chr(ACGT[ref.codes[p + mp_]]))
                prev = int(mp_) + 1
            md.append(str(rl - prev))
            md = "".join(md)
            nm = mposs.shape[0]
        elif kind == 3:  # deletion: 30M2D68M, exact match elsewhere
            c1 = ref.codes[p:p + 30]
            c2 = ref.codes[p + 32:p + 100]
            seq = ACGT[np.concatenate([c1, c2])].tobytes()
            cig = b"30M2D68M"
            md = "30^" + ACGT[ref.codes[p + 30:p + 32]].tobytes().decode() + "68"
            nm = 2
        else:  # insertion: 40M3I57M
            c1 = ref.codes[p:p + 40]
            ins = RNG.integers(0, 4, 3).astype(np.uint8)
            c2 = ref.codes[p + 40:p + 97]
            seq = ACGT[np.concatenate([c1, ins, c2])].tobytes()
            cig = b"40M3I57M"
            md = "97"
            nm = 3
        q = RNG.choice(quals, len(seq)).tobytes()
        out.append(b"R%d\t0\tctg0\t%d\t60\t%s\t*\t0\t0\t%s\t%s\t"
                   b"NM:i:%d\tMD:Z:%s\tAS:i:%d\n"
                   % (i, p + 1, cig, seq, q, nm, md.encode(), 100 - nm))
    return b"".join(out)


def _setup_ref(tmp_path, glen=150000):
    fa = synth_genome(glen, 1)
    fa_path = os.path.join(str(tmp_path), "md.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "md.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    return ref_path, refstore.load_ref_file(ref_path)


def test_md_nm_prediction_roundtrip(tmp_path):
    ref_path, ref = _setup_ref(tmp_path)
    data = make_sam(ref)
    src = os.path.join(str(tmp_path), "md.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data

    # prediction must actually engage: seg directly and inspect contexts
    from genozip_tpu.datatypes import get
    dt = get("sam")()
    dt.ref = ref
    body = data.split(b"\n", 2)[2]
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "AUXL" in res.ctxs
    assert "AXNMi" in res.ctxs and res.ctxs["AXNMi"].param == 4
    nm_delta = res.ctxs["AXNMi"].local
    assert (nm_delta == 0).mean() > 0.95, "NM prediction should mostly hit"
    ok = res.ctxs["AXMDZK"].local
    assert ok.mean() > 0.95, f"MD prediction hit rate {ok.mean():.2f}"


def test_aux_irregular_rows_roundtrip(tmp_path):
    """Rows with malformed aux (bad tags, stray tabs, empty aux) fall into
    the AUXEXC channel and still round-trip."""
    lines = [
        b"@SQ\tSN:c\tLN:1000\n",
        b"r0\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:0\n",
        b"r1\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\n",          # empty aux
        b"r2\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\tbad\n",     # malformed
        b"r3\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\tXY:Z:\n",   # empty value
        b"r4\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\tZZ:B:i,1,2,3\tt0:Z:x y\n",
        b"r5\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:2\tMD:Z:2A1\n",
    ]
    data = b"".join(lines)
    src = os.path.join(str(tmp_path), "irr.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    o = src + ".out"
    piz_file(z, o)
    assert open(o, "rb").read() == data


def test_aux_per_tag_beats_single_stream(tmp_path):
    """Per-tag AUX contexts should not regress the ratio on tag-rich SAM."""
    ref_path, ref = _setup_ref(tmp_path)
    data = make_sam(ref, n=2500)
    src = os.path.join(str(tmp_path), "ratio.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    # the MD+NM columns are ~8% of this file; predicted they should be
    # nearly free — archive must be well under the no-ref archive size
    z2 = src + ".noref.gxz"
    zip_file(src, z2)
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.80


def test_ref_internal_denovo_genome(tmp_path):
    """REF_INTERNAL (reference.c, flags.h:16-21): SAM with NO external
    reference builds a denovo genome from its own alignments; SEQ streams
    must compress >=4x vs verbatim (round-1 bar) and round-trip with no
    reference supplied at unzip."""
    import json
    from genozip_tpu.piz_pipeline import PizReader

    rng = np.random.default_rng(14)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    contig = rng.choice(ACGT, 50000)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:50000\n"]
    for i in rng.permutation(6000):
        p = int(rng.integers(0, 50000 - 150))
        seq = contig[p:p + 150].copy()
        ne = rng.binomial(150, 0.005)
        if ne:
            mp = rng.integers(0, 150, ne)
            seq[mp] = ACGT[rng.integers(0, 4, ne)]
        q = (rng.integers(30, 40, 150).astype(np.uint8) + 33).tobytes()
        rows.append(b"n%d\t0\tc1\t%d\t60\t150M\t*\t0\t0\t%s\t%s\n"
                    % (i, p + 1, seq.tobytes(), q))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "ir.sam")
    open(src, "wb").write(data)

    def seq_stream_bytes(z):
        pr = PizReader(z)
        payload, _ = pr.zr.read_one(8)   # SEC_STATS
        st = json.loads(payload)
        pr.close()
        return sum(c for k, (u, c) in st.items()
                   if k in ("NONREF", "SQBITMAP", "GPOS", "STRAND", "SEQNM",
                            "SEQMISP", "SEQMISB"))

    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")          # NO reference supplied
    assert open(src + ".out", "rb").read() == data
    pr = PizReader(z)
    assert pr.file_hdr["ref_internal"] and pr.file_hdr["reference"] is None
    pr.close()

    import genozip_tpu.datatypes.sam as sam_mod
    orig = sam_mod.SamDT._maybe_init_internal_ref
    sam_mod.SamDT._maybe_init_internal_ref = lambda self, hdr: None
    try:
        z2 = src + ".plain.gxz"
        zip_file(src, z2, vb_size=256 * 1024)
    finally:
        sam_mod.SamDT._maybe_init_internal_ref = orig
    s_int, s_verb = seq_stream_bytes(z), seq_stream_bytes(z2)
    assert s_verb >= 4 * s_int, (s_int, s_verb)


def test_mc_mate_copy(tmp_path):
    """MC:Z predicted from the mate's CIGAR (reference mate-copy snips,
    sam_seg.c:27-60); wrong MC values fall into exceptions."""
    from genozip_tpu.piz_pipeline import PizReader
    rng = np.random.default_rng(6)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:900000\n"]
    for i in range(1500):
        p1 = 100 + i * 40
        p2 = p1 + 200
        c1 = b"100M" if i % 4 else b"60M40S"
        c2 = b"100M" if i % 3 else b"30S70M"
        s = rng.choice(ACGT, 100).tobytes()
        q = b"F" * 100
        rows.append(b"P%d\t99\tc1\t%d\t60\t%s\t=\t%d\t300\t%s\t%s\t"
                    b"MC:Z:%s\n" % (i, p1, c1, p2, s, q, c2))
        rows.append(b"P%d\t147\tc1\t%d\t60\t%s\t=\t%d\t-300\t%s\t%s\t"
                    b"MC:Z:%s\n" % (i, p2, c2, p1, s, q, c1))
    rows.append(b"X1\t99\tc1\t500000\t60\t100M\t=\t500200\t300\t%s\t%s\t"
                b"MC:Z:55M\n" % (rng.choice(ACGT, 100).tobytes(), b"F" * 100))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "mc.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data
    pr = PizReader(z)
    assert "AXMCZM" in pr.load_vb(1)[0]["ctxs"]
    pr.close()


def test_longread_unique_cigars_roundtrip(tmp_path):
    """Long-read-style SAM: every CIGAR template unique (many I/D/S ops) —
    exercises the flat-op table (no per-template walks) end to end."""
    import time
    from genozip_tpu.ref import refstore
    rng = np.random.default_rng(7)
    fa = b">c0\n" + rng.choice(np.frombuffer(b"ACGT", np.uint8),
                               400000).tobytes() + b"\n"
    fp = tmp_path / "g.fa"
    fp.write_bytes(fa)
    rp = tmp_path / "g.ref.gxz"
    refstore.make_reference(str(fp), str(rp))
    ref = refstore.load_ref_file(str(rp))
    ACGT = packops.ACGT
    out = [b"@HD\tVN:1.6\n@SQ\tSN:c0\tLN:%d\n" % ref.length]
    for i in range(300):
        p = int(rng.integers(0, ref.length - 6000))
        g = p
        segs = []
        seq = []
        cig = []
        nops = int(rng.integers(8, 40))
        for j in range(nops):
            kind = rng.integers(0, 10)
            L = int(rng.integers(1, 120 + i + j))  # lengths -> unique tmpl
            if kind < 6:      # M
                seq.append(ACGT[ref.codes[g:g + L]].tobytes())
                cig.append(b"%dM" % L)
                g += L
            elif kind < 8:    # I
                seq.append(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                      L).tobytes())
                cig.append(b"%dI" % L)
            else:             # D
                cig.append(b"%dD" % L)
                g += L
        sq = b"".join(seq)
        if not sq:
            sq = ACGT[ref.codes[p:p + 50]].tobytes()
            cig = [b"50M"]
        out.append(b"lr%d\t0\tc0\t%d\t60\t%s\t*\t0\t0\t%s\t%s\n" % (
            i, p + 1, b"".join(cig), sq, b"F" * len(sq)))
    payload = b"".join(out)
    src = tmp_path / "lr.sam"
    src.write_bytes(payload)
    z = tmp_path / "lr.gxz"
    o = tmp_path / "lr.out"
    t0 = time.time()
    zip_file(str(src), str(z), reference=str(rp))
    piz_file(str(z), str(o), reference=str(rp))
    dt = time.time() - t0
    assert o.read_bytes() == payload
    # seg must be vectorized: 300 unique templates in well under 30s
    assert dt < 30, f"long-read seg too slow: {dt:.1f}s"
