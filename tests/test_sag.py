"""SAG ingestion: DEPN alignments compress against their primary (reference
src/sam_sag_ingest.c, src/sam_sag_load.c, src/gencomp_zip.c PRIM/DEPN)."""

import os

import numpy as np

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file, PizReader

RNG = np.random.default_rng(91)
ACGT = np.frombuffer(b"ACGT", np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65}


def _revcomp(s: bytes) -> bytes:
    return bytes(COMP[c] for c in reversed(s))


def synth_sag_sam(n=900):
    """Primaries interleaved with supplementary (hard-clipped slice, maybe
    opposite strand) and secondary (identical seq) alignments of the same
    qname."""
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"]
    for i in range(n):
        seq = RNG.choice(ACGT, 100).tobytes()
        qual = RNG.choice(np.frombuffer(b"FF:,#", np.uint8), 100).tobytes()
        pos = 100 + i * 7
        rows.append(b"Q%d\t0\tc1\t%d\t60\t100M\t*\t0\t0\t%s\t%s\tNM:i:0\n"
                    % (i, pos, seq, qual))
        if i % 3 == 0:
            # supplementary: opposite strand, hard-clipped to 40 bases
            sup = _revcomp(seq)[25:65]
            supq = qual[::-1][25:65]
            rows.append(b"Q%d\t2064\tc1\t%d\t30\t25H40M35H\t*\t0\t0\t%s\t%s\n"
                        % (i, pos + 500, sup, supq))
        if i % 5 == 0:
            # secondary: same strand, full seq
            rows.append(b"Q%d\t256\tc1\t%d\t0\t100M\t*\t0\t0\t%s\t%s\n"
                        % (i, pos + 900, seq, qual))
    return b"".join(rows)


def test_sag_roundtrip_and_elision(tmp_path):
    data = synth_sag_sam()
    src = os.path.join(str(tmp_path), "sag.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=64 * 1024)
    o = src + ".out"
    piz_file(z, o)
    assert open(o, "rb").read() == data

    pr = PizReader(z)
    gc = pr.file_hdr.get("gencomp", {})
    assert gc.get("prim_vbs", 0) >= 1, "primaries must deport to PRIM"
    assert gc.get("depn_vbs", 0) >= 1
    # DEPN VBs must carry SAG contexts with mostly-hitting predictions
    loaded = pr.load_vb(1, 2)
    vb_hdr = loaded[0]
    assert "SAGIDX" in vb_hdr["ctxs"]
    assert "SAGSEQ" in vb_hdr["ctxs"]
    pr.close()

    # the SAG path must shrink the archive vs scrambled qnames (no matches)
    lines = data.split(b"\n")
    scr = []
    k = 0
    for ln in lines:
        if ln[:1] == b"Q" and (b"\t2064\t" in ln or b"\t256\t" in ln):
            ln = b"X%d" % k + ln[ln.index(b"\t"):]
            k += 1
        scr.append(ln)
    data2 = b"\n".join(scr)
    src2 = os.path.join(str(tmp_path), "nosag.sam")
    open(src2, "wb").write(data2)
    z2 = src2 + ".gxz"
    zip_file(src2, z2, vb_size=64 * 1024)
    piz_file(z2, src2 + ".out")
    assert open(src2 + ".out", "rb").read() == data2
    # SAG elision must clearly beat the renamed-qname control (the exact
    # margin moves a little with codec-assignment tuning)
    assert os.path.getsize(z) < os.path.getsize(z2) * 0.88, \
        (os.path.getsize(z), os.path.getsize(z2))


def test_cat_gencomp_reinterleaves(tmp_path):
    """gxz cat on a gencomp SAM archive must emit ALL lines (deported
    PRIM/DEPN included), in original order — both unfiltered and filtered
    paths, plus --count and coverage (advisor round-1 high finding)."""
    import io
    import types
    from genozip_tpu.filters import cat_filtered
    from genozip_tpu.coverage import show_coverage

    data = synth_sag_sam(300)
    src = os.path.join(str(tmp_path), "cat.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=32 * 1024)

    def run(**kw):
        base = dict(input=z, head=None, tail=None, grep=None,
                    downsample=None, count=False, lines=None, qnames=None,
                    bases=None, regions=None, no_header=False, reference=None)
        base.update(kw)
        out = io.BytesIO()
        cat_filtered(types.SimpleNamespace(**base), out)
        return out.getvalue()

    assert run() == data
    n_records = data.count(b"\n") - 2  # minus 2 header lines
    assert run(count=True, no_header=True) == b"%d\n" % n_records
    # --count --head N stops at N (advisor round-1 low finding)
    assert run(count=True, no_header=True, head=7) == b"7\n"
    # grep on a deported-qname record still finds it
    assert run(grep="Q3\t", no_header=True).count(b"\n") == \
        data.count(b"Q3\t")
    # coverage counts every mapped record incl. deported ones
    sio = io.StringIO()
    show_coverage(types.SimpleNamespace(input=z, reference=None,
                                        password=None, idxstats=True), sio)
    total = sum(int(ln.split("\t")[2]) for ln in sio.getvalue().splitlines()
                if not ln.startswith("*"))
    assert total == n_records


def test_qname_hash_width_independent():
    """The same qname must hash identically whatever the batch's max row
    width (advisor round-1 medium finding: prescan/split batch widths
    differ, silently disabling PRIM deportation)."""
    from genozip_tpu import sag as sag_mod
    from genozip_tpu.utils.ragged import Col
    h1 = sag_mod.qname_hash(Col.from_list([b"read1"]))
    h2 = sag_mod.qname_hash(Col.from_list(
        [b"read1", b"a-much-longer-query-name-xxxxx"]))
    assert h1[0] == h2[0]
    # and length participates: a prefix must not collide with its extension
    h3 = sag_mod.qname_hash(Col.from_list([b"read1", b"read1\0\0"]))
    assert h3[0] != h3[1]


def test_sag_dangling_supplementary(tmp_path):
    """Supplementary with no primary in the file: store miss, verbatim."""
    rows = [b"@HD\tVN:1.6\n"]
    for i in range(200):
        rows.append(b"D%d\t2048\tc1\t%d\t9\t10M\t*\t0\t0\tACGTACGTAC\tFFFFFFFFFF\n"
                    % (i, 100 + i))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "dang.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_paired_mates_disambiguate(tmp_path):
    """R1 and R2 primaries share a qname; the supplementary must reference
    the right mate (key includes the read1/read2 flag bits)."""
    rows = [b"@HD\tVN:1.6\n"]
    for i in range(150):
        s1 = RNG.choice(ACGT, 60).tobytes()
        s2 = RNG.choice(ACGT, 60).tobytes()
        q = b"F" * 60
        rows.append(b"P%d\t67\tc1\t%d\t60\t60M\t=\t%d\t120\t%s\t%s\n"
                    % (i, 100 + i, 160 + i, s1, q))
        rows.append(b"P%d\t131\tc1\t%d\t60\t60M\t=\t%d\t-120\t%s\t%s\n"
                    % (i, 160 + i, 100 + i, s2, q))
        # supplementary of R2 (0x800 | 0x80 | 0x1 ...)
        rows.append(b"P%d\t2177\tc1\t%d\t30\t20H40M\t*\t0\t0\t%s\t%s\n"
                    % (i, 999 + i, s2[20:], q[20:]))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "mates.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_with_reference_interplay(tmp_path):
    """SAG + --reference together: MAIN/PRIM VBs use the by-ref SEQ path,
    DEPN uses the SAG store; byte-exact either way."""
    from genozip_tpu.ref import refstore
    from genozip_tpu.ops import pack as packops
    from tests.test_aligner import synth_genome

    fa = synth_genome(100000, 1)
    fa_path = os.path.join(str(tmp_path), "sr.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "sr.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    rows = [b"@HD\tVN:1.6\n@SQ\tSN:ctg0\tLN:100000\n"]
    for i in range(500):
        p = int(RNG.integers(0, ref.length - 200))
        codes = ref.codes[p:p + 100].copy()
        codes[RNG.integers(0, 100)] = (codes[RNG.integers(0, 100)] + 1) % 4
        seq = packops.ACGT[codes].tobytes()
        q = b"F" * 100
        rows.append(b"S%d\t99\tctg0\t%d\t60\t100M\t=\t%d\t200\t%s\t%s\tNM:i:1\n"
                    % (i, p + 1, p + 100, seq, q))
        if i % 4 == 0:
            sup = seq[30:70]
            rows.append(b"S%d\t2113\tctg0\t%d\t30\t30H40M30H\t*\t0\t0\t%s\t%s\n"
                        % (i, p + 777, sup, q[30:70]))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "sr.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data


def synth_sa_sam(n=600, corrupt_frac=0.0):
    """Primaries + supplementaries where each carries an SA:Z tag
    (reference SAG_BY_SA): the supplementary's SA leads with the primary's
    entry 'rname,pos,strand,cigar,mapq,nm;'."""
    rng = np.random.default_rng(17)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"]
    for i in range(n):
        seq = rng.choice(ACGT, 100).tobytes()
        qual = rng.choice(np.frombuffer(b"FF:,#", np.uint8), 100).tobytes()
        pos = 100 + i * 9
        spos = pos + 700
        # primary's SA lists the supplementary; supplementary's SA leads
        # with the primary's entry
        rows.append(
            b"S%d\t0\tc1\t%d\t60\t100M\t*\t0\t0\t%s\t%s\tNM:i:0\t"
            b"SA:Z:c1,%d,+,40M60H,30,1;\n" % (i, pos, seq, qual, spos))
        sup = seq[:40]
        supq = qual[:40]
        sa = b"SA:Z:c1,%d,+,100M,60,0;" % pos
        if corrupt_frac and rng.random() < corrupt_frac:
            # same shape/entropy as the real entry but contradicts the
            # store (pos off by one) -> prediction must miss, not corrupt
            sa = b"SA:Z:c1,%d,-,100M,59,0;" % (pos + 1)
        rows.append(b"S%d\t2048\tc1\t%d\t30\t40M60H\t*\t0\t0\t%s\t%s\t%s\n"
                    % (i, spos, sup, supq, sa))
    return b"".join(rows)


def test_sag_by_sa_prediction(tmp_path):
    """DEPN SA:Z prefix predicted from the SAG store (SAG_BY_SA flavor,
    reference src/sam_sag.c): round-trip byte-exact and the SA residual
    context nearly empty."""
    data = synth_sa_sam()
    src = os.path.join(str(tmp_path), "sa.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    o = src + ".out"
    piz_file(z, o)
    assert open(o, "rb").read() == data

    # the depn component's SA contexts must be tiny: the whole value is the
    # predicted prefix, so the residual stream is empty strings. Compare
    # per-context SEC_STATS against a same-shape input whose SA values
    # contradict the store (prediction must miss into the residual).
    from genozip_tpu.format import sections as fmt

    def sa_ctx_bytes(zpath):
        pr = PizReader(zpath)
        payload, _ = pr.zr.read_one(fmt.SEC_STATS)
        per_ctx = fmt.json_parse(payload)
        pr.close()
        return sum(z_ for name, (_u, z_) in per_ctx.items()
                   if name.startswith("AXSAZ"))

    bad = synth_sa_sam(corrupt_frac=1.0)
    src2 = os.path.join(str(tmp_path), "sa_bad.sam")
    open(src2, "wb").write(bad)
    z2 = src2 + ".gxz"
    zip_file(src2, z2, vb_size=256 * 1024)
    piz_file(z2, src2 + ".out")
    assert open(src2 + ".out", "rb").read() == bad
    good_sa, bad_sa = sa_ctx_bytes(z), sa_ctx_bytes(z2)
    # predicted SA costs a fraction of the unpredicted residual
    assert good_sa < bad_sa * 0.6, (good_sa, bad_sa)


def test_sag_by_sa_mismatch_safe(tmp_path):
    """SA values that contradict the store must fall into the residual
    channel, never corrupt (fit-bitmap guard)."""
    data = synth_sa_sam(corrupt_frac=0.3)
    src = os.path.join(str(tmp_path), "sa_mix.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_by_nh_prediction(tmp_path):
    """SAG_BY_NH flavor: secondary multimapper rows copy the primary's
    NH:i (STAR-style); round-trip byte-exact, NH residual all-zero."""
    rng = np.random.default_rng(23)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"]
    for i in range(500):
        seq = rng.choice(ACGT, 60).tobytes()
        qual = rng.choice(np.frombuffer(b"FF:,#", np.uint8), 60).tobytes()
        nh = int(rng.integers(2, 5))
        pos = 50 + i * 11
        rows.append(b"m%d\t0\tc1\t%d\t255\t60M\t*\t0\t0\t%s\t%s\tNH:i:%d\n"
                    % (i, pos, seq, qual, nh))
        for k in range(nh - 1):
            rows.append(b"m%d\t256\tc1\t%d\t0\t60M\t*\t0\t0\t*\t*\tNH:i:%d\n"
                        % (i, pos + 300 * (k + 1), nh))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "nh.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_sa_field_prediction(tmp_path):
    """DEPN RNAME/POS/MAPQ/CIGAR predicted from the primary's SA first
    entry (reference src/sam_sag_zip.c SA-group fields): SAGF bitmap
    engages with all four bits set on supplementary rows, round-trip
    byte-exact."""
    data = synth_sa_sam()
    src = os.path.join(str(tmp_path), "saf.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data
    from genozip_tpu.piz_pipeline import PizReader
    pr = PizReader(z)
    pr.ensure_gencomp()
    gc = pr.file_hdr.get("gencomp")
    assert gc and gc["depn_vbs"], "gencomp did not engage"
    loaded = pr.load_vb(1, 2)  # first DEPN VB
    sagf = None
    for name, cm in loaded[0]["ctxs"].items():
        if name == "SAGF":
            sagf = cm
    assert sagf is not None, "SAGF prediction did not engage"


def test_sag_sa_field_mismatch_safe(tmp_path):
    """PRIMARY SA entries contradicting the supplementary's actual fields:
    per-row per-field prediction must miss, never corrupt."""
    rng = np.random.default_rng(31)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"]
    for i in range(400):
        seq = rng.choice(ACGT, 100).tobytes()
        qual = rng.choice(np.frombuffer(b"FF:,#", np.uint8), 100).tobytes()
        pos = 100 + i * 9
        spos = pos + 700
        # 40% of primaries carry an SA that misdescribes the supplementary
        if rng.random() < 0.4:
            psa = b"SA:Z:c1,%d,+,41M59H,29,1;" % (spos + 3)
        else:
            psa = b"SA:Z:c1,%d,+,40M60H,30,1;" % spos
        rows.append(b"S%d\t0\tc1\t%d\t60\t100M\t*\t0\t0\t%s\t%s\t"
                    b"NM:i:0\t%s\n" % (i, pos, seq, qual, psa))
        rows.append(b"S%d\t2048\tc1\t%d\t30\t40M60H\t*\t0\t0\t%s\t"
                    b"%s\tSA:Z:c1,%d,+,100M,60,0;\n"
                    % (i, spos, seq[:40], qual[:40], pos))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "safm.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_by_cc_prediction(tmp_path):
    """SAG_BY_CC flavor: secondary rows carry CC:Z/CP:i pointing back at
    the primary (two-element chains) — predicted from the store; rows
    where the chain points elsewhere fall to the residual."""
    rng = np.random.default_rng(29)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n@SQ\tSN:c2\tLN:100000\n"]
    for i in range(400):
        seq = rng.choice(ACGT, 60).tobytes()
        qual = rng.choice(np.frombuffer(b"FF:,#", np.uint8), 60).tobytes()
        pos = 50 + i * 11
        spos = pos + 5000
        rows.append(b"c%d\t0\tc1\t%d\t60\t60M\t*\t0\t0\t%s\t%s\t"
                    b"CC:Z:c1\tCP:i:%d\n" % (i, pos, seq, qual, spos))
        # secondary points back to the primary; 10% point elsewhere
        if i % 10:
            cc, cp = b"c1", pos
        else:
            cc, cp = b"c2", pos + 7
        rows.append(b"c%d\t256\tc1\t%d\t0\t60M\t*\t0\t0\t*\t*\t"
                    b"CC:Z:%s\tCP:i:%d\n" % (i, spos, cc, cp))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "cc.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=256 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_sag_by_solo_roundtrip(tmp_path):
    """SAG_BY_SOLO (sections.h:32 + sam_sag_zip.c:877): STARsolo-class
    files — secondary records repeat the primary's CB/UB barcodes; DEPN
    rows elide them by store copy behind a bitmap."""
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from genozip_tpu.piz_pipeline import PizReader
    from genozip_tpu.datatypes import get
    rng = np.random.default_rng(23)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    rows = [b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:500000\n"]
    p = 100
    for i in range(900):
        p += int(rng.integers(1, 80))
        s = rng.choice(acgt, 60).tobytes()
        q = (rng.integers(20, 40, 60) + 33).astype(np.uint8).tobytes()
        cb = bytes(rng.choice(acgt, 16)) + b"-1"
        ub = bytes(rng.choice(acgt, 12))
        base = b"NH:i:2\tCB:Z:%s\tUB:Z:%s" % (cb, ub)
        rows.append(b"v%d\t0\tc1\t%d\t255\t60M\t*\t0\t0\t%s\t%s\t%s\n"
                    % (i, p, s, q, base))
        if i % 3 == 0:   # secondary at another locus, same barcodes
            p2 = int(rng.integers(1, 400000))
            rows.append(b"v%d\t256\tc1\t%d\t0\t60M\t*\t0\t0\t*\t*\t%s\n"
                        % (i, p2, base))
    # unsorted secondaries: sort by pos like STARsolo coordinate output
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "solo.sam")
    open(src, "wb").write(data)
    # segconf detects the flavor
    dt = get("sam")()
    dt.segconf_scan(np.frombuffer(data[:65536], np.uint8))
    assert dt.segconf.get("sag_type") == "SOLO"
    z = src + ".gxz"
    zip_file(src, z)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data
    # the barcode elision engaged on the DEPN component
    pr = PizReader(z)
    assert (pr.file_hdr.get("gencomp") or {}).get("depn_vbs", 0) >= 1
    pr.ensure_gencomp()
    _o, pctxs = pr.recon_loaded_vb(pr.load_vb(1, 2), 1, 2, want_pctxs=True)
    gnames = [nm for nm in pctxs if nm.endswith("G") and nm.startswith("AX")]
    assert gnames, list(pctxs)
    for nm in gnames:
        assert pctxs[nm].nums().mean() > 0.9, nm
