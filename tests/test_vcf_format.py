"""Per-FORMAT-tag sample sub-contexts (reference src/vcf_samples.c:1601) —
ragged cells (trailing-tag dropping), missing samples, non-diploid GT
exceptions, numeric tag streams."""

import os

import numpy as np

from genozip_tpu.datatypes import get
from tests.test_roundtrip import roundtrip

RNG = np.random.default_rng(33)


def synth_rich_vcf(n=2500, samples=6):
    hdr = (b"##fileformat=VCFv4.2\n"
           b"##contig=<ID=chr1,length=248956422>\n"
           b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
           b"".join(b"\tS%d" % i for i in range(samples)) + b"\n")
    out = [hdr]
    pos = 10000
    bases = b"ACGT"
    for i in range(n):
        pos += int(RNG.integers(1, 500))
        cells = []
        for s in range(samples):
            r = RNG.random()
            if r < 0.03:
                cells.append(b".")                      # missing sample
            elif r < 0.06:
                cells.append(b"0/1")                    # trailing tags dropped
            elif r < 0.08:
                cells.append(b"0/1/1:12:30,2:99")       # triploid GT (exception)
            else:
                cells.append(b"%d%s%d:%d:%d,%d:%d" % (
                    RNG.integers(0, 3), [b"/", b"|"][int(RNG.integers(0, 2))],
                    RNG.integers(0, 3), RNG.integers(1, 90),
                    RNG.integers(0, 60), RNG.integers(0, 40),
                    RNG.integers(0, 100)))
        out.append(b"chr1\t%d\t.\t%s\t%s\t%d\tPASS\tDP=%d\tGT:DP:AD:GQ\t%s\n"
                   % (pos, bases[RNG.integers(0, 4):][:1],
                      bases[RNG.integers(0, 4):][:1], RNG.integers(20, 90),
                      RNG.integers(10, 400), b"\t".join(cells)))
    return b"".join(out)


def test_vcf_per_tag_roundtrip(tmp_path):
    data = synth_rich_vcf()
    zsize = roundtrip(str(tmp_path), "rich.vcf", data)
    assert zsize < len(data) * 0.30


def test_vcf_per_tag_contexts_engage():
    data = synth_rich_vcf(n=500)
    body = data.split(b"#CHROM", 1)[1].split(b"\n", 1)[1]
    dt = get("vcf")()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    # per-tag contexts, PBWT for GT, count stream for ragged cells
    assert "PBWT" in res.ctxs          # GT through the haplotype transform
    assert "GTEXC" in res.ctxs         # triploid GT exceptions
    assert "FS1" in res.ctxs           # DP numeric stream
    assert res.ctxs["FS1"].mode == "num"
    assert "SMPNC" in res.ctxs         # ragged cell counts
    assert "SMP" not in res.ctxs       # flat fallback NOT used


def test_vcf_overlong_cells_exception(tmp_path):
    """Cells with MORE subfields than FORMAT declares ride SMPEXC."""
    hdr = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
           b"\tINFO\tFORMAT\tS0\n")
    rows = [hdr]
    for i in range(200):
        cell = b"0/1:5:6:7:8" if i % 50 == 0 else b"0/1:5"
        rows.append(b"chr3\t%d\t.\tT\tA\t9\tPASS\t.\tGT:DP\t%s\n"
                    % (100 + i, cell))
    data = b"".join(rows)
    roundtrip(str(tmp_path), "overlong.vcf", data)
    body = data.split(b"#CHROM", 1)[1].split(b"\n", 1)[1]
    dt = get("vcf")()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "SMPEXC" in res.ctxs


def test_vcf_mixed_format_words_fallback(tmp_path):
    """Two different FORMAT strings in one VB -> flat fallback, still exact."""
    hdr = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
           b"\tINFO\tFORMAT\tS0\n")
    rows = [hdr]
    for i in range(300):
        fmt, cell = ((b"GT:DP", b"0/1:33") if i % 2 else (b"GT", b"1|1"))
        rows.append(b"chr2\t%d\t.\tA\tC\t50\tPASS\tDP=9\t%s\t%s\n"
                    % (1000 + i * 7, fmt, cell))
    data = b"".join(rows)
    roundtrip(str(tmp_path), "mixed.vcf", data)


def test_vcf_haploid_and_wide_alleles(tmp_path):
    """Haploid GTs and >9 allele indices can't PBWT -> generic tag path."""
    hdr = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
           b"\tINFO\tFORMAT\tS0\tS1\n")
    rows = [hdr]
    for i in range(300):
        rows.append(b"chrX\t%d\t.\tG\tT\t10\tPASS\t.\tGT:GQ\t%d:%d\t%d:%d\n"
                    % (500 + i * 11, RNG.integers(0, 2), RNG.integers(0, 99),
                       RNG.integers(0, 12), RNG.integers(0, 99)))
    data = b"".join(rows)
    roundtrip(str(tmp_path), "hap.vcf", data)


def test_vcf_info_per_tag(tmp_path):
    """Per-key INFO contexts (src/vcf_info.c): variable tag order and flag
    tags round-trip; numeric tags become int streams."""
    hdr = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
           b"\tINFO\n")
    rows = [hdr]
    for i in range(800):
        if i % 7 == 0:
            info = b"DB;DP=%d;AF=0.%03d" % (i % 90 + 1, i % 999)
        elif i % 7 == 1:
            info = b"."
        elif i % 7 == 2:
            info = b"DP=%d;ANN=G|missense|MODERATE;DB" % (i % 70)
        else:
            info = b"DP=%d;AF=0.%03d;MQ=%d" % (i % 90 + 1, (i * 3) % 999,
                                               30 + i % 30)
        rows.append(b"chr5\t%d\t.\tA\tG\t40\tPASS\t%s\n" % (1000 + i * 9, info))
    data = b"".join(rows)
    roundtrip(str(tmp_path), "info.vcf", data)
    body = data.split(b"\n", 1)[1].split(b"\n", 1)[1]
    dt = get("vcf")()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "INFOL" in res.ctxs
    assert "IDP" in res.ctxs and res.ctxs["IDP"].mode == "num"


def synth_csq_vcf(n=6000, diverse=True):
    """VEP-style CSQ annotations (reference src/vcf_vep.c role): diverse
    per-transcript fields (HGVS, domains, AF) where per-position splitting
    wins; diverse=False makes whole-value templates repeat instead."""
    genes = [b"GENE%04d" % i for i in range(800 if diverse else 5)]
    cons = [b"missense_variant", b"synonymous_variant", b"stop_gained",
            b"intron_variant"]
    aas = [b"Ala", b"Val", b"Gly", b"Ser", b"Leu", b"Thr", b"Pro", b"Arg"]
    hdr = (b"##fileformat=VCFv4.2\n##contig=<ID=chr1,length=248956422>\n"
           b'##INFO=<ID=CSQ,Number=.,Type=String,Description="VEP">\n'
           b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    out = [hdr]
    pos = 10000
    bases = [b"A", b"C", b"G", b"T"]
    for i in range(n):
        pos += int(RNG.integers(1, 500))
        ref, alt = bases[int(RNG.integers(0, 4))], bases[int(RNG.integers(0, 4))]
        trs = []
        for _ in range(int(RNG.integers(1, 5))):
            cdna = int(RNG.integers(1, 9000))
            if diverse:
                dom = (b"Pfam:PF%05d&PROSITE:PS%05d"
                       % (RNG.integers(1, 2e4), RNG.integers(1, 2e4))) \
                    if RNG.random() < 0.5 else b""
                trs.append(b"|".join([
                    alt, cons[int(RNG.integers(0, 4))],
                    genes[int(RNG.integers(0, len(genes)))],
                    b"ENST%011d.%d" % (RNG.integers(1, 3e5),
                                       RNG.integers(1, 9)),
                    b"c.%d%s>%s" % (cdna, ref, alt),
                    b"p.%s%d%s" % (aas[int(RNG.integers(0, 8))], cdna // 3,
                                   aas[int(RNG.integers(0, 8))]),
                    b"%d/%d" % (cdna, cdna + int(RNG.integers(0, 2000))),
                    dom,
                    b"0.%04d" % RNG.integers(0, 9999)]))
            else:
                # enum-product values: whole-value templates repeat
                trs.append(b"|".join([
                    alt, cons[int(RNG.integers(0, 4))],
                    genes[int(RNG.integers(0, len(genes)))],
                    b"Transcript", b"", b"HIGH",
                    b"%d" % cdna, b"", b"%d" % (cdna // 3)]))
        csq = b",".join(trs)
        if i % 53 == 0:
            csq = b"not|the|right||shape"    # exception path
        out.append(b"chr1\t%d\t.\t%s\t%s\t50\tPASS\tCSQ=%s;DP=%d\n"
                   % (pos, ref, alt, csq, RNG.integers(10, 400)))
    return b"".join(out)


def test_vcf_csq_structured_roundtrip(tmp_path):
    """CSQ per-position splitting round-trips byte-exact incl. malformed
    rows, and engages on diverse annotations."""
    data = synth_csq_vcf()
    roundtrip(str(tmp_path), "csq.vcf", data)
    body = data.split(b"#CHROM", 1)[1].split(b"\n", 1)[1]
    dt = get("vcf")()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "ICSQ_VB" in res.ctxs       # fit bitmap => structured path chosen
    assert "ICSQ_VX" in res.ctxs       # malformed rows in the exception lane


def test_vcf_csq_trial_is_measured(tmp_path):
    """The CSQ layout choice is measured, not guessed: on the repetitive
    corpus the trial must pick whichever layout estimates smaller (the
    width-aware tokenizer closed most of the gap, so either side may win —
    the invariant is the comparison itself), and round-trip regardless."""
    from genozip_tpu.contexts import est_ctxs_size
    from genozip_tpu.seg import tokenizer_seg_col
    data = synth_csq_vcf(diverse=False)
    roundtrip(str(tmp_path), "csqr.vcf", data)
    body = data.split(b"#CHROM", 1)[1].split(b"\n", 1)[1]
    dt = get("vcf")()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    chose_csq = "ICSQ_VB" in res.ctxs
    assert dt._csq_choice.get("ICSQ") == ("csq" if chose_csq else "tok")


def test_vcf_csq_beats_tokenizer_on_diverse(tmp_path):
    """Per-position sub-contexts must beat the single-stream tokenizer on
    diverse annotations (the per-platform fixture pattern)."""
    import genozip_tpu.datatypes.vcf as vcf_mod
    from genozip_tpu.zip_pipeline import zip_file
    data = synth_csq_vcf()
    p = os.path.join(str(tmp_path), "csq.vcf")
    open(p, "wb").write(data)
    zip_file(p, p + ".gxz")
    orig = vcf_mod.VcfDT._seg_csq
    vcf_mod.VcfDT._seg_csq = lambda self, name, vals: None
    try:
        zip_file(p, p + ".tok.gxz")
    finally:
        vcf_mod.VcfDT._seg_csq = orig
    assert os.path.getsize(p + ".gxz") < os.path.getsize(p + ".tok.gxz")
