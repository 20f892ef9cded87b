"""Mapper/platform-specific AUX tag predictors (sam_tags.py; reference
src/sam_bwa.c, src/sam_minimap2.c, src/sam_10xGenomics.c, src/sam_bismark.c).
"""

import os

import numpy as np

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file

RNG = np.random.default_rng(1234)

BASES = np.frombuffer(b"ACGT", np.uint8)


def _rand_seq(n):
    return RNG.choice(BASES, n).tobytes()


def make_bwa_sam(n=400):
    """BWA-style: AS/XS scores, XA alt hits, plus an oddball row per 50."""
    out = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:90000\n"]
    for i in range(n):
        rl = 100
        seq = _rand_seq(rl)
        pos = 1000 + i * 37
        as_v = rl - int(RNG.integers(0, 10))
        xs_v = as_v - int(RNG.integers(0, 20))
        aux = b"AS:i:%d\tXS:i:%d" % (as_v, xs_v)
        if i % 3 == 0:
            alts = []
            for _ in range(int(RNG.integers(1, 4))):
                strand = b"+" if RNG.integers(0, 2) else b"-"
                alts.append(b"chr%d,%s%d,%dM,%d;" % (
                    int(RNG.integers(1, 3)), strand,
                    pos + int(RNG.integers(-5000, 5000)), rl,
                    int(RNG.integers(0, 4))))
            aux += b"\tXA:Z:" + b"".join(alts)
        if i % 50 == 7:   # malformed XA must survive via the exception path
            aux += b"\tXA:Z:not,a,valid"
        out.append(b"r%d\t0\tchr1\t%d\t60\t%dM\t*\t0\t0\t%s\t%s\t%s\n" % (
            i, pos, rl, seq, b"F" * rl, aux))
    return b"".join(out)


def make_10x_sam(n=300):
    """10x-style: CB/CR/UB/UR barcodes + CY/UY quality strings."""
    cells = [_rand_seq(16) for _ in range(8)]
    out = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"]
    for i in range(n):
        rl = 90
        cb = cells[int(RNG.integers(0, len(cells)))]
        cr = cb if i % 9 else cb[:15] + b"G"   # a few correction mismatches
        ub = _rand_seq(10)
        ur = ub if i % 7 else ub[:9] + b"C"
        aux = b"CB:Z:%s-1\tCR:Z:%s\tCY:Z:%s\tUB:Z:%s\tUR:Z:%s\tUY:Z:%s" % (
            cb, cr, b"F" * 16, ub, ur, b":" * 10)
        out.append(b"r%d\t0\tchr1\t%d\t60\t%dM\t*\t0\t0\t%s\t%s\t%s\n" % (
            i, 500 + i, rl, _rand_seq(rl), b"F" * rl, aux))
    return b"".join(out)


def make_bismark_sam(n=300):
    """Bismark-style: XM methylation string (len == SEQ), XR/XG tiny dicts."""
    out = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"]
    xm_alpha = np.frombuffer(b".....xXhHzZ", np.uint8)
    for i in range(n):
        rl = 80
        xm = RNG.choice(xm_alpha, rl).tobytes()
        aux = b"XM:Z:%s\tXR:Z:%s\tXG:Z:%s\tNM:i:%d" % (
            xm, b"CT" if i % 2 else b"GA", b"CT", int(RNG.integers(0, 3)))
        out.append(b"r%d\t0\tchr1\t%d\t60\t%dM\t*\t0\t0\t%s\t%s\t%s\n" % (
            i, 500 + i, rl, _rand_seq(rl), b"F" * rl, aux))
    return b"".join(out)


def _roundtrip(tmp_path, payload, name):
    src = tmp_path / (name + ".sam")
    src.write_bytes(payload)
    z = tmp_path / (name + ".gxz")
    out = tmp_path / (name + ".out.sam")
    zip_file(str(src), str(z))
    piz_file(str(z), str(out))
    assert out.read_bytes() == payload
    return os.path.getsize(z)


def test_bwa_tags_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_bwa_sam(), "bwa")


def test_10x_tags_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_10x_sam(), "tenx")


def test_bismark_tags_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_bismark_sam(), "bismark")


def test_score_family_compresses_better(tmp_path):
    """AS-vs-seqlen + XS-vs-AS deltas must beat the raw int path on
    score-shaped data (regression guard for the predictor wiring)."""
    payload = make_bwa_sam(2000)
    sz = _roundtrip(tmp_path, payload, "bwa_big")
    import gzip
    assert sz < len(gzip.compress(payload, 6))


def test_xa_structured_contexts_present(tmp_path):
    """The XA:Z path must take the structured route, not the tokenizer."""
    from genozip_tpu.datatypes.sam import SamDT
    from genozip_tpu.utils import ragged
    payload = make_bwa_sam(200)
    body = b"".join(ln for ln in payload.splitlines(keepends=True)
                    if not ln.startswith(b"@"))
    dt = SamDT()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "AXXAZF" in res.ctxs and "AXXAZO" in res.ctxs
    assert "AXASiX" not in res.ctxs


def make_ultima_ont_sam(n=400):
    """Ultima/ONT-style: tp:B:c arrays (len == SEQ), ML:B:C mod probs,
    PacBio rq:f/ec:f floats (incl. leading-zero fractions), np:i."""
    out = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"]
    for i in range(n):
        rl = 60
        tp = b",".join(b"%d" % v for v in RNG.integers(-1, 2, rl))
        ml = b",".join(b"%d" % v for v in RNG.integers(0, 256, 5))
        rq = b"0.%04d" % RNG.integers(0, 9999)     # 0.0xxx kept exactly
        ec = b"%d.%02d" % (RNG.integers(1, 60), RNG.integers(0, 99))
        aux = b"tp:B:c,%s\tML:B:C,%s\trq:f:%s\tec:f:%s\tnp:i:%d" % (
            tp, ml, rq, ec, int(RNG.integers(1, 30)))
        if i % 41 == 5:
            aux += b"\tzz:B:c,not,ints"   # malformed array -> exception path
        if i % 43 == 7:
            aux += b"\tzf:f:1e-3"         # exponent form -> exception path
        out.append(b"r%d\t0\tchr1\t%d\t60\t%dM\t*\t0\t0\t%s\t%s\t%s\n" % (
            i, 500 + i, rl, _rand_seq(rl), b"F" * rl, aux))
    return b"".join(out)


def make_bowtie2_sam(n=600):
    """bowtie2-style: AS <= 0 (NOT read-length-shaped), XS <= AS,
    YS = mate's AS; proper pair flags with mates adjacent."""
    out = [b"@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"]
    for i in range(0, n, 2):
        rl = 100
        as1 = -int(RNG.integers(0, 30))
        as2 = -int(RNG.integers(0, 30))
        p1 = 1000 + i * 29
        p2 = p1 + 180
        for j, (p, pn, fl, asv, ysv) in enumerate(
                [(p1, p2, 99, as1, as2), (p2, p1, 147, as2, as1)]):
            aux = b"AS:i:%d\tXS:i:%d\tYS:i:%d" % (
                asv, asv - int(RNG.integers(0, 10)), ysv)
            out.append(
                b"p%d\t%d\tchr1\t%d\t42\t%dM\t=\t%d\t%d\t%s\t%s\t%s\n" % (
                    i, fl, p, rl, pn, 280 if j == 0 else -280,
                    _rand_seq(rl), b"F" * rl, aux))
    return b"".join(out)


def test_ultima_ont_pacbio_tags_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_ultima_ont_sam(), "ultima_ont")


def test_bowtie2_tags_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_bowtie2_sam(), "bowtie2")


def test_barray_float_structured_contexts(tmp_path):
    """B-array and float tags must take the structured routes."""
    from genozip_tpu.datatypes.sam import SamDT
    payload = make_ultima_ont_sam(200)
    body = b"".join(ln for ln in payload.splitlines(keepends=True)
                    if not ln.startswith(b"@"))
    dt = SamDT()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert "AXtpBV" in res.ctxs and "AXtpBN" in res.ctxs   # array stream
    assert "AXrqfI" in res.ctxs and "AXrqfL" in res.ctxs   # float streams


def test_barray_beats_tokenizer(tmp_path):
    """Per-VB array/float streams must beat the tokenizer on
    Ultima/ONT/PacBio-shaped tags (the per-platform fixture pattern;
    ~10% whole-file == a much larger per-tag win, diluted by the
    incompressible random SEQ/QUAL in the fixture)."""
    import genozip_tpu.datatypes.sam_tags as st
    payload = make_ultima_ont_sam(1500)
    sz = _roundtrip(tmp_path, payload, "ult_big")
    orig_b, orig_f = st.barr_seg, st.float_seg
    st.barr_seg = lambda name, vals: None
    st.float_seg = lambda name, vals: None
    try:
        sz_tok = _roundtrip(tmp_path, payload, "ult_tok")
    finally:
        st.barr_seg, st.float_seg = orig_b, orig_f
    assert sz < sz_tok * 0.92


def test_bowtie2_as_model_not_seqlen(tmp_path):
    """bowtie2-shaped AS (near 0) must pick the plain model, and YS must
    ride the mate-AS delta."""
    from genozip_tpu.datatypes.sam import SamDT
    from genozip_tpu.datatypes import sam_tags
    payload = make_bowtie2_sam(400)
    body = b"".join(ln for ln in payload.splitlines(keepends=True)
                    if not ln.startswith(b"@"))
    dt = SamDT()
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    assert res.ctxs["AXASi"].param == 0
    assert res.ctxs["AXYSi"].param == sam_tags.PARAM_VS_MATE_AS
    assert np.abs(res.ctxs["AXYSi"].local).max() == 0   # exact mate copy
