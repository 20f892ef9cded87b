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
