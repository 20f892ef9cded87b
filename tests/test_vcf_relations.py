"""Round-trip tests for the VCF INFO/ID relation predictions and the
comma-int-list FORMAT column decomposition (reference src/vcf_info.c
AC/AN/AF + END relations, src/vcf_gatk.c INFO DP <- sum(FORMAT DP),
src/vcf_seg.c dbSNP-style IDs, src/vcf_samples.c AD model)."""

import os

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file


def _roundtrip(tmp_path, text: bytes, name="t.vcf"):
    p = os.path.join(tmp_path, name)
    with open(p, "wb") as f:
        f.write(text)
    z = p + ".gxz"
    zip_file(p, z)
    out = p + ".out"
    piz_file(z, out)
    assert open(out, "rb").read() == text
    return z


HDR = (b"##fileformat=VCFv4.2\n"
       b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n")


def test_id_pos_prediction(tmp_path):
    rows = [HDR]
    for i in range(60):
        pos = 1000 + i * 7
        ident = b"rs%d" % pos if i % 5 else b"custom_%d" % i  # 80% match
        rows.append(b"chr1\t%d\t%s\tA\tG\t50\tPASS\tX=1\tGT\t0/1\t0/0\t1/1\n"
                    % (pos, ident))
    _roundtrip(str(tmp_path), b"".join(rows))


def test_info_end_delta(tmp_path):
    rows = [HDR]
    for i in range(40):
        pos = 500 + i * 11
        rows.append(b"chr1\t%d\t.\tA\t<DEL>\t50\tPASS\tEND=%d;SVTYPE=DEL\t"
                    b"GT\t0/1\t0/0\t1/1\n" % (pos, pos + 100 + i))
    _roundtrip(str(tmp_path), b"".join(rows))


def test_info_ac_an_af(tmp_path):
    rng = np.random.default_rng(5)
    rows = [HDR]
    for i in range(50):
        an = 6
        ac = int(rng.integers(0, 7))
        af = ac / an
        # last few rows: AC deviating from round(AN*AF) (prediction must
        # miss without corrupting), plus a '.' AF
        if i > 45:
            rows.append(b"chr1\t%d\t.\tA\tG\t9\tPASS\tAC=%d;AN=%d;AF=.\t"
                        b"GT\t0/1\t0/0\t1/1\n" % (100 + i * 3, ac, an))
        else:
            rows.append(b"chr1\t%d\t.\tA\tG\t9\tPASS\tAC=%d;AN=%d;AF=%.4f\t"
                        b"GT\t0/1\t0/0\t1/1\n" % (100 + i * 3, ac, an, af))
    _roundtrip(str(tmp_path), b"".join(rows))


def test_info_dp_from_format_dp(tmp_path):
    rng = np.random.default_rng(6)
    rows = [HDR]
    for i in range(50):
        dps = rng.integers(5, 40, 3)
        info_dp = int(dps.sum()) if i % 7 else int(dps.sum()) + 3  # some miss
        cells = b"\t".join(b"0/1:%d" % d for d in dps)
        rows.append(b"chr1\t%d\t.\tA\tG\t9\tPASS\tDP=%d\tGT:DP\t%s\n"
                    % (100 + i * 3, info_dp, cells))
    _roundtrip(str(tmp_path), b"".join(rows))


def test_ad_int_list_decomposition(tmp_path):
    rng = np.random.default_rng(7)
    rows = [HDR]
    for i in range(400):
        cells = []
        for s in range(3):
            d = int(rng.poisson(30))
            g = int(rng.integers(0, 3))
            aa = {0: 0, 1: d // 2, 2: d}[g]
            gt = [b"0/0", b"0/1", b"1/1"][g]
            cells.append(b"%s:%d,%d:%d" % (gt, d - aa, aa, d))
        rows.append(b"chr1\t%d\t.\tA\tG\t9\tPASS\tX=1\tGT:AD:DP\t%s\n"
                    % (100 + i * 3, b"\t".join(cells)))
    # malformed AD cells must ride the exception stream
    rows.append(b"chr1\t5000\t.\tA\tG\t9\tPASS\tX=1\tGT:AD:DP\t"
                b"0/1:.,.:7\t./.:.:0\t0/1:1,2,3:6\n")
    z = _roundtrip(str(tmp_path), b"".join(rows))
    # the decomposition must actually engage (LS context present)
    from genozip_tpu.piz_pipeline import PizReader
    pr = PizReader(z)
    pr.read_vb(1)
    assert any(k.endswith("LS") for k in pr._last_pctxs), \
        "int-list decomposition did not engage"


def test_ad_negative_and_ragged_lists(tmp_path):
    rows = [HDR]
    for i in range(30):
        # lists of varying length and sign: decomposition must either fit
        # (dominant R with exceptions) or fall back — always byte-exact
        cells = [b"0/1:%d,%d:9" % (i - 15, 2 * i), b"0/0:3:9",
                 b"1/1:1,2:9"]
        rows.append(b"chr1\t%d\t.\tA\tG\t9\tPASS\tX=1\tGT:AD:DP\t%s\n"
                    % (100 + i * 3, b"\t".join(cells)))
    _roundtrip(str(tmp_path), b"".join(rows))
