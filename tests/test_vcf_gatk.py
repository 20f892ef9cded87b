"""GATK cross-tag FORMAT predictions (reference src/vcf_gatk.c:915):
DP predicted as sum(AD), GQ as 2nd-lowest-PL minus lowest capped at 99."""

import numpy as np

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file
from genozip_tpu.datatypes.vcf import VcfDT
from genozip_tpu.utils.ragged import Col

RNG = np.random.default_rng(55)


def synth_gatk_vcf(n=1200, samples=3):
    hdr = (b"##fileformat=VCFv4.2\n"
           b"##contig=<ID=chr1,length=248956422>\n"
           b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT" +
           b"".join(b"\tS%d" % i for i in range(samples)) + b"\n")
    rows = []
    pos = 10000
    for i in range(n):
        pos += int(RNG.integers(50, 400))
        cells = []
        for s in range(samples):
            ref_d = int(RNG.integers(0, 40))
            alt_d = int(RNG.integers(0, 40))
            dp = ref_d + alt_d
            if i % 97 == 13 and s == 0:
                dp += 2  # GATK sometimes reports DP > sum(AD): must miss OK
            gt = (b"0/0", b"0/1", b"1/1")[int(RNG.integers(0, 3))]
            pl = sorted([0, int(RNG.integers(1, 120)),
                         int(RNG.integers(1, 1200))])
            if gt == b"0/0":
                pls = [pl[0], pl[1], pl[2]]
            elif gt == b"0/1":
                pls = [pl[1], pl[0], pl[2]]
            else:
                pls = [pl[2], pl[1], pl[0]]
            gq = min(99, pl[1] - pl[0])
            if i % 113 == 7 and s == 1:
                gq = max(0, gq - 3)  # occasional off-prediction GQ
            cells.append(b"%s:%d,%d:%d:%d:%s" % (
                gt, ref_d, alt_d, dp, gq,
                b",".join(b"%d" % p for p in pls)))
        rows.append(b"chr1\t%d\t.\tG\tA\t%d\tPASS\tDP=%d\t"
                    b"GT:AD:DP:GQ:PL\t%s\n" % (
                        pos, int(RNG.integers(20, 2000)),
                        int(RNG.integers(30, 300)), b"\t".join(cells)))
    return hdr + b"".join(rows)


def test_gatk_roundtrip(tmp_path):
    payload = synth_gatk_vcf()
    src = tmp_path / "g.vcf"
    src.write_bytes(payload)
    z = tmp_path / "g.gxz"
    out = tmp_path / "g.out.vcf"
    zip_file(str(src), str(z))
    piz_file(str(z), str(out))
    assert out.read_bytes() == payload


def test_dp_gq_predictions_engage():
    payload = synth_gatk_vcf(400)
    body = b"".join(ln for ln in payload.splitlines(keepends=True)
                    if not ln.startswith(b"#"))
    dt = VcfDT()
    dt.nf = 12
    res = dt.seg_vb(np.frombuffer(body, np.uint8))
    # FORMAT = GT:AD:DP:GQ:PL -> DP is FS2 (param 8), GQ is FS3 (param 9)
    assert res.ctxs["FS2"].param == 8
    assert res.ctxs["FS3"].param == 9
    # deltas are almost entirely zero -> the predictor is really predicting
    assert (res.ctxs["FS2"].local == 0).mean() > 0.9
    assert (res.ctxs["FS3"].local == 0).mean() > 0.9


def test_comma_helpers():
    c = Col.from_list([b"3,4", b"10", b"1,2,3", b".", b"", b"5,x"])
    sums, ok = VcfDT._ad_sums(c)
    assert list(ok) == [True, True, True, False, False, False]
    assert sums[0] == 7 and sums[1] == 10 and sums[2] == 6
    pred, ok2 = VcfDT._pl_gq(Col.from_list([b"40,0,10", b"7", b"0,150,99"]))
    assert list(ok2) == [True, False, True]
    assert pred[0] == 10 and pred[2] == 99
