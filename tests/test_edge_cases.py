"""Edge-case battery: odd-but-valid inputs must round-trip byte-exactly
(reference test.sh's basic.* fixture spirit)."""

import os

import numpy as np
import pytest

from tests.test_roundtrip import roundtrip

RNG = np.random.default_rng(31337)


CASES = {
    # FASTQ oddities
    "crlf.fastq": b"@r1 x\r\nACGT\r\n+\r\nFFFF\r\n@r2 y\r\nGGTT\r\n+\r\nF:F:\r\n",
    "plusdesc.fastq": b"@r1\nACGT\n+r1 again\nFFFF\n",
    "zero_len.fastq": b"@r1\n\n+\n\n@r2\nA\n+\nF\n",
    "qual_at.fastq": b"@r1\nACGT\n+\n@@@@\n@r2\nAAAA\n+\n++++\n",
    "huge_name.fastq": b"@" + b"x" * 5000 + b" 1:2:3\nACGT\n+\nFFFF\n",
    "nonacgt.fastq": b"@r\nNNRYKMacgt\n+\nFFFFFFFFFF\n",
    # FASTA oddities
    "empty_contig.fa": b">a\n>b\nACGT\n>c\n",
    "blank_lines.fa": b">a\nACGT\n\nGGGG\n\n",
    "no_desc.fa": b"ACGT\nGGGG\n",
    # VCF oddities
    "crlf.vcf": b"##fileformat=VCFv4.2\r\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\r\nchr1\t1\t.\tA\tG\t.\t.\t.\r\n",
    "tabs_in_info.vcf": (b"##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                        b"1\t100\trs1;rs2\tACGT\t<DEL>\t-12.5\tq10;s50\t"
                        b"AA=1,2,3;BB;CC=x%3Dy\n"),
    "gt_multiallelic.vcf": (b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
                           b"1\t5\t.\tA\tG,T\t.\t.\t.\tGT\t0/2\t.|.\n"
                           b"1\t9\t.\tA\tG\t.\t.\t.\tGT:DP\t1/1:3\t0/1\n"),
    # SAM oddities
    "min.sam": b"r1\t0\t*\t0\t0\t*\t*\t0\t0\t*\t*\n",
    "hdr_only.sam": b"@HD\tVN:1.6\n@CO\tfree text \xf0\x9f\x8e\x89 comment\n",
    "weird_qname.sam": b"a:b:c:d.e/f#g\t0\tc\t1\t0\t4M\t*\t0\t0\tACGT\tFFFF\n",
    # GFF/BED/me23
    "mid_comment.gff3": b"##gff-version 3\nchr1\tx\tgene\t1\t10\t.\t+\t.\tID=1\n# mid comment\nchr1\tx\tgene\t20\t30\t.\t-\t.\tID=2\n",
    "short.bed": b"chr1\t0\t100\nchr2\t5\t50\n",
    "dot_pos.me23": b"# header\nrs1\t1\t100\tAA\nrsX\tMT\t5\t--\n",
    # generic binary
    "all_zero.bin": b"\x00" * 10000,
    "tok_mark.bin": bytes([1, 2, 3]) * 500,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_edge_roundtrip(tmp_path, name):
    dt = None
    if name.endswith(".bin"):
        dt = "generic"
    elif name.endswith(".me23"):
        dt = "me23"
    data = CASES[name]
    roundtrip(str(tmp_path), name, data, dt_name=dt)


def test_random_printable_tabular(tmp_path):
    """Random tab-separated junk must round-trip via the exception paths."""
    rows = []
    for i in range(300):
        nf = int(RNG.integers(1, 12))
        fields = [bytes(RNG.integers(32, 127, RNG.integers(0, 20)).astype(np.uint8))
                  .replace(b"\t", b" ").replace(b"\n", b" ")
                  for _ in range(nf)]
        rows.append(b"\t".join(fields))
    data = b"\n".join(rows) + b"\n"
    roundtrip(str(tmp_path), "junk.vcf", data, dt_name="vcf")
    roundtrip(str(tmp_path), "junk.bed", data, dt_name="bed")
    roundtrip(str(tmp_path), "junk.gff3", data, dt_name="gff")


def test_long_reads_fastq(tmp_path):
    out = []
    for i in range(30):
        L = int(RNG.integers(5000, 20000))
        seq = RNG.choice(np.frombuffer(b"ACGT", np.uint8), L)
        qual = RNG.integers(33, 90, L).astype(np.uint8)
        out.append(b"@nanopore_%d ch=%d\n" % (i, i % 4) + seq.tobytes()
                   + b"\n+\n" + qual.tobytes() + b"\n")
    roundtrip(str(tmp_path), "long.fastq", b"".join(out))


def test_truncate_mid_record(tmp_path):
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    import pytest
    full = b"".join(b"@t%d\nACGTACGT\n+\nFFFFFFFF\n" % i for i in range(100))
    cut = full[:-13]  # mid-record
    src = os.path.join(str(tmp_path), "cut.fastq")
    open(src, "wb").write(cut)
    z = src + ".gxz"
    with pytest.raises(Exception):
        zip_file(src, z)
    zip_file(src, z, truncate=True)
    out = src + ".out"
    piz_file(z, out)
    got = open(out, "rb").read()
    assert got == full[: len(full) - 25]  # whole records only


def test_xxh64_vb_digest(tmp_path):
    """Per-VB XXH64 digest (reference digest.c XXH3 role): stored, verified,
    and corruption is caught."""
    import numpy as np
    from genozip_tpu import native
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file, PizReader
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    # known-answer vectors (xxhash reference)
    assert native.xxh64(b"") == 0xEF46DB3751D8E999
    assert native.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert native.xxh64(b"abc") == 0x44BC2CF5AD770999

    rng = np.random.default_rng(3)
    data = b"".join(b"@q%d\n%s\n+\n%s\n" % (
        i, rng.choice(np.frombuffer(b"ACGT", np.uint8), 80).tobytes(),
        b"F" * 80) for i in range(2000))
    src = os.path.join(str(tmp_path), "x.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z)
    pr = PizReader(z)
    assert pr.load_vb(1)[0].get("x64") is not None
    pr.close()
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data


def test_optimize_qual_binning(tmp_path):
    """--optimize (lossy QUAL binning, reference sam_modify.c): the archive
    round-trips to the BINNED file byte-exactly, compresses better than the
    unoptimized one, and the binning follows the Illumina 8-level rule."""
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from genozip_tpu.optimize import PHRED_LUT

    # rule spot-checks (Phred+33 ASCII space)
    assert PHRED_LUT[ord("!")] == ord("!")          # Phred 0 unchanged
    assert PHRED_LUT[ord("#")] == ord("#")          # Phred 2 unchanged
    assert PHRED_LUT[33 + 5] == 33 + 6              # Phred 5 -> 6
    assert PHRED_LUT[33 + 17] == 33 + 15            # Phred 17 -> 15
    assert PHRED_LUT[33 + 38] == 33 + 37            # Phred 38 -> 37
    assert PHRED_LUT[33 + 41] == 33 + 42            # Phred 41 -> 42
    assert PHRED_LUT[33 + 93] == 33 + 93            # PacBio max unchanged

    rng = np.random.default_rng(5)
    reads = []
    for i in range(3000):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 120)
        q = (rng.integers(0, 42, 120) + 33).astype(np.uint8)
        reads.append(b"@r%d\n%s\n+\n%s\n" % (i, s.tobytes(), q.tobytes()))
    data = b"".join(reads)
    src = os.path.join(str(tmp_path), "o.fastq")
    open(src, "wb").write(data)
    z_plain, z_opt = src + ".gxz", src + ".opt.gxz"
    zip_file(src, z_plain, vb_size=128 * 1024)
    zip_file(src, z_opt, vb_size=128 * 1024, optimize=True)
    # binned qual has ~8 symbols vs 42 -> clearly smaller archive
    assert os.path.getsize(z_opt) < os.path.getsize(z_plain) * 0.8
    out = src + ".out"
    piz_file(z_opt, out)
    got = open(out, "rb").read()
    exp = bytearray(data)
    a = np.frombuffer(data, np.uint8)
    nl = np.nonzero(a == ord("\n"))[0]
    starts = np.concatenate([[0], nl[:-1] + 1])
    for li in range(3, nl.shape[0], 4):
        sl = slice(int(starts[li]), int(nl[li]))
        exp[sl] = PHRED_LUT[a[sl]].tobytes()
    assert got == bytes(exp)


def test_optimize_sam_and_bam(tmp_path):
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from genozip_tpu.optimize import PHRED_LUT

    rng = np.random.default_rng(6)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:100000\n"]
    for i in range(1500):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80)
        q = (rng.integers(0, 42, 80) + 33).astype(np.uint8)
        rows.append(b"r%d\t0\tc1\t%d\t60\t80M\t*\t0\t0\t%s\t%s\tNM:i:0\n"
                    % (i, 10 + i * 3, s.tobytes(), q.tobytes()))
    rows.append(b"nq\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")  # '*' no-qual row
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "o.sam")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=128 * 1024, optimize=True)
    out = src + ".out"
    piz_file(z, out)
    got = open(out, "rb").read()
    # every qual byte must be a bin value; the '*' row untouched
    assert b"\nnq\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n" in got
    for ln in got.split(b"\n"):
        if ln and not ln.startswith(b"@"):
            f = ln.split(b"\t")
            if len(f) > 10 and f[10] != b"*":
                assert all(c == PHRED_LUT[c] for c in f[10])

    # BAM: build from the SAM via the translator, zip with optimize
    from genozip_tpu.translate import sam_header_to_bam, sam_vb_to_bam
    from genozip_tpu.utils.bgzf import open_bgzf
    hdr = b"".join(r for r in rows if r.startswith(b"@"))
    body = b"".join(r for r in rows if not r.startswith(b"@"))
    bam_hdr, name2id = sam_header_to_bam(hdr)
    blob, lens, *_ = sam_vb_to_bam(body, name2id)
    bpath = os.path.join(str(tmp_path), "o.bam")
    w = open_bgzf(bpath)
    w.write(bam_hdr)
    w.write(bytes(blob))
    w.close()
    zb = bpath + ".gxz"
    zip_file(bpath, zb, vb_size=256 * 1024, optimize=True)
    outb = bpath + ".outbam"
    piz_file(zb, outb)   # non-.bam suffix -> raw (uncompressed) BAM bytes
    raw = open(outb, "rb").read()
    import struct
    l_text = struct.unpack("<I", raw[4:8])[0]
    p = 8 + l_text
    n_ref = struct.unpack("<I", raw[p:p + 4])[0]
    p += 4
    for _ in range(n_ref):
        ln = struct.unpack("<I", raw[p:p + 4])[0]
        p += 8 + ln
    RAW = PHRED_LUT[33:127] - 33
    while p < len(raw):
        bs = struct.unpack("<I", raw[p:p + 4])[0]
        l_rn = raw[p + 12]
        n_cig = struct.unpack("<H", raw[p + 16:p + 18])[0]
        l_seq = struct.unpack("<I", raw[p + 20:p + 24])[0]
        qoff = p + 36 + l_rn + 4 * n_cig + (l_seq + 1) // 2
        qual = raw[qoff:qoff + l_seq]
        for c in qual:
            assert c == 0xFF or (c < 94 and c == RAW[c])
        p += 4 + bs


import pytest as _pytest


@_pytest.mark.parametrize("dt", ["vcf", "sam", "gff", "bed", "fastq",
                                 "fasta", "generic"])
def test_garbage_input_never_corrupts(tmp_path, dt):
    """Random bytes forced through each datatype must either round-trip
    byte-exactly (exception channels) or fail cleanly — never produce
    silently different output (the ASSSEG/exception-row culture)."""
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    rng = np.random.default_rng(hash(dt) % (2**32))
    # printable-ish garbage with newlines and tabs sprinkled in
    raw = rng.integers(32, 127, 60000).astype(np.uint8)
    raw[rng.integers(0, raw.shape[0], 1500)] = ord("\n")
    raw[rng.integers(0, raw.shape[0], 800)] = ord("\t")
    data = raw.tobytes()
    src = os.path.join(str(tmp_path), f"g.{dt}.txt")
    open(src, "wb").write(data)
    z = src + ".gxz"
    try:
        zip_file(src, z, dt_name=dt, vb_size=16 * 1024)
        piz_file(z, src + ".out")
    except Exception:
        return   # clean refusal is acceptable
    assert open(src + ".out", "rb").read() == data, \
        f"{dt}: garbage input silently corrupted"
