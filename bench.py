#!/usr/bin/env python
"""Benchmark driver hook: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}.

Primary metric: end-to-end FASTQ compression MB/s (the reference's headline
workload) on a REALISTIC corpus — reads sampled from a genome with an error
model, position+context-correlated binned QUAL, Illumina-format QNAMEs.
Extras: BAM and VCF MB/s + ratio, and ratio-vs-proxy baselines (gzip -6
speed proxy; gzip/xz ratio proxies) since the reference binary cannot run
unlicensed in this image (README has the full story).
"""

import json
import os
import sys
import time

BDIR = "/tmp/gxz_bench2"
BENCH_MB = int(os.environ.get("GXZ_BENCH_MB", "48"))
BAM_MB = int(os.environ.get("GXZ_BENCH_BAM_MB", "24"))
VCF_MB = int(os.environ.get("GXZ_BENCH_VCF_MB", "24"))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def _genome(rng, n=4 << 20):
    import numpy as np
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(bases, n)
    # sprinkle homopolymer runs (real genomes are not iid)
    for _ in range(n // 2000):
        p = int(rng.integers(0, n - 40))
        g[p:p + int(rng.integers(5, 30))] = g[p]
    return g


def _qual_rows(rng, n, rl):
    """Illumina-RTA3-style binned quality with a positional ramp."""
    import numpy as np
    pos = np.arange(rl)
    base = 36.0 - 8.0 * (pos / rl) ** 2 - 2.0 * (pos < 3)
    q = base[None, :] + rng.normal(0, 3.0, (n, rl))
    bins = np.array([2, 12, 23, 37])
    idx = np.abs(q[:, :, None] - bins[None, None, :]).argmin(axis=2)
    return (bins[idx] + 33).astype(np.uint8)


def gen_fastq(path, target_mb, rng, genome):
    import numpy as np
    target = target_mb << 20
    size = 0
    i = 0
    rl = 150
    G = genome.shape[0]
    from genozip_tpu.ops import pack as packops
    with open(path, "wb") as f:
        while size < target:
            n = 20000
            starts = rng.integers(0, G - rl, n)
            mat = genome[starts[:, None] + np.arange(rl)[None, :]].copy()
            nerr = rng.binomial(n * rl, 0.003)
            er, ec = rng.integers(0, n, nerr), rng.integers(0, rl, nerr)
            mat[er, ec] = np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, nerr)]
            rev = rng.random(n) < 0.5
            rc = packops.BASE2BIT[mat] ^ 3
            mat[rev] = packops.ACGT[rc[rev][:, ::-1]]
            quals = _qual_rows(rng, n, rl)
            body = b"".join(
                b"@SIM:1:FC706VJ:1:%d:%d:%d 1:N:0:ATCACG\n%s\n+\n%s\n"
                % (2100 + (i * n + j) // 100000, 15000 + (i * n + j) % 90000,
                   1000 + ((i * n + j) * 7) % 90000,
                   mat[j].tobytes(), quals[j].tobytes())
                for j in range(n))
            f.write(body)
            size += len(body)
            i += 1
    return size


def gen_bam(path, target_mb, rng, genome):
    """Coordinate-sorted BAM with NM/AS tags via the SAM->BAM translator.
    Multiple chromosomes (same underlying genome), each a sorted sweep at
    ~7x coverage, until the on-disk (BGZF) file reaches target_mb."""
    import numpy as np
    from genozip_tpu.translate import sam_header_to_bam, sam_vb_to_bam
    from genozip_tpu.utils.bgzf import BgzfWriter
    G = genome.shape[0]
    rl = 150
    n_chrom = max(1, target_mb * (1 << 20) // (G * 5 // 4) + 1)
    hdr = b"@HD\tVN:1.6\tSO:coordinate\n" + b"".join(
        b"@SQ\tSN:chr%d\tLN:%d\n" % (c + 1, G) for c in range(n_chrom))
    bam_hdr, name2id = sam_header_to_bam(hdr)
    f = open(path, "wb")
    w = BgzfWriter(f)
    w.write(bam_hdr)
    target = target_mb << 20
    rid = 0
    for c in range(n_chrom):
        if f.tell() >= target:
            break
        chrom = b"chr%d" % (c + 1)
        pos = 1
        while pos < G - 2 * rl and f.tell() < target:
            n = 60000
            hi = min(pos + 2_000_000, G - rl)
            poss = np.sort(rng.integers(pos, hi, n))
            seqs = genome[poss[:, None] + np.arange(rl)[None, :]].copy()
            nerr = rng.binomial(rl, 0.003, n)
            quals = _qual_rows(rng, n, rl)
            rows = []
            for j in range(n):
                p = int(poss[j])
                seq = seqs[j]
                ne = int(nerr[j])
                if ne:
                    mp = rng.integers(0, rl, ne)
                    seq[mp] = np.frombuffer(b"ACGT", np.uint8)[
                        rng.integers(0, 4, ne)]
                fl = 99 if j % 2 == 0 else 147
                rows.append(
                    b"b%d\t%d\t%s\t%d\t60\t%dM\t=\t%d\t%d\t%s\t%s\t"
                    b"NM:i:%d\tAS:i:%d\n"
                    % (rid + j, fl, chrom, p + 1, rl, p + 200,
                       350 if fl == 99 else -350, seq.tobytes(),
                       quals[j].tobytes(), ne, rl - 2 * ne))
            rid += n
            blob, lens, *_ = sam_vb_to_bam(b"".join(rows), name2id)
            w.write(blob)
            pos = hi
    w.close()
    return os.path.getsize(path)


def gen_vcf(path, target_mb, rng):
    import numpy as np
    nsamp = 500
    names = "\t".join(f"S{i:04d}" for i in range(nsamp))
    hdr = ("##fileformat=VCFv4.2\n##contig=<ID=chr1,length=100000000>\n"
           "##FORMAT=<ID=GT,Number=1,Type=String>\n"
           "##FORMAT=<ID=DP,Number=1,Type=Integer>\n"
           "##INFO=<ID=AF,Number=A,Type=Float>\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
           + names + "\n").encode()
    target = target_mb << 20
    size = len(hdr)
    pos = 10000
    gts = [b"0/0", b"0/1", b"1/1", b"./."]
    with open(path, "wb") as f:
        f.write(hdr)
        while size < target:
            n = 400
            rows = []
            for _ in range(n):
                pos += int(rng.integers(50, 3000))
                af = rng.random() * 0.5
                probs = [(1 - af) ** 2, 2 * af * (1 - af), af ** 2, 0.002]
                probs = np.array(probs) / sum(probs)
                g = rng.choice(4, nsamp, p=probs)
                dp = rng.poisson(30, nsamp)
                samples = b"\t".join(b"%s:%d" % (gts[gi], d)
                                     for gi, d in zip(g, dp))
                ref, alt = rng.choice(list(b"ACGT"), 2, replace=False)
                rows.append(b"chr1\t%d\trs%d\t%c\t%c\t%d\tPASS\tAF=%.4f\t"
                            b"GT:DP\t%s\n"
                            % (pos, pos, ref, alt, 30 + pos % 60, af, samples))
            body = b"".join(rows)
            f.write(body)
            size += len(body)
    return size


def bench_one(path, runs=1, **zip_kw):
    from genozip_tpu.zip_pipeline import zip_file
    z = path + ".gxz"
    best = None
    for _ in range(runs):
        t0 = time.time()
        zip_file(path, z, **zip_kw)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    txt = os.path.getsize(path)
    return txt / 1e6 / best, txt / os.path.getsize(z)


def proxy_ratios(path):
    import zlib
    import lzma
    data = open(path, "rb").read(24 << 20)
    gz = len(zlib.compress(data, 6))
    xz = len(lzma.compress(data, preset=6))
    return len(data) / gz, len(data) / xz


def main():
    import numpy as np
    os.makedirs(BDIR, exist_ok=True)
    rng = np.random.default_rng(2024)
    genome = _genome(rng)

    fq = os.path.join(BDIR, "bench.fastq")
    if not os.path.exists(fq):
        gen_fastq(fq, BENCH_MB, rng, genome)
    bam = os.path.join(BDIR, "bench.bam")
    if not os.path.exists(bam):
        # BAM gets its own larger genome so coverage stays realistic (~7x)
        rng7 = np.random.default_rng(7)
        gen_bam(bam, BAM_MB, rng7, _genome(rng7, 32 << 20))
    vcf = os.path.join(BDIR, "bench.vcf")
    if not os.path.exists(vcf):
        gen_vcf(vcf, VCF_MB, np.random.default_rng(9))

    from genozip_tpu import codecs
    if os.environ.get("GXZ_DEVICE_RANS") == "1":
        codecs.enable_device_rans(256 * 1024)

    # warmup (compile/alloc caches) on a slice
    from genozip_tpu.zip_pipeline import zip_file
    warm = os.path.join(BDIR, "warm.fastq")
    if not os.path.exists(warm):
        with open(fq, "rb") as f:
            head = f.read(8 << 20)
        cut = head.rfind(b"\n@")
        open(warm, "wb").write(head[:cut + 1])
    zip_file(warm, warm + ".gxz", vb_size=16 << 20)

    fq_mbps, fq_ratio = bench_one(fq, runs=3, vb_size=16 << 20)
    bam_mbps, bam_ratio = bench_one(bam, runs=1, vb_size=16 << 20)
    vcf_mbps, vcf_ratio = bench_one(vcf, runs=1, vb_size=16 << 20)

    baseline_mbps = None
    source = None
    if os.path.exists(BASELINE_FILE):
        try:
            b = json.load(open(BASELINE_FILE))
            baseline_mbps = b.get("fastq_zip_MBps")
            source = b.get("source")
        except Exception:
            pass
    if not baseline_mbps:
        import zlib as _z
        data = open(fq, "rb").read(16 << 20)
        t0 = time.time()
        _z.compress(data, 6)
        baseline_mbps = len(data) / 1e6 / (time.time() - t0)
        source = "gzip6-proxy"
    gz_r, xz_r = proxy_ratios(fq)

    out = {
        "metric": "fastq_zip_MBps",
        "value": round(fq_mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(fq_mbps / baseline_mbps, 3),
        "ratio": round(fq_ratio, 2),
        "ratio_vs_gzip6": round(fq_ratio / gz_r, 2),
        "ratio_vs_xz6": round(fq_ratio / xz_r, 2),
        "bam_MBps": round(bam_mbps, 2),
        "bam_ratio": round(bam_ratio, 2),
        "vcf_MBps": round(vcf_mbps, 2),
        "vcf_ratio": round(vcf_ratio, 2),
        "baseline_source": source,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
