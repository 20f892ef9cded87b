#!/usr/bin/env python
"""Benchmark driver hook: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures end-to-end FASTQ compression MB/s (the reference's headline workload)
on the available device. vs_baseline compares against the reference genozip
binary measured on this same machine & input (cached in BENCH_BASELINE.json);
falls back to a gzip -6 proxy measurement if the reference isn't available.
"""

import json
import os
import sys
import time

BENCH_FASTQ = "/tmp/gxz_bench.fastq"
BENCH_MB = int(os.environ.get("GXZ_BENCH_MB", "64"))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def gen_fastq(path: str, target_mb: int):
    import numpy as np
    rng = np.random.default_rng(2024)
    target = target_mb << 20
    chunks = []
    size = 0
    i = 0
    qsyms = np.frombuffer(b"FFFFFFFF:FFF,F:#", np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    while size < target:
        n = 20000
        rl = 150
        seqs = rng.choice(bases, (n, rl))
        quals = rng.choice(qsyms, (n, rl))
        descs = [b"@SIM:1:FC706VJ:1:2104:%d:%d 1:N:0:ATCACG\n"
                 % (15000 + i * n + j, 1000 + ((i * n + j) * 7) % 90000)
                 for j in range(n)]
        body = b"".join(
            d + s.tobytes() + b"\n+\n" + q.tobytes() + b"\n"
            for d, s, q in zip(descs, seqs, quals))
        chunks.append(body)
        size += len(body)
        i += 1
    with open(path, "wb") as f:
        for c in chunks:
            f.write(c)
    return size


def main():
    if not os.path.exists(BENCH_FASTQ) or os.path.getsize(BENCH_FASTQ) < (BENCH_MB << 20):
        gen_fastq(BENCH_FASTQ, BENCH_MB)
    txt_len = os.path.getsize(BENCH_FASTQ)

    from genozip_tpu import codecs
    if os.environ.get("GXZ_DEVICE_RANS") == "1":
        # TPU rANS path: correct but currently slower than the native host
        # coder through the axon relay; opt-in until the Pallas kernel lands
        codecs.enable_device_rans(256 * 1024)
    from genozip_tpu.zip_pipeline import zip_file

    z = BENCH_FASTQ + ".gxz"
    # warmup run (compile cache) on a slice
    warm = "/tmp/gxz_bench_warm.fastq"
    if not os.path.exists(warm):
        with open(BENCH_FASTQ, "rb") as f:
            head = f.read(18 << 20)
        cut = head.rfind(b"\n@")  # align to record start (desc after newline)
        with open(warm, "wb") as f:
            f.write(head[:cut + 1])
    zip_file(warm, warm + ".gxz", vb_size=16 << 20)

    best = None
    for _ in range(3):  # best-of-3: the 2-core host is very noisy
        t0 = time.time()
        stats = zip_file(BENCH_FASTQ, z, vb_size=16 << 20)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    mbps = txt_len / 1e6 / best
    ratio = txt_len / os.path.getsize(z)

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
        # gzip -6 proxy baseline
        import zlib as _z
        data = open(BENCH_FASTQ, "rb").read(16 << 20)
        t0 = time.time()
        _z.compress(data, 6)
        baseline_mbps = len(data) / 1e6 / (time.time() - t0)
        source = "gzip6-proxy"

    out = {
        "metric": "fastq_zip_MBps",
        "value": round(mbps, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline_mbps, 3),
        "ratio": round(ratio, 2),
        "baseline_source": source,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
