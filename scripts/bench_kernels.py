#!/usr/bin/env python
"""One parameterized TPU kernel harness (replaces the bench_pallas_tpu*.py
one-off series): benchmarks the v6 stacked-stream rANS kernels in all four
modes with bit-exactness verification against the numpy spec.

    python scripts/bench_kernels.py --op enc1 --mb 4 --r 16
    python scripts/bench_kernels.py --all            # the full table

Run on the axon TPU (ONE TPU-touching process at a time!) or on CPU via
JAX_PLATFORMS=cpu for a smoke test. Reports per op:
  - e2e MB/s      : full *_many_*_v6 call (host framing + transfers + kernel)
  - device MB/s   : the device section only (transfers + kernel,
                    rans_pallas.perf instrumentation)
Prints one JSON line per configuration.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def payloads(rng, kind, per, r):
    if kind == "qual":
        alpha = np.frombuffer(b"FFFFF:F,#AB!x", np.uint8)
        return [rng.choice(alpha, per).astype(np.uint8).tobytes()
                for _ in range(r)]
    return [rng.integers(0, 256, per).astype(np.uint8).tobytes()
            for _ in range(r)]


def run_op(op, mb, r, n, s, verify=True):
    import jax
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(7)
    per = int(mb * (1 << 20))
    datas = payloads(rng, "qual", per, r)
    tot = sum(len(d) for d in datas)
    order = 1 if op.endswith("1") else 0

    if op.startswith("enc"):
        fn = rans_pallas.encode_many_o1_v6 if order else \
            rans_pallas.encode_many_v6

        def call():
            return fn(datas, n_lanes=n, S=s, R=r)
        outs = call()
        assert outs is not None, "palette overflow — alphabet > 128"
        if verify:
            ref = rans_np.encode(datas[0], order=order, n_lanes=n)
            assert outs[0] == ref, "NOT bit-exact vs rans_np"
    else:
        blobs = [rans_np.encode(d, order=order, n_lanes=n) for d in datas]
        fn = rans_pallas.decode_many_o1_v6 if order else \
            rans_pallas.decode_many_v6

        def call():
            return fn(blobs, S=s, R=r)
        outs = call()
        assert outs is not None, "palette overflow — alphabet > 128"
        if verify:
            assert bytes(outs[0][:per]) == datas[0], "decode mismatch"

    best_e2e, best_dev = 1e9, 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        best_e2e = min(best_e2e, time.perf_counter() - t0)
        best_dev = min(best_dev, rans_pallas.perf["device_s"])
    # kernel-only: re-invoke the jitted device fn with the SAME arrays,
    # already resident (the axon relay h2d is ~20 MB/s and dominates
    # device_s otherwise; production batches amortize transfers across a
    # dp-batch, so the resident number is the kernel roofline figure)
    rans_pallas.perf["capture"] = True
    call()
    rans_pallas.perf.pop("capture")
    best_res = 1e9
    dev_fn, dargs, statics = rans_pallas.perf.pop("resident")
    import jax
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(dev_fn(*dargs, *statics))
        best_res = min(best_res, time.perf_counter() - t0)
    rec = {"op": op, "platform": jax.devices()[0].platform,
           "N": n, "S": s, "R": r, "MB": round(tot / 1e6, 1),
           "e2e_MBps": round(tot / 1e6 / best_e2e, 1),
           "device_MBps": round(tot / 1e6 / best_dev, 1),
           "kernel_MBps": round(tot / 1e6 / best_res, 1),
           "bit_exact": bool(verify)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=["enc0", "enc1", "dec0", "dec1"],
                    default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--mb", type=float, default=4.0,
                    help="MB per stream")
    ap.add_argument("--r", type=int, default=16, help="streams per launch")
    ap.add_argument("--n", type=int, default=1024, help="rANS lanes")
    ap.add_argument("--s", type=int, default=8, help="grid step rows")
    args = ap.parse_args()
    ops = ["dec0", "dec1", "enc0", "enc1"] if args.all or not args.op \
        else [args.op]
    for op in ops:
        run_op(op, args.mb, args.r, args.n, args.s)


if __name__ == "__main__":
    main()
