"""TPU benchmark: Pallas rANS decode v1 vs v2 at several (N, S).
Run: python scripts/bench_pallas_tpu.py  (needs the axon TPU; single process!)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas

    rng = np.random.default_rng(7)
    MB = 1 << 20
    n = 8 * MB
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()

    results = []
    for logN in (8, 10, 13):
        N = 1 << logN
        e = rans_np.encode(data, order=0, n_lanes=N)
        # v1 baseline only for the small config (it's slow)
        cfgs = [("v2", s) for s in ((4, 16, 64) if N <= 1024 else (4, 16))]
        if logN == 8:
            cfgs = [("v1", 0)] + cfgs
        for kind, S in cfgs:
            try:
                t0 = time.time()
                out = rans_pallas.decode(e, v1=(kind == "v1"), S=S)
                compile_s = time.time() - t0
                assert out == data, f"MISMATCH {kind} N={N} S={S}"
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    out = rans_pallas.decode(e, v1=(kind == "v1"), S=S)
                    ts.append(time.time() - t0)
                best = min(ts)
                mbps = n / 1e6 / best
                line = (f"{kind} N={N} S={S}: {mbps:.1f} MB/s "
                        f"(best {best * 1e3:.0f} ms, compile {compile_s:.0f}s, "
                        f"runs {['%.0f' % (t * 1e3) for t in ts]})")
                print(line, flush=True)
                results.append(line)
            except Exception as ex:
                print(f"{kind} N={N} S={S}: FAILED {ex!r}", flush=True)

    print("== SUMMARY ==")
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
