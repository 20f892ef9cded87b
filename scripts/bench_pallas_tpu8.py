"""TPU benchmark: Pallas rANS order-0 decode v3 vs v4 (two-level lookup).
Run: python scripts/bench_pallas_tpu8.py  (needs the axon TPU; single process!)
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
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()

    results = []
    for logN in (10, 12, 13):
        N = 1 << logN
        e = rans_np.encode(data, order=0, n_lanes=N)
        LR = N // 128
        for kind in ("v3", "v4"):
            for S in (8, 16):
                try:
                    t0 = time.time()
                    out = rans_pallas.decode(e, S=S, v4=(kind == "v4"))
                    compile_s = time.time() - t0
                    assert out == data, f"MISMATCH {kind} N={N} S={S}"
                    ts = []
                    for _ in range(3):
                        t0 = time.time()
                        rans_pallas.decode(e, S=S, v4=(kind == "v4"))
                        ts.append(time.time() - t0)
                    best = min(ts)
                    line = (f"{kind} N={N} S={S}: {n / 1e6 / best:.1f} MB/s "
                            f"(best {best * 1e3:.0f} ms, compile "
                            f"{compile_s:.0f}s)")
                    print(line, flush=True)
                    results.append(line)
                except Exception as ex:
                    print(f"{kind} N={N} S={S}: FAILED {ex!r}", flush=True)

    print("== SUMMARY ==")
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
