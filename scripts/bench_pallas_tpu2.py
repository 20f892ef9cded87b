"""TPU benchmark round 2: decode v3 (lane-vector) + encode kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(label, fn, data, n):
    try:
        t0 = time.time()
        out = fn()
        compile_s = time.time() - t0
        if data is not None:
            assert out == data, f"MISMATCH {label}"
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn()
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"{label}: {n / 1e6 / best:.1f} MB/s (best {best * 1e3:.0f} ms,"
              f" compile {compile_s:.0f}s)", flush=True)
    except Exception as ex:
        print(f"{label}: FAILED {ex!r}", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas

    rng = np.random.default_rng(7)
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()

    for N in (1024, 4096):
        e = rans_np.encode(data, order=0, n_lanes=N)
        for S in (8, 32):
            run(f"dec-v3 N={N} S={S}",
                lambda e=e, S=S: rans_pallas.decode(e, S=S), data, n)
    for N in (1024,):
        ref = rans_np.encode(data, order=0, n_lanes=N)
        for S in (4, 16):
            run(f"enc N={N} S={S}",
                lambda N=N, S=S: rans_pallas.encode(data, n_lanes=N, S=S),
                ref, n)


if __name__ == "__main__":
    main()
