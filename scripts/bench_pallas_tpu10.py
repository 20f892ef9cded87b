"""TPU kernel-only benchmark: rANS order-0 decode v5 (per-step renorm
windows + two-level lookup) vs v3 baseline.
Run: python scripts/bench_pallas_tpu10.py  (axon TPU; single process!)"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def best3(fn):
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas
    from genozip_tpu.ops.rans_np import lane_layout
    from genozip_tpu.ops.rans_pallas import LANE_COLS, v4_tab

    rng = np.random.default_rng(7)
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()

    results = []
    for N in (1024, 2048, 4096):
        e = rans_np.encode(data, order=0, n_lanes=N)
        buf = memoryview(e)
        nn = int.from_bytes(buf[2:6], "little")
        off = 6
        freq, off = rans_np._freqs_deserialize(buf, off)
        cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
        tab34 = v4_tab(freq.astype(np.float32), cum.astype(np.float32))
        words = np.frombuffer(buf[off:], dtype="<u2")
        K, _ = lane_layout(nn, N)
        LR = N // LANE_COLS
        st = words[: 2 * N].astype(np.uint32)
        x0 = ((st[0::2] << 16) | st[1::2]).astype(np.int32)
        dw = words[2 * N:].astype(np.int32)
        for S in (8, 32, 64):
            wrows = (dw.shape[0] + LANE_COLS - 1) // LANE_COLS + S * LR + 24
            wrows = (wrows + 7) // 8 * 8
            wpad = np.zeros(wrows * LANE_COLS, np.int32)
            wpad[: dw.shape[0]] = dw
            wd = jax.device_put(jnp.asarray(wpad))
            x0d = jax.device_put(jnp.asarray(x0.reshape(1, N)))
            td = jax.device_put(jnp.asarray(tab34))
            try:
                fn = lambda: rans_pallas.decode_order0_device_v5(
                    wd, td, x0d, K, N, nn, S)
                t0 = time.time()
                out = fn()
                jax.block_until_ready(out)
                c = time.time() - t0
                got = np.asarray(out)[:K].T.reshape(-1)[:nn].tobytes()
                ok = "OK" if got == data else "MISMATCH!"
                t = best3(lambda: jax.block_until_ready(fn()))
                line = (f"v5 kernel N={N} S={S}: {n/1e6/t:.1f} MB/s "
                        f"{ok} (compile {c:.0f}s)")
                print(line, flush=True)
                results.append(line)
            except Exception as ex:
                print(f"v5 N={N} S={S}: FAILED {type(ex).__name__}: "
                      f"{str(ex)[:300]}", flush=True)

    print("== SUMMARY ==", flush=True)
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
