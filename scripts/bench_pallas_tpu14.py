"""TPU kernel-only benchmark: order-0 ENCODE — encode_many_v6 (stacked R
streams + _dot16) vs round-1 encode_order0_device (104 MB/s).
Run: python scripts/bench_pallas_tpu14.py  (axon TPU; single process!)"""

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
    from genozip_tpu.ops.rans_pallas import (
        LANE_COLS, _bucket_up, encode_many_device_v6)

    rng = np.random.default_rng(7)
    per = 4 << 20
    results = []
    for (N, S, R) in ((1024, 8, 8), (1024, 8, 16)):
        datas = [rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8), per)
                 .astype(np.uint8).tobytes() for _ in range(R)]
        tot = sum(len(d) for d in datas)
        LR = N // LANE_COLS
        try:
            # host framing once, then kernel-only
            tabs, metas, shapes = [], [], []
            Gmax = 1
            for d in datas:
                a = np.frombuffer(d, np.uint8)
                n = a.shape[0]
                freq = rans_np.normalize_freqs(np.bincount(a, minlength=256))
                cum = np.concatenate([[0], np.cumsum(freq)[:-1]]) \
                    .astype(np.uint32)
                t8 = np.zeros((8, 256), np.float32)
                t8[0] = freq.astype(np.float32)
                t8[1] = cum.astype(np.float32)
                tabs.append(t8)
                K, _ = rans_np.lane_layout(n, N)
                Gmax = max(Gmax, (K + S - 1) // S)
                metas.append((n, K))
                shapes.append((n, K))
            G = _bucket_up(Gmax)
            syms = np.zeros((G * S, R * N), np.uint8)
            for r, d in enumerate(datas):
                n, K = shapes[r]
                padded = np.zeros(N * K, np.uint8)
                padded[:n] = np.frombuffer(d, np.uint8)
                syms[:K, r * N:(r + 1) * N] = padded.reshape(N, K).T
            md = jax.device_put(jnp.asarray(
                np.asarray(metas, np.int32).T.copy()))
            sd = jax.device_put(jnp.asarray(syms))
            td = jax.device_put(jnp.asarray(np.concatenate(tabs, axis=0)))
            fn = lambda: encode_many_device_v6(md, sd, td, N, S, R, G)
            t0 = time.time()
            blocks, sts = jax.block_until_ready(fn())
            cmp_s = time.time() - t0
            # verify: compact stream r=0 and compare to rans_np
            bl = np.asarray(blocks).reshape(G, S * LR + 8, R, LANE_COLS)
            stn = np.asarray(sts).astype(np.uint32)
            ok = True
            for r in (0, R - 1):
                n, K = shapes[r]
                x = stn[0, r * N:(r + 1) * N]
                st = np.empty(2 * N, np.uint16)
                st[0::2] = (x >> 16).astype(np.uint16)
                st[1::2] = (x & 0xFFFF).astype(np.uint16)
                parts = []
                for g in range(G - 1, -1, -1):
                    cnt = int(bl[g, 0, r, 0])
                    if cnt:
                        pay = bl[g, 8:, r, :].reshape(-1)
                        parts.append(pay[pay.shape[0] - cnt:])
                words = np.concatenate(parts).astype(np.uint16)
                freq = rans_np.normalize_freqs(
                    np.bincount(np.frombuffer(datas[r], np.uint8),
                                minlength=256))
                head = bytes([int(np.log2(N)), 0]) \
                    + int(n).to_bytes(4, "little") \
                    + rans_np._freqs_serialize(freq)
                ok &= (head + st.tobytes() + words.tobytes()
                       == rans_np.encode(datas[r], order=0, n_lanes=N))
            b = best3(lambda: jax.block_until_ready(fn()))
            line = (f"enc-v6 N={N} S={S} R={R}: {tot/1e6/b:.0f} MB/s agg "
                    f"kernel-only exact={ok} (compile {cmp_s:.0f}s)")
        except Exception as ex:
            line = f"enc-v6 N={N} S={S} R={R}: FAIL {type(ex).__name__} {ex}"
        print(line, flush=True)
        results.append(line)

    print("\n==== SUMMARY ====")
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
