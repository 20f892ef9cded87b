"""TPU kernel-only benchmark: rANS order-0 decode v6 (R-stream stacked
state + HIGH-precision matmuls) vs v5 (now also HIGH precision).
Run: python scripts/bench_pallas_tpu11.py  (axon TPU; single process!)"""

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
    per = 4 << 20           # bytes per stream
    results = []

    # ---- v5 (HIGH precision) single-stream reference point ----
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      8 << 20).astype(np.uint8).tobytes()
    for N in (2048,):
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
        for S in (8,):
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
                out = np.asarray(jax.block_until_ready(fn()))
                cmp_s = time.time() - t0
                sym = out[:K].T.reshape(-1)[:nn].tobytes()
                ok = sym == data
                b = best3(lambda: jax.block_until_ready(fn()))
                line = (f"v5-HIGH N={N} S={S}: {len(data)/1e6/b:.0f} MB/s "
                        f"exact={ok} (compile {cmp_s:.0f}s)")
            except Exception as ex:
                line = f"v5-HIGH N={N} S={S}: FAIL {type(ex).__name__} {ex}"
            print(line, flush=True)
            results.append(line)

    # ---- v6 stacked R streams ----
    for (N, S, R) in ((1024, 8, 8), (2048, 8, 8), (1024, 16, 8),
                      (1024, 8, 16)):
        datas = [rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                            per).astype(np.uint8).tobytes()
                 for _ in range(R)]
        bufs = [rans_np.encode(d, order=0, n_lanes=N) for d in datas]
        try:
            # host framing once (mirrors decode_many_v6), then kernel-only
            word_parts, tabs, x0_rows, metas, shapes = [], [], [], [], []
            wbase = 0
            for buf in bufs:
                buf = memoryview(buf)
                n = int.from_bytes(buf[2:6], "little")
                off = 6
                freq, off = rans_np._freqs_deserialize(buf, off)
                cum = np.concatenate([[0], np.cumsum(freq)[:-1]]) \
                    .astype(np.uint32)
                t40 = np.zeros((40, 256), np.float32)
                t40[:34] = v4_tab(freq.astype(np.float32),
                                  cum.astype(np.float32))
                tabs.append(t40)
                words = np.frombuffer(buf[off:], dtype="<u2")
                st = words[: 2 * N].astype(np.uint32)
                x0_rows.append(((st[0::2] << 16) | st[1::2])
                               .astype(np.int32))
                dw = words[2 * N:].astype(np.int32)
                K, _ = lane_layout(n, N)
                metas.append((n, K, wbase))
                shapes.append((K, n))
                wlen = (dw.shape[0] + 1023) // 1024 * 1024
                wp = np.zeros(wlen, np.int32)
                wp[: dw.shape[0]] = dw
                word_parts.append(wp)
                wbase += wlen
            LR = N // LANE_COLS
            R8 = max(R, 8)
            x0s = np.zeros((R8, N), np.int32)
            x0s[:R] = np.stack(x0_rows)
            G = max((K + S - 1) // S for K, _ in shapes)
            word_parts.append(np.zeros((LR + 24) * LANE_COLS, np.int32))
            md = jax.device_put(jnp.asarray(
                np.asarray(metas, np.int32).T.copy()))
            wd = jax.device_put(jnp.asarray(np.concatenate(word_parts)))
            td = jax.device_put(jnp.asarray(np.concatenate(tabs, axis=0)))
            xd = jax.device_put(jnp.asarray(x0s))
            fn = lambda: rans_pallas.decode_many_device_v6(
                md, wd, td, xd, N, S, R, G)
            t0 = time.time()
            plane = np.asarray(jax.block_until_ready(fn()))
            cmp_s = time.time() - t0
            ok = all(
                plane[:K, r * N:(r + 1) * N].T.reshape(-1)[:n].tobytes()
                == datas[r]
                for r, (K, n) in enumerate(shapes))
            tot = sum(len(d) for d in datas)
            b = best3(lambda: jax.block_until_ready(fn()))
            line = (f"v6 N={N} S={S} R={R}: {tot/1e6/b:.0f} MB/s agg "
                    f"kernel-only exact={ok} (compile {cmp_s:.0f}s)")
        except Exception as ex:
            line = f"v6 N={N} S={S} R={R}: FAIL {type(ex).__name__} {ex}"
        print(line, flush=True)
        results.append(line)

    print("\n==== SUMMARY ====")
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
