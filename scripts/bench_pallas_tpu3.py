"""TPU probe: separate relay transfer bandwidth from kernel time, and
measure the fixed encode kernel."""

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

    # 1) pure transfer bandwidth through the relay
    MB8 = np.zeros(8 << 20, np.uint8)
    x = jax.device_put(jnp.asarray(MB8))
    jax.block_until_ready(x)
    t = best3(lambda: jax.block_until_ready(jax.device_put(jnp.asarray(MB8))))
    print(f"h2d 8MB: {8 / t:.1f} MB/s", flush=True)
    t = best3(lambda: np.asarray(x))
    print(f"d2h 8MB: {8 / t:.1f} MB/s", flush=True)

    # 2) kernel-only decode time: inputs device-resident, output stays on dev
    rng = np.random.default_rng(7)
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()
    N, S = 1024, 8
    e = rans_np.encode(data, order=0, n_lanes=N)
    # replicate the wrapper's prep, keep arrays on device
    buf = memoryview(e)
    from genozip_tpu.ops.rans_np import _freqs_deserialize, lane_layout
    off = 6
    freq, off = _freqs_deserialize(buf, off)
    cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
    tab = np.stack([freq.astype(np.float32), cum.astype(np.float32)])
    words = np.frombuffer(buf[off:], dtype="<u2")
    K, _ = lane_layout(n, N)
    st = words[: 2 * N].astype(np.uint32)
    x0 = ((st[0::2] << 16) | st[1::2]).astype(np.int32).reshape(1, N)
    dw = words[2 * N:].astype(np.int32)
    LR = N // 128
    wrows = (dw.shape[0] + 127) // 128 + S * LR + 24
    wrows = (wrows + 7) // 8 * 8
    wpad = np.zeros(wrows * 128, np.int32)
    wpad[: dw.shape[0]] = dw
    dwords = jax.device_put(jnp.asarray(wpad))
    dtab = jax.device_put(jnp.asarray(tab))
    dx0 = jax.device_put(jnp.asarray(x0))
    out = rans_pallas.decode_order0_device_v3(dwords, dtab, dx0, K, N, n, S)
    jax.block_until_ready(out)
    t = best3(lambda: jax.block_until_ready(
        rans_pallas.decode_order0_device_v3(dwords, dtab, dx0, K, N, n, S)))
    print(f"dec-v3 kernel-only N={N} S={S}: {n / 1e6 / t:.1f} MB/s "
          f"({t * 1e3:.0f} ms)", flush=True)

    # 3) encode end-to-end (fixed counts layout)
    ref = rans_np.encode(data, order=0, n_lanes=1024)
    for S in (4, 16):
        try:
            t0 = time.time()
            got = rans_pallas.encode(data, n_lanes=1024, S=S)
            c = time.time() - t0
            assert got == ref, "MISMATCH"
            t = best3(lambda S=S: rans_pallas.encode(data, n_lanes=1024, S=S))
            print(f"enc N=1024 S={S}: {n / 1e6 / t:.1f} MB/s (compile {c:.0f}s)",
                  flush=True)
        except Exception as ex:
            print(f"enc N=1024 S={S}: FAILED {ex!r}", flush=True)


if __name__ == "__main__":
    main()
