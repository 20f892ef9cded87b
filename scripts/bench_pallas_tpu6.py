"""TPU probe 6: order-1 kernels (kernel-only + e2e)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def best3(fn):
    ts = []
    for _ in range(3):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    return min(ts)

def main():
    import jax, jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas
    from genozip_tpu.ops.rans_np import lane_layout
    rng = np.random.default_rng(7)
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#", np.uint8), n).astype(np.uint8).tobytes()
    N, S = 1024, 8
    ref = rans_np.encode(data, order=1, n_lanes=N)

    # decode e2e + kernel-only
    t0 = time.time(); out = rans_pallas.decode_order1(ref, S=S); c = time.time()-t0
    print("dec-o1 e2e:", "OK" if out == data else "MISMATCH!",
          f"{n/1e6/best3(lambda: rans_pallas.decode_order1(ref, S=S)):.1f} MB/s (compile {c:.0f}s)", flush=True)
    buf = memoryview(ref)
    freq2, cum2, off = rans_pallas._order1_tables(buf, 6)
    words = np.frombuffer(buf[off:], dtype="<u2")
    K, _ = lane_layout(n, N)
    st = words[:2*N].astype(np.uint32)
    x0 = ((st[0::2] << 16) | st[1::2]).astype(np.int32).reshape(1, N)
    dw = words[2*N:].astype(np.int32)
    LR = N // 128
    wrows = ((dw.shape[0] + 127)//128 + S*LR + 24 + 7)//8*8
    wpad = np.zeros(wrows*128, np.int32); wpad[:dw.shape[0]] = dw
    a = (jax.device_put(jnp.asarray(wpad)), jax.device_put(jnp.asarray(freq2)),
         jax.device_put(jnp.asarray(cum2)), jax.device_put(jnp.asarray(x0)))
    jax.block_until_ready(rans_pallas.decode_order1_device(*a, K, N, n, S))
    t = best3(lambda: jax.block_until_ready(rans_pallas.decode_order1_device(*a, K, N, n, S)))
    print(f"dec-o1 kernel: {n/1e6/t:.1f} MB/s", flush=True)

    # encode e2e
    t0 = time.time(); got = rans_pallas.encode_order1(data, n_lanes=N, S=S); c = time.time()-t0
    print("enc-o1 e2e:", "OK" if got == ref else "MISMATCH!",
          f"{n/1e6/best3(lambda: rans_pallas.encode_order1(data, n_lanes=N, S=S)):.1f} MB/s (compile {c:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
