"""TPU probe 4: fixed encode kernel + decode kernel-only variants."""
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
    from genozip_tpu.ops.rans_np import _freqs_deserialize, lane_layout

    rng = np.random.default_rng(7)
    n = 8 << 20
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8), n).astype(np.uint8).tobytes()

    # decode kernel-only at more (N, S)
    for N, S in ((1024, 16), (2048, 8), (4096, 4), (4096, 8)):
        e = rans_np.encode(data, order=0, n_lanes=N)
        buf = memoryview(e); off = 6
        freq, off = _freqs_deserialize(buf, off)
        cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
        tab = np.stack([freq.astype(np.float32), cum.astype(np.float32)])
        words = np.frombuffer(buf[off:], dtype="<u2")
        K, _ = lane_layout(n, N)
        st = words[:2*N].astype(np.uint32)
        x0 = ((st[0::2] << 16) | st[1::2]).astype(np.int32).reshape(1, N)
        dw = words[2*N:].astype(np.int32)
        LR = N // 128
        wrows = ((dw.shape[0] + 127)//128 + S*LR + 24 + 7)//8*8
        wpad = np.zeros(wrows*128, np.int32); wpad[:dw.shape[0]] = dw
        a = (jax.device_put(jnp.asarray(wpad)), jax.device_put(jnp.asarray(tab)),
             jax.device_put(jnp.asarray(x0)))
        try:
            out = rans_pallas.decode_order0_device_v3(*a, K, N, n, S)
            jax.block_until_ready(out)
            plane = np.asarray(out)[:K]
            got = plane.T.reshape(-1)[:n].tobytes()
            ok = "OK" if got == data else "MISMATCH!"
            t = best3(lambda: jax.block_until_ready(
                rans_pallas.decode_order0_device_v3(*a, K, N, n, S)))
            print(f"dec-v3 kernel N={N} S={S}: {n/1e6/t:.1f} MB/s {ok}", flush=True)
        except Exception as ex:
            print(f"dec-v3 kernel N={N} S={S}: FAILED {ex!r}", flush=True)

    # encode end-to-end + kernel-only
    for N, S in ((1024, 4), (1024, 16), (4096, 4)):
        ref = rans_np.encode(data, order=0, n_lanes=N)
        try:
            t0 = time.time()
            got = rans_pallas.encode(data, n_lanes=N, S=S)
            c = time.time() - t0
            ok = "OK" if got == ref else "MISMATCH!"
            t = best3(lambda N=N, S=S: rans_pallas.encode(data, n_lanes=N, S=S))
            print(f"enc e2e N={N} S={S}: {n/1e6/t:.1f} MB/s {ok} (compile {c:.0f}s)", flush=True)
            # kernel-only
            K, _ = lane_layout(n, N)
            LR = N // 128
            G = (K + S - 1)//S; Kp = G*S
            freq = rans_np.normalize_freqs(np.bincount(np.frombuffer(data, np.uint8), minlength=256))
            cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
            padded = np.zeros(N*K, np.uint8); padded[:n] = np.frombuffer(data, np.uint8)
            plane = np.zeros((Kp, N), np.uint8); plane[:K] = padded.reshape(N, K).T
            syms = jax.device_put(jnp.asarray(plane.reshape(Kp*LR, 128)))
            tabd = jax.device_put(jnp.asarray(np.stack([freq.astype(np.float32), cum.astype(np.float32)])))
            t = best3(lambda: jax.block_until_ready(
                rans_pallas.encode_order0_device(syms, tabd, K, LR, n, S)))
            print(f"enc kernel N={N} S={S}: {n/1e6/t:.1f} MB/s", flush=True)
        except Exception as ex:
            print(f"enc N={N} S={S}: FAILED {ex!r}", flush=True)

if __name__ == "__main__":
    main()
