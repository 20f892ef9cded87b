"""TPU probe 5: batched decode_many vs per-stream decode calls."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(7)
    N, S = 1024, 8
    datas, bufs = [], []
    for _ in range(32):
        n = 256 << 10
        d = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8), n).astype(np.uint8).tobytes()
        datas.append(d); bufs.append(rans_np.encode(d, order=0, n_lanes=N))
    total = sum(len(d) for d in datas)
    t0 = time.time()
    outs = rans_pallas.decode_many(bufs, S=S)
    c = time.time() - t0
    assert outs == datas, "MISMATCH"
    ts = []
    for _ in range(3):
        t0 = time.time(); rans_pallas.decode_many(bufs, S=S); ts.append(time.time() - t0)
    print(f"decode_many 32x256KB: {total/1e6/min(ts):.1f} MB/s (compile {c:.0f}s)", flush=True)
    # per-stream baseline
    rans_pallas.decode(bufs[0], S=S)
    t0 = time.time()
    for b in bufs:
        rans_pallas.decode(b, S=S)
    dt = time.time() - t0
    print(f"per-stream x32: {total/1e6/dt:.1f} MB/s", flush=True)


# (encode_many measurement appended)
def enc_many():
    import jax, time, numpy as np
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(7)
    datas = [rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8), 256 << 10).astype(np.uint8).tobytes() for _ in range(32)]
    total = sum(len(d) for d in datas)
    t0 = time.time()
    outs = rans_pallas.encode_many(datas, n_lanes=1024, S=8)
    c = time.time() - t0
    refs = [rans_np.encode(d, order=0, n_lanes=1024) for d in datas]
    assert outs == refs, "ENC MISMATCH"
    ts = []
    for _ in range(3):
        t0 = time.time(); rans_pallas.encode_many(datas, n_lanes=1024, S=8); ts.append(time.time() - t0)
    print(f"encode_many 32x256KB: {total/1e6/min(ts):.1f} MB/s (compile {c:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
    enc_many()
