"""TPU probe 7: order-1 batched kernels on hardware + full batched pipeline."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")

def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(7)
    datas = [rng.choice(np.frombuffer(b"FFFF:F,#", np.uint8), 256 << 10).astype(np.uint8).tobytes()
             for _ in range(16)]
    total = sum(map(len, datas))
    t0 = time.time()
    outs = rans_pallas.encode_many_o1(datas, n_lanes=1024, S=8)
    c = time.time() - t0
    refs = [rans_np.encode(d, order=1, n_lanes=1024) for d in datas]
    print("enc_many_o1:", "OK" if outs == refs else "MISMATCH!",
          f"compile {c:.0f}s", flush=True)
    t0 = time.time()
    back = rans_pallas.decode_many_o1(refs)
    c = time.time() - t0
    print("dec_many_o1:", "OK" if back == datas else "MISMATCH!",
          f"compile {c:.0f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time(); rans_pallas.decode_many_o1(refs); ts.append(time.time()-t0)
    print(f"dec_many_o1 e2e: {total/1e6/min(ts):.1f} MB/s", flush=True)

    # full batched FASTQ pipeline on TPU
    from genozip_tpu import codecs
    codecs.enable_device_rans(128 * 1024)
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    data = open("/tmp/gxz_bench.fastq", "rb").read(8 << 20)
    cut = data.rfind(b"\n@")
    open("/tmp/tpu_pipe.fastq", "wb").write(data[:cut+1])
    t0 = time.time()
    zip_file("/tmp/tpu_pipe.fastq", "/tmp/tpu_pipe.gxz", vb_size=4 << 20)
    tz = time.time() - t0
    t0 = time.time()
    piz_file("/tmp/tpu_pipe.gxz", "/tmp/tpu_pipe.out")
    tp = time.time() - t0
    ok = open("/tmp/tpu_pipe.out","rb").read() == open("/tmp/tpu_pipe.fastq","rb").read()
    print(f"batched pipeline on TPU: {'BYTE-IDENTICAL' if ok else 'MISMATCH!'} "
          f"zip {8/tz:.1f} MB/s piz {8/tp:.1f} MB/s", flush=True)

if __name__ == "__main__":
    main()
