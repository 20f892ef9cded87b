"""TPU kernel-only benchmark: order-1 decode — o1v6 (stacked R streams +
palette-compacted rank tables + _dot16) vs decode_many_o1 baseline.
Run: python scripts/bench_pallas_tpu13.py  (axon TPU; single process!)"""

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
    print("devices:", jax.devices(), flush=True)
    from genozip_tpu.ops import rans_np, rans_pallas

    rng = np.random.default_rng(7)
    per = 4 << 20
    results = []
    # markov-ish QUAL-like data (order-1 wins, alphabet 8)
    alpha = np.frombuffer(b"FFFF:F,#", np.uint8)

    def gen(sz):
        a = rng.choice(alpha, sz).astype(np.uint8)
        # smear: repeat previous with p=0.7 for order-1 structure
        rep = rng.random(sz) < 0.7
        idx = np.arange(sz)
        idx[rep] = 0
        np.maximum.accumulate(idx, out=idx)
        return a[idx].tobytes()

    for (N, S, R) in ((1024, 8, 8), (1024, 8, 16), (2048, 8, 16)):
        datas = [gen(per) for _ in range(R)]
        bufs = [rans_np.encode(d, order=1, n_lanes=N) for d in datas]
        tot = sum(len(d) for d in datas)
        try:
            t0 = time.time()
            outs = rans_pallas.decode_many_o1_v6(bufs, S=S, R=R)
            cmp_s = time.time() - t0
            ok = outs is not None and \
                all(o == d for o, d in zip(outs, datas))
            b = best3(lambda: rans_pallas.decode_many_o1_v6(bufs, S=S, R=R))
            line = (f"o1v6 N={N} S={S} R={R}: {tot/1e6/b:.0f} MB/s agg "
                    f"(incl host framing) exact={ok} (compile {cmp_s:.0f}s)")
        except Exception as ex:
            line = f"o1v6 N={N} S={S} R={R}: FAIL {type(ex).__name__} {ex}"
        print(line, flush=True)
        results.append(line)

    # baseline: sequential decode_many_o1 on the same 8 streams
    datas = [gen(per) for _ in range(8)]
    bufs = [rans_np.encode(d, order=1, n_lanes=1024) for d in datas]
    tot = sum(len(d) for d in datas)
    try:
        t0 = time.time()
        outs = rans_pallas.decode_many_o1(bufs, S=8)
        cmp_s = time.time() - t0
        ok = all(o == d for o, d in zip(outs, datas))
        b = best3(lambda: rans_pallas.decode_many_o1(bufs, S=8))
        line = (f"o1-baseline N=1024 S=8 B=8: {tot/1e6/b:.0f} MB/s agg "
                f"exact={ok} (compile {cmp_s:.0f}s)")
    except Exception as ex:
        line = f"o1-baseline: FAIL {type(ex).__name__} {ex}"
    print(line, flush=True)
    results.append(line)

    print("\n==== SUMMARY ====")
    for r in results:
        print(r, flush=True)


if __name__ == "__main__":
    main()
