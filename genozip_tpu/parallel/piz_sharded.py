"""dp-sharded PIZ: reconstruction data-parallel over a device mesh with
plan-ordered assembly.

Reference parity: src/writer.c:866 writer_create_plan (the recon-plan IR)
and :1203 writer_main_loop (ordered assembly thread). The reference
reconstructs VBs on compute threads and a dedicated writer thread emits
them in plan order; here the plan (VB order per component) is sliced
contiguously across dp workers, each worker reconstructs its slice
(the big rANS sections ride ONE dp-sharded jitted decode kernel per
batch — XLA partitions the batch dim over the 'dp' mesh axis), and the
main thread assembles strictly in plan order: gencomp re-interleave,
running digest, output write. Output bytes equal the single-host PIZ
byte-for-byte.
"""

import zlib

import numpy as np

from ..ops import rans_np, rans_jax


class ShardedPizDecoder:
    """Decodes batches of framed rANS streams on a dp mesh; outputs are
    byte-identical to the host decoder (rans_np spec)."""

    def __init__(self, n_devices: int | None = None, min_size: int = 4096):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        devices = jax.devices()
        self.D = min(n_devices or len(devices), len(devices))
        self.mesh = Mesh(np.asarray(devices[: self.D]), ("dp",))
        self.min_size = min_size
        self._P = P
        self._NS = NamedSharding
        self._fns = {}

    def _fn(self, K: int, N: int, order: int):
        key = (K, N, order)
        f = self._fns.get(key)
        if f is None:
            import jax
            sh = self._NS(self.mesh, self._P("dp"))

            def batch(words, tab, cum_row, ns):
                empty2 = jax.numpy.zeros((256, 512), np.float32)
                return jax.vmap(
                    lambda w, t, cr, n: rans_jax._decode_core(
                        w, t, empty2, cr, K, N, n, order))(
                            words, tab, cum_row, ns)

            f = self._fns[key] = jax.jit(batch, in_shardings=(sh,) * 4,
                                         out_shardings=sh)
        return f

    def decode_sections(self, items):
        """items: list of framed rANS streams (order-0 rides the mesh;
        others fall back to the host decoder). Streams sharing the (K, N)
        lane layout batch into ONE dp-sharded launch — the batch dim is
        partitioned over the 'dp' mesh axis. Returns payload bytes ==
        rans_np.decode for each."""
        import jax.numpy as jnp
        out = [None] * len(items)
        groups = {}
        metas = []
        for i, buf in enumerate(items):
            buf = memoryview(buf)
            logN, order = buf[0], buf[1]
            n = int.from_bytes(buf[2:6], "little")
            metas.append((logN, order, n))
            if order != 0 or n < self.min_size:
                out[i] = rans_np.decode(buf)
                continue
            N = 1 << logN
            K = rans_jax.lane_layout(n, N)[0]
            groups.setdefault((K, N), []).append(i)
        for (K, N), idxs in groups.items():
            parsed = []
            for i in idxs:
                buf = memoryview(items[i])
                n = metas[i][2]
                off = 6
                freq, off = rans_np._freqs_deserialize(buf, off)
                cum = np.concatenate(
                    [[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
                tab = np.stack([freq, cum], axis=1).astype(np.float32)
                words = np.frombuffer(buf[off:], dtype="<u2")
                parsed.append((n, tab, cum.astype(np.float32), words))
            # pad the batch to a multiple of D for even dp sharding
            B = len(parsed)
            Bp = (B + self.D - 1) // self.D * self.D
            wmax = max(p[3].shape[0] for p in parsed)
            wb = 1 << 12
            while wb < wmax:
                wb <<= 1
            wordsb = np.zeros((Bp, wb), "<u2")
            tabb = np.zeros((Bp, 256, 2), np.float32)
            cumb = np.zeros((Bp, 256), np.float32)
            nsb = np.zeros(Bp, np.int32)
            for j, (n, tab, cumf, words) in enumerate(parsed):
                wordsb[j, :words.shape[0]] = words
                tabb[j] = tab
                cumb[j] = cumf
                nsb[j] = n
            fn = self._fn(K, N, 0)
            res = np.asarray(fn(jnp.asarray(wordsb), jnp.asarray(tabb),
                                jnp.asarray(cumb), jnp.asarray(nsb)))
            for j, i in enumerate(idxs):
                out[i] = res[j][: metas[i][2]].tobytes()
        return out


def piz_file_dp(z_path: str, out_path: str | None = None, dp: int = 1,
                reference: str | None = None) -> bytes | None:
    """Data-parallel PIZ: plan VBs fan out round-robin to dp workers with a
    bounded in-flight window; assembly (gencomp re-interleave + digest +
    write) drains strictly in plan order as futures complete, so peak
    memory is O(window × VB), not O(file) (writer_main_loop's streamed
    handover, writer.c:1203). The output is byte-identical to piz_file's."""
    import os
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    from ..piz_pipeline import PizReader
    from ..utils import profiler

    pr = PizReader(z_path, reference=reference)
    comps = pr.components()
    has_gencomp = pr.ensure_gencomp()
    sink = open(out_path, "wb") if out_path else None
    chunks = []
    try:
        for comp_i, comp in enumerate(comps):
            nvb = comp.get("num_vbs", pr.num_vbs())
            hdr = pr.txt_header(comp_i) if comp_i == 0 else b""
            adler = zlib.adler32(hdr)
            if sink is not None:
                sink.write(hdr)
            else:
                chunks.append(hdr)

            def work(vb_i):
                loaded = pr.load_vb(vb_i, comp_i)
                with profiler.timer("piz:recon"):
                    return pr.recon_loaded_vb(loaded, vb_i, comp_i,
                                              want_pctxs=True)

            with ThreadPoolExecutor(max_workers=dp) as pool:
                inflight = deque()   # (vb_i, future) in plan order

                def drain():
                    nonlocal adler
                    vb_i, fut = inflight.popleft()
                    out, pctxs = fut.result()
                    if has_gencomp and comp_i == 0:
                        out = pr.merge_vb_gencomp(out, pctxs)
                    adler = zlib.adler32(out, adler)
                    if sink is not None:
                        sink.write(out)
                    else:
                        chunks.append(out)

                for vb_i in range(1, nvb + 1):
                    inflight.append((vb_i, pool.submit(work, vb_i)))
                    if len(inflight) > 2 * dp:
                        drain()
                while inflight:
                    drain()
            comp_adler = comp.get("adler")
            if comp_adler is not None:
                assert adler == comp_adler, \
                    f"component {comp_i}: dp-PIZ digest mismatch"
    except BaseException:
        if sink is not None:
            sink.close()
            os.unlink(out_path)   # never leave a wrong partial output
        raise
    if sink is not None:
        sink.close()
        return None
    return b"".join(chunks)
