"""Codec registry: entropy + transform codecs for section payloads.

Reference parity: src/codec.h:65-122 codec vtable, src/compressor.c:18
comp_compress. The entropy core is our own wide-interleaved rANS
(ops/rans_np.py spec, ops/rans_jax.py device path) instead of htscodecs'
4-lane coders; LZMA/BZ2/ZLIB come from the Python standard library (the
reference vendors the same C libraries).

Every compress() returns a self-contained payload; the codec id travels in the
section header (format/sections.py). `uncomp_len` is available at decompress
time from the header.
"""

import bz2 as _bz2
import lzma as _lzma
import zlib as _zlib

import numpy as np

from ..ops import rans_np, pack as packops

# codec ids (u8), stable on-disk values
NONE = 0
RANS0 = 1     # wide-interleaved rANS order-0
RANS1 = 2     # order-1
PACK0 = 3     # <=16 distinct symbols: bit-pack, then rANS order-0 on packed
PACK1 = 4     # bit-pack, then rANS order-1 on packed
ZLIB = 5
BZ2 = 6
LZMA = 7
ACGT = 8      # DNA 2-bit pack + exception channel
DELTA_RANS = 9   # byte-wise delta then rANS order-0 (pos-like streams)
RLE0 = 10     # run-length (value,run) pairs, each rANS'd — long-run streams
DOMQ = 11     # dominant-symbol quality: RLE'd dom-mask + rANS'd exceptions
STRIPE4 = 12  # 4-byte-plane transpose then order-1 rANS (u32/f32 arrays)
ARITH0 = 13   # wide-interleaved adaptive range coder, order-0
ARITH1 = 14   # order-1 (context = previous byte)
BWT = 15      # block-sorting (BSC role): vectorized BWT + adaptive coder
ACGT_LZ = 16  # 2-bit pack + LZMA-1 over the packed stream: repeat-family
              # genomes give LZ matches the entropy stage can't see
              # (codec_acgt.c's pack + sub-codec shape, LZ sub-codec)

NAMES = {NONE: "NONE", RANS0: "RANS0", RANS1: "RANS1", PACK0: "PACK0",
         PACK1: "PACK1", ZLIB: "ZLIB", BZ2: "BZ2", LZMA: "LZMA", ACGT: "ACGT",
         DELTA_RANS: "DELTA", RLE0: "RLE0", DOMQ: "DOMQ", STRIPE4: "STRIPE4",
         ARITH0: "ARITH0", ARITH1: "ARITH1", BWT: "BWT", ACGT_LZ: "ACGTLZ"}

# toggled by the pipeline: use the JAX (device) rANS for large payloads
_JAX_MIN_SIZE = 1 << 62   # effectively disabled until enabled
_DEVICE_BATCH = False     # batch a VB's RANS0 payloads into one kernel call


def enable_device_rans(min_size: int = 256 * 1024, batch: bool = True):
    global _JAX_MIN_SIZE, _DEVICE_BATCH
    _JAX_MIN_SIZE = min_size
    _DEVICE_BATCH = batch


def disable_device_rans():
    global _JAX_MIN_SIZE, _DEVICE_BATCH
    _JAX_MIN_SIZE = 1 << 62
    _DEVICE_BATCH = False


_DEVICE_TUNED = None


def autotune_device_rans() -> bool:
    """Enable the batched device (Pallas) rANS path iff it beats the native
    coder END-TO-END on this host — i.e. including transfers (a tunneled
    chip behind a ~20 MB/s relay loses to the AVX-512 host coder even
    though the kernel alone does >1 GB/s; a locally-attached chip wins).
    The probe costs one kernel compile, so the verdict is cached on disk
    per (platform, device-kind). GXZ_DEVICE_RANS=1/0 overrides."""
    global _DEVICE_TUNED
    if _DEVICE_TUNED is not None:
        return _DEVICE_TUNED
    import os
    force = os.environ.get("GXZ_DEVICE_RANS")
    if force is not None:
        _DEVICE_TUNED = force == "1"
        if _DEVICE_TUNED:
            enable_device_rans(256 * 1024)
        return _DEVICE_TUNED
    try:
        import json
        import time as _t
        import jax
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            _DEVICE_TUNED = False
            return False
        key = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
        cpath = os.path.expanduser("~/.cache/gxz_device_tune.json")
        cache = {}
        try:
            cache = json.load(open(cpath))
        except Exception:
            pass
        if key in cache:
            _DEVICE_TUNED = bool(cache[key])
            if _DEVICE_TUNED:
                enable_device_rans(256 * 1024)
            return _DEVICE_TUNED
        # stage 1 — transfer probe (no kernel compile): the binding lower
        # bound on device e2e is h2d bandwidth, so a slow link rejects
        # cheaply. Random payload: a compressing relay would make zeros lie.
        import jax.numpy as jnp
        from .. import native
        buf = np.random.default_rng(0).integers(0, 256, 16 << 20,
                                                dtype=np.uint8)
        jax.block_until_ready(jnp.asarray(buf))          # warm the path
        t0 = _t.perf_counter()
        jax.block_until_ready(jnp.asarray(buf))
        h2d = buf.nbytes / 1e6 / (_t.perf_counter() - t0)
        if h2d < 400.0:
            _DEVICE_TUNED = False
            disable_device_rans()
        else:
            # stage 2 — real steady-state probe: one batched encode (pays
            # the kernel compile ONCE per host; the verdict is cached), vs
            # the native coder on the same payloads. Host framing (table
            # builds, transposes) is part of the device path's real cost
            # and is why a fast link alone is not sufficient.
            rng = np.random.default_rng(0)
            data = rng.choice(np.frombuffer(b"!#-2<AFJ", np.uint8),
                              2 << 20).tobytes()
            datas = [data] * 8
            enable_device_rans(256 * 1024)
            compress_many_rans(datas, 0)                 # warm + compile
            t0 = _t.perf_counter()
            compress_many_rans(datas, 0)
            td = _t.perf_counter() - t0
            t0 = _t.perf_counter()
            for d in datas:
                (native.rans_encode(d, 0) if native.available()
                 else rans_np.encode(d, order=0))
            tn = _t.perf_counter() - t0
            _DEVICE_TUNED = td < tn * 0.9
            if not _DEVICE_TUNED:
                disable_device_rans()
        try:
            os.makedirs(os.path.dirname(cpath), exist_ok=True)
            cache[key] = bool(_DEVICE_TUNED)
            json.dump(cache, open(cpath, "w"))
        except Exception:
            pass
    except Exception:
        disable_device_rans()
        _DEVICE_TUNED = False
    return _DEVICE_TUNED


def device_batch_min():
    """Payload size threshold for batched device encoding (0 = disabled)."""
    return _JAX_MIN_SIZE if _DEVICE_BATCH and _JAX_MIN_SIZE < (1 << 62) else 0


def compress_many_rans(payloads, order: int):
    """Batched encode of many payloads in one device kernel launch
    (ops/rans_pallas.encode_many / encode_many_o1); streams are
    format-identical to the host coder's."""
    from ..ops import rans_pallas
    if order == 0:
        # v6 stacked-state kernel in chunks of <=16 concurrent streams
        outs = []
        srt = sorted(range(len(payloads)), key=lambda i: -len(payloads[i]))
        res = [None] * len(payloads)
        # v7 kernel (two-level tables + MXU word scatter): R=16 866 MB/s,
        # R=24 1192 MB/s aggregate kernel-only on v5e — deep batches pick
        # up the wide shape, shallow ones keep the cheaper compile
        for j in range(0, len(srt), 24):
            chunk = srt[j:j + 24]
            R = 24 if len(chunk) > 16 else (16 if len(chunk) > 8 else 8)
            enc = rans_pallas.encode_many_v6(
                [payloads[i] for i in chunk], n_lanes=1024, S=8, R=R)
            for i, e in zip(chunk, enc):
                res[i] = e
        return res
    # order-1: stacked palette kernel, per-chunk fallback for wide alphabets
    res = [None] * len(payloads)
    srt = sorted(range(len(payloads)), key=lambda i: -len(payloads[i]))
    for j in range(0, len(srt), 16):
        chunk = srt[j:j + 16]
        R = 16 if len(chunk) > 8 else 8
        enc = rans_pallas.encode_many_o1_v6(
            [payloads[i] for i in chunk], n_lanes=1024, S=8, R=R)
        if enc is None:
            enc = rans_pallas.encode_many_o1(
                [payloads[i] for i in chunk], n_lanes=1024, S=8)
        for i, e in zip(chunk, enc):
            res[i] = e
    return res


def _bucket(n: int) -> int:
    """Round up to 2^k or 1.5*2^k so device kernels see a bounded set of
    shapes (compile-cache friendly; <= 33% padding)."""
    b = 1 << 17
    while b < n:
        if b + (b >> 1) >= n:
            return b + (b >> 1)
        b <<= 1
    return b


def _rans_encode(data: bytes, order: int) -> bytes:
    if len(data) >= _JAX_MIN_SIZE:
        from ..ops import rans_jax
        nb = _bucket(len(data))
        if nb > len(data):
            data = bytes(data) + b"\0" * (nb - len(data))
        return rans_jax.encode(data, order=order)
    from .. import native
    if native.available():
        return native.rans_encode(data, order)
    return rans_np.encode(data, order=order)


def _rans_decode(blob) -> bytes:
    """Decode; may return padded plaintext (caller slices to uncomp_len)."""
    n = int.from_bytes(bytes(blob[2:6]), "little")
    if n >= _JAX_MIN_SIZE:
        from ..ops import rans_jax
        return rans_jax.decode(blob)
    from .. import native
    if native.available():
        return native.rans_decode(blob)
    return rans_np.decode(blob)


def _arith_encode(data: bytes, order: int) -> bytes:
    from .. import native
    if native.available():
        return native.arith_encode(data, order)
    from ..ops import arith_np
    return arith_np.encode(data, order=order)


def _arith_decode(blob) -> bytes:
    from .. import native
    if native.available():
        return native.arith_decode(blob)
    from ..ops import arith_np
    return arith_np.decode(blob)


def _byte_hist(a: np.ndarray) -> np.ndarray:
    from .. import native
    if native.available():
        return native.byte_hist(a)
    return np.bincount(a, minlength=256)


def _pack_encode(data: bytes, order: int) -> bytes:
    from .. import native
    a = np.frombuffer(data, np.uint8)
    syms = np.nonzero(_byte_hist(a))[0].astype(np.uint8)
    ns = syms.shape[0]
    if ns <= 2:
        width = 1
    elif ns <= 4:
        width = 2
    elif ns <= 16:
        width = 4
    else:
        raise ValueError("PACK needs <=16 distinct symbols")
    lut = np.zeros(256, np.uint8)
    lut[syms] = np.arange(ns, dtype=np.uint8)
    if native.available():
        packed = native.pack_lut(a, lut, width)
    else:
        packed = packops.pack_np(lut[a], width)
    sub = _rans_encode(packed.tobytes(), order)
    head = bytes([ns, width]) + len(a).to_bytes(8, "little") + syms.tobytes()
    return head + sub


def _pack_decode(blob) -> bytes:
    from .. import native
    blob = memoryview(blob)
    ns, width = blob[0], blob[1]
    n = int.from_bytes(blob[2:10], "little")
    syms = np.frombuffer(blob[10:10 + ns], np.uint8)
    packed = np.frombuffer(_rans_decode(blob[10 + ns:]), np.uint8)
    if native.available():
        return native.unpack_lut(packed, n, width, syms).tobytes()
    codes = packops.unpack_np(packed, width, n)
    return syms[codes].tobytes()


def _acgt_encode(data: bytes, packed_lz: bool = False) -> bytes:
    a = np.frombuffer(data, np.uint8)
    from .. import native
    if native.available():
        packed, exc_pos, exc_bytes = native.acgt_pack(a)
    else:
        packed, exc_pos, exc_bytes = packops.seq_pack_2bit(a)
    p = _lzma.compress(packed.tobytes(), preset=1) if packed_lz \
        else _rans_encode(packed.tobytes(), 0)
    e_pos = _rans_encode(np.diff(exc_pos, prepend=np.uint32(0)).astype("<u4").tobytes(), 0)
    e_b = _rans_encode(exc_bytes.tobytes(), 0)
    head = len(a).to_bytes(8, "little") + len(exc_pos).to_bytes(8, "little") + \
        len(p).to_bytes(8, "little") + len(e_pos).to_bytes(8, "little")
    return head + p + e_pos + e_b


def _acgt_decode(blob, packed_lz: bool = False) -> bytes:
    blob = memoryview(blob)
    n = int.from_bytes(blob[0:8], "little")
    ne = int.from_bytes(blob[8:16], "little")
    lp = int.from_bytes(blob[16:24], "little")
    lep = int.from_bytes(blob[24:32], "little")
    off = 32
    packed = np.frombuffer(
        _lzma.decompress(bytes(blob[off:off + lp])) if packed_lz
        else _rans_decode(blob[off:off + lp]), np.uint8)
    off += lp
    exc_pos = np.cumsum(np.frombuffer(_rans_decode(blob[off:off + lep]), "<u4")[:ne].astype(np.int64))
    off += lep
    exc_bytes = np.frombuffer(_rans_decode(blob[off:]), np.uint8)[:ne]
    assert exc_pos.shape[0] == ne
    from .. import native
    if native.available():
        return native.acgt_unpack(packed, n, exc_pos, exc_bytes).tobytes()
    return packops.seq_unpack_2bit(packed, n, exc_pos, exc_bytes).tobytes()


def _delta_encode(data: bytes) -> bytes:
    a = np.frombuffer(data, np.uint8)
    d = np.diff(a, prepend=np.uint8(0))
    return _rans_encode(d.tobytes(), 0)


def _delta_decode(blob) -> bytes:
    d = np.frombuffer(_rans_decode(blob), np.uint8)
    return np.cumsum(d.astype(np.uint64)).astype(np.uint8).tobytes()


def _rle_encode(data: bytes) -> bytes:
    a = np.frombuffer(data, np.uint8)
    if a.shape[0] == 0:
        return (0).to_bytes(8, "little")
    change = np.concatenate([[True], a[1:] != a[:-1]])
    starts = np.nonzero(change)[0]
    vals = a[starts]
    runs = np.diff(np.concatenate([starts, [a.shape[0]]]))
    # u32 runs, STRIPE'd by byte plane (htscodecs-style) so order-0 rANS sees
    # each byte position's own distribution (hi planes are ~all zero)
    v = _rans_encode(vals.tobytes(), 0)
    rb = np.ascontiguousarray(runs.astype("<u4").view(np.uint8).reshape(-1, 4).T)
    r = _rans_encode(rb.tobytes(), 0)
    return len(vals).to_bytes(8, "little") + len(v).to_bytes(8, "little") + v + r


def _rle_decode(blob) -> bytes:
    blob = memoryview(blob)
    nr = int.from_bytes(blob[0:8], "little")
    if nr == 0:
        return b""
    lv = int.from_bytes(blob[8:16], "little")
    vals = np.frombuffer(_rans_decode(blob[16:16 + lv]), np.uint8)[:nr]
    rb = np.frombuffer(_rans_decode(blob[16 + lv:]), np.uint8)[:4 * nr]
    runs = np.ascontiguousarray(rb.reshape(4, -1).T).view("<u4").reshape(-1).astype(np.int64)
    return np.repeat(vals, runs).tobytes()


def _domq_encode(data: bytes) -> bytes:
    """Dominant-quality codec (reference src/codec_domq.c): one score
    dominates; store the dom-run structure (RLE of the dom mask) plus the
    exception bytes order-1 coded."""
    a = np.frombuffer(data, np.uint8)
    if a.shape[0] == 0:
        return bytes([0]) + (0).to_bytes(8, "little")
    counts = _byte_hist(a)
    dom = int(np.argmax(counts))
    mask = (a == dom).astype(np.uint8)
    exc = a[mask == 0]
    m = _rle_encode(mask.tobytes())
    e = _rans_encode(exc.tobytes(), 1)
    return bytes([dom]) + len(m).to_bytes(8, "little") + m + e


def _domq_decode(blob) -> bytes:
    blob = memoryview(blob)
    dom = blob[0]
    lm = int.from_bytes(blob[1:9], "little")
    if lm == 0 and len(blob) == 9:
        return b""
    mask = np.frombuffer(_rle_decode(blob[9:9 + lm]), np.uint8)
    exc = np.frombuffer(_rans_decode(blob[9 + lm:]), np.uint8)
    out = np.full(mask.shape[0], dom, dtype=np.uint8)
    nex = int((mask == 0).sum())
    out[mask == 0] = exc[:nex]
    return out.tobytes()


def _stripe4_encode(data: bytes) -> bytes:
    """Byte-plane transpose for 4-byte-element arrays (htscodecs STRIPE):
    each byte position of u32/f32 values gets its own run of the stream so
    order-1 rANS models per-plane distributions. Tail bytes (len%4) pass
    through uncoded."""
    n4 = len(data) // 4
    head = data[: n4 * 4]
    tail = data[n4 * 4:]
    a = np.frombuffer(head, np.uint8).reshape(-1, 4)
    planes = np.ascontiguousarray(a.T).tobytes()
    sub = _rans_encode(planes, 1)
    return len(tail).to_bytes(1, "little") + tail + sub


def _stripe4_decode(blob) -> bytes:
    blob = memoryview(blob)
    lt = blob[0]
    tail = bytes(blob[1:1 + lt])
    planes = np.frombuffer(_rans_decode(blob[1 + lt:]), np.uint8)
    n4 = planes.shape[0] // 4
    a = np.ascontiguousarray(planes[:4 * n4].reshape(4, -1).T)
    return a.tobytes() + tail


def compress(data: bytes, codec: int) -> bytes:
    if codec == NONE:
        return bytes(data)
    if codec == RANS0:
        return _rans_encode(data, 0)
    if codec == RANS1:
        return _rans_encode(data, 1)
    if codec == PACK0:
        return _pack_encode(data, 0)
    if codec == PACK1:
        return _pack_encode(data, 1)
    if codec == ZLIB:
        from .. import native
        if native.available() and len(data) > 0:
            return native.zlib_compress(data, 6)
        return _zlib.compress(bytes(data), 6)
    if codec == BZ2:
        return _bz2.compress(bytes(data), 9)
    if codec == LZMA:
        return _lzma.compress(bytes(data), preset=6)
    if codec == ACGT:
        return _acgt_encode(data)
    if codec == ACGT_LZ:
        return _acgt_encode(data, packed_lz=True)
    if codec == DELTA_RANS:
        return _delta_encode(data)
    if codec == RLE0:
        return _rle_encode(data)
    if codec == DOMQ:
        return _domq_encode(data)
    if codec == STRIPE4:
        return _stripe4_encode(data)
    if codec == ARITH0:
        return _arith_encode(data, 0)
    if codec == ARITH1:
        return _arith_encode(data, 1)
    if codec == BWT:
        from . import bwt as bwt_mod
        return bwt_mod.compress(bytes(data), ARITH1)
    raise ValueError(f"unknown codec {codec}")


def decompress(blob, codec: int, uncomp_len: int) -> bytes:
    if codec == NONE:
        out = bytes(blob)
    elif codec in (RANS0, RANS1):
        out = _rans_decode(blob)
    elif codec in (PACK0, PACK1):
        out = _pack_decode(blob)
    elif codec == ZLIB:
        from .. import native
        if native.available() and uncomp_len > 0:
            out = native.zlib_decompress(blob, uncomp_len)
        else:
            out = _zlib.decompress(bytes(blob))
    elif codec == BZ2:
        out = _bz2.decompress(bytes(blob))
    elif codec == LZMA:
        out = _lzma.decompress(bytes(blob))
    elif codec == ACGT:
        out = _acgt_decode(blob)
    elif codec == ACGT_LZ:
        out = _acgt_decode(blob, packed_lz=True)
    elif codec == DELTA_RANS:
        out = _delta_decode(blob)
    elif codec == RLE0:
        out = _rle_decode(blob)
    elif codec == DOMQ:
        out = _domq_decode(blob)
    elif codec == STRIPE4:
        out = _stripe4_decode(blob)
    elif codec in (ARITH0, ARITH1):
        out = _arith_decode(blob)
    elif codec == BWT:
        from . import bwt as bwt_mod
        out = bwt_mod.decompress(blob)
    else:
        raise ValueError(f"unknown codec {codec}")
    if len(out) > uncomp_len and codec in (RANS0, RANS1, DELTA_RANS):
        out = out[:uncomp_len]  # device-path bucket padding
    assert len(out) == uncomp_len, f"codec {NAMES.get(codec)} length mismatch: {len(out)} != {uncomp_len}"
    return out
