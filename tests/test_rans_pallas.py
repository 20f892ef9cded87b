"""Pallas rANS decode kernel — interpret-mode bit-exactness vs the numpy
spec (on-TPU bring-up tracked in ops/rans_pallas.py docstring)."""

import numpy as np
import pytest

from genozip_tpu.ops import rans_np, rans_pallas

RNG = np.random.default_rng(17)


@pytest.mark.parametrize("n", [33000, 200000, 517])
def test_pallas_decode_interpret(n):
    if n < 33000:
        # small streams use < 128 lanes — kernel not applicable
        data = RNG.integers(0, 256, n).astype(np.uint8).tobytes()
        e = rans_np.encode(data, order=0)
        if (1 << e[0]) < rans_pallas.LANE_COLS:
            with pytest.raises(AssertionError):
                rans_pallas.decode(e, interpret=True)
            return
    data = RNG.choice(np.frombuffer(b"FFFFF:F,#AB", np.uint8), n).astype(np.uint8).tobytes()
    e = rans_np.encode(data, order=0)
    assert rans_pallas.decode(e, interpret=True) == data


@pytest.mark.parametrize("n,S", [(33000, 1), (33000, 4), (200000, 8),
                                 (131072, 16)])
def test_pallas_decode_v2_interpret(n, S):
    """S-step-blocked kernel (v2) must match the numpy spec bit-exactly."""
    data = RNG.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()
    e = rans_np.encode(data, order=0)
    assert rans_pallas.decode(e, interpret=True, S=S) == data


@pytest.mark.parametrize("n,N,S", [(33000, 256, 4), (200000, 1024, 4),
                                   (131072, 128, 16), (100, 128, 1)])
def test_pallas_encode_interpret(n, N, S):
    """Encode kernel must produce byte-identical streams to the numpy spec."""
    data = RNG.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      n).astype(np.uint8).tobytes()
    ref = rans_np.encode(data, order=0, n_lanes=N)
    got = rans_pallas.encode(data, n_lanes=N, S=S, interpret=True)
    assert got == ref
    assert rans_np.decode(got) == data


def test_pallas_decode_many_interpret():
    """Batched multi-stream decode must match per-stream decode bit-exactly
    (mixed sizes incl. empty/tiny streams)."""
    N = 256
    datas, bufs = [], []
    for n in (33000, 517, 0, 120000, 1):
        d = RNG.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                       n).astype(np.uint8).tobytes()
        datas.append(d)
        bufs.append(rans_np.encode(d, order=0, n_lanes=N))
    outs = rans_pallas.decode_many(bufs, S=8, interpret=True)
    assert outs == datas


def test_pallas_encode_many_interpret():
    """Batched multi-stream encode: byte-identical streams, incl. the f=4096
    single-symbol edge case."""
    N = 256
    datas = [RNG.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                        n).astype(np.uint8).tobytes()
             for n in (33000, 0, 1, 51700)] + [b"F" * 4000]
    outs = rans_pallas.encode_many(datas, n_lanes=N, S=4, interpret=True)
    refs = [rans_np.encode(d, order=0, n_lanes=N) for d in datas]
    assert outs == refs


def test_device_rans_batched_pipeline(tmp_path):
    """GXZ_DEVICE_RANS batch mode: a VB's big order-0 sections encode and
    decode through one kernel launch each; archives stay format-identical."""
    import os
    from genozip_tpu import codecs
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    from tests.test_roundtrip import synth_fastq
    old = (codecs._JAX_MIN_SIZE, codecs._DEVICE_BATCH)
    try:
        codecs.enable_device_rans(32 * 1024)
        data = synth_fastq(n_reads=3000)
        src = os.path.join(str(tmp_path), "d.fastq")
        open(src, "wb").write(data)
        z = src + ".gxz"
        zip_file(src, z, vb_size=256 * 1024)
        # archives decode with the plain host path too
        codecs._JAX_MIN_SIZE, codecs._DEVICE_BATCH = 1 << 62, False
        piz_file(z, src + ".host.out")
        assert open(src + ".host.out", "rb").read() == data
        # and with the batched device path
        codecs.enable_device_rans(32 * 1024)
        piz_file(z, src + ".dev.out")
        assert open(src + ".dev.out", "rb").read() == data
    finally:
        codecs._JAX_MIN_SIZE, codecs._DEVICE_BATCH = old


@pytest.mark.parametrize("N,S", [(256, 8), (1024, 8)])
def test_pallas_order1_interpret(N, S):
    """Order-1 (MXU context-table) kernels: byte-identical encode, exact
    decode."""
    data = RNG.choice(np.frombuffer(b"FFFFF:F,#", np.uint8),
                      150000).astype(np.uint8).tobytes()
    ref = rans_np.encode(data, order=1, n_lanes=N)
    assert rans_pallas.encode_order1(data, n_lanes=N, S=S,
                                     interpret=True) == ref
    assert rans_pallas.decode_order1(ref, S=S, interpret=True) == data


def test_pallas_order1_many_interpret():
    """Batched order-1 kernels: byte-identical encode, exact decode."""
    N = 256
    datas = [RNG.choice(np.frombuffer(b"FFFFF:F,#", np.uint8),
                        n).astype(np.uint8).tobytes()
             for n in (40000, 0, 1, 90001)]
    outs = rans_pallas.encode_many_o1(datas, n_lanes=N, S=8, interpret=True)
    refs = [rans_np.encode(d, order=1, n_lanes=N) for d in datas]
    assert outs == refs
    assert rans_pallas.decode_many_o1(refs, S=8, interpret=True) == datas


def test_decode_v4_v5_interpret():
    """Two-level-lookup (v4) and per-step-window (v5) kernels, bit-exact
    vs the spec in interpret mode (hardware numbers in the module
    docstring)."""
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(7)
    data = rng.choice(np.frombuffer(b"FFFFF:F,#AB!x", np.uint8),
                      100000).tobytes()
    for N in (256, 1024):
        e = rans_np.encode(data, order=0, n_lanes=N)
        assert rans_pallas.decode(e, interpret=True, S=8, v4=True) == data
        assert rans_pallas.decode(e, interpret=True, S=8, v5=True) == data
        assert rans_pallas.decode(e, interpret=True, S=8) == data  # default


def test_decode_many_v6_interpret():
    """v6 stacked-state multi-stream decode: bit-exact vs rans_np, full and
    partial groups, mixed sizes (incl. empty-block edge rows)."""
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(17)
    sizes = (5000, 100000, 37, 60000, 1, 24000, 9999, 3456)
    datas = [rng.choice(np.frombuffer(b"FFFF:F,#ABx", np.uint8), sz)
             .astype(np.uint8).tobytes() for sz in sizes]
    bufs = [rans_np.encode(d, order=0, n_lanes=256) for d in datas]
    outs = rans_pallas.decode_many_v6(bufs, S=4, R=8, interpret=True)
    assert all(o == d for o, d in zip(outs, datas))
    outs = rans_pallas.decode_many_v6(bufs[:3], S=4, R=8, interpret=True)
    assert all(o == d for o, d in zip(outs, datas[:3]))


def test_decode_many_o1_v6_interpret():
    """o1 v6: palette-compacted rank-space decode, bit-exact vs rans_np."""
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(23)
    datas = []
    for i, sz in enumerate((40000, 2000, 1, 90000, 333, 7777, 64, 12000)):
        alpha = b"FFFF:F,#" if i % 2 else b"ABCDEFGHIJKLMNOP#!:,"
        datas.append(rng.choice(np.frombuffer(alpha, np.uint8), sz)
                     .astype(np.uint8).tobytes())
    bufs = [rans_np.encode(d, order=1, n_lanes=256) for d in datas]
    outs = rans_pallas.decode_many_o1_v6(bufs, S=4, R=8, interpret=True)
    assert outs is not None
    assert all(o == d for o, d in zip(outs, datas))
    # >128-symbol alphabet -> None (fallback contract)
    big = bytes(rng.integers(0, 256, 30000, dtype=np.uint8))
    assert rans_pallas.decode_many_o1_v6(
        [rans_np.encode(big, order=1, n_lanes=256)], interpret=True) is None


def test_encode_many_v6_interpret():
    """Stacked-state multi-stream encode: byte-identical to rans_np."""
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(29)
    datas = [rng.choice(np.frombuffer(b"FFFF:F,#ABx", np.uint8), sz)
             .astype(np.uint8).tobytes()
             for sz in (5000, 60000, 37, 1, 24000, 3456)]
    outs = rans_pallas.encode_many_v6(datas, n_lanes=256, S=4, R=8,
                                      interpret=True)
    for d, o in zip(datas, outs):
        assert o == rans_np.encode(d, order=0, n_lanes=256)


def test_encode_many_o1_v6_interpret():
    """Stacked palette order-1 encode: byte-identical to rans_np."""
    from genozip_tpu.ops import rans_np, rans_pallas
    rng = np.random.default_rng(41)
    datas = [rng.choice(np.frombuffer(b"FFFF:F,#", np.uint8), sz)
             .astype(np.uint8).tobytes() for sz in (5000, 60000, 37, 1)]
    outs = rans_pallas.encode_many_o1_v6(datas, n_lanes=256, S=4, R=8,
                                         interpret=True)
    assert outs is not None
    for d, o in zip(datas, outs):
        assert o == rans_np.encode(d, order=1, n_lanes=256)
