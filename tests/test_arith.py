"""ARITH-W32 wide-interleaved adaptive range coder (reference parity:
src/htscodecs/arith_dynamic.c + c_range_coder.h + c_simple_model.h —
redesigned as N lockstep carryless lanes sharing one batch-updated model;
spec ops/arith_np.py, native twin gxz_native.cpp)."""

import numpy as np
import pytest

from genozip_tpu.ops import arith_np
from genozip_tpu import native

RNG = np.random.default_rng(7)


def corpora():
    return {
        "qual": RNG.choice(np.frombuffer(b"FFF:,#", np.uint8), 120000),
        "text": np.frombuffer(b"chr1\t123\trs1\tA\tG\t50\tPASS\t" * 4000,
                              np.uint8),
        "rand": RNG.integers(0, 256, 60000).astype(np.uint8),
        "runs": np.repeat(RNG.integers(0, 4, 500).astype(np.uint8) * 60,
                          RNG.integers(1, 60, 500)),
        "empty": np.zeros(0, np.uint8),
        "one": np.frombuffer(b"Q", np.uint8),
        "lane-edge": RNG.integers(0, 9, 16 * 7 + 3).astype(np.uint8),
    }


@pytest.mark.parametrize("order", [0, 1])
def test_spec_roundtrip(order):
    for name, a in corpora().items():
        blob = arith_np.encode(a, order=order)
        out = np.frombuffer(arith_np.decode(blob), np.uint8)
        assert out.shape == a.shape and (out == a).all(), name


@pytest.mark.parametrize("order", [0, 1])
def test_native_bit_exact(order):
    if not native.available():
        pytest.skip("native lib unavailable")
    for name, a in corpora().items():
        bn = native.arith_encode(a.tobytes(), order)
        bp = arith_np.encode(a, order=order)
        assert bn == bp, f"{name}: native encode differs from spec"
        assert native.arith_decode(bp) == a.tobytes(), name
        assert arith_np.decode(bn) == a.tobytes(), name


@pytest.mark.parametrize("order", [0, 1])
def test_jax_twin_bit_exact(order):
    from genozip_tpu.ops import arith_jax
    for name, a in corpora().items():
        if a.shape[0] > 60000:
            a = a[:60000]  # keep CPU-jax scan time bounded
        bj = arith_jax.encode(a, order=order)
        bp = arith_np.encode(a, order=order)
        assert bj == bp, f"{name}: jax encode differs from spec"
        assert arith_jax.decode(bp) == a.tobytes(), name


def test_adaptivity_beats_static_on_drifting_stream():
    """A stream whose distribution drifts over time: the adaptive coder must
    beat static-table rANS (the whole point of arith_dynamic)."""
    from genozip_tpu.ops import rans_np
    parts = []
    for i in range(12):
        syms = np.frombuffer(b"ABCDEFGHIJKLMNOP", np.uint8)[i:i + 4]
        parts.append(RNG.choice(syms, 20000,
                                p=[0.7, 0.2, 0.07, 0.03]))
    a = np.concatenate(parts)
    adaptive = len(arith_np.encode(a, order=0))
    static = len(rans_np.encode(a, order=0))
    assert adaptive < static


def test_codec_registry_arith():
    from genozip_tpu import codecs
    a = RNG.choice(np.frombuffer(b"IIIFF:#", np.uint8), 50000).tobytes()
    for cid in (codecs.ARITH0, codecs.ARITH1):
        blob = codecs.compress(a, cid)
        assert codecs.decompress(blob, cid, len(a)) == a
        assert len(blob) < len(a) // 2
