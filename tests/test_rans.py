"""rANS codec round-trip tests (numpy reference model).

The reference implementation tests codecs only through end-to-end file round-trips
(reference src/test.sh); we additionally unit-test the coder directly since it is
the re-designed core (reference: src/htscodecs/rANS_static4x16pr.c is 4-lane;
ours is wide-interleaved, see genozip_tpu/ops/rans_np.py docstring).
"""

import numpy as np
import pytest

from genozip_tpu.ops import rans_np


RNG = np.random.default_rng(0)


def cases():
    yield b""
    yield b"A"
    yield b"AAAA"
    yield bytes(RNG.integers(0, 256, 10).astype(np.uint8))
    yield bytes(RNG.integers(0, 256, 1000).astype(np.uint8))
    yield bytes(RNG.integers(0, 4, 100000).astype(np.uint8))  # skewed
    yield bytes(np.full(65536, 7, dtype=np.uint8))  # single symbol
    yield bytes(RNG.choice(np.frombuffer(b"ACGT", np.uint8), 257).astype(np.uint8))
    # qual-like: few symbols, heavy skew
    q = RNG.choice(np.frombuffer(b"FFFFF:F,#", np.uint8), 123457)
    yield bytes(q.astype(np.uint8))
    # sizes straddling lane-count boundaries
    for n in (31, 32, 33, 2047, 2048, 2049, 8191, 8192 * 3 + 5):
        yield bytes(RNG.integers(0, 256, n).astype(np.uint8))


@pytest.mark.parametrize("order", [0, 1])
def test_roundtrip(order):
    for data in cases():
        enc = rans_np.encode(data, order=order)
        dec = rans_np.decode(enc)
        assert dec == bytes(data), f"order={order} len={len(data)}"


def test_compresses_skewed():
    data = bytes(RNG.choice(np.frombuffer(b"FFFFFFFF:F,#", np.uint8), 1 << 18).astype(np.uint8))
    enc = rans_np.encode(data, order=0)
    assert len(enc) < len(data) * 0.5


def test_order1_beats_order0_on_markov():
    # strongly autocorrelated stream
    n = 1 << 17
    steps = RNG.integers(-1, 2, n)
    data = (np.cumsum(steps) % 8 + 60).astype(np.uint8)
    e0 = rans_np.encode(bytes(data), order=0)
    e1 = rans_np.encode(bytes(data), order=1)
    assert len(e1) < len(e0)
    assert rans_np.decode(e1) == bytes(data)


def test_native_simd_matches_np_spec():
    """The AVX-512 coder must produce byte-identical streams to the numpy
    spec (cross-implementation decode compatibility rests on this).
    Includes the dominant-symbol shape that exposed an inexact 32-bit
    reciprocal (q != x/f at x ~ 2.8e9 for f=3771) before the switch to the
    Granlund-Montgomery 33-bit magic."""
    from genozip_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(8)
    payloads = []
    # dominant-qual: one symbol at ~92% -> freq near the 4096 ceiling
    q = np.full(20000, 70, np.uint8)
    exc = rng.random(20000) < 0.08
    q[exc] = rng.choice(np.frombuffer(b":,#AB", np.uint8), int(exc.sum()))
    payloads.append(q.tobytes())
    payloads.append(b"A" * 50000)                        # single symbol
    payloads.append(rng.integers(0, 256, 100000, dtype=np.uint8).tobytes())
    for nsym in (2, 5, 16, 64):
        p = rng.random(nsym); p /= p.sum()
        syms = rng.choice(256, nsym, replace=False).astype(np.uint8)
        payloads.append(rng.choice(syms, 77777, p=p).tobytes())
    for n in (1023, 1024, 1025, 16384):                  # SIMD gate edges
        payloads.append(rng.integers(0, 8, n, dtype=np.uint8).tobytes())
    for data in payloads:
        for order in (0, 1):
            e_np = rans_np.encode(data, order=order)
            e_nat = native.rans_encode(data, order)
            assert e_nat == e_np, (len(data), order)
            assert native.rans_decode(e_np)[:len(data)] == data
