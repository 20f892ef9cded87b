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
