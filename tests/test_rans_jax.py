"""JAX rANS must be bit-exact with the numpy reference model and interoperable
both directions (np-encode → jax-decode, jax-encode → np-decode)."""

import numpy as np
import pytest

from genozip_tpu.ops import rans_np, rans_jax

RNG = np.random.default_rng(1)


def cases():
    yield bytes(RNG.integers(0, 256, 1000).astype(np.uint8))
    yield bytes(RNG.integers(0, 4, 50000).astype(np.uint8))
    q = RNG.choice(np.frombuffer(b"FFFFF:F,#", np.uint8), 70001)
    yield bytes(q.astype(np.uint8))
    yield b"x" * 2048
    yield bytes(RNG.integers(0, 256, 33).astype(np.uint8))


@pytest.mark.parametrize("order", [0, 1])
def test_bit_exact_and_interop(order):
    for data in cases():
        e_np = rans_np.encode(data, order=order)
        e_jx = rans_jax.encode(data, order=order)
        assert e_np == e_jx, f"streams differ order={order} len={len(data)}"
        assert rans_jax.decode(e_np) == data
        assert rans_np.decode(e_jx) == data
