"""Positional Burrows-Wheeler transform for haplotype matrices.

Reference parity: src/codec_pbwt.c (PBWT permutation of the VCF genotype
matrix). Durbin's algorithm: haplotypes are kept sorted by reverse-prefix;
each variant row is emitted in the current permutation order (long runs of
equal alleles — ideal for RLE+rANS), then the permutation is refined by a
stable counting sort on the emitted alleles. The row loop is a scan — the
device twin maps it onto lax.scan; host numpy version below vectorizes over
haplotypes within each row.
"""

import numpy as np


def pbwt_encode(A: np.ndarray) -> np.ndarray:
    """A: (n_variants, H) uint8 allele matrix (values 0..255).
    Returns Y: (n, H) — rows permuted by the evolving PBWT order."""
    from .. import native
    if native.available():
        return native.pbwt_encode(A)
    n, H = A.shape
    perm = np.arange(H, dtype=np.int64)
    Y = np.empty_like(A)
    for i in range(n):
        y = A[i][perm]
        Y[i] = y
        # stable counting sort of perm by y (argsort stable keeps PBWT order)
        perm = perm[np.argsort(y, kind="stable")]
    return Y


def pbwt_decode(Y: np.ndarray) -> np.ndarray:
    from .. import native
    if native.available():
        return native.pbwt_decode(Y)
    n, H = Y.shape
    perm = np.arange(H, dtype=np.int64)
    A = np.empty_like(Y)
    for i in range(n):
        y = Y[i]
        A[i][perm] = y
        perm = perm[np.argsort(y, kind="stable")]
    return A


def pbwt_encode_jnp(A):
    """Device twin: lax.scan over variant rows (perm as carry)."""
    import jax
    import jax.numpy as jnp
    n, H = A.shape

    def step(perm, row):
        y = row[perm]
        order = jnp.argsort(y, stable=True)
        return perm[order], y

    _, Y = jax.lax.scan(step, jnp.arange(H), A)
    return Y


def pbwt_decode_jnp(Y):
    import jax
    import jax.numpy as jnp
    n, H = Y.shape

    def step(perm, y):
        row = jnp.zeros_like(y).at[perm].set(y)
        order = jnp.argsort(y, stable=True)
        return perm[order], row

    _, A = jax.lax.scan(step, jnp.arange(H), Y)
    return A
