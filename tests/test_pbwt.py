import numpy as np

from genozip_tpu.ops import pbwt

RNG = np.random.default_rng(5)


def synth_haplotypes(n=300, H=200):
    """Correlated genotype matrix (haplotypes share ancestry blocks)."""
    founders = RNG.integers(0, 2, (8, n)).astype(np.uint8)
    assign = RNG.integers(0, 8, H)
    A = founders[assign].T.copy()  # (n, H)
    flips = RNG.random((n, H)) < 0.01
    A[flips] ^= 1
    return A


def test_pbwt_roundtrip():
    A = synth_haplotypes()
    Y = pbwt.pbwt_encode(A)
    back = pbwt.pbwt_decode(Y)
    assert (back == A).all()


def test_pbwt_improves_runs():
    A = synth_haplotypes()
    Y = pbwt.pbwt_encode(A)
    runs = lambda M: int((M.reshape(-1)[1:] != M.reshape(-1)[:-1]).sum())
    assert runs(Y) < runs(A) * 0.6


def test_pbwt_jnp_matches():
    import jax.numpy as jnp
    A = synth_haplotypes(100, 64)
    Y = pbwt.pbwt_encode(A)
    Yj = np.asarray(pbwt.pbwt_encode_jnp(jnp.asarray(A)))
    assert (Y == Yj).all()
    Aj = np.asarray(pbwt.pbwt_decode_jnp(jnp.asarray(Yj)))
    assert (Aj == A).all()


def test_pbwt_multiallelic():
    A = RNG.integers(0, 11, (50, 30)).astype(np.uint8)
    assert (pbwt.pbwt_decode(pbwt.pbwt_encode(A)) == A).all()


def test_native_matches_python():
    from genozip_tpu import native
    if not native.available():
        return
    A = synth_haplotypes(200, 150)
    # compare native against the pure-python reference implementation
    n, H = A.shape
    perm = np.arange(H)
    Ypy = np.empty_like(A)
    for i in range(n):
        y = A[i][perm]
        Ypy[i] = y
        perm = perm[np.argsort(y, kind="stable")]
    Yn = native.pbwt_encode(A)
    assert (Yn == Ypy).all()
    assert (native.pbwt_decode(Yn) == A).all()
