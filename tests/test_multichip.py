"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
encode step (psum'd histogram = collective stats merge) and the 2D-sharded
aligner (mp-sharded refhash + genome slabs) must agree with the host
reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import pytest

from genozip_tpu.parallel.flagship import make_mesh, make_sharded_step, example_batch
from genozip_tpu.parallel import aligner_sharded
from genozip_tpu.ref import refstore, aligner as host_aligner
from genozip_tpu.ops import pack as packops
from genozip_tpu.utils import ragged
from genozip_tpu.utils.ragged import Col
from tests.test_aligner import synth_genome, sample_reads


def test_sharded_encode_step():
    mesh = make_mesh(8)
    step = make_sharded_step(mesh)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    seq, qual, _, _ = example_batch(reads=64 * dp, read_len=64 * sp)
    xs = jax.device_put(jnp.asarray(seq), NamedSharding(mesh, P("dp", "sp")))
    xq = jax.device_put(jnp.asarray(qual), NamedSharding(mesh, P("dp", "sp")))
    out = step(xs, xq)
    jax.block_until_ready(out)
    assert int(out[-1]) > 0


def test_sharded_aligner_matches_host():
    fa = synth_genome(120000, 1)
    ref = refstore.fasta_to_genome(fa, hash_bits=20)
    reads = sample_reads(ref, n_reads=64, read_len=96, mut_rate=0.005)
    col = Col.from_list(reads)
    mat, lens = ragged.to_matrix(col)
    L = mat.shape[1]
    codes = packops.BASE2BIT[mat]

    host = host_aligner.align_batch(ref, codes, lens)

    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(np.asarray(devs).reshape(2, 4), ("dp", "mp"))
    slabs, starts, rh = aligner_sharded.shard_genome(ref, 4, L)
    step = aligner_sharded.make_sharded_aligner(mesh, L, ref.hash_bits)
    gpos, fwd, nmm, aligned = jax.block_until_ready(step(
        jnp.asarray(codes), jnp.asarray(lens.astype(np.int32)),
        jnp.asarray(slabs), jnp.asarray(starts.astype(np.int32)),
        jnp.asarray(rh), jnp.asarray([ref.length], np.int32)))

    aligned = np.asarray(aligned)
    # the sharded aligner must align essentially everything the host did
    assert aligned.mean() >= np.asarray(host["aligned"]).mean() - 0.02
    both = aligned & host["aligned"]
    # where both align, placements agree (same candidate set, same scoring)
    assert (np.asarray(gpos)[both] == host["gpos"][both]).mean() > 0.98


def test_mesh_fastq_zip_roundtrip(tmp_path):
    """End-to-end FASTQ zip with --mesh (MeshAligner over the virtual
    8-device mesh) must round-trip and actually align most reads."""
    import os
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file, PizReader

    fa = synth_genome(150000, 1)
    fa_path = os.path.join(str(tmp_path), "mg.fa")
    open(fa_path, "wb").write(fa)
    ref_path = os.path.join(str(tmp_path), "mg.ref.gxz")
    refstore.make_reference(fa_path, ref_path)
    ref = refstore.load_ref_file(ref_path)

    reads = sample_reads(ref, n_reads=1200, read_len=100, mut_rate=0.005)
    out = []
    rng = np.random.default_rng(4)
    for i, r in enumerate(reads):
        q = rng.choice(np.frombuffer(b"FF:,#", np.uint8), len(r)).tobytes()
        out.append(b"@M%d\n" % i + r + b"\n+\n" + q + b"\n")
    data = b"".join(out)
    src = os.path.join(str(tmp_path), "m.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, reference=ref_path, mesh=8)
    o = src + ".out"
    piz_file(z, o, reference=ref_path)
    assert open(o, "rb").read() == data
    # most reads must have gone through the sharded aligner successfully
    pr = PizReader(z, reference=ref_path)
    loaded = pr.load_vb(1, 0)
    sec = loaded[1]
    bm = sec["SQBITMAP"]["local"][0]
    assert bm.astype(bool).mean() > 0.9, f"aligned {bm.mean():.2f}"
    pr.close()
