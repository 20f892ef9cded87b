#!/usr/bin/env python
"""Multi-device scaling harness: runs the sharded VB-encode step and the
2D-sharded aligner on growing meshes and reports MB/s + scaling efficiency.

On real multi-chip hardware this measures ICI scaling; on a single-chip or
CPU host it uses virtual devices (set XLA_FLAGS=--xla_force_host_platform_
device_count=N JAX_PLATFORMS=cpu) — the collectives are real, the absolute
numbers are not. Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

if "--virtual" in sys.argv or os.environ.get("JAX_PLATFORMS") != "axon":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def bench_encode(n_devices: int, reads=8192, read_len=256, iters=5):
    from genozip_tpu.parallel.flagship import (
        make_mesh, make_sharded_step, example_batch)
    mesh = make_mesh(n_devices)
    step = make_sharded_step(mesh)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    reads = reads // dp * dp
    read_len = read_len // sp * sp
    seq, qual, _, _ = example_batch(reads=reads, read_len=read_len)
    xs = jax.device_put(jnp.asarray(seq), NamedSharding(mesh, P("dp", "sp")))
    xq = jax.device_put(jnp.asarray(qual), NamedSharding(mesh, P("dp", "sp")))
    jax.block_until_ready(step(xs, xq))  # compile
    t0 = time.time()
    for _ in range(iters):
        out = step(xs, xq)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    mb = reads * read_len * 2 / 1e6  # seq + qual bytes
    return mb / dt


def main():
    devs = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= devs]
    base = None
    for n in sizes:
        mbps = bench_encode(n)
        if base is None:
            base = mbps
        eff = mbps / (base * n)
        print(json.dumps({"devices": n, "encode_MBps": round(mbps, 1),
                          "scaling_eff": round(eff, 3)}))


if __name__ == "__main__":
    main()
