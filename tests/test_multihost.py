"""Multi-host (multi-process, jax.distributed) ZIP: the archive produced by
N processes — seg striped across processes, dict-merge collective over the
process boundary, rank-0 ordered assembly — must be byte-identical to the
single-process zip_file archive (SURVEY §7.6 / BASELINE.md "N >= 2 hosts")."""

import os

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file


@pytest.mark.slow
def test_multihost_zip_byte_identity(tmp_path):
    rng = np.random.default_rng(5)
    reads = []
    for i in range(4000):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 120)
        q = (rng.integers(0, 40, 120) + 33).astype(np.uint8)
        reads.append(b"@mh%d\n%s\n+\n%s\n" % (i, s.tobytes(), q.tobytes()))
    src = os.path.join(str(tmp_path), "mh.fastq")
    open(src, "wb").write(b"".join(reads))
    z_host = src + ".host.gxz"
    z_mh = src + ".mh.gxz"
    zip_file(src, z_host, vb_size=128 * 1024)
    from genozip_tpu.parallel.multihost import zip_file_multihost
    zip_file_multihost(src, z_mh, n_procs=2, vb_size=128 * 1024)
    assert open(z_mh, "rb").read() == open(z_host, "rb").read()
    out = src + ".out"
    piz_file(z_mh, out)
    assert open(out, "rb").read() == b"".join(reads)
