"""Determinism discipline (reference test.sh:652 single-thread batch +
SURVEY §5): the archive bytes must not depend on worker count, thread
scheduling, or repetition — byte-equality across configurations is the
race detector."""

import os

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file


def _corpus(tmp_path):
    rng = np.random.default_rng(77)
    rows = []
    p = 1
    for i in range(3000):
        p += int(rng.integers(1, 40))
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 90)
        q = (rng.integers(0, 40, 90) + 33).astype(np.uint8)
        if i % 13 == 4:
            rows.append(b"d%d\t256\tc1\t%d\t0\t90M\t*\t0\t0\t*\t*\n" % (i, p))
        else:
            rows.append(b"d%d\t0\tc1\t%d\t60\t90M\t*\t0\t0\t%s\t%s\t"
                        b"NM:i:0\tAS:i:88\n" % (i, p, s.tobytes(),
                                                q.tobytes()))
    src = os.path.join(str(tmp_path), "det.sam")
    open(src, "wb").write(b"@HD\tVN:1.6\tSO:coordinate\n"
                          b"@SQ\tSN:c1\tLN:200000\n" + b"".join(rows))
    return src


def test_archive_bytes_thread_invariant(tmp_path):
    """1 worker == 4 workers == 8 workers, byte for byte (the dict merge,
    codec commitment and gencomp orderings are all by-construction
    deterministic — this is the regression net over all of them)."""
    src = _corpus(tmp_path)
    blobs = []
    for w in (1, 4, 8):
        z = f"{src}.{w}.gxz"
        zip_file(src, z, vb_size=64 * 1024, threads=w)
        blobs.append(open(z, "rb").read())
    assert blobs[0] == blobs[1] == blobs[2]


def test_archive_bytes_repeat_invariant(tmp_path):
    """Two runs of the same zip produce identical bytes (no wall-clock or
    randomness leaks into codec choice or section ordering)."""
    src = _corpus(tmp_path)
    zip_file(src, src + ".a.gxz", vb_size=64 * 1024)
    zip_file(src, src + ".b.gxz", vb_size=64 * 1024)
    assert open(src + ".a.gxz", "rb").read() == \
        open(src + ".b.gxz", "rb").read()
