"""Backward compatibility: archives written by the ROUND-4 code must keep
decoding byte-exactly on current code (the reference's
batch_backward_compatability culture, test.sh:1216 — format evolution may
add paths, never strand old archives). Fixtures in tests/fixtures/backcomp
were produced by the r4 tree (commit 621a9a0) with pinned seeds."""

import os

import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "backcomp")


@pytest.mark.parametrize("name", ["r4.fastq", "r4.sam", "r4.vcf"])
def test_round4_archive_still_decodes(name):
    from genozip_tpu.piz_pipeline import piz_file
    z = os.path.join(FIX, name + ".gxz")
    raw = open(os.path.join(FIX, name), "rb").read()
    out = z + ".out"
    piz_file(z, out)
    got = open(out, "rb").read()
    os.unlink(out)
    assert got == raw, f"{name}: r4 archive decodes differently"


def test_round4_archive_filters_work():
    """genocat-class filters must also work on old archives."""
    from genozip_tpu.piz_pipeline import PizReader
    z = os.path.join(FIX, "r4.fastq.gxz")
    pr = PizReader(z)
    assert pr.file_hdr["num_lines"] > 0
    assert pr.read_vb(1)  # first VB reconstructs
    pr.close()
