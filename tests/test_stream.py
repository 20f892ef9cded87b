"""External input bridges (reference stream.c:248 / file.c:560,660 /
url.c): CRAM/BCF/URL plumbing exercised via PATH shims (the real tools
are absent in this zero-egress image — absence must raise clearly)."""

import os
import stat

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file


def make_shim(dirpath, name, fixture):
    sh = os.path.join(dirpath, name)
    with open(sh, "w") as f:
        f.write(f"#!/bin/sh\ncat {fixture}\n")
    os.chmod(sh, os.stat(sh).st_mode | stat.S_IEXEC)
    return sh


def test_cram_bridge_via_shim(tmp_path, monkeypatch):
    rng = np.random.default_rng(4)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:9000\n"]
    for i in range(300):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 50).tobytes()
        rows.append(b"c%d\t0\tc1\t%d\t60\t50M\t*\t0\t0\t%s\t%s\n"
                    % (i, 10 + i, s, b"F" * 50))
    sam = b"".join(rows)
    fixture = os.path.join(str(tmp_path), "fix.sam")
    open(fixture, "wb").write(sam)
    make_shim(str(tmp_path), "samtools", fixture)
    monkeypatch.setenv("PATH", str(tmp_path) + os.pathsep +
                       os.environ["PATH"])
    cram = os.path.join(str(tmp_path), "in.cram")
    open(cram, "wb").write(b"CRAM")   # content irrelevant: shim decodes
    z = cram + ".gxz"
    zip_file(cram, z)
    piz_file(z, cram + ".out")
    assert open(cram + ".out", "rb").read() == sam


def test_bcf_bridge_via_shim(tmp_path, monkeypatch):
    vcf = (b"##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
           b"FILTER\tINFO\n" +
           b"".join(b"chr1\t%d\t.\tA\tG\t50\tPASS\t.\n" % (100 + i)
                    for i in range(500)))
    fixture = os.path.join(str(tmp_path), "fix.vcf")
    open(fixture, "wb").write(vcf)
    make_shim(str(tmp_path), "bcftools", fixture)
    monkeypatch.setenv("PATH", str(tmp_path) + os.pathsep +
                       os.environ["PATH"])
    bcf = os.path.join(str(tmp_path), "in.bcf")
    open(bcf, "wb").write(b"BCF")
    z = bcf + ".gxz"
    zip_file(bcf, z)
    piz_file(z, bcf + ".out")
    assert open(bcf + ".out", "rb").read() == vcf


def test_missing_tool_raises_clearly(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")
    cram = os.path.join(str(tmp_path), "x.cram")
    open(cram, "wb").write(b"CRAM")
    with pytest.raises(AssertionError, match="samtools"):
        zip_file(cram, cram + ".gxz")


def test_cram_output_via_shim(tmp_path, monkeypatch):
    """cat --cram: SAM archive piped through `samtools view -C` (shimmed:
    the fake samtools copies stdin to the -o target with a CRAM marker)."""
    import subprocess
    sh = os.path.join(str(tmp_path), "samtools")
    with open(sh, "w") as f:
        f.write("#!/bin/sh\n"
                "out=''\n"
                "while [ $# -gt 0 ]; do\n"
                "  if [ \"$1\" = '-o' ]; then out=$2; shift; fi\n"
                "  shift\n"
                "done\n"
                "printf 'CRAMSHIM' > \"$out\"\n"
                "cat >> \"$out\"\n")
    os.chmod(sh, os.stat(sh).st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", str(tmp_path) + os.pathsep +
                       os.environ["PATH"])
    rng = np.random.default_rng(6)
    rows = [b"@HD\tVN:1.6\n@SQ\tSN:c1\tLN:9000\n"]
    for i in range(100):
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 50).tobytes()
        rows.append(b"r%d\t0\tc1\t%d\t60\t50M\t*\t0\t0\t%s\t%s\n"
                    % (i, 10 + i, s, b"F" * 50))
    sam = b"".join(rows)
    src = os.path.join(str(tmp_path), "x.sam")
    open(src, "wb").write(sam)
    z = src + ".gxz"
    zip_file(src, z)
    out = os.path.join(str(tmp_path), "x.cram")
    rc = subprocess.run(
        [os.sys.executable, "-m", "genozip_tpu", "cat", z,
         "--cram", "-o", out],
        env={**os.environ, "PATH": str(tmp_path) + os.pathsep
             + os.environ["PATH"], "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo").returncode
    assert rc == 0
    blob = open(out, "rb").read()
    assert blob.startswith(b"CRAMSHIM")
    assert blob[8:] == sam          # full SAM text crossed the pipe
