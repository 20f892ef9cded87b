"""FASTQ DESC structure: saux barcode split (src/fastq_desc.c,
src/fastq_saux.c) and embedded seq_len elision (qname_flavors.h)."""

import numpy as np

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file
from genozip_tpu.datatypes.fastq import FastqDT

RNG = np.random.default_rng(99)
BASES = np.frombuffer(b"ACGT", np.uint8)


def make_saux_fastq(n=600, dual=False):
    out = []
    for i in range(n):
        rl = 120
        bar = RNG.choice(BASES, 8).tobytes()
        if dual:
            bar += b"+" + RNG.choice(BASES, 8).tobytes()
        seq = RNG.choice(BASES, rl).tobytes()
        out.append(b"@SIM:1:FCX:1:15:%d:%d 1:N:0:%s\n%s\n+\n%s\n" % (
            6329 + i, 1045 + 7 * i, bar, seq, b"F" * rl))
    return b"".join(out)


def make_len_fastq(n=500):
    out = []
    for i in range(n):
        rl = int(RNG.integers(80, 300))
        seq = RNG.choice(BASES, rl).tobytes()
        out.append(b"@SRR0012.%d %d length=%d\n%s\n+\n%s\n" % (
            i + 1, i + 1, rl, seq, b"F" * rl))
    return b"".join(out)


def _roundtrip(tmp_path, payload, name):
    src = tmp_path / (name + ".fastq")
    src.write_bytes(payload)
    z = tmp_path / (name + ".gxz")
    out = tmp_path / (name + ".out")
    zip_file(str(src), str(z))
    piz_file(str(z), str(out))
    assert out.read_bytes() == payload


def test_saux_barcode_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_saux_fastq(), "saux")


def test_saux_dual_barcode_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_saux_fastq(dual=True), "dual")


def test_seqlen_elision_roundtrip(tmp_path):
    _roundtrip(tmp_path, make_len_fastq(), "len")


def test_saux_contexts_engage():
    payload = make_saux_fastq(200)
    dt = FastqDT()
    res = dt.seg_vb(np.frombuffer(payload, np.uint8))
    assert "SAUXB" in res.ctxs            # barcode stream split out
    assert len(res.ctxs["SAUXB"].local) == 200 * 8
    # the SAUX head template is tiny (one word), not per-read
    assert len(res.ctxs["SAUX"].vb_words) <= 2


def test_seqlen_ctx_elided():
    payload = make_len_fastq(200)
    dt = FastqDT()
    res = dt.seg_vb(np.frombuffer(payload, np.uint8))
    elided = [c for c in res.ctxs.values() if c.special == "seqlen"]
    assert len(elided) == 1 and elided[0].local.shape[0] == 0


def test_mixed_desc_no_space_fallback(tmp_path):
    """Rows without a comment must fall back to the plain DESC path."""
    rows = []
    for i in range(120):
        rl = 60
        seq = RNG.choice(BASES, rl).tobytes()
        d = b"@r%d 1:N:0:ACGTAC" % i if i % 2 else b"@r%d" % i
        rows.append(b"%s\n%s\n+\n%s\n" % (d, seq, b"F" * rl))
    _roundtrip(tmp_path, b"".join(rows), "mixed")


def test_zero_padded_qnames_roundtrip(tmp_path):
    """BGI-style zero-padded fixed-width name fields must tokenize (width
    stream) and round-trip exactly — the qname_flavors.h fixed-width item
    role (scripts/qname_audit.py keeps the ratio evidence)."""
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    rng = np.random.default_rng(8)
    rows = []
    t = 0
    for i in range(3000):
        t += int(rng.integers(1, 9))
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 60)
        q = (rng.integers(0, 40, 60) + 33).astype(np.uint8)
        rows.append(b"@E100016092L1C%03dR%03d%07d\n%s\n+\n%s\n"
                    % (1, 1 + t // 999999, t % 999999,
                       s.tobytes(), q.tobytes()))
    # mixed pad widths + bare zeros + >18-digit literals
    rows.append(b"@x007y0z00000000000000000000123\nACGT\n+\nFFFF\n")
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "bgi.fastq")
    open(src, "wb").write(data)
    zip_file(src, src + ".gxz", vb_size=64 * 1024)
    piz_file(src + ".gxz", src + ".out")
    assert open(src + ".out", "rb").read() == data
