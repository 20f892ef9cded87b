"""REF_EXT_STORE (--store-reference / --REFERENCE): used genome ranges
embedded in the archive so unzip needs no external .ref file (reference
src/reference.c REF_EXT_STORE, src/flags.h:16-21)."""

import numpy as np

from genozip_tpu.ref import refstore
from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file
from genozip_tpu.ops import pack as packops

RNG = np.random.default_rng(31)


def synth_genome(n, n_contigs=1):
    """Local copy (test_aligner's version consumes its module RNG, which
    would perturb order-dependent draws in other test files)."""
    parts = []
    for i in range(n_contigs):
        seq = RNG.choice(np.frombuffer(b"ACGT", np.uint8),
                         n // n_contigs).tobytes()
        lines = [b">ctg%d test\n" % i]
        for j in range(0, len(seq), 70):
            lines.append(seq[j:j + 70] + b"\n")
        parts.append(b"".join(lines))
    return b"".join(parts)


def _make_ref(tmp_path, n=200000):
    fa = synth_genome(n, n_contigs=1)
    fa_p = tmp_path / "g.fa"
    fa_p.write_bytes(fa)
    ref = refstore.fasta_to_genome(fa)
    rp = tmp_path / "g.ref.gxz"
    refstore.make_reference(str(fa_p), str(rp))
    return ref, str(rp)


def make_sam(ref, n=800):
    out = [b"@HD\tVN:1.6\n@SQ\tSN:ctg0\tLN:%d\n" % ref.length]
    for i in range(n):
        p = int(RNG.integers(0, 40000))  # only the genome head is used
        rl = 100
        seq = packops.ACGT[ref.codes[p:p + rl]].tobytes()
        out.append(b"r%d\t0\tctg0\t%d\t60\t%dM\t*\t0\t0\t%s\t%s\n" % (
            i, p + 1, rl, seq, b"F" * rl))
    return b"".join(out)


def test_sam_store_ref_roundtrip_without_ref(tmp_path):
    ref, rp = _make_ref(tmp_path)
    payload = make_sam(ref)
    src = tmp_path / "a.sam"
    src.write_bytes(payload)
    z = tmp_path / "a.gxz"
    zip_file(str(src), str(z), reference=rp, store_ref=True)
    out = tmp_path / "a.out.sam"
    piz_file(str(z), str(out))          # NO reference passed
    assert out.read_bytes() == payload
    # embedded ranges cover only the used head, not the whole genome
    arch = z.stat().st_size
    assert arch < ref.length // 4       # far smaller than the full 2-bit


def test_fastq_store_ref_roundtrip_without_ref(tmp_path):
    ref, rp = _make_ref(tmp_path)
    rows = []
    for i in range(600):
        p = int(RNG.integers(0, ref.length - 120))
        seq = packops.ACGT[ref.codes[p:p + 100]].tobytes()
        rows.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"F" * 100))
    payload = b"".join(rows)
    src = tmp_path / "b.fastq"
    src.write_bytes(payload)
    z = tmp_path / "b.gxz"
    zip_file(str(src), str(z), reference=rp, store_ref=True)
    out = tmp_path / "b.out"
    piz_file(str(z), str(out))
    assert out.read_bytes() == payload


def test_used_ranges_merging():
    ref = refstore.fasta_to_genome(synth_genome(50000, n_contigs=1))
    ref.track_used = True
    ref.mark_used(np.array([100, 5000, 40000]), np.array([50, 100, 100]))
    rngs = ref.used_ranges()
    assert rngs[0][0] == 0                       # block-rounded
    total = sum(l for _, l in rngs)
    assert total <= 3 * refstore.RefGenome.BLOCK
    # blocks 0 and 1 are adjacent -> merged; 40000 stands alone
    assert len(rngs) == 2


def test_ref_cache_eviction_and_touch(tmp_path, monkeypatch):
    """Sidecar caches idle past the TTL are reclaimed on the next ref load;
    each use refreshes the last-used stamp (ref_cache.c auto-eviction)."""
    import os
    import time
    import numpy as np
    from genozip_tpu.ref.refstore import make_reference, load_ref_file
    rng = np.random.default_rng(2)
    fa = os.path.join(str(tmp_path), "g.fa")
    open(fa, "wb").write(
        b">c1\n" + rng.choice(np.frombuffer(b"ACGT", np.uint8),
                              200000).tobytes() + b"\n")
    ref_p = os.path.join(str(tmp_path), "g.ref.gxz")
    make_reference(fa, ref_p)
    load_ref_file(ref_p)             # creates the cache
    cpath = ref_p + ".cache"
    assert os.path.exists(cpath)
    # a stale sibling cache gets evicted
    stale = os.path.join(str(tmp_path), "old.ref.gxz.cache")
    open(stale, "wb").write(b"junk")
    old = time.time() - 10 * 24 * 3600
    os.utime(stale, (old, old))
    m_before = os.path.getmtime(cpath)
    os.utime(cpath, (old + 9 * 24 * 3600, old + 9 * 24 * 3600))
    time.sleep(0.02)
    load_ref_file(ref_p)
    assert not os.path.exists(stale), "stale sibling cache not evicted"
    assert os.path.getmtime(cpath) > m_before - 1, "use must touch the cache"
