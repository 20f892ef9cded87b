"""Codec registry round-trips for every codec id."""

import numpy as np
import pytest

from genozip_tpu import codecs

RNG = np.random.default_rng(8)


def payloads():
    yield b""
    yield b"A"
    yield bytes(RNG.integers(0, 256, 5000).astype(np.uint8))
    yield bytes(RNG.choice(np.frombuffer(b"ACGTN", np.uint8), 9000, p=[.24, .24, .24, .24, .04]).astype(np.uint8))
    # dominant-qual-like
    q = np.full(20000, ord("F"), np.uint8)
    exc = RNG.random(20000) < 0.08
    q[exc] = RNG.choice(np.frombuffer(b":,#AB", np.uint8), int(exc.sum()))
    yield bytes(q)
    yield b"x" * 10000


ALL = [codecs.NONE, codecs.RANS0, codecs.RANS1, codecs.ZLIB, codecs.BZ2,
       codecs.LZMA, codecs.ACGT, codecs.DELTA_RANS, codecs.RLE0, codecs.DOMQ]


@pytest.mark.parametrize("codec", ALL, ids=lambda c: codecs.NAMES[c])
def test_codec_roundtrip(codec):
    for data in payloads():
        blob = codecs.compress(data, codec)
        back = codecs.decompress(blob, codec, len(data))
        assert back == data, f"{codecs.NAMES[codec]} len={len(data)}"


def test_pack_roundtrip():
    for codec in (codecs.PACK0, codecs.PACK1):
        for nsym in (1, 2, 4, 9, 16):
            syms = RNG.choice(256, nsym, replace=False).astype(np.uint8)
            data = bytes(RNG.choice(syms, 7777).astype(np.uint8))
            blob = codecs.compress(data, codec)
            assert codecs.decompress(blob, codec, len(data)) == data


def test_domq_beats_rans_on_clustered_dominated():
    # realistic binned-qual shape: long dominant runs with exception BURSTS
    # (order-0 rANS is position-blind; the RLE'd dom-mask exploits clustering)
    parts = []
    total = 0
    while total < 100000:
        run = int(RNG.integers(300, 900))
        burst = int(RNG.integers(5, 40))
        parts.append(np.full(run, ord("F"), np.uint8))
        parts.append(RNG.choice(np.frombuffer(b":,#", np.uint8), burst))
        total += run + burst
    data = bytes(np.concatenate(parts))
    d = len(codecs.compress(data, codecs.DOMQ))
    r = len(codecs.compress(data, codecs.RANS0))
    assert d < r
    assert codecs.decompress(codecs.compress(data, codecs.DOMQ),
                             codecs.DOMQ, len(data)) == data


def test_encryption_roundtrip(tmp_path=None):
    import os, tempfile
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file
    import pytest
    d = tempfile.mkdtemp()
    data = b"".join(b"@r%d\nACGTACGTAC\n+\nFFFF:FFFFF\n" % i for i in range(500))
    src = os.path.join(d, "e.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, password="hunter2")
    out = src + ".out"
    piz_file(z, out, password="hunter2")
    assert open(out, "rb").read() == data
    with pytest.raises(AssertionError):
        piz_file(z, None, password="wrong")
    with pytest.raises(AssertionError):
        piz_file(z, None)
    # plaintext must not appear in the archive
    zbytes = open(z, "rb").read()
    assert b"ACGTACGTAC" not in zbytes


def test_codec_retest_at_vb10(tmp_path):
    """An unrepresentative VB 1 must not lock a bad codec in for the whole
    file (reference codec.c:274-277 VB-10 retest)."""
    import os
    import numpy as np
    from genozip_tpu.zip_pipeline import zip_file
    from genozip_tpu.piz_pipeline import piz_file, PizReader
    from genozip_tpu.format import sections as fmt
    from genozip_tpu import codecs

    rng = np.random.default_rng(13)
    # The segconf calibration sample (1MB) AND the early VBs carry
    # near-random qual (RANS-ish wins); VBs ~6+ are heavily dominated
    # (DOMQ wins) — only the VB-10 retest can correct the commitment.
    rows = []
    for i in range(17000):
        if i < 5000:
            q = (rng.integers(0, 64, 100) + 33).astype(np.uint8)
        else:
            q = np.full(100, ord("F"), np.uint8)
            q[rng.integers(0, 100, 3)] = ord("#")
        s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 100)
        rows.append(b"@v%d\n%s\n+\n%s\n" % (i, s.tobytes(), q.tobytes()))
    data = b"".join(rows)
    src = os.path.join(str(tmp_path), "re.fastq")
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=220 * 1024)
    piz_file(z, src + ".out")
    assert open(src + ".out", "rb").read() == data
    # late VBs must carry a different (better) QUAL codec than VB 1
    pr = PizReader(z)
    by_vb = {}
    for ent in pr.zr.sections(fmt.SEC_LOCAL):
        if ent.dict_id.rstrip(b"\0") == b"QUAL":
            _, meta = pr.zr.read_section_raw(ent)
            by_vb[ent.vb_i] = meta["codec"]
    pr.close()
    assert len(by_vb) >= 11, by_vb
    last = by_vb[max(by_vb)]
    assert last != by_vb[1], f"codec never corrected: {by_vb}"
    assert last in (codecs.DOMQ, codecs.PACK1, codecs.PACK0)


def test_bwt_codec_roundtrip():
    """Own BWT block codec (BSC role, src/bsc/): vectorized doubling
    suffix array + adaptive coder; must beat bz2 on DNA-like payloads."""
    import bz2
    import numpy as np
    from genozip_tpu import codecs
    rng = np.random.default_rng(1)
    cases = {
        "dna": rng.choice(np.frombuffer(b"ACGT", np.uint8), 150000).tobytes(),
        "text": b"the quick brown fox jumps over the lazy dog " * 2000,
        "empty": b"",
        "tiny": b"x",
        "runs": b"A" * 50000 + b"B" * 50000,
    }
    for name, data in cases.items():
        blob = codecs.compress(data, codecs.BWT)
        assert codecs.decompress(blob, codecs.BWT, len(data)) == data, name
    dna = cases["dna"]
    assert len(codecs.compress(dna, codecs.BWT)) < len(bz2.compress(dna, 9))


def test_bwt_multiblock_roundtrip():
    """Payloads above the BWT block cap split into independent blocks
    (bsc-style) — the suffix-array sort size is bounded; round-trip exact
    across the block boundary and for the single-block legacy framing."""
    import numpy as np
    from genozip_tpu.codecs import bwt, RANS1
    rng = np.random.default_rng(19)
    # > 1 block with a repetitive structure BWT likes
    data = (b"BANANASPLIT" * 500000)[: bwt.BWT_BLOCK + 12345]
    blob = bwt.compress(data, RANS1)
    assert bwt.decompress(blob) == data
    small = bytes(rng.integers(0, 9, 5000, np.uint8))
    assert bwt.decompress(bwt.compress(small, RANS1)) == small


def test_acgt_lz_roundtrip_and_assignment():
    """ACGT_LZ (2-bit pack + LZ over the packed stream): byte-exact, and
    the assigner picks it on repeat-heavy sequence where LZ matches beat
    the entropy floor by more than the speed penalty."""
    import numpy as np
    from genozip_tpu import codecs
    from genozip_tpu.codecs import assign as codec_assign
    rng = np.random.default_rng(3)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    # ~50% of the stream is copies of a few 400bp prototypes
    protos = [rng.choice(acgt, 400) for _ in range(4)]
    parts = []
    for _ in range(4000):
        if rng.random() < 0.5:
            parts.append(protos[int(rng.integers(0, 4))])
        else:
            parts.append(rng.choice(acgt, 400))
    seq = np.concatenate(parts)
    seq[rng.integers(0, seq.shape[0], 50)] = ord("N")   # exception channel
    data = seq.tobytes()
    blob = codecs.compress(data, codecs.ACGT_LZ)
    assert codecs.decompress(blob, codecs.ACGT_LZ, len(data)) == data
    assert len(blob) < len(codecs.compress(data, codecs.ACGT)) * 0.75
    assert codec_assign.assign_best(data, "seq") == codecs.ACGT_LZ
