"""Archive corruption fuzzing: flip bits / truncate every section type and
assert a clean, diagnosable failure — NEVER a silently wrong round-trip
(reference culture: per-section z_digest adler + per-VB digest + ASSPIZ with
biopsy repro everywhere, sections.h:153 / piz.c:109)."""

import os

import numpy as np
import pytest

from genozip_tpu.zip_pipeline import zip_file
from genozip_tpu.piz_pipeline import piz_file
from genozip_tpu.format.sections import ZReader


def _mk_archive(tmp_path, kind):
    rng = np.random.default_rng(5)
    if kind == "fastq":
        rows = []
        for i in range(1500):
            s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 100)
            q = (rng.integers(0, 40, 100) + 33).astype(np.uint8)
            rows.append(b"@f%d\n%s\n+\n%s\n" % (i, s.tobytes(), q.tobytes()))
        src = os.path.join(str(tmp_path), "f.fastq")
    else:   # SAM with gencomp (the ordering-sensitive path)
        rows = [b"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:100000\n"]
        p = 1
        for i in range(1200):
            p += int(rng.integers(1, 40))
            s = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80)
            q = (rng.integers(0, 40, 80) + 33).astype(np.uint8)
            fl = 2048 if i % 13 == 5 else (256 if i % 11 == 3 else 0)
            seq = b"*" if fl == 256 else s.tobytes()
            qual = b"*" if fl == 256 else q.tobytes()
            cig = b"40M40S" if fl == 2048 else b"80M"
            rows.append(b"s%d\t%d\tc1\t%d\t60\t%s\t*\t0\t0\t%s\t%s\n"
                        % (i, fl, p, cig, seq, qual))
        src = os.path.join(str(tmp_path), "g.sam")
    data = b"".join(rows)
    open(src, "wb").write(data)
    z = src + ".gxz"
    zip_file(src, z, vb_size=64 * 1024)
    return src, z, data


def _piz_outcome(z, expect: bytes):
    """Returns 'ok' (byte-identical), 'error' (clean exception), or
    'WRONG' (no error but different bytes — the one forbidden outcome)."""
    out = z + ".fuzz_out"
    try:
        piz_file(z, out)
    except Exception:
        return "error"
    except BaseException as e:          # SystemExit/KeyboardInterrupt: dirty
        raise AssertionError(f"non-exception escape: {e!r}")
    got = open(out, "rb").read()
    return "ok" if got == expect else "WRONG"


@pytest.mark.parametrize("kind", ["fastq", "sam"])
def test_bitflip_every_section_type(tmp_path, kind):
    src, z, expect = _mk_archive(tmp_path, kind)
    blob = bytearray(open(z, "rb").read())
    zr = ZReader(open(z, "rb"))
    # one representative section per (sec_type) + a couple extra spots each
    seen = {}
    for e in zr.index:
        seen.setdefault(e.sec_type, []).append(e)
    idx_sorted = sorted(zr.index, key=lambda e: e.offset)
    end_of = {}
    for i, e in enumerate(idx_sorted):
        end_of[e.offset] = (idx_sorted[i + 1].offset
                            if i + 1 < len(idx_sorted) else len(blob))
    from genozip_tpu.format.sections import HDR_SIZE
    outcomes = {}
    for st, ents in seen.items():
        for e in ents[:2]:
            lo, hi = e.offset, end_of[e.offset]
            # flip header bytes AND payload bytes (header fields shadowed
            # by the footer index may be benign; payloads must be caught)
            spots = [lo + 8, lo + 50]
            if hi - lo > HDR_SIZE:
                pay = hi - lo - HDR_SIZE
                spots += [lo + HDR_SIZE + pay // 10,
                          lo + HDR_SIZE + (6 * pay) // 10]
            for at in spots:
                if at >= len(blob):
                    continue
                mut = bytearray(blob)
                mut[at] ^= 0x40
                zf = os.path.join(str(tmp_path), "mut.gxz")
                open(zf, "wb").write(bytes(mut))
                outcomes[(st, e.offset, at)] = _piz_outcome(zf, expect)
    wrong = {k: v for k, v in outcomes.items() if v == "WRONG"}
    assert not wrong, f"silent corruption passed through: {wrong}"
    # sanity: the checks actually fire — payload flips in sections PIZ
    # consumes must error ('ok' is legitimate only for flips in aux
    # sections PIZ never reads, e.g. SEC_STATS/COUNTS/RANDOM_ACCESS, or in
    # header bytes shadowed by the footer index)
    from genozip_tpu.format import sections as fmt
    consumed = {fmt.SEC_B250, fmt.SEC_LOCAL, fmt.SEC_DICT}
    payload_flips = [v for (st, off, at), v in outcomes.items()
                     if st in consumed and at - off >= HDR_SIZE]
    assert payload_flips and all(v == "error" for v in payload_flips), \
        outcomes


@pytest.mark.parametrize("kind", ["fastq", "sam"])
def test_truncation_fails_cleanly(tmp_path, kind):
    src, z, expect = _mk_archive(tmp_path, kind)
    blob = open(z, "rb").read()
    for frac in (0.2, 0.5, 0.9, 0.999):
        zf = os.path.join(str(tmp_path), "trunc.gxz")
        open(zf, "wb").write(blob[: int(len(blob) * frac)])
        assert _piz_outcome(zf, expect) == "error", frac


def test_biopsy_advice_on_corrupt_vb(tmp_path):
    """A payload flip inside a VB section must surface the --biopsy repro
    advice (reference piz.c:109-155) or the digest error."""
    src, z, expect = _mk_archive(tmp_path, "fastq")
    zr = ZReader(open(z, "rb"))
    vb_secs = [e for e in zr.index if e.vb_i == 1]
    blob = bytearray(open(z, "rb").read())
    at = vb_secs[0].offset + 40
    blob[at] ^= 0x10
    zf = os.path.join(str(tmp_path), "bio.gxz")
    open(zf, "wb").write(bytes(blob))
    try:
        piz_file(zf, zf + ".out")
    except Exception as e:
        msg = str(e)
        assert ("biopsy" in msg or "digest" in msg or "adler" in msg
                or "checksum" in msg or "mismatch" in msg
                or "corrupt" in msg), msg
    else:
        assert open(zf + ".out", "rb").read() == expect
