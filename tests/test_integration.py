"""Kitchen-sink integration: reference + pair + encryption + md5 + regions +
stats together, plus CLI surface smoke of every subcommand."""

import io
import os

import numpy as np

from genozip_tpu.cli import main
from genozip_tpu.ref import refstore
from genozip_tpu.zip_pipeline import zip_pair
from genozip_tpu.piz_pipeline import piz_file, PizReader
from tests.test_aligner import synth_genome
from tests.test_pair import synth_pair


def test_everything_together(tmp_path, capsys):
    d = str(tmp_path)
    fa = os.path.join(d, "g.fa")
    open(fa, "wb").write(synth_genome(150000, 1))

    # make-reference via CLI
    ref_path = os.path.join(d, "g.ref.gxz")
    main(["zip", fa, "--make-reference", "-o", ref_path])
    ref = refstore.load_ref_file(ref_path)

    d1, d2 = synth_pair(ref, n=800)
    p1 = os.path.join(d, "r1.fastq")
    p2 = os.path.join(d, "r2.fastq")
    open(p1, "wb").write(d1)
    open(p2, "wb").write(d2)

    z = os.path.join(d, "pair.gxz")
    zip_pair(p1, p2, z, reference=ref_path)
    out = os.path.join(d, "o")
    piz_file(z, out, reference=ref_path)
    assert open(out + ".1", "rb").read() == d1
    assert open(out + ".2", "rb").read() == d2

    # CLI: ls --stats, unzip --test
    main(["ls", z, "--stats"])
    got = capsys.readouterr().out
    assert "pair" in got or "fastq" in got
    main(["unzip", z, "--test", "--reference", ref_path])

    # encrypted + md5 single file through the CLI
    z2 = os.path.join(d, "enc.gxz")
    main(["zip", p1, "-o", z2, "--reference", ref_path,
          "--password", "pw123", "--md5", "--test", "--show-time"])
    pr = PizReader(z2, reference=ref_path, password="pw123")
    assert pr.file_hdr["md5"] and pr.file_hdr["enc"]
    pr.close()


def test_vb_header_binary_roundtrip_and_v1_backread():
    """Format v2 binary VB headers (sections.py vbhdr_pack/parse): packed
    round-trip preserves every field, and a v1 JSON payload still parses
    (back-read)."""
    from genozip_tpu.format import sections as fmt
    d = {"n": 1234, "len": 987654321, "adler": 0xDEADBEEF,
         "x64": 0x1122334455667788,
         "ctxs": {"QUAL": {"mode": "txt", "special": "qdmx:smux"},
                  "POS": {"mode": "num", "param": 1},
                  "FLAG": {"mode": "num", "same": [77, 1234]},
                  "GPOS": {"mode": "num", "param": -3,
                           "pair": "copy_local"},
                  "RNAME": {"mode": "dict", "pair": "copy_b250"}},
         "meta": {"no_final_nl": True, "nf": 10}}
    packed = fmt.vbhdr_pack(d)
    out = fmt.vbhdr_parse(packed)
    assert out == d
    assert len(packed) < len(fmt.json_payload(d))
    # v1 JSON back-read
    assert fmt.vbhdr_parse(fmt.json_payload(d)) == d
    # x64-absent variant
    d2 = {"n": 0, "len": 0, "adler": 0, "ctxs": {}, "meta": {}}
    assert fmt.vbhdr_parse(fmt.vbhdr_pack(d2)) == d2
