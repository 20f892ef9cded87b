"""--coverage / --idxstats: per-contig read and base accumulators
(reference parity: src/coverage.c coverage_show_coverage :52). Computed from
reconstructed records — vectorized per VB."""

import numpy as np

from .piz_pipeline import PizReader
from .utils import ragged
from .translate import bam_header_to_sam, bam_vb_to_sam


def show_coverage(args, out):
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    dt = pr.file_hdr["dt"]
    assert dt in ("sam", "bam"), "--coverage/--idxstats need SAM/BAM archives"
    ref_names = None
    if dt == "bam":
        _, ref_names = bam_header_to_sam(pr.txt_header())

    reads = {}
    bases = {}
    unmapped = 0
    for vb_i in range(1, pr.num_vbs() + 1):
        buf = pr.read_vb(vb_i)
        if dt == "bam":
            buf = bam_vb_to_sam(buf, ref_names)
        a = np.frombuffer(buf, np.uint8)
        nl = np.nonzero(a == ord("\n"))[0]
        starts = np.concatenate([[0], nl[:-1] + 1])
        lines = ragged.gather_ranges(a, starts, nl - starts)
        fields, rest, good, bad = ragged.split_first_fields(lines, ord("\t"), 11)
        if good.shape[0] == 0:
            continue
        flags, fok = ragged.atoi(fields[1])
        rname = fields[2]
        seqlen = fields[9].lens
        from .contexts import dedup_col
        uw, inv = dedup_col(rname)
        unmapped += int(((flags & 4) != 0).sum())
        mapped_mask = (flags & 4) == 0
        for w in range(len(uw)):
            name = uw.row(w).decode("utf-8", "replace")
            if name == "*":
                continue
            m = (inv == w) & mapped_mask
            if not m.any():
                continue
            reads[name] = reads.get(name, 0) + int(m.sum())
            bases[name] = bases.get(name, 0) + int(seqlen[m].sum())
    pr.close()

    if getattr(args, "idxstats", False):
        for name in reads:
            out.write(f"{name}\t0\t{reads[name]}\t0\n")
        out.write(f"*\t0\t0\t{unmapped}\n")
    else:
        out.write(f"{'contig':20s} {'reads':>12s} {'bases':>15s}\n")
        for name in sorted(reads, key=lambda k: -reads[k]):
            out.write(f"{name:20s} {reads[name]:>12,} {bases[name]:>15,}\n")
        out.write(f"{'(unmapped)':20s} {unmapped:>12,}\n")
