"""gxcat output filters: --head/--tail/--grep/--downsample.

Reference parity: src/writer.c:544-663 recon-plan editing + per-line drops
(vb->drop_curr_line). Here filters operate on reconstructed VB text with
vectorized line selection; region filters (--regions) arrive with the
random-access milestone.
"""

import numpy as np

from .piz_pipeline import PizReader


def _lines_of(buf: bytes):
    a = np.frombuffer(buf, np.uint8)
    nl = np.nonzero(a == ord("\n"))[0]
    starts = np.concatenate([[0], nl[:-1] + 1]) if nl.shape[0] else np.zeros(1 if buf else 0, np.int64)
    ends = nl + 1
    if buf and (nl.shape[0] == 0 or nl[-1] != len(buf) - 1):
        starts = np.concatenate([starts, [nl[-1] + 1 if nl.shape[0] else 0]])
        ends = np.concatenate([ends, [len(buf)]])
    return starts[:ends.shape[0]], ends


def cat_filtered(args, out):
    pr = PizReader(args.input, reference=getattr(args, "reference", None))
    dt_name = pr.file_hdr["dt"]
    lines_per_rec = 4 if dt_name == "fastq" else 1
    hdr = pr.txt_header()
    if hdr and not getattr(args, "no_header", False):
        out.write(hdr)
    emitted = 0
    rec_i = 0
    grep = args.grep.encode() if getattr(args, "grep", None) else None
    head = getattr(args, "head", None)
    downsample = getattr(args, "downsample", None)
    tail = getattr(args, "tail", None)
    count_only = getattr(args, "count", False)
    lines_rng = None
    if getattr(args, "lines", None):
        # reference parity: genocat --lines=first-last (1-based, inclusive)
        spec = args.lines
        a, _, b = spec.partition("-")
        lines_rng = (int(a) if a else 1, int(b) if b else 1 << 62)
    qnames = None
    if getattr(args, "qnames", None):
        # reference parity: genocat --qnames / --qnames-file
        # (src/qname_filter.c): keep records whose QNAME is listed
        spec = args.qnames
        if spec.startswith("@"):
            with open(spec[1:], "rb") as f:
                qnames = {ln.strip() for ln in f if ln.strip()}
        else:
            qnames = {q.encode() for q in spec.split(",") if q}
    bases = getattr(args, "bases", None)
    bases_pos = None
    if bases:
        # reference parity: genocat --bases (src/bases_filter.c) — keep only
        # reads whose SEQ uses ONLY the given IUPAC characters (^ negates)
        neg = bases.startswith("^")
        bs = bases[1:] if neg else bases
        allowed = np.zeros(256, bool)
        allowed[np.frombuffer(bs.upper().encode(), np.uint8)] = True
        allowed[np.frombuffer(bs.lower().encode(), np.uint8)] = True
        bases_pos = (allowed, neg)
    regions = None
    ra = None
    if getattr(args, "regions", None):
        from . import regions as regions_mod
        from .format import sections as fmt
        regions = regions_mod.parse_regions(args.regions)
        payload, _ = pr.zr.read_one(fmt.SEC_RANDOM_ACCESS)
        if payload is not None:
            ra = fmt.json_parse(payload)
    tail_buf = []
    for vb_i in range(1, pr.num_vbs() + 1):
        if regions is not None and ra is not None:
            ents = ra.get(f"0:{vb_i}")
            if ents is not None:
                from . import regions as regions_mod
                if not any(regions_mod.regions_overlap(regions, c, lo, hi)
                           for (c, lo, hi) in ents):
                    if pr.ensure_gencomp():
                        # keep the PRIM/DEPN queues in VB order
                        pr.drain_vb_gencomp(vb_i)
                    continue  # random-access VB skip
        buf = pr.read_vb(vb_i)
        if regions is not None:
            from . import regions as regions_mod
            buf = regions_mod.filter_lines(buf, dt_name, regions)
        if grep is None and head is None and downsample is None and \
                tail is None and bases_pos is None and not count_only and \
                lines_rng is None and qnames is None:
            out.write(buf)
            continue
        starts, ends = _lines_of(buf)
        nrec = starts.shape[0] // lines_per_rec
        for r in range(nrec):
            s = starts[r * lines_per_rec]
            e = ends[(r + 1) * lines_per_rec - 1]
            rec = buf[s:e]
            rec_i += 1
            if lines_rng and not (lines_rng[0] <= rec_i <= lines_rng[1]):
                if rec_i > lines_rng[1]:
                    break
                continue
            if downsample and (rec_i - 1) % downsample != 0:
                continue
            if grep and grep not in rec:
                continue
            if qnames is not None and _rec_qname(rec, dt_name) not in qnames:
                continue
            if bases_pos is not None:
                seq = _rec_seq(rec, dt_name)
                allowed, neg = bases_pos
                a = np.frombuffer(seq, np.uint8)
                all_in = bool(allowed[a].all()) if a.shape[0] else True
                if (not neg and not all_in) or (neg and all_in):
                    continue
            if tail:
                tail_buf.append(rec)
                if len(tail_buf) > tail:
                    tail_buf.pop(0)
                continue
            if count_only:
                emitted += 1
                if head and emitted >= head:
                    out.write(b"%d\n" % emitted)
                    pr.close()
                    return
                continue
            out.write(rec)
            emitted += 1
            if head and emitted >= head:
                pr.close()
                return
    for rec in tail_buf:
        out.write(rec)
    if count_only:
        out.write(b"%d\n" % (len(tail_buf) if tail else emitted))
    pr.close()


def _rec_qname(rec: bytes, dt_name: str) -> bytes:
    """The QNAME of one reconstructed record (for --qnames)."""
    if dt_name == "fastq":
        e = min(x for x in (rec.find(b"\n"), rec.find(b" "), rec.find(b"\t"),
                            len(rec)) if x >= 0)
        q = rec[1:e]
        return q[:-2] if q[-2:-1] == b"/" else q
    return rec.split(b"\t", 1)[0]


def _rec_seq(rec: bytes, dt_name: str) -> bytes:
    """The SEQ payload of one reconstructed record (for --bases)."""
    if dt_name == "fastq":
        p1 = rec.find(b"\n")
        p2 = rec.find(b"\n", p1 + 1)
        return rec[p1 + 1:p2 if p2 >= 0 else len(rec)]
    if dt_name == "sam":
        f = rec.split(b"\t", 10)
        return f[9] if len(f) > 9 else b""
    return rec.rstrip(b"\n")


def cat_translated_sam(args, out):
    """BAM archive -> SAM text (reference parity: genocat --sam translation,
    src/data_types.h:253-259)."""
    from .translate import bam_header_to_sam, bam_vb_to_sam
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    assert pr.file_hdr["dt"] == "bam", "--sam translation needs a BAM archive"
    hdr = pr.txt_header()
    sam_hdr, ref_names = bam_header_to_sam(hdr)
    if not getattr(args, "no_header", False):
        out.write(sam_hdr)
    for vb_i in range(1, pr.num_vbs() + 1):
        out.write(bam_vb_to_sam(pr.read_vb(vb_i), ref_names))
    pr.close()


def cat_translated_cram(args, out_path):
    """SAM/BAM archive -> CRAM via `samtools view -C` (reference parity:
    the SAM2CRAM translator role, src/data_types.h:253-259 + src/cram.c —
    the reference crosses the same samtools pipe; feature-gated on tool
    availability like the CRAM input bridge, src/file.c:560)."""
    import shutil
    import subprocess
    tool = shutil.which("samtools")
    assert tool, ("--cram needs `samtools` on PATH (the reference bridges "
                  "CRAM through samtools the same way, file.c:560)")
    argv = [tool, "view", "-C", "-o", out_path or "/dev/stdout"]
    if getattr(args, "cram_ref", None):
        argv += ["-T", args.cram_ref]
    argv.append("-")
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    dt = pr.file_hdr["dt"]
    pr.close()
    assert dt in ("sam", "bam"), "--cram needs a SAM or BAM archive"
    proc = subprocess.Popen(argv, stdin=subprocess.PIPE)
    try:
        if dt == "bam":
            cat_translated_sam(args, proc.stdin)
        else:
            cat_filtered(args, proc.stdin)
    finally:
        proc.stdin.close()
        rc = proc.wait()
    assert rc == 0, f"samtools view -C exited with {rc}"


def cat_translated_bam(args, out_path):
    """SAM archive -> BAM (+ optional .bai). Reference parity: genocat
    --bam SAM2BAM translators (src/data_types.h:253-259) and native BAI
    generation (src/bai.c)."""
    import sys
    from .translate import (sam_header_to_bam, sam_vb_to_bam,
                            IndexingBgzfWriter, build_bai)
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    assert pr.file_hdr["dt"] == "sam", "--bam translation needs a SAM archive"
    hdr = pr.txt_header()
    bam_hdr, name2id = sam_header_to_bam(hdr)
    sink = open(out_path, "wb") if out_path else sys.stdout.buffer
    w = IndexingBgzfWriter(sink)
    w.write_blob(bam_hdr)
    all_ref, all_pos, all_end, all_vb, all_ve = [], [], [], [], []
    for vb_i in range(1, pr.num_vbs() + 1):
        buf = pr.read_vb(vb_i)
        blob, lens, refids, poss, ends = sam_vb_to_bam(buf, name2id)
        vbeg, vend = w.write_records(blob, lens)
        all_ref.append(refids)
        all_pos.append(poss)
        all_end.append(ends)
        all_vb.append(vbeg)
        all_ve.append(vend)
    w.close()
    if getattr(args, "index", False) and out_path:
        refids = np.concatenate(all_ref) if all_ref else np.zeros(0, np.int64)
        mapped = refids >= 0
        bai = build_bai(len(name2id), refids[mapped],
                        np.concatenate(all_pos)[mapped],
                        np.concatenate(all_end)[mapped],
                        np.concatenate(all_vb)[mapped],
                        np.concatenate(all_ve)[mapped])
        with open(out_path + ".bai", "wb") as f:
            f.write(bai)
    pr.close()


def cat_interleaved(args, out):
    """Paired archive -> interleaved R1/R2 records (reference parity:
    genocat --interleave)."""
    import numpy as np
    from .utils import ragged
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    comps = pr.file_hdr.get("components")
    assert comps and len(comps) == 2, "--interleave needs a paired archive"
    lpr = 4 if pr.file_hdr["dt"] == "fastq" else 1
    for vb_i in range(1, pr.num_vbs() + 1):
        bufs = [pr.read_vb(vb_i, 0), pr.read_vb(vb_i, 1)]
        cols = []
        for b in bufs:
            a = np.frombuffer(b, np.uint8)
            nl = np.nonzero(a == ord("\n"))[0]
            starts = np.concatenate([[0], nl[:-1] + 1])
            lines = ragged.gather_ranges(a, starts, nl - starts + 1)
            # group lines into records
            nrec = len(lines) // lpr
            rec_lens = lines.lens.reshape(nrec, lpr).sum(axis=1)
            cols.append(ragged.Col(lines.data,
                                   np.concatenate([[0], np.cumsum(rec_lens)])))
        merged = ragged.interleave(cols)
        out.write(merged.data.tobytes())
    pr.close()


def cat_translated_vcf(args, out):
    """23andMe archive -> VCF (reference parity: genocat --vcf on ME23,
    data_types.h:262; REF base from the reference genome)."""
    from .translate import me23_vb_to_vcf, VCF_ME23_HEADER
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    assert pr.file_hdr["dt"] == "me23", "--vcf translation needs a 23andMe archive"
    ref = getattr(pr.dt, "ref", None)
    if ref is None and getattr(args, "reference", None):
        from .ref.refstore import load_ref_file
        ref = load_ref_file(args.reference)
    assert ref is not None, "--vcf translation needs --reference"
    if not getattr(args, "no_header", False):
        out.write(VCF_ME23_HEADER)
    for vb_i in range(1, pr.num_vbs() + 1):
        out.write(me23_vb_to_vcf(pr.read_vb(vb_i), ref))
    pr.close()
