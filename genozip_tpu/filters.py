"""gxcat output filters: --head/--tail/--grep/--downsample/--regions/...

Reference parity: src/writer.c:544-663 recon-plan editing + per-line drops
(vb->drop_curr_line). Positional filters (--lines/--tail/--downsample and
the --regions VB skip) are PLAN EDITS over the recon-plan IR
(writer_plan.py) — out-of-range VBs are never reconstructed; per-record
predicates (--grep/--qnames/--bases) are applied by the plan executor.
"""

import numpy as np

from .piz_pipeline import PizReader
from . import writer_plan as wp


def cat_filtered(args, out):
    pr = PizReader(args.input, reference=getattr(args, "reference", None))
    dt_name = pr.file_hdr["dt"]
    lines_per_rec = 4 if dt_name == "fastq" else 1
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
    line_filter = None
    if getattr(args, "regions", None):
        from . import regions as regions_mod
        from .format import sections as fmt
        regions = regions_mod.parse_regions(args.regions)
        payload, _ = pr.zr.read_one(fmt.SEC_RANDOM_ACCESS)
        if payload is not None:
            ra = fmt.json_parse(payload)
        line_filter = lambda buf: regions_mod.filter_lines(buf, dt_name,
                                                           regions)

    # the recon plan: full file minus region-skipped VBs; --r1/--r2 pick
    # one component of a paired archive (genocat --R1/--R2, flags.h)
    comp_i = 0
    if getattr(args, "r2", False):
        assert pr.file_hdr.get("pair"), "--r2 needs a paired archive"
        comp_i = 1
    elif getattr(args, "r1", False):
        assert pr.file_hdr.get("pair"), "--r1 needs a paired archive"
    plan = wp.build_plan(pr, comp_i, regions=regions, ra=ra)

    # content predicate (the vb->drop_curr_line role)
    def content_pred(rec: bytes) -> bool:
        if grep and grep not in rec:
            return False
        if qnames is not None and _rec_qname(rec, dt_name) not in qnames:
            return False
        if bases_pos is not None:
            seq = _rec_seq(rec, dt_name)
            allowed, neg = bases_pos
            a = np.frombuffer(seq, np.uint8)
            all_in = bool(allowed[a].all()) if a.shape[0] else True
            if (not neg and not all_in) or (neg and all_in):
                return False
        return True

    has_content_pred = (grep is not None or qnames is not None
                        or bases_pos is not None)
    pure_positional = not has_content_pred and line_filter is None

    predicate = content_pred if has_content_pred else None
    if pure_positional and (lines_rng or downsample or
                            (tail and not downsample)):
        # positional filters as PLAN EDITS: VBs fully outside the range are
        # never reconstructed (the reference's recon-plan trimming)
        counts = wp.vb_record_counts(pr, plan)
        if downsample:
            plan = wp.edit_downsample(plan, downsample, counts)
        if lines_rng:
            plan = wp.edit_lines_range(plan, lines_rng[0], lines_rng[1],
                                       counts)
        if tail and not downsample and not lines_rng:
            plan = wp.edit_tail(plan, tail, counts)
            tail = None
    elif lines_rng or downsample:
        # dynamic fallback: positional filters on the post-line-filter
        # ordinal stream (regions/grep change counts)
        state = {"i": 0}
        base_pred = predicate

        def predicate(rec: bytes) -> bool:
            state["i"] += 1
            i = state["i"]
            if lines_rng and not (lines_rng[0] <= i <= lines_rng[1]):
                return False
            if downsample and (i - 1) % downsample != 0:
                return False
            return base_pred(rec) if base_pred is not None else True

    if getattr(args, "header_only", False):
        # genocat --header-only (flags.h): just the txt header
        hdr = pr.txt_header(0)
        if hdr:
            out.write(hdr)
        pr.close()
        return
    if getattr(args, "one_vb", None):
        # genocat --one-vb (flags.h): reconstruct a single VB
        plan = [it for it in plan
                if getattr(it, "vb_i", None) == args.one_vb
                or it.kind == wp.DRAIN_VB and it.vb_i < args.one_vb]
    transform = None
    proj = ("seq" if getattr(args, "seq_only", False) else
            "qual" if getattr(args, "qual_only", False) else None)
    if proj is not None:
        # genocat --seq-only / --qual-only (flags.h): one line per record
        fi = {"fastq": {"seq": 1, "qual": 3},
              "sam": {"seq": 9, "qual": 10}}.get(dt_name)
        assert fi is not None, f"--{proj}-only: unsupported for {dt_name}"
        k = fi[proj]

        def transform(rec: bytes) -> bytes | None:
            if dt_name == "fastq":
                parts = rec.split(b"\n")
                return parts[k] + b"\n" if len(parts) > k else None
            cols = rec.rstrip(b"\n").split(b"\t")
            return cols[k] + b"\n" if len(cols) > k else None
    wp.execute_plan(pr, plan, out, lines_per_rec=lines_per_rec,
                    predicate=predicate, head=head, tail=tail,
                    count_only=count_only, line_filter=line_filter,
                    no_header=getattr(args, "no_header", False)
                    or proj is not None,
                    transform=transform)
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
    genocat --interleave as the PLAN_INTERLEAVE flavor)."""
    pr = PizReader(args.input, reference=getattr(args, "reference", None),
                   password=getattr(args, "password", None))
    comps = pr.file_hdr.get("components")
    assert comps and len(comps) == 2, "--interleave needs a paired archive"
    lpr = 4 if pr.file_hdr["dt"] == "fastq" else 1
    plan = wp.build_interleave_plan(pr)
    wp.execute_plan(pr, plan, out, lines_per_rec=lpr, no_header=True)
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
