"""Archive output translations (reference parity: src/data_types.h:251-262
TRANSLATIONS — genocat can emit BAM as SAM etc.; translator callbacks per
container item). Here: whole-VB translators over reconstructed records.

Implemented: BAM -> SAM (gxcat --sam on a BAM archive); 23andMe -> VCF
(gxcat --vcf with --reference, reference parity: src/me23.c ME23->VCF
translation, data_types.h:262).
"""

import numpy as np

from .utils import ragged
from .utils.ragged import Col
from . import native

CIGAR_OPS = b"MIDNSHP=X"
SEQ_NIBBLE = b"=ACMGRSVTWYHKDBN"


def bam_header_to_sam(bam_header: bytes) -> tuple[bytes, list[str]]:
    """BAM header blob -> (SAM header text, ref name list)."""
    l_text = int.from_bytes(bam_header[4:8], "little")
    text = bam_header[8:8 + l_text]
    off = 8 + l_text
    n_ref = int.from_bytes(bam_header[off:off + 4], "little")
    off += 4
    names = []
    for _ in range(n_ref):
        ln = int.from_bytes(bam_header[off:off + 4], "little")
        names.append(bam_header[off + 4: off + 4 + ln - 1].decode())
        off += 8 + ln
    return text.rstrip(b"\x00"), names


def _aux_to_sam(rec: memoryview) -> bytes:
    """One record's aux blob -> SAM text (\\t-joined, leading \\t included)."""
    out = []
    off = 0
    n = len(rec)
    import struct
    while off + 3 <= n:
        tag = bytes(rec[off:off + 2]).decode()
        t = chr(rec[off + 2])
        off += 3
        if t == "A":
            out.append(f"{tag}:A:{chr(rec[off])}")
            off += 1
        elif t in "cCsSiI":
            fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H",
                   "i": "<i", "I": "<I"}[t]
            sz = struct.calcsize(fmt)
            v = struct.unpack(fmt, rec[off:off + sz])[0]
            out.append(f"{tag}:i:{v}")
            off += sz
        elif t == "f":
            v = struct.unpack("<f", rec[off:off + 4])[0]
            out.append(f"{tag}:f:{v:g}")
            off += 4
        elif t in "ZH":
            end = off
            while end < n and rec[end] != 0:
                end += 1
            out.append(f"{tag}:{t}:{bytes(rec[off:end]).decode('latin1')}")
            off = end + 1
        elif t == "B":
            st = chr(rec[off])
            cnt = struct.unpack("<I", rec[off + 1:off + 5])[0]
            fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H",
                   "i": "<i", "I": "<I", "f": "<f"}[st]
            sz = struct.calcsize(fmt)
            vals = [struct.unpack(fmt, rec[off + 5 + k * sz: off + 5 + (k + 1) * sz])[0]
                    for k in range(cnt)]
            body = ",".join(f"{v:g}" if st == "f" else str(v) for v in vals)
            out.append(f"{tag}:B:{st},{body}")
            off += 5 + cnt * sz
        else:
            break  # unknown type: stop (malformed aux)
    return ("\t" + "\t".join(out)).encode() if out else b""


VCF_ME23_HEADER = (b"##fileformat=VCFv4.1\n"
                   b"##source=genozip_tpu me23->vcf translation\n"
                   b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                   b"\tSAMPLE\n")


def me23_vb_to_vcf(text: bytes, ref) -> bytes:
    """Translate 23andMe rows (rsid chrom pos genotype) to VCF records.
    REF base comes from the reference genome; rows whose genotype isn't
    SNP-like (indels, '--') or whose position is unknown are dropped, like
    the reference translator."""
    from .utils.ragged import Col
    from .contexts import dedup_col
    from .ops import pack as packops
    import numpy as _np

    data = np.frombuffer(text, np.uint8)
    nl = np.nonzero(data == ord("\n"))[0]
    starts = np.concatenate([[0], nl[:-1] + 1])
    lines = ragged.gather_ranges(data, starts, nl - starts)
    n = len(lines)
    if n == 0:
        return b""
    first = np.zeros(n, np.uint8)
    ne = lines.lens > 0
    first[ne] = data[starts[ne]]
    is_data = ne & (first != ord("#"))
    rows = np.nonzero(is_data)[0]
    sub = ragged.take(lines, rows)
    fields = ragged.split_fields_fixed(sub, ord("\t"), 4)
    rsid, chrom, posc, gt = fields
    pv, pok = ragged.atoi(posc)

    # contig gpos per unique chrom (try name, then chr<name>)
    uw, inv = dedup_col(chrom)
    base = np.full(len(uw), -1, dtype=np.int64)
    for w in range(len(uw)):
        nm = uw.row(w).decode("utf-8", "replace")
        c = ref.contig_of(nm) or ref.contig_of("chr" + nm)
        if c is not None:
            base[w] = c["gpos"]
    gbase = base[inv]

    gmat, glens = ragged.to_matrix(gt)
    a1 = gmat[:, 0] if gmat.shape[1] else np.zeros(len(sub), np.uint8)
    a2 = gmat[:, 1] if gmat.shape[1] > 1 else np.zeros(len(sub), np.uint8)
    snp = (packops.IS_ACGT[a1] & ((glens == 1) |
           ((glens == 2) & packops.IS_ACGT[a2])))
    ok = pok & (gbase >= 0) & (pv > 0) & snp & (gbase + pv - 1 < ref.length)
    kidx = np.nonzero(ok)[0]
    if kidx.shape[0] == 0:
        return b""
    refb = packops.ACGT[ref.codes[(gbase + pv - 1)[kidx]]]
    a1k, a2k = a1[kidx], a2[kidx]
    hap = (glens == 1)[kidx]
    out = []
    for i, r in enumerate(kidx):
        rb = refb[i]
        alleles = [int(a1k[i])] + ([] if hap[i] else [int(a2k[i])])
        alts = []
        gt_idx = []
        for al in alleles:
            if al == rb:
                gt_idx.append(0)
            else:
                ch = chr(al)
                if ch not in alts:
                    alts.append(ch)
                gt_idx.append(alts.index(ch) + 1)
        alt_s = ",".join(alts) if alts else "."
        gt_s = "/".join(str(g) for g in gt_idx)
        out.append(b"\t".join([
            chrom.row(int(r)), posc.row(int(r)), rsid.row(int(r)),
            bytes([rb]), alt_s.encode(), b".", b".", b".", b"GT",
            gt_s.encode()]) + b"\n")
    return b"".join(out)


def bam_vb_to_sam(records: bytes, ref_names: list[str]) -> bytes:
    """Translate a VB of raw BAM alignment records to SAM text (vectorized
    fixed fields; per-record aux decode)."""
    data = np.frombuffer(records, np.uint8)
    offsets, consumed = native.bam_scan(data, 1 << 24)
    assert consumed == data.shape[0]
    n = offsets.shape[0]
    if n == 0:
        return b""
    off = offsets

    def u32(o):
        return (data[o].astype(np.int64) | (data[o + 1].astype(np.int64) << 8)
                | (data[o + 2].astype(np.int64) << 16)
                | (data[o + 3].astype(np.int64) << 24))

    def u16(o):
        return data[o].astype(np.int64) | (data[o + 1].astype(np.int64) << 8)

    i32 = lambda o: u32(o).astype(np.uint32).astype(np.int32).astype(np.int64)
    refid = i32(off + 4)
    pos = i32(off + 8)
    l_rn = data[off + 12].astype(np.int64)
    mapq = data[off + 13].astype(np.int64)
    n_cig = u16(off + 16)
    flag = u16(off + 18)
    l_seq = u32(off + 20)
    nrefid = i32(off + 24)
    npos = i32(off + 28)
    tlen = i32(off + 32)
    block = u32(off)

    names = np.array(["*"] + ref_names)
    rname = names[refid + 1]
    # RNEXT: '=' when same as RNAME and mapped
    rnext = names[nrefid + 1]
    rnext = np.where((nrefid == refid) & (nrefid >= 0), "=", rnext)

    qname = ragged.gather_ranges(data, off + 36, l_rn - 1)
    cig_start = off + 36 + l_rn
    seq_start = cig_start + 4 * n_cig
    seq_bytes = (l_seq + 1) // 2
    qual_start = seq_start + seq_bytes
    aux_start = qual_start + l_seq
    rec_end = off + 4 + block

    # CIGAR: decode u32 ops vectorized
    cig_col = ragged.gather_ranges(data, cig_start, 4 * n_cig)
    craw = np.frombuffer(cig_col.data.tobytes(), "<u4").astype(np.int64)
    op_char = np.frombuffer(CIGAR_OPS, np.uint8)[craw & 15]
    op_len = craw >> 4
    num_col = ragged.itoa(op_len)
    ops_per_rec = n_cig
    pieces = ragged.interleave(
        [num_col, Col(op_char, np.arange(op_char.shape[0] + 1, dtype=np.int64))])
    # regroup per record: each record's cigar = concat of its n_cig pieces
    piece_of_rec = np.repeat(np.arange(n), ops_per_rec)
    rec_cig_lens = np.bincount(piece_of_rec, weights=pieces.lens,
                               minlength=n).astype(np.int64)
    cigar = Col(pieces.data, np.concatenate([[0], np.cumsum(rec_cig_lens)]))
    cigar_txt = ragged.merge_rows(
        n, [(np.nonzero(ops_per_rec > 0)[0],
             ragged.take(cigar, np.nonzero(ops_per_rec > 0)[0]))] +
           ([(np.nonzero(ops_per_rec == 0)[0],
              Col.from_list([b"*"] * int((ops_per_rec == 0).sum())))]
            if (ops_per_rec == 0).any() else []))

    # SEQ: nibble decode
    seq_col = ragged.gather_ranges(data, seq_start, seq_bytes)
    nib_tab = np.frombuffer(SEQ_NIBBLE, np.uint8)
    hi = nib_tab[seq_col.data >> 4]
    lo = nib_tab[seq_col.data & 15]
    expanded = np.empty(seq_col.data.shape[0] * 2, dtype=np.uint8)
    expanded[0::2] = hi
    expanded[1::2] = lo
    seq_full = Col(expanded, seq_col.offsets * 2)
    seq_txt = ragged.gather_ranges(seq_full.data, seq_full.offsets[:-1], l_seq)
    empty_seq = l_seq == 0
    if empty_seq.any():
        seq_txt = ragged.merge_rows(
            n, [(np.nonzero(~empty_seq)[0], ragged.take(seq_txt, np.nonzero(~empty_seq)[0])),
                (np.nonzero(empty_seq)[0], Col.from_list([b"*"] * int(empty_seq.sum())))])

    # QUAL: +33; 0xFF run means '*'
    qual_col = ragged.gather_ranges(data, qual_start, l_seq)
    qmissing = np.zeros(n, dtype=bool)
    fq = qual_col.data
    qual_txt = Col((fq + 33).astype(np.uint8), qual_col.offsets)
    first_q = np.where(l_seq > 0, fq[np.minimum(qual_col.offsets[:-1], max(fq.shape[0] - 1, 0))] if fq.shape[0] else 0, 0)
    qmissing = (first_q == 0xFF) | (l_seq == 0)
    if qmissing.any():
        qual_txt = ragged.merge_rows(
            n, [(np.nonzero(~qmissing)[0], ragged.take(qual_txt, np.nonzero(~qmissing)[0])),
                (np.nonzero(qmissing)[0], Col.from_list([b"*"] * int(qmissing.sum())))])

    # aux: per-record python decode (short strings)
    mv = memoryview(records)
    aux = Col.from_list([
        _aux_to_sam(mv[int(aux_start[i]):int(rec_end[i])]) for i in range(n)])

    t = b"\t"
    lines = ragged.interleave(
        [qname, ragged.itoa(flag), Col.from_list([s.encode() for s in rname]),
         ragged.itoa(pos + 1), ragged.itoa(mapq), cigar_txt,
         Col.from_list([s.encode() if s != "=" else b"=" for s in rnext]),
         ragged.itoa(npos + 1), ragged.itoa(tlen), seq_txt, qual_txt, aux],
        sep_after=[t, t, t, t, t, t, t, t, t, t, None, b"\n"])
    return lines.data.tobytes()
