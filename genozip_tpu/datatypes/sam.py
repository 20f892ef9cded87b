"""SAM datatype plugin (text alignment records).

Reference parity: src/sam_seg.c (field seg), src/sam_fields.c (aux),
src/sam_cigar.c, src/sam_qual.c, src/sam_header.c. TPU-first redesign:
whole-VB column split of the 11 fixed fields + raw aux remainder; QNAME and
CIGAR through the vectorized tokenizer (digit runs -> int streams), aux
through the tokenizer in single-stream mode; SEQ/QUAL as concatenated streams
with per-record length streams. The CIGAR-vs-reference SEQ diff, MD/NM
prediction, mate-copy and SAG/gencomp machinery are later milestones; BAM
binary parsing lives in datatypes/bam.py.
"""

import numpy as np

from . import DataType, VBSegResult, register
from ..utils import ragged
from ..utils.ragged import Col
from ..contexts import VBCtx, MODE_DICT, MODE_NUM, MODE_TXT, dedup_col
from ..seg import tokenizer_seg_col, tokenizer_recon_col

NUM_FIXED = 11


def _lines_of(data: np.ndarray):
    nl = np.nonzero(data == ord("\n"))[0]
    no_final_nl = data.shape[0] and (nl.shape[0] == 0 or nl[-1] != data.shape[0] - 1)
    if no_final_nl:
        nl = np.concatenate([nl, [data.shape[0]]])
    starts = np.concatenate([[0], nl[:-1] + 1])
    return ragged.gather_ranges(data, starts, nl - starts), bool(no_final_nl)


def _num_or_tok(name, col, delta=False):
    """Numeric context when every row parses as a clean integer, else
    tokenizer."""
    vals, ok = ragged.atoi(col)
    if ok.all():
        if delta:
            d = np.diff(vals, prepend=np.int64(0))
            return {name: VBCtx(name, MODE_NUM, local=d, cat="int", param=1)}
        return {name: VBCtx(name, MODE_NUM, local=vals, cat="int", param=0)}
    return tokenizer_seg_col(name, col)


def _recon_num_or_tok(name, pctxs, n):
    pc = pctxs.get(name)
    if pc is not None and pc.mode == MODE_NUM:
        return ragged.itoa(pc.nums())
    return tokenizer_recon_col(name, pctxs, n)


@register
class SamDT(DataType):
    NAME = "sam"

    def read_txt_header(self, reader) -> bytes:
        return reader.read_header_lines(b"@")

    def seg_vb(self, data: np.ndarray) -> VBSegResult:
        lines, no_final_nl = _lines_of(data)
        n = len(lines)
        cols, aux, good_rows, bad_rows = ragged.split_first_fields(
            lines, ord("\t"), NUM_FIXED)
        (qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen, seq,
         qual) = cols

        ctxs = {}
        ctxs.update(tokenizer_seg_col("QNAME", qname))
        ctxs.update(_num_or_tok("FLAG", flag))
        for nm, c in (("RNAME", rname), ("RNEXT", rnext)):
            uw, inv = dedup_col(c)
            ctxs[nm] = VBCtx(nm, MODE_DICT, b250=inv, vb_words=uw, cat="b250")
        ctxs.update(_num_or_tok("POS", pos, delta=True))
        ctxs.update(_num_or_tok("MAPQ", mapq))
        ctxs.update(tokenizer_seg_col("CIGAR", cigar))
        ctxs.update(_num_or_tok("PNEXT", pnext, delta=True))
        ctxs.update(_num_or_tok("TLEN", tlen))
        ref = getattr(self, "ref", None)
        if ref is not None and len(seq):
            self._seg_seq_vs_ref(ctxs, seq, rname, pos, cigar, ref)
        else:
            ctxs["NONREF"] = VBCtx("NONREF", MODE_TXT, local=seq.data, cat="seq")
        ctxs["SQLEN"] = VBCtx("SQLEN", MODE_NUM,
                              local=np.diff(seq.lens, prepend=np.int64(0)),
                              cat="int", param=1)
        ctxs["QUAL"] = VBCtx("QUAL", MODE_TXT, local=qual.data, cat="qual")
        ctxs["QLLEN"] = VBCtx("QLLEN", MODE_NUM,
                              local=np.diff(qual.lens, prepend=np.int64(0)),
                              cat="int", param=1)
        ctxs.update(tokenizer_seg_col("AUX", aux, single_stream=True))

        if bad_rows.shape[0]:
            uw, inv = dedup_col(ragged.take(lines, bad_rows))
            ctxs["EXC"] = VBCtx("EXC", MODE_DICT, b250=inv, vb_words=uw, cat="text")
        gd = np.zeros(n, dtype=np.int64)
        gd[bad_rows] = 1
        ctxs["VARIANT"] = VBCtx("VARIANT", MODE_NUM, local=gd, cat="int")
        return VBSegResult(ctxs, n, {"no_final_nl": no_final_nl})

    def _seg_seq_vs_ref(self, ctxs, seq, rname, pos, cigar, ref):
        """CIGAR-driven SEQ-vs-reference diff (reference parity:
        src/sam_seq.c sam_seg_SEQ). v1 scope: fully-matching CIGARs
        ('<len>M'); anything else (indels, clips, '*') stays verbatim in
        NONREF — correctness is never at stake, only ratio."""
        from ..ops import pack as packops

        n = len(seq)
        pv, pok = ragged.atoi(pos)
        # rname -> contig base gpos
        uw, inv = dedup_col(rname)
        base = np.full(len(uw), -1, dtype=np.int64)
        for w in range(len(uw)):
            c = ref.contig_of(uw.row(w).decode("utf-8", "replace"))
            if c is not None:
                base[w] = c["gpos"]
        gbase = base[inv]

        # CIGAR == "<seqlen>M"?
        cmat, clens = ragged.to_matrix(cigar)
        last = cmat[np.arange(n), np.maximum(clens - 1, 0)]
        cig_digits = ragged.gather_ranges(cigar.data, cigar.offsets[:-1],
                                          np.maximum(clens - 1, 0))
        cval, cok = ragged.atoi(cig_digits)
        seq_lens = seq.lens
        by_ref = (pok & cok & (last == ord("M")) & (cval == seq_lens)
                  & (gbase >= 0) & (pv > 0))
        gpos = gbase + pv - 1
        by_ref &= gpos + seq_lens <= ref.length

        smat, slens = ragged.to_matrix(seq)
        codes = packops.BASE2BIT[smat]
        L = smat.shape[1]
        pos_idx = np.arange(L)[None, :]
        safe = np.where(by_ref, gpos, 0)
        gwin = ref.codes[np.clip(safe[:, None] + pos_idx, 0, max(ref.length - 1, 0))]
        valid = (pos_idx < seq_lens[:, None]) & by_ref[:, None]
        mm = ((gwin != codes) | ~packops.IS_ACGT[smat]) & valid
        ridx, ppos = np.nonzero(mm)
        nm = np.bincount(ridx, minlength=n)[by_ref]

        ctxs["SQBITMAP"] = VBCtx("SQBITMAP", MODE_NUM,
                                 local=by_ref.astype(np.int64), cat="int")
        ctxs["SEQNM"] = VBCtx("SEQNM", MODE_NUM, local=nm, cat="int")
        ctxs["SEQMISP"] = VBCtx("SEQMISP", MODE_NUM, local=ppos, cat="int")
        ctxs["SEQMISB"] = VBCtx("SEQMISB", MODE_TXT, local=smat[ridx, ppos],
                                cat="text")
        nonref = ragged.take(seq, np.nonzero(~by_ref)[0])
        ctxs["NONREF"] = VBCtx("NONREF", MODE_TXT, local=nonref.data, cat="seq")

    def _recon_seq_vs_ref(self, pctxs, lens, pos_col, rname_col):
        from ..ops import pack as packops

        ref = getattr(self, "ref", None)
        assert ref is not None, "archive needs --reference for unzip"
        by_ref = pctxs["SQBITMAP"].nums().astype(bool)
        n = by_ref.shape[0]
        pv, _ = ragged.atoi(pos_col)
        uw, inv = dedup_col(rname_col)
        base = np.full(len(uw), -1, dtype=np.int64)
        for w in range(len(uw)):
            c = ref.contig_of(uw.row(w).decode("utf-8", "replace"))
            if c is not None:
                base[w] = c["gpos"]
        gpos = (base[inv] + pv - 1)[by_ref]
        a_lens = lens[by_ref]
        nm = pctxs["SEQNM"].nums()
        mpos = pctxs["SEQMISP"].nums()
        mbase = pctxs["SEQMISB"].local
        L = int(a_lens.max()) if a_lens.shape[0] else 0
        pos_idx = np.arange(max(L, 1))[None, :]
        gwin = ref.codes[np.clip(gpos[:, None] + pos_idx, 0, max(ref.length - 1, 0))] \
            if a_lens.shape[0] else np.zeros((0, 1), np.uint8)
        mat = packops.ACGT[gwin]
        mm_ridx = np.repeat(np.arange(gpos.shape[0]), nm)
        mat[mm_ridx, mpos] = mbase
        a_col = ragged.from_matrix(mat, a_lens)
        un_idx = np.nonzero(~by_ref)[0]
        nonref = pctxs["NONREF"].txt_col(lens[un_idx])
        return ragged.merge_rows(n, [(np.nonzero(by_ref)[0], a_col),
                                     (un_idx, nonref)])

    def recon_vb(self, pctxs: dict, meta: dict) -> bytes:
        n = meta["num_lines"]
        gd = pctxs["VARIANT"].nums()
        good_idx = np.nonzero(gd == 0)[0]
        bad_idx = np.nonzero(gd == 1)[0]
        ng = good_idx.shape[0]

        if ng:
            qname = tokenizer_recon_col("QNAME", pctxs, ng)
            flag = _recon_num_or_tok("FLAG", pctxs, ng)
            rname = pctxs["RNAME"].dict_take()
            pos = _recon_num_or_tok("POS", pctxs, ng)
            mapq = _recon_num_or_tok("MAPQ", pctxs, ng)
            cigar = tokenizer_recon_col("CIGAR", pctxs, ng)
            rnext = pctxs["RNEXT"].dict_take()
            pnext = _recon_num_or_tok("PNEXT", pctxs, ng)
            tlen = _recon_num_or_tok("TLEN", pctxs, ng)
            sqlens = pctxs["SQLEN"].nums()
            if "SQBITMAP" in pctxs:
                seq = self._recon_seq_vs_ref(pctxs, sqlens, pos, rname)
            else:
                seq = pctxs["NONREF"].txt_col(sqlens)
            qual = pctxs["QUAL"].txt_col(pctxs["QLLEN"].nums())
            aux = tokenizer_recon_col("AUX", pctxs, ng)
            t = b"\t"
            glines = ragged.interleave(
                [qname, flag, rname, pos, mapq, cigar, rnext, pnext, tlen,
                 seq, qual, aux],
                sep_after=[t, t, t, t, t, t, t, t, t, t, None, None])
        else:
            glines = Col.from_list([])

        parts = [(good_idx, glines)]
        if bad_idx.shape[0]:
            parts.append((bad_idx, pctxs["EXC"].dict_take()))
        all_lines = ragged.merge_rows(n, parts)
        out = ragged.interleave([all_lines], sep_after=[b"\n"])
        raw = out.data.tobytes()
        if meta.get("no_final_nl"):
            raw = raw[:-1]
        return raw
