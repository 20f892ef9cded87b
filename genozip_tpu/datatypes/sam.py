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
            seq = pctxs["NONREF"].txt_col(pctxs["SQLEN"].nums())
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
