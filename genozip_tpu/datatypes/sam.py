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

    def gencomp_split(self, data: np.ndarray):
        """Deport secondary/supplementary alignments (DEPN) out of the MAIN
        VB (reference parity: src/gencomp_zip.c:587 — PRIM/DEPN generated
        components; here one DEPN component re-interleaved by a recon plan).
        Returns (main_data, depn_data, depn_line_positions) or None when
        nothing to deport."""
        nl = np.nonzero(data == ord("\n"))[0]
        if data.shape[0] == 0 or nl.shape[0] == 0 or nl[-1] != data.shape[0] - 1:
            return None  # keep the tail VB simple
        starts = np.concatenate([[0], nl[:-1] + 1])
        lines = ragged.gather_ranges(data, starts, nl - starts)
        n = len(lines)
        cols, aux, good_rows, bad_rows = ragged.split_first_fields(
            lines, ord("\t"), 2)
        flags, fok = ragged.atoi(cols[1])
        depn = np.zeros(n, dtype=bool)
        depn[good_rows] = fok & ((flags & 0x900) != 0)
        if not depn.any():
            return None
        didx = np.nonzero(depn)[0]
        midx = np.nonzero(~depn)[0]
        # include the trailing newline with each line (raw-data offsets)
        lens = nl - starts + 1
        main = ragged.gather_ranges(data, starts[midx], lens[midx]).data
        dep = ragged.gather_ranges(data, starts[didx], lens[didx]).data
        # positions: row index within the MAIN-only VB after which each DEPN
        # line re-inserts (as counts of main lines before it)
        before_main = np.cumsum(~depn)[didx] if didx.shape[0] else didx
        return main, dep, before_main.astype(np.int64)

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
        # PNEXT as mate-delta vs POS (reference mate-copy snips,
        # sam_seg.c:27-60): insert-size-scale values instead of a delta chain
        pv_, pok_ = ragged.atoi(pos)
        pn_, nok_ = ragged.atoi(pnext)
        if pok_.all() and nok_.all() and len(pos):
            ctxs["PNEXT"] = VBCtx("PNEXT", MODE_NUM, local=pn_ - pv_,
                                  cat="int", param=3)
        else:
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

    # CIGAR op classification (SAMv1): which ops consume read / reference
    _READ_OPS = frozenset(b"MIS=X")
    _REF_OPS = frozenset(b"MDN=X")
    _MATCH_OPS = frozenset(b"M=X")
    _ALL_OPS = frozenset(b"MIDNSHP=X")

    def _gbase_of(self, rname_col, ref):
        uw, inv = dedup_col(rname_col)
        base = np.full(len(uw), -1, dtype=np.int64)
        for w in range(len(uw)):
            c = ref.contig_of(uw.row(w).decode("utf-8", "replace"))
            if c is not None:
                base[w] = c["gpos"]
        return base[inv]

    def _cigar_groups(self, cigar, n):
        """Group rows by CIGAR template. Yields (rows, op_letters, oplen
        matrix (len(rows), k)) for eligible templates; rows of ineligible
        templates are never yielded."""
        from .. import native
        if not native.available():
            return
        tmpl_data, tmpl_lens, vals, tok = native.tokenize(
            np.ascontiguousarray(cigar.data), cigar.offsets, 1 << 30)
        tmpl = Col(tmpl_data, np.concatenate([[0], np.cumsum(tmpl_lens)]))
        uw, inv = dedup_col(tmpl)
        # op-length values are row-major; rows sharing a template share count k
        marks_per_word = np.array(
            [uw.row(w).count(b"\x01") for w in range(len(uw))], dtype=np.int64)
        per_row = marks_per_word[inv]
        val_off = np.concatenate([[0], np.cumsum(per_row)])
        for w in range(len(uw)):
            word = uw.row(w)
            k = int(marks_per_word[w])
            ops = word.replace(b"\x01", b"")
            # template must be exactly '\x01<op>' * k (a numeric length
            # before every op letter)
            if k == 0 or len(ops) != k or not set(ops) <= self._ALL_OPS or \
                    word != b"".join(b"\x01" + ops[j:j + 1] for j in range(k)):
                continue
            if not (set(ops) & self._MATCH_OPS):
                continue  # no matching segment: nothing to gain
            rows = np.nonzero(inv == w)[0]
            oplens = np.empty((rows.shape[0], k), dtype=np.int64)
            for j in range(k):
                oplens[:, j] = vals[val_off[rows] + j]
            yield rows, ops, oplens

    def _seg_seq_vs_ref(self, ctxs, seq, rname, pos, cigar, ref):
        """CIGAR-driven SEQ-vs-reference diff (reference parity:
        src/sam_seq.c sam_seg_SEQ): general CIGARs grouped by template —
        M/=/X segments diff against the genome (sparse mismatch channels),
        I/S segments ride in NONREF, D/N skip reference. Ineligible rows
        (unmapped, '*', bad contig, length mismatch) stay verbatim in
        NONREF — correctness is never at stake, only ratio."""
        from ..ops import pack as packops

        n = len(seq)
        pv, pok = ragged.atoi(pos)
        gbase = self._gbase_of(rname, ref)
        seq_lens = seq.lens
        gpos0 = gbase + pv - 1
        smat, _ = ragged.to_matrix(seq)
        codes = packops.BASE2BIT[smat]
        G = ref.length

        by_ref = np.zeros(n, dtype=bool)
        mm_rows, mm_pos, mm_base = [], [], []
        for rows, ops, oplens in self._cigar_groups(cigar, n):
            read_len = oplens[:, [j for j in range(len(ops))
                                  if ops[j] in self._READ_OPS]].sum(axis=1) \
                if any(o in self._READ_OPS for o in ops) else np.zeros(rows.shape[0], np.int64)
            ref_len = oplens[:, [j for j in range(len(ops))
                                 if ops[j] in self._REF_OPS]].sum(axis=1) \
                if any(o in self._REF_OPS for o in ops) else np.zeros(rows.shape[0], np.int64)
            ok = (pok[rows] & (gbase[rows] >= 0) & (pv[rows] > 0)
                  & (read_len == seq_lens[rows])
                  & (gpos0[rows] >= 0) & (gpos0[rows] + ref_len <= G))
            rows = rows[ok]
            if rows.shape[0] == 0:
                continue
            oplens = oplens[ok]
            by_ref[rows] = True
            # walk ops; compare match segments
            roff = np.zeros(rows.shape[0], dtype=np.int64)
            goff = gpos0[rows].copy()
            for j, op in enumerate(ops):
                Lj = oplens[:, j]
                if op in self._MATCH_OPS:
                    Lmax = int(Lj.max())
                    pidx = np.arange(Lmax)[None, :]
                    valid = pidx < Lj[:, None]
                    sidx = np.clip(roff[:, None] + pidx, 0, smat.shape[1] - 1)
                    swin = np.take_along_axis(codes[rows], sidx, axis=1)
                    bwin = np.take_along_axis(smat[rows], sidx, axis=1)
                    gidx = np.clip(goff[:, None] + pidx, 0, max(G - 1, 0))
                    gwin = ref.codes[gidx]
                    mm = ((gwin != swin) | ~packops.IS_ACGT[bwin]) & valid
                    ri, pj = np.nonzero(mm)
                    mm_rows.append(rows[ri])
                    mm_pos.append(roff[ri] + pj)
                    mm_base.append(bwin[ri, pj])
                if op in self._READ_OPS:
                    roff += Lj
                if op in self._REF_OPS:
                    goff += Lj

        # mismatch channels, sorted by (row, read position)
        if mm_rows:
            mr = np.concatenate(mm_rows)
            mp = np.concatenate(mm_pos)
            mb = np.concatenate(mm_base)
            order = np.lexsort((mp, mr))
            mr, mp, mb = mr[order], mp[order], mb[order]
        else:
            mr = np.zeros(0, np.int64)
            mp = np.zeros(0, np.int64)
            mb = np.zeros(0, np.uint8)
        nm = np.bincount(mr, minlength=n)[by_ref]

        ctxs["SQBITMAP"] = VBCtx("SQBITMAP", MODE_NUM,
                                 local=by_ref.astype(np.int64), cat="int")
        ctxs["SEQNM"] = VBCtx("SEQNM", MODE_NUM, local=nm, cat="int")
        ctxs["SEQMISP"] = VBCtx("SEQMISP", MODE_NUM, local=mp, cat="int")
        ctxs["SEQMISB"] = VBCtx("SEQMISB", MODE_TXT, local=mb, cat="text")

        # NONREF: whole seq for non-by-ref rows; I/S segments for by-ref rows
        nonref_parts = self._nonref_stream(seq, cigar, by_ref, n)
        ctxs["NONREF"] = VBCtx("NONREF", MODE_TXT, local=nonref_parts,
                               cat="seq")

    def _nonref_stream(self, seq, cigar, by_ref, n):
        """Row-order NONREF bytes: full seq (non-by-ref rows) or I/S segments
        in op order (by-ref rows) — a sorted piece list + one ragged gather."""
        MAXOPS = 1 << 20
        p_starts = [seq.offsets[:-1][~by_ref]]
        p_lens = [seq.lens[~by_ref]]
        p_keys = [np.nonzero(~by_ref)[0] * MAXOPS]
        for rows, ops, oplens in self._cigar_groups(cigar, n):
            sel = by_ref[rows]
            rows = rows[sel]
            if rows.shape[0] == 0 or not any(o in b"IS" for o in ops):
                continue
            oplens = oplens[sel]
            roff = np.zeros(rows.shape[0], dtype=np.int64)
            for j, op in enumerate(ops):
                Lj = oplens[:, j]
                if op in b"IS":
                    p_starts.append(seq.offsets[:-1][rows] + roff)
                    p_lens.append(Lj)
                    p_keys.append(rows * MAXOPS + j + 1)
                if op in self._READ_OPS:
                    roff = roff + Lj
        starts = np.concatenate(p_starts)
        lens = np.concatenate(p_lens)
        keys = np.concatenate(p_keys)
        order = np.argsort(keys, kind="stable")
        col = ragged.gather_ranges(seq.data, starts[order], lens[order])
        return col.data

    def _recon_seq_vs_ref(self, pctxs, lens, pos_col, rname_col, cigar_col):
        from ..ops import pack as packops

        ref = getattr(self, "ref", None)
        assert ref is not None, "archive needs --reference for unzip"
        by_ref = pctxs["SQBITMAP"].nums().astype(bool)
        n = by_ref.shape[0]
        pv, _ = ragged.atoi(pos_col)
        gbase = self._gbase_of(rname_col, ref)
        gpos0 = gbase + pv - 1
        nm = pctxs["SEQNM"].nums()
        mp = pctxs["SEQMISP"].nums()
        mb = pctxs["SEQMISB"].local
        nonref = pctxs["NONREF"].local
        G = ref.length

        # per-row NONREF byte need
        need = np.where(~by_ref, lens, 0).astype(np.int64)
        ins_of = {}
        for rows, ops, oplens in self._cigar_groups(cigar_col, n):
            has_ins = any(o in b"IS" for o in ops)
            sel = by_ref[rows]
            if not has_ins or not sel.any():
                continue
            ins_len = oplens[:, [j for j in range(len(ops))
                                 if ops[j] in b"IS"]].sum(axis=1)
            need[rows[sel]] = ins_len[sel]
        nr_off = np.concatenate([[0], np.cumsum(need)])
        assert nr_off[-1] == nonref.shape[0], "NONREF stream length mismatch"

        # per-by-ref-row mismatch slices
        mm_row_of = np.repeat(np.nonzero(by_ref)[0], nm)
        mm_off = np.concatenate([[0], np.cumsum(
            np.bincount(mm_row_of, minlength=n))])

        L = int(lens.max()) if n else 0
        out = np.zeros((n, max(L, 1)), dtype=np.uint8)
        # non-by-ref rows: one ragged gather into the matrix
        un = np.nonzero(~by_ref)[0]
        if un.shape[0]:
            sub = ragged.gather_ranges(nonref, nr_off[un], lens[un])
            m, _ = ragged.to_matrix(sub)
            out[un, :m.shape[1]] = m

        for rows, ops, oplens in self._cigar_groups(cigar_col, n):
            sel = by_ref[rows]
            rows = rows[sel]
            if rows.shape[0] == 0:
                continue
            oplens = oplens[sel]
            roff = np.zeros(rows.shape[0], dtype=np.int64)
            goff = gpos0[rows].copy()
            ins_cursor = nr_off[rows].copy()
            for j, op in enumerate(ops):
                Lj = oplens[:, j]
                if op in self._MATCH_OPS:
                    Lmax = int(Lj.max()) if Lj.shape[0] else 0
                    if Lmax:
                        pidx = np.arange(Lmax)[None, :]
                        valid = pidx < Lj[:, None]
                        gidx = np.clip(goff[:, None] + pidx, 0, max(G - 1, 0))
                        seg = packops.ACGT[ref.codes[gidx]]
                        didx = np.clip(roff[:, None] + pidx, 0, out.shape[1] - 1)
                        cur = np.take_along_axis(out[rows], didx, axis=1)
                        np.put_along_axis(
                            out2 := out[rows], didx,
                            np.where(valid, seg, cur), axis=1)
                        out[rows] = out2
                elif op in b"IS":
                    # insertion/softclip bytes from NONREF (python loop over
                    # rows of this op — insertions are sparse)
                    for i, r in enumerate(rows):
                        l = int(Lj[i])
                        if l:
                            out[r, roff[i]:roff[i] + l] = \
                                nonref[ins_cursor[i]:ins_cursor[i] + l]
                            ins_cursor[i] += l
                if op in self._READ_OPS:
                    roff = roff + Lj
                if op in self._REF_OPS:
                    goff = goff + Lj
        # apply all mismatch patches at once (row-major order by build)
        out[mm_row_of, mp] = mb
        a_col = ragged.from_matrix(out, lens)
        return a_col

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
            pc_pn = pctxs.get("PNEXT")
            if pc_pn is not None and pc_pn.mode == MODE_NUM and pc_pn.param == 3:
                pv_, _ = ragged.atoi(pos)
                pnext = ragged.itoa(pv_ + pc_pn.local.astype(np.int64))
            else:
                pnext = _recon_num_or_tok("PNEXT", pctxs, ng)
            tlen = _recon_num_or_tok("TLEN", pctxs, ng)
            sqlens = pctxs["SQLEN"].nums()
            if "SQBITMAP" in pctxs:
                seq = self._recon_seq_vs_ref(pctxs, sqlens, pos, rname, cigar)
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
