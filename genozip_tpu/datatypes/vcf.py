"""VCF datatype plugin.

Reference parity: src/vcf_seg.c, src/vcf_info.c, src/vcf_samples.c,
src/vcf_header.c. TPU-first redesign: tab-split whole-VB columns; CHROM/REF/
ALT/FILTER/FORMAT as dict contexts; POS delta-coded; ID/QUAL/INFO through the
vectorized tokenizer; the sample matrix through the tokenizer in single-stream
mode (one value stream — the genotype-matrix PBWT codec supersedes this for GT
in a later milestone). Rows whose tab count differs from the VB's dominant
shape round-trip via a verbatim exception context.
"""

import numpy as np

from . import DataType, VBSegResult, register
from ..utils import ragged
from ..utils.ragged import Col
from ..contexts import VBCtx, MODE_DICT, MODE_NUM, dedup_col
from ..seg import tokenizer_seg_col, tokenizer_recon_col

FIELD_CTXS = ["CHROM", None, "ID", "REF", "ALT", None, "FILTER", None]  # dict ones


def _lines_of(data: np.ndarray):
    nl = np.nonzero(data == ord("\n"))[0]
    no_final_nl = data.shape[0] and (nl.shape[0] == 0 or nl[-1] != data.shape[0] - 1)
    if no_final_nl:
        nl = np.concatenate([nl, [data.shape[0]]])
    starts = np.concatenate([[0], nl[:-1] + 1])
    return ragged.gather_ranges(data, starts, nl - starts), bool(no_final_nl)


@register
class VcfDT(DataType):
    NAME = "vcf"

    def read_txt_header(self, reader) -> bytes:
        return reader.read_header_lines(b"#")

    def seg_vb(self, data: np.ndarray) -> VBSegResult:
        lines, no_final_nl = _lines_of(data)
        n = len(lines)
        tabs = ragged.count_sep_per_row(lines, ord("\t"))
        counts = np.bincount(tabs)
        dominant = int(np.argmax(counts)) if counts.shape[0] else 0
        good = tabs == dominant
        good_idx = np.nonzero(good)[0]
        exc_idx = np.nonzero(~good)[0]

        ctxs = {}
        nf = dominant + 1
        glines = ragged.take(lines, good_idx)
        fields = ragged.split_fields_fixed(glines, ord("\t"), nf) if len(glines) else []

        if fields:
            for fi, fname in enumerate(["CHROM", "POS", "ID", "REF", "ALT",
                                        "QUAL", "FILTER", "INFO", "FORMAT"][:min(nf, 9)]):
                col = fields[fi]
                if fname == "REF" and getattr(self, "ref", None) is not None:
                    self._seg_ref_vs_genome(ctxs, fields, col)
                elif fname in ("CHROM", "REF", "ALT", "FILTER", "FORMAT"):
                    uw, inv = dedup_col(col)
                    ctxs[fname] = VBCtx(fname, MODE_DICT, b250=inv, vb_words=uw, cat="b250")
                elif fname == "POS":
                    vals, ok = ragged.atoi(col)
                    if ok.all():
                        d = np.diff(vals, prepend=np.int64(0))
                        ctxs["POS"] = VBCtx("POS", MODE_NUM, local=d, cat="int", param=1)
                    else:
                        ctxs.update(tokenizer_seg_col("POS", col))
                elif fname in ("ID", "QUAL"):
                    ctxs.update(tokenizer_seg_col(fname, col))
                elif fname == "INFO":
                    # per-position streams ~= per-tag contexts when the tag
                    # structure is uniform (reference: per-INFO-tag
                    # sub-contexts, src/vcf_info.c)
                    ctxs.update(tokenizer_seg_col("INFO", col, max_tokens=64))
            if nf > 9:
                if not self._try_seg_gt_pbwt(ctxs, fields, nf):
                    # fallback: join sample fields with \t, one tokenized column
                    smp = ragged.interleave(fields[9:],
                                            sep_after=[b"\t"] * (nf - 10) + [None])
                    ctxs.update(tokenizer_seg_col("SMP", smp, single_stream=True))

        if exc_idx.shape[0]:
            uw, inv = dedup_col(ragged.take(lines, exc_idx))
            ctxs["EXC"] = VBCtx("EXC", MODE_DICT, b250=inv, vb_words=uw, cat="text")
        gd = np.zeros(n, dtype=np.int64)
        gd[good_idx] = 0
        gd[exc_idx] = 1
        ctxs["VARIANT"] = VBCtx("VARIANT", MODE_NUM, local=gd, cat="int")
        meta = {"no_final_nl": no_final_nl, "nf": nf}
        return VBSegResult(ctxs, n, meta)

    def _gpos_of(self, chrom_col, pos_col, ref):
        """Per-row genome position (or -1) from CHROM/POS."""
        pv, pok = ragged.atoi(pos_col)
        uw, inv = dedup_col(chrom_col)
        base = np.full(len(uw), -1, dtype=np.int64)
        for w in range(len(uw)):
            nm = uw.row(w).decode("utf-8", "replace")
            c = ref.contig_of(nm) or ref.contig_of("chr" + nm)
            if c is not None:
                base[w] = c["gpos"]
        g = np.where(pok & (base[inv] >= 0) & (pv > 0), base[inv] + pv - 1, -1)
        return np.where(g < ref.length, g, -1)

    def _seg_ref_vs_genome(self, ctxs, fields, ref_col):
        """REF column vs the reference genome (reference parity: RefAlt
        prediction, src/vcf_refalt.c): single-base REFs matching the genome
        at POS cost one flag bit; the rest stay in the dict."""
        from ..ops import pack as packops
        ref = self.ref
        gpos = self._gpos_of(fields[0], fields[1], ref)
        mat, lens = ragged.to_matrix(ref_col)
        first = mat[:, 0] if mat.shape[1] else np.zeros(len(ref_col), np.uint8)
        gb = packops.ACGT[ref.codes[np.clip(gpos, 0, max(ref.length - 1, 0))]]
        same = (lens == 1) & (gpos >= 0) & (first == gb)
        ctxs["REFSAME"] = VBCtx("REFSAME", MODE_NUM,
                                local=same.astype(np.int64), cat="int")
        rest = ragged.take(ref_col, np.nonzero(~same)[0])
        uw, inv = dedup_col(rest)
        ctxs["REF"] = VBCtx("REF", MODE_DICT, b250=inv, vb_words=uw, cat="b250")

    def _recon_ref_vs_genome(self, pctxs, chrom_col, pos_col, ng):
        from ..ops import pack as packops
        ref = getattr(self, "ref", None)
        assert ref is not None, "archive needs --reference for unzip"
        same = pctxs["REFSAME"].nums().astype(bool)
        gpos = self._gpos_of(chrom_col, pos_col, ref)
        gb = packops.ACGT[ref.codes[np.clip(gpos, 0, max(ref.length - 1, 0))]]
        same_col = Col(gb[same], np.arange(int(same.sum()) + 1, dtype=np.int64))
        rest = pctxs["REF"].dict_take()
        return ragged.merge_rows(ng, [(np.nonzero(same)[0], same_col),
                                      (np.nonzero(~same)[0], rest)])

    def _try_seg_gt_pbwt(self, ctxs, fields, nf):
        """GT-first sample matrices go through the PBWT haplotype transform
        (reference parity: src/codec_pbwt.c, src/vcf_format_GT.c). Handles the
        common shape: every sample cell is `a<sep>b[:rest]` with single-char
        alleles (digit or '.') and sep in '/|'. Anything else falls back to
        the tokenizer path (returns False)."""
        from ..ops.pbwt import pbwt_encode

        fmt_col = fields[8]
        fm, fl = ragged.to_matrix(fmt_col)
        if fm.shape[1] < 2:
            return False
        ok = (fl >= 2) & (fm[:, 0] == ord("G")) & (fm[:, 1] == ord("T"))
        if fm.shape[1] > 2:
            ok &= (fl == 2) | (fm[:, 2] == ord(":"))
        if not ok.all():
            return False

        S = nf - 9
        n = len(fields[9])
        A = np.empty((n, 2 * S), dtype=np.uint8)
        phase = np.empty((n, S), dtype=np.uint8)
        rests = []
        for s in range(S):
            col = fields[9 + s]
            mat, lens = ragged.to_matrix(col)
            if mat.shape[1] < 3 or not (lens >= 3).all():
                return False
            a1, sep, a2 = mat[:, 0], mat[:, 1], mat[:, 2]
            is_allele = lambda c: ((c >= ord("0")) & (c <= ord("9"))) | (c == ord("."))
            good = is_allele(a1) & is_allele(a2) & \
                ((sep == ord("/")) | (sep == ord("|")))
            if mat.shape[1] > 3:
                good &= (lens == 3) | (mat[:, 3] == ord(":"))
            if not good.all():
                return False
            conv = lambda c: np.where(c == ord("."), 10, c - ord("0")).astype(np.uint8)
            A[:, 2 * s] = conv(a1)
            A[:, 2 * s + 1] = conv(a2)
            phase[:, s] = (sep == ord("|")).astype(np.uint8)
            rests.append(ragged.gather_ranges(col.data, col.offsets[:-1] + 3,
                                              lens - 3))

        Y = pbwt_encode(A)
        ctxs["PBWT"] = VBCtx("PBWT", MODE_NUM, local=Y.reshape(-1).astype(np.int64),
                             cat="pbwt")
        ctxs["GTPHASE"] = VBCtx("GTPHASE", MODE_NUM,
                                local=phase.reshape(-1).astype(np.int64),
                                cat="int")
        smpr = ragged.interleave(rests, sep_after=[b"\t"] * (S - 1) + [None])
        ctxs.update(tokenizer_seg_col("SMPR", smpr, single_stream=True))
        return True

    def _recon_gt_pbwt(self, pctxs, ng, nf):
        from ..ops.pbwt import pbwt_decode

        S = nf - 9
        Y = pctxs["PBWT"].nums().astype(np.uint8).reshape(ng, 2 * S)
        A = pbwt_decode(Y)
        phase = pctxs["GTPHASE"].nums().astype(np.uint8).reshape(ng, S)
        smpr = tokenizer_recon_col("SMPR", pctxs, ng)
        rests = ragged.split_fields_fixed(smpr, ord("\t"), S)
        unconv = lambda c: np.where(c == 10, ord("."), c + ord("0")).astype(np.uint8)
        cols, seps = [], []
        for s in range(S):
            gt3 = np.empty((ng, 3), dtype=np.uint8)
            gt3[:, 0] = unconv(A[:, 2 * s])
            gt3[:, 1] = np.where(phase[:, s] == 1, ord("|"), ord("/"))
            gt3[:, 2] = unconv(A[:, 2 * s + 1])
            sample = ragged.interleave([Col.from_fixed(gt3), rests[s]],
                                       sep_after=[None, None])
            cols.append(sample)
            seps.append(b"\t" if s < S - 1 else None)
        return ragged.interleave(cols, sep_after=seps)

    def recon_vb(self, pctxs: dict, meta: dict) -> bytes:
        n = meta["num_lines"]
        nf = meta["nf"]
        gd = pctxs["VARIANT"].nums()
        good_idx = np.nonzero(gd == 0)[0]
        exc_idx = np.nonzero(gd == 1)[0]
        ng = good_idx.shape[0]

        cols, seps = [], []
        if ng:
            names = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
                     "INFO", "FORMAT"][:min(nf, 9)]
            for fname in names:
                if fname == "REF" and "REFSAME" in pctxs:
                    cols.append(self._recon_ref_vs_genome(
                        pctxs, cols[0], cols[1], ng))
                elif fname in ("CHROM", "REF", "ALT", "FILTER", "FORMAT"):
                    cols.append(pctxs[fname].dict_take())
                elif fname == "POS" and "POS" in pctxs and pctxs["POS"].mode == MODE_NUM:
                    cols.append(ragged.itoa(pctxs["POS"].nums()))
                else:
                    cols.append(tokenizer_recon_col(fname, pctxs, ng))
                seps.append(b"\t")
            if nf > 9:
                if "PBWT" in pctxs:
                    cols.append(self._recon_gt_pbwt(pctxs, ng, nf))
                else:
                    cols.append(tokenizer_recon_col("SMP", pctxs, ng))
                seps.append(None)
            else:
                seps[-1] = None
            glines = ragged.interleave(cols, sep_after=seps)
        else:
            glines = Col.from_list([])

        parts = [(good_idx, glines)]
        if exc_idx.shape[0]:
            parts.append((exc_idx, pctxs["EXC"].dict_take()))
        lines = ragged.merge_rows(n, parts)
        out = ragged.interleave([lines], sep_after=[b"\n"])
        raw = out.data.tobytes()
        if meta.get("no_final_nl"):
            raw = raw[:-1]
        return raw
