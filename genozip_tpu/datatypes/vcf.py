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
                if fname in ("CHROM", "REF", "ALT", "FILTER", "FORMAT"):
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
                    ctxs.update(tokenizer_seg_col("INFO", col, single_stream=True))
            if nf > 9:
                # sample matrix: join sample fields back with \t, one column
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
                if fname in ("CHROM", "REF", "ALT", "FILTER", "FORMAT"):
                    cols.append(pctxs[fname].dict_take())
                elif fname == "POS" and "POS" in pctxs and pctxs["POS"].mode == MODE_NUM:
                    cols.append(ragged.itoa(pctxs["POS"].nums()))
                else:
                    cols.append(tokenizer_recon_col(fname, pctxs, ng))
                seps.append(b"\t")
            if nf > 9:
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
