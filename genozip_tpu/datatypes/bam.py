"""BAM datatype plugin (binary alignment records; BGZF handled by the gz
input layer — correctness bar is byte-exact round-trip of the uncompressed
BAM stream, like the reference's digest over txt data).

Reference parity: src/bam_seg.c (record parsing), src/sam.h record layout,
src/bam_seq.c (4-bit SEQ codes). TPU-first redesign: the native scanner
(native/gxz_native.cpp gxz_bam_scan) walks the serial block_size chain; all
field extraction is then vectorized numpy over record offsets — no per-record
python. Alignment-record layout (SAMv1 spec §4.2):
  u32 block_size; i32 refID, pos; u8 l_read_name, mapq; u16 bin, n_cigar_op,
  flag; u32 l_seq; i32 next_refID, next_pos, tlen; char read_name[l_rn];
  u32 cigar[n_cigar]; u8 seq[(l_seq+1)/2]; u8 qual[l_seq]; aux...
"""

import numpy as np

from . import DataType, VBSegResult, register
from .. import native
from ..utils import ragged
from ..utils.ragged import Col
from ..contexts import VBCtx, MODE_DICT, MODE_NUM, MODE_TXT, dedup_col
from ..seg import tokenizer_seg_col, tokenizer_recon_col

MAX_RECORDS_PER_VB = 1 << 22


def _u32(data, off):
    return (data[off].astype(np.uint32) | (data[off + 1].astype(np.uint32) << 8)
            | (data[off + 2].astype(np.uint32) << 16)
            | (data[off + 3].astype(np.uint32) << 24))


def _u16(data, off):
    return data[off].astype(np.uint32) | (data[off + 1].astype(np.uint32) << 8)


def _i32(data, off):
    return _u32(data, off).astype(np.int32).astype(np.int64)


@register
class BamDT(DataType):
    NAME = "bam"

    def read_txt_header(self, reader) -> bytes:
        """Consume magic + SAM header text + reference catalog, verbatim."""
        head = reader.peek(12)
        assert head[:4] == b"BAM\x01", "not a BAM stream"
        l_text = int.from_bytes(head[4:8], "little")
        reader.peek(12 + l_text)
        n_ref = int.from_bytes(reader.peek(12 + l_text)[8 + l_text:12 + l_text], "little")
        # walk refs
        need = 12 + l_text
        for _ in range(n_ref):
            buf = reader.peek(need + 4)
            l_name = int.from_bytes(buf[need:need + 4], "little")
            need += 8 + l_name
            reader.peek(need)
        hdr = reader.peek(need)[:need]
        reader.buf = reader.buf[need:]
        return hdr

    def vb_boundary(self, data: np.ndarray, is_eof: bool) -> int:
        if not native.available():
            raise RuntimeError("BAM requires the native runtime")
        offsets, consumed = native.bam_scan(data, MAX_RECORDS_PER_VB)
        if is_eof and consumed != data.shape[0]:
            raise ValueError("BAM input ends mid-record")
        return consumed

    def seg_vb(self, data: np.ndarray) -> VBSegResult:
        offsets, consumed = native.bam_scan(data, MAX_RECORDS_PER_VB)
        assert consumed == data.shape[0]
        off = offsets
        n = off.shape[0]

        refid = _i32(data, off + 4)
        pos = _i32(data, off + 8)
        l_rn = data[off + 12].astype(np.int64)
        mapq = data[off + 13].astype(np.int64)
        bin_ = _u16(data, off + 14).astype(np.int64)
        n_cig = _u16(data, off + 16).astype(np.int64)
        flag = _u16(data, off + 18).astype(np.int64)
        l_seq = _u32(data, off + 20).astype(np.int64)
        nrefid = _i32(data, off + 24)
        npos = _i32(data, off + 28)
        tlen = _i32(data, off + 32)
        block_size = _u32(data, off).astype(np.int64)

        name_start = off + 36
        cig_start = name_start + l_rn
        seq_start = cig_start + 4 * n_cig
        seq_bytes = (l_seq + 1) // 2
        qual_start = seq_start + seq_bytes
        aux_start = qual_start + l_seq
        rec_end = off + 4 + block_size

        # read_name without trailing NUL (re-added at recon)
        name = ragged.gather_ranges(data, name_start, l_rn - 1)
        cigar = ragged.gather_ranges(data, cig_start, 4 * n_cig)
        seq = ragged.gather_ranges(data, seq_start, seq_bytes)
        qual = ragged.gather_ranges(data, qual_start, l_seq)
        aux = ragged.gather_ranges(data, aux_start, rec_end - aux_start)

        ctxs = {}
        ctxs.update(tokenizer_seg_col("QNAME", name))
        for nm, vals, delta in (("RNAME", refid, False), ("POS", pos, True),
                                ("MAPQ", mapq, False), ("BIN", bin_, False),
                                ("FLAG", flag, False), ("PNEXT", npos, True),
                                ("RNEXT", nrefid, False), ("TLEN", tlen, False),
                                ("NCIG", n_cig, False)):
            v = np.diff(vals, prepend=np.int64(0)) if delta else vals
            ctxs[nm] = VBCtx(nm, MODE_NUM, local=v, cat="int",
                             param=1 if delta else 0)
        ctxs["SQLEN"] = VBCtx("SQLEN", MODE_NUM,
                              local=np.diff(l_seq, prepend=np.int64(0)),
                              cat="int", param=1)
        ctxs["CIGAR"] = VBCtx("CIGAR", MODE_TXT, local=cigar.data, cat="int")
        ctxs["SEQBIN"] = VBCtx("SEQBIN", MODE_TXT, local=seq.data, cat="seq")
        ctxs["QUAL"] = VBCtx("QUAL", MODE_TXT, local=qual.data, cat="qual")
        ctxs["AUX"] = VBCtx("AUX", MODE_TXT, local=aux.data, cat="text")
        ctxs["AUXLEN"] = VBCtx("AUXLEN", MODE_NUM, local=aux.lens, cat="int")
        return VBSegResult(ctxs, n, {})

    def recon_vb(self, pctxs: dict, meta: dict) -> bytes:
        n = meta["num_lines"]
        name = tokenizer_recon_col("QNAME", pctxs, n)
        refid = pctxs["RNAME"].nums()
        pos = pctxs["POS"].nums()
        mapq = pctxs["MAPQ"].nums()
        bin_ = pctxs["BIN"].nums()
        flag = pctxs["FLAG"].nums()
        nrefid = pctxs["RNEXT"].nums()
        npos = pctxs["PNEXT"].nums()
        tlen = pctxs["TLEN"].nums()
        n_cig = pctxs["NCIG"].nums()
        l_seq = pctxs["SQLEN"].nums()
        aux_lens = pctxs["AUXLEN"].nums()

        l_rn = name.lens + 1
        seq_bytes = (l_seq + 1) // 2
        cigar = pctxs["CIGAR"].txt_col(4 * n_cig)
        seq = pctxs["SEQBIN"].txt_col(seq_bytes)
        qual = pctxs["QUAL"].txt_col(l_seq)
        aux = pctxs["AUX"].txt_col(aux_lens)

        block_size = (32 + l_rn + 4 * n_cig + seq_bytes + l_seq + aux_lens)

        def le(vals, w):
            m = np.zeros((n, w), dtype=np.uint8)
            v = vals.astype(np.uint64) & ((1 << (8 * w)) - 1)
            for b in range(w):
                m[:, b] = (v >> (8 * b)) & 0xFF
            return Col.from_fixed(m)

        fixed = np.zeros((n, 36), dtype=np.uint8)
        for valcol, offb, w in ((block_size, 0, 4), (refid, 4, 4), (pos, 8, 4),
                                (l_rn, 12, 1), (mapq, 13, 1), (bin_, 14, 2),
                                (n_cig, 16, 2), (flag, 18, 2), (l_seq, 20, 4),
                                (nrefid, 24, 4), (npos, 28, 4), (tlen, 32, 4)):
            v = valcol.astype(np.int64).astype(np.uint64) & ((1 << (8 * w)) - 1)
            for b in range(w):
                fixed[:, offb + b] = (v >> (8 * b)) & 0xFF
        out = ragged.interleave(
            [Col.from_fixed(fixed), name, cigar, seq, qual, aux],
            sep_after=[None, b"\x00", None, None, None, None])
        return out.data.tobytes()
