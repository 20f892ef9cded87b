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
from .sam import SamDT
from .. import native
from ..utils import ragged
from ..utils.ragged import Col
from ..contexts import VBCtx, MODE_DICT, MODE_NUM, MODE_TXT, dedup_col
from ..seg import tokenizer_seg_col, tokenizer_recon_col

MAX_RECORDS_PER_VB = 1 << 22
SEQ_NIBBLE = np.frombuffer(b"=ACMGRSVTWYHKDBN", np.uint8)
NIB_OF = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"=ACMGRSVTWYHKDBN"):
    NIB_OF[_c] = _i
CIGOPS = np.frombuffer(b"MIDNSHP=X", np.uint8)


def _u32(data, off):
    return (data[off].astype(np.uint32) | (data[off + 1].astype(np.uint32) << 8)
            | (data[off + 2].astype(np.uint32) << 16)
            | (data[off + 3].astype(np.uint32) << 24))


def _u16(data, off):
    return data[off].astype(np.uint32) | (data[off + 1].astype(np.uint32) << 8)


def _i32(data, off):
    return _u32(data, off).astype(np.int32).astype(np.int64)


@register
class BamDT(SamDT):
    """Inherits SamDT's SEQ-vs-reference machinery (CIGAR group walk,
    mismatch channels); overrides all parsing/recon for the binary layout."""
    NAME = "bam"

    def read_txt_header(self, reader) -> bytes:
        """Consume magic + SAM header text + reference catalog, verbatim.
        The ref-id -> name catalog rides in segconf so PIZ can map binary
        refIDs back to contig names for the by-reference SEQ path."""
        head = reader.peek(12)
        assert head[:4] == b"BAM\x01", "not a BAM stream"
        l_text = int.from_bytes(head[4:8], "little")
        reader.peek(12 + l_text)
        n_ref = int.from_bytes(reader.peek(12 + l_text)[8 + l_text:12 + l_text], "little")
        # walk refs
        need = 12 + l_text
        names = []
        for _ in range(n_ref):
            buf = reader.peek(need + 4)
            l_name = int.from_bytes(buf[need:need + 4], "little")
            buf = reader.peek(need + 8 + l_name)
            names.append(buf[need + 4: need + 4 + l_name - 1].decode(
                "utf-8", "replace"))
            need += 8 + l_name
        hdr = reader.peek(need)[:need]
        reader.buf = reader.buf[need:]
        self.segconf["bam_refs"] = names
        return hdr

    def _rname_text(self, refid: np.ndarray) -> Col:
        names = self.segconf.get("bam_refs") or []
        cat = Col.from_list([nm.encode() for nm in names] + [b"*"])
        idx = np.where((refid >= 0) & (refid < len(names)), refid, len(names))
        return ragged.take(cat, idx)

    def _cigar_text(self, cigar_bin: Col, n_cig: np.ndarray) -> Col:
        """Binary cigar u32s -> SAM text column ('*' for 0-op rows is NOT
        emitted; empty text keeps those rows out of the by-ref path)."""
        n = n_cig.shape[0]
        u32 = np.ascontiguousarray(cigar_bin.data).view("<u4").astype(np.int64)
        oplen = u32 >> 4
        opch = CIGOPS[np.minimum(u32 & 15, 8)]
        nums = ragged.itoa(oplen)
        piece = ragged.interleave([nums, Col.from_fixed(opch.reshape(-1, 1))])
        op_rec = np.repeat(ragged.arange(n), n_cig)
        rec_lens = np.bincount(op_rec, weights=piece.lens,
                               minlength=n).astype(np.int64)
        return Col(piece.data, np.concatenate([[0], np.cumsum(rec_lens)]))

    def _seq_ascii(self, seq_nib: Col, l_seq: np.ndarray):
        """4-bit codes -> ASCII letters + per-row nibble-exactness (odd-length
        rows whose pad nibble isn't 0 can't round-trip through ASCII)."""
        expanded = np.empty(seq_nib.data.shape[0] * 2, np.uint8)
        expanded[0::2] = SEQ_NIBBLE[seq_nib.data >> 4]
        expanded[1::2] = SEQ_NIBBLE[seq_nib.data & 15]
        ascii_col = ragged.gather_ranges(expanded, seq_nib.offsets[:-1] * 2,
                                         l_seq)
        # exactness: odd rows need pad nibble == 0
        odd = (l_seq & 1) == 1
        ok = np.ones(len(seq_nib), bool)
        oidx = np.nonzero(odd & (seq_nib.lens > 0))[0]
        if oidx.shape[0]:
            last = seq_nib.data[seq_nib.offsets[1:][oidx] - 1]
            ok[oidx] = (last & 15) == 0
        return ascii_col, ok

    @staticmethod
    def _renibble(ascii_col: Col) -> Col:
        lens = ascii_col.lens
        nb = (lens + 1) // 2
        padded = np.zeros(ascii_col.data.shape[0] + len(ascii_col), np.uint8)
        # per-row 2-align: copy each row into 2*ceil(len/2) slots
        dst_off = np.concatenate([[0], np.cumsum(2 * nb)])
        total = int(lens.sum())
        if total:
            pos = ragged.arange(total) - np.repeat(ascii_col.offsets[:-1], lens)
            padded_idx = np.repeat(dst_off[:-1], lens) + pos
            buf = np.zeros(int(dst_off[-1]), np.uint8)
            buf[padded_idx] = ascii_col.data
        else:
            buf = np.zeros(0, np.uint8)
        codes = NIB_OF[buf]
        nibbles = (codes[0::2] << 4) | codes[1::2]
        return Col(nibbles, np.concatenate([[0], np.cumsum(nb)]))

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
        ref = getattr(self, "ref", None)
        if ref is not None and n:
            # SEQ-vs-reference through the inherited SAM walk: synthesize
            # text RNAME/POS/CIGAR columns from the binary fields
            ascii_col, nibok = self._seq_ascii(seq, l_seq)
            exact = np.nonzero(nibok)[0]
            a2 = ragged.merge_rows(n, [(exact, ragged.take(ascii_col, exact))])
            self._seg_seq_vs_ref(
                ctxs, a2, self._rname_text(refid), ragged.itoa(pos + 1),
                self._cigar_text(cigar, n_cig), ref)
            ctxs["NIBOK"] = VBCtx("NIBOK", MODE_NUM,
                                  local=nibok.astype(np.int64), cat="int")
            if (~nibok).any():
                raw = ragged.take(seq, np.nonzero(~nibok)[0])
                ctxs["SEQBIN"] = VBCtx("SEQBIN", MODE_TXT, local=raw.data,
                                       cat="seq")
        else:
            ctxs["SEQBIN"] = VBCtx("SEQBIN", MODE_TXT, local=seq.data,
                                   cat="seq")
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
        if "SQBITMAP" in pctxs:
            n_rec = l_seq.shape[0]
            nibok = pctxs["NIBOK"].nums().astype(bool)
            a_lens = np.where(nibok, l_seq, 0)
            ascii_col = self._recon_seq_vs_ref(
                pctxs, a_lens, ragged.itoa(pos + 1), self._rname_text(refid),
                self._cigar_text(cigar, n_cig))
            nib = self._renibble(ascii_col)
            parts = [(np.nonzero(nibok)[0],
                      ragged.take(nib, np.nonzero(nibok)[0]))]
            bad = np.nonzero(~nibok)[0]
            if bad.shape[0]:
                raw = pctxs["SEQBIN"].txt_col(seq_bytes[bad])
                parts.append((bad, raw))
            seq = ragged.merge_rows(n_rec, parts)
        else:
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
