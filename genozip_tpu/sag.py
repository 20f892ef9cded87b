"""SAG (supplementary-alignment-group) store: DEPN alignments compress
against their primary.

Reference parity: src/sam_sag_ingest.c:105-310 sam_zip_prim_ingest_vb (PRIM
SEQ/QUAL/QNAME ingested into z-file-wide buffers), src/sam_sag_load.c (PIZ
loads SAGs before reconstruction), src/gencomp_zip.c (PRIM/DEPN generated
components). TPU-first redesign: primaries-with-dependents are deported to
their own PRIM component (identified by a vectorized qname-hash prescan);
the store is built from that component's text identically at ZIP and PIZ, so
DEPN rows need only a store index + match flags — SEQ/QUAL reconstruct by
orientation + hard-clip slicing of the primary's bytes.
"""

import numpy as np

from .utils import ragged
from .utils.ragged import Col

FLAG_REV = 0x10
MATE_BITS = 0xC0
DEPN_MASK = 0x900  # secondary | supplementary


def qname_hash(col: Col) -> np.ndarray:
    """Vectorized 64-bit hash per row. Width-INDEPENDENT: zero-padded tail
    words multiply to 0 and the row length folds into the final mix, so the
    same qname hashes identically whatever the batch's max row width (the
    prescan batches and the split batches differ). Used only as a prescan
    *filter* — collisions deport extra primaries, never corrupt data."""
    n = len(col)
    if n == 0:
        return np.zeros(0, np.uint64)
    w = max(int(col.lens.max()), 1)
    mat = np.zeros((n, w), dtype=np.uint8)
    lens = np.minimum(col.lens, w)
    total = int(lens.sum())
    if total:
        pos = ragged.arange(total) - np.repeat(col.offsets[:-1], lens)
        rows = np.repeat(ragged.arange(n), lens)
        mat[rows, pos] = col.data[np.repeat(col.offsets[:-1], lens) + pos]
    w8 = (w + 7) // 8 * 8
    m8 = np.zeros((n, w8), dtype=np.uint8)
    m8[:, :w] = mat
    cols64 = m8.view("<u8")
    mult = (np.arange(1, cols64.shape[1] + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    h = (cols64 * mult[None, :]).sum(axis=1, dtype=np.uint64)
    h ^= lens.astype(np.uint64) * np.uint64(0xFF51AFD7ED558CCD)
    return (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)


def _sam_lines(data: np.ndarray):
    nl = np.nonzero(data == ord("\n"))[0]
    if data.shape[0] and (nl.shape[0] == 0 or nl[-1] != data.shape[0] - 1):
        nl = np.concatenate([nl, [data.shape[0]]])
    starts = np.concatenate([[0], nl[:-1] + 1])
    return ragged.gather_ranges(data, starts, nl - starts)


class SagStore:
    """Primary alignments parsed from the PRIM component text. Built with
    the same code at ZIP and PIZ, so store row indices are symmetric."""

    def __init__(self, qname: Col, flag: np.ndarray, seq: Col, qual: Col):
        self.qname, self.flag, self.seq, self.qual = qname, flag, seq, qual
        self.key2row = {}
        for i in range(len(qname)):
            k = (qname.row(i), int(flag[i]) & MATE_BITS)
            if k not in self.key2row:
                self.key2row[k] = i

    @classmethod
    def from_text(cls, data: np.ndarray):
        lines = _sam_lines(data)
        cols, _aux, good, bad = ragged.split_first_fields(lines, ord("\t"), 11)
        assert bad.shape[0] == 0, "PRIM component has malformed lines"
        flags, _ = ragged.atoi(cols[1])
        return cls(cols[0], flags, cols[9], cols[10])

    def lookup(self, qname: Col, flag: np.ndarray) -> np.ndarray:
        out = np.full(len(qname), -1, np.int64)
        k2r = self.key2row
        for i in range(len(qname)):
            r = k2r.get((qname.row(i), int(flag[i]) & MATE_BITS))
            if r is not None:
                out[i] = r
        return out


def leading_hardclip(cigar: Col) -> np.ndarray:
    """Per-row leading hard-clip length (e.g. '75H25M' -> 75), 0 if none."""
    n = len(cigar)
    mat, lens = ragged.to_matrix(cigar)
    w = mat.shape[1]
    isd = (mat >= ord("0")) & (mat <= ord("9"))
    # first non-digit column per row
    nd = ~isd & (np.arange(w)[None, :] < lens[:, None])
    first_nd = np.where(nd.any(axis=1), nd.argmax(axis=1), 0)
    is_h = mat[ragged.arange(n), first_nd] == ord("H")
    v = np.zeros(n, np.int64)
    for j in range(w):
        active = (j < first_nd) & is_h
        v = np.where(active, v * 10 + (mat[:, j].astype(np.int64) - ord("0")),
                     v)
    return np.where(is_h, v, 0)


_COMP = np.zeros(256, np.uint8)
for _a, _b in zip(b"ACGTNacgtn", b"TGCANtgcan"):
    _COMP[_a] = _b
for _c in range(256):
    if _COMP[_c] == 0:
        _COMP[_c] = _c


def predict_depn(store: SagStore, sag_idx: np.ndarray, depn_flag: np.ndarray,
                 cigar: Col, lens: np.ndarray):
    """Predicted (seq Col, qual Col, valid mask) per DEPN row with
    sag_idx >= 0: slice the primary's SEQ/QUAL by orientation + the DEPN's
    leading hard-clip. Rows where the slice doesn't fit get valid=False."""
    hit = sag_idx >= 0
    rows = np.nonzero(hit)[0]
    n = lens.shape[0]
    valid = np.zeros(n, bool)
    if rows.shape[0] == 0:
        empty = Col(np.zeros(0, np.uint8), np.zeros(n + 1, np.int64))
        return empty, empty, valid
    idx = sag_idx[rows]
    p_seq = ragged.take(store.seq, idx)
    p_qual = ragged.take(store.qual, idx)
    differ = ((store.flag[idx] & FLAG_REV) !=
              (depn_flag[rows] & FLAG_REV))
    h1 = leading_hardclip(cigar)[rows]
    ld = lens[rows]
    fits = (h1 >= 0) & (h1 + ld <= p_seq.lens) & (p_seq.lens == p_qual.lens)
    valid[rows] = fits

    pm, plens = ragged.to_matrix(p_seq)
    qm, _ = ragged.to_matrix(p_qual)
    W = max(pm.shape[1], 1)
    # orient: revcomp seq / reverse qual where flags differ
    rev_idx = np.clip(plens[:, None] - 1 - np.arange(W)[None, :], 0, W - 1)
    pm = np.where(differ[:, None], _COMP[np.take_along_axis(pm, rev_idx, axis=1)], pm)
    qm = np.where(differ[:, None], np.take_along_axis(qm, rev_idx, axis=1), qm)
    # slice [h1 : h1+ld]
    out_lens = np.where(fits, ld, 0)
    Wout = max(int(out_lens.max()), 1)
    sidx = np.clip(h1[:, None] + np.arange(Wout)[None, :], 0, W - 1)
    sm = np.take_along_axis(pm, sidx, axis=1)
    sq = np.take_along_axis(qm, sidx, axis=1)
    seq_sub = ragged.from_matrix(sm, out_lens)
    qual_sub = ragged.from_matrix(sq, out_lens)
    # expand to n rows (uncovered rows are zero-length)
    seq_full = ragged.merge_rows(n, [(rows, seq_sub)])
    qual_full = ragged.merge_rows(n, [(rows, qual_sub)])
    return seq_full, qual_full, valid
