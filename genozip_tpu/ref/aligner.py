"""Batched seed-hash aligner: reads -> (gpos, strand, mismatches).

Reference parity: src/aligner.c — the serial 3-stage software-pipelined hook
scan with XOR+popcount hamming (aligner.c:150-194, aligner_seg_seq :767)
dissolves into whole-batch numpy/jnp ops: seed k-mers at fixed offsets per
read -> refhash gather -> candidate GPOS -> genome window gather -> code
comparison popcount -> argmin. The near-perfect early exit (aligner.c:226)
becomes a plain argmin over all candidates (batched hardware prefers uniform
work); '--fast' maps to fewer seeds.

Host (numpy) implementation; the device (jnp) twin shares the same logic for
the multi-chip path (parallel/flagship.py wires it over a sharded genome).
"""

import numpy as np

from ..ops import pack as packops
from .refstore import RefGenome, KMER, hash_kmer, NO_GPOS

NUM_SEEDS = 4          # seed positions per read ('--fast' uses 2)
MAX_MM_FRAC = 0.5      # alignment accepted if mismatches <= frac * len


def _revcomp_codes(codes_mat: np.ndarray, lens: np.ndarray):
    """Reverse-complement each row of a (R, L) code matrix (rows padded)."""
    R, L = codes_mat.shape
    comp = codes_mat ^ 3
    idx = lens[:, None] - 1 - np.arange(L)[None, :]
    idx = np.clip(idx, 0, L - 1)
    return np.take_along_axis(comp, idx, axis=1)


def align_batch(ref: RefGenome, codes_mat: np.ndarray, lens: np.ndarray,
                num_seeds: int = NUM_SEEDS):
    """Align a batch of reads (2-bit codes, padded matrix) against the genome.

    Returns dict of arrays over reads:
      aligned (bool), gpos (int64, of the read's first base on fwd genome),
      is_fwd (bool), nmm (int32 mismatch count vs genome window).
    """
    R, L = codes_mat.shape
    G = ref.length
    if R == 0 or G < KMER:
        z = np.zeros(R, dtype=bool)
        return {"aligned": z, "gpos": np.zeros(R, np.int64),
                "is_fwd": np.ones(R, bool), "nmm": np.zeros(R, np.int32)}

    rc_mat = _revcomp_codes(codes_mat, lens)
    cands = []           # (gpos_of_read_start, is_fwd) per candidate set
    for direction, mat in ((1, codes_mat), (0, rc_mat)):
        # seed offsets spread over the read (clipped so kmer fits)
        for si in range(num_seeds):
            off = (lens - KMER) * si // max(num_seeds - 1, 1)
            off = np.clip(off, 0, np.maximum(lens - KMER, 0))
            km = np.zeros(R, dtype=np.uint32)
            idx = off[:, None] + np.arange(KMER)[None, :]
            idx = np.clip(idx, 0, L - 1)
            window = np.take_along_axis(mat, idx, axis=1)
            for j in range(KMER):
                km = (km << np.uint32(2)) | window[:, j].astype(np.uint32)
            h = hash_kmer(km, ref.hash_bits)
            g = ref.refhash[h].astype(np.int64)
            miss = g == int(NO_GPOS)
            start = g - off          # genome pos of read base 0 (this strand)
            start[miss] = -1
            cands.append((start, direction))

    # score every candidate: gather genome windows, count mismatches
    best_nmm = np.full(R, np.iinfo(np.int32).max, dtype=np.int64)
    best_gpos = np.full(R, -1, dtype=np.int64)
    best_fwd = np.ones(R, dtype=bool)
    pos_idx = np.arange(L)[None, :]
    valid_mask_base = pos_idx < lens[:, None]
    for start, direction in cands:
        ok = (start >= 0) & (start + lens <= G)
        safe_start = np.where(ok, start, 0)
        gidx = safe_start[:, None] + pos_idx
        gwin = ref.codes[np.clip(gidx, 0, G - 1)]
        mat = codes_mat if direction == 1 else rc_mat
        mm = ((gwin != mat) & valid_mask_base).sum(axis=1)
        mm = np.where(ok, mm, np.iinfo(np.int32).max)
        better = mm < best_nmm
        best_nmm = np.where(better, mm, best_nmm)
        best_gpos = np.where(better, start, best_gpos)
        best_fwd = np.where(better, direction == 1, best_fwd)

    aligned = best_nmm <= (lens * MAX_MM_FRAC).astype(np.int64)
    return {"aligned": aligned, "gpos": best_gpos, "is_fwd": best_fwd,
            "nmm": np.where(aligned, best_nmm, 0).astype(np.int32)}


def mismatch_lists(ref: RefGenome, seq_mat: np.ndarray, codes_mat: np.ndarray,
                   lens: np.ndarray, gpos: np.ndarray, is_fwd: np.ndarray,
                   aligned: np.ndarray):
    """For aligned reads, produce sparse mismatch (read_idx, pos_in_read,
    original_base_byte) lists — original ASCII bases (handles N etc.).
    Positions are in *stored* orientation: for reverse reads the stored
    sequence is the reverse-complement read, compared against fwd genome."""
    R, L = seq_mat.shape
    G = ref.length
    pos_idx = np.arange(L)[None, :]
    valid = (pos_idx < lens[:, None]) & aligned[:, None]
    safe = np.where(aligned, gpos, 0)
    gidx = np.clip(safe[:, None] + pos_idx, 0, max(G - 1, 0))
    gwin = ref.codes[gidx]
    # stored orientation codes: fwd reads as-is; rev reads revcomp'd
    stored = np.where(is_fwd[:, None], codes_mat,
                      _revcomp_codes(codes_mat, lens))
    stored_seq = np.where(is_fwd[:, None], seq_mat,
                          _rev_seq(seq_mat, lens))
    mm = (gwin != stored) & valid
    # non-ACGT bytes always count as mismatches (their code is a lie)
    acgt = packops.IS_ACGT[stored_seq]
    mm |= (~acgt) & valid
    ridx, ppos = np.nonzero(mm)
    return ridx, ppos, stored_seq[ridx, ppos]


def _rev_seq(seq_mat: np.ndarray, lens: np.ndarray):
    """Reverse-complement ASCII rows (complement of non-ACGT = itself)."""
    R, L = seq_mat.shape
    idx = np.clip(lens[:, None] - 1 - np.arange(L)[None, :], 0, L - 1)
    rev = np.take_along_axis(seq_mat, idx, axis=1)
    comp = rev.copy()
    for a, b in ((b"A", b"T"), (b"C", b"G")):
        ma = rev == a[0]
        mb = rev == b[0]
        comp[ma] = b[0]
        comp[mb] = a[0]
    return comp


def reconstruct_batch(ref: RefGenome, gpos: np.ndarray, lens: np.ndarray,
                      is_fwd: np.ndarray, mm_ridx: np.ndarray,
                      mm_pos: np.ndarray, mm_base: np.ndarray):
    """PIZ side: rebuild read sequences (ASCII) from genome + mismatch lists.
    Returns (R, L) ASCII matrix (rows padded with zeros)."""
    R = gpos.shape[0]
    L = int(lens.max()) if R else 0
    G = ref.length
    pos_idx = np.arange(L)[None, :]
    gidx = np.clip(gpos[:, None] + pos_idx, 0, max(G - 1, 0))
    seq = packops.ACGT[ref.codes[gidx]]
    seq[mm_ridx, mm_pos] = mm_base
    # stored orientation is fwd-genome; reverse reads need revcomp back
    rev = ~is_fwd
    if rev.any():
        sub = _rev_seq(seq[rev], lens[rev])
        seq[rev] = sub
    valid = pos_idx < lens[:, None]
    return np.where(valid, seq, 0)
