"""BWT block codec (reference src/bsc/ role: block-sorting for large
text-ish sections — 18K LoC of vendored C++ there; here a vectorized
numpy Burrows-Wheeler transform + the house entropy coders).

Forward: suffix array by prefix doubling (O(n log^2 n), fully vectorized
with np.lexsort — no Python per-element work), BWT from the SA of the
sentinel-terminated string, then order-1 rANS/ARITH over the transformed
block (BWT output is locally homogeneous, which is exactly what the
order-1/adaptive models exploit; bzip2's MTF+RLE stage is replaced by the
adaptive coder). Inverse: counting-based LF-mapping walk — the only
sequential loop is the final n-step index chase, done with one
precomputed int32 permutation array walk in numpy.
"""

import numpy as np


def suffix_array(data: np.ndarray) -> np.ndarray:
    """SA of data + virtual sentinel (lexicographically smallest). Returns
    positions 0..n (n = sentinel position)."""
    n = data.shape[0]
    # rank 0 = sentinel; bytes shifted +1
    rank = np.zeros(n + 1, np.int64)
    rank[:n] = data.astype(np.int64) + 1
    sa = np.argsort(rank, kind="stable")  # initial order by first char
    k = 1
    tmp = np.empty(n + 1, np.int64)
    while True:
        key2 = np.full(n + 1, -1, np.int64)
        key2[: n + 1 - k] = rank[k:]
        order = np.lexsort((key2, rank))
        # new ranks: increment where (rank, key2) differs from predecessor
        r_o = rank[order]
        k_o = key2[order]
        diff = np.ones(n + 1, bool)
        diff[1:] = (r_o[1:] != r_o[:-1]) | (k_o[1:] != k_o[:-1])
        tmp[order] = np.cumsum(diff) - 1
        rank, tmp = tmp.copy(), rank
        if rank.max() == n:
            return order
        k *= 2


def bwt_forward(data: np.ndarray):
    """Returns (last column WITHOUT the sentinel row's char, primary index
    = row of the sentinel in the sorted rotation matrix, sentinel_pos)."""
    n = data.shape[0]
    sa = suffix_array(data)
    # BWT[i] = data[sa[i]-1]; sa[i]==0 row emits the sentinel (skipped,
    # its position recorded)
    prim = int(np.nonzero(sa == 0)[0][0])
    keep = sa != 0
    return data[sa[keep] - 1], prim


def bwt_inverse(last: np.ndarray, prim: int) -> np.ndarray:
    """Invert: reinsert the virtual sentinel at row `prim` and LF-walk."""
    n = last.shape[0]
    # F column = sorted([sentinel] + last); LF mapping via counting
    occ = np.zeros(257, np.int64)
    sym = last.astype(np.int64) + 1
    np.add.at(occ, sym, 1)
    occ[0] = 1                               # the sentinel
    starts = np.concatenate([[0], np.cumsum(occ)[:-1]])
    # rows: 0..n (with sentinel row at prim). L[i] for i != prim.
    rows = np.arange(n + 1)
    li = np.concatenate([sym[:prim], [0], sym[prim:]])
    # rank of each symbol occurrence within its symbol class (stable)
    order = np.argsort(li, kind="stable")
    rank_in_class = np.empty(n + 1, np.int64)
    rank_in_class[order] = rows - starts[li[order]]
    lf = starts[li] + rank_in_class
    # walk backwards from the sentinel row collecting characters
    out = np.empty(n, np.uint8)
    i = prim
    # the n-step chase: vectorize via permutation power? A plain typed loop
    # over a precomputed int64 array is the pragmatic host path (the
    # native/C++ runtime does this when available).
    from .. import native
    if native.available() and hasattr(native, "perm_walk"):
        return native.perm_walk(lf, li, prim, n)
    for k in range(n - 1, -1, -1):
        i = lf[i]
        out[k] = li[i] - 1
    return out


# the prefix-doubling SA is O(n log^2 n) lexsorts: cap the sort size by
# splitting big payloads into independent blocks (the reference's bsc is
# a block codec for the same reason). Multi-block blobs carry a sentinel
# first word; single-block (and all pre-r4) blobs keep the old framing.
BWT_BLOCK = 4 << 20
_MULTI = (1 << 64) - 1


def _compress_block(a: np.ndarray, sub_codec: int) -> bytes:
    from . import compress as ccompress
    last, prim = bwt_forward(a)
    sub = ccompress(last.tobytes(), sub_codec)
    return a.shape[0].to_bytes(8, "little") + prim.to_bytes(8, "little") + \
        bytes([sub_codec]) + sub


def compress(data: bytes, sub_codec: int) -> bytes:
    a = np.frombuffer(data, np.uint8)
    if a.shape[0] == 0:
        return (0).to_bytes(8, "little")
    if a.shape[0] <= BWT_BLOCK:
        return _compress_block(a, sub_codec)
    parts = []
    for off in range(0, a.shape[0], BWT_BLOCK):
        blk = _compress_block(a[off:off + BWT_BLOCK], sub_codec)
        parts.append(len(blk).to_bytes(8, "little") + blk)
    return _MULTI.to_bytes(8, "little") + \
        len(parts).to_bytes(8, "little") + b"".join(parts)


def _decompress_block(blob) -> bytes:
    from . import decompress as cdecompress
    n = int.from_bytes(blob[0:8], "little")
    prim = int.from_bytes(blob[8:16], "little")
    sub_codec = blob[16]
    last = np.frombuffer(cdecompress(blob[17:], sub_codec, n), np.uint8)
    return bwt_inverse(last, prim).tobytes()


def decompress(blob) -> bytes:
    blob = memoryview(blob)
    n = int.from_bytes(blob[0:8], "little")
    if n == 0:
        return b""
    if n != _MULTI:
        return _decompress_block(blob)
    nblk = int.from_bytes(blob[8:16], "little")
    out = []
    off = 16
    for _ in range(nblk):
        bl = int.from_bytes(blob[off:off + 8], "little")
        out.append(_decompress_block(blob[off + 8:off + 8 + bl]))
        off += 8 + bl
    return b"".join(out)
