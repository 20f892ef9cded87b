"""Codec auto-assignment: trial-compress a sample with candidates, commit the
winner per context so later VBs inherit it.

Reference parity: src/codec.c:175-349 codec_assign_best_codec —
CODEC_ASSIGN_SAMPLE_SIZE trial over {NONE, RANS*, ARITH*, BZ2, BSC, LZMA} with
a (size, time) sort and similarity tie-break; winners committed to the global
context under a mutex. Here assignment runs on the first VB that carries the
context (deterministic: VBs are merged in VB order) and is cached in the
ZIP-side global context state.
"""

import time

import numpy as np

from . import (NONE, RANS0, RANS1, PACK0, PACK1, ZLIB, BZ2, LZMA, ACGT,
               DELTA_RANS, RLE0, DOMQ, STRIPE4, ARITH0, ARITH1, compress)

SAMPLE_SIZE = 64 * 1024
MIN_SIZE_TO_COMPRESS = 64

# 'fast' trims trial candidates (reference --fast), 'best' widens them and
# samples more (reference --best, codec.c:196 5-VB agreement analog)
_mode = "normal"


def set_mode(mode: str):
    global _mode
    assert mode in ("fast", "normal", "best")
    _mode = mode


def candidates_for(data: np.ndarray, category: str):
    """Candidate codec list by payload category ('seq', 'qual', 'b250',
    'int', 'text')."""
    nuniq = None
    if data.shape[0]:
        nuniq = np.unique(data[:4096]).shape[0]
    cands = [RANS0, RANS1]
    if category == "seq":
        cands = [ACGT, RANS1, LZMA]
    elif category == "qual":
        cands = [RANS1, ARITH1, RANS0]
        if nuniq is not None and nuniq <= 16:
            cands = [PACK1, RANS1, ARITH1, RANS0]
        if data.shape[0]:
            counts = np.bincount(data[:4096], minlength=256)
            if counts.max() > 0.7 * min(data.shape[0], 4096):
                cands = [DOMQ] + cands
    elif category == "b250":
        cands = [RANS0, ARITH0, RANS1, ZLIB]
    elif category == "int":
        cands = [RANS0, RANS1, DELTA_RANS, STRIPE4, ZLIB]
    elif category == "float":
        cands = [STRIPE4, RANS1, ZLIB]
    elif category == "text":
        cands = [RANS1, ARITH1, ZLIB, BZ2, LZMA]
    elif category == "pbwt":
        # PBWT output is long runs: RLE first, entropy coders as backstop
        cands = [RLE0, RANS1, PACK1, RANS0]
    if _mode == "fast":
        cands = [c for c in cands if c not in (BZ2, LZMA)][:2] or cands[:1]
    elif _mode == "best":
        from . import BWT
        for extra in (BZ2, LZMA, ZLIB, BWT):
            if extra not in cands:
                cands.append(extra)
    return cands


def assign_best(data: bytes | np.ndarray, category: str = "text") -> int:
    a = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data.view(np.uint8).reshape(-1)
    if a.shape[0] < MIN_SIZE_TO_COMPRESS:
        return NONE
    size = SAMPLE_SIZE * (4 if _mode == "best" else 1)
    sample = a[:size].tobytes()
    n1 = len(sample) // 4
    # two-point trial for sections much larger than the sample: fixed costs
    # (static rANS tables, headers) bias a single small sample toward
    # adaptive coders whose advantage vanishes at full size — extrapolate
    # the marginal (per-byte) rate instead
    extrapolate = a.shape[0] > 4 * len(sample) and n1 >= 4096
    best, best_size, best_t = NONE, float(a.shape[0]), 0.0
    for codec in candidates_for(a, category):
        try:
            t0 = time.perf_counter()
            sz = len(compress(sample, codec))
            dt = time.perf_counter() - t0
            if extrapolate:
                sz1 = len(compress(sample[:n1], codec))
                rate = max(sz - sz1, 0) / (len(sample) - n1)
                est = sz + rate * (a.shape[0] - len(sample))
            else:
                est = sz * (a.shape[0] / max(len(sample), 1))
        except Exception:
            continue
        # (size, time) similarity rule (src/codec.c:171-172): a similar-speed
        # candidate wins at >1% smaller; a slower one must earn its wall time
        # in proportion — a q-times-slower coder on the write critical path
        # needs ~2% extra ratio per doubling (MB/s is the headline metric;
        # in 'best' mode ratio wins at the reference's flat 5%)
        if best is not NONE and dt > best_t * 1.5 + 5e-4:
            if _mode == "best":
                need = 0.95
            else:
                q = dt / max(best_t, 1e-5)
                need = max(0.85, 1.0 - 0.03 - 0.02 * min(np.log2(q), 5.0))
        else:
            need = 0.99
        if est < best_size * need:
            best, best_size, best_t = codec, est, dt
    return best
