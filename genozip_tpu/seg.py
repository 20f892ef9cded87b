"""Shared segmentation helpers: the vectorized tokenizer.

Reference parity: src/tokenizer.c (fallback field splitter), src/qname.c +
src/qname_flavors.h (70 qname flavor templates), src/seg.c seg helpers.
TPU-first redesign: instead of per-line flavor matching, a whole column is
split in one pass into digit-runs and a *template* (digit runs replaced by a
placeholder byte). Rows sharing a template hit the same dict word; numeric
runs become per-position integer streams (delta-coded when monotonic). Rows
whose run structure disagrees with nothing — every row maps independently —
so any mix of flavors works; uniform flavors (the common case) produce a
1-word template dict + K numeric streams, which is exactly what the flavor
system achieves, without the template catalog.
"""

import numpy as np

from .utils import ragged
from .utils.ragged import Col
from .contexts import VBCtx, MODE_DICT, MODE_NUM, dedup_col, narrow_int

TOK_MARK = 0x01          # placeholder byte for a numeric run inside a template
MAX_NUM_LEN = 18         # digit runs longer than this stay literal
MAX_TOKENS = 32          # digit runs beyond this stay literal


def _digit_runs(col: Col, max_tokens: int = MAX_TOKENS):
    """Find maximal digit runs within each row.
    Returns (run_start_pos, run_len, run_row, runs_per_row, keep_mask) where
    keep_mask marks runs that become numeric tokens (no leading zero unless
    single digit, len <= MAX_NUM_LEN, token index < MAX_TOKENS)."""
    data = col.data
    n = len(col)
    isd = (data >= ord("0")) & (data <= ord("9"))
    prev = np.concatenate([[False], isd[:-1]])
    row_start = np.zeros(data.shape[0] + 1, dtype=bool)
    row_start[col.offsets[:-1]] = True
    runstart = isd & (~prev | row_start[:-1])
    start_pos = np.nonzero(runstart)[0]
    # run end: next position where isd stops or row ends
    isd_ext = np.concatenate([isd, [False]])
    row_start_ext = row_start
    runend_mask = isd & (~isd_ext[1:] | row_start_ext[1:data.shape[0] + 1])
    end_pos = np.nonzero(runend_mask)[0] + 1
    run_len = end_pos - start_pos
    run_row = np.searchsorted(col.offsets[1:], start_pos, side="right")
    runs_per_row = np.bincount(run_row, minlength=n)
    # token index within row
    tok_idx = np.arange(start_pos.shape[0]) - np.concatenate([[0], np.cumsum(runs_per_row)])[run_row]
    lead0 = (run_len > 1) & (data[start_pos] == ord("0"))
    keep = (~lead0) & (run_len <= MAX_NUM_LEN) & (tok_idx < max_tokens)
    return start_pos, run_len, run_row, tok_idx, keep


def tokenizer_seg_col(prefix: str, col: Col, single_stream: bool = False,
                      max_tokens: int = MAX_TOKENS):
    """Segment a ragged string column into template dict + numeric streams.
    Returns dict of ctx_name -> VBCtx. Recon counterpart: tokenizer_recon_col.

    single_stream=True routes ALL numeric runs (uncapped, any count per row)
    into one value stream in (row, position) order — for fields with many or
    variable-count numbers per row (VCF INFO/sample matrices), where one
    section beats hundreds of per-position sections.
    """
    n = len(col)
    data = col.data
    ctxs = {}
    if data.shape[0] and (data == TOK_MARK).any():
        # rows containing the placeholder byte can't be templated; store the
        # whole column as a plain dict (correct, just less compact).
        # param=5 tells recon the words are verbatim (their \x01 bytes are
        # literal, not numeric-run marks)
        uw, inv = dedup_col(col)
        ctxs[prefix] = VBCtx(prefix, MODE_DICT, b250=inv, vb_words=uw,
                             cat="b250", param=5)
        return ctxs
    if n == 0 or data.shape[0] == 0:
        tmpl_col = Col.from_list([b""] * n) if n else Col.from_list([])
        uw, inv = dedup_col(tmpl_col)
        ctxs[prefix] = VBCtx(prefix, MODE_DICT, b250=inv, vb_words=uw, cat="b250")
        return ctxs

    from . import native
    if native.available():
        # one-pass native scan (identical keep rules)
        cap = (1 << 62) if single_stream else max_tokens
        tmpl_data, tmpl_lens, vals, new_tok = native.tokenize(
            data, col.offsets, cap)
        tmpl_col = Col(tmpl_data, np.concatenate([[0], np.cumsum(tmpl_lens)]))
        uw, inv = dedup_col(tmpl_col)
        ctxs[prefix] = VBCtx(prefix, MODE_DICT, b250=inv, vb_words=uw, cat="b250")
        if vals.shape[0] == 0:
            return ctxs
        if single_stream:
            # uniform per-row counts -> store column-major (the sample-matrix
            # transpose, reference LT_UINT8_TR-style: per-column value
            # distributions stay coherent for the entropy coder)
            k = int(new_tok.max()) + 1
            if n and vals.shape[0] == n * k and \
                    (new_tok == np.tile(np.arange(k, dtype=new_tok.dtype), n)).all():
                ctxs[f"{prefix}S"] = VBCtx(
                    f"{prefix}S", MODE_NUM,
                    local=np.ascontiguousarray(vals.reshape(n, k).T).reshape(-1),
                    cat="int", param=2)
            else:
                ctxs[f"{prefix}S"] = VBCtx(f"{prefix}S", MODE_NUM, local=vals,
                                           cat="int", param=0)
            return ctxs
        ntok = int(new_tok.max()) + 1
        for t in range(ntok):
            v = vals[new_tok == t]
            name = f"{prefix}{t}"
            d = np.diff(v, prepend=np.int64(0))
            use_delta = v.shape[0] > 4 and (d[1:] >= 0).mean() > 0.9
            if use_delta:
                ctxs[name] = VBCtx(name, MODE_NUM, local=d, cat="int", param=1)
            else:
                ctxs[name] = VBCtx(name, MODE_NUM, local=v, cat="int", param=0)
        return ctxs

    start_pos, run_len, run_row, tok_idx, keep = _digit_runs(col, max_tokens)
    if single_stream:
        # no per-position cap — all clean runs become tokens
        data_ = col.data
        lead0 = (run_len > 1) & (data_[start_pos] == ord("0"))
        keep = (~lead0) & (run_len <= MAX_NUM_LEN)

    # template: replace each kept run with TOK_MARK
    drop = np.zeros(data.shape[0], dtype=bool)
    kept_starts = start_pos[keep]
    kept_lens = run_len[keep]
    if kept_starts.shape[0]:
        total = int(kept_lens.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(kept_lens)])[:-1], kept_lens)
        drop[np.repeat(kept_starts, kept_lens) + pos] = True
        mark = np.zeros(data.shape[0], dtype=bool)
        mark[kept_starts] = True
    else:
        mark = np.zeros(data.shape[0], dtype=bool)
    keep_byte = ~drop | mark
    tmpl_data = np.where(mark, TOK_MARK, data)[keep_byte]
    # per-row new lengths
    kept_per_row = np.zeros(n, dtype=np.int64)
    np.add.at(kept_per_row, run_row[keep], run_len[keep] - 1)
    tmpl_lens = col.lens - kept_per_row
    tmpl_col = Col(tmpl_data, np.concatenate([[0], np.cumsum(tmpl_lens)]))

    uw, inv = dedup_col(tmpl_col)
    ctxs[prefix] = VBCtx(prefix, MODE_DICT, b250=inv, vb_words=uw, cat="b250")

    # numeric streams per token position; rows lacking token t are simply
    # absent from stream t (recon walks marks per row, so alignment is by
    # presence: stream t holds values for rows having >= t+1 kept runs, in
    # row order)
    if kept_starts.shape[0] and single_stream:
        # one stream, (row, position) order == start_pos order
        vals_col = ragged.gather_ranges(data, kept_starts, kept_lens)
        vals, ok = ragged.atoi(vals_col)
        assert ok.all()
        name = f"{prefix}S"
        ctxs[name] = VBCtx(name, MODE_NUM, local=vals, cat="int", param=0)
    elif kept_starts.shape[0]:
        kept_rows = run_row[keep]
        kept_tok = tok_idx[keep].copy()
        # re-number kept token indices per row (0,1,2,... among kept only)
        order = np.lexsort((kept_tok, kept_rows))
        kr, ks, kl = kept_rows[order], kept_starts[order], kept_lens[order]
        new_tok = np.arange(kr.shape[0]) - np.concatenate(
            [[0], np.cumsum(np.bincount(kr, minlength=n))])[kr]
        vals_col = ragged.gather_ranges(data, ks, kl)
        vals, ok = ragged.atoi(vals_col)
        assert ok.all()  # keep-mask guarantees clean digit runs
        ntok = int(new_tok.max()) + 1 if new_tok.shape[0] else 0
        for t in range(ntok):
            m = new_tok == t
            v = vals[m]
            name = f"{prefix}{t}"
            # delta-code when mostly monotonic (qname counters, coordinates)
            d = np.diff(v, prepend=np.int64(0))
            use_delta = v.shape[0] > 4 and (d[1:] >= 0).mean() > 0.9
            if use_delta:
                ctxs[name] = VBCtx(name, MODE_NUM, local=d, cat="int", param=1)
            else:
                ctxs[name] = VBCtx(name, MODE_NUM, local=v, cat="int", param=0)
    return ctxs


def tokenizer_recon_col(prefix: str, pctxs, n: int) -> Col:
    """Rebuild the column from template dict + numeric streams."""
    tc = pctxs[prefix]
    tmpl = tc.dict_take()  # Col of per-row templates
    if tc.param == 5:      # verbatim fallback: \x01 bytes are literal
        return tmpl
    data = tmpl.data
    marks = np.nonzero(data == TOK_MARK)[0]
    if marks.shape[0] == 0:
        return tmpl
    mark_row = np.searchsorted(tmpl.offsets[1:], marks, side="right")
    if f"{prefix}S" in pctxs:   # single-stream mode: marks in row-major order
        pc = pctxs[f"{prefix}S"]
        val_of_mark = pc.local.astype(np.int64)
        if pc.param == 2:       # column-major (transposed) storage
            k = val_of_mark.shape[0] // max(n, 1)
            val_of_mark = np.ascontiguousarray(
                val_of_mark.reshape(k, n).T).reshape(-1)
        assert val_of_mark.shape[0] == marks.shape[0]
    else:
        per_row = np.bincount(mark_row, minlength=n)
        tok_of_mark = np.arange(marks.shape[0]) - np.concatenate(
            [[0], np.cumsum(per_row)])[mark_row]
        ntok = int(tok_of_mark.max()) + 1
        # decode each numeric stream, then scatter values to marks
        val_of_mark = np.zeros(marks.shape[0], dtype=np.int64)
        for t in range(ntok):
            name = f"{prefix}{t}"
            pc = pctxs[name]
            v = pc.nums()
            m = tok_of_mark == t
            assert m.sum() == v.shape[0], f"{name}: {m.sum()} marks vs {v.shape[0]} vals"
            val_of_mark[m] = v
    num_col = ragged.itoa(val_of_mark)
    # splice: replace each TOK_MARK byte with its rendered number
    piece_lens = np.ones(data.shape[0], dtype=np.int64)
    piece_lens[marks] = num_col.lens
    out_total = int(piece_lens.sum())
    out = np.empty(out_total, dtype=np.uint8)
    dst_off = np.concatenate([[0], np.cumsum(piece_lens)])
    # copy non-mark bytes
    nonmark = np.ones(data.shape[0], dtype=bool)
    nonmark[marks] = False
    out[dst_off[:-1][nonmark]] = data[nonmark]
    # copy numbers
    nl = num_col.lens
    tot = int(nl.sum())
    if tot:
        pos = np.arange(tot, dtype=np.int64) - np.repeat(num_col.offsets[:-1], nl)
        out[np.repeat(dst_off[:-1][marks], nl) + pos] = num_col.data
    # new row offsets
    row_extra = np.zeros(n, dtype=np.int64)
    np.add.at(row_extra, mark_row, num_col.lens - 1)
    new_lens = tmpl.lens + row_extra
    return Col(out, np.concatenate([[0], np.cumsum(new_lens)]))
