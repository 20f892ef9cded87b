"""Wide-interleaved rANS — JAX/XLA device implementation (TPU path).

Bit-exact with the numpy reference model in ops/rans_np.py (the normative spec).
Encode and decode are single `lax.scan`s over the per-lane step axis with all
lanes as one wide vector; renorm is a masked single-word emit/read with stream
positions computed by per-step cumsum (deterministic (step, lane) order).

Everything fits in uint32: after renorm x < freq<<20, so
((x//f)<<12)+(x%f)+c <= 2^32-1; on decode f*(x>>12) < 2^12 * 2^20.

Encode is two-pass to stay XLA-friendly: pass 1 = scan producing per-step
(word, emit) planes; pass 2 = dense stream compaction (flip, cumsum, scatter)
instead of a serial backward-writing pointer. The host wrapper reuses
rans_np's header/freq-table serialization so streams are interchangeable.
"""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from . import rans_np
from .rans_np import SCALE_BITS, SCALE, RANS_L, choose_num_lanes, lane_layout, \
    normalize_freqs, _freqs_serialize, _to_matrix


@partial(jax.jit, static_argnames=("order",))
def encode_scan(m, active, freq, cum, ctx_m, order: int):
    """m: (K, N) uint32 symbols; active: (K, N) bool; freq/cum: flat tables
    ((256,) for order-0, (65536,) ctx*256+s for order-1); ctx_m: (K, N) uint32.
    Returns final states (N,) uint32 and (words, emits) planes in step-ascending
    order."""
    N = m.shape[1]
    x0 = jnp.full((N,), RANS_L, dtype=jnp.uint32)

    def step(x, inp):
        s, act, cc = inp
        ix = cc * 256 + s if order == 1 else s
        f = jnp.where(act, freq[ix], 1).astype(jnp.uint32)
        c = cum[ix].astype(jnp.uint32)
        # x >= f<<20 would overflow uint32 when f == SCALE (4096); x>>20 >= f
        # is exactly equivalent for integers.
        emit = act & ((x >> 20) >= f)
        word = (x & 0xFFFF).astype(jnp.uint16)
        x = jnp.where(emit, x >> 16, x)
        xa = ((x // f) << SCALE_BITS) + (x % f) + c
        x = jnp.where(act, xa, x)
        return x, (word, emit)

    # encode runs step-descending; scan with reverse=True over step-ascending xs
    x_final, (words, emits) = jax.lax.scan(
        step, x0, (m, active, ctx_m), reverse=True)
    return x_final, words, emits


@jax.jit
def compact_stream(x_final, words, emits):
    """Pass 2: dense compaction into decoder read order.
    Returns (out_words[(2N + K*N)], total_words incl. the 2N state words)."""
    K, N = words.shape
    # decoder read order: step-ascending, lane-ascending == row-major flatten
    flat_w = words.reshape(-1)
    flat_e = emits.reshape(-1)
    pos = jnp.cumsum(flat_e) - 1  # inclusive rank
    total = 2 * N + (pos[-1] + 1 if K else 0)
    out = jnp.zeros((2 * N + K * N,), dtype=jnp.uint16)
    # states: lane-ascending (hi, lo)
    st = jnp.stack([(x_final >> 16).astype(jnp.uint16),
                    (x_final & 0xFFFF).astype(jnp.uint16)], axis=1).reshape(-1)
    out = out.at[:2 * N].set(st)
    idx = jnp.where(flat_e, 2 * N + pos, out.shape[0])  # drop non-emits
    out = out.at[idx].set(flat_w, mode="drop")
    return out, total


@partial(jax.jit, static_argnames=("order", "K"))
def decode_scan(words, active, freq, cum, slot2sym, K: int, order: int):
    """words: (W,) uint32 (u16 values); active: (K, N) bool.
    freq/cum flat as in encode; slot2sym: (4096,) or (256*4096,).
    Returns (K, N) uint8 symbols."""
    N = active.shape[1]
    st = words[: 2 * N].reshape(-1, 2)
    x0 = (st[:, 0] << 16) | st[:, 1]
    p0 = jnp.uint32(2 * N)
    ctx0 = jnp.zeros((N,), dtype=jnp.uint32)

    def step(carry, act):
        x, p, ctx = carry
        slot = x & (SCALE - 1)
        six = ctx * SCALE + slot if order == 1 else slot
        s = slot2sym[six].astype(jnp.uint32)
        fix = ctx * 256 + s if order == 1 else s
        f = jnp.where(act, freq[fix], 1).astype(jnp.uint32)
        c = cum[fix].astype(jnp.uint32)
        xa = f * (x >> SCALE_BITS) + slot - jnp.where(act, c, 0)
        x = jnp.where(act, xa, x)
        need = act & (x < RANS_L)
        rank = jnp.cumsum(need.astype(jnp.uint32))
        idx = p + rank - 1
        got = words[jnp.where(need, idx, 0)]
        x = jnp.where(need, (x << 16) | got, x)
        p = p + rank[-1]
        if order == 1:
            ctx = jnp.where(act, s, ctx)
        return (x, p, ctx), s.astype(jnp.uint8)

    _, out = jax.lax.scan(step, (x0, p0, ctx0), active)
    return out


# ---------------------------------------------------------------------------
# Host wrappers producing/consuming the exact rans_np stream format.
# ---------------------------------------------------------------------------

def _tables_order0(data):
    freq = normalize_freqs(np.bincount(data, minlength=256))
    cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
    return freq, cum, _freqs_serialize(freq)


def _tables_order1(m, lane_len, K):
    ctx_m = np.zeros_like(m)
    ctx_m[1:] = m[:-1]
    hist2 = np.zeros((256, 256), dtype=np.int64)
    active_all = np.arange(K)[:, None] < lane_len[None, :]
    np.add.at(hist2, (ctx_m[active_all], m[active_all]), 1)
    freq2 = np.zeros((256, 256), dtype=np.uint32)
    cum2 = np.zeros((256, 256), dtype=np.uint32)
    used_ctx = hist2.sum(axis=1) > 0
    for c in np.nonzero(used_ctx)[0]:
        freq2[c] = normalize_freqs(hist2[c])
        cum2[c] = np.concatenate([[0], np.cumsum(freq2[c])[:-1]])
    parts = [np.packbits(used_ctx.astype(np.uint8), bitorder="little").tobytes()]
    for c in np.nonzero(used_ctx)[0]:
        parts.append(_freqs_serialize(freq2[c]))
    import zlib
    raw = b"".join(parts)
    comp = zlib.compress(raw, 6)
    ftab = len(raw).to_bytes(4, "little") + len(comp).to_bytes(4, "little") + comp
    return freq2, cum2, ctx_m, ftab


def encode(data, order: int = 0) -> bytes:
    data = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    n = data.shape[0]
    N = choose_num_lanes(n)
    m, K, lane_len = _to_matrix(data, N)
    active = np.arange(K)[:, None] < lane_len[None, :]

    if order == 0:
        freq, cum, ftab = _tables_order0(data)
        freq_d, cum_d = jnp.asarray(freq), jnp.asarray(cum)
        ctx_m = np.zeros_like(m)
    else:
        freq2, cum2, ctx_m, ftab = _tables_order1(m, lane_len, K)
        freq_d, cum_d = jnp.asarray(freq2.reshape(-1)), jnp.asarray(cum2.reshape(-1))

    x_final, words, emits = encode_scan(
        jnp.asarray(m, dtype=jnp.uint32), jnp.asarray(active),
        freq_d, cum_d, jnp.asarray(ctx_m, dtype=jnp.uint32), order)
    out, total = compact_stream(x_final, words, emits)
    total = int(total)
    body = np.asarray(out[:total]).astype("<u2").tobytes()
    header = bytes([int(np.log2(N)), order]) + int(n).to_bytes(4, "little") + ftab
    return header + body


def decode(buf) -> bytes:
    buf = memoryview(buf)
    logN, order = buf[0], buf[1]
    N = 1 << logN
    n = int.from_bytes(buf[2:6], "little")
    off = 6
    if order == 0:
        freq, off = rans_np._freqs_deserialize(buf, off)
        cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(np.uint32)
        slot2sym = np.repeat(np.arange(256, dtype=np.uint8), freq)
        freq_d, cum_d, s2s_d = jnp.asarray(freq), jnp.asarray(cum), jnp.asarray(slot2sym.astype(np.uint32))
    else:
        import zlib
        rawlen = int.from_bytes(buf[off:off + 4], "little")
        clen = int.from_bytes(buf[off + 4:off + 8], "little")
        raw = memoryview(zlib.decompress(bytes(buf[off + 8: off + 8 + clen])))
        off += 8 + clen
        used_ctx = np.unpackbits(np.frombuffer(raw[:32], np.uint8), bitorder="little").astype(bool)
        freq2 = np.zeros((256, 256), dtype=np.uint32)
        cum2 = np.zeros((256, 256), dtype=np.uint32)
        slot2sym2 = np.zeros((256, SCALE), dtype=np.uint8)
        o2 = 32
        for c in np.nonzero(used_ctx)[0]:
            fr, o2 = rans_np._freqs_deserialize(raw, o2)
            freq2[c] = fr
            cum2[c] = np.concatenate([[0], np.cumsum(fr)[:-1]])
            slot2sym2[c] = np.repeat(np.arange(256, dtype=np.uint8), fr)
        freq_d = jnp.asarray(freq2.reshape(-1))
        cum_d = jnp.asarray(cum2.reshape(-1))
        s2s_d = jnp.asarray(slot2sym2.reshape(-1).astype(np.uint32))

    words = np.frombuffer(buf[off:], dtype="<u2").astype(np.uint32)
    # pad the word buffer to a bounded shape set (compile-cache friendly;
    # the decoder never reads past the true stream end)
    wb = 1 << 12
    while wb < words.shape[0]:
        wb = wb + (wb >> 1) if wb + (wb >> 1) >= words.shape[0] else wb << 1
    if wb > words.shape[0]:
        words = np.concatenate([words, np.zeros(wb - words.shape[0], np.uint32)])
    K, lane_len = lane_layout(n, N)
    if K == 0:
        return b""
    active = np.arange(K)[:, None] < lane_len[None, :]
    out = decode_scan(jnp.asarray(words), jnp.asarray(active),
                      freq_d, cum_d, s2s_d, K, int(order))
    flat = np.asarray(out).T.reshape(-1)[:n]
    return flat.tobytes()
