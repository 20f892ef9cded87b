// Native host-side runtime for the GXZ engine (loaded via ctypes).
//
// Implements the SAME RANS-W32x16 stream format as ops/rans_np.py (the
// normative spec) as a fast scalar coder for host-side / small-section
// payloads, plus binary-record scanners (BAM) that are inherently serial
// pointer-chases and belong in native code (reference parity: the reference's
// entire runtime is C; here C++ covers only the host-serial parts while
// JAX/Pallas owns device compute).
//
// Build: g++ -O3 -march=native -shared -fPIC gxz_native.cpp -o libgxz.so -lz

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>
#include <vector>
#include <memory>
#include <zlib.h>

namespace {

constexpr int SCALE_BITS = 12;
constexpr uint32_t SCALE = 1u << SCALE_BITS;
constexpr uint32_t RANS_L = 1u << 16;

// must replicate rans_np.choose_num_lanes exactly
int choose_log_lanes(int64_t n) {
    if (n <= 0) return 4;
    int64_t target = n / (n >= (1 << 20) ? 128 : 256);
    if (target <= 1) return 4;
    int k = 64 - __builtin_clzll((uint64_t)(target - 1));  // ceil(log2(target))
    return std::max(4, std::min(13, k));
}

// exact replica of rans_np.normalize_freqs (largest-remainder, ties by
// (-count, symbol) stable order)
void normalize_freqs(const int64_t* hist, uint32_t* f_out) {
    int64_t total = 0;
    for (int i = 0; i < 256; i++) total += hist[i];
    if (total == 0) {
        memset(f_out, 0, 256 * 4);
        f_out[0] = SCALE;
        return;
    }
    int64_t f[256];
    int64_t sum = 0;
    for (int i = 0; i < 256; i++) {
        f[i] = (int64_t)((unsigned __int128)hist[i] * SCALE / (uint64_t)total);
        if (hist[i] > 0 && f[i] == 0) f[i] = 1;
        sum += f[i];
    }
    int64_t diff = SCALE - sum;
    if (diff != 0) {
        int order[256];
        for (int i = 0; i < 256; i++) order[i] = i;
        std::stable_sort(order, order + 256, [&](int a, int b) {
            return hist[a] > hist[b];  // desc count; stable keeps sym asc
        });
        int64_t step = diff > 0 ? 1 : -1;
        int64_t remaining = diff > 0 ? diff : -diff;
        for (int64_t i = 0; remaining > 0; i++) {
            int s = order[i % 256];
            if (hist[s] > 0 && (step > 0 || f[s] > 1)) {
                f[s] += step;
                remaining--;
            }
        }
    }
    for (int i = 0; i < 256; i++) f_out[i] = (uint32_t)f[i];
}

size_t freqs_serialize(const uint32_t* f, uint8_t* out) {
    uint8_t* bitmap = out;
    memset(bitmap, 0, 32);
    size_t off = 32;
    for (int i = 0; i < 256; i++)
        if (f[i] > 0) bitmap[i >> 3] |= (uint8_t)(1u << (i & 7));
    for (int i = 0; i < 256; i++)
        if (f[i] > 0) {
            out[off++] = (uint8_t)(f[i] & 0xFF);
            out[off++] = (uint8_t)(f[i] >> 8);
        }
    return off;
}

size_t freqs_deserialize(const uint8_t* in, uint32_t* f) {
    size_t off = 32;
    for (int i = 0; i < 256; i++) {
        if (in[i >> 3] & (1u << (i & 7))) {
            f[i] = (uint32_t)in[off] | ((uint32_t)in[off + 1] << 8);
            off += 2;
        } else f[i] = 0;
    }
    return off;
}

struct LaneLayout {
    int64_t K;
    int N;
};

LaneLayout layout(int64_t n) {
    int N = 1 << choose_log_lanes(n);
    int64_t K = n > 0 ? (n + N - 1) / N : 0;
    return {K, N};
}

}  // namespace

extern "C" {

namespace {

// Granlund-Montgomery magic division: q = (x * M) >> (32 + l), exact for all
// x < 2^32 when e = M*d - 2^(32+l) satisfies 0 < e <= 2^l (checked at build).
struct Magic {
    uint64_t M;
    int sh;
    bool exact;
};

Magic make_magic(uint32_t d) {
    if (d == 0) return {0, 0, false};
    int l = 0;
    while ((1u << l) < d) l++;            // l = ceil(log2(d)), d <= 2^12
    if ((d & (d - 1)) == 0)               // power of two: M = 2^32, plain shift
        return {(uint64_t)1 << 32, 32 + l, true};
    uint64_t two_pow = (uint64_t)1 << (32 + l);
    uint64_t M = (two_pow + d - 1) / d;   // ceil
    uint64_t e = M * d - two_pow;         // Granlund-Montgomery exactness
    return {M, 32 + l, e > 0 && e <= ((uint64_t)1 << l)};
}

inline uint32_t magic_div(uint32_t x, const Magic& m, uint32_t d) {
    if (__builtin_expect(!m.exact, 0)) return x / d;
    return (uint32_t)(((unsigned __int128)x * m.M) >> m.sh);
}

}  // namespace

// ---------------------------------------------------------------------------
// rANS order-0 / order-1 encode.  Two cache-friendly passes: (A) per-lane
// sequential encode into per-lane word buffers + emit bitsets (lane chunks
// are contiguous input ranges); (B) bitset-driven merge into the single
// interleaved stream in (step desc, lane desc) order.
// Returns number of bytes written, or -1 on error.
// ---------------------------------------------------------------------------
int64_t gxz_rans_encode(const uint8_t* data, int64_t n, int order,
                        uint8_t* out, int64_t out_cap) {
    auto [K, N] = layout(n);
    int logN = choose_log_lanes(n);

    std::vector<uint32_t> freq, cum;
    std::vector<uint8_t> ftab;

    if (order == 0) {
        int64_t hist[256] = {0};
        for (int64_t i = 0; i < n; i++) hist[data[i]]++;
        freq.resize(256); cum.resize(256);
        normalize_freqs(hist, freq.data());
        uint32_t c = 0;
        for (int i = 0; i < 256; i++) { cum[i] = c; c += freq[i]; }
        ftab.resize(32 + 512);
        ftab.resize(freqs_serialize(freq.data(), ftab.data()));
    } else {
        std::vector<int64_t> hist2(256 * 256, 0);
        for (int l = 0; l < N; l++) {
            int64_t s0 = (int64_t)l * K, s1 = std::min(s0 + K, n);
            uint8_t ctx = 0;
            for (int64_t i = s0; i < s1; i++) {
                hist2[(size_t)ctx * 256 + data[i]]++;
                ctx = data[i];
            }
        }
        freq.assign(256 * 256, 0); cum.assign(256 * 256, 0);
        std::vector<uint8_t> raw(32, 0);
        for (int c0 = 0; c0 < 256; c0++) {
            int64_t t = 0;
            for (int s = 0; s < 256; s++) t += hist2[(size_t)c0 * 256 + s];
            if (t == 0) continue;
            raw[c0 >> 3] |= (uint8_t)(1u << (c0 & 7));
            normalize_freqs(&hist2[(size_t)c0 * 256], &freq[(size_t)c0 * 256]);
            uint32_t cc = 0;
            for (int s = 0; s < 256; s++) {
                cum[(size_t)c0 * 256 + s] = cc;
                cc += freq[(size_t)c0 * 256 + s];
            }
            uint8_t buf[32 + 512];
            size_t len = freqs_serialize(&freq[(size_t)c0 * 256], buf);
            raw.insert(raw.end(), buf, buf + len);
        }
        uLongf clen = compressBound(raw.size());
        std::vector<uint8_t> comp(clen);
        if (compress2(comp.data(), &clen, raw.data(), raw.size(), 6) != Z_OK)
            return -1;
        ftab.resize(8 + clen);
        uint32_t rl = (uint32_t)raw.size(), cl = (uint32_t)clen;
        memcpy(ftab.data(), &rl, 4);
        memcpy(ftab.data() + 4, &cl, 4);
        memcpy(ftab.data() + 8, comp.data(), clen);
    }

    int64_t hdr_len = 6 + (int64_t)ftab.size();
    int64_t max_words = n + 2 * (int64_t)N + 8;
    if (out_cap < hdr_len + max_words * 2) return -1;

    out[0] = (uint8_t)logN;
    out[1] = (uint8_t)order;
    uint32_t n32 = (uint32_t)n;
    memcpy(out + 2, &n32, 4);
    memcpy(out + 6, ftab.data(), ftab.size());

    // magic-division tables (one per distinct freq value)
    size_t ntab = order == 0 ? 256 : 256 * 256;
    std::vector<Magic> magic(ntab);
    for (size_t i = 0; i < ntab; i++)
        if (freq[i]) magic[i] = make_magic(freq[i]);

    // pass A: per-lane sequential encode (lane chunk = contiguous input)
    std::vector<uint32_t> x(N, RANS_L);
    std::unique_ptr<uint16_t[]> lane_words(new uint16_t[n + N]);  // no init
    std::vector<int64_t> lane_wcnt(N, 0);
    int64_t bits_per_lane = (K + 63) / 64 + 1;
    std::vector<uint64_t> flags((size_t)bits_per_lane * N, 0);
    std::vector<int64_t> lane_wstart(N + 1, 0);
    // capacity: lane l emits at most lane_len words
    for (int l = 0; l < N; l++) {
        int64_t lane_len = std::min((int64_t)(l + 1) * K, n) - (int64_t)l * K;
        if (lane_len < 0) lane_len = 0;
        lane_wstart[l + 1] = lane_wstart[l] + lane_len;
    }
    // 4-way lane interleaving breaks the per-lane serial dependency chain
    // (the state update's div/mul latency would otherwise bound throughput)
    for (int g = 0; g < N; g += 4) {
        int nl = std::min(4, N - g);
        int64_t s0[4], len[4], wc[4] = {0, 0, 0, 0};
        uint32_t xx[4];
        uint16_t* wbuf[4];
        uint64_t* fl[4];
        int64_t tmax = 0;
        for (int j = 0; j < nl; j++) {
            int l = g + j;
            s0[j] = (int64_t)l * K;
            len[j] = std::max((int64_t)0, std::min(s0[j] + K, n) - s0[j]);
            xx[j] = RANS_L;
            wbuf[j] = &lane_words[lane_wstart[l]];
            fl[j] = &flags[(size_t)bits_per_lane * l];
            tmax = std::max(tmax, len[j]);
        }
        for (int64_t t = tmax - 1; t >= 0; t--) {
            for (int j = 0; j < nl; j++) {
                if (t >= len[j]) continue;
                uint8_t s = data[s0[j] + t];
                size_t ix;
                if (order == 0) ix = s;
                else {
                    uint8_t ctx = (t == 0) ? 0 : data[s0[j] + t - 1];
                    ix = (size_t)ctx * 256 + s;
                }
                uint32_t f = freq[ix], c = cum[ix];
                uint32_t v = xx[j];
                if ((v >> 20) >= f) {
                    wbuf[j][wc[j]++] = (uint16_t)(v & 0xFFFF);
                    v >>= 16;
                    fl[j][t >> 6] |= (uint64_t)1 << (t & 63);
                }
                uint32_t q = magic_div(v, magic[ix], f);
                xx[j] = (q << SCALE_BITS) + (v - q * f) + c;
            }
        }
        for (int j = 0; j < nl; j++) {
            x[g + j] = xx[j];
            lane_wcnt[g + j] = wc[j];
        }
    }

    // pass B: merge in (step desc, lane desc) order, writing backward
    std::unique_ptr<uint16_t[]> words(new uint16_t[max_words]);  // no init
    int64_t p = max_words;
    std::vector<int64_t> consumed(N, 0);  // words consumed per lane (from 0)
    for (int64_t t = K - 1; t >= 0; t--) {
        int64_t word_idx = t >> 6;
        uint64_t bit = (uint64_t)1 << (t & 63);
        for (int l = N - 1; l >= 0; l--) {
            if (flags[(size_t)bits_per_lane * l + word_idx] & bit)
                words[--p] = lane_words[lane_wstart[l] + consumed[l]++];
        }
    }
    // flush states backward: descending lane, lo then hi
    for (int l = N - 1; l >= 0; l--) {
        words[--p] = (uint16_t)(x[l] & 0xFFFF);
        words[--p] = (uint16_t)(x[l] >> 16);
    }
    int64_t nwords = max_words - p;
    memcpy(out + hdr_len, &words[p], (size_t)nwords * 2);
    return hdr_len + nwords * 2;
}

// ---------------------------------------------------------------------------
// rANS decode.  Returns bytes written to out (== n from header) or -1.
// ---------------------------------------------------------------------------
int64_t gxz_rans_decode(const uint8_t* in, int64_t in_len, uint8_t* out,
                        int64_t out_cap) {
    if (in_len < 6) return -1;
    int logN = in[0], order = in[1];
    int N = 1 << logN;
    uint32_t n32;
    memcpy(&n32, in + 2, 4);
    int64_t n = n32;
    if (out_cap < n) return -1;
    size_t off = 6;

    std::vector<uint32_t> freq, cum;
    std::vector<uint8_t> slot2sym;

    if (order == 0) {
        freq.resize(256); cum.resize(256);
        off += freqs_deserialize(in + off, freq.data());
        uint32_t c = 0;
        slot2sym.resize(SCALE);
        for (int s = 0; s < 256; s++) {
            cum[s] = c;
            for (uint32_t j = 0; j < freq[s]; j++) slot2sym[c + j] = (uint8_t)s;
            c += freq[s];
        }
    } else {
        uint32_t rawlen, clen;
        memcpy(&rawlen, in + off, 4);
        memcpy(&clen, in + off + 4, 4);
        off += 8;
        std::vector<uint8_t> raw(rawlen);
        uLongf rl = rawlen;
        if (uncompress(raw.data(), &rl, in + off, clen) != Z_OK) return -1;
        off += clen;
        freq.assign(256 * 256, 0); cum.assign(256 * 256, 0);
        slot2sym.assign((size_t)256 * SCALE, 0);
        size_t o2 = 32;
        for (int c0 = 0; c0 < 256; c0++) {
            if (!(raw[c0 >> 3] & (1u << (c0 & 7)))) {
                continue;
            }
            size_t used = freqs_deserialize(raw.data() + o2, &freq[(size_t)c0 * 256]);
            o2 += used;
            uint32_t cc = 0;
            for (int s = 0; s < 256; s++) {
                cum[(size_t)c0 * 256 + s] = cc;
                for (uint32_t j = 0; j < freq[(size_t)c0 * 256 + s]; j++)
                    slot2sym[(size_t)c0 * SCALE + cc + j] = (uint8_t)s;
                cc += freq[(size_t)c0 * 256 + s];
            }
        }
    }

    const uint16_t* words = (const uint16_t*)(in + off);
    int64_t nwords = (in_len - (int64_t)off) / 2;
    auto [K, N2] = layout(n);
    (void)N2;

    std::vector<uint32_t> x(N);
    for (int l = 0; l < N; l++)
        x[l] = ((uint32_t)words[2 * l] << 16) | words[2 * l + 1];
    int64_t p = 2 * N;

    // decode into a row-major (K, N) plane (sequential writes), then do a
    // cache-blocked transpose into the lane-chunk output layout
    std::vector<uint8_t> plane((size_t)K * N);
    std::vector<uint8_t> ctxv(N, 0);
    for (int64_t t = 0; t < K; t++) {
        uint8_t* row = &plane[(size_t)t * N];
        for (int l = 0; l < N; l++) {
            int64_t i = (int64_t)l * K + t;
            int64_t lane_end = std::min((int64_t)(l + 1) * K, n);
            if (i >= lane_end) { row[l] = 0; continue; }
            uint32_t xx = x[l];
            uint32_t slot = xx & (SCALE - 1);
            uint8_t s;
            uint32_t f, c;
            if (order == 0) {
                s = slot2sym[slot];
                f = freq[s]; c = cum[s];
            } else {
                uint8_t cc0 = ctxv[l];
                s = slot2sym[(size_t)cc0 * SCALE + slot];
                f = freq[(size_t)cc0 * 256 + s];
                c = cum[(size_t)cc0 * 256 + s];
                ctxv[l] = s;
            }
            xx = f * (xx >> SCALE_BITS) + slot - c;
            if (xx < RANS_L) {
                if (p >= nwords) return -2;
                xx = (xx << 16) | words[p++];
            }
            x[l] = xx;
            row[l] = s;
        }
    }
    // blocked transpose: out[l*K + t] = plane[t*N + l]
    constexpr int64_t B = 64;
    for (int64_t t0 = 0; t0 < K; t0 += B)
        for (int64_t l0 = 0; l0 < N; l0 += B) {
            int64_t t1 = std::min(t0 + B, K), l1 = std::min(l0 + B, (int64_t)N);
            for (int64_t l = l0; l < l1; l++) {
                int64_t lane_end = std::min((int64_t)(l + 1) * K, n);
                int64_t tmax = std::min(t1, lane_end - l * K);
                for (int64_t t = t0; t < tmax; t++)
                    out[l * K + t] = plane[(size_t)t * N + l];
            }
        }
    return n;
}

// ---------------------------------------------------------------------------
// BAM record scan: walk the alignment-record chain, filling record offsets
// (relative to `data`) and sizes. Returns record count, or -1 if truncated
// mid-record. `data` points at the first alignment record (after header).
// ---------------------------------------------------------------------------
int64_t gxz_bam_scan(const uint8_t* data, int64_t len, int64_t* offsets,
                     int64_t max_records, int64_t* consumed) {
    int64_t off = 0, cnt = 0;
    while (off + 4 <= len && cnt < max_records) {
        uint32_t block_size;
        memcpy(&block_size, data + off, 4);
        if (off + 4 + (int64_t)block_size > len) break;
        offsets[cnt++] = off;
        off += 4 + block_size;
    }
    *consumed = off;
    return cnt;
}

// adler32 passthrough (zlib's is fast)
uint32_t gxz_adler32(uint32_t seed, const uint8_t* data, int64_t len) {
    return (uint32_t)adler32(seed, data, (uInt)len);
}

}  // extern "C"
