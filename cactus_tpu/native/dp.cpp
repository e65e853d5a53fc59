// Host-side DP kernels: banded affine alignment + anchor chaining.
//
// Why native: the TPU Pallas kernels (ops/banded_pallas.py) own large
// batches, but the blast phase also produces swarms of tiny gap-fill
// problems where accelerator dispatch latency (and XLA-CPU compile
// diversity) dwarfs the compute.  These kernels are SEMANTICALLY
// IDENTICAL to the JAX reference kernels (ops/banded.py
// banded_align_batch + traceback_band, ops/chain.py _chain_scan) —
// same int32 arithmetic, same NEG clamps, same tie-breaking — so any
// batch can be routed to either backend with bit-identical results.
//
// Reference roles: lastz gapped extension / cPecan banded aligner
// (SURVEY §2.2), paffy chain (cactus_progressive_config.xml:108-113).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t NEG = -(1 << 28);

inline int32_t max3(int32_t a, int32_t b, int32_t c) {
    return std::max(a, std::max(b, c));
}

struct BandedJob {
    const uint8_t* q;
    const uint8_t* t;
    int64_t M, N;
    int32_t band;
    int64_t out_off;   // into moves buffer (capacity M+N)
};

// One pair: banded global affine DP, direction bits, host traceback.
// Mirrors ops/banded.py banded_align_batch row recurrence exactly.
void banded_one(const BandedJob& job, const int32_t* submat,
                int32_t gap_open, int32_t gap_extend,
                std::vector<uint8_t>& dirs_buf,
                int32_t* score_out, uint8_t* moves, int64_t* n_moves) {
    const int64_t M = job.M, N = job.N;
    const int32_t B = job.band;
    // band offset (pack_band_batch): center the [min(0,N-M), max(0,N-M)]
    // diagonal range, clamp so both corners stay in band
    int64_t dmin = std::min<int64_t>(0, N - M);
    int64_t dmax = std::max<int64_t>(0, N - M);
    int64_t lo = dmin - (B - (dmax - dmin)) / 2;
    lo = std::min<int64_t>(lo, 0);
    lo = std::max<int64_t>(lo, (N - M) - B + 1);

    dirs_buf.resize(static_cast<size_t>(std::max<int64_t>(M, 1)) * B);
    std::vector<int32_t> H(B), I(B), D(B), Hn(B), In(B), Dn(B);
    std::vector<int32_t> endH(B, NEG), endI(B, NEG), endD(B, NEG);

    // row 0 init: j = lo + b
    for (int32_t b = 0; b < B; ++b) {
        int64_t j0 = lo + b;
        H[b] = (j0 == 0) ? 0 : NEG;
        D[b] = (j0 > 0)
            ? static_cast<int32_t>(-(gap_open + j0 * gap_extend)) : NEG;
        I[b] = NEG;
    }
    if (M == 0) {
        endH = H; endD = D;   // endI stays NEG
    }

    for (int64_t i = 1; i <= M; ++i) {
        const int32_t* srow = submat + 6 * job.q[i - 1];
        uint8_t* drow = dirs_buf.data() + (i - 1) * B;
        for (int32_t b = 0; b < B; ++b) {
            int64_t j = i + lo + b;
            int32_t tc = (j >= 1 && j <= N)
                ? job.t[j - 1] : 5;              // PAD_T
            int32_t s = srow[tc];
            uint8_t h_src = (H[b] >= I[b]) ? 0 : 1;
            if (D[b] > std::max(H[b], I[b])) h_src = 2;
            int32_t hn = max3(H[b], I[b], D[b]) + s;

            int32_t Hup = (b + 1 < B) ? H[b + 1] : NEG;
            int32_t Iup = (b + 1 < B) ? I[b + 1] : NEG;
            bool ifresh = (Hup - gap_open) >= Iup;
            int32_t in = std::max(Hup - gap_open, Iup) - gap_extend;

            if (j == 0)
                in = static_cast<int32_t>(-(gap_open + i * gap_extend));
            if (j <= 0) hn = NEG;
            if (j < 0) in = NEG;
            Hn[b] = hn;
            In[b] = in;
            drow[b] = h_src | (uint8_t(ifresh) << 2);
        }
        // D chain: D[b] = max_{c<=b}(Hn[c-1] + e*c) - open - e*(b+1)
        int32_t R = NEG;
        for (int32_t b = 0; b < B; ++b) {
            int32_t Hl = (b > 0) ? Hn[b - 1] : NEG;
            R = std::max(R, Hl + gap_extend * b);
            int32_t dn = R - gap_open - gap_extend * (b + 1);
            bool dfresh = (dn == Hl - gap_open - gap_extend);
            int64_t j = i + lo + b;
            if (j <= 0) dn = NEG;
            Dn[b] = std::max(dn, NEG);
            Hn[b] = std::max(Hn[b], NEG);
            In[b] = std::max(In[b], NEG);
            drow[b] |= uint8_t(dfresh) << 3;
        }
        std::swap(H, Hn);
        std::swap(I, In);
        std::swap(D, Dn);
        if (i == M) { endH = H; endI = I; endD = D; }
    }

    int64_t b_end = N - M - lo;
    int32_t eh = endH[b_end], ei = endI[b_end], ed = endD[b_end];
    int32_t cur = 0, best = eh;                   // argmax, first-max wins
    if (ei > best) { best = ei; cur = 1; }
    if (ed > best) { best = ed; cur = 2; }
    *score_out = best;

    // traceback (mirrors ops/banded.py traceback_band); emit reverse
    // move codes (1=M, 2=I, 3=D) then reverse in place
    int64_t i = M, j = N, k = 0;
    while (i > 0 || j > 0) {
        if (i == 0) { moves[k++] = 3; --j; continue; }
        if (j == 0) { moves[k++] = 2; --i; continue; }
        int64_t b = j - i - lo;
        if (b < 0 || b >= B) { *n_moves = -1; return; }  // left the band
        uint8_t byte = dirs_buf[(i - 1) * B + b];
        if (cur == 0) {
            moves[k++] = 1; cur = byte & 3; --i; --j;
        } else if (cur == 1) {
            moves[k++] = 2; cur = ((byte >> 2) & 1) ? 0 : 1; --i;
        } else {
            moves[k++] = 3; cur = ((byte >> 3) & 1) ? 0 : 2; --j;
        }
    }
    std::reverse(moves, moves + k);
    *n_moves = k;
}

}  // namespace

extern "C" {

// Batched banded alignment.  Concatenated inputs; per-pair outputs:
// scores[p], moves at moves + moves_cap_off[p] (capacity M+N each),
// n_moves[p].  Threaded over pairs with an atomic work queue.
void dp_banded_batch(int64_t n_pairs,
                     const uint8_t* q, const int64_t* q_off,
                     const uint8_t* t, const int64_t* t_off,
                     const int32_t* band,
                     const int32_t* submat,       // 6x6 row-major
                     int32_t gap_open, int32_t gap_extend,
                     int32_t* scores,
                     uint8_t* moves, const int64_t* moves_cap_off,
                     int64_t* n_moves,
                     int32_t n_threads) {
    std::vector<BandedJob> jobs(n_pairs);
    for (int64_t p = 0; p < n_pairs; ++p) {
        jobs[p] = BandedJob{q + q_off[p], t + t_off[p],
                            q_off[p + 1] - q_off[p],
                            t_off[p + 1] - t_off[p],
                            band[p], moves_cap_off[p]};
    }
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<uint8_t> dirs_buf;
        for (;;) {
            int64_t p = next.fetch_add(1);
            if (p >= n_pairs) break;
            banded_one(jobs[p], submat, gap_open, gap_extend, dirs_buf,
                       scores + p, moves + jobs[p].out_off, n_moves + p);
        }
    };
    int32_t T = std::max<int32_t>(1, n_threads);
    if (T == 1 || n_pairs == 1) { worker(); return; }
    std::vector<std::thread> threads;
    for (int32_t i = 0; i < T; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Batched collinear chaining over sorted (qstart, tstart, len) runs.
// Mirrors ops/chain.py _chain_scan exactly, INCLUDING the ring-buffer
// slot-order argmax tie-break (slot = index % lookback; first max in
// slot order wins), so device and host backends agree bit-for-bit.
void dp_chain_batch(int64_t n_sets, const int64_t* set_off,
                    const int32_t* qs, const int32_t* ts, const int32_t* ln,
                    int32_t gap_open, int32_t gap_extend, int32_t max_gap,
                    int32_t lookback,
                    int32_t* scores, int32_t* preds,
                    int32_t n_threads) {
    const int32_t L = lookback;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<int32_t> b_q(L), b_t(L), b_qe(L), b_te(L),
            b_score(L), b_idx(L);
        for (;;) {
            int64_t s = next.fetch_add(1);
            if (s >= n_sets) break;
            int64_t lo = set_off[s], hi = set_off[s + 1];
            std::fill(b_q.begin(), b_q.end(), 0);
            std::fill(b_t.begin(), b_t.end(), 0);
            std::fill(b_qe.begin(), b_qe.end(), 0);
            std::fill(b_te.begin(), b_te.end(), 0);
            // chain NEG is -(1<<30) (ops/chain.py), unlike the DP's
            std::fill(b_score.begin(), b_score.end(), -(1 << 30));
            std::fill(b_idx.begin(), b_idx.end(), -1);
            for (int64_t gi = lo; gi < hi; ++gi) {
                int32_t i = static_cast<int32_t>(gi - lo);
                int32_t q = qs[gi], t = ts[gi], l = ln[gi];
                int32_t best = -(1 << 30);
                int32_t best_slot = -1;
                for (int32_t slot = 0; slot < L; ++slot) {
                    int64_t qg = int64_t(q) - b_qe[slot];
                    int64_t tg = int64_t(t) - b_te[slot];
                    int64_t dd = std::abs((int64_t(t) - q)
                                          - (int64_t(b_t[slot]) - b_q[slot]));
                    bool ok = (b_q[slot] < q) && (b_t[slot] < t)
                        && (b_idx[slot] >= 0)
                        && (qg <= max_gap) && (tg <= max_gap);
                    int64_t gapdist = std::max<int64_t>(
                        std::max<int64_t>(qg, 0), std::max<int64_t>(tg, 0));
                    int64_t cost = (dd != 0 ? gap_open + gap_extend * dd : 0)
                        + gapdist / 64;
                    int32_t cand = ok
                        ? static_cast<int32_t>(b_score[slot] - cost)
                        : -(1 << 30);
                    if (cand > best) { best = cand; best_slot = slot; }
                }
                int32_t best_j = (best > 0 && best_slot >= 0)
                    ? b_idx[best_slot] : -1;
                int32_t score = l + std::max(best, 0);
                int32_t slot = i % L;
                b_q[slot] = q; b_t[slot] = t;
                b_qe[slot] = q + l; b_te[slot] = t + l;
                b_score[slot] = score; b_idx[slot] = i;
                scores[gi] = score;
                preds[gi] = best_j;
            }
        }
    };
    int32_t T = std::max<int32_t>(1, n_threads);
    if (T == 1 || n_sets == 1) { worker(); return; }
    std::vector<std::thread> threads;
    for (int32_t i = 0; i < T; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Ungapped x-drop HSP filter (lastz's hspThresh semantics): score each
// seed run along its diagonal, extend both ways with x-drop
// termination, keep runs whose best ungapped score reaches the
// threshold.  This is what kills the L^2/2^bits chance seed hits
// before they reach the chaining sort (the reference runs the same
// filter inside lastz; config hspThreshold).  Codes >= 4 (N/pad) score
// as mismatches.
void dp_hsp_filter(const uint8_t* q, int64_t lq,
                   const uint8_t* t, int64_t lt,
                   int64_t n_runs,
                   const int64_t* qs, const int64_t* ts,
                   const int64_t* ln,
                   int32_t match, int32_t mismatch,
                   int32_t xdrop, int32_t hsp_thresh,
                   uint8_t* keep, int32_t n_threads) {
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(4096);
            if (i >= n_runs) break;
            int64_t hi = std::min(i + 4096, n_runs);
            for (; i < hi; ++i) {
                int64_t q0 = qs[i], t0 = ts[i], L = ln[i];
                int64_t score = 0;
                for (int64_t j = 0; j < L; ++j) {
                    uint8_t a = q[q0 + j], b = t[t0 + j];
                    score += (a == b && a < 4) ? match : mismatch;
                }
                int64_t best = score;
                // extend right
                int64_t cur = score;
                for (int64_t j = 0; ; ++j) {
                    int64_t x = q0 + L + j, y = t0 + L + j;
                    if (x >= lq || y >= lt) break;
                    uint8_t a = q[x], b = t[y];
                    cur += (a == b && a < 4) ? match : mismatch;
                    if (cur > best) best = cur;
                    if (best - cur > xdrop) break;
                }
                // extend left
                cur = best;
                int64_t peak = best;
                for (int64_t j = 1; ; ++j) {
                    int64_t x = q0 - j, y = t0 - j;
                    if (x < 0 || y < 0) break;
                    uint8_t a = q[x], b = t[y];
                    cur += (a == b && a < 4) ? match : mismatch;
                    if (cur > peak) peak = cur;
                    if (peak - cur > xdrop) break;
                }
                keep[i] = peak >= hsp_thresh;
            }
        }
    };
    int32_t T = std::max<int32_t>(1, n_threads);
    if (T == 1 || n_runs < 8192) { worker(); return; }
    std::vector<std::thread> threads;
    for (int32_t k = 0; k < T; ++k) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Greedy best-first chain extraction + overlap trimming (mirrors
// ops/chain.py extract_chains followed by trim_chain_overlaps, fused).
// Inputs are the sorted runs + the chain scan's scores/preds and a
// descending-score visit order (np.argsort(-scores), passed in so the
// stable tie-break matches numpy exactly).  Emits, per surviving
// chain, its trimmed (qstart, tstart, len) runs; chains whose runs are
// entirely consumed by overlap trimming are dropped (the Python path
// drops them at layout time — same effect).  Returns n_chains.
int64_t dp_chain_extract(int64_t n,
                         const int32_t* qs, const int32_t* ts,
                         const int32_t* ln,
                         const int32_t* scores, const int32_t* preds,
                         const int64_t* order_desc, int32_t min_score,
                         int64_t* out_runs,        // (n*3) capacity
                         int64_t* chain_off,       // (n+1) capacity
                         int32_t* chain_score) {   // (n) capacity
    std::vector<uint8_t> used(n, 0);
    std::vector<int32_t> idxs;
    int64_t n_chains = 0;
    int64_t n_out = 0;
    chain_off[0] = 0;
    for (int64_t oi = 0; oi < n; ++oi) {
        int64_t i = order_desc[oi];
        if (used[i] || scores[i] < min_score) continue;
        idxs.clear();
        int64_t j = i;
        while (j >= 0 && !used[j]) {
            idxs.push_back(static_cast<int32_t>(j));
            used[j] = 1;
            j = preds[j];
        }
        // walk collected back-to-front = forward chain order
        int64_t prev_qe = INT64_MIN / 2, prev_te = INT64_MIN / 2;
        int64_t emitted = 0;
        for (auto it = idxs.rbegin(); it != idxs.rend(); ++it) {
            int64_t rq = qs[*it], rt = ts[*it], rl = ln[*it];
            int64_t cut = std::max<int64_t>(
                std::max(prev_qe - rq, prev_te - rt), 0);
            if (cut >= rl) continue;
            rq += cut; rt += cut; rl -= cut;
            out_runs[3 * n_out] = rq;
            out_runs[3 * n_out + 1] = rt;
            out_runs[3 * n_out + 2] = rl;
            ++n_out;
            ++emitted;
            prev_qe = rq + rl;
            prev_te = rt + rl;
        }
        if (emitted) {
            chain_score[n_chains] = scores[i];
            chain_off[++n_chains] = n_out;
        }
    }
    return n_chains;
}

}  // extern "C"
