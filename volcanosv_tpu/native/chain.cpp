// Anchor chaining DP — native host kernel.
//
// minimap2-style chaining (the reference shells out to minimap2 for all
// alignment; Raw_variant_call.py:46-58).  Anchors sorted by (target, query);
// each anchor looks back at up to `max_pred` predecessors:
//   f[i] = max(k, max_j f[j] + min(dq,dt,k) - gapcost(|dt-dq|))
// with gapcost(g) = g * 0.05 + 0.5 * log2(g+1).
//
// This is inherently sequential host-side work between batched device stages
// (sketch → [chain] → banded DP refine), so it lives in C++:
// O(N * max_pred) scalar ops, ~10^8/s.
//
// Build: g++ -O3 -shared -fPIC chain.cpp -o libvolcano_native.so
#include <cstdint>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// q[i], t[i]: anchor query/target start positions (sorted by t then q).
// Outputs: f[i] chain score, pre[i] predecessor index or -1.
void chain_dp(
    const int64_t* q, const int64_t* t, int64_t n,
    int32_t k, int32_t max_pred, int64_t max_gap, int64_t bandwidth,
    float gap_scale,
    float* f, int32_t* pre)
{
    for (int64_t i = 0; i < n; i++) {
        float best = (float)k;
        int32_t best_j = -1;
        int64_t lo = i - max_pred; if (lo < 0) lo = 0;
        for (int64_t j = i - 1; j >= lo; j--) {
            int64_t dt = t[i] - t[j];
            int64_t dq = q[i] - q[j];
            if (dq <= 0 || dt <= 0) continue;
            if (dq > max_gap || dt > max_gap) continue;
            int64_t gap = dt > dq ? dt - dq : dq - dt;
            if (gap > bandwidth) continue;
            int64_t m = dq < dt ? dq : dt; if (m > k) m = k;
            float sc = f[j] + (float)m
                     - (gap_scale * (float)gap + 0.5f * log2f((float)gap + 1.0f));
            if (sc > best) { best = sc; best_j = (int32_t)j; }
        }
        f[i] = best;
        pre[i] = best_j;
    }
}

// Greedy backtrack of non-overlapping chains.
// used: scratch int8[n] zeroed by caller.
// out_chain_id[i]: chain id per anchor or -1.
// Returns number of chains with score >= min_score.
int64_t chain_backtrack(
    const float* f, const int32_t* pre, int64_t n,
    float min_score, int32_t min_anchors,
    int8_t* used, int32_t* out_chain_id, float* out_scores, int64_t max_chains)
{
    // order anchors by descending score
    int64_t* order = new int64_t[n];
    for (int64_t i = 0; i < n; i++) { order[i] = i; out_chain_id[i] = -1; }
    std::sort(order, order + n, [&](int64_t a, int64_t b){ return f[a] > f[b]; });
    int64_t n_chains = 0;
    for (int64_t oi = 0; oi < n && n_chains < max_chains; oi++) {
        int64_t i = order[oi];
        if (used[i] || f[i] < min_score) continue;
        // walk back; stop at used anchors
        int64_t cnt = 0;
        int64_t jj = i;
        while (jj >= 0 && !used[jj]) { cnt++; jj = pre[jj]; }
        if (cnt < min_anchors) continue;
        float start_f = (jj >= 0) ? f[jj] : 0.0f;
        float chain_score = f[i] - start_f;
        if (chain_score < min_score) continue;
        jj = i;
        while (jj >= 0 && !used[jj]) {
            used[jj] = 1;
            out_chain_id[jj] = (int32_t)n_chains;
            jj = pre[jj];
        }
        out_scores[n_chains] = chain_score;
        n_chains++;
    }
    delete[] order;
    return n_chains;
}

}  // extern "C"

extern "C" {

// Batched best-chain-per-segment DP for the all-vs-all overlap stage
// (assembly/olc._find_overlaps): one call chains every (target-read,
// strand) anchor segment of one query.  seg_off[n_seg+1] delimits segments
// in the (q, t) arrays, each segment pre-sorted by (t, q).  For each
// segment only the single best chain is returned as its span — the overlap
// detector consumes spans, not anchor paths.
void chain_segments(
    const int64_t* q, const int64_t* t, const int64_t* seg_off,
    int64_t n_seg,
    int32_t k, int32_t max_pred, int64_t max_gap, int64_t bandwidth,
    float gap_scale, int32_t min_anchors,
    float* out_score, int64_t* out_qlo, int64_t* out_qhi,
    int64_t* out_tlo, int64_t* out_thi, int32_t* out_nanch)
{
    int64_t max_len = 0, total = 0;
    for (int64_t s = 0; s < n_seg; s++) {
        int64_t len = seg_off[s + 1] - seg_off[s];
        if (len > max_len) max_len = len;
        total += len;
    }
    int nt = (int)std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (total < 20000 || n_seg < 2) nt = 1;   // tiny work: skip thread cost
    if (nt > (int)n_seg) nt = (int)n_seg;

    auto work = [&](int tid) {
        float* f = new float[max_len > 0 ? max_len : 1];
        int32_t* pre = new int32_t[max_len > 0 ? max_len : 1];
        for (int64_t s = tid; s < n_seg; s += nt) {
            const int64_t off = seg_off[s];
            const int64_t n = seg_off[s + 1] - off;
            out_score[s] = 0.0f;
            out_nanch[s] = 0;
            if (n < min_anchors) continue;
            const int64_t* qs = q + off;
            const int64_t* ts = t + off;
            chain_dp(qs, ts, n, k, max_pred, max_gap, bandwidth, gap_scale,
                     f, pre);
            int64_t best_i = 0;
            for (int64_t i = 1; i < n; i++)
                if (f[i] > f[best_i]) best_i = i;
            int64_t cnt = 0, i = best_i, start = best_i;
            while (i >= 0) { start = i; cnt++; i = pre[i]; }
            if (cnt < min_anchors) continue;
            out_score[s] = f[best_i];
            out_qlo[s] = qs[start];
            out_qhi[s] = qs[best_i];
            out_tlo[s] = ts[start];
            out_thi[s] = ts[best_i];
            out_nanch[s] = (int32_t)cnt;
        }
        delete[] f;
        delete[] pre;
    };
    if (nt == 1) {
        work(0);
    } else {
        std::vector<std::thread> ths;
        for (int tid = 0; tid < nt; ++tid) ths.emplace_back(work, tid);
        for (auto& th : ths) th.join();
    }
}

}  // extern "C"
