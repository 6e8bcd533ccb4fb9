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
