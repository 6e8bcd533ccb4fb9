// All-vs-all overlap discovery for one phase-block read group — fused
// native kernel (the hifiasm Overlaps.cpp role, SURVEY.md §2.2).
//
// Replaces the numpy anchor pipeline in assembly/olc._find_overlaps
// (sketch → index build → hit expansion → lexsort → segment → chain):
// the numpy path materializes ~10M-anchor int64 arrays per 1 Mb group and
// spends ~30 s/group shuffling them; here the same semantics run in one
// pass over thread-local buffers.  Semantics mirrored exactly:
//   - index = stable hash-sorted (read-major, pos-ascending) minimizers,
//     occurrence-filtered like ops/minimizer.MinimizerIndex.build
//     (max_occ = max(10, quantile(counts, 1-2e-4)); <50 uniq → max)
//   - per query minimizer: first max_hits index hits (cap BEFORE the
//     self-hit filter, as in the numpy path), strand-relative anchors
//     with q' = qlen - k - q on '-'
//   - per (target, strand) segment: anchors sorted by (t, q), one best
//     chain via chain_dp (chain.cpp), min_score/min_anchors gates
//   - per (query, target): '+' strand preferred over '-'
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
int64_t sketch_dna(const int8_t* codes, int64_t L, int32_t k, int32_t w,
                   int64_t* out_pos, uint32_t* out_hash, int8_t* out_strand);
void chain_dp(const int64_t* q, const int64_t* t, int64_t n,
              int32_t k, int32_t max_pred, int64_t max_gap, int64_t bandwidth,
              float gap_scale, float* f, int32_t* pre);
}

namespace {

struct IdxEnt {
    uint32_t hash;
    int32_t read;
    int32_t pos;
    int8_t strand;
};

struct AvaAnchor {
    int32_t t_read;
    int8_t strand;      // +1 / -1 relative
    int32_t tl;         // target-local pos
    int32_t qp;         // oriented query pos
};

struct OvOut {
    int32_t b;
    int8_t strand;
    float score;
    int64_t q_start, q_end, t_start, t_end;   // oriented query / raw target
};

}  // namespace

extern "C" {

struct AvaResult {
    int64_t n;
    int32_t* a;
    int32_t* b;
    int8_t* strand;
    float* score;
    int64_t* q_start;   // oriented (forward-frame) query coords
    int64_t* q_end;
    int64_t* t_start;   // raw target coords
    int64_t* t_end;
};

AvaResult* ava_overlaps(
    const int8_t* codes, const int64_t* q_off, int64_t n_reads,
    int32_t k, int32_t w, int32_t max_hits,
    int32_t max_pred, int64_t max_gap, int64_t bandwidth, float gap_scale,
    float min_score, int32_t min_anchors, int32_t n_threads)
{
    int nt = n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (nt > (int)n_reads) nt = n_reads > 0 ? (int)n_reads : 1;

    // ---- sketch every read (parallel), thread-local then concat ----
    std::vector<std::vector<IdxEnt>> sk_per_read((size_t)n_reads);
    {
        auto work = [&](int tid) {
            std::vector<int64_t> pos;
            std::vector<uint32_t> hash;
            std::vector<int8_t> strand;
            for (int64_t r = tid; r < n_reads; r += nt) {
                const int64_t L = q_off[r + 1] - q_off[r];
                const int64_t n_km = L - k + 1;
                if (n_km < w) continue;
                if ((int64_t)pos.size() < n_km) {
                    pos.resize(n_km); hash.resize(n_km); strand.resize(n_km);
                }
                int64_t m = sketch_dna(codes + q_off[r], L, k, w,
                                       pos.data(), hash.data(),
                                       strand.data());
                auto& v = sk_per_read[(size_t)r];
                v.reserve(m > 0 ? m : 0);
                for (int64_t i = 0; i < m; ++i)
                    v.push_back({hash[i], (int32_t)r, (int32_t)pos[i],
                                 strand[i]});
            }
        };
        std::vector<std::thread> ths;
        for (int tid = 0; tid < nt; ++tid) ths.emplace_back(work, tid);
        for (auto& th : ths) th.join();
    }
    std::vector<IdxEnt> index;
    {
        size_t total = 0;
        for (auto& v : sk_per_read) total += v.size();
        index.reserve(total);
        for (auto& v : sk_per_read)
            index.insert(index.end(), v.begin(), v.end());
    }
    // stable sort by hash keeps (read-major, pos-ascending) order within
    // equal hashes — matches np.argsort(h, kind="stable")
    std::stable_sort(index.begin(), index.end(),
                     [](const IdxEnt& x, const IdxEnt& y) {
                         return x.hash < y.hash;
                     });

    // ---- occurrence filter (MinimizerIndex.build parity) ----
    if (!index.empty()) {
        std::vector<int64_t> counts;
        for (size_t i = 0; i < index.size();) {
            size_t j = i;
            while (j < index.size() && index[j].hash == index[i].hash) ++j;
            counts.push_back((int64_t)(j - i));
            i = j;
        }
        int64_t max_occ;
        std::vector<int64_t> sorted_counts = counts;
        std::sort(sorted_counts.begin(), sorted_counts.end());
        const size_t nu = sorted_counts.size();
        if (nu < 50) {
            max_occ = sorted_counts.back();
        } else {
            const double q = 1.0 - 2e-4;
            const double fpos = q * (double)(nu - 1);
            const size_t lo = (size_t)fpos;
            const double frac = fpos - (double)lo;
            double val = (double)sorted_counts[lo];
            if (lo + 1 < nu)
                val += frac * (double)(sorted_counts[lo + 1]
                                       - sorted_counts[lo]);
            max_occ = (int64_t)val;
        }
        if (max_occ < 10) max_occ = 10;
        std::vector<IdxEnt> kept;
        kept.reserve(index.size());
        size_t ci = 0;
        for (size_t i = 0; i < index.size();) {
            size_t j = i;
            while (j < index.size() && index[j].hash == index[i].hash) ++j;
            if (counts[ci] <= max_occ)
                kept.insert(kept.end(), index.begin() + i, index.begin() + j);
            ++ci;
            i = j;
        }
        index.swap(kept);
    }
    const int64_t idx_n = (int64_t)index.size();

    // ---- per-query expansion + segment chaining (parallel) ----
    std::vector<std::vector<OvOut>> per_q((size_t)n_reads);
    auto work_q = [&](int tid) {
        std::vector<AvaAnchor> anch;
        std::vector<int64_t> qs, ts;
        std::vector<float> f_buf;
        std::vector<int32_t> pre_buf;
        for (int64_t qi = tid; qi < n_reads; qi += nt) {
            const auto& mins = sk_per_read[(size_t)qi];
            if (mins.empty()) continue;
            const int64_t qlen = q_off[qi + 1] - q_off[qi];
            anch.clear();
            for (const auto& mm : mins) {
                // lower_bound over index hashes
                int64_t lo = 0, hi = idx_n;
                while (lo < hi) {
                    int64_t mid = (lo + hi) >> 1;
                    if (index[mid].hash < mm.hash) lo = mid + 1;
                    else hi = mid;
                }
                int64_t cnt = 0;
                for (int64_t j = lo; j < idx_n && cnt < max_hits
                                     && index[j].hash == mm.hash;
                     ++j, ++cnt) {
                    const IdxEnt& e = index[j];
                    if (e.read == (int32_t)qi) continue;   // self (post-cap)
                    const int8_t sa = e.strand == mm.strand ? 1 : -1;
                    const int32_t qp2 = sa == -1
                        ? (int32_t)(qlen - k) - mm.pos : mm.pos;
                    anch.push_back({e.read, sa, e.pos, qp2});
                }
            }
            if ((int64_t)anch.size() < min_anchors) continue;
            // segment order: (t_read, strand(-1 first), tl, qp)
            std::sort(anch.begin(), anch.end(),
                      [](const AvaAnchor& x, const AvaAnchor& y) {
                          if (x.t_read != y.t_read) return x.t_read < y.t_read;
                          if (x.strand != y.strand) return x.strand < y.strand;
                          if (x.tl != y.tl) return x.tl < y.tl;
                          return x.qp < y.qp;
                      });
            auto& out = per_q[(size_t)qi];
            int32_t cur_t = -1;
            bool have_plus = false;
            OvOut pend{};
            bool have_pend = false;
            auto flush_target = [&]() {
                if (have_pend) out.push_back(pend);
                have_pend = false;
                have_plus = false;
            };
            for (size_t i = 0; i < anch.size();) {
                size_t j = i;
                while (j < anch.size() && anch[j].t_read == anch[i].t_read
                       && anch[j].strand == anch[i].strand) ++j;
                const int32_t t_read = anch[i].t_read;
                const int8_t sa = anch[i].strand;
                if (t_read != cur_t) { flush_target(); cur_t = t_read; }
                const int64_t n = (int64_t)(j - i);
                if (n >= min_anchors && !(have_plus)) {
                    qs.resize(n); ts.resize(n);
                    for (int64_t x = 0; x < n; ++x) {
                        qs[x] = anch[i + x].qp;
                        ts[x] = anch[i + x].tl;
                    }
                    if ((int64_t)f_buf.size() < n) {
                        f_buf.resize(n); pre_buf.resize(n);
                    }
                    chain_dp(qs.data(), ts.data(), n, k, max_pred, max_gap,
                             bandwidth, gap_scale, f_buf.data(),
                             pre_buf.data());
                    int64_t best_i = 0;
                    for (int64_t x = 1; x < n; ++x)
                        if (f_buf[x] > f_buf[best_i]) best_i = x;
                    int64_t cnt2 = 0, x = best_i, start = best_i;
                    while (x >= 0) { start = x; ++cnt2; x = pre_buf[x]; }
                    if (cnt2 >= min_anchors && f_buf[best_i] >= min_score) {
                        // '+' replaces a pending '-'; '-' never replaces
                        const int64_t q_start_or = qs[start];
                        const int64_t q_end_or = qs[best_i] + k;
                        int64_t fq_s, fq_e;
                        if (sa == -1) {
                            fq_s = qlen - q_end_or;
                            fq_e = qlen - q_start_or;
                        } else {
                            fq_s = q_start_or;
                            fq_e = q_end_or;
                        }
                        pend = OvOut{t_read, sa, f_buf[best_i],
                                     fq_s, fq_e, ts[start],
                                     ts[best_i] + k};
                        have_pend = true;
                        if (sa == 1) have_plus = true;
                    }
                }
                i = j;
            }
            flush_target();
        }
    };
    {
        std::vector<std::thread> ths;
        for (int tid = 0; tid < nt; ++tid) ths.emplace_back(work_q, tid);
        for (auto& th : ths) th.join();
    }

    int64_t total = 0;
    for (auto& v : per_q) total += (int64_t)v.size();
    auto* r = (AvaResult*)std::malloc(sizeof(AvaResult));
    r->n = total;
    r->a = (int32_t*)std::malloc(sizeof(int32_t) * (total + 1));
    r->b = (int32_t*)std::malloc(sizeof(int32_t) * (total + 1));
    r->strand = (int8_t*)std::malloc(sizeof(int8_t) * (total + 1));
    r->score = (float*)std::malloc(sizeof(float) * (total + 1));
    r->q_start = (int64_t*)std::malloc(sizeof(int64_t) * (total + 1));
    r->q_end = (int64_t*)std::malloc(sizeof(int64_t) * (total + 1));
    r->t_start = (int64_t*)std::malloc(sizeof(int64_t) * (total + 1));
    r->t_end = (int64_t*)std::malloc(sizeof(int64_t) * (total + 1));
    int64_t i = 0;
    for (int64_t qi = 0; qi < n_reads; ++qi) {
        for (const auto& o : per_q[(size_t)qi]) {
            r->a[i] = (int32_t)qi;
            r->b[i] = o.b;
            r->strand[i] = o.strand;
            r->score[i] = o.score;
            r->q_start[i] = o.q_start;
            r->q_end[i] = o.q_end;
            r->t_start[i] = o.t_start;
            r->t_end[i] = o.t_end;
            ++i;
        }
    }
    return r;
}

void ava_free(AvaResult* r) {
    if (!r) return;
    std::free(r->a);
    std::free(r->b);
    std::free(r->strand);
    std::free(r->score);
    std::free(r->q_start);
    std::free(r->q_end);
    std::free(r->t_start);
    std::free(r->t_end);
    std::free(r);
}

}  // extern "C"
