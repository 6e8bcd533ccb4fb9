// Dense mismatch/small-indel window scan for inversion rescue — native
// counterpart of aligner.Aligner._soup_runs (see that docstring for the
// algorithm).  Runs on EVERY alignment, so the mismatch locate must be a
// single C pass instead of per-M-run numpy slice compares.
//
// cigar: (n_ops, 2) int64 rows [op, len] with BAM op codes
// (0=M, 1=I, 2=D, 4=S).  qc: query codes in alignment orientation.
// tc: full target codes.  Events and barriers are generated in ascending
// ref order by construction (single left-to-right walk).
// Returns the number of runs written to out_r0/out_r1 (post-margin,
// clipped to the alignment's ref span).
#include <cstdint>
#include <vector>

extern "C" {

int64_t soup_runs(
    const int64_t* cigar, int64_t n_ops, int64_t pos,
    const int8_t* qc, int64_t qlen, const int8_t* tc, int64_t tlen,
    int64_t gap, int64_t min_span, int64_t min_events, double density,
    int64_t small_indel, int64_t max_span, int64_t margin_cap,
    int64_t* out_r0, int64_t* out_r1, int64_t max_out)
{
    std::vector<int64_t> ev;
    std::vector<int64_t> barriers;
    int64_t r = pos, q = 0;
    for (int64_t i = 0; i < n_ops; ++i) {
        const int64_t op = cigar[2 * i];
        const int64_t ln = cigar[2 * i + 1];
        if (op == 0) {                        // M: locate mismatches
            const int8_t* a = qc + q;
            const int8_t* b = tc + r;
            for (int64_t j = 0; j < ln; ++j)
                if (a[j] != b[j]) ev.push_back(r + j);
            r += ln;
            q += ln;
        } else if (op == 1 || op == 2) {      // I/D
            if (ln <= small_indel) ev.push_back(r);
            else barriers.push_back(r);
            if (op == 1) q += ln;
            else r += ln;
        } else if (op == 4) {                 // S
            q += ln;
        }
    }
    const int64_t t_end = r;
    const int64_t ne = (int64_t)ev.size();
    // cheap reject: k events must fit inside gap*(k-1) somewhere
    if (ne < min_events) return 0;
    bool possible = false;
    for (int64_t i = 0; i + min_events - 1 < ne; ++i)
        if (ev[i + min_events - 1] - ev[i] <= gap * (min_events - 1)) {
            possible = true;
            break;
        }
    if (!possible) return 0;

    int64_t n_out = 0;
    std::size_t bi = 0;
    int64_t s = 0;
    for (int64_t i = 1; i <= ne && n_out < max_out; ++i) {
        bool cut = i == ne || ev[i] - ev[i - 1] > gap;
        if (!cut && !barriers.empty()) {
            // a real-indel barrier strictly between consecutive events
            while (bi < barriers.size() && barriers[bi] <= ev[i - 1]) ++bi;
            if (bi < barriers.size() && barriers[bi] <= ev[i]) cut = true;
        }
        if (!cut) continue;
        const int64_t lo = ev[s], hi = ev[i - 1] + 1;
        const int64_t n = i - s, span = hi - lo;
        s = i;
        if (span < min_span || n < min_events || span > max_span
            || (double)n / (double)span < density)
            continue;
        int64_t m = span / 12;
        if (m < 3) m = 3;
        if (m > margin_cap) m = margin_cap;
        int64_t r0 = lo - m; if (r0 < pos) r0 = pos;
        int64_t r1 = hi + m; if (r1 > t_end) r1 = t_end;
        out_r0[n_out] = r0;
        out_r1[n_out] = r1;
        ++n_out;
    }
    return n_out;
}

}  // extern "C"
