// Native (k,w)-minimizer sketch — exact mirror of ops/minimizer.sketch_np:
// strand-canonical rolling 2k-bit hashes, 38→32-bit fold, murmur3 finalizer
// mix, windowed minimum with rightmost tie-break, N-window and palindrome
// masking.  O(L) via a monotonic deque (the numpy path is O(L·w)).
//
// The reference gets this from minimap2's C sketch (SURVEY.md §2.2); this
// is the host-side seeding kernel of the TPU build's aligner.
#include <cstdint>
#include <vector>

namespace {

inline uint32_t mix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85EBCA6Bu;
  h ^= h >> 13;
  h *= 0xC2B2AE35u;
  h ^= h >> 16;
  return h;
}

}  // namespace

extern "C" {

// codes: 2-bit codes with 4 = N.  Outputs sized >= L-k+1 by the caller.
// Returns the number of minimizers (or -1 on bad args).
int64_t sketch_dna(const int8_t* codes, int64_t L, int32_t k, int32_t w,
                   int64_t* out_pos, uint32_t* out_hash, int8_t* out_strand) {
  if (k < 1 || k > 31 || w < 1) return -1;
  const int64_t n = L - k + 1;
  if (n < w) return 0;
  const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);

  std::vector<uint32_t> h(n);
  std::vector<int8_t> strand(n);
  std::vector<uint8_t> ok(n);

  uint64_t fwd = 0, rc = 0;
  int64_t last_n = -1;  // last position holding an N
  for (int64_t i = 0; i < L; ++i) {
    uint64_t c = static_cast<uint64_t>(codes[i]);
    if (c > 3) {
      last_n = i;
      c = 0;
    }
    fwd = ((fwd << 2) | c) & mask;
    rc = (rc >> 2) | ((c ^ 3ull) << (2 * (k - 1)));
    int64_t p = i - k + 1;
    if (p < 0) continue;
    bool valid = last_n < p;
    bool amb = fwd == rc;
    int8_t s = rc < fwd ? 1 : 0;
    uint64_t canon = s ? rc : fwd;
    h[p] = mix32(static_cast<uint32_t>(canon ^ (canon >> 29)));
    strand[p] = s;
    ok[p] = valid && !amb;
  }

  // monotonic deque: back-pop on >= gives the RIGHTMOST argmin at the front
  std::vector<uint8_t> is_min(n, 0);
  std::vector<int64_t> dq(n);
  int64_t head = 0, tail = 0;  // [head, tail)
  for (int64_t i = 0; i < n; ++i) {
    if (ok[i]) {
      while (tail > head && h[dq[tail - 1]] >= h[i]) --tail;
      dq[tail++] = i;
    }
    int64_t win_lo = i - w + 1;
    while (tail > head && dq[head] < win_lo) ++head;
    if (win_lo >= 0 && tail > head) is_min[dq[head]] = 1;
  }

  int64_t m = 0;
  for (int64_t p = 0; p < n; ++p) {
    if (is_min[p]) {
      out_pos[m] = p;
      out_hash[m] = h[p];
      out_strand[m] = strand[p];
      ++m;
    }
  }
  return m;
}

}  // extern "C"
