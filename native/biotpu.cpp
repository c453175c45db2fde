// Native runtime kernels for rust_bio_tpu (host-side hot paths).
//
// The reference crate leans on native SIMD crates (triple_accel,
// editdistancek, bytecount) and an O(n) SAIS suffix-array construction
// (reference: src/data_structures/suffix_array.rs:478-703). This library is
// their native equivalent for the TPU framework's host side:
//   - sais_i64: linear-time induced-sorting suffix array over an integer
//     alphabet (drop-in accelerator for index builds at genome scale).
//   - myers_distance_u64: bit-parallel global edit distance (block-based,
//     unlimited pattern length).
//   - hamming_u8: vectorizable byte-difference count.
// Exposed with a plain C ABI for ctypes binding (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "sais.hpp"

namespace {

// ---------------------------------------------------------------------------
// SA-IS lives in sais.hpp (shared with the CPU baseline twins).
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Gap-penalized sparse DP chaining (sdpkpp), the banded aligner's backbone.
// Statement-level twin of alignment/sparse.py::sdpkpp (itself mirroring the
// reference sparse.rs:188): event sweep + prefix-max Fenwick tree over the
// column axis with the 6-field lexicographic PrevPtr ordering.
// ---------------------------------------------------------------------------

namespace sdp {

struct P6 {
  int64_t a, b, c, d, e, f;
};

static inline bool lt6(const P6& x, const P6& y) {
  if (x.a != y.a) return x.a < y.a;
  if (x.b != y.b) return x.b < y.b;
  if (x.c != y.c) return x.c < y.c;
  if (x.d != y.d) return x.d < y.d;
  if (x.e != y.e) return x.e < y.e;
  return x.f < y.f;
}

struct Fenwick {
  std::vector<P6> tree;  // 1-based, prefix-max
  explicit Fenwick(int64_t n) : tree(n + 1, P6{0, 0, 0, 0, 0, 0}) {}
  P6 get(int64_t idx) const {
    ++idx;
    P6 best{0, 0, 0, 0, 0, 0};
    while (idx > 0) {
      if (lt6(best, tree[idx])) best = tree[idx];
      idx -= idx & (-idx);
    }
    return best;
  }
  void set(int64_t idx, const P6& val) {
    ++idx;
    while (idx < (int64_t)tree.size()) {
      if (lt6(tree[idx], val)) tree[idx] = val;
      idx += idx & (-idx);
    }
  }
};

struct Ev {
  int64_t x, y, eidx;
};

}  // namespace sdp

}  // namespace

extern "C" {

// Suffix array of an int64 text over alphabet [0, K). SA must hold n entries.
void sais_i64(const int64_t* text, int64_t n, int64_t K, int64_t* sa) {
  sais::sais_core(text, sa, n, K);
}

// sdpkpp chaining over nm sorted (x, y) kmer matches.  go_neg/ge_neg are the
// POSITIVE gap penalties (-gap_open, -gap_extend).  Outputs: per-match
// dp_score/dp_prev and best_out = {best_score, best_end_index_or_-1}.
void sdpkpp_i64(const int64_t* xs, const int64_t* ys, int64_t nm, int64_t k,
                int64_t match_score, int64_t go_neg, int64_t ge_neg,
                int64_t* dp_score, int64_t* dp_prev, int64_t* best_out) {
  using sdp::Ev;
  using sdp::Fenwick;
  using sdp::P6;
  std::vector<Ev> events;
  events.reserve(2 * nm);
  int64_t n = 0;
  for (int64_t i = 0; i < nm; ++i) {
    events.push_back(Ev{xs[i], ys[i], i + nm});
    events.push_back(Ev{xs[i] + k, ys[i] + k, i});
    n = std::max(n, std::max(xs[i] + k, ys[i] + k));
  }
  std::sort(events.begin(), events.end(), [](const Ev& a, const Ev& b) {
    if (a.x != b.x) return a.x < b.x;
    if (a.y != b.y) return a.y < b.y;
    return a.eidx < b.eidx;
  });

  Fenwick max_col_dp(n);
  for (int64_t i = 0; i < nm; ++i) {
    dp_score[i] = 0;
    dp_prev[i] = 0;
  }
  int64_t best_score = k, best_idx = 0;

  auto dp_max = [&](int64_t p, int64_t s, int64_t prev) {
    if (s > dp_score[p] || (s == dp_score[p] && prev > dp_prev[p])) {
      dp_score[p] = s;
      dp_prev[p] = prev;
    }
  };
  auto best_max = [&](int64_t s, int64_t idx) {
    if (s > best_score || (s == best_score && idx > best_idx)) {
      best_score = s;
      best_idx = idx;
    }
  };

  for (const Ev& ev : events) {
    int64_t p = ev.eidx % nm;
    if (ev.eidx >= nm) {  // chain start
      dp_score[p] = k * match_score;
      dp_prev[p] = -1;
      P6 t = max_col_dp.get(ev.y);
      if (t.b > 0) {
        int64_t gap = std::max(ev.x - t.e, ev.y - t.f);
        int64_t gap_penalty = gap > 0 ? go_neg + gap * ge_neg : 0;
        int64_t reward = k * match_score;
        int64_t new_score = std::max(t.b + reward - gap_penalty, (int64_t)0);
        dp_max(p, new_score, t.d);
        best_max(dp_score[p], p);
      }
    } else {
      if (ev.x > k && ev.y > k) {
        // lower_bound for the diagonal predecessor match
        int64_t tx = ev.x - k - 1, ty = ev.y - k - 1;
        int64_t lo = 0, hi = nm;
        while (lo < hi) {
          int64_t mid = (lo + hi) / 2;
          if (xs[mid] < tx || (xs[mid] == tx && ys[mid] < ty)) {
            lo = mid + 1;
          } else {
            hi = mid;
          }
        }
        if (lo < nm && xs[lo] == tx && ys[lo] == ty) {
          dp_max(p, dp_score[lo] + match_score, lo);
          best_max(dp_score[p], p);
        }
      }
      int64_t d = ev.x + ev.y;
      max_col_dp.set(ev.y,
                     P6{dp_score[p] + d * ge_neg, dp_score[p], d, p, ev.x, ev.y});
    }
  }
  best_out[0] = best_score;
  best_out[1] = best_idx;
}


// Bit-parallel (block-based Myers) global edit distance; any lengths.
int64_t myers_distance_u64(const uint8_t* a, int64_t na, const uint8_t* b,
                           int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  const int64_t W = (na + 63) / 64;
  std::vector<uint64_t> peq(256 * W, 0);
  for (int64_t i = 0; i < na; ++i)
    peq[a[i] * W + (i >> 6)] |= 1ULL << (i & 63);
  std::vector<uint64_t> pv(W, ~0ULL), mv(W, 0);
  int64_t dist = na;
  const int64_t bw = (na - 1) >> 6;       // word holding the bound bit
  const uint64_t bbit = 1ULL << ((na - 1) & 63);
  for (int64_t j = 0; j < nb; ++j) {
    const uint64_t* eq = &peq[b[j] * W];
    uint64_t carry_add = 0, ph_carry = 1, mh_carry = 0;  // column 0 grows
    for (int64_t w = 0; w < W; ++w) {
      uint64_t e = eq[w], p = pv[w], m = mv[w];
      uint64_t xv = e | m;
      uint64_t ep = e & p;
      uint64_t t1 = ep + p;
      uint64_t c1 = (t1 < ep) ? 1 : 0;
      uint64_t sum = t1 + carry_add;
      uint64_t c2 = (sum < t1) ? 1 : 0;
      carry_add = c1 | c2;
      uint64_t xh = (sum ^ p) | e;
      uint64_t ph = m | ~(xh | p);
      uint64_t mh = p & xh;
      if (w == bw) {
        if (ph & bbit) ++dist;
        else if (mh & bbit) --dist;
      }
      uint64_t ph_shift = (ph << 1) | ph_carry;
      ph_carry = ph >> 63;
      uint64_t mh_shift = (mh << 1) | mh_carry;
      mh_carry = mh >> 63;
      pv[w] = mh_shift | ~(xv | ph_shift);
      mv[w] = ph_shift & xv;
    }
  }
  return dist;
}

// Count of positions where two equal-length byte strings differ.
int64_t hamming_u8(const uint8_t* a, const uint8_t* b, int64_t n) {
  int64_t d = 0;
  for (int64_t i = 0; i < n; ++i) d += (a[i] != b[i]) ? 1 : 0;
  return d;
}

// Occurrence count of a byte in a range (the reference's bytecount role).
int64_t bytecount_u8(const uint8_t* s, int64_t n, uint8_t c) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) k += (s[i] == c) ? 1 : 0;
  return k;
}

}  // extern "C"
