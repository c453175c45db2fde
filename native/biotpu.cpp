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

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// SA-IS (Nong, Zhang & Chan 2009), integer alphabet version.
// ---------------------------------------------------------------------------

void get_counts(const int64_t* T, int64_t* C, int64_t n, int64_t K) {
  std::memset(C, 0, sizeof(int64_t) * K);
  for (int64_t i = 0; i < n; ++i) C[T[i]]++;
}

void get_buckets(const int64_t* C, int64_t* B, int64_t K, bool end) {
  int64_t sum = 0;
  for (int64_t i = 0; i < K; ++i) {
    sum += C[i];
    B[i] = end ? sum : sum - C[i];
  }
}

// T: text (values in [0, K)); SA: output length n. Requires T[n-1] unique
// minimum (sentinel) for standard SAIS; our callers guarantee distinct
// sentinel ranks, making the last symbol the unique minimum of its run.
void sais_core(const int64_t* T, int64_t* SA, int64_t n, int64_t K) {
  if (n == 0) return;
  if (n == 1) { SA[0] = 0; return; }

  std::vector<uint8_t> t(n);  // 1 = S-type, 0 = L-type
  t[n - 1] = 1;
  for (int64_t i = n - 2; i >= 0; --i)
    t[i] = (T[i] < T[i + 1] || (T[i] == T[i + 1] && t[i + 1])) ? 1 : 0;

  auto is_lms = [&](int64_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int64_t> C(K), B(K);

  // Stage 1: sort LMS substrings via induced sorting.
  get_counts(T, C.data(), n, K);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = 0; i < n; ++i) SA[i] = -1;
  for (int64_t i = n - 1; i > 0; --i)
    if (is_lms(i)) SA[--B[T[i]]] = i;

  auto induce = [&]() {
    // induce L-types left to right
    get_buckets(C.data(), B.data(), K, false);
    for (int64_t i = 0; i < n; ++i) {
      int64_t j = SA[i];
      if (j > 0 && !t[j - 1]) SA[B[T[j - 1]]++] = j - 1;
    }
    // induce S-types right to left
    get_buckets(C.data(), B.data(), K, true);
    for (int64_t i = n - 1; i >= 0; --i) {
      int64_t j = SA[i];
      if (j > 0 && t[j - 1]) SA[--B[T[j - 1]]] = j - 1;
    }
  };
  induce();

  // Compact sorted LMS positions to the front.
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; ++i)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];

  // Name LMS substrings into SA[n1..] (indexed by pos/2).
  for (int64_t i = n1; i < n; ++i) SA[i] = -1;
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; ++i) {
    int64_t pos = SA[i];
    bool diff = false;
    // canonical LMS-substring comparison: equal types at equal chars imply
    // equal is_lms flags, so a break at an LMS boundary means "identical"
    for (int64_t d = 0; d < n; ++d) {
      if (prev < 0 || pos + d >= n || prev + d >= n ||
          T[pos + d] != T[prev + d] || t[pos + d] != t[prev + d]) {
        diff = true;
        break;
      }
      if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) break;
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  // Compact names to the tail in text order: s1 = SA[n - n1 .. n).
  int64_t* s1 = SA + n - n1;
  for (int64_t i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // Stage 2: sort the reduced problem.
  if (name < n1) {
    sais_core(s1, SA, n1, name);  // SA[0..n1) = suffix array of reduced text
  } else {
    for (int64_t i = 0; i < n1; ++i) SA[s1[i]] = i;
  }

  // Stage 3: map reduced order back to LMS text positions, then induce.
  for (int64_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;  // LMS positions in text order
  for (int64_t i = 0; i < n1; ++i) SA[i] = s1[SA[i]];

  get_counts(T, C.data(), n, K);
  get_buckets(C.data(), B.data(), K, true);
  for (int64_t i = n1; i < n; ++i) SA[i] = -1;
  for (int64_t i = n1 - 1; i >= 0; --i) {
    int64_t j = SA[i];
    SA[i] = -1;
    SA[--B[T[j]]] = j;
  }
  induce();
}

}  // namespace

extern "C" {

// Suffix array of an int64 text over alphabet [0, K). SA must hold n entries.
void sais_i64(const int64_t* text, int64_t n, int64_t K, int64_t* sa) {
  sais_core(text, sa, n, K);
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
