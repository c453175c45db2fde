// SA-IS (Nong, Zhang & Chan 2009), integer alphabet, int64 indices.
// Shared between the runtime library (biotpu.cpp) and the CPU baseline
// twins (baselines/cpu_fm.cpp needs a real SA builder at genome scale —
// its previous std::sort construction is O(n^2 log n) on 50 Mbp texts).
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace sais {

inline void get_counts(const int64_t* T, int64_t* C, int64_t n, int64_t K) {
  std::memset(C, 0, sizeof(int64_t) * K);
  for (int64_t i = 0; i < n; ++i) C[T[i]]++;
}

inline void get_buckets(const int64_t* C, int64_t* B, int64_t K, bool end) {
  int64_t sum = 0;
  for (int64_t i = 0; i < K; ++i) {
    sum += C[i];
    B[i] = end ? sum : sum - C[i];
  }
}

// T: text (values in [0, K)); SA: output length n. Requires T[n-1] unique
// minimum (sentinel) for standard SAIS; callers guarantee distinct sentinel
// ranks, making the last symbol the unique minimum of its run.
inline void sais_core(const int64_t* T, int64_t* SA, int64_t n, int64_t K) {
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

}  // namespace sais
