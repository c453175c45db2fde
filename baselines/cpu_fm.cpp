// CPU baseline: FM-index backward search with checkpointed Occ + bytecount,
// algorithmically equivalent to the reference's hot loop (reference:
// src/data_structures/bwt.rs:94-182 — Occ checkpoints every k rows, query =
// checkpoint + byte count over <= k BWT bytes with the nearest-checkpoint
// optimization for k > 64; src/data_structures/fmindex.rs:144-208 —
// backward_search with the occ_r == 0 underflow guard).
//
// Used by bench.py to anchor `fm_vs_baseline`: rust-bio's own numbers were
// measured on hardware we don't have, and cargo is not in this image, so we
// measure an -O3 C++ twin of its inner loop on this machine's CPU instead.
//
// Usage: cpu_fm <text_len> <B> <L> <occ_k> <iters>  — prints queries/sec.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <thread>
#include <vector>
#include <algorithm>

// ---------------------------------------------------------------------------
// index construction (build time is not measured; any correct SA works).
// SA-IS from the shared header — O(n), required for the 50 Mbp regime.
// ---------------------------------------------------------------------------
#include "../native/sais.hpp"

static std::vector<int64_t> suffix_array_sais(const std::vector<uint8_t>& t) {
  int64_t n = (int64_t)t.size();
  std::vector<int64_t> T(n), sa(n);
  for (int64_t i = 0; i < n; i++) T[i] = t[i];
  sais::sais_core<int64_t, int64_t>(T.data(), sa.data(), n, int64_t{256});
  return sa;
}

struct Occ {
  // checkpoints every k rows per PRESENT symbol (the reference's Occ is
  // alphabet-sized, bwt.rs:76-92 — a dense 256-row table would cost
  // 16 GB at a 1 Gbp text): occ[sym_id][i] = count in bwt[0 .. i*k)
  int k;
  std::vector<std::vector<uint32_t>> table;  // [n_syms][n/k + 1]
  int sym_id[256];
  const uint8_t* bwt;
  int64_t n;

  void build(const std::vector<uint8_t>& b, int k_) {
    k = k_;
    n = (int64_t)b.size();
    bwt = b.data();
    for (int a = 0; a < 256; a++) sym_id[a] = -1;
    int ns = 0;
    for (int64_t i = 0; i < n; i++)
      if (sym_id[b[i]] < 0) sym_id[b[i]] = ns++;
    int64_t ncp = n / k + 1;
    table.assign(ns, std::vector<uint32_t>(ncp, 0));
    std::vector<uint32_t> cur(ns, 0);
    for (int64_t i = 0; i < n; i++) {
      if (i % k == 0) {
        int64_t cp = i / k;
        for (int a = 0; a < ns; a++) table[a][cp] = cur[a];
      }
      cur[sym_id[b[i]]]++;
    }
  }

  // count of symbol a in bwt[0 ..= r] (bwt.rs:129-182): nearest checkpoint,
  // counting forward from the one at/below r or backward from the one above
  inline uint32_t get(int64_t r, uint8_t a) const {
    int id = sym_id[a];
    if (id < 0) return 0;
    int64_t cp = r / k;
    int64_t lo = cp * k;
    int64_t hi = lo + k;  // next checkpoint row (may be past n)
    if (r - lo < hi - 1 - r || hi >= n) {
      uint32_t c = table[id][cp];
      const uint8_t* p = bwt + lo;
      for (int64_t i = lo; i <= r; i++) c += (*p++ == a);
      return c;
    }
    uint32_t c = table[id][cp + 1];
    const uint8_t* p = bwt + r + 1;
    uint32_t sub = 0;
    for (int64_t i = r + 1; i < hi; i++) sub += (*p++ == a);
    return c - sub;
  }
};

struct FM {
  std::vector<uint8_t> bwt;
  std::vector<int64_t> less;  // [257]
  Occ occ;

  void build(const std::vector<uint8_t>& text, int occ_k) {
    auto sa = suffix_array_sais(text);
    int64_t n = (int64_t)text.size();
    bwt.resize(n);
    for (int64_t i = 0; i < n; i++)
      bwt[i] = text[(sa[i] + n - 1) % n];
    build_from_bwt_inplace(occ_k);
  }

  // genome-scale anchor path: the caller injects a prebuilt BWT (build
  // time is not measured; the 1 Gbp int64 SA build would cost ~24 GB and
  // ~10 min per bench run).  `less` from BWT counts == from text counts
  // (the BWT is a permutation of the text).
  void build_from_bwt_inplace(int occ_k) {
    less.assign(257, 0);
    std::vector<int64_t> counts(256, 0);
    for (uint8_t c : bwt) counts[c]++;
    for (int a = 1; a <= 256; a++) less[a] = less[a - 1] + counts[a - 1];
    occ.build(bwt, occ_k);
  }

  // returns matched length (== plen iff complete); replicates
  // fmindex.rs:144-208 incl. the occ_r == 0 guard
  inline int backward_search(const uint8_t* pat, int plen,
                             int64_t* out_l, int64_t* out_r) const {
    int64_t l = 0, r = (int64_t)bwt.size() - 1;
    int matched = 0;
    for (int i = plen - 1; i >= 0; i--) {
      uint8_t a = pat[i];
      uint32_t occ_r = occ.get(r, a);
      if (occ_r == 0) break;  // underflow guard (issue #606)
      int64_t l2 = less[a] + (l > 0 ? (int64_t)occ.get(l - 1, a) : 0);
      int64_t r2 = less[a] + (int64_t)occ_r - 1;
      if (l2 > r2) break;
      l = l2; r = r2; matched++;
    }
    *out_l = l; *out_r = r;
    return matched;
  }
};

int main(int argc, char** argv) {
  // --bwt <bwtfile> <patsfile> <B> <L> <occ_k> <iters>: query a prebuilt
  // index (the 1 Gbp anchor row; patterns are raw B*L bytes)
  if (argc >= 8 && strcmp(argv[1], "--bwt") == 0) {
    const char* bwtfile = argv[2];
    const char* patfile = argv[3];
    int B = atoi(argv[4]);
    int L = atoi(argv[5]);
    int occ_k = atoi(argv[6]);
    int iters = atoi(argv[7]);
    // one or more thread counts: the index is built ONCE and each count
    // is timed in turn (one rate line each, argv order) — a Gbp-scale
    // occ build costs minutes, so the 1-core and 4-core anchors must
    // share it
    std::vector<int> thread_counts;
    for (int a = 8; a < argc; a++) thread_counts.push_back(atoi(argv[a]));
    if (thread_counts.empty()) thread_counts.push_back(1);
    FM fm;
    {
      FILE* f = fopen(bwtfile, "rb");
      if (!f) return 2;
      fseek(f, 0, SEEK_END);
      int64_t n = ftell(f);
      fseek(f, 0, SEEK_SET);
      fm.bwt.resize(n);
      if ((int64_t)fread(fm.bwt.data(), 1, n, f) != n) return 2;
      fclose(f);
    }
    fm.build_from_bwt_inplace(occ_k);
    std::vector<uint8_t> pats((size_t)B * L);
    {
      FILE* f = fopen(patfile, "rb");
      if (!f) return 2;
      if (fread(pats.data(), 1, pats.size(), f) != pats.size()) return 2;
      fclose(f);
    }
    volatile int64_t sink = 0;
    for (int b = 0; b < B; b++) {
      int64_t l, r;
      sink += fm.backward_search(&pats[(size_t)b * L], L, &l, &r);
    }
    // optional thread fan-out over the query batch — the reference's
    // documented scale-out model (lib.rs:173-210: embarrassingly
    // parallel per-query work fanned over OS threads)
    for (int nthreads : thread_counts) {
      double best = 1e100;
      for (int it = 0; it < iters; it++) {
        auto t0 = std::chrono::steady_clock::now();
        if (nthreads <= 1) {
          for (int b = 0; b < B; b++) {
            int64_t l, r;
            sink +=
                fm.backward_search(&pats[(size_t)b * L], L, &l, &r) + l + r;
          }
        } else {
          std::vector<std::thread> th;
          std::vector<int64_t> sinks(nthreads, 0);
          for (int t = 0; t < nthreads; t++) {
            th.emplace_back([&, t]() {
              int64_t s = 0;
              for (int b = t; b < B; b += nthreads) {
                int64_t l, r;
                s += fm.backward_search(&pats[(size_t)b * L], L, &l, &r) +
                     l + r;
              }
              sinks[t] = s;
            });
          }
          for (auto& x : th) x.join();
          for (int t = 0; t < nthreads; t++) sink += sinks[t];
        }
        double dt = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        best = std::min(best, dt);
      }
      printf("%.2f\n", B / best);
    }
    return (int)(sink & 1);
  }
  int64_t text_len = argc > 1 ? atoll(argv[1]) : 100000;
  int B = argc > 2 ? atoi(argv[2]) : 65536;
  int L = argc > 3 ? atoi(argv[3]) : 20;
  int occ_k = argc > 4 ? atoi(argv[4]) : 128;
  int iters = argc > 5 ? atoi(argv[5]) : 3;

  std::mt19937_64 rng(11);
  const char ACGT[] = "ACGT";
  std::vector<uint8_t> text(text_len + 1);
  for (int64_t i = 0; i < text_len; i++) text[i] = ACGT[rng() & 3];
  text[text_len] = '$';

  FM fm;
  fm.build(text, occ_k);

  // patterns: existing substrings (all complete), same regime as bench.py
  std::vector<uint8_t> pats((size_t)B * L);
  for (int b = 0; b < B; b++) {
    int64_t s = (int64_t)(rng() % (text_len - L - 1));
    memcpy(&pats[(size_t)b * L], &text[s], L);
  }

  volatile int64_t sink = 0;
  // warmup
  for (int b = 0; b < B; b++) {
    int64_t l, r;
    sink += fm.backward_search(&pats[(size_t)b * L], L, &l, &r);
  }
  int nthreads = argc > 6 ? atoi(argv[6]) : 1;
  double best = 1e100;
  for (int it = 0; it < iters; it++) {
    auto t0 = std::chrono::steady_clock::now();
    if (nthreads <= 1) {
      for (int b = 0; b < B; b++) {
        int64_t l, r;
        sink += fm.backward_search(&pats[(size_t)b * L], L, &l, &r) + l + r;
      }
    } else {
      std::vector<std::thread> th;
      std::vector<int64_t> sinks(nthreads, 0);
      for (int t = 0; t < nthreads; t++) {
        th.emplace_back([&, t]() {
          int64_t s = 0;
          for (int b = t; b < B; b += nthreads) {
            int64_t l, r;
            s += fm.backward_search(&pats[(size_t)b * L], L, &l, &r) + l + r;
          }
          sinks[t] = s;
        });
      }
      for (auto& x : th) x.join();
      for (int t = 0; t < nthreads; t++) sink += sinks[t];
    }
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    best = std::min(best, dt);
  }
  printf("%.2f\n", B / best);
  return (int)(sink & 1);
}
