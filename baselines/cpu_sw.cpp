// CPU baseline: scalar affine-gap global aligner with full traceback,
// algorithmically equivalent to the reference's pairwise aligner hot loop
// (reference: src/alignment/pairwise/mod.rs:591-920 — column-major DP, two
// rolling score columns, packed traceback matrix, traceback walk).
//
// Used by bench.py to anchor `vs_baseline`: rust-bio's own numbers were
// measured on hardware we don't have, and cargo is not in this image, so we
// measure an -O3 C++ twin of its inner loop on this machine's CPU instead.
//
// Usage: cpu_sw <B> <M> <N> <iters>   — prints alignments/sec.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <vector>

static const int32_t MIN_SCORE = -858993459;

struct Result { int32_t score; int ops; };

// global alignment: x (len m) vs y (len n)
static Result align_global(const uint8_t* x, int m, const uint8_t* y, int n,
                           int32_t go, int32_t ge, int32_t ma, int32_t mi,
                           std::vector<int32_t>& S, std::vector<int32_t>& Sp,
                           std::vector<int32_t>& I, std::vector<int32_t>& D,
                           std::vector<uint16_t>& tb) {
  // tb cell: bits 0-3 I-layer, 4-7 D-layer, 8-11 S-layer
  // codes: 1=ins,2=del,3=match,4=subst,0=start
  S.assign(m + 1, 0); Sp.assign(m + 1, 0);
  I.assign(m + 1, MIN_SCORE); D.assign(m + 1, MIN_SCORE);
  tb.assign((size_t)(m + 1) * (n + 1), 0);
  for (int i = 1; i <= m; ++i) {
    S[i] = (i == 1) ? go : S[i - 1] + ge;
    I[i] = S[i];
    tb[i] = (uint16_t)(1 | (1 << 8));
  }
  std::swap(S, Sp);
  for (int j = 1; j <= n; ++j) {
    int32_t s0 = (j == 1) ? go : Sp[0] + ge;
    S[0] = s0; D[0] = s0;
    tb[(size_t)0 * (n + 1) + j] = (uint16_t)((2 << 4) | (2 << 8));
    int32_t Ii = MIN_SCORE;
    for (int i = 1; i <= m; ++i) {
      int32_t msc = Sp[i - 1] + ((x[i - 1] == y[j - 1]) ? ma : mi);
      uint16_t sbits = (x[i - 1] == y[j - 1]) ? 3 : 4;
      int32_t d_ext = D[i] + ge, d_open = Sp[i] + go;
      int32_t Dd; uint16_t dbits;
      if (d_ext > d_open) { Dd = d_ext; dbits = 2; } else { Dd = d_open; dbits = 4; }
      int32_t i_ext = Ii + ge, i_open = S[i - 1] + go;
      uint16_t ibits;
      if (i_ext > i_open) { Ii = i_ext; ibits = 1; } else { Ii = i_open; ibits = 4; }
      int32_t best = msc; uint16_t bbits = sbits;
      if (Ii > best) { best = Ii; bbits = 1; }
      if (Dd > best) { best = Dd; bbits = 2; }
      S[i] = best; D[i] = Dd; I[i] = Ii;
      tb[(size_t)i * (n + 1) + j] = (uint16_t)(ibits | (dbits << 4) | (bbits << 8));
    }
    std::swap(S, Sp);
  }
  // traceback walk
  int i = m, j = n, ops = 0, layer = (tb[(size_t)m * (n + 1) + n] >> 8) & 0xF;
  while (i > 0 || j > 0) {
    uint16_t cell = tb[(size_t)i * (n + 1) + j];
    ++ops;
    if (layer == 1) { layer = cell & 0xF; --i; }
    else if (layer == 2) { layer = (cell >> 4) & 0xF; --j; }
    else { --i; --j; layer = i >= 0 && j >= 0 ? (tb[(size_t)i * (n + 1) + j] >> 8) & 0xF : 0; }
    if (ops > m + n + 4) break;
  }
  return {Sp[m], ops};
}

int main(int argc, char** argv) {
  int B = argc > 1 ? atoi(argv[1]) : 1024;
  int M = argc > 2 ? atoi(argv[2]) : 150;
  int N = argc > 3 ? atoi(argv[3]) : 150;
  int iters = argc > 4 ? atoi(argv[4]) : 5;
  std::mt19937 rng(42);
  std::vector<std::vector<uint8_t>> xs(B), ys(B);
  for (int b = 0; b < B; ++b) {
    xs[b].resize(M); ys[b].resize(N);
    for (auto& c : xs[b]) c = "ACGT"[rng() & 3];
    for (auto& c : ys[b]) c = "ACGT"[rng() & 3];
  }
  std::vector<int32_t> S, Sp, I, D; std::vector<uint16_t> tb;
  volatile int64_t sink = 0;
  // warmup
  for (int b = 0; b < B; ++b)
    sink += align_global(xs[b].data(), M, ys[b].data(), N, -5, -1, 2, -2, S, Sp, I, D, tb).score;
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it)
    for (int b = 0; b < B; ++b)
      sink += align_global(xs[b].data(), M, ys[b].data(), N, -5, -1, 2, -2, S, Sp, I, D, tb).score;
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("%.2f\n", (double)B * iters / secs);
  return (int)(sink & 1);
}
