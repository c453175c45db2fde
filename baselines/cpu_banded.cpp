// CPU baseline: banded Smith-Waterman with k-mer band construction,
// algorithmically equivalent to the reference's banded aligner
// (reference: src/alignment/pairwise/banded.rs — hash_kmers + sdpkpp
// chaining (sparse.rs:188-292) + Band::create_from_match_path raster
// (banded.rs:1046-1330) + the banded custom-clip DP with full traceback
// (banded.rs:420-870)).
//
// Used by bench.py to anchor `banded_long_vs_baseline`: the round-3 row
// divided by a CPython oracle, which is not an apples-to-apples CPU
// number.  This twin is -O3 single-core C++ of the same pipeline the
// reference's `semiglobal()` runs per pair: band build + banded DP +
// traceback walk to operations.
//
// Band machinery (kmer match enumeration, sdpkpp Fenwick chaining, band
// rasterization) is shared with the repo's own native host library —
// those routines are property-tested byte-identical to the Python twin
// of banded.rs.
//
// Usage: cpu_banded <B> <M> <N> <iters> [k] [w]   — prints pairs/sec.
//        cpu_banded check [k] [w] < pairs.txt     — per-pair "score\tops"
//          (stdin: count, then x/y line pairs; for parity tests)
// Keep the shared band machinery reference-faithful: the twin must
// measure the REFERENCE's algorithms (generic hashed k-mer lookup,
// raw-coordinate Fenwick), not this repo's DNA-specialized fast paths.
#define BIOTPU_REFERENCE_TWIN
#include "../native/biotpu.cpp"

#include <chrono>
#include <cstdio>
#include <random>
#include <string>
#include <thread>

#include "../native/banded_dp.hpp"

using namespace banded_dp;


int main(int argc, char** argv) {
  // semiglobal: x fully aligned (x-clips forbidden), y clipped free
  Scoring sc{-5, -1, 2, -2, NS, NS, 0, 0};

  if (argc >= 2 && std::string(argv[1]) == "check") {
    int k = argc > 2 ? std::atoi(argv[2]) : 8;
    int w = argc > 3 ? std::atoi(argv[3]) : 8;
    int count;
    if (std::scanf("%d", &count) != 1) return 2;
    Workspace ws;
    std::string xs, ys;
    for (int t = 0; t < count; ++t) {
      char buf[1 << 16];
      if (std::scanf("%65535s", buf) != 1) return 2;
      xs = buf;
      if (std::scanf("%65535s", buf) != 1) return 2;
      ys = buf;
      int32_t score = run_pair((const uint8_t*)xs.data(), (int)xs.size(),
                               (const uint8_t*)ys.data(), (int)ys.size(),
                               sc, k, w, ws);
      std::printf("%d\t%zu\n", score, ws.ops.size());
    }
    return 0;
  }

  int B = argc > 1 ? std::atoi(argv[1]) : 256;
  int M = argc > 2 ? std::atoi(argv[2]) : 150;
  int N = argc > 3 ? std::atoi(argv[3]) : 20000;
  int iters = argc > 4 ? std::atoi(argv[4]) : 3;
  int k = argc > 5 ? std::atoi(argv[5]) : 8;
  int w = argc > 6 ? std::atoi(argv[6]) : 8;
  int nthreads = argc > 7 ? std::atoi(argv[7]) : 1;

  // workload distribution mirrors bench._banded_long_rates: random y,
  // x = M-window of y with 4 substitutions
  std::mt19937_64 rng(31);
  static const char* ACGT = "ACGT";
  std::vector<std::vector<uint8_t>> xs(B), ys(B);
  for (int b = 0; b < B; ++b) {
    ys[b].resize(N);
    for (int t = 0; t < N; ++t) ys[b][t] = ACGT[rng() & 3];
    int s = (int)(rng() % (N - M));
    xs[b].assign(ys[b].begin() + s, ys[b].begin() + s + M);
    for (int e = 0; e < 4; ++e) xs[b][rng() % M] = ACGT[rng() & 3];
  }

  // optional thread fan-out over the pair batch (per-thread Workspace) —
  // the reference's documented scale-out model (lib.rs:173-210)
  double best = 1e100;
  int64_t sink = 0;
  std::vector<Workspace> wss(std::max(nthreads, 1));
  for (int it = 0; it < iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    if (nthreads <= 1) {
      Workspace& ws = wss[0];
      for (int b = 0; b < B; ++b) {
        sink += run_pair(xs[b].data(), M, ys[b].data(), N, sc, k, w, ws);
        sink += (int64_t)ws.ops.size();
      }
    } else {
      std::vector<std::thread> th;
      std::vector<int64_t> sinks(nthreads, 0);
      for (int t = 0; t < nthreads; ++t) {
        th.emplace_back([&, t]() {
          int64_t s = 0;
          for (int b = t; b < B; b += nthreads) {
            s += run_pair(xs[b].data(), M, ys[b].data(), N, sc, k, w, wss[t]);
            s += (int64_t)wss[t].ops.size();
          }
          sinks[t] = s;
        });
      }
      for (auto& x : th) x.join();
      for (int t = 0; t < nthreads; ++t) sink += sinks[t];
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    if (dt < best) best = dt;
  }
  std::fprintf(stderr, "sink=%lld\n", (long long)sink);
  std::printf("%.3f\n", B / best);
  return 0;
}
