// CPU baseline: discrete-emission HMM Viterbi, algorithmically equivalent
// to the reference's implementation (reference: src/stats/hmm/mod.rs:318-373
// viterbi_matrices + viterbi_traceback — full (T, S) value + argmax-from
// tables in f64 log space, then a reverse walk).  Used by bench.py to
// anchor `hmm_viterbi_vs_baseline`: rust-bio's own numbers were measured
// on hardware we don't have, so we measure an -O3 C++ twin of its loop on
// this machine's CPU instead.
//
// Usage: cpu_hmm <B> <T> <iters> [threads]  — prints sequences/sec.
// Model: the reference doc-example's occasionally-dishonest-casino
// (2 states, 6 observation symbols; hmm/mod.rs docs).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <cmath>
#include <random>
#include <thread>
#include <vector>

static const int S = 2, V = 6;

struct Hmm {
  double A[S][S];   // ln transition
  double Bm[S][V];  // ln emission
  double pi[S];     // ln initial
};

// viterbi_matrices + viterbi_traceback (hmm/mod.rs:318-373): (T, S) val
// and from tables, traceback from the argmax of the last column.
static double viterbi(const Hmm& h, const uint8_t* obs, int T,
                      std::vector<double>& vals, std::vector<int>& from,
                      std::vector<int>& path) {
  vals.resize((size_t)T * S);
  from.resize((size_t)T * S);
  path.resize(T);
  for (int s = 0; s < S; s++) {
    vals[s] = h.pi[s] + h.Bm[s][obs[0]];
    from[s] = 0;
  }
  for (int i = 1; i < T; i++) {
    for (int j = 0; j < S; j++) {
      double best = -1e300;
      int arg = 0;
      for (int k = 0; k < S; k++) {
        double c = vals[(size_t)(i - 1) * S + k] + h.A[k][j];
        if (c > best) { best = c; arg = k; }
      }
      vals[(size_t)i * S + j] = best + h.Bm[j][obs[i]];
      from[(size_t)i * S + j] = arg;
    }
  }
  double best = -1e300;
  int cur = 0;
  for (int s = 0; s < S; s++)
    if (vals[(size_t)(T - 1) * S + s] > best) {
      best = vals[(size_t)(T - 1) * S + s];
      cur = s;
    }
  for (int i = T - 1; i >= 0; i--) {
    path[i] = cur;
    cur = from[(size_t)i * S + cur];
  }
  return best;
}

int main(int argc, char** argv) {
  int B = argc > 1 ? atoi(argv[1]) : 8192;
  int T = argc > 2 ? atoi(argv[2]) : 1000;
  int iters = argc > 3 ? atoi(argv[3]) : 3;
  int nthreads = argc > 4 ? atoi(argv[4]) : 1;

  Hmm h;
  // occasionally-dishonest-casino (hmm/mod.rs doc example)
  double a[S][S] = {{0.95, 0.05}, {0.1, 0.9}};
  double b[S][V] = {{1 / 6., 1 / 6., 1 / 6., 1 / 6., 1 / 6., 1 / 6.},
                    {1 / 10., 1 / 10., 1 / 10., 1 / 10., 1 / 10., 1 / 2.}};
  double p[S] = {0.5, 0.5};
  for (int i = 0; i < S; i++) {
    h.pi[i] = std::log(p[i]);
    for (int j = 0; j < S; j++) h.A[i][j] = std::log(a[i][j]);
    for (int v = 0; v < V; v++) h.Bm[i][v] = std::log(b[i][v]);
  }

  std::mt19937_64 rng(53);
  std::vector<uint8_t> obs((size_t)B * T);
  for (size_t i = 0; i < obs.size(); i++) obs[i] = rng() % V;

  volatile double sink = 0;
  double best = 1e100;
  for (int it = 0; it < iters; it++) {
    auto t0 = std::chrono::steady_clock::now();
    if (nthreads <= 1) {
      std::vector<double> vals;
      std::vector<int> from, path;
      double s = 0;
      for (int q = 0; q < B; q++)
        s += viterbi(h, &obs[(size_t)q * T], T, vals, from, path);
      sink += s;
    } else {
      std::vector<std::thread> th;
      std::vector<double> sums(nthreads, 0);
      for (int t = 0; t < nthreads; t++) {
        th.emplace_back([&, t]() {
          std::vector<double> vals;
          std::vector<int> from, path;
          double s = 0;
          for (int q = t; q < B; q += nthreads)
            s += viterbi(h, &obs[(size_t)q * T], T, vals, from, path);
          sums[t] = s;
        });
      }
      for (auto& x : th) x.join();
      for (int t = 0; t < nthreads; t++) sink += sums[t];
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    if (dt < best) best = dt;
  }
  std::fprintf(stderr, "sink=%f\n", (double)sink);
  std::printf("%.2f\n", B / best);
  return 0;
}
