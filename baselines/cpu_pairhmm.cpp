// CPU baseline: banded PairHMM forward algorithm, algorithmically
// equivalent to the reference's bench loop (reference:
// benches/pairhmm.rs:88-103 — semiglobal prob_related with
// max_edit_dist=Some(4); src/stats/pairhmm/pairhmm.rs:104-280 — the
// three-state forward DP with the ln_sum3_exp_approx 10-nat shortcut and
// the min-edit-distance cell-skip banding).
//
// Used by bench.py to anchor `pairhmm_exact_vs_baseline`: the exact
// device path's f64 is software-emulated double-float on TPU, so the
// honest comparison is against this -O3 single-core twin on the same
// workload (207 bp text x 54 bp pattern, Illumina error rates).
//
// Usage: cpu_pairhmm <B> <M> <N> <iters> [band]  — prints pairs/sec.
//        cpu_pairhmm check [band] < pairs.txt    — per-pair log-prob
//          (stdin: count, then x/y line pairs; for parity tests;
//          band < 0 disables banding)
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <random>
#include <string>
#include <vector>

namespace {

const double NEG_INF = -std::numeric_limits<double>::infinity();
const size_t ED_MAX = std::numeric_limits<size_t>::max();

// The reference's LogProb arithmetic runs on its own fast exp
// approximation (utils/fastexp.rs, Kopczynski 2017): polynomial fraction
// + exponent-bit construction, `x as i64` truncating toward zero.
// Bit-identical to the repo's utils/fastexp.py numpy twin.
inline double fastexp(double v) {
  const double MIN_VAL = -500.0;
  double vc = v > MIN_VAL ? v : MIN_VAL;
  double x = 1.442695041 * vc;
  int64_t bits = (int64_t)x;  // trunc toward zero
  x -= (double)bits;
  double f2 = x * 0.006935931;
  double x_tmp = x + 4.831794110;
  f2 += 0.019890581;
  x_tmp *= x;
  f2 *= x;
  f2 += 0.143440676;
  f2 *= x_tmp;
  f2 += 1.0;
  bits = (bits + 1023) << 52;
  double pow2;
  std::memcpy(&pow2, &bits, 8);
  double out = pow2 * f2;
  return v > MIN_VAL ? out : 0.0;
}

// LogProb::ln_add_exp: max + log1p(fastexp(min - max))
inline double ln_add_exp(double a, double b) {
  if (b == NEG_INF) return a;
  double p0 = a, p1 = b;
  if (p1 > p0) std::swap(p0, p1);
  if (p0 == NEG_INF) return NEG_INF;
  return p0 + std::log1p(fastexp(p1 - p0));
}

// LogProb::ln_sum_exp: the (first) max element is excluded from the
// fastexp sum (log1p form), -inf entries skipped.
inline double ln_sum_exp3(double p0, double p1, double p2) {
  double ps[3] = {p0, p1, p2};
  int imax = 0;
  for (int i = 1; i < 3; ++i)
    if (ps[i] > ps[imax]) imax = i;
  if (ps[imax] == NEG_INF) return NEG_INF;
  double s = 0.0;
  for (int i = 0; i < 3; ++i) {
    if (i == imax || ps[i] == NEG_INF) continue;
    s += fastexp(ps[i] - ps[imax]);
  }
  return ps[imax] + std::log1p(s);
}

// LogProb::ln_one_minus_exp (probs/mod.rs:36-43 log1mexp)
inline double ln_1m_exp(double p) {
  if (p < -0.693) return std::log1p(-fastexp(p));
  return std::log(-std::expm1(p));
}

// pairhmm.rs:26-40: if the largest is >10 nats above the second largest,
// return it; else the accurate three-way sum.
inline double ln_sum3_exp_approx(double p0, double p1, double p2) {
  if (p1 < p2) std::swap(p1, p2);
  if (p1 > p0) std::swap(p1, p0);
  if (p0 - p1 > 10.0) return p0;
  return ln_sum_exp3(p0, p1, p2);
}

struct GapParams {  // the bench's SemiglobalGapParams, precomputed
  double prob_no_gap, prob_no_gap_x_extend, prob_no_gap_y_extend;
  double prob_gap_x, prob_gap_y, prob_gap_x_extend, prob_gap_y_extend;
  bool do_gap_x_extend, do_gap_y_extend;
};

struct Workspace {
  std::vector<double> fm[2], fx[2], fy[2], prob_cols;
  std::vector<size_t> med[2];
};

// prob_related, semiglobal (free start/end gap in x), banded.
// x: text (len m, outer loop), y: pattern (len n, inner loop).
double prob_related(const uint8_t* x, int m, const uint8_t* y, int n,
                    const GapParams& g, double p_match, double p_subst,
                    double p_emit_xy, long band, Workspace& ws) {
  const bool banded = band >= 0;
  const size_t max_ed = banded ? (size_t)band : 0;
  for (int k = 0; k < 2; ++k) {
    ws.fm[k].assign(n + 1, NEG_INF);
    ws.fx[k].assign(n + 1, NEG_INF);
    ws.fy[k].assign(n + 1, NEG_INF);
    ws.med[k].assign(n + 1, ED_MAX);
  }
  ws.prob_cols.clear();
  int prev = 0, curr = 1;
  ws.fm[prev][0] = 0.0;  // ln_one

  for (int i = 0; i < m; ++i) {
    // free_start_gap_x: prob_start_gap_x = ln_one
    ws.fm[prev][0] = ln_add_exp(ws.fm[prev][0], 0.0);
    ws.med[prev][0] = 0;

    const double prob_emit_x = p_emit_xy;
    for (int j = 0; j < n; ++j) {
      const int j_ = j + 1;
      const size_t ed_tl = ws.med[prev][j_ - 1];
      const size_t ed_top = ws.med[curr][j_ - 1];
      const size_t ed_left = ws.med[prev][j_];
      if (banded &&
          std::min(ed_tl, std::min(ed_top, ed_left)) > max_ed) {
        continue;  // skip cell: stale values remain (reference behavior)
      }
      const bool is_match = x[i] == y[j];
      const double emit_xy = is_match ? p_match : p_subst;
      double prob_mm =
          emit_xy + ln_sum3_exp_approx(
                        g.prob_no_gap + ws.fm[prev][j_ - 1],
                        g.prob_no_gap_x_extend + ws.fx[prev][j_ - 1],
                        g.prob_no_gap_y_extend + ws.fy[prev][j_ - 1]);
      double prob_gap_y = prob_emit_x + (g.prob_gap_y + ws.fm[prev][j_]);
      if (g.do_gap_y_extend)
        prob_gap_y =
            ln_add_exp(prob_gap_y, g.prob_gap_y_extend + ws.fx[prev][j_]);
      double prob_gap_x =
          p_emit_xy + (g.prob_gap_x + ws.fm[curr][j_ - 1]);
      if (g.do_gap_x_extend)
        prob_gap_x = ln_add_exp(prob_gap_x,
                                g.prob_gap_x_extend + ws.fy[curr][j_ - 1]);
      size_t ed = 0;
      if (banded) {
        auto sat = [](size_t v) { return v == ED_MAX ? ED_MAX : v + 1; };
        ed = std::min(is_match ? ed_tl : sat(ed_tl),
                      std::min(sat(ed_left), sat(ed_top)));
      }
      ws.fm[curr][j_] = prob_mm;
      ws.fx[curr][j_] = prob_gap_y;
      ws.fy[curr][j_] = prob_gap_x;
      if (banded) ws.med[curr][j_] = ed;
    }

    // free_end_gap_x: cache column-final probabilities
    ws.prob_cols.push_back(ws.fm[curr][n]);
    ws.prob_cols.push_back(ws.fx[curr][n]);
    ws.prob_cols.push_back(ws.fy[curr][n]);

    std::swap(curr, prev);
    for (double& v : ws.fm[curr]) v = NEG_INF;
  }

  // LogProb::ln_sum_exp over all cached column probabilities (first max
  // excluded, log1p + fastexp form)
  size_t imax = 0;
  for (size_t i = 1; i < ws.prob_cols.size(); ++i)
    if (ws.prob_cols[i] > ws.prob_cols[imax]) imax = i;
  double p;
  if (ws.prob_cols.empty() || ws.prob_cols[imax] == NEG_INF) {
    p = NEG_INF;
  } else {
    double s = 0;
    for (size_t i = 0; i < ws.prob_cols.size(); ++i) {
      if (i == imax || ws.prob_cols[i] == NEG_INF) continue;
      s += fastexp(ws.prob_cols[i] - ws.prob_cols[imax]);
    }
    p = ws.prob_cols[imax] + std::log1p(s);
  }
  return std::min(p, 0.0);
}

}  // namespace

int main(int argc, char** argv) {
  const double PROB_INS = 2.8e-6, PROB_DEL = 5.1e-6, PROB_SUBST = 0.0021;
  GapParams g;
  g.prob_gap_x = std::log(PROB_INS);
  g.prob_gap_y = std::log(PROB_DEL);
  g.prob_gap_x_extend = NEG_INF;
  g.prob_gap_y_extend = NEG_INF;
  g.do_gap_x_extend = false;
  g.do_gap_y_extend = false;
  // prob_no_gap = ln(1 - (P_ins + P_del)) via ln_one_minus_exp(ln_add_exp)
  g.prob_no_gap = ln_1m_exp(ln_add_exp(g.prob_gap_x, g.prob_gap_y));
  g.prob_no_gap_x_extend = 0.0;  // ln(1 - exp(-inf))
  g.prob_no_gap_y_extend = 0.0;
  const double p_match = std::log1p(-PROB_SUBST);
  const double p_subst = std::log(PROB_SUBST / 3.0);
  const double p_emit = std::log1p(-PROB_SUBST);

  if (argc >= 2 && std::string(argv[1]) == "check") {
    long band = argc > 2 ? std::atol(argv[2]) : 4;
    int count;
    if (std::scanf("%d", &count) != 1) return 2;
    Workspace ws;
    char buf[1 << 16];
    for (int t = 0; t < count; ++t) {
      if (std::scanf("%65535s", buf) != 1) return 2;
      std::string xs = buf;
      if (std::scanf("%65535s", buf) != 1) return 2;
      std::string ys = buf;
      double p = prob_related((const uint8_t*)xs.data(), (int)xs.size(),
                              (const uint8_t*)ys.data(), (int)ys.size(),
                              g, p_match, p_subst, p_emit, band, ws);
      std::printf("%.17g\n", p);
    }
    return 0;
  }

  int B = argc > 1 ? std::atoi(argv[1]) : 1024;
  int M = argc > 2 ? std::atoi(argv[2]) : 207;
  int N = argc > 3 ? std::atoi(argv[3]) : 54;
  int iters = argc > 4 ? std::atoi(argv[4]) : 3;
  long band = argc > 5 ? std::atol(argv[5]) : 4;

  // workload mirrors bench._pairhmm_exact_pairs_per_s: random text,
  // pattern = window of text with 2 substitutions
  std::mt19937_64 rng(13);
  static const char* ACGT = "ACGT";
  std::vector<std::vector<uint8_t>> xs(B), ys(B);
  for (int b = 0; b < B; ++b) {
    xs[b].resize(M);
    for (int t = 0; t < M; ++t) xs[b][t] = ACGT[rng() & 3];
    int s = (int)(rng() % (M - N));
    ys[b].assign(xs[b].begin() + s, xs[b].begin() + s + N);
    for (int e = 0; e < 2; ++e) ys[b][rng() % N] = ACGT[rng() & 3];
  }

  Workspace ws;
  double best = 1e100, sink = 0;
  for (int it = 0; it < iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    for (int b = 0; b < B; ++b)
      sink += prob_related(xs[b].data(), M, ys[b].data(), N, g, p_match,
                           p_subst, p_emit, band, ws);
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    best = std::min(best, dt);
  }
  std::fprintf(stderr, "sink=%.6g\n", sink);
  std::printf("%.3f\n", B / best);
  return 0;
}
