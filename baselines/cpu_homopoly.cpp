// CPU baseline: 14-state homopolymer PairHMM forward, algorithmically
// equivalent to the reference's HomopolyPairHMM::prob_related (reference:
// src/stats/pairhmm/homopolypairhmm.rs — 4 match states + GapX/GapY + 8
// hop states (:90-106), transition table from gap + hop parameters
// (:495-596), quarter initial mass over match states, halved mismatch
// emissions, free-end-gap per-cell column accumulation (:246-420)),
// with the reference's fastexp LogProb arithmetic.
//
// Used by bench.py to anchor `homopoly_vs_baseline`; probability-parity-
// tested against the host oracle (tests/test_homopolypairhmm.py).
//
// Usage: cpu_homopoly <B> <M> <N> <iters>       — prints pairs/sec.
//        cpu_homopoly check < pairs.txt          — per-pair log-prob
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

// fastexp / LogProb arithmetic — identical to baselines/cpu_pairhmm.cpp
// (utils/fastexp.rs Kopczynski polynomial; ln_sum_exp excludes the first
// max element, log1p form)
inline double fastexp(double v) {
  const double MIN_VAL = -500.0;
  double vc = v > MIN_VAL ? v : MIN_VAL;
  double x = 1.442695041 * vc;
  int64_t bits = (int64_t)x;
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

inline double ln_add_exp(double a, double b) {
  if (b == NEG_INF) return a;
  double p0 = a, p1 = b;
  if (p1 > p0) std::swap(p0, p1);
  if (p0 == NEG_INF) return NEG_INF;
  return p0 + std::log1p(fastexp(p1 - p0));
}

inline double ln_sum_exp(const double* ps, int n) {
  int imax = 0;
  for (int i = 1; i < n; ++i)
    if (ps[i] > ps[imax]) imax = i;
  if (n == 0 || ps[imax] == NEG_INF) return NEG_INF;
  double s = 0.0;
  for (int i = 0; i < n; ++i) {
    if (i == imax || ps[i] == NEG_INF) continue;
    s += fastexp(ps[i] - ps[imax]);
  }
  return ps[imax] + std::log1p(s);
}

inline double ln_1m_exp(double p) {
  if (p < -0.693) return std::log1p(-fastexp(p));
  return std::log(-std::expm1(p));
}

// states (homopolypairhmm.rs:90-106)
enum {
  MATCH_A = 0, MATCH_C, MATCH_G, MATCH_T, S_GAP_X, S_GAP_Y,
  HOP_AX, HOP_AY, HOP_CX, HOP_CY, HOP_GX, HOP_GY, HOP_TX, HOP_TY,
  NSTATES = 14,
};
const int MATCH_STATES[4] = {MATCH_A, MATCH_C, MATCH_G, MATCH_T};
const int HOP_X_STATES[4] = {HOP_AX, HOP_CX, HOP_GX, HOP_TX};
const int HOP_Y_STATES[4] = {HOP_AY, HOP_CY, HOP_GY, HOP_TY};
const uint8_t SUPPORT[4] = {'A', 'C', 'G', 'T'};

struct Params {
  double t[NSTATES][NSTATES];  // transition table (NEG_INF default)
  double p_match, p_subst, p_emit;  // emission log-probs
};

// _build_transition_table twin (uniform hop parameters)
Params build_params(double pgx, double pgy, double pgxe, double pgye,
                    double phx, double phy, double phxe, double phye,
                    double p_match, double p_subst, double p_emit) {
  Params P;
  for (int a = 0; a < NSTATES; ++a)
    for (int b = 0; b < NSTATES; ++b) P.t[a][b] = NEG_INF;
  for (int k = 0; k < 4; ++k) {
    P.t[MATCH_STATES[k]][HOP_X_STATES[k]] = phx;
    P.t[MATCH_STATES[k]][HOP_Y_STATES[k]] = phy;
    P.t[HOP_X_STATES[k]][HOP_X_STATES[k]] = phxe;
    P.t[HOP_Y_STATES[k]][HOP_Y_STATES[k]] = phye;
    for (int m = 0; m < 4; ++m) {
      P.t[HOP_X_STATES[k]][MATCH_STATES[m]] = ln_1m_exp(phx);
      P.t[HOP_Y_STATES[k]][MATCH_STATES[m]] = ln_1m_exp(phy);
    }
  }
  // prob_hop = ln_sum_exp over the 4 per-base hops, minus ln(4) as a
  // plain -4.0 nat shift?  No: the oracle subtracts 4.0 (homopoly
  // table builder) — mirror exactly.
  double hx4[4] = {phx, phx, phx, phx};
  double hy4[4] = {phy, phy, phy, phy};
  double prob_hop_x = ln_sum_exp(hx4, 4) - 4.0;
  double prob_hop_y = ln_sum_exp(hy4, 4) - 4.0;
  double all4[4] = {pgy, pgx, prob_hop_x, prob_hop_y};
  double match_any = ln_1m_exp(ln_sum_exp(all4, 4));
  for (int a = 0; a < 4; ++a)
    for (int b = 0; b < 4; ++b)
      P.t[MATCH_STATES[a]][MATCH_STATES[b]] = match_any;
  for (int a = 0; a < 4; ++a) {
    P.t[MATCH_STATES[a]][S_GAP_X] = pgy;
    P.t[MATCH_STATES[a]][S_GAP_Y] = pgx;
  }
  for (int b = 0; b < 4; ++b) {
    P.t[S_GAP_X][MATCH_STATES[b]] = ln_1m_exp(pgye);
    P.t[S_GAP_Y][MATCH_STATES[b]] = ln_1m_exp(pgxe);
  }
  P.t[S_GAP_X][S_GAP_X] = pgye;
  P.t[S_GAP_Y][S_GAP_Y] = pgxe;
  P.p_match = p_match;
  P.p_subst = p_subst;
  P.p_emit = p_emit;
  return P;
}

struct Workspace {
  std::vector<double> v[2][NSTATES];
  std::vector<double> prob_cols;
};

// prob_related twin, semiglobal (free start/end gap in x), unbanded
// (the bench row's configuration; the device row is unbanded too)
double prob_related(const uint8_t* x, int m, const uint8_t* y, int n,
                    const Params& P, Workspace& ws) {
  for (int k = 0; k < 2; ++k)
    for (int s = 0; s < NSTATES; ++s) ws.v[k][s].assign(n + 1, NEG_INF);
  ws.prob_cols.clear();
  int prev = 0, curr = 1;
  const double quarter = std::log(0.25);
  for (int k = 0; k < 4; ++k) ws.v[prev][MATCH_STATES[k]][0] = quarter;

  double acc[NSTATES];
  for (int i = 0; i < m; ++i) {
    // free start: prob_start_gap_x = ln_one, minus ln(4)
    const double psg = 0.0 - std::log(4.0);
    for (int k = 0; k < 4; ++k) {
      auto& vm = ws.v[prev][MATCH_STATES[k]][0];
      vm = ln_add_exp(vm, psg);
    }
    const double prob_emit_x_and_gap = P.p_emit;
    const uint8_t ex = x[i];

    for (int j = 0; j < n; ++j) {
      const int j_ = j + 1, jm1 = j;
      const uint8_t ey = y[j];
      for (int k = 0; k < 4; ++k) {
        const int ms = MATCH_STATES[k];
        if (ex == SUPPORT[k] || ey == SUPPORT[k]) {
          const bool is_match = ex == ey;
          const double ep =
              is_match ? P.p_match : P.p_subst - std::log(2.0);
          for (int s = 0; s < NSTATES; ++s)
            acc[s] = P.t[s][ms] + ws.v[prev][s][jm1];
          ws.v[curr][ms][j_] = ep + ln_sum_exp(acc, NSTATES);
        } else {
          ws.v[curr][ms][j_] = NEG_INF;
        }
      }
      // GapY (consumes x)
      {
        double a5[5];
        for (int k = 0; k < 4; ++k)
          a5[k] = P.t[MATCH_STATES[k]][S_GAP_Y] +
                  ws.v[prev][MATCH_STATES[k]][j_];
        a5[4] = P.t[S_GAP_Y][S_GAP_Y] + ws.v[prev][S_GAP_Y][j_];
        ws.v[curr][S_GAP_Y][j_] = prob_emit_x_and_gap + ln_sum_exp(a5, 5);
      }
      for (int k = 0; k < 4; ++k) {
        const int mS = MATCH_STATES[k], h = HOP_Y_STATES[k];
        ws.v[curr][h][j_] =
            ln_add_exp(P.t[mS][h] + ws.v[prev][mS][j_],
                       P.t[h][h] + ws.v[prev][h][j_]);
      }
      // GapX (consumes y)
      {
        double a5[5];
        for (int k = 0; k < 4; ++k)
          a5[k] = P.t[MATCH_STATES[k]][S_GAP_X] +
                  ws.v[curr][MATCH_STATES[k]][jm1];
        a5[4] = P.t[S_GAP_X][S_GAP_X] + ws.v[curr][S_GAP_X][jm1];
        ws.v[curr][S_GAP_X][j_] = P.p_emit + ln_sum_exp(a5, 5);
      }
      for (int k = 0; k < 4; ++k) {
        const int mS = MATCH_STATES[k], h = HOP_X_STATES[k];
        ws.v[curr][h][j_] =
            ln_add_exp(P.t[mS][h] + ws.v[curr][mS][jm1],
                       P.t[h][h] + ws.v[curr][h][jm1]);
      }
      // free-end per-CELL column accumulation (reference quirk,
      // homopolypairhmm.rs:383-396)
      for (int k = 0; k < 4; ++k)
        ws.prob_cols.push_back(ws.v[curr][MATCH_STATES[k]][n]);
      for (int k = 0; k < 4; ++k)
        ws.prob_cols.push_back(ws.v[curr][HOP_Y_STATES[k]][n]);
      for (int k = 0; k < 4; ++k)
        ws.prob_cols.push_back(ws.v[curr][HOP_X_STATES[k]][n]);
      ws.prob_cols.push_back(ws.v[curr][S_GAP_Y][n]);
      ws.prob_cols.push_back(ws.v[curr][S_GAP_X][n]);
    }
    std::swap(prev, curr);
    for (int k = 0; k < 4; ++k)
      std::fill(ws.v[curr][MATCH_STATES[k]].begin(),
                ws.v[curr][MATCH_STATES[k]].end(), NEG_INF);
  }
  double p = ln_sum_exp(ws.prob_cols.data(), (int)ws.prob_cols.size());
  return std::min(p, 0.0);
}

}  // namespace

int main(int argc, char** argv) {
  // the bench row's parameters (bench.py _homopoly_pairs_per_s)
  const double PROB_INS = 2.8e-6, PROB_DEL = 5.1e-6, PROB_SUBST = 0.0021;
  const double p_match = std::log1p(-PROB_SUBST);
  Params P = build_params(
      std::log(PROB_INS), std::log(PROB_DEL), NEG_INF, NEG_INF,
      std::log(1e-4), std::log(1e-4), std::log(0.5), std::log(0.5),
      p_match, std::log(PROB_SUBST / 3.0), p_match);

  if (argc >= 2 && std::string(argv[1]) == "check") {
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
                              P, ws);
      std::printf("%.17g\n", p);
    }
    return 0;
  }

  int B = argc > 1 ? std::atoi(argv[1]) : 512;
  int M = argc > 2 ? std::atoi(argv[2]) : 207;
  int N = argc > 3 ? std::atoi(argv[3]) : 54;
  int iters = argc > 4 ? std::atoi(argv[4]) : 2;

  std::mt19937_64 rng(15);
  static const char* ACGT = "ACGT";
  std::vector<std::vector<uint8_t>> xs(B), ys(B);
  for (int b = 0; b < B; ++b) {
    xs[b].resize(M);
    for (int t = 0; t < M; ++t) xs[b][t] = ACGT[rng() & 3];
    int s = (int)(rng() % (M - N));
    ys[b].assign(xs[b].begin() + s, xs[b].begin() + s + N);
  }

  Workspace ws;
  double best = 1e100, sink = 0;
  for (int it = 0; it < iters; ++it) {
    auto t0 = std::chrono::steady_clock::now();
    for (int b = 0; b < B; ++b)
      sink += prob_related(xs[b].data(), M, ys[b].data(), N, P, ws);
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    best = std::min(best, dt);
  }
  std::fprintf(stderr, "sink=%.6g\n", sink);
  std::printf("%.3f\n", B / best);
  return 0;
}
