// Banded custom-clip Smith-Waterman DP + traceback walk, shared between
// the runtime's native host fallback (biotpu.cpp banded_batch — shapes the
// TPU kernels cannot hold) and the CPU baseline twin
// (baselines/cpu_banded.cpp).  Statement twin of the reference's
// banded.rs compute_alignment (lines 405-870); score-parity-tested
// against the banded.py oracle.
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace banded_dp {


static const int32_t NS = -858993459;  // rust-bio MIN_SCORE

// traceback layer codes (banded.rs / pairwise::TracebackCell)
enum {
  TB_START = 0, TB_INS = 1, TB_DEL = 2, TB_SUBST = 3, TB_MATCH = 4,
  TB_XCLIP_PREFIX = 5, TB_XCLIP_SUFFIX = 6, TB_YCLIP_PREFIX = 7,
  TB_YCLIP_SUFFIX = 8,
};

struct Cell {  // bits 0-3 I, 4-7 D, 8-11 S
  static inline uint16_t ibits(uint16_t c) { return c & 0xF; }
  static inline uint16_t dbits(uint16_t c) { return (c >> 4) & 0xF; }
  static inline uint16_t sbits(uint16_t c) { return (c >> 8) & 0xF; }
  static inline void set_i(uint16_t& c, uint16_t v) { c = (c & ~0xF) | v; }
  static inline void set_d(uint16_t& c, uint16_t v) {
    c = (c & ~(0xF << 4)) | (v << 4);
  }
  static inline void set_s(uint16_t& c, uint16_t v) {
    c = (c & ~(0xF << 8)) | (v << 8);
  }
};

struct Scoring {
  int32_t go, ge, ma, mi, xcp, xcs, ycp, ycs;
};

struct Workspace {
  std::vector<int32_t> S[2], I[2], D[2], Sn;
  std::vector<size_t> Lx, Ly;
  std::vector<uint16_t> tb;           // (m+1) x (n+1), row-major
  std::vector<int32_t> starts, ends;  // band ranges per column
  std::vector<int64_t> mbuf;          // kmer matches (interleaved)
  std::vector<int64_t> dp_score, dp_prev, path_xy;
  std::vector<int> ops;               // op codes of the walk (reversed)
  std::vector<int> ops_len;           // per-op length (clip len; else 1)
  int xstart, ystart, xend, yend;     // alignment coordinates
};

// Banded custom-clip DP + traceback — statement twin of
// banded.rs compute_alignment (lines 405-870).  Returns score; op count
// via ws.ops.
static int32_t banded_align(const uint8_t* x, int m, const uint8_t* y,
                            int n, const Scoring& sc, Workspace& ws) {
  auto& starts = ws.starts;
  auto& ends = ws.ends;
  for (int k = 0; k < 2; ++k) {
    ws.S[k].assign(m + 1, NS);
    ws.I[k].assign(m + 1, NS);
    ws.D[k].assign(m + 1, NS);
  }
  ws.Lx.assign(n + 1, 0);
  ws.Ly.assign(m + 1, 0);
  ws.Sn.assign(m + 1, NS);
  ws.tb.assign((size_t)(m + 1) * (n + 1), 0);
  ws.ops.clear();
  ws.ops_len.clear();
  auto tbat = [&](int i, int j) -> uint16_t& {
    return ws.tb[(size_t)i * (n + 1) + j];
  };

  {  // j = 0 column
    const int curr = 0;
    const int i_start = starts[0], i_end = ends[0];
    if (i_start == 0) ws.S[curr][0] = 0;
    for (int i = std::max(1, i_start); i < i_end; ++i) {
      uint16_t tb = 0;
      if (i == 1) {
        ws.I[curr][i] = sc.go;
      } else {
        int32_t i_score = sc.go + sc.ge * (i - 1);
        int32_t c_score = sc.xcp + sc.go;
        if (i_score > c_score) {
          ws.I[curr][i] = i_score;
          Cell::set_i(tb, TB_INS);
        } else {
          ws.I[curr][i] = c_score;
          Cell::set_i(tb, TB_XCLIP_PREFIX);
        }
      }
      if (i == m) Cell::set_s(tb, TB_XCLIP_SUFFIX);
      if (ws.I[curr][i] > ws.S[curr][i]) {
        ws.S[curr][i] = ws.I[curr][i];
        Cell::set_s(tb, TB_INS);
      }
      if (sc.xcp > ws.S[curr][i]) {
        ws.S[curr][i] = sc.xcp;
        Cell::set_s(tb, TB_XCLIP_PREFIX);
      }
      if (ws.S[curr][i] + sc.xcs > ws.S[curr][m]) {
        ws.S[curr][m] = ws.S[curr][i] + sc.xcs;
        ws.Lx[0] = m - i;
        Cell::set_s(tbat(m, 0), TB_XCLIP_SUFFIX);
      }
      tbat(i, 0) = tb;
    }
    for (int i = i_end; i < std::min(m + 1, (int)ends[std::min(n, 1)]);
         ++i) {
      ws.S[curr][i] = NS;
      ws.I[curr][i] = NS;
    }
    if (i_end < m + 1) ws.S[curr][m] = NS;
    if (sc.ycp > sc.ycs) {
      ws.Sn[0] = sc.ycp;
      Cell::set_s(tbat(0, n), TB_YCLIP_PREFIX);
    } else {
      ws.Sn[0] = sc.ycs;
      ws.Ly[0] = n;
      Cell::set_s(tbat(0, n), TB_YCLIP_SUFFIX);
    }
  }

  for (int j = 1; j <= n; ++j) {
    const int curr = j % 2, prev = 1 - curr;
    const int i_start = starts[j], i_end = ends[j];

    if (i_start == 0) {  // i = 0 row
      uint16_t tb = 0;
      ws.I[curr][0] = NS;
      if (j == 1) {
        ws.D[curr][0] = sc.go;
      } else {
        int32_t d_score = sc.go + sc.ge * (j - 1);
        int32_t c_score = sc.ycp + sc.go;
        if (d_score > c_score) {
          ws.D[curr][0] = d_score;
          Cell::set_d(tb, TB_DEL);
        } else {
          ws.D[curr][0] = c_score;
          Cell::set_d(tb, TB_YCLIP_PREFIX);
        }
      }
      if (ws.D[curr][0] > sc.ycp) {
        ws.S[curr][0] = ws.D[curr][0];
        Cell::set_s(tb, TB_DEL);
      } else {
        ws.S[curr][0] = sc.ycp;
        Cell::set_s(tb, TB_YCLIP_PREFIX);
      }
      if (ws.S[curr][0] + sc.ycs > ws.Sn[0]) {
        ws.Sn[0] = ws.S[curr][0] + sc.ycs;
        ws.Ly[0] = n - j;
        Cell::set_s(tbat(0, n), TB_YCLIP_SUFFIX);
      }
      tbat(0, j) = tb;
    }
    for (int i = std::max(0, i_start - 1); i < i_start; ++i) {
      ws.S[curr][i] = NS;
      ws.I[curr][i] = NS;
      ws.D[curr][i] = NS;
    }
    ws.S[curr][m] = NS;

    const uint8_t q = y[j - 1];
    const int32_t xclip_score =
        sc.xcp + std::max(j == n ? std::max(sc.ycp, ws.Sn[0]) : sc.ycp,
                          sc.go + sc.ge * (j - 1));
    for (int i = std::max(1, i_start); i < i_end; ++i) {
      const uint8_t p = x[i - 1];
      uint16_t tb = 0;
      const int32_t m_score = ws.S[prev][i - 1] + (p == q ? sc.ma : sc.mi);

      int32_t i_score = ws.I[curr][i - 1] + sc.ge;
      int32_t s_score = ws.S[curr][i - 1] + sc.go;
      int32_t best_i_score;
      if (i_score > s_score) {
        best_i_score = i_score;
        Cell::set_i(tb, TB_INS);
      } else {
        best_i_score = s_score;
        Cell::set_i(tb, Cell::sbits(tbat(i - 1, j)));
      }
      if (j == n) {
        int32_t clip_score = ws.Sn[i - 1] + sc.go;
        if (clip_score > best_i_score) {
          best_i_score = clip_score;
          Cell::set_i(tb, TB_YCLIP_SUFFIX);
        }
      }

      int32_t d_score = ws.D[prev][i] + sc.ge;
      s_score = ws.S[prev][i] + sc.go;
      int32_t best_d_score;
      if (d_score > s_score) {
        best_d_score = d_score;
        Cell::set_d(tb, TB_DEL);
      } else {
        best_d_score = s_score;
        Cell::set_d(tb, Cell::sbits(tbat(i, j - 1)));
      }

      if (i == m) {
        Cell::set_s(tb, TB_XCLIP_SUFFIX);
      } else {
        ws.S[curr][i] = NS;
      }
      int32_t best_s_score = ws.S[curr][i];
      if (m_score > best_s_score) {
        best_s_score = m_score;
        Cell::set_s(tb, p == q ? TB_MATCH : TB_SUBST);
      }
      if (best_i_score > best_s_score) {
        best_s_score = best_i_score;
        Cell::set_s(tb, TB_INS);
      }
      if (best_d_score > best_s_score) {
        best_s_score = best_d_score;
        Cell::set_s(tb, TB_DEL);
      }
      if (xclip_score > best_s_score) {
        best_s_score = xclip_score;
        Cell::set_s(tb, TB_XCLIP_PREFIX);
      }
      int32_t yclip_score = sc.ycp + sc.go + sc.ge * (i - 1);
      if (yclip_score > best_s_score) {
        best_s_score = yclip_score;
        Cell::set_s(tb, TB_YCLIP_PREFIX);
      }
      ws.S[curr][i] = best_s_score;
      ws.I[curr][i] = best_i_score;
      ws.D[curr][i] = best_d_score;

      if (ws.S[curr][i] + sc.xcs > ws.S[curr][m]) {
        ws.S[curr][m] = ws.S[curr][i] + sc.xcs;
        ws.Lx[j] = m - i;
        Cell::set_s(tbat(m, j), TB_XCLIP_SUFFIX);
      }
      if (ws.S[curr][i] + sc.ycs > ws.Sn[i]) {
        ws.Sn[i] = ws.S[curr][i] + sc.ycs;
        ws.Ly[i] = n - j;
        Cell::set_s(tbat(i, n), TB_YCLIP_SUFFIX);
      }
      tbat(i, j) = tb;
    }

    if (ws.S[curr][m] + sc.ycs > ws.Sn[m]) {
      ws.Sn[m] = ws.S[curr][m] + sc.ycs;
      ws.Ly[m] = n - j;
      Cell::set_s(tbat(m, n), TB_YCLIP_SUFFIX);
    }
    if (i_end < m + 1) {
      Cell::set_s(tbat(m, j), TB_XCLIP_SUFFIX);
      ws.S[curr][m] = NS;
    }
    for (int i = i_end;
         i < std::min(m + 1, (int)ends[std::min(n, j + 1)]); ++i) {
      ws.S[curr][i] = NS;
      ws.I[curr][i] = NS;
      ws.D[curr][i] = NS;
    }
  }

  // suffix clipping in the j = n column
  for (int i = 0; i <= m; ++i) {
    const int j = n, curr = j % 2;
    if (i != m && (i < starts[j] || i > ends[j])) ws.S[curr][i] = NS;
    if (ws.Sn[i] > ws.S[curr][i]) {
      ws.S[curr][i] = ws.Sn[i];
      Cell::set_s(tbat(i, j), TB_YCLIP_SUFFIX);
    }
    if (ws.S[curr][i] + sc.xcs > ws.S[curr][m]) {
      ws.S[curr][m] = ws.S[curr][i] + sc.xcs;
      ws.Lx[j] = m - i;
      Cell::set_s(tbat(m, j), TB_XCLIP_SUFFIX);
    }
  }
  // last column of I may have changed; recompute
  for (int i = std::max(1, (int)starts[n]); i < ends[n]; ++i) {
    const int j = n, curr = j % 2;
    int32_t s_score = ws.S[curr][i - 1] + sc.go;
    if (s_score > ws.I[curr][i]) {
      ws.I[curr][i] = s_score;
      Cell::set_i(tbat(i, j), Cell::sbits(tbat(i - 1, j)));
    }
    if (s_score > ws.S[curr][i]) {
      ws.S[curr][i] = s_score;
      Cell::set_s(tbat(i, j), TB_INS);
      if (ws.S[curr][i] + sc.xcs > ws.S[curr][m]) {
        ws.S[curr][m] = ws.S[curr][i] + sc.xcs;
        ws.Lx[j] = m - i;
        Cell::set_s(tbat(m, j), TB_XCLIP_SUFFIX);
      }
    }
  }
  for (int j = 1; j <= n; ++j) {
    int32_t d_score = sc.go + sc.ge * (j - 1);
    Cell::set_s(tbat(0, j), d_score > sc.ycp ? TB_DEL : TB_YCLIP_PREFIX);
    if (j == n) {
      int32_t best = std::max(d_score, sc.ycp);
      if (sc.ycs > best) {
        best = sc.ycs;
        Cell::set_s(tbat(0, j), TB_YCLIP_SUFFIX);
      }
      if (sc.xcs + best > ws.S[n % 2][m]) {
        ws.S[n % 2][m] = sc.xcs + best;
        ws.Lx[n] = m;
        Cell::set_s(tbat(m, n), TB_XCLIP_SUFFIX);
      }
    }
  }
  for (int i = 1; i <= m; ++i) {
    int32_t c_score = sc.go + sc.ge * (i - 1);
    Cell::set_s(tbat(i, 0), c_score > sc.xcp ? TB_INS : TB_XCLIP_PREFIX);
    if (i == m) {
      int32_t best = std::max(c_score, sc.xcp);
      if (sc.xcs > best) {
        best = sc.xcs;
        Cell::set_s(tbat(i, 0), TB_XCLIP_SUFFIX);
      }
      if (sc.ycs + best > ws.S[n % 2][m]) {
        ws.S[n % 2][m] = sc.ycs + best;
        ws.Ly[m] = n;
        Cell::set_s(tbat(m, n), TB_YCLIP_SUFFIX);
      }
    }
  }

  // traceback walk (banded.rs:768-870)
  int i = m, j = n;
  ws.xstart = 0; ws.ystart = 0; ws.xend = m; ws.yend = n;
  auto push = [&ws](int code, int len) {
    ws.ops.push_back(code);
    ws.ops_len.push_back(len);
  };
  uint16_t last_layer = Cell::sbits(tbat(i, j));
  for (;;) {
    uint16_t next_layer;
    if (last_layer == TB_START) break;
    switch (last_layer) {
      case TB_INS:
        push(TB_INS, 1);
        next_layer = Cell::ibits(tbat(i, j));
        --i;
        break;
      case TB_DEL:
        push(TB_DEL, 1);
        next_layer = Cell::dbits(tbat(i, j));
        --j;
        break;
      case TB_MATCH:
      case TB_SUBST:
        push(last_layer, 1);
        next_layer = Cell::sbits(tbat(i - 1, j - 1));
        --i;
        --j;
        break;
      case TB_XCLIP_PREFIX:
        push(TB_XCLIP_PREFIX, i);
        ws.xstart = i;
        i = 0;
        next_layer = Cell::sbits(tbat(0, j));
        break;
      case TB_XCLIP_SUFFIX:
        push(TB_XCLIP_SUFFIX, (int)ws.Lx[j]);
        i -= (int)ws.Lx[j];
        ws.xend = i;
        next_layer = Cell::sbits(tbat(i, j));
        break;
      case TB_YCLIP_PREFIX:
        push(TB_YCLIP_PREFIX, j);
        ws.ystart = j;
        j = 0;
        next_layer = Cell::sbits(tbat(i, 0));
        break;
      case TB_YCLIP_SUFFIX:
        push(TB_YCLIP_SUFFIX, (int)ws.Ly[i]);
        j -= (int)ws.Ly[i];
        ws.yend = j;
        next_layer = Cell::sbits(tbat(i, j));
        break;
      default:
        std::fprintf(stderr, "bad tb layer %d\n", last_layer);
        std::exit(2);
    }
    last_layer = next_layer;
  }
  if (i != 0) {
    int32_t i_score = sc.go + sc.ge * (i - 1);
    if (i_score > sc.xcp) {
      for (int t = 0; t < i; ++t) push(TB_INS, 1);
      ws.xstart = 0;
    } else {
      push(TB_XCLIP_PREFIX, i);
      ws.xstart = i;
    }
  }
  if (j != 0) {
    int32_t d_score = sc.go + sc.ge * (j - 1);
    if (d_score > sc.ycp) {
      for (int t = 0; t < j; ++t) push(TB_DEL, 1);
      ws.ystart = 0;
    } else {
      push(TB_YCLIP_PREFIX, j);
      ws.ystart = j;
    }
  }
  return ws.S[n % 2][m];
}

// Full per-pair banded pipeline: kmer matches -> sdpkpp -> band raster
// -> banded DP + walk (what Aligner::semiglobal does per call,
// banded.rs:237-243 -> Band::create -> compute_alignment).
static int32_t run_pair(const uint8_t* x, int m, const uint8_t* y, int n,
                        const Scoring& sc, int k, int w, Workspace& ws) {
  if ((int64_t)ws.mbuf.size() < 2048) ws.mbuf.resize(2048);
  int64_t nm = kmer_matches_i64(x, m, y, n, k, ws.mbuf.data(),
                                (int64_t)ws.mbuf.size() / 2);
  if (nm * 2 > (int64_t)ws.mbuf.size()) {
    ws.mbuf.resize(2 * nm);
    nm = kmer_matches_i64(x, m, y, n, k, ws.mbuf.data(), nm);
  }
  ws.starts.assign(n + 1, 0);
  ws.ends.assign(n + 1, 0);
  if (nm == 0) {
    // no matches: full-matrix fallback (banded.rs:1309-1313)
    for (int j = 0; j <= n; ++j) {
      ws.starts[j] = 0;
      ws.ends[j] = m + 1;
    }
  } else {
    std::vector<int64_t> xs(nm), ys(nm);
    for (int64_t t = 0; t < nm; ++t) {
      xs[t] = ws.mbuf[2 * t];
      ys[t] = ws.mbuf[2 * t + 1];
    }
    ws.dp_score.assign(nm, 0);
    ws.dp_prev.assign(nm, 0);
    int64_t best[2];
    sdpkpp_i64(xs.data(), ys.data(), nm, k, sc.ma, -sc.go, -sc.ge,
               ws.dp_score.data(), ws.dp_prev.data(), best);
    // walk dp_prev to recover the path (sparse.rs:283-291)
    ws.path_xy.clear();
    for (int64_t p = best[1]; p >= 0; p = ws.dp_prev[p]) {
      ws.path_xy.push_back(xs[p]);
      ws.path_xy.push_back(ys[p]);
    }
    // reverse pairs into path order
    const int64_t np_ = (int64_t)ws.path_xy.size() / 2;
    for (int64_t t = 0; t < np_ / 2; ++t) {
      std::swap(ws.path_xy[2 * t], ws.path_xy[2 * (np_ - 1 - t)]);
      std::swap(ws.path_xy[2 * t + 1], ws.path_xy[2 * (np_ - 1 - t) + 1]);
    }
    band_raster_i64(ws.path_xy.data(), np_, m, n, k, w, sc.xcp, sc.xcs,
                    sc.ycp, sc.ycs, ws.starts.data(), ws.ends.data());
  }
  return banded_align(x, m, y, n, sc, ws);
}

}  // namespace banded_dp
