// Statement twin of the reference's POA global aligner DP
// (/root/reference/src/alignment/poa.rs, Poa::custom :498-567 at
// rust-bio v4.0.1), compiled -O3: the CPU anchor for the batched device
// POA scorer (rust_bio_tpu/alignment/poa_batch.py).
//
// The twin runs the reference's topological-order score DP for every
// query and reports queries/second.  It deliberately stops at the score
// (traceback.get(last, n)) and does NOT run the reference's
// recalculate_alignment walk — the device path under comparison is
// score-only, and leaving the walk out makes the twin strictly FASTER
// than the reference's full global().alignment(), i.e. the reported
// vs_baseline ratio is conservative.
//
// Reference semantics replicated statement-for-statement:
//   - Traceback::initialize_scores: row 0 col j = j * gap_open (global
//     clips are MIN_SCORE and never win), poa.rs:204-249
//   - Traceback::new_row: row i col 0 = i * gap_open with i = node
//     index + 1 (NOT topological depth), poa.rs:251-263
//   - root nodes (no predecessors) take only the diagonal from row 0,
//     poa.rs:531-532
//   - interior: max over predecessors of {diag + match_fn, up + gap_open},
//     clip candidates (MIN_SCORE + ...) folded in exactly as written,
//     poa.rs:534-549
//   - in-row gap chain: score = max(max_cell, S[i][j-1] + gap_open),
//     poa.rs:550
//   - final score at (last topo node + 1, n), poa.rs:300-310 global mode
//
// Graph+query input is a flat binary exported by bench._poa_rates:
//   i32 m; u8 weights[m]; i32 topo[m]; i32 npred[m]; i32 preds[sum];
//   i32 B; i32 L; u8 queries[B*L]; i32 gap_open; i32 match; i32 mismatch
//
// usage: cpu_poa <graph.bin> <iters> [threads=1]
// prints: first line "s0 s1 s2" (parity probe), last line queries/sec.

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

static const int32_t MIN_SCORE = -858993459; // poa.rs:49

struct Graph {
    int32_t m = 0;
    std::vector<uint8_t> weights;
    std::vector<int32_t> topo;
    std::vector<int32_t> npred;
    std::vector<std::vector<int32_t>> preds;
    int32_t B = 0, L = 0;
    std::vector<uint8_t> queries; // B*L
    int32_t gap_open = 0, match_s = 0, mismatch_s = 0;
};

static void read_exact(FILE* f, void* p, size_t n) {
    if (fread(p, 1, n, f) != n) {
        fprintf(stderr, "cpu_poa: short read\n");
        exit(2);
    }
}

static Graph load(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cpu_poa: cannot open %s\n", path); exit(2); }
    Graph g;
    read_exact(f, &g.m, 4);
    g.weights.resize(g.m);
    read_exact(f, g.weights.data(), g.m);
    g.topo.resize(g.m);
    read_exact(f, g.topo.data(), 4u * g.m);
    g.npred.resize(g.m);
    read_exact(f, g.npred.data(), 4u * g.m);
    g.preds.resize(g.m);
    for (int32_t v = 0; v < g.m; ++v) {
        g.preds[v].resize(g.npred[v]);
        if (g.npred[v])
            read_exact(f, g.preds[v].data(), 4u * g.npred[v]);
    }
    read_exact(f, &g.B, 4);
    read_exact(f, &g.L, 4);
    g.queries.resize((size_t)g.B * g.L);
    read_exact(f, g.queries.data(), g.queries.size());
    read_exact(f, &g.gap_open, 4);
    read_exact(f, &g.match_s, 4);
    read_exact(f, &g.mismatch_s, 4);
    fclose(f);
    return g;
}

// Poa::custom DP with global clips (all MIN_SCORE), poa.rs:498-567.
static int32_t align_score(const Graph& g, const uint8_t* query, int n,
                           std::vector<int32_t>& mat /* (m+1)*(n+1) */) {
    const int stride = n + 1;
    // Traceback::with_capacity + initialize_scores (global: clip rows
    // never initialized to anything that can win; row 0 is the gap ramp)
    for (int j = 0; j <= n; ++j) mat[j] = j * g.gap_open;
    int32_t last = 0;
    for (int32_t t = 0; t < g.m; ++t) {
        const int32_t node = g.topo[t];
        const uint8_t r = g.weights[node];
        const int32_t i = node + 1;
        last = i;
        int32_t* row = &mat[(size_t)i * stride];
        // Traceback::new_row: col 0 = i * gap_open
        row[0] = i * g.gap_open;
        const auto& prevs = g.preds[node];
        for (int j = 1; j <= n; ++j) {
            const uint8_t qb = query[j - 1];
            const int32_t sub = (qb == r) ? g.match_s : g.mismatch_s;
            int32_t max_cell;
            if (prevs.empty()) {
                // poa.rs:531-532 — root: diagonal from row 0 only
                max_cell = mat[j - 1] + sub;
            } else {
                // clip candidates are MIN_SCORE + x: keep the reference's
                // max(MIN_SCORE, ...) seed (they can never win in global)
                max_cell = MIN_SCORE;
                for (int32_t p : prevs) {
                    const int32_t ip = p + 1;
                    const int32_t* prow = &mat[(size_t)ip * stride];
                    max_cell = std::max(
                        max_cell,
                        std::max(prow[j - 1] + sub, prow[j] + g.gap_open));
                }
            }
            row[j] = std::max(max_cell, row[j - 1] + g.gap_open);
        }
    }
    return mat[(size_t)last * stride + n];
}

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: cpu_poa <graph.bin> <iters> [threads=1]\n");
        return 2;
    }
    Graph g = load(argv[1]);
    const int iters = atoi(argv[2]);
    const int threads = (argc > 3) ? atoi(argv[3]) : 1;

    if (iters == 0) { // parity mode: every query's score, one per line
        std::vector<int32_t> mat((size_t)(g.m + 1) * (g.L + 1));
        for (int32_t k = 0; k < g.B; ++k)
            printf("%d\n",
                   align_score(g, &g.queries[(size_t)k * g.L], g.L, mat));
        return 0;
    }

    std::vector<int32_t> probe(3, 0);
    {
        std::vector<int32_t> mat((size_t)(g.m + 1) * (g.L + 1));
        for (int k = 0; k < 3 && k < g.B; ++k)
            probe[k] = align_score(g, &g.queries[(size_t)k * g.L], g.L, mat);
    }
    printf("%d %d %d\n", probe[0], probe[1], probe[2]);

    auto t0 = std::chrono::steady_clock::now();
    volatile int64_t sink = 0;
    if (threads <= 1) {
        std::vector<int32_t> mat((size_t)(g.m + 1) * (g.L + 1));
        int64_t acc = 0;
        for (int it = 0; it < iters; ++it)
            for (int32_t k = 0; k < g.B; ++k)
                acc += align_score(g, &g.queries[(size_t)k * g.L], g.L, mat);
        sink = acc;
    } else {
        std::vector<std::thread> ts;
        std::vector<int64_t> accs(threads, 0);
        for (int w = 0; w < threads; ++w) {
            ts.emplace_back([&, w]() {
                std::vector<int32_t> mat((size_t)(g.m + 1) * (g.L + 1));
                int64_t acc = 0;
                for (int it = 0; it < iters; ++it)
                    for (int32_t k = w; k < g.B; k += threads)
                        acc += align_score(g, &g.queries[(size_t)k * g.L],
                                           g.L, mat);
                accs[w] = acc;
            });
        }
        for (auto& t : ts) t.join();
        int64_t acc = 0;
        for (int64_t a : accs) acc += a;
        sink = acc;
    }
    (void)sink;
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    printf("%.2f\n", (double)iters * g.B / dt);
    return 0;
}
