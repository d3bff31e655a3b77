// Host-side graph library for llp_tpu (sampling + partitioning).
//
// Native replacement for the C++/CUDA sampling machinery the reference leans
// on (torch_cluster.random_walk at reference src/main.py:37-45, PyG
// negative_sampling at main.py:81): CSR uniform random walks and
// exclusion-set negative edge sampling, exposed as extern "C" for ctypes.
// These feed the host->device input pipeline for graphs whose node count
// exceeds the on-device int32 exact-key limit (e.g. ogbl-collab), and serve
// as the CPU half of the data loader generally.  Also hosts the
// locality-aware balanced graph partitioner (llp_partition_graph) that backs
// halo-sharding comm-volume reduction and cache-locality node reordering.
//
// Determinism: all entry points take an explicit 64-bit seed; each logical
// unit (walk / sample slot) derives its own splitmix64 stream, so results are
// independent of thread scheduling.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, high-quality, seedable per-unit stream.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t s) : state(s) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // Unbiased bounded draw (Lemire).
  uint64_t bounded(uint64_t n) {
    if (n == 0) return 0;
    __uint128_t m = (__uint128_t)next() * n;
    uint64_t lo = (uint64_t)m;
    if (lo < n) {
      uint64_t t = (-n) % n;
      while (lo < t) {
        m = (__uint128_t)next() * n;
        lo = (uint64_t)m;
      }
    }
    return (uint64_t)(m >> 64);
  }
};

void parallel_for(int64_t n, int64_t grain,
                  const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = hw ? (int64_t)hw : 1;
  if (n < grain * 2 || nthreads <= 1) {
    fn(0, n);
    return;
  }
  nthreads = std::min<int64_t>(nthreads, (n + grain - 1) / grain);
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

inline bool key_member(const int64_t* sorted, int64_t n, int64_t key) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (sorted[mid] < key)
      lo = mid + 1;
    else
      hi = mid;
  }
  return lo < n && sorted[lo] == key;
}

// ---- multilevel partitioning internals --------------------------------------

struct CsrLevel {
  std::vector<int64_t> row_ptr;
  std::vector<int32_t> col;
  std::vector<int64_t> ew;    // edge weights (merged multi-edge counts)
  std::vector<int64_t> nw;    // node weights (cluster sizes)
  std::vector<int32_t> cmap;  // finer-level node -> this level's node
  int64_t n = 0;
};

// One capacitated weighted label-propagation restream pass.  Deterministic:
// ties resolve to the lowest part id, moves only on strict improvement.
int64_t lp_pass_weighted(const CsrLevel& L, int32_t num_parts,
                         std::vector<int64_t>& load, int64_t cap2,
                         int32_t* assign) {
  std::vector<int64_t> nb((size_t)num_parts);
  int64_t moved = 0;
  for (int64_t v = 0; v < L.n; ++v) {
    int32_t cur = assign[v];
    std::fill(nb.begin(), nb.end(), 0);
    for (int64_t e = L.row_ptr[v]; e < L.row_ptr[v + 1]; ++e)
      nb[(size_t)assign[L.col[e]]] += L.ew[e];
    int64_t best_score = -1;
    int32_t best = cur;
    int64_t w = L.nw[v];
    for (int32_t p = 0; p < num_parts; ++p) {
      if (p != cur && load[p] + w > cap2) continue;
      if (nb[(size_t)p] > best_score) {
        best_score = nb[(size_t)p];
        best = p;
      }
    }
    if (best != cur && best_score > nb[(size_t)cur]) {
      load[(size_t)cur] -= w;
      load[(size_t)best] += w;
      assign[v] = best;
      ++moved;
    }
  }
  return moved;
}

// Weighted LDG stream (ascending id) for the coarsest-level initial
// partition; falls back to min-load placement when nothing is feasible.
void ldg_weighted(const CsrLevel& L, int32_t num_parts, int64_t cap,
                  std::vector<int64_t>& load, int32_t* assign) {
  std::fill(assign, assign + L.n, (int32_t)-1);
  std::vector<int64_t> nb((size_t)num_parts);
  for (int64_t v = 0; v < L.n; ++v) {
    std::fill(nb.begin(), nb.end(), 0);
    for (int64_t e = L.row_ptr[v]; e < L.row_ptr[v + 1]; ++e) {
      int32_t a = assign[L.col[e]];
      if (a >= 0) nb[(size_t)a] += L.ew[e];
    }
    int64_t w = L.nw[v];
    int64_t best_score = INT64_MIN;
    int32_t best = -1;
    for (int32_t p = 0; p < num_parts; ++p) {
      if (load[p] + w > cap) continue;
      int64_t s = nb[(size_t)p] * (cap - load[p]);
      if (s > best_score) {
        best_score = s;
        best = p;
      }
    }
    if (best < 0) {  // oversized node: least-loaded part
      best = 0;
      for (int32_t p = 1; p < num_parts; ++p)
        if (load[p] < load[best]) best = p;
    }
    assign[v] = best;
    load[(size_t)best] += w;
  }
}

// Heavy-edge matching + contraction.  Deterministic: nodes visited
// ascending, the heaviest unmatched neighbor wins (ties -> lowest id),
// pairs respecting the maxnw cluster-size bound.
CsrLevel coarsen_level(const CsrLevel& L, int64_t maxnw) {
  std::vector<int32_t> match((size_t)L.n, -1);
  for (int64_t v = 0; v < L.n; ++v) {
    if (match[v] >= 0) continue;
    int64_t bestw = -1;
    int32_t bestu = -1;
    for (int64_t e = L.row_ptr[v]; e < L.row_ptr[v + 1]; ++e) {
      int32_t u = L.col[e];
      if ((int64_t)u == v || match[u] >= 0) continue;
      if (L.nw[v] + L.nw[u] > maxnw) continue;
      if (L.ew[e] > bestw) {
        bestw = L.ew[e];
        bestu = u;
      }
    }
    if (bestu >= 0) {
      match[v] = bestu;
      match[bestu] = (int32_t)v;
    } else {
      match[v] = (int32_t)v;
    }
  }
  CsrLevel C;
  C.cmap.assign((size_t)L.n, -1);
  int64_t nc = 0;
  for (int64_t v = 0; v < L.n; ++v) {
    if (C.cmap[v] >= 0) continue;
    C.cmap[v] = (int32_t)nc;
    C.cmap[(size_t)match[v]] = (int32_t)nc;
    ++nc;
  }
  C.n = nc;
  C.nw.assign((size_t)nc, 0);
  for (int64_t v = 0; v < L.n; ++v) C.nw[(size_t)C.cmap[v]] += L.nw[v];
  // Coarse adjacency: counting-sort fine edges by coarse row, then per-row
  // sort + merge duplicate columns.
  std::vector<int64_t> cnt((size_t)nc + 1, 0);
  for (int64_t v = 0; v < L.n; ++v)
    for (int64_t e = L.row_ptr[v]; e < L.row_ptr[v + 1]; ++e)
      if (C.cmap[L.col[e]] != C.cmap[v]) cnt[(size_t)C.cmap[v] + 1]++;
  for (int64_t r = 0; r < nc; ++r) cnt[(size_t)r + 1] += cnt[(size_t)r];
  std::vector<int32_t> tcol((size_t)cnt[(size_t)nc]);
  std::vector<int64_t> tw((size_t)cnt[(size_t)nc]);
  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  for (int64_t v = 0; v < L.n; ++v) {
    int32_t cv = C.cmap[v];
    for (int64_t e = L.row_ptr[v]; e < L.row_ptr[v + 1]; ++e) {
      int32_t cu = C.cmap[L.col[e]];
      if (cu == cv) continue;
      int64_t pos = cursor[(size_t)cv]++;
      tcol[(size_t)pos] = cu;
      tw[(size_t)pos] = L.ew[e];
    }
  }
  C.row_ptr.assign((size_t)nc + 1, 0);
  std::vector<int64_t> idx;
  for (int64_t r = 0; r < nc; ++r) {
    int64_t beg = cnt[(size_t)r], end = cnt[(size_t)r + 1];
    idx.resize((size_t)(end - beg));
    for (int64_t i = 0; i < end - beg; ++i) idx[(size_t)i] = beg + i;
    std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
      return tcol[(size_t)a] < tcol[(size_t)b];
    });
    int64_t out = C.col.size();
    for (int64_t i = 0; i < (int64_t)idx.size(); ++i) {
      int32_t u = tcol[(size_t)idx[(size_t)i]];
      int64_t w = tw[(size_t)idx[(size_t)i]];
      if ((int64_t)C.col.size() > out && C.col.back() == u) {
        C.ew.back() += w;
      } else {
        C.col.push_back(u);
        C.ew.push_back(w);
      }
    }
    C.row_ptr[(size_t)r + 1] = (int64_t)C.col.size();
  }
  return C;
}

}  // namespace

extern "C" {

// Multilevel locality partitioning (METIS-style V-cycle): heavy-edge
// matching coarsens the graph until `coarsest` nodes remain, a weighted LDG
// + label-propagation pass partitions the coarsest graph, and the
// assignment is projected back level by level with capacitated weighted LP
// refinement at each step.  Escapes the local optima the flat restream
// gets stuck in at small num_parts (whole clusters move as single coarse
// nodes).  Deterministic; the caller does the final exact-fill rebalance.
void llp_partition_multilevel(const int32_t* row_ptr, const int32_t* col,
                              int32_t n, int32_t num_parts, int32_t coarsest,
                              int32_t refine_passes, double slack,
                              int32_t* assign) {
  std::vector<CsrLevel> levels(1);
  CsrLevel& L0 = levels[0];
  L0.n = n;
  L0.row_ptr.assign(row_ptr, row_ptr + n + 1);
  L0.col.assign(col, col + row_ptr[n]);
  L0.ew.assign((size_t)row_ptr[n], 1);
  L0.nw.assign((size_t)n, 1);
  int64_t total_w = n;
  int64_t maxnw = std::max<int64_t>(1, (2 * total_w) / std::max(coarsest, 1));
  while (levels.back().n > coarsest) {
    CsrLevel next = coarsen_level(levels.back(), maxnw);
    if (next.n >= levels.back().n * 97 / 100) break;  // matching stalled
    levels.push_back(std::move(next));
  }
  int64_t cap_base = (total_w + num_parts - 1) / num_parts;
  int64_t cap2 =
      cap_base + std::max<int64_t>(1, (int64_t)((double)cap_base * slack));
  // Coarsest: weighted LDG (generous cap — big nodes must place), then LP
  // to convergence.
  {
    CsrLevel& Lc = levels.back();
    std::vector<int64_t> load((size_t)num_parts, 0);
    std::vector<int32_t> ac((size_t)Lc.n);
    ldg_weighted(Lc, num_parts, cap2 + maxnw, load, ac.data());
    for (int32_t pass = 0; pass < 4 * refine_passes; ++pass)
      if (lp_pass_weighted(Lc, num_parts, load, cap2, ac.data()) == 0) break;
    // Project down with per-level refinement.
    std::vector<int32_t> cur = std::move(ac);
    for (int64_t lev = (int64_t)levels.size() - 2; lev >= 0; --lev) {
      CsrLevel& Lf = levels[(size_t)lev];
      const std::vector<int32_t>& cmap = levels[(size_t)lev + 1].cmap;
      std::vector<int32_t> fine((size_t)Lf.n);
      for (int64_t v = 0; v < Lf.n; ++v)
        fine[(size_t)v] = cur[(size_t)cmap[(size_t)v]];
      std::fill(load.begin(), load.end(), 0);
      for (int64_t v = 0; v < Lf.n; ++v)
        load[(size_t)fine[(size_t)v]] += Lf.nw[(size_t)v];
      for (int32_t pass = 0; pass < refine_passes; ++pass)
        if (lp_pass_weighted(Lf, num_parts, load, cap2, fine.data()) == 0)
          break;
      cur = std::move(fine);
    }
    std::copy(cur.begin(), cur.end(), assign);
  }
}

// Uniform random walks over CSR (row_ptr, col). Isolated nodes stay put
// (torch_cluster padding behavior). out is (n_starts, walk_len + 1) row-major.
void llp_random_walks(const int32_t* row_ptr, const int32_t* col,
                      int32_t /*n_nodes*/, const int32_t* starts,
                      int64_t n_starts, int32_t walk_len, uint64_t seed,
                      int32_t* out) {
  parallel_for(n_starts, 1024, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      SplitMix64 rng(seed * 0x100000001b3ULL + (uint64_t)i * 0x9e3779b9ULL);
      int32_t cur = starts[i];
      int32_t* row = out + i * (walk_len + 1);
      row[0] = cur;
      for (int32_t s = 0; s < walk_len; ++s) {
        int32_t beg = row_ptr[cur], end = row_ptr[cur + 1];
        int32_t deg = end - beg;
        if (deg > 0) cur = col[beg + (int32_t)rng.bounded((uint64_t)deg)];
        row[s + 1] = cur;
      }
    }
  });
}

// Negative edge sampling: uniform (src, dst) proposals rejected against a
// sorted int64 key array (key = src * num_nodes + dst). max_rounds bounds the
// per-slot retry count; leftover collisions (vanishing probability) are kept.
// force_undirected: propose src < dst only (no self-loops).
void llp_sample_negative_edges(const int64_t* sorted_keys, int64_t n_keys,
                               int64_t num_nodes, int64_t n_samples,
                               int32_t force_undirected, int32_t max_rounds,
                               uint64_t seed, int32_t* out_src,
                               int32_t* out_dst) {
  parallel_for(n_samples, 4096, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      SplitMix64 rng(seed * 0x51afd6edULL + (uint64_t)i * 0x9e3779b9ULL);
      int64_t a = 0, b = 0;
      for (int32_t r = 0; r < max_rounds; ++r) {
        a = (int64_t)rng.bounded((uint64_t)num_nodes);
        b = (int64_t)rng.bounded((uint64_t)num_nodes);
        if (force_undirected) {
          if (a == b) continue;
          if (a > b) std::swap(a, b);
        }
        if (!key_member(sorted_keys, n_keys, a * num_nodes + b)) break;
      }
      out_src[i] = (int32_t)a;
      out_dst[i] = (int32_t)b;
    }
  });
}

// Locality-aware balanced partitioning into num_parts groups of <= cap
// nodes: one LDG stream pass over the caller-supplied node order (score =
// assigned-neighbor count * remaining capacity, hard cap), then capacitated
// label-propagation restream passes (score = neighbor count, slack cap2 >=
// cap) until no node moves or max_passes is hit.  Deterministic — no RNG;
// ties resolve to the lowest partition id and restream moves only on strict
// improvement.  Sequential by design (each decision reads earlier ones);
// O(max_passes * (E + n * num_parts)), far from any hot path.
//
// The caller rebalances to exact per-part fills afterwards (python side —
// the slack surplus is a few percent of n) and turns the assignment into a
// relabeling permutation for halo sharding / cache locality.
void llp_partition_graph(const int32_t* row_ptr, const int32_t* col,
                         int32_t n, int32_t num_parts, int32_t max_passes,
                         int32_t cap, int32_t cap2, const int32_t* order,
                         int32_t* assign) {
  std::vector<int64_t> load((size_t)num_parts, 0);
  std::vector<int64_t> nb((size_t)num_parts, 0);
  std::fill(assign, assign + n, (int32_t)-1);
  // Pass 0: LDG over the stream order.
  for (int32_t i = 0; i < n; ++i) {
    int32_t v = order[i];
    std::fill(nb.begin(), nb.end(), 0);
    for (int32_t e = row_ptr[v]; e < row_ptr[v + 1]; ++e) {
      int32_t a = assign[col[e]];
      if (a >= 0) nb[(size_t)a]++;
    }
    int64_t best_score = INT64_MIN;
    int32_t best = 0;
    for (int32_t p = 0; p < num_parts; ++p) {
      if (load[p] >= cap) continue;
      int64_t s = nb[(size_t)p] * (int64_t)(cap - load[p]);
      if (s > best_score) {
        best_score = s;
        best = p;
      }
    }
    assign[v] = best;
    load[(size_t)best]++;
  }
  // Restream: capacitated label propagation with slack.
  for (int32_t pass = 0; pass < max_passes; ++pass) {
    int64_t moved = 0;
    for (int32_t v = 0; v < n; ++v) {
      int32_t cur = assign[v];
      std::fill(nb.begin(), nb.end(), 0);
      for (int32_t e = row_ptr[v]; e < row_ptr[v + 1]; ++e) {
        nb[(size_t)assign[col[e]]]++;
      }
      int64_t best_score = -1;
      int32_t best = cur;
      for (int32_t p = 0; p < num_parts; ++p) {
        if (p != cur && load[p] >= cap2) continue;
        if (nb[(size_t)p] > best_score) {
          best_score = nb[(size_t)p];
          best = p;
        }
      }
      if (best != cur && best_score > nb[(size_t)cur]) {
        load[(size_t)cur]--;
        load[(size_t)best]++;
        assign[v] = best;
        moved++;
      }
    }
    if (moved == 0) break;
  }
}

// CSR construction from an edge list (senders array), counts pre-zeroed.
// Returns via row_ptr (n_nodes + 1) and perm (E) = ordering of edges sorted
// stably by sender; col[i] = receivers[perm[i]] is then done by the caller
// (numpy fancy-indexing is fast enough; the counting sort is the slow part).
void llp_build_csr_perm(const int32_t* senders, int64_t n_edges,
                        int32_t n_nodes, int32_t* row_ptr, int64_t* perm) {
  std::vector<int64_t> counts((size_t)n_nodes + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) counts[(size_t)senders[e] + 1]++;
  for (int32_t v = 0; v < n_nodes; ++v) counts[(size_t)v + 1] += counts[v];
  for (int32_t v = 0; v <= n_nodes; ++v) row_ptr[v] = (int32_t)counts[v];
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e) {
    perm[cursor[(size_t)senders[e]]++] = e;
  }
}

}  // extern "C"
