// Native graph core: the irreducibly pointer-chasing residue of the
// pipeline, kept off-device by design (SURVEY.md §7.2/7.4).
//
// - hl_union_find_capped: the reference's size-capped, order-dependent
//   union-find over a score-sorted overlap stream
//   (bin_pointer_limited_filechunks_shortpath2.py:55-93). Semantics are
//   reproduced exactly: NO path compression, head-finding records the path
//   length of this traversal, the head of the SHORTER path is pointed at the
//   head of the longer, and a union is rejected when the combined size
//   exceeds maxsize.
// - hl_max_cliques_degeneracy: Bron-Kerbosch with degeneracy ordering and
//   pivoting (the quick-cliques `qc --algorithm=degeneracy` equivalent,
//   consumed by the short-read OLC core's clique stage).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// edges must already be in processing order (score-descending).
// parent_out[n]: on return, parent_out[i] = head unit of i's cluster.
// size_out[n]: cluster size at the head index (undefined elsewhere).
void hl_union_find_capped(const int64_t* e1, const int64_t* e2,
                          int64_t n_edges, int64_t n_units, int64_t maxsize,
                          int64_t* parent_out, int64_t* size_out) {
  std::vector<int64_t> parent(n_units);
  std::vector<int64_t> size(n_units, 1);
  for (int64_t i = 0; i < n_units; i++) parent[i] = i;

  auto findhead = [&](int64_t r, int64_t* pathlen) {
    int64_t hops = 1;
    while (parent[r] != r) {
      r = parent[r];
      hops++;
    }
    *pathlen = hops;
    return r;
  };

  for (int64_t e = 0; e < n_edges; e++) {
    int64_t p1, p2;
    int64_t h1 = findhead(e1[e], &p1);
    int64_t h2 = findhead(e2[e], &p2);
    if (h1 == h2) continue;
    int64_t total = size[h1] + size[h2];
    if (total > maxsize) continue;
    if (p2 < p1) {
      parent[h2] = h1;
      size[h1] = total;
    } else {
      parent[h1] = h2;
      size[h2] = total;
    }
  }

  for (int64_t i = 0; i < n_units; i++) {
    int64_t d;
    int64_t h = findhead(i, &d);
    parent_out[i] = h;
  }
  memset(size_out, 0, sizeof(int64_t) * n_units);
  for (int64_t i = 0; i < n_units; i++) size_out[parent_out[i]]++;
}

// ---------------------------------------------------------------------------
// Maximal clique enumeration: Bron-Kerbosch, degeneracy outer order, greedy
// pivoting inside. Graph given as CSR over undirected adjacency (both
// directions present). Cliques appended to a flat output buffer as
// [len, v0, v1, ...] records; returns number of cliques, or -1 if the
// output buffer was too small (caller retries with a bigger buffer).

namespace {

struct CliqueCtx {
  const int64_t* adj_start;
  const int64_t* adj;  // neighbor lists
  int64_t* out;
  int64_t out_cap;
  int64_t out_len;
  int64_t n_cliques;
  bool overflow;
  std::vector<int64_t> R;

  bool is_adj(int64_t u, int64_t v) const {
    const int64_t* b = adj + adj_start[u];
    const int64_t* e = adj + adj_start[u + 1];
    return std::binary_search(b, e, v);
  }

  void report() {
    int64_t need = (int64_t)R.size() + 1;
    if (out_len + need > out_cap) {
      overflow = true;
      return;
    }
    out[out_len++] = (int64_t)R.size();
    for (int64_t v : R) out[out_len++] = v;
    n_cliques++;
  }

  void bk(std::vector<int64_t>& P, std::vector<int64_t>& X) {
    if (overflow) return;
    if (P.empty() && X.empty()) {
      report();
      return;
    }
    // pivot: vertex of P ∪ X with most neighbors in P
    int64_t pivot = -1, best = -1;
    for (auto& S : {P, X})
      for (int64_t u : S) {
        int64_t c = 0;
        for (int64_t v : P)
          if (is_adj(u, v)) c++;
        if (c > best) best = c, pivot = u;
      }
    std::vector<int64_t> cand;
    for (int64_t v : P)
      if (pivot < 0 || !is_adj(pivot, v)) cand.push_back(v);
    for (int64_t v : cand) {
      std::vector<int64_t> P2, X2;
      for (int64_t u : P)
        if (u != v && is_adj(v, u)) P2.push_back(u);
      for (int64_t u : X)
        if (is_adj(v, u)) X2.push_back(u);
      R.push_back(v);
      bk(P2, X2);
      R.pop_back();
      P.erase(std::find(P.begin(), P.end(), v));
      X.push_back(v);
      if (overflow) return;
    }
  }
};

}  // namespace

int64_t hl_max_cliques_degeneracy(const int64_t* adj_start,
                                  const int64_t* adj, int64_t n_vertices,
                                  int64_t* out, int64_t out_cap) {
  // degeneracy order via repeated min-degree removal (bucket queue)
  std::vector<int64_t> deg(n_vertices), order;
  order.reserve(n_vertices);
  int64_t maxdeg = 0;
  for (int64_t v = 0; v < n_vertices; v++) {
    deg[v] = adj_start[v + 1] - adj_start[v];
    maxdeg = std::max(maxdeg, deg[v]);
  }
  std::vector<std::vector<int64_t>> bucket(maxdeg + 1);
  for (int64_t v = 0; v < n_vertices; v++) bucket[deg[v]].push_back(v);
  std::vector<bool> removed(n_vertices, false);
  std::vector<int64_t> pos_in_order(n_vertices, -1);
  int64_t cur = 0;
  for (int64_t it = 0; it < n_vertices; it++) {
    while (cur <= maxdeg && bucket[cur].empty()) cur++;
    if (cur > maxdeg) break;
    int64_t v = bucket[cur].back();
    bucket[cur].pop_back();
    if (removed[v] || deg[v] != cur) {
      if (!removed[v]) bucket[deg[v]].push_back(v);
      it--;
      continue;
    }
    removed[v] = true;
    pos_in_order[v] = (int64_t)order.size();
    order.push_back(v);
    for (int64_t i = adj_start[v]; i < adj_start[v + 1]; i++) {
      int64_t u = adj[i];
      if (!removed[u]) {
        deg[u]--;
        bucket[std::max<int64_t>(deg[u], 0)].push_back(u);
        if (cur > deg[u]) cur = deg[u];
      }
    }
  }

  CliqueCtx ctx{adj_start, adj, out, out_cap, 0, 0, false, {}};
  for (int64_t v : order) {
    std::vector<int64_t> P, X;
    for (int64_t i = adj_start[v]; i < adj_start[v + 1]; i++) {
      int64_t u = adj[i];
      if (pos_in_order[u] > pos_in_order[v])
        P.push_back(u);
      else
        X.push_back(u);
    }
    ctx.R.assign(1, v);
    ctx.bk(P, X);
    if (ctx.overflow) return -1;
  }
  // first slot convention: caller reads total length from return via second
  // call contract; we return clique count and rely on [len, ...] records.
  return ctx.n_cliques;
}

}  // extern "C"  (reopened below — templates need C++ linkage)

// ---------------------------------------------------------------------------
// Multi-try heuristics (GraphAlgos.cpp:178-248 vertexLabellingHeuristic and
// :352-541 cycleRemovalHeuristic): the reference tries up to 100 shuffled
// BFS labellings / 20 DFS neighbor orders and keeps the variant deleting the
// fewest edges. Deterministic xorshift rng per try (fixed seeds).

namespace {

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed * 2654435769u + 1) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  int64_t bounded(int64_t n) { return (int64_t)(next() % (uint64_t)n); }
};

template <typename T>
void fisher_yates(std::vector<T>& v, XorShift& rng) {
  for (int64_t i = (int64_t)v.size() - 1; i > 0; i--) {
    std::swap(v[i], v[(size_t)rng.bounded(i + 1)]);
  }
}

}  // namespace

extern "C" {

// Myers-style transitive reduction with the EXACT asg_arc_del_trans
// in-play/eliminated semantics (miniasm asg.c:148-187): per vertex v,
// neighbors are marked in-play; neighbors are processed in arc-length
// order and SKIPPED once eliminated; a 2-hop x is eliminated when
// l(v->w) + l(w->x) <= max_l(v) + fuzz.  Arcs must arrive as a CSR
// sorted by (v, l ascending).  reduced_out[e] = 1 for reduced arcs;
// returns the reduction count.
int64_t hl_transitive_reduction(const int64_t* start, const int64_t* count,
                                const int64_t* w, const int32_t* l,
                                int64_t n_vtx, int64_t fuzz,
                                uint8_t* reduced_out) {
  std::vector<uint8_t> mark(n_vtx, 0);
  int64_t n_red = 0;
  for (int64_t v = 0; v < n_vtx; v++) {
    int64_t nv = count[v];
    if (nv == 0) continue;
    const int64_t* av_w = w + start[v];
    const int32_t* av_l = l + start[v];
    for (int64_t i = 0; i < nv; i++) mark[av_w[i]] = 1;
    int64_t L = (int64_t)av_l[nv - 1] + fuzz;
    for (int64_t i = 0; i < nv; i++) {
      int64_t ww = av_w[i];
      if (mark[ww] != 1) continue;
      int64_t nw = count[ww];
      const int64_t* aw_w = w + start[ww];
      const int32_t* aw_l = l + start[ww];
      for (int64_t j = 0;
           j < nw && (int64_t)aw_l[j] + av_l[i] <= L; j++)
        if (mark[aw_w[j]]) mark[aw_w[j]] = 2;
    }
    for (int64_t i = 0; i < nv; i++) {
      if (mark[av_w[i]] == 2) { reduced_out[start[v] + i] = 1; n_red++; }
      mark[av_w[i]] = 0;
    }
  }
  return n_red;
}

// Streaming per-read overlap cap (filter_trans_ovlp_inline_v4.py:74-83):
// edges arrive score-descending; keep an edge iff BOTH endpoints are below
// the cap, then charge both. keep_out[e] = 1 for kept edges.
void hl_cap_per_read(const int64_t* order, const int32_t* qid,
                     const int32_t* tid, int64_t n_edges, int64_t n_reads,
                     int64_t cap, uint8_t* keep_out) {
  std::vector<int32_t> counts(n_reads, 0);
  for (int64_t i = 0; i < n_edges; i++) {
    int64_t e = order[i];
    int32_t a = qid[e], b = tid[e];
    if (counts[a] >= cap || counts[b] >= cap) continue;
    counts[a]++;
    counts[b]++;
    keep_out[e] = 1;
  }
}

// BFS orientation labelling, best of max_tries (conflict-minimizing).
// Edges are undirected with a parity bit (0 = same orientation, 1 = flip).
// Returns the best try's conflict count; labels_out[n] gets 0/1 labels.
int64_t hl_label_orientations(const int32_t* eu, const int32_t* ev,
                              const uint8_t* parity, int64_t n_edges,
                              int64_t n, int64_t max_tries,
                              int8_t* labels_out) {
  // CSR over both directions
  std::vector<int64_t> deg(n, 0);
  for (int64_t e = 0; e < n_edges; e++) {
    deg[eu[e]]++;
    deg[ev[e]]++;
  }
  std::vector<int64_t> start(n + 1, 0);
  for (int64_t i = 0; i < n; i++) start[i + 1] = start[i] + deg[i];
  std::vector<int32_t> nbr(start[n]), par(start[n]);
  std::vector<int64_t> cur(start.begin(), start.end() - 1);
  for (int64_t e = 0; e < n_edges; e++) {
    nbr[cur[eu[e]]] = ev[e];
    par[cur[eu[e]]++] = parity[e];
    nbr[cur[ev[e]]] = eu[e];
    par[cur[ev[e]]++] = parity[e];
  }

  // seed order: increasing degree, id tiebreak (sortVerticesByIndegree)
  std::vector<int32_t> seed_order(n);
  std::iota(seed_order.begin(), seed_order.end(), 0);
  std::stable_sort(seed_order.begin(), seed_order.end(),
                   [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });

  std::vector<int8_t> best(n, 0), lab(n);
  int64_t best_conf = -1;
  std::vector<int32_t> queue;
  queue.reserve(n);
  std::vector<std::pair<int32_t, int8_t>> adj_scratch;
  for (int64_t t = 1; t <= max_tries; t++) {
    XorShift rng((uint64_t)t);
    std::fill(lab.begin(), lab.end(), (int8_t)-1);
    std::vector<int32_t> seeds = seed_order;
    if (t > 1) fisher_yates(seeds, rng);
    for (int32_t s0 : seeds) {
      if (lab[s0] >= 0) continue;
      lab[s0] = 0;
      queue.clear();
      queue.push_back(s0);
      for (size_t qi = 0; qi < queue.size(); qi++) {
        int32_t u = queue[qi];
        adj_scratch.clear();
        for (int64_t i = start[u]; i < start[u + 1]; i++)
          adj_scratch.push_back({nbr[i], (int8_t)par[i]});
        if (t > 1) fisher_yates(adj_scratch, rng);
        for (auto& [v, p] : adj_scratch) {
          if (lab[v] < 0) {
            lab[v] = (int8_t)(lab[u] ^ p);
            queue.push_back(v);
          }
        }
      }
    }
    int64_t conf = 0;
    for (int64_t e = 0; e < n_edges; e++)
      conf += ((lab[eu[e]] ^ lab[ev[e]]) != parity[e]);
    if (best_conf < 0 || conf < best_conf) {
      best_conf = conf;
      best = lab;
    }
    if (best_conf == 0) break;
  }
  std::memcpy(labels_out, best.data(), (size_t)n);
  return best_conf;
}

// Multi-try DFS back-edge detection on a directed graph. Neighbor-order
// strategies per GraphAlgos.cpp:352-485: t=1 ascending key1 (pos1),
// t=2 descending key2 (score), t=3 descending key3 (ovlen), t=4 ascending
// key4 (mismatch rate), t>=5 random shuffle; id tiebreak throughout.
// Seeds in increasing-indegree order. back_out[e]=1 marks the best try's
// back edges; returns their count.
int64_t hl_find_backedges(const int32_t* eu, const int32_t* ev,
                          const double* key1, const double* key2,
                          const double* key3, const double* key4,
                          int64_t n_edges, int64_t n, int64_t max_tries,
                          uint8_t* back_out) {
  std::vector<int64_t> outdeg(n, 0), indeg(n, 0);
  for (int64_t e = 0; e < n_edges; e++) {
    outdeg[eu[e]]++;
    indeg[ev[e]]++;
  }
  std::vector<int64_t> start(n + 1, 0);
  for (int64_t i = 0; i < n; i++) start[i + 1] = start[i] + outdeg[i];
  std::vector<int64_t> base_adj(start[n]);  // edge ids, CSR by source
  {
    std::vector<int64_t> cur(start.begin(), start.end() - 1);
    for (int64_t e = 0; e < n_edges; e++) base_adj[cur[eu[e]]++] = e;
  }
  std::vector<int32_t> seed_order(n);
  std::iota(seed_order.begin(), seed_order.end(), 0);
  std::stable_sort(seed_order.begin(), seed_order.end(),
                   [&](int32_t a, int32_t b) { return indeg[a] < indeg[b]; });

  std::vector<uint8_t> best(n_edges, 0), curmask(n_edges, 0);
  int64_t best_count = -1;
  std::vector<int64_t> adj(base_adj);
  std::vector<int8_t> state(n);           // 0 white, 1 on-path, 2 done
  std::vector<std::pair<int32_t, int64_t>> stack;  // (node, cursor)
  for (int64_t t = 1; t <= max_tries; t++) {
    adj = base_adj;
    auto sort_adj = [&](auto cmp) {
      for (int64_t v = 0; v < n; v++)
        std::sort(adj.begin() + start[v], adj.begin() + start[v + 1], cmp);
    };
    if (t == 1)
      sort_adj([&](int64_t a, int64_t b) {
        return key1[a] != key1[b] ? key1[a] < key1[b] : ev[a] < ev[b];
      });
    else if (t == 2)
      sort_adj([&](int64_t a, int64_t b) {
        return key2[a] != key2[b] ? key2[a] > key2[b] : ev[a] < ev[b];
      });
    else if (t == 3)
      sort_adj([&](int64_t a, int64_t b) {
        return key3[a] != key3[b] ? key3[a] > key3[b] : ev[a] < ev[b];
      });
    else if (t == 4)
      sort_adj([&](int64_t a, int64_t b) {
        return key4[a] != key4[b] ? key4[a] < key4[b] : ev[a] < ev[b];
      });
    else {
      XorShift rng((uint64_t)t);
      for (int64_t v = 0; v < n; v++) {
        for (int64_t i = start[v + 1] - 1; i > start[v]; i--) {
          std::swap(adj[i], adj[start[v] + rng.bounded(i - start[v] + 1)]);
        }
      }
    }
    std::fill(state.begin(), state.end(), 0);
    std::fill(curmask.begin(), curmask.end(), 0);
    int64_t count = 0;
    for (int32_t s0 : seed_order) {
      if (state[s0]) continue;
      stack.clear();
      stack.push_back({s0, start[s0]});
      state[s0] = 1;
      while (!stack.empty()) {
        auto& [node, curi] = stack.back();
        if (curi >= start[node + 1]) {
          state[node] = 2;
          stack.pop_back();
          continue;
        }
        int64_t e = adj[curi++];
        int32_t w = ev[e];
        if (state[w] == 1) {
          if (!curmask[e]) {
            curmask[e] = 1;
            count++;
          }
        } else if (state[w] == 0) {
          state[w] = 1;
          stack.push_back({w, start[w]});
        }
      }
    }
    if (best_count < 0 || count < best_count) {
      best_count = count;
      best = curmask;
    }
    if (best_count == 0) break;
  }
  std::memcpy(back_out, best.data(), (size_t)n_edges);
  return best_count;
}

}  // extern "C"
