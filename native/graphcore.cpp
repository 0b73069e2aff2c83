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

}  // extern "C"
