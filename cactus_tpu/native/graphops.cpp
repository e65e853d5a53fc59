// Native host-side graph kernels for the cactus_tpu pipeline.
//
// Replaces the role of the reference's C foundation libraries for the
// pointer-light graph passes (reference: sonLib containers +
// pinchesAndCacti union/merge machinery): connected components over edge
// arrays via union-find with path halving, and spanning-forest
// construction for the cactus chain decomposition.  Exposed via ctypes
// (no pybind11 in this image); arrays are raw int64 buffers shared with
// numpy.  Compiled on demand by native/build.py (g++ -O3).

#include <cstdint>
#include <vector>

extern "C" {

// Union-find connected components.
// u, v: edge endpoints (n_edges); comp out: root label per node.
// Returns the number of distinct components.
int64_t cc_edges(int64_t n_nodes, int64_t n_edges,
                 const int64_t* u, const int64_t* v, int64_t* comp) {
    std::vector<int64_t> parent(n_nodes);
    for (int64_t i = 0; i < n_nodes; i++) parent[i] = i;

    auto find = [&](int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    };

    for (int64_t e = 0; e < n_edges; e++) {
        int64_t a = find(u[e]);
        int64_t b = find(v[e]);
        if (a != b) parent[a] = b;
    }
    // densify labels in first-seen order (deterministic)
    std::vector<int64_t> label(n_nodes, -1);
    int64_t next = 0;
    for (int64_t i = 0; i < n_nodes; i++) {
        int64_t r = find(i);
        if (label[r] < 0) label[r] = next++;
        comp[i] = label[r];
    }
    return next;
}

// Spanning forest over a multigraph given as edge arrays.
// Outputs: is_tree (n_edges, 0/1), parent_node / parent_edge (n_nodes,
// -1 for roots), order (n_nodes) = DFS finish-agnostic visitation order
// where children always appear after their parent.
void spanning_forest(int64_t n_nodes, int64_t n_edges,
                     const int64_t* u, const int64_t* v,
                     uint8_t* is_tree, int64_t* parent_node,
                     int64_t* parent_edge, int64_t* order) {
    std::vector<int64_t> head(n_nodes, -1);
    std::vector<int64_t> nxt(2 * n_edges, -1);
    std::vector<int64_t> eto(2 * n_edges), eid(2 * n_edges);
    for (int64_t e = 0; e < n_edges; e++) {
        int64_t s0 = 2 * e, s1 = 2 * e + 1;
        eto[s0] = v[e]; eid[s0] = e; nxt[s0] = head[u[e]]; head[u[e]] = s0;
        eto[s1] = u[e]; eid[s1] = e; nxt[s1] = head[v[e]]; head[v[e]] = s1;
    }
    std::vector<uint8_t> visited(n_nodes, 0);
    std::vector<int64_t> stack;
    int64_t pos = 0;
    for (int64_t e = 0; e < n_edges; e++) is_tree[e] = 0;
    for (int64_t i = 0; i < n_nodes; i++) {
        parent_node[i] = -1;
        parent_edge[i] = -1;
    }
    for (int64_t root = 0; root < n_nodes; root++) {
        if (visited[root]) continue;
        visited[root] = 1;
        stack.push_back(root);
        while (!stack.empty()) {
            int64_t a = stack.back();
            stack.pop_back();
            order[pos++] = a;
            for (int64_t s = head[a]; s >= 0; s = nxt[s]) {
                int64_t b = eto[s];
                if (!visited[b]) {
                    visited[b] = 1;
                    is_tree[eid[s]] = 1;
                    parent_node[b] = a;
                    parent_edge[b] = eid[s];
                    stack.push_back(b);
                }
            }
        }
    }
}

}  // extern "C"
