// Native host-side graph preprocessing for networks_fenicsx_tpu.
//
// Plays the role the native DOLFINx C++ graph/topology layer plays for the
// reference (reference mesh.py:29-42 colors edges through a Python
// networkx line-graph + greedy_color, which dominates BuildMesh at ~65k
// edges; graph partitioning/adjacency is ParMETIS/SCOTCH there).  Exposed
// through ctypes (no pybind11 in the image); every entry point has a pure
// NumPy/Python fallback in mesh.py.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// Greedy proper edge coloring: edges sharing a node get different colors.
// edges: 2*E int64 (u0,v0,u1,v1,...), node ids in [0, V).
// colors_out: E int32.  Returns the number of colors used, or -1 on error.
//
// Per-node color usage is tracked in 64-bit masks with a dynamic spill
// vector for (pathological) degrees above 64.
int32_t nxfx_color_edges(int64_t num_edges, const int64_t* edges, int64_t num_nodes,
                         int32_t* colors_out) {
    if (num_edges < 0 || num_nodes < 0) return -1;
    std::vector<uint64_t> mask(static_cast<size_t>(num_nodes), 0);
    // spill storage for nodes with more than 64 incident colors
    std::vector<std::vector<uint64_t>> spill;
    std::vector<int32_t> spill_idx(static_cast<size_t>(num_nodes), -1);
    int32_t max_color = -1;

    for (int64_t e = 0; e < num_edges; ++e) {
        const int64_t u = edges[2 * e];
        const int64_t v = edges[2 * e + 1];
        if (u < 0 || u >= num_nodes || v < 0 || v >= num_nodes) return -1;
        uint64_t used = mask[u] | mask[v];
        int32_t color;
        if (used != ~uint64_t(0)) {
            // lowest zero bit of `used`
            const uint64_t free_bits = ~used;
            color = static_cast<int32_t>(__builtin_ctzll(free_bits));
        } else {
            // extremely high degree node: search spill words
            const int32_t su = spill_idx[u] >= 0 ? spill_idx[u] : -1;
            const int32_t sv = spill_idx[v] >= 0 ? spill_idx[v] : -1;
            color = 64;
            for (int32_t word = 0;; ++word) {
                const uint64_t wu = (su >= 0 && word < (int32_t)spill[su].size())
                                        ? spill[su][word] : 0;
                const uint64_t wv = (sv >= 0 && word < (int32_t)spill[sv].size())
                                        ? spill[sv][word] : 0;
                const uint64_t w_used = wu | wv;
                if (w_used != ~uint64_t(0)) {
                    color = 64 + 64 * word +
                            static_cast<int32_t>(__builtin_ctzll(~w_used));
                    break;
                }
            }
        }
        // mark color used at both endpoints
        for (const int64_t n : {u, v}) {
            if (color < 64) {
                mask[n] |= (uint64_t(1) << color);
            } else {
                if (spill_idx[n] < 0) {
                    spill_idx[n] = static_cast<int32_t>(spill.size());
                    spill.emplace_back();
                }
                auto& words = spill[spill_idx[n]];
                const int32_t word = (color - 64) / 64;
                if ((int32_t)words.size() <= word) words.resize(word + 1, 0);
                words[word] |= (uint64_t(1) << ((color - 64) % 64));
            }
        }
        colors_out[e] = color;
        if (color > max_color) max_color = color;
    }
    return max_color + 1;
}

// Node degrees of the (undirected view of the) edge list.
void nxfx_degrees(int64_t num_edges, const int64_t* edges, int64_t num_nodes,
                  int64_t* degrees_out) {
    for (int64_t n = 0; n < num_nodes; ++n) degrees_out[n] = 0;
    for (int64_t e = 0; e < num_edges; ++e) {
        ++degrees_out[edges[2 * e]];
        ++degrees_out[edges[2 * e + 1]];
    }
}

}  // extern "C"
