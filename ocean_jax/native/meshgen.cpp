// Native mesh-topology builder — the C++ substrate of the mesh layer.
//
// The reference delegates mesh construction and topology (edge/facet
// connectivity, dofmap support) to dolfin's C++ core, mshr/CGAL and gmsh
// (SURVEY §2.2). This is the ocean_jax equivalent: given a triangulation's
// cell array it extracts, in one pass with an open-addressing hash table:
//
//   * the unique edge list, numbered lexicographically by sorted vertex
//     pair (bit-identical to the numpy fallback's np.unique ordering),
//   * the cell→edge map with local edge i opposite local vertex i
//     (the P2 midpoint-dof convention),
//   * boundary facets (edges with exactly one incident cell) with their
//     owning cell and local index, ordered by edge id.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: g++ -O3 -shared -fPIC meshgen.cpp -o _libmeshgen.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct EdgeSlot {
    uint64_t key;     // (min(v0,v1) << 32) | max(v0,v1); EMPTY = ~0ull
    int32_t count;
    int32_t first_cell;
    int32_t first_local;
};

constexpr uint64_t EMPTY = ~0ull;

inline uint64_t pack(int64_t a, int64_t b) {
    if (a > b) std::swap(a, b);
    return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
}

}  // namespace

extern "C" {

// Build topology from a cell array.
//   cells:        (nc, 3) int64
//   edges_out:    (3*nc, 2) int64   (only the first ne rows are written)
//   cell_edges:   (nc, 3) int64
//   bf_out:       (3*nc, 4) int64   rows: (cell, local, v0, v1); nbf rows
// Returns 0 on success; writes ne and nbf through the out-params.
int ocean_build_topology(const int64_t* cells, int64_t nc,
                         int64_t* edges_out, int64_t* cell_edges,
                         int64_t* bf_out, int64_t* ne_out,
                         int64_t* nbf_out) {
    const int64_t max_edges = 3 * nc;
    // open-addressing hash table, load factor <= 0.5
    uint64_t cap = 1;
    while (cap < static_cast<uint64_t>(2 * max_edges)) cap <<= 1;
    std::vector<EdgeSlot> table(cap, EdgeSlot{EMPTY, 0, -1, -1});
    const uint64_t mask = cap - 1;

    auto slot_for = [&](uint64_t key) -> EdgeSlot& {
        uint64_t h = key * 0x9E3779B97F4A7C15ull;
        uint64_t idx = h & mask;
        while (table[idx].key != EMPTY && table[idx].key != key)
            idx = (idx + 1) & mask;
        return table[idx];
    };

    // pass 1: count incidences, remember first (cell, local)
    std::vector<uint64_t> keys;
    keys.reserve(max_edges);
    for (int64_t c = 0; c < nc; ++c) {
        const int64_t v0 = cells[3 * c], v1 = cells[3 * c + 1],
                      v2 = cells[3 * c + 2];
        const uint64_t k[3] = {pack(v1, v2), pack(v2, v0), pack(v0, v1)};
        for (int l = 0; l < 3; ++l) {
            EdgeSlot& s = slot_for(k[l]);
            if (s.key == EMPTY) {
                s.key = k[l];
                s.first_cell = static_cast<int32_t>(c);
                s.first_local = l;
                keys.push_back(k[l]);
            }
            ++s.count;
        }
    }

    // lexicographic edge numbering (matches np.unique(axis=0))
    std::sort(keys.begin(), keys.end());
    const int64_t ne = static_cast<int64_t>(keys.size());
    // store edge ids back into the table (reuse count's upper half? no —
    // add id via a second map: reuse first_cell/... keep separate vector)
    // We re-probe: assign ids in sorted order.
    std::vector<int64_t> edge_id_of_slot(cap, -1);
    for (int64_t e = 0; e < ne; ++e) {
        const uint64_t key = keys[e];
        uint64_t h = key * 0x9E3779B97F4A7C15ull;
        uint64_t idx = h & mask;
        while (table[idx].key != key) idx = (idx + 1) & mask;
        edge_id_of_slot[idx] = e;
        edges_out[2 * e] = static_cast<int64_t>(key >> 32);
        edges_out[2 * e + 1] = static_cast<int64_t>(key & 0xFFFFFFFFull);
    }

    // pass 2: cell_edges
    for (int64_t c = 0; c < nc; ++c) {
        const int64_t v0 = cells[3 * c], v1 = cells[3 * c + 1],
                      v2 = cells[3 * c + 2];
        const uint64_t k[3] = {pack(v1, v2), pack(v2, v0), pack(v0, v1)};
        for (int l = 0; l < 3; ++l) {
            uint64_t h = k[l] * 0x9E3779B97F4A7C15ull;
            uint64_t idx = h & mask;
            while (table[idx].key != k[l]) idx = (idx + 1) & mask;
            cell_edges[3 * c + l] = edge_id_of_slot[idx];
        }
    }

    // boundary facets in edge-id order, with CCW-ordered vertices
    // (local facet l of cell c connects local vertices (l+1)%3, (l+2)%3)
    int64_t nbf = 0;
    for (int64_t e = 0; e < ne; ++e) {
        const uint64_t key = keys[e];
        uint64_t h = key * 0x9E3779B97F4A7C15ull;
        uint64_t idx = h & mask;
        while (table[idx].key != key) idx = (idx + 1) & mask;
        if (table[idx].count == 1) {
            const int64_t c = table[idx].first_cell;
            const int64_t l = table[idx].first_local;
            bf_out[4 * nbf] = c;
            bf_out[4 * nbf + 1] = l;
            bf_out[4 * nbf + 2] = cells[3 * c + (l + 1) % 3];
            bf_out[4 * nbf + 3] = cells[3 * c + (l + 2) % 3];
            ++nbf;
        }
    }
    *ne_out = ne;
    *nbf_out = nbf;
    return 0;
}

// Structured triangulation of an active-square mask (the mshr/gmsh
// replacement, done natively): emits vertices and cells; topology comes
// from ocean_build_topology.
//   active: (ny, nx) uint8; xs: (nx+1); ys: (ny+1)
//   vertices_out: ((nx+1)*(ny+1), 2); cells_out: (2*n_active, 3)
//   square_to_cell: (ny, nx, 2) int64, -1 for inactive
// Returns 0; writes nv and nc through out-params.
int ocean_build_triangulation(int64_t nx, int64_t ny,
                              const double* xs, const double* ys,
                              const uint8_t* active, int diagonal_right,
                              double* vertices_out, int64_t* cells_out,
                              int64_t* square_to_cell,
                              int64_t* nv_out, int64_t* nc_out) {
    const int64_t gw = nx + 1;
    std::vector<int64_t> vid((nx + 1) * (ny + 1), -1);
    // mark used grid vertices
    for (int64_t iy = 0; iy < ny; ++iy)
        for (int64_t ix = 0; ix < nx; ++ix)
            if (active[iy * nx + ix])
                for (int dy = 0; dy <= 1; ++dy)
                    for (int dx = 0; dx <= 1; ++dx)
                        vid[(iy + dy) * gw + (ix + dx)] = 0;
    int64_t nv = 0;
    for (int64_t gy = 0; gy <= ny; ++gy)
        for (int64_t gx = 0; gx <= nx; ++gx) {
            const int64_t i = gy * gw + gx;
            if (vid[i] == 0) {
                vid[i] = nv;
                vertices_out[2 * nv] = xs[gx];
                vertices_out[2 * nv + 1] = ys[gy];
                ++nv;
            }
        }
    int64_t nc = 0;
    for (int64_t iy = 0; iy < ny; ++iy)
        for (int64_t ix = 0; ix < nx; ++ix) {
            int64_t* s2c = square_to_cell + 2 * (iy * nx + ix);
            if (!active[iy * nx + ix]) {
                s2c[0] = s2c[1] = -1;
                continue;
            }
            const int64_t v00 = vid[iy * gw + ix];
            const int64_t v10 = vid[iy * gw + ix + 1];
            const int64_t v01 = vid[(iy + 1) * gw + ix];
            const int64_t v11 = vid[(iy + 1) * gw + ix + 1];
            int64_t* t0 = cells_out + 3 * nc;
            int64_t* t1 = cells_out + 3 * (nc + 1);
            if (diagonal_right) {           // diagonal v00 -- v11
                t0[0] = v00; t0[1] = v10; t0[2] = v11;
                t1[0] = v00; t1[1] = v11; t1[2] = v01;
            } else {                        // diagonal v10 -- v01
                t0[0] = v00; t0[1] = v10; t0[2] = v01;
                t1[0] = v10; t1[1] = v11; t1[2] = v01;
            }
            s2c[0] = nc;
            s2c[1] = nc + 1;
            nc += 2;
        }
    *nv_out = nv;
    *nc_out = nc;
    return 0;
}

}  // extern "C"
