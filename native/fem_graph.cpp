// FEM graph-builder: native setup-time kernels for hippyflow_tpu.
//
// The TPU compute path is XLA; this library is the host-side runtime that
// prepares the static FEM "graph" XLA programs close over — the analog of
// the reference's dolfin C++ mesh/dofmap machinery (SURVEY.md section 2.5):
//   * structured triangulation connectivity (dl.RectangleMesh)
//   * boundary-edge extraction (exterior-facet iteration)
//   * block-tridiagonal band scatter indices (sparsity construction)
//   * point location for observation operators
//     (hp.assemblePointwiseObservation's bounding-box tree)
//
// Exposed as a plain C ABI consumed through ctypes
// (hippyflow_tpu/fem/native.py); every entry point has a numpy fallback so
// the library is an accelerator, not a dependency.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Fill cells (2*nx*ny, 3) int32 for a structured rectangle triangulation,
// row-major vertex numbering v(i, j) = j*(nx+1) + i.
// diagonal: 0 = "right", 1 = "left".  Returns 0 on success.
int build_rectangle_cells(int64_t nx, int64_t ny, int diagonal, int32_t* cells) {
    if (nx <= 0 || ny <= 0 || (diagonal != 0 && diagonal != 1)) return 1;
    const int64_t stride = nx + 1;
    int64_t k = 0;
    for (int64_t j = 0; j < ny; ++j) {
        for (int64_t i = 0; i < nx; ++i) {
            const int32_t v00 = static_cast<int32_t>(j * stride + i);
            const int32_t v10 = v00 + 1;
            const int32_t v01 = static_cast<int32_t>((j + 1) * stride + i);
            const int32_t v11 = v01 + 1;
            if (diagonal == 0) {  // "right"
                cells[k++] = v00; cells[k++] = v10; cells[k++] = v11;
                cells[k++] = v00; cells[k++] = v11; cells[k++] = v01;
            } else {  // "left"
                cells[k++] = v00; cells[k++] = v10; cells[k++] = v01;
                cells[k++] = v10; cells[k++] = v11; cells[k++] = v01;
            }
        }
    }
    return 0;
}

// Boundary edges: edges appearing in exactly one cell.  out_edges must have
// room for 3*nc pairs; returns the number of boundary edges (or -1 on error).
int64_t boundary_edges(const int32_t* cells, int64_t nc, int32_t* out_edges) {
    // key = min(v)*2^32 + max(v); value = (first-seen oriented edge, count)
    struct Entry { int32_t a, b; int32_t count; };
    std::unordered_map<uint64_t, Entry> seen;
    seen.reserve(static_cast<size_t>(nc) * 3);
    const int idx[3][2] = {{0, 1}, {1, 2}, {2, 0}};
    for (int64_t c = 0; c < nc; ++c) {
        for (int e = 0; e < 3; ++e) {
            const int32_t a = cells[3 * c + idx[e][0]];
            const int32_t b = cells[3 * c + idx[e][1]];
            const uint64_t lo = static_cast<uint64_t>(a < b ? a : b);
            const uint64_t hi = static_cast<uint64_t>(a < b ? b : a);
            const uint64_t key = (lo << 32) | hi;
            auto it = seen.find(key);
            if (it == seen.end()) {
                seen.emplace(key, Entry{a, b, 1});
            } else {
                it->second.count += 1;
            }
        }
    }
    int64_t n_out = 0;
    for (const auto& kv : seen) {
        if (kv.second.count == 1) {
            out_edges[2 * n_out] = kv.second.a;
            out_edges[2 * n_out + 1] = kv.second.b;
            ++n_out;
        }
    }
    return n_out;
}

// Band scatter indices for block-tridiagonal assembly (fem/assembly.py
// _band_indices): for each element-matrix entry (c, a, b),
//   idx = g1*(3s) + (row(g2) - row(g1) + 1)*s + g2 % s.
// Returns 0 on success, 1 if any coupling violates |row diff| <= 1.
int band_indices(const int32_t* cells, int64_t nc, int64_t s, int64_t* out_idx) {
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cell = cells + 3 * c;
        for (int a = 0; a < 3; ++a) {
            const int64_t g1 = cell[a];
            const int64_t r1 = g1 / s;
            for (int b = 0; b < 3; ++b) {
                const int64_t g2 = cell[b];
                const int64_t o = g2 / s - r1 + 1;
                if (o < 0 || o > 2) return 1;
                out_idx[9 * c + 3 * a + b] = g1 * 3 * s + o * s + g2 % s;
            }
        }
    }
    return 0;
}

// Point location with a uniform-grid spatial hash: for each target, find a
// containing cell and barycentric weights.  out_cell[t] = -1 if outside.
// Returns 0 on success.
int locate_points(const double* vertices, int64_t nv,
                  const int32_t* cells, int64_t nc,
                  const double* targets, int64_t nt,
                  double tol,
                  int64_t* out_cell, double* out_w) {
    if (nc == 0 || nt == 0) return nt == 0 ? 0 : 1;
    (void)nv;
    // bounding box
    double xmin = 1e300, xmax = -1e300, ymin = 1e300, ymax = -1e300;
    for (int64_t c = 0; c < nc; ++c) {
        for (int k = 0; k < 3; ++k) {
            const double* p = vertices + 2 * cells[3 * c + k];
            if (p[0] < xmin) xmin = p[0];
            if (p[0] > xmax) xmax = p[0];
            if (p[1] < ymin) ymin = p[1];
            if (p[1] > ymax) ymax = p[1];
        }
    }
    const int64_t g = std::max<int64_t>(
        1, static_cast<int64_t>(std::sqrt(static_cast<double>(nc) / 2.0)));
    const double gx = (xmax - xmin) > 0 ? g / (xmax - xmin) : 0.0;
    const double gy = (ymax - ymin) > 0 ? g / (ymax - ymin) : 0.0;
    auto cell_of = [&](double x, double y) -> int64_t {
        int64_t ix = static_cast<int64_t>((x - xmin) * gx);
        int64_t iy = static_cast<int64_t>((y - ymin) * gy);
        if (ix < 0) ix = 0; if (ix >= g) ix = g - 1;
        if (iy < 0) iy = 0; if (iy >= g) iy = g - 1;
        return iy * g + ix;
    };
    // bucket cells by the grid cells their bbox overlaps
    std::vector<std::vector<int32_t>> buckets(static_cast<size_t>(g * g));
    for (int64_t c = 0; c < nc; ++c) {
        double cxmin = 1e300, cxmax = -1e300, cymin = 1e300, cymax = -1e300;
        for (int k = 0; k < 3; ++k) {
            const double* p = vertices + 2 * cells[3 * c + k];
            if (p[0] < cxmin) cxmin = p[0];
            if (p[0] > cxmax) cxmax = p[0];
            if (p[1] < cymin) cymin = p[1];
            if (p[1] > cymax) cymax = p[1];
        }
        const int64_t b0 = cell_of(cxmin, cymin), b1 = cell_of(cxmax, cymax);
        const int64_t ix0 = b0 % g, iy0 = b0 / g, ix1 = b1 % g, iy1 = b1 / g;
        for (int64_t iy = iy0; iy <= iy1; ++iy)
            for (int64_t ix = ix0; ix <= ix1; ++ix)
                buckets[static_cast<size_t>(iy * g + ix)].push_back(
                    static_cast<int32_t>(c));
    }
    for (int64_t t = 0; t < nt; ++t) {
        const double px = targets[2 * t], py = targets[2 * t + 1];
        out_cell[t] = -1;
        const auto& bucket = buckets[static_cast<size_t>(cell_of(px, py))];
        for (const int32_t c : bucket) {
            const double* p0 = vertices + 2 * cells[3 * c + 0];
            const double* p1 = vertices + 2 * cells[3 * c + 1];
            const double* p2 = vertices + 2 * cells[3 * c + 2];
            const double d = (p1[0] - p0[0]) * (p2[1] - p0[1]) -
                             (p2[0] - p0[0]) * (p1[1] - p0[1]);
            if (d == 0.0) continue;
            const double l1 = ((px - p0[0]) * (p2[1] - p0[1]) -
                               (p2[0] - p0[0]) * (py - p0[1])) / d;
            const double l2 = ((p1[0] - p0[0]) * (py - p0[1]) -
                               (px - p0[0]) * (p1[1] - p0[1])) / d;
            const double l0 = 1.0 - l1 - l2;
            if (l0 >= -tol && l1 >= -tol && l2 >= -tol) {
                double w0 = l0 > 0 ? l0 : 0, w1 = l1 > 0 ? l1 : 0,
                       w2 = l2 > 0 ? l2 : 0;
                const double sum = w0 + w1 + w2;
                out_w[3 * t] = w0 / sum;
                out_w[3 * t + 1] = w1 / sum;
                out_w[3 * t + 2] = w2 / sum;
                out_cell[t] = c;
                break;
            }
        }
    }
    return 0;
}

}  // extern "C"
